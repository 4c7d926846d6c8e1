"""Byte-fallback + special-token coverage for BOTH tokenizers
(operators/bpe.py, operators/unigram.py) — round 11, VERDICT r10 #3.

The laws pinned here:
  no-UNK      with byte_fallback, every emitted piece is a vocabulary
              piece or a reserved <0xNN> byte piece — property-tested
              over arbitrary unicode words and arbitrary vocabularies.
  round-trip  decode_pieces(encode(word)) == word, always.
  no-op       on covered text, byte_fallback changes nothing (the
              golden pins of llm_bpe_encode/llm_unigram_encode stay
              valid because train-on-corpus implies full coverage).
  specials    a special token is matched after lowercasing, survives
              word-splitting as its own word, and encodes as exactly
              ONE token in BOTH engines (identical per-doc counts).
"""

import pytest
from hypothesis import given, settings, strategies as st

from flask_data_pipes_spark.operators.bpe import (
    BYTE_TOKENS,
    bpe_encode,
    byte_fallback_tokens,
    decode_pieces,
    encode_word,
    is_byte_token,
    split_words_col,
    train_alphabet,
    validate_special_tokens,
)
from flask_data_pipes_spark.operators.unigram import (
    UNK_LOGP,
    unigram_encode,
    viterbi_segment,
)

WORDS = st.text(
    alphabet=st.characters(
        blacklist_categories=("Zs", "Zl", "Zp", "Cs"), min_codepoint=33
    ),
    min_size=1,
    max_size=12,
)


@st.composite
def word_and_vocab(draw):
    word = draw(WORDS)
    chars = sorted(set(word))
    # cover a random subset of the word's characters + a few substrings
    covered = draw(st.sets(st.sampled_from(chars))) if chars else set()
    pieces = set(covered)
    if len(word) >= 2:
        for _ in range(draw(st.integers(0, 3))):
            i = draw(st.integers(0, len(word) - 2))
            j = draw(st.integers(i + 2, min(len(word), i + 4)))
            pieces.add(word[i:j])
    logp = {p: -1.0 - 0.1 * len(p) for p in pieces}
    return word, logp


@given(word_and_vocab())
@settings(max_examples=200, deadline=None)
def test_unigram_byte_fallback_no_unk_and_roundtrip(wv):
    word, logp = wv
    out = viterbi_segment(word, logp, 4, byte_fallback=True)
    for p in out:
        assert p in logp or is_byte_token(p), (word, p)
    assert decode_pieces(out) == word
    # full coverage -> byte_fallback is a no-op
    full = dict(logp)
    for c in set(word):
        full.setdefault(c, -3.0)
    assert viterbi_segment(word, full, 4, byte_fallback=True) == \
        viterbi_segment(word, full, 4)


@given(WORDS, st.integers(0, 5))
@settings(max_examples=200, deadline=None)
def test_bpe_byte_fallback_no_unk_and_roundtrip(word, n_merges):
    # train-ish: alphabet = a random prefix of the word's chars
    chars = sorted(set(word))
    alphabet = set(chars[: max(1, len(chars) // 2)])
    # merges over covered chars only (as real training would produce)
    cov = [c for c in word if c in alphabet]
    ranks = {}
    for i in range(min(n_merges, len(cov) - 1)):
        ranks[(cov[i], cov[i + 1])] = i
    out = encode_word(word, ranks, alphabet=alphabet, byte_fallback=True)
    valid = alphabet | {a + b for (a, b) in ranks}
    for p in out:
        assert p in valid or is_byte_token(p), (word, p, alphabet)
    assert decode_pieces(out) == word
    # full alphabet -> no-op
    assert encode_word(
        word, ranks, alphabet=set(word), byte_fallback=True
    ) == encode_word(word, ranks)


def test_byte_fallback_requires_alphabet():
    with pytest.raises(ValueError, match="requires the trained alphabet"):
        encode_word("ab", {}, byte_fallback=True)


def test_byte_tokens_are_reserved_shape():
    assert len(BYTE_TOKENS) == 256 and len(set(BYTE_TOKENS)) == 256
    assert byte_fallback_tokens("é") == ["<0xC3>", "<0xA9>"]
    assert decode_pieces(["<0xC3>", "<0xA9>", "x", "<0x41>"]) == "éxA"


def test_validate_special_tokens_rules():
    assert validate_special_tokens(None) == ()
    # longest-first ordering for overlapping specials
    assert validate_special_tokens(["<s>", "<ss>"]) == ("<ss>", "<s>")
    for bad in ["", "a b", "a\tb", "UPPER", "<0x00>"]:
        with pytest.raises(ValueError):
            validate_special_tokens([bad])


def test_split_words_col_protects_specials(spark):
    df = spark.createDataFrame(
        [
            ("Foo<|endoftext|>Bar baz",),
            ("x <pad><pad> y",),
            ("plain text",),
        ],
        "text string",
    )
    from pyspark.sql import functions as F

    out = [
        r["w"]
        for r in df.select(
            split_words_col(F.col("text"), ["<|endoftext|>", "<pad>"]).alias("w")
        ).collect()
    ]
    assert out[0] == ["foo", "<|endoftext|>", "bar", "baz"]
    assert out[1] == ["x", "<pad>", "<pad>", "y"]
    assert out[2] == ["plain", "text"]


def test_split_words_col_replacement_metachar_safety(spark):
    # specials containing $ and \ must survive Java's replacement syntax
    from pyspark.sql import functions as F

    df = spark.createDataFrame([("a$end$b c\\esc\\d",)], "text string")
    out = df.select(
        split_words_col(F.col("text"), ["$end$", "\\esc\\"]).alias("w")
    ).collect()[0]["w"]
    assert out == ["a", "$end$", "b", "c", "\\esc\\", "d"]


def _pure_doc_counts(text, segment_one, specials):
    """Independent per-doc model: lower, pad specials, split, encode
    each word; returns (n_words, n_tokens, n_chars, n_byte_tokens)."""
    t = text.lower()
    for s in sorted(specials, key=lambda s: (-len(s), s)):
        t = t.replace(s, f" {s} ")
    words = t.split()
    n_tok = n_chars = n_b = 0
    for w in words:
        pieces = [w] if w in specials else segment_one(w)
        n_tok += len(pieces)
        n_b += sum(1 for p in pieces if is_byte_token(p))
        n_chars += len(w)
    return len(words), n_tok, n_chars, n_b


def test_unigram_encode_specials_and_fallback_distributed(spark):
    docs = spark.createDataFrame(
        [
            (1, "Alpha Beta<|eot|>gamma zzz"),
            (2, "<|eot|> beta beta Qqq"),
            (3, ""),
        ],
        "doc_id int, text string",
    )
    # vocab over a RESTRICTED alphabet: q/z uncovered -> byte fallback
    vocab = [("alpha", -1.0, 5), ("beta", -1.0, 5), ("gamma", -1.2, 4)] + [
        (c, -3.0, 1) for c in "abeglmt"
    ]
    out = {
        r["doc_id"]: r
        for r in unigram_encode(
            docs,
            vocab,
            max_piece_len=5,
            byte_fallback=True,
            special_tokens=["<|eot|>"],
        ).collect()
    }
    logp = {p: lp for p, lp, _ in vocab}
    for doc_id, text in [(1, "Alpha Beta<|eot|>gamma zzz"), (2, "<|eot|> beta beta Qqq")]:
        nw, nt, nc, nb = _pure_doc_counts(
            text,
            lambda w: viterbi_segment(w, logp, 5, byte_fallback=True),
            {"<|eot|>"},
        )
        r = out[doc_id]
        assert (
            r["n_words"], r["n_unigram_tokens"],
            r["n_chars_tokenized"], r["n_byte_tokens"],
        ) == (nw, nt, nc, nb), (doc_id, r)
    assert out[1]["n_byte_tokens"] >= 3  # zzz uncovered
    assert out[3]["n_words"] == 0 and out[3]["n_byte_tokens"] == 0


def test_bpe_encode_specials_and_fallback_distributed(spark):
    from flask_data_pipes_spark.operators.bpe import bpe_train_incremental

    train = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog") for i in range(4)],
        "doc_id int, text string",
    )
    merges = bpe_train_incremental(train, n_merges=6, min_count=1)
    alphabet = train_alphabet(train)
    assert "ß" not in alphabet and "q" in alphabet
    docs = spark.createDataFrame(
        [(1, "the fox<|sep|>straße"), (2, "über dog <|sep|>")],
        "doc_id int, text string",
    )
    out = {
        r["doc_id"]: r
        for r in bpe_encode(
            docs,
            merges,
            byte_fallback=True,
            alphabet=alphabet,
            special_tokens=["<|sep|>"],
        ).collect()
    }
    ranks = {(a, b): i for i, (a, b, *_r) in enumerate(merges)}
    alpha = set(alphabet)
    for doc_id, text in [(1, "the fox<|sep|>straße"), (2, "über dog <|sep|>")]:
        nw, nt, nc, nb = _pure_doc_counts(
            text,
            lambda w: encode_word(w, ranks, alphabet=alpha, byte_fallback=True),
            {"<|sep|>"},
        )
        r = out[doc_id]
        assert (
            r["n_words"], r["n_bpe_tokens"],
            r["n_chars_tokenized"], r["n_byte_tokens"],
        ) == (nw, nt, nc, nb), (doc_id, r)
    assert out[1]["n_byte_tokens"] >= 2  # ß -> 2 bytes
    assert out[2]["n_byte_tokens"] >= 2  # ü -> 2 bytes


def test_both_encoders_agree_on_special_counting(spark):
    """The shared-contract law: on a corpus where EVERY word is a
    special, both engines produce identical per-doc counts (each
    special = one word = one token, zero byte tokens)."""
    docs = spark.createDataFrame(
        [(1, "<s><pad> <s>"), (2, "<pad>")], "doc_id int, text string"
    )
    specs = ["<s>", "<pad>"]
    b = {
        r["doc_id"]: r
        for r in bpe_encode(
            docs, [], byte_fallback=True, alphabet=[], special_tokens=specs
        ).collect()
    }
    u = {
        r["doc_id"]: r
        for r in unigram_encode(
            docs, [], max_piece_len=3, byte_fallback=True, special_tokens=specs
        ).collect()
    }
    for d in (1, 2):
        assert b[d]["n_words"] == u[d]["n_words"]
        assert b[d]["n_bpe_tokens"] == u[d]["n_unigram_tokens"]
        assert b[d]["n_byte_tokens"] == u[d]["n_byte_tokens"] == 0
    assert b[1]["n_words"] == 3 and b[1]["n_bpe_tokens"] == 3


def test_unk_logp_path_unchanged_without_fallback():
    """Backward compatibility: without byte_fallback the UNK single-char
    fallback (and its UNK_LOGP scoring) is exactly the round-10
    behavior — the train-time E-step path is untouched."""
    out = viterbi_segment("qx", {"a": -1.0}, 3)
    assert out == ["q", "x"]
    assert UNK_LOGP == -100.0


def test_split_words_col_nested_specials_single_pass(spark):
    """A special that is a substring of another ("eot" inside
    "<|eot|>") must not re-match inside the already-protected longer
    token — the single-alternation-pass guarantee (round-11 review)."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("a<|eot|>b eot c",), ("eot<|eot|>eot",)], "text string"
    )
    out = [
        r["w"]
        for r in df.select(
            split_words_col(F.col("text"), ["<|eot|>", "eot"]).alias("w")
        ).collect()
    ]
    assert out[0] == ["a", "<|eot|>", "b", "eot", "c"]
    assert out[1] == ["eot", "<|eot|>", "eot"]
