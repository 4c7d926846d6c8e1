"""Token-ID materialization + GPT-style packing (round 11):
`unigram.piece_id_table` / `unigram_encode_ids` and
`corpus.pack_sequence_ids` — the tensor-ready tail of the pipeline
(counts are gauges; training ships ids).

Laws pinned here:
  id layout     specials → 256 byte pieces → trained pieces, stable,
                collision-safe.
  ids ≡ counts  size(ids) == unigram_encode's n_unigram_tokens (+eos).
  order         ids reassemble in document word order (posexplode +
                array_sort join-back), partitioning-independent.
  packing       concatenation order is (md5(doc), doc); every sequence
                is exactly seq_len except each group's final partial;
                total token count is conserved; deterministic.
"""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from flask_data_pipes_spark.operators.bpe import BYTE_TOKENS
from flask_data_pipes_spark.operators.corpus import pack_sequence_ids
from flask_data_pipes_spark.operators.unigram import (
    piece_id_table,
    unigram_encode,
    unigram_encode_ids,
    viterbi_segment,
)

VOCAB = [("alpha", -1.0, 9), ("beta", -1.1, 8), ("gamma", -1.2, 7)] + [
    (c, -3.0, 1) for c in "abeglmt"
]
LOGP = {p: lp for p, lp, _ in VOCAB}


def test_piece_id_table_layout_and_collision():
    t = dict(piece_id_table(VOCAB, byte_fallback=True, special_tokens=["<|eot|>"]))
    assert t["<|eot|>"] == 0
    assert t["<0x00>"] == 1 and t["<0xFF>"] == 256
    assert t["alpha"] == 257 and t["beta"] == 258  # vocab order after bytes
    # collision: a trained piece equal to a byte token keeps the
    # reserved id and is skipped, not double-assigned
    weird = [("<0x00>", -1.0, 5), ("zz", -2.0, 1)]
    t2 = piece_id_table(weird, byte_fallback=True)
    ids = [i for _tok, i in t2]
    assert len(ids) == len(set(ids)) == 257  # 256 bytes + zz
    assert dict(t2)["<0x00>"] == 0 and dict(t2)["zz"] == 256


def _pure_doc_ids(text, pid, specials, eos=None, mpl=5):
    t = text.lower()
    for s in sorted(specials, key=lambda s: (-len(s), s)):
        t = t.replace(s, f" {s} ")
    ids = []
    for w in t.split():
        pieces = (
            [w]
            if w in specials
            else viterbi_segment(
                w, LOGP, mpl, byte_fallback=True, specials=set(specials)
            )
        )
        ids.extend(pid[p] for p in pieces)
    if eos is not None:
        ids.append(pid[eos])
    return ids


def test_unigram_encode_ids_matches_pure_model(spark):
    docs = spark.createDataFrame(
        [
            (1, "Alpha Beta<|eot|>gamma zzz"),
            (2, "<|eot|> beta beta Qqq"),
            (3, ""),
        ],
        "doc_id int, text string",
    )
    pid = dict(
        piece_id_table(VOCAB, byte_fallback=True, special_tokens=["<|eot|>"])
    )
    out = {
        r["doc_id"]: r
        for r in unigram_encode_ids(
            docs,
            VOCAB,
            max_piece_len=5,
            byte_fallback=True,
            special_tokens=["<|eot|>"],
            append_eos="<|eot|>",
        ).collect()
    }
    for d, text in [(1, "Alpha Beta<|eot|>gamma zzz"), (2, "<|eot|> beta beta Qqq")]:
        want = _pure_doc_ids(text, pid, ["<|eot|>"], eos="<|eot|>")
        assert list(out[d]["ids"]) == want, (d, out[d]["ids"], want)
        assert out[d]["n_tokens"] == len(want)
    # empty doc survives as [eos]
    assert list(out[3]["ids"]) == [pid["<|eot|>"]]


def test_unigram_encode_ids_consistent_with_counts(spark):
    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma tt{i}") for i in range(20)],
        "doc_id int, text string",
    )
    ids = unigram_encode_ids(
        docs, VOCAB, max_piece_len=5, byte_fallback=True
    )
    counts = unigram_encode(
        docs, VOCAB, max_piece_len=5, byte_fallback=True
    )
    j = {
        r["doc_id"]: (r["n_tokens"], r["n_unigram_tokens"])
        for r in ids.join(
            counts.select("doc_id", "n_unigram_tokens"), "doc_id"
        ).collect()
    }
    assert all(a == b for a, b in j.values()), j


def test_unigram_encode_ids_oov_without_fallback_raises(spark):
    docs = spark.createDataFrame([(1, "zzz")], "doc_id int, text string")
    with pytest.raises(Exception, match="no id|byte_fallback"):
        unigram_encode_ids(docs, VOCAB, max_piece_len=5).collect()


def test_unigram_encode_ids_partitioning_independent(spark):
    docs = spark.createDataFrame(
        [(i, "alpha beta gamma alpha") for i in range(30)],
        "doc_id int, text string",
    )
    a = {
        r["doc_id"]: list(r["ids"])
        for r in unigram_encode_ids(
            docs.repartition(1), VOCAB, max_piece_len=5, byte_fallback=True
        ).collect()
    }
    b = {
        r["doc_id"]: list(r["ids"])
        for r in unigram_encode_ids(
            docs.repartition(11), VOCAB, max_piece_len=5, byte_fallback=True
        ).collect()
    }
    assert a == b


def _md5_long(v, seed=0):
    import hashlib

    return int(hashlib.md5(f"{seed}|{v}".encode()).hexdigest()[:15], 16)


def _pure_pack(rows, seq_len, n_groups, seed=8):
    """Independent model of pack_sequence_ids over (doc_id, ids)."""
    by_grp: dict = {}
    for doc, ids in rows:
        g = _md5_long(str(doc), 5) % n_groups
        by_grp.setdefault(g, []).append(
            (_md5_long(str(doc), seed), str(doc), ids)
        )
    out = {}
    for g, docs in by_grp.items():
        stream = []
        for _h, _d, ids in sorted(docs):
            stream.extend(ids)
        out[g] = [
            stream[i : i + seq_len] for i in range(0, len(stream), seq_len)
        ]
    return out


def test_pack_sequence_ids_matches_pure_model(spark):
    rows = [(i, list(range(i * 10, i * 10 + 3 + (i % 4)))) for i in range(40)]
    enc = spark.createDataFrame(
        rows, "doc_id int, ids array<int>"
    )
    got_rows = pack_sequence_ids(
        enc, seq_len=7, n_groups=4
    ).collect()
    got: dict = {}
    for r in got_rows:
        got.setdefault(r["grp"], {})[r["seq_idx"]] = list(r["ids"])
        assert r["n_tokens"] == len(r["ids"])
    want = _pure_pack(rows, 7, 4)
    for g, seqs in want.items():
        assert [got[g][i] for i in range(len(seqs))] == seqs, g
    # shape law: all but the final sequence per group are exactly seq_len
    for g, seqs in got.items():
        sizes = [len(seqs[i]) for i in range(len(seqs))]
        assert all(s == 7 for s in sizes[:-1])
        assert 1 <= sizes[-1] <= 7
    # conservation: every input token appears exactly once
    n_in = sum(len(ids) for _d, ids in rows)
    n_out = sum(len(s) for seqs in got.values() for s in seqs.values())
    assert n_in == n_out


def test_pack_sequence_ids_deterministic_and_validated(spark):
    rows = [(i, [i, i + 1]) for i in range(25)]
    enc = spark.createDataFrame(rows, "doc_id int, ids array<int>")
    a = sorted(
        (r["grp"], r["seq_idx"], tuple(r["ids"]))
        for r in pack_sequence_ids(enc.repartition(1), seq_len=5).collect()
    )
    b = sorted(
        (r["grp"], r["seq_idx"], tuple(r["ids"]))
        for r in pack_sequence_ids(enc.repartition(9), seq_len=5).collect()
    )
    assert a == b
    with pytest.raises(ValueError, match="seq_len"):
        pack_sequence_ids(enc, seq_len=0)


def _roundtrip_fixture_docs():
    # byte-fallback-stressing corpus: unicode outside any tiny
    # alphabet, specials INSIDE text, blanks, hostile whitespace
    return [
        (1, "Hello WORLD"),
        (2, "naïve café ÉCLAIR"),
        (3, "日本語 テスト"),
        (4, "mixed ascii and 🎉 emoji"),
        (5, ""),
        (6, "   "),
        (7, "tabs\tand\nnewlines  collapse"),
        (8, "special <|mask|> inside text survives as one word"),
        (9, "ß ﬁ ligature and coṁbining é marks"),
    ]


def test_decode_ids_roundtrip_both_tokenizers(spark):
    """The ID-level round-trip law (VERDICT r11 #3): with `word_sep`
    boundaries in the stream, `decode_ids` inverts BOTH encoders
    exactly — decoded text equals the tokenizers' canonical word
    stream (engine-computed: array_join(split_words_col(text), ' ')),
    including byte-fallback unicode, specials occurring in text, EOS
    stripping, and blank documents. Subsumes the piece-level law at
    bpe.decode_pieces."""
    from flask_data_pipes_spark.operators.bpe import (
        bpe_encode_ids,
        bpe_id_table,
        decode_ids,
        split_words_col,
    )
    from flask_data_pipes_spark.operators.unigram import piece_id_table

    df = spark.createDataFrame(
        _roundtrip_fixture_docs(), "doc_id int, text string"
    )
    # a NON-sentinel special ("<|mask|>") round-trips as a literal
    # word; the sentinels themselves (eos stripped by skip_ids, sep
    # consumed as a boundary) are reserved — the documented contract
    eos, sep = "<|eot|>", "<|w|>"
    specials = [eos, sep, "<|mask|>"]
    want = {
        r["doc_id"]: r["want"]
        for r in df.select(
            "doc_id",
            F.array_join(
                F.filter(
                    split_words_col(F.col("text"), specials),
                    lambda w: w != F.lit(""),
                ),
                " ",
            ).alias("want"),
        ).collect()
    }

    # unigram path: tiny vocab, everything uncovered goes through bytes
    vocab = [("hello", -1.0, 3), ("and", -1.5, 2)] + [
        (c, -3.0, 1) for c in "abcdehilmnoprstwx"
    ]
    utable = piece_id_table(vocab, True, specials)
    uids = dict(utable)
    enc = unigram_encode_ids(
        df,
        vocab,
        max_piece_len=5,
        byte_fallback=True,
        special_tokens=specials,
        append_eos=eos,
        word_sep=sep,
    )
    dec = decode_ids(
        enc, utable, sep_id=uids[sep], skip_ids=[uids[eos]]
    )
    got = {r["doc_id"]: r["text"] for r in dec.collect()}
    assert got == want

    # BPE path: tiny alphabet + two merges, byte fallback for the rest
    merges = [("a", "n"), ("an", "d")]
    alphabet = set("abcdehilmnoprstw")
    btable = bpe_id_table(merges, alphabet, True, specials)
    bids = dict(btable)
    enc_b = bpe_encode_ids(
        df,
        merges,
        alphabet=alphabet,
        byte_fallback=True,
        special_tokens=specials,
        append_eos=eos,
        word_sep=sep,
    )
    dec_b = decode_ids(
        enc_b, btable, sep_id=bids[sep], skip_ids=[bids[eos]]
    )
    got_b = {r["doc_id"]: r["text"] for r in dec_b.collect()}
    assert got_b == want


@given(
    st.lists(
        st.text(max_size=30).filter(
            lambda t: "<|w|>" not in t and "<|eot|>" not in t
        ),
        min_size=1,
        max_size=5,
    )
)
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_decode_ids_roundtrip_property(spark, texts):
    """decode_ids ∘ encode_ids(word_sep=…) == canonical text over
    ARBITRARY unicode (hypothesis): no vocabulary coverage assumed —
    byte fallback must carry every uncovered code point through the
    id table and back. (The sep/eos literals are excluded from the
    generated text: a sentinel occurring literally IS a boundary by
    construction — the documented reserved-token caveat.)"""
    from flask_data_pipes_spark.operators.bpe import (
        decode_ids,
        split_words_col,
    )
    from flask_data_pipes_spark.operators.unigram import piece_id_table

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id int, text string"
    )
    eos, sep = "<|eot|>", "<|w|>"
    vocab = [(c, -3.0, 1) for c in "etaoinshr"]
    table = piece_id_table(vocab, True, [eos, sep])
    ids_of = dict(table)
    enc = unigram_encode_ids(
        df,
        vocab,
        max_piece_len=3,
        byte_fallback=True,
        special_tokens=[eos, sep],
        append_eos=eos,
        word_sep=sep,
    )
    dec = decode_ids(
        enc, table, sep_id=ids_of[sep], skip_ids=[ids_of[eos]]
    )
    got = {r["doc_id"]: r["text"] for r in dec.collect()}
    want = {
        r["doc_id"]: r["want"]
        for r in df.select(
            "doc_id",
            F.array_join(
                F.filter(
                    split_words_col(F.col("text"), [eos, sep]),
                    lambda w: w != F.lit(""),
                ),
                " ",
            ).alias("want"),
        ).collect()
    }
    assert got == want


def test_decode_ids_validation(spark):
    from flask_data_pipes_spark.operators.bpe import decode_ids

    df = spark.createDataFrame([(1, [0, 99])], "doc_id int, ids array<int>")
    with pytest.raises(ValueError, match="one id twice"):
        decode_ids(df, [("a", 0), ("b", 0)])
    with pytest.raises(Exception, match="not in the id table"):
        decode_ids(df, [("a", 0)]).collect()
    with pytest.raises(ValueError, match="distinct tokens"):
        unigram_encode_ids(
            df.withColumn("text", F.lit("x")),
            [("x", -1.0, 1)],
            append_eos="<|e|>",
            word_sep="<|e|>",
        )


AMBIG_VOCAB = [("abc", -1.2, 5), ("ab", -1.0, 5), ("bc", -1.1, 4)] + [
    (c, -2.0, 2) for c in "abcxyz"
]


def _sample_ids(spark, df, seed, **kw):
    from flask_data_pipes_spark.operators.unigram import (
        unigram_sample_encode_ids,
    )

    enc = unigram_sample_encode_ids(
        df,
        AMBIG_VOCAB,
        max_piece_len=3,
        alpha=0.3,
        seed=seed,
        byte_fallback=True,
        special_tokens=("<|eot|>",),
        append_eos="<|eot|>",
        **kw,
    )
    return {r["doc_id"]: list(r["ids"]) for r in enc.collect()}


def test_sample_encode_ids_deterministic_per_seed(spark):
    """VERDICT r11 #6: per-epoch regularized ids — same seed is
    bit-identical regardless of partitioning; a new seed resamples."""
    docs = [
        (i, f"abcabc ababab {'abc' * (1 + i % 3)} xyz Qq")
        for i in range(24)
    ]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    a = _sample_ids(spark, df.repartition(1), seed=7)
    b = _sample_ids(spark, df.repartition(9), seed=7)
    assert a == b
    c = _sample_ids(spark, df, seed=8)
    assert a != c  # deterministic given the fixed seeds in this test


def test_sample_encode_ids_conservation_through_packer(spark):
    """The invariant the packer contract pins, now under SAMPLING:
    every document contributes exactly one EOS and no id is lost or
    duplicated at sequence cuts."""
    from flask_data_pipes_spark.operators.unigram import (
        piece_id_table,
        unigram_sample_encode_ids,
    )

    docs = [(i, f"abcabc xyz {'ab' * (1 + i % 4)}") for i in range(30)]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    eos = "<|eot|>"
    enc = unigram_sample_encode_ids(
        df,
        AMBIG_VOCAB,
        max_piece_len=3,
        alpha=0.3,
        seed=3,
        byte_fallback=True,
        special_tokens=(eos,),
        append_eos=eos,
    )
    eos_id = dict(piece_id_table(AMBIG_VOCAB, True, (eos,)))[eos]
    n_tokens_in = enc.agg(F.sum("n_tokens")).collect()[0][0]
    packed = pack_sequence_ids(enc, seq_len=16, n_groups=4).collect()
    flat = [int(x) for r in packed for x in r["ids"]]
    assert len(flat) == n_tokens_in
    assert sum(1 for x in flat if x == eos_id) == len(docs)


def test_sample_encode_ids_roundtrip_law_holds_under_sampling(spark):
    """Segmentations vary per seed; the TEXT must not — decode_ids of
    a sampled encoding equals the canonical word stream for any seed
    (the law is segmentation-independent)."""
    from flask_data_pipes_spark.operators.bpe import (
        decode_ids,
        split_words_col,
    )
    from flask_data_pipes_spark.operators.unigram import (
        piece_id_table,
        unigram_sample_encode_ids,
    )

    df = spark.createDataFrame(
        _roundtrip_fixture_docs(), "doc_id int, text string"
    )
    eos, sep = "<|eot|>", "<|w|>"
    table = piece_id_table(AMBIG_VOCAB, True, (eos, sep))
    ids_of = dict(table)
    want = {
        r["doc_id"]: r["want"]
        for r in df.select(
            "doc_id",
            F.array_join(
                F.filter(
                    split_words_col(F.col("text"), [eos, sep]),
                    lambda w: w != F.lit(""),
                ),
                " ",
            ).alias("want"),
        ).collect()
    }
    for seed in (1, 2):
        enc = unigram_sample_encode_ids(
            df,
            AMBIG_VOCAB,
            max_piece_len=3,
            alpha=0.3,
            seed=seed,
            byte_fallback=True,
            special_tokens=(eos, sep),
            append_eos=eos,
            word_sep=sep,
        )
        dec = decode_ids(
            enc, table, sep_id=ids_of[sep], skip_ids=[ids_of[eos]]
        )
        got = {r["doc_id"]: r["text"] for r in dec.collect()}
        assert got == want, seed


def test_sample_encode_ids_per_occurrence(spark):
    """Occurrence grain: each (doc, pos) draws independently — still
    deterministic per seed, and repeated occurrences of one ambiguous
    word are free to segment differently (epoch grain cannot)."""
    docs = [(1, " ".join(["abcabc"] * 8)), (2, "abcabc xyz")]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    a = _sample_ids(spark, df.repartition(1), seed=5, per_occurrence=True)
    b = _sample_ids(spark, df.repartition(7), seed=5, per_occurrence=True)
    assert a == b
    # epoch grain: all 8 occurrences of 'abcabc' share one sampled
    # segmentation -> the stream (minus eos) is 8 identical blocks
    epoch = _sample_ids(spark, df, seed=5)[1][:-1]
    blk = len(epoch) // 8
    assert len(epoch) % 8 == 0 and epoch == epoch[:blk] * 8
    # occurrence grain draws 8 independent segmentations — with this
    # fixed seed they are NOT all identical, so the streams differ
    # (deterministic: same seed every run)
    assert a[1][:-1] != epoch


def test_pack_sequence_ids_null_doc_id_raises(spark):
    """ADVICE r11: a null id_col used to die as int(NaN) deep in the
    Arrow kernel; it must surface as a ValueError naming the column."""
    enc = spark.createDataFrame(
        [(1, [1, 2]), (None, [3, 4])], "doc_id int, ids array<int>"
    )
    with pytest.raises(Exception, match="null 'doc_id'"):
        pack_sequence_ids(enc, seq_len=4).collect()


def test_unigram_encode_ids_plan_single_arrow_pass(spark):
    """The id kernel must run exactly once, over the DISTINCT word
    table (the round-10 lesson: an explode above a pandas-UDF array
    can silently duplicate the kernel — here the posexplode is pure
    Catalyst and the kernel sits after distinct)."""
    docs = spark.createDataFrame(
        [(i, "alpha beta gamma") for i in range(10)],
        "doc_id int, text string",
    )
    df = unigram_encode_ids(
        docs, VOCAB, max_piece_len=5, byte_fallback=True
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") == 1, plan
    assert "CartesianProduct" not in plan


# --- BPE id twin (bpe_id_table / bpe_encode_ids) -----------------------------


def test_bpe_id_table_layout():
    from flask_data_pipes_spark.operators.bpe import bpe_id_table

    merges = [("a", "b", 5), ("ab", "c", 3)]
    t = dict(
        bpe_id_table(merges, alphabet=["c", "a", "b"], byte_fallback=True,
                     special_tokens=["<|eot|>"])
    )
    assert t["<|eot|>"] == 0
    assert t["<0x00>"] == 1 and t["<0xFF>"] == 256
    assert (t["a"], t["b"], t["c"]) == (257, 258, 259)  # sorted alphabet
    assert (t["ab"], t["abc"]) == (260, 261)  # merge products in rank order
    ids = [i for _tok, i in bpe_id_table(merges, ["a", "b", "c", "ab"])]
    assert len(ids) == len(set(ids))  # collision ('ab' in alphabet) skipped


def test_bpe_encode_ids_matches_pure_model_and_counts(spark):
    from flask_data_pipes_spark.operators.bpe import (
        bpe_encode,
        bpe_encode_ids,
        bpe_id_table,
        bpe_train_incremental,
        encode_word,
        train_alphabet,
    )

    train = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog") for i in range(4)],
        "doc_id int, text string",
    )
    merges = bpe_train_incremental(train, n_merges=6, min_count=1)
    alphabet = train_alphabet(train)
    docs = spark.createDataFrame(
        [(1, "the fox<|sep|>straße"), (2, "über dog <|sep|>"), (3, "")],
        "doc_id int, text string",
    )
    out = {
        r["doc_id"]: r
        for r in bpe_encode_ids(
            docs, merges, alphabet=alphabet, byte_fallback=True,
            special_tokens=["<|sep|>"], append_eos="<|sep|>",
        ).collect()
    }
    pid = dict(bpe_id_table(merges, alphabet, True, ["<|sep|>"]))
    ranks = {(a, b): i for i, (a, b, *_r) in enumerate(merges)}
    alpha = set(alphabet)
    for d, text in [(1, "the fox<|sep|>straße"), (2, "über dog <|sep|>")]:
        t = text.lower().replace("<|sep|>", " <|sep|> ")
        want = []
        for w in t.split():
            toks = (
                [w] if w == "<|sep|>"
                else encode_word(w, ranks, alphabet=alpha, byte_fallback=True)
            )
            want.extend(pid[p] for p in toks)
        want.append(pid["<|sep|>"])
        assert list(out[d]["ids"]) == want, (d, out[d]["ids"], want)
    assert list(out[3]["ids"]) == [pid["<|sep|>"]]
    # ids == counts (+ eos)
    counts = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in bpe_encode(
            docs, merges, byte_fallback=True, alphabet=alphabet,
            special_tokens=["<|sep|>"],
        ).collect()
    }
    for d in (1, 2, 3):
        assert out[d]["n_tokens"] == counts[d] + 1  # + eos


def test_bpe_encode_ids_requires_alphabet_and_feeds_packer(spark):
    from flask_data_pipes_spark.operators.bpe import (
        bpe_encode_ids,
        bpe_train_incremental,
        train_alphabet,
    )

    docs = spark.createDataFrame(
        [(i, "aa bb aa bb cc") for i in range(12)], "doc_id int, text string"
    )
    with pytest.raises(ValueError, match="alphabet"):
        bpe_encode_ids(docs, [], byte_fallback=True)
    merges = bpe_train_incremental(docs, n_merges=2, min_count=1)
    enc = bpe_encode_ids(
        docs, merges, alphabet=train_alphabet(docs), byte_fallback=True
    )
    # drop-in interchangeable with the unigram twin: same packer contract
    packed = pack_sequence_ids(enc, seq_len=11, n_groups=3).collect()
    n_in = sum(r["n_tokens"] for r in enc.collect())
    assert sum(r["n_tokens"] for r in packed) == n_in


def test_pack_sequence_ids_pad_mode(spark):
    rows = [(i, [i] * 3) for i in range(10)]  # 30 tokens
    enc = spark.createDataFrame(rows, "doc_id int, ids array<int>")
    out = pack_sequence_ids(
        enc, seq_len=8, n_groups=2, pad_id=-1
    ).collect()
    for r in out:
        assert len(r["ids"]) == 8  # fixed tensor shape
        real = [x for x in r["ids"] if x != -1]
        assert r["n_tokens"] == len(real)  # attention-mask boundary
        # padding only ever trails
        assert list(r["ids"][: r["n_tokens"]]) == real
    # conservation on the REAL tokens
    assert sum(r["n_tokens"] for r in out) == 30
    # unpadded twin agrees on the real content
    raw = pack_sequence_ids(enc, seq_len=8, n_groups=2).collect()
    a = sorted((r["grp"], r["seq_idx"], tuple(r["ids"][: r["n_tokens"]])) for r in out)
    b = sorted((r["grp"], r["seq_idx"], tuple(r["ids"])) for r in raw)
    assert a == b


def test_bpe_encode_ids_plan_single_arrow_pass(spark):
    from flask_data_pipes_spark.operators.bpe import bpe_encode_ids

    docs = spark.createDataFrame(
        [(i, "aa bb aa") for i in range(10)], "doc_id int, text string"
    )
    df = bpe_encode_ids(
        docs, [("a", "a", 2)], alphabet=["a", "b"], byte_fallback=True
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") == 1, plan
    assert "CartesianProduct" not in plan


def test_write_training_shards_deterministic_manifest(spark, tmp_path):
    """VERDICT r11 #5: shard assignment is a pure function of sequence
    identity — two exports of the same packed data produce IDENTICAL
    manifests (counts, shapes, checksums) — and the manifest certifies
    the pad-mode fixed-shape contract (min_len == max_len == seq_len)."""
    from flask_data_pipes_spark.operators.corpus import (
        read_training_shards,
        verify_training_shards,
        write_training_shards,
    )

    rows = [(i, list(range(i, i + 5 + i % 7))) for i in range(60)]
    enc = spark.createDataFrame(rows, "doc_id int, ids array<int>")
    packed = pack_sequence_ids(enc, seq_len=16, n_groups=4, pad_id=0)

    def manifest_rows(p):
        m = write_training_shards(packed, str(p), n_shards=5)
        return sorted(
            (
                r["shard"],
                r["n_sequences"],
                r["n_tokens"],
                r["min_len"],
                r["max_len"],
                r["checksum"],
            )
            for r in m.collect()
        )

    a = manifest_rows(tmp_path / "x")
    b = manifest_rows(tmp_path / "y")
    assert a == b
    # fixed-shape certificate: every shard is uniformly seq_len wide
    assert all(r[3] == 16 and r[4] == 16 for r in a)
    # conservation: the export holds every packed sequence exactly once
    n_seq = packed.count()
    assert sum(r[1] for r in a) == n_seq
    got = read_training_shards(spark, str(tmp_path / "x"))
    assert got.count() == n_seq
    # round-trip: data content is the packed frame (shard col added)
    want = sorted(
        (r["grp"], r["seq_idx"], tuple(r["ids"])) for r in packed.collect()
    )
    back = sorted(
        (r["grp"], r["seq_idx"], tuple(r["ids"])) for r in got.collect()
    )
    assert back == want
    # integrity audit: all shards verify ok against the stored manifest
    v = verify_training_shards(spark, str(tmp_path / "x")).collect()
    assert len(v) == 5 and all(r["ok"] for r in v)
    # immutability: a second write to the same path refuses
    with pytest.raises(Exception):
        write_training_shards(packed, str(tmp_path / "x"), n_shards=5)


def test_verify_training_shards_detects_corruption(spark, tmp_path):
    from flask_data_pipes_spark.operators.corpus import (
        verify_training_shards,
        write_training_shards,
    )

    rows = [(i, [i, i + 1, i + 2]) for i in range(40)]
    enc = spark.createDataFrame(rows, "doc_id int, ids array<int>")
    packed = pack_sequence_ids(enc, seq_len=8, n_groups=3, pad_id=0)
    write_training_shards(packed, str(tmp_path / "s"), n_shards=4)
    # corrupt one shard: drop one of its data files' rows by rewriting
    import glob
    import pyarrow.parquet as pq
    import pyarrow as pa

    files = sorted(
        glob.glob(
            str(tmp_path / "s" / "data" / "gen=0" / "shard=*" / "*.parquet")
        )
    )
    victim = files[0]
    t = pq.read_table(victim)
    pq.write_table(t.slice(0, max(1, t.num_rows - 1)), victim)
    # drop Hadoop's .crc sidecar so the LOW-level checksum doesn't
    # mask the manifest-level audit under test
    import os

    crc = os.path.join(
        os.path.dirname(victim), "." + os.path.basename(victim) + ".crc"
    )
    if os.path.exists(crc):
        os.remove(crc)
    v = {r["shard"]: r["ok"] for r in verify_training_shards(spark, str(tmp_path / "s")).collect()}
    assert not all(v.values())
    assert sum(1 for ok in v.values() if not ok) == 1


def test_append_training_shards_generations(spark, tmp_path):
    """VERDICT r12 "What's missing" #4: a growing corpus appends each
    new batch as its own GENERATION — own manifest, committed
    generations' files never rewritten, one shared routing function
    (sidecar-pinned), whole-set audit, and replayed appends land
    exactly-once."""
    import glob
    import os

    from flask_data_pipes_spark.operators.corpus import (
        append_training_shards,
        read_training_shards,
        training_shard_params,
        verify_training_shards,
        write_training_shards,
    )

    p = str(tmp_path / "s")
    rows0 = [(i, [i, i + 1, i + 2]) for i in range(40)]
    enc0 = spark.createDataFrame(rows0, "doc_id int, ids array<int>")
    packed0 = pack_sequence_ids(enc0, seq_len=8, n_groups=3, pad_id=0)
    write_training_shards(packed0, p, n_shards=4, seed=13)
    assert training_shard_params(spark, p) == {"n_shards": 4, "seed": 13}
    gen0_files = {
        f: os.path.getmtime(f)
        for f in glob.glob(f"{p}/data/gen=0/shard=*/*.parquet")
    }
    # append a new batch as generation 1
    rows1 = [(100 + i, [i, i + 7]) for i in range(25)]
    enc1 = spark.createDataFrame(rows1, "doc_id int, ids array<int>")
    packed1 = pack_sequence_ids(enc1, seq_len=8, n_groups=2, pad_id=0)
    m1 = append_training_shards(packed1, p, generation=1)
    assert {r["gen"] for r in m1.collect()} == {1}
    # committed generation untouched: same files, same mtimes
    assert {
        f: os.path.getmtime(f)
        for f in glob.glob(f"{p}/data/gen=0/shard=*/*.parquet")
    } == gen0_files
    # whole multi-generation set verifies ok
    v = verify_training_shards(spark, p).collect()
    assert all(r["ok"] for r in v)
    assert {r["gen"] for r in v} == {0, 1}
    # conservation across generations
    n0, n1 = packed0.count(), packed1.count()
    got = read_training_shards(spark, p)
    assert got.count() == n0 + n1
    assert got.where(F.col("gen") == 1).count() == n1
    # replayed append (crash-retry, same generation id) is
    # exactly-once: identical manifest, identical total row count
    before = sorted(map(tuple, m1.collect()))
    m1b = append_training_shards(packed1, p, generation=1)
    assert sorted(map(tuple, m1b.collect())) == before
    assert read_training_shards(spark, p).count() == n0 + n1
    assert all(r["ok"] for r in verify_training_shards(spark, p).collect())
    # generation 0 is reserved for the initial export
    with pytest.raises(ValueError):
        append_training_shards(packed1, p, generation=0)


def test_decode_dense_guard_thresholds():
    from flask_data_pipes_spark.operators.bpe import _decode_dense_ok

    assert _decode_dense_ok(100, 50)
    assert _decode_dense_ok(4095, 10)  # small absolute floor stays dense
    assert not _decode_dense_ok(4096, 10)
    assert _decode_dense_ok(39999, 10000)
    assert not _decode_dense_ok(40000, 10000)
    assert not _decode_dense_ok(2**31 - 1, 1000)


def test_decode_ids_sparse_fallback_parity(spark):
    """ADVICE r13: a large sentinel sep/skip id must NOT allocate
    max_id-sized dense tables — the dict fallback kicks in, with
    byte-identical semantics. (If the dense path were taken here, the
    2**31-sized allocations would OOM the test.)"""
    from flask_data_pipes_spark.operators.bpe import decode_ids

    table = [("he", 0), ("llo", 1), ("wor", 2), ("ld", 3), ("<0x41>", 4)]
    big_sep = 2**31 - 1
    big_skip = 2**31 - 2
    df_sparse = spark.createDataFrame(
        [
            (0, [0, 1, big_sep, 2, 3, big_sep, big_skip]),
            (1, [4, big_sep, 0, 1]),  # byte-fallback word then 'hello'
            (2, []),
            (3, None),
        ],
        "doc_id long, ids array<int>",
    )
    got = {
        r["doc_id"]: r["text"]
        for r in decode_ids(
            df_sparse, table, sep_id=big_sep, skip_ids=(big_skip,)
        ).collect()
    }
    # dense twin: same stream with small sentinel ids
    df_dense = spark.createDataFrame(
        [
            (0, [0, 1, 100, 2, 3, 100, 101]),
            (1, [4, 100, 0, 1]),
            (2, []),
            (3, None),
        ],
        "doc_id long, ids array<int>",
    )
    want = {
        r["doc_id"]: r["text"]
        for r in decode_ids(
            df_dense, table, sep_id=100, skip_ids=(101,)
        ).collect()
    }
    assert got == want
    assert got[0] == "hello world"
    assert got[1] == "A hello"
    assert got[2] == "" and got[3] is None


def test_decode_ids_sparse_unknown_id_raises(spark):
    from flask_data_pipes_spark.operators.bpe import decode_ids

    df = spark.createDataFrame(
        [(0, [0, 7])], "doc_id long, ids array<int>"
    )
    with pytest.raises(Exception, match="not in the id table"):
        decode_ids(
            df, [("a", 0)], sep_id=2**31 - 1
        ).collect()
