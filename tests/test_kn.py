"""Interpolated Kneser-Ney trigram LM
(operators/corpus.py::kn_trigram_logprob)."""

from __future__ import annotations

import math
from collections import Counter
from decimal import ROUND_HALF_UP, Decimal

import pytest

from flask_data_pipes_spark.operators.corpus import (
    KN_BOS,
    kn_trigram_logprob,
)

D = 0.75


def _rnd(v: float, dp: int) -> Decimal:
    return Decimal(repr(v)).quantize(Decimal(1).scaleb(-dp), ROUND_HALF_UP)


class RefKN:
    """Pure-Python interpolated KN trigram model over the same padded
    streams and the same operation order as the Spark operator."""

    def __init__(self, texts):
        self.tris = Counter()
        for t in texts:
            s = [KN_BOS, KN_BOS] + t.lower().split()
            for i in range(2, len(s)):
                self.tris[(s[i - 2], s[i - 1], s[i])] += 1
        self.c12, self.n12 = Counter(), Counter()
        for (a, b, c), v in self.tris.items():
            self.c12[(a, b)] += v
            self.n12[(a, b)] += 1
        self.ch = Counter()
        for (a, b, c) in self.tris:
            self.ch[(b, c)] += 1
        self.chs, self.n2 = Counter(), Counter()
        for (b, c), v in self.ch.items():
            self.chs[b] += v
            self.n2[b] += 1
        self.cw = Counter()
        for (b, c) in self.ch:
            self.cw[c] += 1
        self.tot = len(self.ch)

    def pcont(self, w):
        return self.cw.get(w, 0) / self.tot

    def pbig(self, b, c):
        return (
            max(self.ch.get((b, c), 0) - D, 0.0) / self.chs[b]
            + D * self.n2[b] / self.chs[b] * self.pcont(c)
        )

    def ptri(self, a, b, c):
        k = (a, b)
        return (
            max(self.tris.get((a, b, c), 0) - D, 0.0) / self.c12[k]
            + D * self.n12[k] / self.c12[k] * self.pbig(b, c)
        )

    def doc_score(self, text):
        s = [KN_BOS, KN_BOS] + text.lower().split()
        terms = [
            _rnd(math.log(self.ptri(s[i - 2], s[i - 1], s[i])), 9)
            for i in range(2, len(s))
        ]
        n = len(terms)
        avg = float(sum(terms)) / n
        return n, float(_rnd(avg, 6)), float(_rnd(-avg / math.log(2.0), 6))


TEXTS = [
    "the cat sat on the mat",
    "the dog sat on the rug",
    "the cat ate the fish",
    "a dog chased the cat around the garden",
    "fish swim in the pond near the garden",
]


def _df(spark, texts):
    return spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )


def test_kn_matches_pure_python_reference(spark):
    ref = RefKN(TEXTS)
    got = {
        r["doc_id"]: (r["n_tokens"], r["avg_logp"], r["bits_per_token"])
        for r in kn_trigram_logprob(_df(spark, TEXTS)).collect()
    }
    for i, t in enumerate(TEXTS):
        n, avg, bits = ref.doc_score(t)
        assert got[i][0] == n == len(t.split())
        assert got[i][1] == pytest.approx(avg, abs=2e-6)
        assert got[i][2] == pytest.approx(bits, abs=2e-6)


def test_kn_is_a_proper_distribution(spark):
    """For every observed context, P(·|w1,w2) sums to exactly 1 over
    the continuation vocabulary — the property that separates KN from
    an ad-hoc backoff."""
    ref = RefKN(TEXTS)
    vocab = sorted(ref.cw)  # every word ever seen as a continuation
    for ctx in list(ref.c12)[:10]:
        s = sum(ref.ptri(ctx[0], ctx[1], w) for w in vocab)
        assert s == pytest.approx(1.0, abs=1e-9), ctx


def test_kn_order_sensitivity(spark):
    """A document whose trigrams all repeat corpus patterns scores
    higher than the same tokens scrambled — the signal a trigram LM
    adds over unigram filters."""
    natural = "the cat sat on the mat"
    scrambled = "mat the on sat cat the"
    rows = {
        r["doc_id"]: r["avg_logp"]
        for r in kn_trigram_logprob(
            _df(spark, TEXTS + [natural, scrambled])
        ).collect()
    }
    assert rows[len(TEXTS)] > rows[len(TEXTS) + 1]


def test_kn_continuation_beats_raw_frequency(spark):
    """The Kneser-Ney signature: a word FREQUENT in one context only
    (our 'francisco') gets LESS backoff mass than a word of equal raw
    frequency spread across many contexts."""
    texts = [
        "san francisco",
        "san francisco",
        "san francisco",
        "red fish",
        "blue fish",
        "old fish",
    ]
    ref = RefKN(texts)
    # equal raw frequency (3 each), different context diversity
    assert ref.pcont("francisco") < ref.pcont("fish")


def test_kn_partitioning_independent(spark):
    df = _df(spark, TEXTS * 3)
    a = sorted(map(tuple, kn_trigram_logprob(df.repartition(1)).collect()))
    b = sorted(map(tuple, kn_trigram_logprob(df.repartition(9)).collect()))
    assert a == b


def test_kn_single_token_docs(spark):
    """One-token docs score via the double-BOS context; empty docs drop."""
    rows = kn_trigram_logprob(_df(spark, ["hello", "", "  "])).collect()
    assert len(rows) == 1 and rows[0]["n_tokens"] == 1
