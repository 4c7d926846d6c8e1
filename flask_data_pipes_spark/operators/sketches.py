"""Mergeable sketches for corpus-scale counting.

Count-min sketch (Cormode & Muthukrishnan 2005): a d x w integer
matrix where every item increments one counter per row (hash_i(v) mod
w); an item's estimate is the MIN over its d counters — never an
underestimate, overestimates bounded by ~N/w per row with probability
1 - (1/2)^d. The at-scale complement to exact top-k counting
(plans/catalog_llm.py::llm_ngram_topk): the sketch is O(d*w) no matter
the vocabulary, merges by cell-wise addition (map-side combinable,
cross-shard addable), and answers point queries without keeping the
long tail.

HyperLogLog (Flajolet et al. 2007): the "how many DISTINCT" complement
to the CMS's "how often" — m = 2^b registers each holding the maximum
leading-zero rank of the hash suffixes routed to it; cardinality is
estimated from the harmonic mean of the register values. O(m) state
for any cardinality, merges by register-wise MAX (idempotent — shard
unions and stream replays are both safe), standard error ≈ 1.04/√m.
At 100 TB this answers vocabulary growth, per-shard dedup-rate and
join-key cardinality questions without an exact distinct groupBy.

Everything is md5-hashed (functions/text.md5_long) so builds,
estimates, and register tables are deterministic and
DuckDB-oracle-checkable; the raw HLL estimate is additionally
arranged to be bit-identical cross-engine (integer-scaled harmonic
sum — see `hll_estimate`).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, functions as F

from ..functions import text as T

__all__ = [
    "cms_build",
    "cms_estimate",
    "hll_build",
    "hll_merge",
    "hll_estimate",
    "HLL_HASH_BITS",
    "bottomk_sample",
    "bottomk_merge",
    "sample_quantiles",
    "kmv_overlap",
    "kmv_overlap_matrix",
    "KLLSketch",
    "kll_build",
    "kll_merge",
    "kll_quantiles",
    "kll_rank",
    "MGSketch",
    "mg_build",
    "mg_merge",
    "mg_topk",
]


def cms_build(
    df: DataFrame,
    value_col: str,
    d: int = 4,
    w: int = 1024,
    seed: int = 41,
) -> DataFrame:
    """Build a count-min sketch over `value_col` → (row, bucket, cnt)
    with at most d*w rows.

    Scale shape: the d-way per-item fan-out happens INSIDE the map
    stage (an inline d-element array explode), and the only shuffle is
    the groupBy on (row, bucket) — at most d*w distinct keys, so
    partial aggregation collapses virtually everything map-side. The
    result is tiny and broadcast-joinable; sketches from different
    corpus shards (or streaming micro-batches) merge by summing cnt
    per (row, bucket).
    """
    cells = F.array(
        *[
            F.struct(
                F.lit(i).alias("row"),
                (T.md5_long(F.col(value_col), seed + i) % F.lit(w)).alias(
                    "bucket"
                ),
            )
            for i in range(d)
        ]
    )
    return (
        df.select(F.explode(cells).alias("__c"))
        .select(F.col("__c.row").alias("row"), F.col("__c.bucket").alias("bucket"))
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    values: DataFrame,
    value_col: str,
    d: int = 4,
    w: int = 1024,
    seed: int = 41,
) -> DataFrame:
    """Point-query the sketch for each row of `values` → input columns
    + `est` (the count-min estimate, >= the true count).

    `d`, `w`, `seed` must match the build. The query side fans out
    d-ways and joins the (tiny) sketch on (row, bucket) — broadcast
    the sketch side; a bucket an item hashes to but no build item
    touched contributes 0 (left join + coalesce), which keeps the
    never-underestimate guarantee for unseen items (estimate 0 only
    if ALL d cells are empty).
    """
    cells = F.array(
        *[
            F.struct(
                F.lit(i).alias("row"),
                (T.md5_long(F.col(value_col), seed + i) % F.lit(w)).alias(
                    "bucket"
                ),
            )
            for i in range(d)
        ]
    )
    probes = values.select(
        "*", F.explode(cells).alias("__c")
    ).select(
        *values.columns,
        F.col("__c.row").alias("row"),
        F.col("__c.bucket").alias("bucket"),
    )
    return (
        probes.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy(*values.columns)
        .agg(
            F.min(F.coalesce(F.col("cnt"), F.lit(0)))
            .cast("long")
            .alias("est")
        )
    )


# --- HyperLogLog -----------------------------------------------------------

HLL_HASH_BITS = 60  # md5_long width; register index takes the TOP b bits


def _hll_width(b: int) -> int:
    """Suffix width W = hash bits - register bits; rho ranges [1, W+1]."""
    if not 2 <= b <= 16:
        raise ValueError(f"b must be in [2, 16], got {b}")
    return HLL_HASH_BITS - b


def hll_build(
    df: DataFrame,
    value_col: str,
    b: int = 6,
    seed: int = 43,
    by: str | None = None,
) -> DataFrame:
    """Build an HLL register table over `value_col` → (register, rho)
    with at most m = 2^b rows.

    register = top b bits of the 60-bit md5 hash; rho = 1 + the number
    of leading zeros of the remaining W = 60-b bits (W+1 when the
    suffix is all zeros). The aggregate keeps MAX(rho) per register —
    registers no value hashed into are simply absent (they are the
    "zero registers"; `hll_estimate` counts them as m - rows).

    Scale shape: one narrow map (hash + shifts, pure codegen — the
    leading-zero count is `W+1 - length(bin(suffix))`, an integer
    expression, no UDF) and one groupBy with ≤ 2^b distinct keys, so
    partial aggregation collapses everything map-side and the shuffle
    moves ≤ m rows per input partition. The result is tiny,
    broadcastable, and merges across shards / micro-batches by
    register-wise max (`hll_merge`).

    `by` builds one sketch PER GROUP (e.g. per source): the aggregate
    key becomes (by, register), ≤ groups·2^b rows — per-group
    cardinality (source vocab growth, per-shard dedup-rate inputs)
    from the same single pass.
    """
    w = _hll_width(b)
    h = T.md5_long(F.col(value_col), seed)
    reg = F.shiftright(h, w)
    suffix = h.bitwiseAND(F.lit((1 << w) - 1))
    rho = F.when(suffix == 0, F.lit(w + 1)).otherwise(
        F.lit(w + 1) - F.length(F.bin(suffix))
    )
    keys = ([by] if by else []) + ["register"]
    cols = ([F.col(by)] if by else []) + [
        reg.alias("register"),
        rho.cast("int").alias("rho"),
    ]
    return df.select(*cols).groupBy(*keys).agg(F.max("rho").alias("rho"))


def hll_merge(sketches: Sequence[DataFrame], by: str | None = None) -> DataFrame:
    """Merge register tables from shards/batches: register-wise MAX.
    Max is idempotent, so merging overlapping or replayed sketches is
    harmless — the union of shard sketches equals the whole-corpus
    build exactly (asserted in tests).

    Grouped sketches (built with `hll_build(by=...)`) must pass the
    same `by` here — merging a grouped sketch without it would
    silently collapse every group into one wrong whole-population
    sketch, so the shape is asserted."""
    import functools

    merged = functools.reduce(lambda a, c: a.unionByName(c), sketches)
    expected = ([by] if by else []) + ["register", "rho"]
    if sorted(merged.columns) != sorted(expected):
        raise ValueError(
            f"hll_merge(by={by!r}) expects sketch columns {expected}, "
            f"got {merged.columns} — pass by= for grouped sketches"
        )
    keys = ([by] if by else []) + ["register"]
    return merged.groupBy(*keys).agg(F.max("rho").alias("rho"))


def _hll_alpha(m: int) -> float:
    return {16: 0.673, 32: 0.697, 64: 0.709}.get(
        m, 0.7213 / (1.0 + 1.079 / m)
    )


def hll_estimate(
    sketch: DataFrame,
    b: int = 6,
    corrected: bool = False,
    by: str | None = None,
) -> DataFrame:
    """One-row estimate from a register table → (m, n_zero,
    est_distinct).

    The raw HLL estimator is alpha_m * m^2 / Σ_j 2^-M_j. Computed
    naively that sum is an order-dependent float reduction; here it is
    an INTEGER sum instead — Σ 2^(S - rho) with S = W+1 ≥ max(rho)
    scaled back in one literal constant C = alpha_m * m^2 * 2^S — so
    every engine computes bit-identical results regardless of
    aggregation order (the catalog oracle replays the same arithmetic
    in DuckDB). Zero registers (absent rows) contribute 2^S each.

    `corrected=True` additionally applies the standard small-range
    linear-counting correction (est ≤ 2.5m and zero registers exist →
    m·ln(m/V)); it uses libm log, so the oracle-checked catalog entry
    keeps the raw estimator and the correction stays a caller-side
    refinement (documented contract: at corpus scale — cardinality
    ≫ m — the raw estimator is the operative regime anyway).
    """
    w = _hll_width(b)
    m = 1 << b
    s_bits = w + 1  # scale exponent; rho <= w+1 so terms are >= 2^0
    c_lit = _hll_alpha(m) * m * m * float(1 << s_bits)
    aggs = [
        F.count(F.lit(1)).alias("__present"),
        F.sum(F.expr(f"shiftleft(1L, {s_bits} - rho)")).alias("__sp"),
    ]
    agg = sketch.groupBy(by).agg(*aggs) if by else sketch.agg(*aggs)
    n_zero = (F.lit(m) - F.col("__present")).cast("long")
    total = F.coalesce(F.col("__sp"), F.lit(0)) + n_zero * F.lit(1 << s_bits)
    est = F.lit(c_lit) / total.cast("double")
    if corrected:
        lc = F.lit(float(m)) * F.log(F.lit(float(m)) / n_zero.cast("double"))
        est = F.when((est <= 2.5 * m) & (n_zero > 0), lc).otherwise(est)
    out = ([F.col(by)] if by else []) + [
        F.lit(m).cast("long").alias("m"),
        n_zero.alias("n_zero"),
        est.alias("est_distinct"),
    ]
    return agg.select(*out)


# --- bottom-k hash sample (mergeable bounded uniform sample) ---------------


def bottomk_sample(
    df: DataFrame,
    id_col: str,
    k: int = 1024,
    seed: int = 47,
) -> DataFrame:
    """The k rows with the SMALLEST deterministic hash of `id_col` — a
    bounded, mergeable uniform sample without replacement (the classic
    bottom-k sketch): because "k smallest of a union" equals "k
    smallest of the per-shard k-smallest", per-shard/per-batch samples
    merge by union + re-select (`bottomk_merge`), and a replayed batch
    contributes the exact same (hash, id) rows, so merging is
    idempotent. The complement to CMS (how often) and HLL (how many
    distinct): a fixed-k sample answers "how DISTRIBUTED" — quantiles,
    histograms, eyeball rows — with O(k) state at any corpus size.

    Scale shape: `orderBy(hash).limit(k)` plans as
    TakeOrderedAndProject — per-partition partial top-k, then a single
    k-row merge on one reducer; the corpus is never globally sorted
    and never shuffled (plan-asserted in tests). Ties cannot occur:
    the sort key is (hash, id) and id is unique.
    """
    h = T.md5_long(F.col(id_col), seed)
    return (
        df.withColumn("__h", h)
        .orderBy(F.col("__h"), F.col(id_col))
        .limit(k)
        .drop("__h")
    )


def bottomk_merge(
    samples: Sequence[DataFrame], id_col: str, k: int = 1024, seed: int = 47
) -> DataFrame:
    """Merge per-shard bottom-k samples: union, re-select the global
    bottom-k under the SAME hash. Equals the whole-corpus sample
    exactly (asserted in tests)."""
    import functools

    merged = functools.reduce(lambda a, c: a.unionByName(c), samples)
    return bottomk_sample(merged.dropDuplicates([id_col]), id_col, k, seed)


def sample_quantiles(
    sample: DataFrame,
    value_col: str,
    id_col: str,
    quantiles: Sequence[float] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Deterministic quantile estimates from a (small, e.g. bottom-k)
    sample → one row per requested q: (q, value). Selection is the
    EXACT sample element at rank floor(q·(n−1)) (0-based, lower
    interpolation) under the total order (value, id) — integer
    selection, no float interpolation, so Spark and the DuckDB oracle
    agree bit-for-bit. Rank error vs the true corpus quantile is the
    standard bottom-k sampling bound O(1/√k).

    Scale shape: the sample is k rows; one sort_array over a
    collect_list on ≤k structs — a single tiny aggregate, no window,
    no second pass over the corpus.
    """
    arr = F.sort_array(
        F.collect_list(F.struct(F.col(value_col).alias("v"), F.col(id_col)))
    )
    agg = sample.agg(arr.alias("__a"), F.count(F.lit(1)).alias("__n"))
    picks = F.array(
        *[
            F.struct(
                F.lit(float(q)).alias("q"),
                F.element_at(
                    F.col("__a"),
                    (
                        F.floor(F.lit(float(q)) * (F.col("__n") - 1)) + 1
                    ).cast("int"),
                )["v"].alias("value"),
            )
            for q in quantiles
        ]
    )
    return agg.select(F.explode(picks).alias("__p")).select(
        F.col("__p.q").alias("q"), F.col("__p.value").alias("value")
    )


KMV_HASH_SPACE = float(1 << 60)  # md5_long is 60-bit


def kmv_overlap(
    a: DataFrame,
    b: DataFrame,
    id_col: str,
    k: int = 1024,
    seed: int = 47,
) -> DataFrame:
    """Set-OVERLAP estimation from two KMV (bottom-k hash) sketches
    (Beyer et al. 2007; Cohen & Kaplan 2007): estimate the Jaccard
    similarity, union cardinality, and intersection size of two sets
    from O(k) state per side — "how much do these corpora share"
    without ever joining them. The fourth leg of the mergeable-sketch
    family: CMS (how often), HLL (how many distinct), bottom-k (how
    distributed), KMV-overlap (how SHARED).

    Method: the k smallest hashes of A∪B equal the k smallest of the
    two sketches' union, and within that union-sketch each hash is a
    uniform sample of A∪B — so the fraction carrying BOTH side-tags
    estimates J(A,B), and |A∩B| ≈ J · |A∪B| with |A∪B| from the
    classic KMV estimator (k−1)/max_hash_normalized (exact count when
    the union has fewer than k distinct elements). Expected relative
    error ~ 1/√k.

    Output (1 row): k_eff (union-sketch size), n_common,
    jaccard_est, union_est, intersection_est — every value
    deterministic (md5 hash + integer selection + one double
    division), so a DuckDB oracle reproduces it bit-for-bit.

    Scale shape: each side is `distinct → orderBy(hash).limit(k)` —
    TakeOrderedAndProject (per-partition partial top-k, one k-row
    merge; no global sort). Everything after runs on ≤2k rows. The
    distinct is the only corpus-sized shuffle, and sketches persist /
    merge across shards exactly like `bottomk_merge`.
    """

    def sketch(df: DataFrame) -> DataFrame:
        return (
            df.select(T.md5_long(F.col(id_col), seed).alias("__h"))
            .distinct()
            .orderBy("__h")
            .limit(k)
        )

    sa = sketch(a).select("__h", F.lit(1).alias("__a"), F.lit(0).alias("__b"))
    sb = sketch(b).select("__h", F.lit(0).alias("__a"), F.lit(1).alias("__b"))
    merged = (
        sa.unionByName(sb)
        .groupBy("__h")
        .agg(F.max("__a").alias("__a"), F.max("__b").alias("__b"))
        .orderBy("__h")
        .limit(k)
    )
    agg = merged.agg(
        F.count(F.lit(1)).alias("k_eff"),
        F.sum(F.col("__a") * F.col("__b")).cast("long").alias("n_common"),
        F.max("__h").alias("__hmax"),
    )
    jacc = F.round(
        F.col("n_common").cast("double") / F.col("k_eff").cast("double"), 6
    )
    union_est = F.when(
        F.col("k_eff") < F.lit(k), F.col("k_eff").cast("double")
    ).otherwise(
        F.round(
            F.lit(float(k - 1))
            / (F.col("__hmax").cast("double") / F.lit(KMV_HASH_SPACE)),
            6,
        )
    )
    return agg.select(
        F.col("k_eff"),
        F.col("n_common"),
        jacc.alias("jaccard_est"),
        union_est.alias("union_est"),
        F.round(jacc * union_est, 6).alias("intersection_est"),
    )


def kmv_overlap_matrix(
    df: DataFrame,
    id_col: str,
    by: str,
    k: int = 256,
    seed: int = 47,
) -> DataFrame:
    """Pairwise set-overlap matrix over GROUPS: for every unordered
    pair of `by` values, the KMV Jaccard / union / intersection
    estimates of their `id_col` sets — `kmv_overlap` generalized from
    two corpora to a G-way population (cross-SOURCE vocabulary
    duplication screening: "which crawl sources are mirrors of each
    other", the input to source-level dedup priorities).

    Output: one row per pair (g_a < g_b lexicographically) —
    (g_a, g_b, k_eff, n_common, jaccard_est, union_est,
    intersection_est) — every value deterministic and DuckDB-matchable
    (md5 hashes, integer selection, one double division per estimate).

    Scale shape: ONE corpus-keyed shuffle (the (group, hash) distinct),
    then a per-group bottom-k window over the ≤distinct-values rows;
    everything pairwise runs on sketches only: G·k sketch rows fan out
    to at most (G−1)·G·k/2 · 2 tagged rows (k is small — 256 default —
    and no corpus data is touched). For thousands of groups, shrink k
    or pre-block pairs (e.g. only pairs sharing a sketch-minimum
    bucket) — the matrix itself is inherently G²-sized.
    """
    from pyspark.sql import Window

    base = (
        df.select(
            F.col(by).alias("__g"),
            T.md5_long(F.col(id_col), seed).alias("__h"),
        )
        .distinct()
    )
    w = Window.partitionBy("__g").orderBy("__h")
    sketches = (
        base.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
        # three consumers (group list + both pair legs): materialize
        # the G*k-row sketch table once instead of re-running the
        # corpus distinct per branch
        .localCheckpoint()
    )
    groups = sketches.select("__g").distinct()
    pairs = groups.select(F.col("__g").alias("g_a")).join(
        groups.select(F.col("__g").alias("g_b")),
        F.col("g_a") < F.col("g_b"),
    )
    sa = pairs.join(
        sketches.withColumnRenamed("__g", "g_a"), "g_a"
    ).select(
        "g_a", "g_b", "__h", F.lit(1).alias("__a"), F.lit(0).alias("__b")
    )
    sb = pairs.join(
        sketches.withColumnRenamed("__g", "g_b"), "g_b"
    ).select(
        "g_a", "g_b", "__h", F.lit(0).alias("__a"), F.lit(1).alias("__b")
    )
    merged = (
        sa.unionByName(sb)
        .groupBy("g_a", "g_b", "__h")
        .agg(F.max("__a").alias("__a"), F.max("__b").alias("__b"))
    )
    wk = Window.partitionBy("g_a", "g_b").orderBy("__h")
    union_sketch = merged.withColumn(
        "__rn", F.row_number().over(wk)
    ).filter(F.col("__rn") <= k)
    agg = union_sketch.groupBy("g_a", "g_b").agg(
        F.count(F.lit(1)).alias("k_eff"),
        F.sum(F.col("__a") * F.col("__b")).cast("long").alias("n_common"),
        F.max("__h").alias("__hmax"),
    )
    jacc = F.round(
        F.col("n_common").cast("double") / F.col("k_eff").cast("double"), 6
    )
    union_est = F.when(
        F.col("k_eff") < F.lit(k), F.col("k_eff").cast("double")
    ).otherwise(
        F.round(
            F.lit(float(k - 1))
            / (F.col("__hmax").cast("double") / F.lit(KMV_HASH_SPACE)),
            6,
        )
    )
    return agg.select(
        "g_a",
        "g_b",
        "k_eff",
        "n_common",
        jacc.alias("jaccard_est"),
        union_est.alias("union_est"),
        F.round(jacc * union_est, 6).alias("intersection_est"),
    ).orderBy("g_a", "g_b")


# --- KLL-shape mergeable quantile sketch (round 10) --------------------------
#
# Completes the sketch quartet's missing axis: CMS answers "how often",
# HLL "how many distinct", bottom-k "how distributed (probabilistic)";
# KLL answers "how distributed, GUARANTEED" — a mergeable sketch whose
# rank error is bounded a priori, the property a 100 TB profiling pass
# needs (bottom-k's quantile error is only probabilistic, equidepth
# bins are post-hoc).
#
# This is the deterministic compactor variant of Karnin-Lang-Liberty
# 2016 (the MRL98 lineage): L levels of capacity-k sorted buffers;
# item weight at level l is 2^l; an overflowing level sorts its buffer
# and promotes alternating elements (the parity flips per compaction,
# halving correlated error) to the level above. EVERY compaction of
# weight-w items introduces <= w rank error for ANY query, so the
# sketch TRACKS its own bound: err_bound = sum of 2^l over the
# compactions performed; estimates are then certified |rank_est -
# rank_true| <= err_bound, and err_bound itself is O((n/k)·log(n/k))
# deterministic worst-case (property-tested). Determinism (no coin
# flips, unlike the randomized KLL paper variant) is what makes builds
# replayable and golden-pinnable; the cost is the log factor in the
# bound.
#
# Merge: level-wise buffer concatenation + the same compaction cascade
# — total weight is preserved EXACTLY (compactions only ever promote
# an even count), err bounds add, so shard sketches and stream batches
# combine associatively. merge(build(A), build(B)) is a valid sketch
# of A ∪ B with bound err(A)+err(B)+merge-compaction error (asserted
# in tests; unlike CMS/HLL the merged sketch is not bit-identical to
# the whole-build — only the guarantee is preserved, which is the
# paper's contract).


class KLLSketch:
    """Pure-Python deterministic KLL-shape quantile sketch. Used
    driver-side and inside the Arrow kernels of `kll_build`/
    `kll_merge`; also the reference object the property tests exercise
    directly."""

    def __init__(self, k: int = 200):
        if k < 8:
            raise ValueError("kll k must be >= 8")
        self.k = int(k)
        self.levels: list = [[]]
        self.n = 0
        self.err_bound = 0
        self._parity: dict = {}

    def update(self, v: float) -> None:
        self.levels[0].append(float(v))
        self.n += 1
        if len(self.levels[0]) >= self.k:
            self._compact_cascade()

    def extend(self, vs) -> None:
        for v in vs:
            self.update(v)

    def _compact_cascade(self) -> None:
        l = 0
        while l < len(self.levels):
            if len(self.levels[l]) >= self.k:
                self._compact(l)
            l += 1

    def _compact(self, l: int) -> None:
        buf = sorted(self.levels[l])
        # only an even count compacts exactly (2m weight-w items ->
        # m weight-2w items); an odd straggler stays at this level
        if len(buf) % 2 == 1:
            keep_back = [buf[-1]]
            buf = buf[:-1]
        else:
            keep_back = []
        if not buf:
            return
        p = self._parity.get(l, 0)
        promoted = buf[p::2]
        self._parity[l] = p ^ 1
        self.levels[l] = keep_back
        if l + 1 == len(self.levels):
            self.levels.append([])
        self.levels[l + 1].extend(promoted)
        self.err_bound += 1 << l

    def merge(self, other: "KLLSketch") -> "KLLSketch":
        if other.k != self.k:
            raise ValueError("kll merge requires equal k")
        while len(self.levels) < len(other.levels):
            self.levels.append([])
        for l, buf in enumerate(other.levels):
            self.levels[l].extend(buf)
        self.n += other.n
        self.err_bound += other.err_bound
        self._compact_cascade()
        return self

    def items(self):
        """All (level, value) pairs — the sketch's row representation
        (weight of a pair is 2^level; sum of weights == n exactly)."""
        for l, buf in enumerate(self.levels):
            for v in buf:
                yield (l, v)

    @classmethod
    def from_rows(cls, rows, k: int) -> "KLLSketch":
        """Rebuild from (level, value) rows — ORDER-INSENSITIVE (each
        compaction sorts its buffer first and parities start at 0), so
        reconstructing a shuffled row set is deterministic.

        The rebuilt `err_bound` counts only THIS rebuild's compactions —
        the row representation cannot carry the producer's compaction
        history. Certify row-reconstructed sketches with the a-priori
        worst-case formula ((log2(n)+1)·n/(k−1)) instead of the tracked
        bound (the distributed kll_build/kll_merge path is in this
        regime by construction)."""
        s = cls(k)
        for l, v in rows:
            l = int(l)
            while len(s.levels) <= l:
                s.levels.append([])
            s.levels[l].append(float(v))
            s.n += 1 << l
        s._compact_cascade()
        return s

    def quantile_err_bound(self) -> int:
        """Certified rank-error bound for `quantile()` answers:
        `err_bound` (rank-estimate error from compactions) plus the
        heaviest item weight minus 1 — the selection rule returns the
        first value whose CUMULATIVE weight reaches the target, which
        can overshoot by up to one item's weight (2^top_level)."""
        return self.err_bound + (1 << (len(self.levels) - 1)) - 1

    def rank(self, x: float) -> int:
        """Estimated number of items <= x."""
        r = 0
        for l, buf in enumerate(self.levels):
            w = 1 << l
            for v in buf:
                if v <= x:
                    r += w
        return r

    def quantile(self, q: float) -> float:
        """Smallest sketch value whose cumulative weight reaches
        floor(q·(n−1)) + 1 (the lower-interpolation rank rule
        `sample_quantiles` uses). Raises on an empty sketch."""
        if self.n == 0:
            raise ValueError("empty sketch")
        if not 0.0 <= q <= 1.0:
            raise ValueError("q must be in [0, 1]")
        target = int(q * (self.n - 1)) + 1
        pairs = sorted(
            (v, 1 << l) for l, buf in enumerate(self.levels) for v in buf
        )
        cum = 0
        for v, w in pairs:
            cum += w
            if cum >= target:
                return v
        return pairs[-1][0]


def kll_build(
    df: DataFrame,
    value_col: str,
    k: int = 200,
    id_col: str | None = None,
    partitions: int = 32,
) -> DataFrame:
    """Build per-partition KLL sketches over `value_col` → sketch rows
    (level int, value double), ≤ k·log₂(rows/k) rows per partition.
    One Arrow pass, NO shuffle in the default mode; `kll_merge`
    combines the per-partition sketches.

    `id_col` switches on DETERMINISTIC mode: rows are hash-routed into
    a FIXED number of partitions and sorted within each, so the sketch
    is identical regardless of input split/parallelism — what golden
    pins and replayed jobs need. Costs one shuffle; the error bound
    holds either way, so production profiling can skip it.

    Scale: state is O(k log n) per partition regardless of data size;
    at 1000 executors the build emits ~P·k·log(n) tiny rows, and the
    merge tree (`kll_merge(..., partitions=√P)` then `partitions=1`)
    never concentrates more than a few MB anywhere.
    """
    src = df.select(F.col(value_col).cast("double").alias("v"))
    if id_col is not None:
        src = (
            df.select(
                F.col(value_col).cast("double").alias("v"),
                T.md5_long(F.col(id_col), 7).alias("__r"),
            )
            .repartition(partitions, F.pmod(F.col("__r"), F.lit(partitions)))
            # v as secondary key: a 60-bit hash collision between two
            # ids would otherwise leave their relative order undefined
            .sortWithinPartitions("__r", "v")
            .select("v")
        )
    kk = int(k)

    def build(it):
        import pandas as pd

        s = KLLSketch(kk)
        for pdf in it:
            col = pdf["v"].dropna()
            s.extend(float(x) for x in col)
        rows = list(s.items())
        yield pd.DataFrame(
            {
                "level": pd.Series([r[0] for r in rows], dtype="int32"),
                "value": pd.Series([r[1] for r in rows], dtype="float64"),
            }
        )

    return src.mapInPandas(build, schema="level int, value double")


def kll_merge(sketch: DataFrame, k: int = 200, partitions: int = 1) -> DataFrame:
    """Merge sketch rows down to `partitions` sketches (1 = a single
    global sketch): reconstruct per partition (order-insensitive) and
    re-compact. For P >> 1000 input partitions, call twice with a √P
    intermediate so no task ever holds more than √P·k·log(n) rows."""
    kk = int(k)

    def merge(it):
        import pandas as pd

        rows: list = []
        for pdf in it:
            rows.extend(zip(pdf["level"], pdf["value"]))
        s = KLLSketch.from_rows(rows, kk)
        out = list(s.items())
        yield pd.DataFrame(
            {
                "level": pd.Series([r[0] for r in out], dtype="int32"),
                "value": pd.Series([r[1] for r in out], dtype="float64"),
            }
        )

    return sketch.repartition(partitions).mapInPandas(
        merge, schema="level int, value double"
    )


def kll_quantiles(
    sketch: DataFrame, quantiles: Sequence[float] = (0.5, 0.9, 0.99)
) -> DataFrame:
    """Quantile estimates from sketch rows → (q, value, n) — pure
    Catalyst on the tiny sketch table (one collect_list aggregate +
    a sorted fold, the `sample_quantiles` shape): value = smallest
    sketch value whose cumulative weight reaches floor(q·(n−1)) + 1,
    identical to `KLLSketch.quantile` (asserted in tests). n is the
    EXACT item count (compaction preserves total weight)."""
    pairs = F.sort_array(
        F.collect_list(
            F.struct(
                F.col("value").alias("v"),
                F.call_function(
                    "shiftleft",
                    F.lit(1).cast("long"),
                    F.col("level").cast("int"),
                ).alias("w"),
            )
        )
    )
    agg = F.aggregate(
        F.col("__pairs"),
        F.lit(0).cast("long"),
        lambda acc, p: acc + p["w"],
    )
    base = sketch.agg(pairs.alias("__pairs")).withColumn("__n", agg)

    def pick(q: float):
        target = F.floor(F.lit(float(q)) * (F.col("__n") - 1)).cast("long") + 1
        fold = F.aggregate(
            F.col("__pairs"),
            F.struct(
                F.lit(0).cast("long").alias("cum"),
                F.lit(None).cast("double").alias("ans"),
            ),
            lambda acc, p: F.struct(
                (acc["cum"] + p["w"]).alias("cum"),
                F.when(
                    acc["ans"].isNull() & (acc["cum"] + p["w"] >= target),
                    p["v"],
                ).otherwise(acc["ans"]).alias("ans"),
            ),
            lambda acc: acc["ans"],
        )
        return F.struct(
            F.lit(float(q)).alias("q"),
            F.coalesce(
                fold, F.element_at(F.col("__pairs"), -1)["v"]
            ).alias("value"),
        )

    picks = F.array(*[pick(q) for q in quantiles])
    return base.select(
        F.explode(picks).alias("__p"), F.col("__n").alias("n")
    ).select(F.col("__p.q").alias("q"), F.col("__p.value").alias("value"), "n")


def kll_rank(sketch: DataFrame, probes: Sequence[float]) -> DataFrame:
    """Rank estimates from sketch rows → (x, rank_est, n): rank_est =
    estimated #items <= x, certified within the build's err_bound —
    the inverse of `kll_quantiles`, pure Catalyst on the tiny sketch
    table (one fold per probe over one collect_list aggregate).
    Identical to `KLLSketch.rank` (asserted in tests)."""
    pairs = F.collect_list(
        F.struct(
            F.col("value").alias("v"),
            F.call_function(
                "shiftleft", F.lit(1).cast("long"), F.col("level").cast("int")
            ).alias("w"),
        )
    )
    base = sketch.agg(pairs.alias("__pairs"))
    n = F.aggregate(
        F.col("__pairs"), F.lit(0).cast("long"), lambda acc, p: acc + p["w"]
    )

    def rank_of(x: float):
        return F.struct(
            F.lit(float(x)).alias("x"),
            F.aggregate(
                F.col("__pairs"),
                F.lit(0).cast("long"),
                lambda acc, p: acc
                + F.when(p["v"] <= F.lit(float(x)), p["w"]).otherwise(
                    F.lit(0).cast("long")
                ),
            ).alias("rank_est"),
        )

    picks = F.array(*[rank_of(x) for x in probes])
    return base.select(
        F.explode(picks).alias("__p"), n.alias("n")
    ).select(F.col("__p.x").alias("x"), F.col("__p.rank_est").alias("rank_est"), "n")


# --- Misra-Gries heavy hitters (round 10) ------------------------------------
#
# The "WHICH items are heavy" member of the sketch family: CMS answers
# point queries about items you already know; Misra-Gries 1982 FINDS
# the heavy hitters in O(k) state with a deterministic guarantee —
# est(item) <= true(item) <= est(item) + dec, where `dec` is the
# sketch's tracked total decrement and dec <= n/(k+1) (so any item with
# true count > n/(k+1) is GUARANTEED present). Per-shard summaries
# merge by counter addition + one (k+1)-th-largest subtraction and the
# bound still holds on the union (Agarwal et al. 2012, "Mergeable
# Summaries") — the property a 100 TB vocabulary/top-URL/hot-key pass
# needs; property-tested like KLL's certificate.


class MGSketch:
    """Pure-Python Misra-Gries summary: ≤ k counters + the tracked
    decrement total `dec` (the self-certificate: every estimate is an
    under-count by at most `dec`). Used driver-side, inside the Arrow
    kernels of `mg_build`/`mg_merge`, and directly by the property
    tests."""

    def __init__(self, k: int = 64):
        if k < 1:
            raise ValueError("mg k must be >= 1")
        self.k = int(k)
        self.counters: dict = {}
        self.dec = 0
        self.n = 0

    def update(self, item) -> None:
        self.n += 1
        c = self.counters
        if item in c:
            c[item] += 1
        elif len(c) < self.k:
            c[item] = 1
        else:
            # decrement-all round: removes one unit from k counters AND
            # the incoming item — (k+1) units per round, so rounds
            # (= dec) are bounded by n/(k+1)
            self.dec += 1
            dead = []
            for it in c:
                c[it] -= 1
                if c[it] == 0:
                    dead.append(it)
            for it in dead:
                del c[it]

    def extend(self, items) -> None:
        for it in items:
            self.update(it)

    def merge(self, other: "MGSketch") -> "MGSketch":
        if other.k != self.k:
            raise ValueError("mg merge requires equal k")
        c = self.counters
        for it, v in other.counters.items():
            c[it] = c.get(it, 0) + v
        self.n += other.n
        self.dec += other.dec
        if len(c) > self.k:
            # subtract the (k+1)-th largest value, drop non-positives
            vals = sorted(c.values(), reverse=True)
            cut = vals[self.k]
            self.dec += cut
            self.counters = {
                it: v - cut for it, v in c.items() if v - cut > 0
            }
        return self

    def estimate(self, item) -> int:
        return self.counters.get(item, 0)


def mg_build(
    df: DataFrame,
    value_col: str,
    k: int = 64,
    build_id: Optional[str] = None,
) -> DataFrame:
    """Per-partition Misra-Gries summaries over `value_col` → rows
    (sid, item, cnt, dec, nrows): ≤ k counter rows per input partition,
    all rows of a partition carrying its sketch's decrement total and
    its row count (`nrows` — the integrity checksum `mg_merge` uses to
    detect ANY two sketches fused onto one sid, ADVICE r11). One
    Arrow pass, NO shuffle; `mg_merge` combines the summaries.

    `sid` is "<build_id>-<partition_id>" — a fresh uuid per CALL unless
    `build_id` is given — so two builds UNIONED into one table (per-day
    summaries appended, streaming batches) keep distinct sketch
    identities and `mg_merge` sums their decrements instead of fusing
    same-numbered partitions with max(dec), which would silently void
    the est ≤ true ≤ est + dec certificate (ADVICE r10). Pass an
    explicit `build_id` for deterministic sids (golden pins, replays).

    Scale: state is O(k) per partition at any data size; at 1000
    executors the build emits ≤ P·k tiny rows and the merge reduces
    them in one (or, for huge P, tree-wise) pass."""
    import uuid as _uuid

    kk = int(k)
    bid = build_id if build_id is not None else _uuid.uuid4().hex[:12]
    src = df.select(
        F.spark_partition_id().alias("__pid"),
        F.col(value_col).cast("string").alias("item"),
    )

    def build(it):
        import pandas as pd

        s = MGSketch(kk)
        pid = None
        for pdf in it:
            if pid is None and len(pdf):
                pid = int(pdf["__pid"].iloc[0])
            s.extend(pdf["item"].dropna())
        items = sorted(s.counters.items())
        sid = f"{bid}-{pid}"
        if not items and pid is not None and s.dec > 0:
            # a sketch can end with EMPTY counters but nonzero dec (a
            # decrement round that wipes every counter, e.g. k+1
            # distinct items cycling) — emit a null-item sentinel so
            # the decrement total is never lost: dropping it would
            # silently void est <= true <= est + dec on any merge
            # containing this shard (round-11 fix; the old pairwise
            # merge's inflated dec masked exactly this)
            yield pd.DataFrame(
                {
                    "sid": pd.Series([sid], dtype="object"),
                    "item": pd.Series([None], dtype="object"),
                    "cnt": pd.Series([0], dtype="int64"),
                    "dec": pd.Series([s.dec], dtype="int64"),
                    "nrows": pd.Series([1], dtype="int64"),
                }
            )
            return
        yield pd.DataFrame(
            {
                "sid": pd.Series([sid] * len(items), dtype="object"),
                "item": pd.Series([i for i, _ in items], dtype="object"),
                "cnt": pd.Series([c for _, c in items], dtype="int64"),
                "dec": pd.Series([s.dec] * len(items), dtype="int64"),
                "nrows": pd.Series([len(items)] * len(items), dtype="int64"),
            }
        )

    return src.mapInPandas(
        build,
        schema="sid string, item string, cnt long, dec long, nrows long",
    )


def mg_merge(
    sketch: DataFrame,
    k: int = 64,
    partitions: int = 1,
    build_id: Optional[str] = None,
) -> DataFrame:
    """Merge MG summary rows down to `partitions` summaries (1 = one
    global summary), rows (sid, item, cnt, dec, nrows) with sid =
    "<merge build_id>-<output partition>": reconstruct per-sid sketches
    (dec is per-sketch state, which is why the rows carry sid) and fold
    them. The guarantee survives merging: est <= true <= est + dec on
    the UNION — decrements of DISTINCT source sketches add.

    Guards (ADVICE r10, completed r11): two different sketches sharing
    one sid (two builds unioned with a forced identical build_id, or a
    replayed batch appended instead of overwritten) would fuse into a
    single under-decremented sketch, voiding the certificate silently —
    so the kernel raises on every detectable shape: a duplicate
    (sid, item) row, rows of one sid disagreeing on dec, rows
    disagreeing on the builder-declared row count `nrows`, or the
    observed row count differing from `nrows`. The `nrows` checksum
    makes the guard COMPLETE: any fused pair either disagrees on
    nrows (n1 != n2) or doubles the observed count (2n != n).

    The fold is M-WAY, not pairwise: all sketches' counters and
    decrements SUM, then at most ONE (k+1)-th-largest cut trims the
    union back to k (Agarwal et al.'s merge generalized — valid by the
    same argument, since a single cut of value c adds exactly c to
    every estimate's under-count). Two wins over folding pairwise:
    dec grows by one cut instead of up to m−1, and the result is
    ORDER-INSENSITIVE — deterministic even though uuid-prefixed sids
    sort randomly (pairwise MG's cut cascade depends on accumulation
    order, which would make lossy-regime output flap run to run)."""
    kk = int(k)

    def merge(it):
        import pandas as pd

        by_sid: dict = {}
        dec_of: dict = {}
        nrows_of: dict = {}
        seen_of: dict = {}
        null_seen: set = set()
        for pdf in it:
            for sid, item, cnt, dec, nr in zip(
                pdf["sid"], pdf["item"], pdf["cnt"], pdf["dec"],
                pdf["nrows"],
            ):
                sid, dec, nr = str(sid), int(dec), int(nr)
                s = by_sid.setdefault(sid, MGSketch(kk))
                if dec_of.setdefault(sid, dec) != dec:
                    raise ValueError(
                        f"mg_merge: inconsistent dec for sid {sid!r} — "
                        "rows of one sketch must share its decrement "
                        "total; two sketches are colliding on this sid"
                    )
                if nrows_of.setdefault(sid, nr) != nr:
                    raise ValueError(
                        f"mg_merge: inconsistent nrows for sid {sid!r}"
                        " — rows of one sketch must share its declared"
                        " row count; two sketches are colliding on"
                        " this sid"
                    )
                seen_of[sid] = seen_of.get(sid, 0) + 1
                if item is None or (
                    isinstance(item, float) and item != item
                ):
                    # dec-carrying sentinel of an empty-countered sketch
                    if sid in null_seen:
                        raise ValueError(
                            f"mg_merge: duplicate sentinel for sid {sid!r}"
                            " — two sketches are colliding on this sid"
                        )
                    null_seen.add(sid)
                    s.dec = dec
                    continue
                if item in s.counters:
                    raise ValueError(
                        "mg_merge: duplicate (sid, item) row for sid "
                        f"{sid!r} — input mixes two sketches with the "
                        "same sid (unioned builds sharing a build_id, "
                        "or a replayed batch appended instead of "
                        "overwritten); rebuild with distinct build_ids"
                    )
                s.counters[item] = int(cnt)
                s.dec = dec
        for sid, nr in nrows_of.items():
            if seen_of.get(sid, 0) != nr:
                raise ValueError(
                    f"mg_merge: sid {sid!r} declared nrows={nr} but "
                    f"{seen_of.get(sid, 0)} rows arrived — two "
                    "sketches with identical dec are fused on this "
                    "sid; rebuild with distinct build_ids"
                )
        total = MGSketch(kk)
        c = total.counters
        for s in by_sid.values():
            for item, v in s.counters.items():
                c[item] = c.get(item, 0) + v
            total.dec += s.dec
            total.n += s.n
        if len(c) > kk:
            vals = sorted(c.values(), reverse=True)
            cut = vals[kk]
            total.dec += cut
            total.counters = {
                item: v - cut for item, v in c.items() if v - cut > 0
            }
        items = sorted(total.counters.items())
        if not items and (by_sid and total.dec > 0):
            # same sentinel rule as mg_build: a cut that wipes every
            # counter must still hand its dec to any downstream merge
            yield pd.DataFrame(
                {
                    "sid": pd.Series([None], dtype="object"),
                    "item": pd.Series([None], dtype="object"),
                    "cnt": pd.Series([0], dtype="int64"),
                    "dec": pd.Series([total.dec], dtype="int64"),
                    "nrows": pd.Series([1], dtype="int64"),
                }
            )
            return
        out_sid = None
        yield pd.DataFrame(
            {
                "sid": pd.Series([out_sid] * len(items), dtype="object"),
                "item": pd.Series([i for i, _ in items], dtype="object"),
                "cnt": pd.Series([c for _, c in items], dtype="int64"),
                "dec": pd.Series([total.dec] * len(items), dtype="int64"),
                "nrows": pd.Series([len(items)] * len(items), dtype="int64"),
            }
        )

    import uuid as _uuid

    bid = build_id if build_id is not None else _uuid.uuid4().hex[:12]
    # route by sid so a source sketch's rows stay together — splitting
    # one sketch across merge tasks would double-count its dec (the
    # bound would stay VALID but needlessly loosen)
    merged = sketch.repartition(partitions, F.col("sid")).mapInPandas(
        merge,
        schema="sid string, item string, cnt long, dec long, nrows long",
    )
    return merged.withColumn(
        "sid",
        F.concat(F.lit(bid + "-"), F.spark_partition_id().cast("string")),
    )


def mg_topk(sketch: DataFrame, n: int = 10) -> DataFrame:
    """Top-n candidates from a merged summary → (item, est, est_max):
    est is the guaranteed under-count, est_max = est + dec the upper
    bound; any item whose true count exceeds the merged dec is
    guaranteed present. Plain Catalyst on the ≤ k-row summary
    (null-item dec sentinels are excluded — they are bookkeeping, not
    candidates)."""
    return (
        sketch.where(F.col("item").isNotNull())
        .select(
            "item",
            F.col("cnt").alias("est"),
            (F.col("cnt") + F.col("dec")).alias("est_max"),
        )
        .orderBy(F.col("est").desc(), F.col("item"))
        .limit(n)
    )
