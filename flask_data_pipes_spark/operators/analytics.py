"""Event/behavioral analytics operators the reference lacks and Spark
has no single built-in for: ordered funnel analysis, cohort retention,
skew-salted equi-join, and a storage compaction planner.

The reference (`/root/reference`) processes events one record at a time
with no cross-record analytics (SURVEY.md §2.8: no joins, no windows);
these belong to the engine's Spark-native superset — the standard
product-analytics queries an event pipeline serves, plus the two
operational helpers (skew join, small-file compaction) a 100 TB
deployment needs around them.

Scale design:
- `funnel` is ONE shuffle on the user key: every per-step "earliest
  qualifying timestamp" is a chained running-min window expression over
  the same (user, ts) sort, so K funnel steps share a single Exchange +
  Sort; the final per-user reduction reuses that hash partitioning
  (Catalyst elides the second Exchange). The naive formulation — one
  self-join per step — is K shuffles of the full event table and K
  join fan-outs; at 100 TB with K=5 steps that is the difference
  between one pass and five.
- `cohort_retention` is the same shape: window min per user (one
  shuffle), then a (cohort, offset) grid aggregation whose key count is
  weeks², tiny regardless of data scale.
- `salted_join` is the skew complement of `q_salted_agg`: explode the
  small side S ways, salt the big side deterministically, equi-join on
  (keys, salt). AQE's skew-join split handles sort-merge skew when
  partition stats reveal it; the salt handles it structurally — e.g. a
  null-heavy or single-hot-key foreign key where ALL rows land in one
  reducer and AQE can only split what it can re-read.
- `compaction_plan` is a per-scope (storage-partition) prefix-sum
  bin-packing: next-fit by cumulative size within each scope. The
  window partitions by the scope columns, so planning parallelizes over
  partitions and never needs a global sort — a compaction plan is
  per-partition by construction (you never merge files across
  partition boundaries).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple, Union

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ._guards import reject_reserved

__all__ = [
    "funnel",
    "cohort_retention",
    "salted_join",
    "compaction_plan",
    "bloom_semi_join",
    "ohlc_bars",
]


def _keys(on: Union[str, Sequence[str]]) -> List[str]:
    return [on] if isinstance(on, str) else list(on)


def funnel(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    order_col: Optional[str] = None,
    conversion_window: Optional[float] = None,
) -> DataFrame:
    """Ordered funnel: for each step k, how many users performed
    steps[0], then steps[1] at-or-after it, ..., then steps[k] at-or-
    after their earliest qualifying steps[k-1]. Returns one row per
    step: (step_idx, step, n_users) with step_idx 1-based, sorted by
    step_idx — the classic conversion funnel.

    `conversion_window` (seconds) additionally requires every step to
    land within that many seconds of the user's earliest steps[0]
    (window anchored at the funnel entry, the common product-analytics
    definition).

    Semantics: "at-or-after" is `ts >= previous step's earliest
    qualifying ts` — a step-k event at EXACTLY the same timestamp as
    the user's earliest qualifying step-(k-1) event counts (pure
    `>=`, the product-analytics convention and what the DuckDB oracle
    computes). A user who does step B strictly before ever doing step
    A does NOT count for B. `order_col` only disambiguates the sort
    among same-step same-ts rows; it never changes which events
    qualify.

    Implementation: running-min window expressions chained over ONE
    (user, ts) sort:

      t1_run(i) = min ts of steps[0] among rows <= i
      row i qualifies for step k  iff  type==steps[k] and
                                       t(k-1)_run(i) is not null
      tk_run(i) = min ts of qualifying step-k rows <= i

    because rows are ts-ordered, "a qualifying step-(k-1) happened
    at-or-before this row" is exactly "t(k-1)_run is not null". The
    final per-user step timestamps are then a plain groupBy(user) min
    over the per-row qualifying candidates — same hash partitioning as
    the window, no second shuffle.

    Tie handling (ADVICE round 8): the window sort breaks equal-ts
    ties by funnel step index (earlier steps first), so a step-k row
    at the same ts as the earliest step-(k-1) row sees t(k-1)_run
    already set — exactly the `>=` semantics above. Without the
    tiebreaker, sort order among equal-ts rows was arbitrary and a
    step-k row could sort before its qualifying predecessor.
    """
    if len(steps) < 2:
        raise ValueError("funnel needs at least 2 steps")
    if len(set(steps)) != len(steps):
        raise ValueError(
            "funnel steps must be distinct (a repeated step would let one "
            "event satisfy two consecutive steps under >= semantics)"
        )
    reject_reserved(
        "funnel",
        [f"__cand_{k}" for k in range(len(steps))]
        + [f"__run_{k}" for k in range(len(steps))],
        events=events,
    )
    # equal-ts tiebreaker: earlier funnel steps sort first (non-step
    # rows get array_position 0 — they qualify for nothing, so their
    # position among ties is irrelevant)
    step_rank = F.array_position(
        F.array(*[F.lit(s) for s in steps]), F.col(type_col)
    )
    order = (
        [F.col(ts_col), step_rank]
        + ([F.col(order_col)] if order_col else [])
    )
    w = (
        Window.partitionBy(user_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    df = events
    ts = F.col(ts_col)
    typ = F.col(type_col)
    prev_run: Optional[str] = None
    cand_cols: List[str] = []
    for k, step in enumerate(steps):
        cand = f"__cand_{k}"
        run = f"__run_{k}"
        qualifies = typ == F.lit(step)
        if prev_run is not None:
            qualifies = qualifies & F.col(prev_run).isNotNull()
        if conversion_window is not None and k > 0:
            # window anchored at the user's earliest step-0 time
            limit = F.col("__run_0") + F.make_interval(
                secs=F.lit(float(conversion_window))
            )
            qualifies = qualifies & (ts <= limit)
        df = df.withColumn(cand, F.when(qualifies, ts))
        df = df.withColumn(run, F.min(cand).over(w))
        prev_run = run
        cand_cols.append(cand)
    per_user = df.groupBy(user_col).agg(
        *[F.min(c).alias(f"__t_{k}") for k, c in enumerate(cand_cols)]
    )
    counts = per_user.agg(
        *[
            F.count(f"__t_{k}").alias(f"__n_{k}")
            for k in range(len(steps))
        ]
    )
    # unpivot the single-row aggregate into (step_idx, step, n_users)
    pairs: List[Column] = []
    for k, step in enumerate(steps):
        pairs.append(
            F.struct(
                F.lit(k + 1).alias("step_idx"),
                F.lit(step).alias("step"),
                F.col(f"__n_{k}").alias("n_users"),
            )
        )
    return (
        counts.select(F.explode(F.array(*pairs)).alias("s"))
        .select("s.step_idx", "s.step", "s.n_users")
        .orderBy("step_idx")
    )


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly cohort retention: cohort = ISO week (Monday-truncated) of
    each user's first event; for every (cohort_week, week_offset) cell,
    the number of distinct cohort users active in that offset week.
    Offset is day-based — floor(days(event_date - cohort_monday) / 7) —
    so offset 0 always covers the cohort's own week.

    Returns (cohort_week timestamp — the cohort Monday at midnight,
    week_offset int, n_active bigint, cohort_size bigint, retention
    double) sorted by (cohort_week, week_offset); retention = n_active
    / cohort_size, and offset 0 has retention 1.0 by construction.
    (Timestamp, not date, so the column round-trips Arrow/pandas as
    datetime64 in every engine.)

    Implementation: window min(ts) per user over one shuffle on
    user_col; the grid aggregation's key count is O(weeks²) regardless
    of data size, and cohort_size joins back via a broadcast (the grid
    is tiny).
    """
    w = Window.partitionBy(user_col)
    first_ts = F.min(ts_col).over(w)
    tagged = events.select(
        F.col(user_col).alias("__u"),
        F.date_trunc("week", first_ts).alias("cohort_week"),
        F.floor(
            F.datediff(
                F.to_date(ts_col), F.to_date(F.date_trunc("week", first_ts))
            )
            / 7
        )
        .cast("int")
        .alias("week_offset"),
    )
    grid = tagged.groupBy("cohort_week", "week_offset").agg(
        F.count_distinct("__u").alias("n_active")
    )
    # every user is active in their own offset-0 week (their first
    # event is in it), so cohort_size is just the offset-0 cell — no
    # second scan of the event table
    sizes = grid.filter(F.col("week_offset") == 0).select(
        "cohort_week", F.col("n_active").alias("cohort_size")
    )
    return (
        grid.join(F.broadcast(sizes), "cohort_week")
        .withColumn(
            "retention",
            F.round(F.col("n_active") / F.col("cohort_size"), 6),
        )
        .select(
            "cohort_week", "week_offset", "n_active", "cohort_size", "retention"
        )
        .orderBy("cohort_week", "week_offset")
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Union[str, Sequence[str]],
    n_salt: int = 16,
    how: str = "inner",
    salt_src: Optional[str] = None,
) -> DataFrame:
    """Skew-resistant equi-join: salt the big (skewed) side into
    `n_salt` deterministic sub-keys, explode the small side n_salt
    ways, and equi-join on (keys, salt). Results are identical to
    `big.join(small, on, how)` for `how` in {inner, left} — every big
    row meets every small row of its key exactly once (each small row
    is replicated once per salt value, and each big row carries exactly
    one salt value).

    Use when BOTH of these hold: the small side is too big to
    broadcast, and the big side's join key is skewed enough that one
    reducer would take the hot key's whole partition (e.g. a 30%-null
    FK, a giant-customer key). For broadcast-sized dims, a plain join
    is strictly better (no explode). AQE's skew-split covers many SMJ
    cases at runtime; the salt is the structural guarantee — it also
    works where AQE can't re-split (cached inputs, non-AQE sinks).

    The salt is `pmod(xxhash64(salt_src), n_salt)` — deterministic, so
    re-runs produce identical partitioning. `salt_src` defaults to ALL
    big-side columns, which fans a hot key's rows across all n_salt
    reducers (rows identical in every column share a salt — harmless,
    they're the same row). Pass a single unique id column to make the
    hash cheaper when one exists.

    Cost: the small side is shuffled n_salt×; the big side shuffles
    once. Pick n_salt ~ (hot-key row count / target partition rows).
    """
    keys = _keys(on)
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    reject_reserved("salted_join", ["__salt"], big=big, small=small)
    src_cols = [F.col(salt_src)] if salt_src else [F.col(c) for c in big.columns]
    salted_big = big.withColumn(
        "__salt", F.pmod(F.xxhash64(*src_cols), F.lit(n_salt)).cast("int")
    )
    exploded_small = small.withColumn(
        "__salt",
        F.explode(
            F.sequence(F.lit(0), F.lit(n_salt - 1)).cast("array<int>")
        ),
    )
    out = salted_big.join(exploded_small, keys + ["__salt"], how)
    return out.drop("__salt")


def bloom_semi_join(
    fact: DataFrame,
    dim: DataFrame,
    on: Union[str, Sequence[str]],
    m_bits: int = 1 << 23,
    k: int = 5,
    how: str = "inner",
) -> DataFrame:
    """Semi-join reduction (the distributed-DB classic): cut the fact
    side down to ~matching rows BEFORE its join shuffle, using a bloom
    filter of the dim's join keys. Results are identical to
    `fact.join(dim, on, how)` for `how` in {inner, left_semi} — bloom
    false negatives are impossible, and false positives die in the
    exact join that follows.

    Use when the dim is too big to broadcast (so the plain join is a
    two-sided shuffle) but its KEY SET fits a bloom: the bitmap is
    m_bits/8 bytes regardless of dim size (default 1 MiB for 2^23
    bits; size m_bits ≳ 10× the dim's distinct-key count to keep the
    false-positive rate ≈ (1−e^(−k·n/m))^k low single digits). The
    fact then ships only ~|fact ⋉ dim| + ε·|fact| rows into the join
    exchange instead of all of them — at 100 TB the exchange IS the
    cost, so ε is the fraction of the shuffle you still pay. (Spark's
    AQE runtime row-filtering plans this automatically in narrow
    cases; the operator makes it structural and tunable.)

    Probe shape: the dim-key bitmap (built with `dedup.bloom_bitmap`,
    ≤ m_bits/64 rows) collapses to ONE row holding a map<word→bits>,
    which broadcasts; every fact row checks its k probe words with map
    lookups inside a single codegen filter — NO explode, NO
    per-row aggregation, no shuffle before the filter. Multi-column
    keys probe on a null-tagged concatenation.
    """
    keys = _keys(on)
    if how not in ("inner", "left_semi"):
        raise ValueError(
            f"bloom_semi_join supports inner/left_semi, got {how!r} "
            "(a left-outer join must keep non-matching fact rows, which "
            "the bloom pre-filter would drop)"
        )
    reject_reserved("bloom_semi_join", ["__bsj_map"], fact=fact, dim=dim)
    from .dedup import _bloom_positions, bloom_bitmap

    def probe_value(df: DataFrame) -> Column:
        # null-tagged so ("a", null) never collides with ("anull",)
        return F.concat_ws(
            "\x1f",
            *[
                F.coalesce(F.col(c).cast("string"), F.lit("\x00null"))
                for c in keys
            ],
        )

    bitmap = bloom_bitmap(
        dim.select(probe_value(dim).alias("__bsj_key")), "__bsj_key", m_bits, k
    )
    packed = bitmap.agg(
        F.map_from_entries(
            F.collect_list(F.struct("__w", "__bits"))
        ).alias("__bsj_map")
    )
    pos = _bloom_positions(probe_value(fact), m_bits, k)
    word = lambda p: (p / 64).cast("long")  # noqa: E731
    # shiftleft with a COLUMN bit count (the python wrapper only takes
    # an int literal)
    mask = lambda p: F.call_function(
        "shiftleft", F.lit(1).cast("long"), F.pmod(p, F.lit(64)).cast("int")
    )  # noqa: E731
    hit = None
    for i in range(k):
        p = F.element_at(pos, i + 1)
        probe = (
            F.coalesce(
                F.element_at(F.col("__bsj_map"), word(p)), F.lit(0).cast("long")
            ).bitwiseAND(mask(p))
            != 0
        )
        hit = probe if hit is None else (hit & probe)
    filtered = (
        fact.crossJoin(F.broadcast(packed))  # 1-row bitmap side
        .filter(hit)
        .drop("__bsj_map")
    )
    return filtered.join(dim, keys, how)


def compaction_plan(
    files: DataFrame,
    size_col: str = "size_bytes",
    target_bytes: int = 128 * 1024 * 1024,
    scope_cols: Optional[Sequence[str]] = None,
    order_col: Optional[str] = None,
) -> DataFrame:
    """Small-file compaction planner: assign each file to an output bin
    of ~`target_bytes`, never merging across `scope_cols` (the storage
    partition columns — compaction must respect partition boundaries).
    Next-fit by cumulative size: within each scope, files are laid out
    in `order_col` order (default: the first non-size column — pass
    the path/id column explicitly for stable plans) and
    `bin_id = floor(exclusive_prefix_sum(size) / target_bytes)`.

    Returns the input columns plus (bin_id bigint, bin_seq int) where
    bin_seq is the file's position within its bin. Files larger than
    `target_bytes` get a bin to themselves (the prefix-sum jump skips
    past them).

    Next-fit is within 2× of optimal bin count and — unlike first-fit-
    decreasing — needs only a prefix sum, which parallelizes per scope:
    the window partitions by scope_cols, so a million-partition table
    plans in one pass with no global sort. (A global, scope-less plan
    would serialize into a single window partition — that's the
    degenerate case; real lakehouse compaction is always per-partition.)
    """
    scopes = list(scope_cols or [])
    if not scopes:
        raise ValueError(
            "compaction_plan requires scope_cols (the storage partition "
            "columns); a scope-less global plan would serialize into one "
            "window partition"
        )
    order = order_col or next(
        c for c in files.columns if c != size_col and c not in scopes
    )
    w = (
        Window.partitionBy(*scopes)
        .orderBy(order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    size = F.col(size_col).cast("bigint")
    cum = F.sum(size).over(w)
    before = (cum - size).cast("bigint")
    out = files.withColumn(
        "bin_id", F.floor(before / F.lit(int(target_bytes))).cast("bigint")
    )
    w2 = Window.partitionBy(*(scopes + ["bin_id"])).orderBy(order)
    return out.withColumn("bin_seq", F.row_number().over(w2).cast("int"))


def ohlc_bars(
    df: DataFrame,
    ts_col: str = "ts",
    price_col: str = "value",
    by: Optional[str] = None,
    unit: str = "hour",
) -> DataFrame:
    """Time-bar resampling (the market-data classic): per `unit` bucket
    (and per `by` group when given), the Open/High/Low/Close of
    `price_col` plus event count and decimal-exact sum — one
    aggregation pass, no window, no sort.

    Open/Close are `min_by`/`max_by` on the timestamp — a single
    aggregate buffer each, NOT a sort-within-group — so the plan is an
    ordinary partial-aggregable groupBy: the map side collapses each
    bucket to one candidate row before the shuffle, and the shuffle
    carries ≤ groups·buckets rows per partition regardless of event
    volume. Ties on the exact same timestamp are nondeterministic —
    dedup or sub-order upstream if the feed has same-instant prints
    (the test feeds are microsecond-unique).

    `unit` is any `date_trunc` unit (minute/hour/day/week/...).
    """
    bucket = F.date_trunc(unit, F.col(ts_col)).alias("bar_start")
    keys = ([F.col(by)] if by else []) + [bucket]
    price = F.col(price_col)
    return (
        df.groupBy(*keys)
        .agg(
            F.min_by(price, F.col(ts_col)).alias("open"),
            F.max(price).alias("high"),
            F.min(price).alias("low"),
            F.max_by(price, F.col(ts_col)).alias("close"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(price.cast("decimal(38,6)"))
            .cast("double")
            .alias("total_value"),
        )
        .orderBy(*([by] if by else []), "bar_start")
    )
