"""Declarative data-quality expectations — the table-grain, Spark-first
generalisation of the reference's per-record validation hooks
(flask_data_pipes/data_pipes/pipeline.py upload-validation predicates
and the F1-F3 filter hooks): instead of dropping records one at a time,
declare constraints over a table and get a per-constraint violation
report from ONE pass.

Design (the Deequ/Great-Expectations shape, minus the framework):
- every ROW check is a boolean Column — arbitrary Catalyst expressions,
  evaluated together in a single aggregation (no per-check scans);
- UNIQUENESS checks ride the same statement as count vs count_distinct;
- each check carries a `min_pass_rate` (default 1.0 = hard constraint),
  so "99.9% of rows have a valid email" is first-class;
- output is one row per check: (check, kind, n_rows, n_violations,
  pass_rate, ok) — joinable, alertable, and DuckDB-oracle-checkable.

Scale: one scan, one partial-aggregable statement for all row checks;
each uniqueness check adds one distinct aggregate over its key (swap in
`sketches.hll_build` when an approximate uniqueness gauge is enough at
100 TB — same report schema, O(2^b) state).
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame, functions as F

__all__ = [
    "expectations_report",
    "expect_or_quarantine",
    "failed_checks_expr",
    "skew_report",
    "table_profile",
    "robust_outliers",
    "correlation_matrix",
]


def _round6(c: Column) -> Column:
    return F.round(c, 6)


def expectations_report(
    df: DataFrame,
    row_checks: Mapping[str, Column] | None = None,
    unique_keys: Sequence[str] = (),
    min_pass_rate: Mapping[str, float] | None = None,
    approx_unique: bool = False,
    approx_rsd: float = 0.023,
) -> DataFrame:
    """→ one row per declared expectation:
    (check, kind, n_rows, n_violations, pass_rate, ok).

    `row_checks`: name → boolean Column (null counts as a violation —
    an unevaluable constraint is a failed constraint).
    `unique_keys`: column names that must be unique; each contributes
    a `unique_<col>` check where violations = n_rows − n_distinct.
    `min_pass_rate`: per-check acceptance threshold (default 1.0).
    `approx_unique`: swap the exact per-key `count_distinct` for
    Spark's HLL++ `approx_count_distinct(key, approx_rsd)` —
    O(1/rsd²) state per key instead of a full distinct aggregate, and
    it RIDES THE SAME single partial-aggregable statement (the
    one-pass shape survives). `kind` becomes `uniqueness_approx` and
    `n_violations` is an estimate (can be slightly negative-clamped);
    thresholds on approximate checks should leave rsd headroom. For
    pre-sharded pipelines that need MERGEABLE uniqueness state across
    shards/batches, build `sketches.hll_build(df, key)` per shard and
    `hll_merge` + `hll_estimate` instead — same report semantics,
    explicitly mergeable registers (default rsd 0.023 ≈ the same
    error as that b=6-bit register table... at rsd=0.023 Spark sizes
    ~2^11 registers; tune rsd, not code).
    """
    row_checks = dict(row_checks or {})
    thresholds = dict(min_pass_rate or {})
    if not row_checks and not unique_keys:
        raise ValueError("no expectations declared")
    declared = set(row_checks) | {f"unique_{k}" for k in unique_keys}
    unknown = sorted(set(thresholds) - declared)
    if unknown:
        # a typo'd threshold key would otherwise silently fall back to
        # the 1.0 default, hardening an intended soft constraint
        raise ValueError(
            f"min_pass_rate keys {unknown} match no declared check "
            f"(declared: {sorted(declared)})"
        )

    aggs = [F.count(F.lit(1)).alias("__n")]
    for name, cond in row_checks.items():
        aggs.append(
            F.sum(
                F.when(F.coalesce(cond, F.lit(False)), 0).otherwise(1)
            ).alias(f"__v_{name}")
        )
    for key in unique_keys:
        aggs.append(
            F.approx_count_distinct(F.col(key), rsd=approx_rsd).alias(
                f"__d_{key}"
            )
            if approx_unique
            else F.count_distinct(F.col(key)).alias(f"__d_{key}")
        )
    agg = df.agg(*aggs)

    n = F.col("__n")
    reports = []
    for name in row_checks:
        reports.append(
            F.struct(
                F.lit(name).alias("check"),
                F.lit("row").alias("kind"),
                n.alias("n_rows"),
                F.col(f"__v_{name}").cast("long").alias("n_violations"),
            )
        )
    for key in unique_keys:
        reports.append(
            F.struct(
                F.lit(f"unique_{key}").alias("check"),
                F.lit(
                    "uniqueness_approx" if approx_unique else "uniqueness"
                ).alias("kind"),
                n.alias("n_rows"),
                # approx mode: the HLL++ estimate can exceed the true
                # count; clamp so a clean key never reports negative
                # violations
                F.greatest(
                    F.lit(0).cast("long"),
                    (n - F.col(f"__d_{key}")).cast("long"),
                ).alias("n_violations"),
            )
        )
    out = agg.select(F.explode(F.array(*reports)).alias("__r")).select("__r.*")

    rate = F.when(
        F.col("n_rows") == 0, F.lit(1.0)
    ).otherwise(
        _round6(
            (F.col("n_rows") - F.col("n_violations"))
            / F.col("n_rows").cast("double")
        )
    )
    thr = F.coalesce(
        *[
            F.when(F.col("check") == k, F.lit(float(v)))
            for k, v in thresholds.items()
        ],
        F.lit(1.0),
    ) if thresholds else F.lit(1.0)
    return out.select(
        "check",
        "kind",
        "n_rows",
        "n_violations",
        rate.alias("pass_rate"),
        (rate >= thr).alias("ok"),
    )


def failed_checks_expr(row_checks: Mapping[str, Column]) -> Column:
    """Sorted array of the declared check names this row FAILS (null
    condition = failure, matching `expectations_report`). Pure
    codegen: one when-branch per check, array_compact drops the
    passes, array_sort makes the tag deterministic regardless of
    declaration order."""
    if not row_checks:
        raise ValueError("no expectations declared")
    return F.array_sort(
        F.array_compact(
            F.array(
                *[
                    F.when(~F.coalesce(cond, F.lit(False)), F.lit(name))
                    for name, cond in row_checks.items()
                ]
            )
        )
    )


def expect_or_quarantine(
    df: DataFrame,
    row_checks: Mapping[str, Column],
    failed_col: str = "failed_checks",
) -> tuple[DataFrame, DataFrame]:
    """The ENFORCEMENT leg of the expectations surface — the
    reference's record-drop semantics (F1 filter hooks drop records
    post-stage, flask_data_pipes/data_pipes/pipeline.py:565-575) at
    table grain: → (pass_df, quarantine_df).

    Rows failing ANY check land in the quarantine frame carrying
    `failed_col` (the sorted array of failed check names — the per-row
    diagnosis a repair pipeline keys on); clean rows come back with
    the original schema, untouched.

    Scale shape: the tag is ONE narrow projection (no shuffle, no
    UDF); the split is two filters over the same tagged frame. Each
    returned frame costs one scan when consumed — to split a 100 TB
    table in literally one pass, write the TAGGED frame
    `partitionBy(size(failed_col) == 0)` (one scan, two directory
    trees) or persist the tagged frame before consuming both sides.
    `streaming.stream.foreach_batch_quarantine` is exactly that
    one-scan form at ingest (replay-idempotent partition-per-batch).
    """
    if failed_col in df.columns:
        raise ValueError(
            f"failed_col {failed_col!r} already exists in the input frame; "
            "pick another name (silently overwriting would lose caller data "
            "on the pass side, which drops it)"
        )
    tagged = df.withColumn(failed_col, failed_checks_expr(row_checks))
    pass_df = tagged.filter(F.size(F.col(failed_col)) == 0).drop(failed_col)
    quarantine_df = tagged.filter(F.size(F.col(failed_col)) > 0)
    return pass_df, quarantine_df


def skew_report(
    df: DataFrame,
    key_cols: Sequence[str],
    top_n: int = 10,
) -> DataFrame:
    """Join/aggregation-key skew profiler: the `top_n` heaviest keys
    with their share of all rows and skew factor (count ÷ the mean
    rows-per-distinct-key) — the MEASURE step before every skew
    decision (salt this join? cap this bucket? rely on AQE?). A
    skew_factor of 1 is perfectly uniform; the hot key of a power-law
    dup graph or a null-heavy foreign key shows up as 100-10000×.

    Output: (key_cols..., cnt, share, skew_factor, rnk), rnk 1..top_n
    by descending count (key ascending on ties — deterministic).

    Scale shape: ONE groupBy on the key (partial agg map-side, the
    shuffle carries distinct keys), then `orderBy(cnt desc).limit(n)`
    — TakeOrderedAndProject, per-partition partial top-n, never a
    global sort of the key table; totals are a 1-row broadcast and
    the rank window runs on ≤ top_n rows. Works unchanged at any key
    cardinality.
    """
    from pyspark.sql import Window

    keys = list(key_cols)
    if not keys:
        raise ValueError("key_cols must be non-empty")
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("cnt"))
    tot = counts.agg(
        F.sum("cnt").alias("__total"),
        F.count(F.lit(1)).alias("__n_keys"),
    )
    top = counts.orderBy(
        F.col("cnt").desc(), *[F.col(c).asc() for c in keys]
    ).limit(top_n)
    w = Window.orderBy(F.col("cnt").desc(), *[F.col(c).asc() for c in keys])
    return (
        top.join(F.broadcast(tot))
        .select(
            *keys,
            "cnt",
            F.round(
                F.col("cnt").cast("double") / F.col("__total"), 6
            ).alias("share"),
            F.round(
                F.col("cnt").cast("double")
                * F.col("__n_keys")
                / F.col("__total"),
                6,
            ).alias("skew_factor"),
        )
        .withColumn("rnk", F.row_number().over(w).cast("int"))
    )


def table_profile(
    df: DataFrame,
    columns: Sequence[str] | None = None,
    exact: bool = True,
    rsd: float = 0.05,
) -> DataFrame:
    """One-pass per-column table statistics — the ANALYZE-TABLE
    primitive (row count, nulls, null fraction, distinct count per
    column) that feeds join-strategy choices, expectation thresholds,
    and "did this load look like the last one" monitoring.

    Output: one row per profiled column —
    (column, n_rows, n_nulls, null_frac, n_distinct).

    `exact=True` uses count_distinct: Catalyst plans multiple distinct
    aggregates via Expand (one projection per column — the row stream
    is replicated |columns|+1 ways before the shuffle), which is fine
    for dimension-sized tables and is what the DuckDB oracle can match
    bit-for-bit. At 100 TB profile with `exact=False`:
    approx_count_distinct (HLL++) keeps the single-pass partial
    aggregation with NO Expand and ~rsd relative error — the same
    exact/approx trade `expectations_report(approx_unique=...)` makes.

    The unpivot to rows happens AFTER the 1-row aggregate — it never
    touches corpus-sized data.
    """
    cols = list(columns) if columns is not None else list(df.columns)
    if not cols:
        raise ValueError("no columns to profile")
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.count(F.col(c)).alias(f"__nn_{c}"))  # non-null count
        aggs.append(
            (
                F.count_distinct(F.col(c))
                if exact
                else F.approx_count_distinct(c, rsd)
            ).alias(f"__nd_{c}")
        )
    row = df.agg(*aggs)
    per_col = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(c).alias("column"),
                    (F.col("__n") - F.col(f"__nn_{c}"))
                    .cast("long")
                    .alias("n_nulls"),
                    F.col(f"__nd_{c}").cast("long").alias("n_distinct"),
                )
                for c in cols
            ]
        )
    )
    return row.select(
        F.col("__n").cast("long").alias("n_rows"), per_col.alias("__s")
    ).select(
        F.col("__s.column").alias("column"),
        "n_rows",
        F.col("__s.n_nulls").alias("n_nulls"),
        F.round(
            F.col("__s.n_nulls").cast("double") / F.col("n_rows"), 6
        ).alias("null_frac"),
        F.col("__s.n_distinct").alias("n_distinct"),
    )


def robust_outliers(
    df: DataFrame,
    value_col: str,
    by: str,
    threshold: float = 3.5,
    consistency: float = 0.6745,
) -> DataFrame:
    """Per-group ROBUST outlier detection via the modified z-score
    (Iglewicz & Hoaglin 1993): score = consistency·(v − median)/MAD,
    flag |score| > threshold (3.5 is the standard cut). The
    median/MAD pair is the breakdown-resistant complement to the
    mean/stddev z-score — one giant anomaly inflates a stddev enough
    to hide its siblings, but cannot move a median.

    Returns the flagged rows: the input columns plus (med, mad,
    robust_z rounded to 6dp). Groups with MAD = 0 (over half the
    rows share one value) are skipped, like zero-variance groups in
    the z-score gauge.

    Scale: ONE shuffle — both exact percentiles run as window
    aggregates over the same group partitioning (two Window nodes,
    one Exchange, no joins, no second pass over the data). Exact
    `percentile` holds a value-count map per group; for unbounded
    high-cardinality value domains at 100 TB swap in
    `approx_percentile` and accept the documented error (the exact
    form is kept oracle-matchable: Spark `percentile` ≡ DuckDB
    `quantile_cont` bit-for-bit on doubles).
    """
    from pyspark.sql import Window

    w = Window.partitionBy(by)
    med = df.withColumn(
        "med", F.expr(f"percentile({value_col}, 0.5D)").over(w)
    )
    mad = med.withColumn(
        "mad",
        F.expr(f"percentile(abs({value_col} - med), 0.5D)").over(w),
    )
    score = (
        F.lit(consistency)
        * (F.col(value_col) - F.col("med"))
        / F.col("mad")
    )
    return mad.filter(
        (F.col("mad") > 0) & (F.abs(score) > threshold)
    ).select(
        *df.columns, "med", "mad", F.round(score, 6).alias("robust_z")
    )


def correlation_matrix(
    df: DataFrame,
    cols: Sequence[str],
    round_to: int = 6,
) -> DataFrame:
    """Pairwise Pearson correlations over numeric columns in ONE pass:
    (col_a, col_b, corr, n) for every unordered pair — the profiling
    companion to `table_profile` (which column REDUNDANCIES exist;
    feature screening before training a quality classifier).

    Engine-exact by construction: every moment (Σx, Σx², Σxy) is an
    exact DECIMAL(38,6)/(38,12) sum, and the correlation assembles
    from those fixed sums in doubles —
    corr = (n·Σxy − Σx·Σy) / sqrt((n·Σx² − Σx²̂)(n·Σy² − Σy²̂)) —
    so a SQL oracle using the same sums matches bit-for-bit after
    rounding (the same decimal-moment trick as the z-score gauge).
    Zero-variance columns yield NULL correlations (0/0 guarded).

    Scale: ONE aggregation over the scan — k(k+1)/2 + k moment
    buffers for k columns, all partial-aggregable map-side; the
    result is k²-sized, data-independent. Rows where ANY of `cols` is
    null are excluded (listwise deletion) so every pair shares one n.
    """
    cols = list(cols)
    if len(cols) < 2:
        raise ValueError("correlation_matrix needs >= 2 columns")
    clean = df.dropna(subset=cols)
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(
            F.sum(F.col(c).cast("decimal(38,6)")).cast("double").alias(f"__s_{c}")
        )
        aggs.append(
            F.sum((F.col(c) * F.col(c)).cast("decimal(38,12)"))
            .cast("double")
            .alias(f"__ss_{c}")
        )
    for i, a in enumerate(cols):
        for b in cols[i + 1 :]:
            aggs.append(
                F.sum((F.col(a) * F.col(b)).cast("decimal(38,12)"))
                .cast("double")
                .alias(f"__sp_{a}_{b}")
            )
    agg = clean.agg(*aggs)
    n = F.col("__n").cast("double")
    pairs = []
    for i, a in enumerate(cols):
        for b in cols[i + 1 :]:
            cov = n * F.col(f"__sp_{a}_{b}") - F.col(f"__s_{a}") * F.col(f"__s_{b}")
            va = n * F.col(f"__ss_{a}") - F.col(f"__s_{a}") * F.col(f"__s_{a}")
            vb = n * F.col(f"__ss_{b}") - F.col(f"__s_{b}") * F.col(f"__s_{b}")
            corr = F.when(
                (va > 0) & (vb > 0),
                F.round(cov / F.sqrt(va * vb), round_to),
            )
            pairs.append(
                F.struct(
                    F.lit(a).alias("col_a"),
                    F.lit(b).alias("col_b"),
                    corr.alias("corr"),
                    F.col("__n").alias("n"),
                )
            )
    return (
        agg.select(F.explode(F.array(*pairs)).alias("__p"))
        .select("__p.*")
        .orderBy("col_a", "col_b")
    )
