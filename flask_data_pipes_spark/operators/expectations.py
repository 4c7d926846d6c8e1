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

__all__ = ["expectations_report"]


def _round6(c: Column) -> Column:
    return F.round(c, 6)


def expectations_report(
    df: DataFrame,
    row_checks: Mapping[str, Column] | None = None,
    unique_keys: Sequence[str] = (),
    min_pass_rate: Mapping[str, float] | None = None,
) -> DataFrame:
    """→ one row per declared expectation:
    (check, kind, n_rows, n_violations, pass_rate, ok).

    `row_checks`: name → boolean Column (null counts as a violation —
    an unevaluable constraint is a failed constraint).
    `unique_keys`: column names that must be unique; each contributes
    a `unique_<col>` check where violations = n_rows − n_distinct.
    `min_pass_rate`: per-check acceptance threshold (default 1.0).
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
        aggs.append(F.count_distinct(F.col(key)).alias(f"__d_{key}"))
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
                F.lit("uniqueness").alias("kind"),
                n.alias("n_rows"),
                (n - F.col(f"__d_{key}")).cast("long").alias("n_violations"),
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
