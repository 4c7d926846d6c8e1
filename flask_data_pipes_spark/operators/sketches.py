"""Mergeable frequency sketches for corpus-scale counting.

Count-min sketch (Cormode & Muthukrishnan 2005): a d x w integer
matrix where every item increments one counter per row (hash_i(v) mod
w); an item's estimate is the MIN over its d counters — never an
underestimate, overestimates bounded by ~N/w per row with probability
1 - (1/2)^d. The at-scale complement to exact top-k counting
(plans/catalog_llm.py::llm_ngram_topk): the sketch is O(d*w) no matter
the vocabulary, merges by cell-wise addition (map-side combinable,
cross-shard addable), and answers point queries without keeping the
long tail.

Everything is md5-hashed (functions/text.md5_long) so builds and
estimates are deterministic and DuckDB-oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions import text as T

__all__ = ["cms_build", "cms_estimate"]


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
