"""Similarity search over embedding columns (SURVEY.md §2.9):
brute-force cosine top-k (baseline) and random-hyperplane LSH
(the scale path).

Scale design:
- Brute force is Q×N with the QUERY SET broadcast — linear in corpus,
  right answer for small Q. Never N×N.
- LSH buckets corpus and queries by sign-pattern over H deterministic
  hyperplanes; candidates = same-bucket rows (+ optional multi-probe
  neighbors); exact rerank only within candidates. At 1000 executors
  the bucket join is an equi-join on a 2^H-ary key, shuffle-light.
- Hyperplanes are generated from a seeded RNG on the driver and
  embedded as literals → fully deterministic plans (and SQL-twin
  expressible for the oracle gate).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
from pyspark.sql import DataFrame, Window, functions as F

from ..functions import vectors as V

__all__ = ["cosine_topk", "hyperplanes", "lsh_bucket_expr", "lsh_topk", "ivf_topk"]


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "qid",
    round_to: Optional[int] = 6,
) -> DataFrame:
    """Exact top-k neighbors per query vector (brute force baseline).
    `queries` must be small (it broadcasts). Rounding + id tie-break
    make the ranking fully deterministic.

    Per-pair cost is ONE dot product: 1/norm is precomputed per row in
    projections *under* the join (a materialization barrier Catalyst
    cannot collapse through), so cosine = dot·inv_q·inv_c — vs
    recomputing both norms for every (query, candidate) pair."""
    q = queries.select(
        F.col(query_id_col),
        F.col(vec_col).cast("array<double>").alias("__qv"),
        F.try_divide(F.lit(1.0), V.norm(vec_col)).alias("__qinv"),
    )
    c = corpus.select(
        F.col(id_col),
        F.col(vec_col).cast("array<double>").alias("__v"),
        F.try_divide(F.lit(1.0), V.norm(vec_col)).alias("__inv"),
    )
    sim = V.dot(F.col("__qv"), F.col("__v")) * F.col("__qinv") * F.col("__inv")
    if round_to is not None:
        sim = F.round(sim, round_to)
    w = Window.partitionBy(query_id_col).orderBy(F.desc("sim"), F.asc(id_col))
    return (
        c.join(F.broadcast(q), F.col(query_id_col) != F.col(id_col))
        .select(query_id_col, id_col, sim.alias("sim"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "qid",
    seed: int = 42,
    max_iter: int = 5,
    round_to: Optional[int] = 6,
) -> DataFrame:
    """IVF-style ANN: coarse-quantize the corpus into KMeans cells, probe
    each query's `n_probe` nearest cells, exact-rerank within candidates.

    Scale shape: the centroid table is n_cells rows (broadcast
    everywhere); cell assignment is one model.transform map over the
    corpus; the candidate join is an equi-join on cell id touching
    ~n_probe/n_cells of the corpus per query. The KMeans fit itself is
    pyspark.ml's distributed Lloyd's — sampled/iterative, run once and
    reusable across query batches. Seeded → deterministic locally, but
    kmeans is not SQL-expressible → rows-only correctness check.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = corpus.select(
        F.col(id_col),
        F.col(vec_col).cast("array<double>").alias("__v"),
        F.try_divide(F.lit(1.0), V.norm(vec_col)).alias("__inv"),
    ).withColumn("__features", array_to_vector(F.col("__v")))
    model = KMeans(
        k=n_cells,
        seed=seed,
        maxIter=max_iter,
        featuresCol="__features",
        predictionCol="__cell",
    ).fit(feats)
    assigned = model.transform(feats).select(id_col, "__v", "__inv", "__cell")

    centers = [[float(x) for x in c] for c in model.clusterCenters()]
    cent_df = corpus.sparkSession.createDataFrame(
        [(i, c) for i, c in enumerate(centers)], "__cell int, __cv array<double>"
    )
    q = queries.select(
        F.col(query_id_col),
        F.col(vec_col).cast("array<double>").alias("__qv"),
        F.try_divide(F.lit(1.0), V.norm(vec_col)).alias("__qinv"),
    )
    wq = Window.partitionBy(query_id_col).orderBy(
        F.asc("__cdist"), F.asc("__cell")
    )
    probed = (
        q.crossJoin(F.broadcast(cent_df))
        .withColumn("__cdist", V.l2_distance(F.col("__qv"), F.col("__cv")))
        .withColumn("__crnk", F.row_number().over(wq))
        .filter(F.col("__crnk") <= n_probe)
        .select(query_id_col, "__qv", "__qinv", "__cell")
    )
    sim = V.dot(F.col("__qv"), F.col("__v")) * F.col("__qinv") * F.col("__inv")
    if round_to is not None:
        sim = F.round(sim, round_to)
    w = Window.partitionBy(query_id_col).orderBy(F.desc("sim"), F.asc(id_col))
    return (
        assigned.join(
            F.broadcast(probed),
            (assigned["__cell"] == probed["__cell"])
            & (F.col(query_id_col) != F.col(id_col)),
        )
        .select(query_id_col, id_col, sim.alias("sim"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
    )


def hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic random hyperplanes (rounded to 6dp so the literal
    values embed identically in Spark plans and SQL oracles)."""
    rng = np.random.RandomState(seed)
    return [
        [round(float(x), 6) for x in rng.randn(dim)] for _ in range(n_planes)
    ]
def lsh_bucket_expr(vec_col, planes: list[list[float]]):
    """Sign-pattern bucket id: bit j = (v · h_j) >= 0. Pure fold over
    literal arrays — codegen, no UDF."""
    bucket = F.lit(0).cast("long")
    for j, h in enumerate(planes):
        lit_h = F.array(*[F.lit(x) for x in h])
        d = V.dot(vec_col, lit_h)
        bucket = bucket + F.when(d >= 0, F.lit(1 << j)).otherwise(F.lit(0))
    return bucket


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "qid",
    dim: int = 64,
    seed: int = 42,
    round_to: Optional[int] = 6,
) -> DataFrame:
    """Approximate top-k: bucket by hyperplane signs, exact-rerank
    within the query's bucket. Recall grows with fewer planes / multi-
    probe; this single-probe form is the deterministic gate-checkable
    core."""
    planes = hyperplanes(dim, n_planes, seed)
    c = corpus.select(
        F.col(id_col),
        F.col(vec_col).cast("array<double>").alias("__v"),
        F.try_divide(F.lit(1.0), V.norm(vec_col)).alias("__inv"),
        lsh_bucket_expr(F.col(vec_col), planes).alias("__bucket"),
    )
    q = queries.select(
        F.col(query_id_col),
        F.col(vec_col).cast("array<double>").alias("__qv"),
        F.try_divide(F.lit(1.0), V.norm(vec_col)).alias("__qinv"),
        lsh_bucket_expr(F.col(vec_col), planes).alias("__qbucket"),
    )
    # 1/norm precomputed per row under the join barrier: per-candidate
    # cost is one dot product, not dot + two norms.
    sim = V.dot(F.col("__qv"), F.col("__v")) * F.col("__qinv") * F.col("__inv")
    if round_to is not None:
        sim = F.round(sim, round_to)
    w = Window.partitionBy(query_id_col).orderBy(F.desc("sim"), F.asc(id_col))
    return (
        c.join(
            F.broadcast(q),
            (F.col("__bucket") == F.col("__qbucket"))
            & (F.col(query_id_col) != F.col(id_col)),
        )
        .select(query_id_col, id_col, sim.alias("sim"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
    )
