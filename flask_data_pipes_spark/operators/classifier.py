"""Distributed training for the hashed linear text classifier — the
missing half of `functions/text.py::hashed_linear_score`.

`hashed_linear_score` scores documents with a FIXED weight vector
(p = sigmoid(bias + mean of w[h(token) % D])) as one codegen
expression; this module TRAINS that vector in-cluster: full-batch
logistic regression by gradient descent over hashed bag-of-words
features — the fastText-style model-based quality filter
(DCLM / FineWeb-edu shape: weak labels in, a D-dimensional weight
vector out, then scoring is one scan).

Why full-batch GD and not SGD/L-BFGS: the loss is convex, the model is
tiny (D+1 doubles), and one full-batch gradient is ONE Spark
aggregation — the cluster-friendly shape. Each iteration costs a pass
over the persisted feature table plus a ≤(D+1)-row exchange; driver
state is the weight vector only. At 100 TB per-iteration cost is the
feature-table scan (co-partitioned by doc id, so the per-doc score and
the gradient join reuse one partitioning; the only new exchange per
iteration is the D+1-row bucket rollup).

Determinism (the catalog's cross-engine discipline, applied to a
LOOP): every dot-product / gradient term is rounded to 12 dp and
summed as DECIMAL(38,12) (exact, associative — partitioning-
independent); the sigmoid is rounded to 6 dp to absorb libm exp()
ulps. The weight trajectory is therefore bit-reproducible across
partitionings AND reproducible by DuckDB running the same unrolled
arithmetic — which is what makes a TRAINED model oracle-checkable
(see plans/catalog_llm.py::llm_lr_train).

Feature convention: x[b] = count of tokens hashing to bucket b / n
(L1-normalized hashed counts), bias as the constant feature x[D] = 1.
Then z = Σ_b x[b]·w[b] equals bias + mean of w[h(token) % D] — exactly
`hashed_linear_score`'s fold, so trained weights plug straight into
the one-expression scorer (`lr_score`).

Reference parity note: the reference engine has no trainer — this is
§2.9 extension surface (training-data pipeline needs), built on the
same md5 hash family every oracled operator uses.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

from pyspark.sql import Column, DataFrame, functions as F

from ..functions.text import hashed_linear_score, md5_long, whitespace_tokens

__all__ = [
    "LRModel",
    "hashed_features",
    "lr_train_hashed",
    "lr_score",
    "lr_model_save",
    "lr_model_load",
    "auc_report",
]


@dataclass
class LRModel:
    """Trained hashed-LR model: `weights[b]` for buckets 0..D-1,
    `bias`, the hash `seed` that MUST be reused at scoring time, and
    the per-iteration `history` ({iter, logloss, accuracy})."""

    weights: List[float]
    bias: float
    seed: int
    lr: float
    l2: float
    history: List[dict] = field(default_factory=list)

    @property
    def n_features(self) -> int:
        return len(self.weights)


def hashed_features(
    docs: DataFrame,
    label_col: Optional[str] = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_features: int = 64,
    seed: int = 29,
) -> DataFrame:
    """Exploded L1-normalized hashed bag-of-words:
    (doc_id[, y], bucket, x) with x = count(bucket)/n_tokens, plus one
    bias row per document (bucket = n_features, x = 1.0). Empty /
    whitespace-only documents are dropped (no tokens to score — the
    same contract as `hashed_linear_score`'s NULL).

    One explode + one (doc, bucket) aggregation; the shuffle carries
    at most min(n_tokens, D)+1 rows per document. Output is hash-
    partitioned by doc id so the training loop's per-doc score and
    gradient join both reuse the partitioning without new exchanges.
    """
    cols = [id_col] + ([label_col] if label_col else [])
    base = docs.filter(F.trim(F.col(text_col)) != "").select(
        *cols, whitespace_tokens(F.lower(F.col(text_col))).alias("__toks")
    )
    tok = base.select(
        *cols,
        F.explode(F.col("__toks")).alias("__t"),
        F.size("__toks").alias("__n"),
    )
    feat = tok.groupBy(*cols, (md5_long("__t", seed) % n_features)
                       .cast("int").alias("bucket")).agg(
        (F.count(F.lit(1)) / F.first("__n")).alias("x")
    )
    bias_rows = base.select(
        *cols,
        F.lit(n_features).cast("int").alias("bucket"),
        F.lit(1.0).alias("x"),
    )
    out = feat.unionByName(bias_rows)
    if label_col:
        out = out.select(
            id_col,
            F.col(label_col).cast("double").alias("y"),
            "bucket",
            "x",
        )
    return out.repartition(F.col(id_col))


def _dsum12(c: Column) -> Column:
    """Partitioning-independent double sum: 12-dp round, exact decimal
    accumulate, cast back (the catalog's double-sum rule at gradient
    precision)."""
    return F.sum(F.round(c, 12).cast("decimal(38,12)")).cast("double")


def lr_train_hashed(
    docs: DataFrame,
    label_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_features: int = 64,
    seed: int = 29,
    iters: int = 8,
    lr: float = 2.0,
    l2: float = 0.0,
    track_history: bool = True,
) -> LRModel:
    """Full-batch logistic regression over hashed bag-of-words
    features. `label_col` must be 0/1 (castable to double, no NULLs
    among non-empty docs).

    Per iteration (weights live on the DRIVER, D+1 doubles):
      1. z per doc = Σ round(x·w[bucket], 12) (exact decimal sum);
         p = round(sigmoid(z), 6) — one aggregation over the persisted
         feature table, no exchange (co-partitioned by doc id).
      2. gradient[b] = Σ_docs round((p−y)·x, 12) / N — residuals join
         features co-partitioned, then a ≤(D+1)-row rollup.
      3. w ← w − lr·(g + l2·w) (no l2 on bias), plain IEEE driver
         arithmetic — reproducible by any engine running the same ops.

    The update arithmetic is deliberately `w - lr*g` then the l2 term,
    matching the unrolled-SQL oracle term-for-term.
    """
    feats = hashed_features(
        docs, label_col=label_col, text_col=text_col, id_col=id_col,
        n_features=n_features, seed=seed,
    ).persist()
    try:
        counts = feats.filter(F.col("bucket") == n_features).agg(
            F.count(F.lit(1)).alias("n"),
            F.count(F.when(F.col("y").isNull(), 1)).alias("n_null"),
        ).collect()[0]
        n_docs = counts["n"]
        if n_docs == 0:
            raise ValueError(
                "lr_train_hashed: no non-empty documents to train on"
            )
        if counts["n_null"]:
            # a NULL label would silently vanish from the decimal sums
            # (null terms are skipped), biasing the gradient — fail loud
            raise ValueError(
                f"lr_train_hashed: {counts['n_null']} non-empty "
                f"document(s) have NULL {label_col!r} — labels must be "
                "0/1 with no NULLs; filter or impute upstream"
            )
        D = n_features
        w = [0.0] * (D + 1)  # w[D] is the bias
        history: List[dict] = []
        for it in range(iters):
            wlit = F.array(*[F.lit(float(v)) for v in w])
            term = F.round(
                F.col("x") * F.element_at(wlit, F.col("bucket") + 1), 12
            ).cast("decimal(38,12)")
            scored = (
                feats.groupBy(id_col, "y")
                .agg(F.sum(term).cast("double").alias("z"))
                .withColumn(
                    "p",
                    F.round(
                        F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("z"))), 6
                    ),
                )
                .withColumn("resid", F.col("p") - F.col("y"))
            )
            if track_history:
                pc = F.least(
                    F.greatest(F.col("p"), F.lit(1e-6)), F.lit(1.0 - 1e-6)
                )
                stats = scored.agg(
                    _dsum12(
                        -(
                            F.col("y") * F.log(pc)
                            + (F.lit(1.0) - F.col("y")) * F.log1p(-pc)
                        )
                    ).alias("loss_sum"),
                    F.sum(
                        ((F.col("p") >= 0.5) == (F.col("y") >= 0.5))
                        .cast("long")
                    ).alias("n_correct"),
                ).collect()[0]
                history.append(
                    {
                        "iter": it,
                        "logloss": round(stats["loss_sum"] / n_docs, 6),
                        "accuracy": round(stats["n_correct"] / n_docs, 6),
                    }
                )
            grad_rows = (
                feats.join(scored.select(id_col, "resid"), id_col)
                .groupBy("bucket")
                .agg(_dsum12(F.col("resid") * F.col("x")).alias("gsum"))
                .collect()
            )
            g = [0.0] * (D + 1)
            for r in grad_rows:
                g[r["bucket"]] = r["gsum"] / n_docs
            for b in range(D + 1):
                step = w[b] - lr * g[b]
                if l2 and b < D:  # no decay on the bias
                    step = step - lr * (l2 * w[b])
                w[b] = step
        return LRModel(
            weights=w[:D], bias=w[D], seed=seed, lr=lr, l2=l2,
            history=history,
        )
    finally:
        feats.unpersist()


def lr_model_save(spark, model: LRModel, path: str) -> None:
    """Persist a trained LRModel as parquet — the `vocab_save`/
    `ivf_save` discipline applied to the classifier (VERDICT r12
    "What's missing" #2): train once, score tomorrow's batch in any
    session/job without re-paying the GD iterations. Works on any
    Hadoop-compatible FS (no driver-local path assumption).

    Layout: `path`/weights = (bucket, weight) with the bias at
    bucket = n_features (the same shape llm_lr_train's gate entry
    emits); `path`/meta = one row (n_features, seed, lr, l2,
    history_json). Doubles round-trip bit-exactly through parquet;
    history round-trips exactly through JSON (repr-based float
    serialization)."""
    import json as _json

    D = model.n_features
    spark.createDataFrame(
        [(b, float(w)) for b, w in enumerate(model.weights)]
        + [(D, float(model.bias))],
        "bucket int, weight double",
    ).coalesce(1).write.mode("overwrite").parquet(path + "/weights")
    spark.createDataFrame(
        [
            (
                D,
                int(model.seed),
                float(model.lr),
                float(model.l2),
                _json.dumps(model.history),
            )
        ],
        "n_features int, seed long, lr double, l2 double, "
        "history_json string",
    ).coalesce(1).write.mode("overwrite").parquet(path + "/meta")


def lr_model_load(spark, path: str) -> LRModel:
    """Reload a `lr_model_save`d model, bit-identical weights/bias —
    score parity with the in-memory model is round-trip-tested
    (tests/test_classifier.py). The returned LRModel plugs straight
    into `lr_score`."""
    import json as _json

    meta = spark.read.parquet(path + "/meta").collect()[0]
    D = meta["n_features"]
    rows = spark.read.parquet(path + "/weights").collect()
    w = [0.0] * (D + 1)
    for r in rows:
        w[r["bucket"]] = r["weight"]
    return LRModel(
        weights=w[:D],
        bias=w[D],
        seed=int(meta["seed"]),
        lr=meta["lr"],
        l2=meta["l2"],
        history=_json.loads(meta["history_json"]),
    )


def lr_score(
    c,
    model: LRModel,
    toks: "Column | None" = None,
) -> Column:
    """Score text with a trained model — delegates to the one-codegen-
    expression `hashed_linear_score` (same hash seed, trained weights,
    trained bias): training features were L1-normalized counts, so the
    scorer's mean-of-weights fold computes the identical z."""
    return hashed_linear_score(
        c, model.weights, seed=model.seed, bias=model.bias, toks=toks
    )


def auc_report(
    scored: DataFrame,
    score_col: str = "p",
    label_col: str = "y",
) -> DataFrame:
    """ROC AUC of a scored binary-labeled frame, computed WITHOUT a
    global per-row ranking: scores collapse to a (score → n_pos,
    n_neg) table first (one map-side-combined aggregation), then the
    Mann-Whitney identity folds over DISTINCT scores —
    AUC = Σ_s n_pos(s)·(N_neg<s + ½·n_neg(s)) / (P·N), which equals
    the average-rank (tie-adjusted) AUC exactly.

    Scale: the prefix sum runs over the aggregated per-score table
    (cardinality ≤ distinct scores — bounded at 10^6+1 when scores are
    6-dp probabilities) via `partitioned_cumsum` — the ks_drift/
    equidepth DISTRIBUTED shape (range-repartition + within-partition
    window + tiny offsets table), so there is no single-task global
    window and raw rows never sort globally. Output: one row
    (n_pos, n_neg, auc 6-dp).

    Ties in score between a positive and a negative contribute ½ each
    (the standard trapezoidal/average-rank convention), so a constant
    scorer reads exactly 0.5.

    Degenerate input (single-class: n_pos == 0 or n_neg == 0) has no
    defined ROC — `auc` is NULL BY CONTRACT (guarded explicitly, not
    a silent divide-by-zero); callers that require both classes should
    assert n_pos > 0 and n_neg > 0 on the returned row."""
    from .corpus import partitioned_cumsum

    per_score = scored.groupBy(F.col(score_col).alias("__s")).agg(
        F.sum(F.col(label_col).cast("long")).alias("__np"),
        F.sum(
            (F.lit(1) - F.col(label_col).cast("long"))
        ).alias("__nn"),
    )
    cum = partitioned_cumsum(per_score, "__s", ["__nn"]).withColumn(
        "__contrib",
        F.col("__np")
        * (
            (F.col("__cum___nn") - F.col("__nn")).cast("double")
            + F.lit(0.5) * F.col("__nn").cast("double")
        ),
    )
    pos = F.sum("__np").cast("long")
    neg = F.sum("__nn").cast("long")
    return cum.agg(
        pos.alias("n_pos"),
        neg.alias("n_neg"),
        F.when(
            (pos > 0) & (neg > 0),
            F.round(
                F.sum("__contrib")
                / (pos.cast("double") * neg.cast("double")),
                6,
            ),
        ).alias("auc"),
    )
