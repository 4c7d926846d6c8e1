#!/usr/bin/env python
"""Per-merge cost curve for BPE training at sf0.1 (VERDICT r6 #3):
full-recompute `bpe_train` vs delta-patching `bpe_train_incremental`
at n_merges=256 on the same word table. Prints one JSON line with
per-merge seconds bucketed by merge index — the evidence that the
incremental trainer's per-merge cost is FLAT in the merge index while
staying merge-for-merge identical (parity asserted here too).

Usage: python scripts/bpe_curve.py [n_merges]
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bucketize(times: list, n_buckets: int = 8) -> list:
    if not times:
        return []
    size = max(1, len(times) // n_buckets)
    out = []
    for i in range(0, len(times), size):
        chunk = times[i : i + size]
        out.append(
            {
                "merges": f"{i}-{i + len(chunk) - 1}",
                "mean_sec": round(sum(chunk) / len(chunk), 3),
                "max_sec": round(max(chunk), 3),
            }
        )
    return out


def synthetic_words(spark, n: int):
    """Seeded `(word, cnt, symbols)` table with `n` DISTINCT words —
    md5-derived hex strings of length 8-16, Zipf-ish counts. The sf0.1
    documents draw from a 31-word pool (degenerate for this gauge: at
    31 words the fixed per-job overhead dominates and BOTH trainers
    are flat); the incremental trainer's advantage is asymptotic in
    vocabulary size, so the curve is measured where vocabulary is the
    cost — a million distinct words, the Heaps-law scale of a real
    corpus shard."""
    from pyspark.sql import functions as F

    w = spark.range(n).select(
        F.substring(
            F.md5(F.col("id").cast("string")), 1, (F.col("id") % 9 + 8).cast("int")
        ).alias("word"),
        (F.lit(n) / (F.col("id") + 1)).cast("long").alias("cnt"),
    )
    # md5 truncation can collide; keep one row per word (sum counts)
    return (
        w.groupBy("word")
        .agg(F.sum("cnt").alias("cnt"))
        .select("word", "cnt", F.split(F.col("word"), "").alias("symbols"))
    )


def main() -> None:
    n_merges = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    n_vocab = int(os.environ.get("BPE_CURVE_VOCAB", "1000000"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))

    from flask_data_pipes_spark.operators import bpe
    from flask_data_pipes_spark.session import EngineConfig, get_spark

    spark = get_spark(
        EngineConfig(app_name="bpe-curve", master=f"local[{cpus}]")
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = None  # words passed explicitly below
    words = synthetic_words(spark, n_vocab).repartition(32).localCheckpoint(
        eager=True
    )
    n_words = words.count()

    def _prog(tag, times):
        def cb(i, a, b, c, s):
            times.append(s)
            if i % 16 == 0:
                print(f"# {tag} merge {i}: {s:.2f}s", file=sys.stderr, flush=True)
        return cb

    inc_times: list = []
    inc = bpe.bpe_train_incremental(
        docs,
        n_merges=n_merges,
        words=words,
        on_merge=_prog("inc", inc_times),
    )

    # full-recompute comparison on a prefix (it is the O(v·vocab)
    # baseline being replaced; a prefix suffices to see its per-merge
    # floor — and doubles as the merge-for-merge parity check at depth)
    full_n = min(n_merges, int(os.environ.get("BPE_CURVE_FULL_MERGES", "64")))
    full_times: list = []
    full = bpe.bpe_train(
        docs,
        n_merges=full_n,
        words=words,
        on_merge=_prog("full", full_times),
    )
    assert inc[: len(full)] == full, "incremental/full merge sequences diverge"

    out = {
        "metric": "bpe_per_merge_cost",
        "sf_dir": sf_dir,
        "n_words": n_words,
        "n_merges_incremental": len(inc),
        "n_merges_full": len(full),
        "parity_prefix_ok": True,
        "incremental_curve": bucketize(inc_times),
        "full_curve": bucketize(full_times),
        "incremental_total_sec": round(sum(inc_times), 2),
        "full_total_sec_prefix": round(sum(full_times), 2),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
