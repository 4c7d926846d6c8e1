#!/usr/bin/env python
"""Benchmark: run the headline catalog queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line: {"metric", "value", "unit", "queries", "sf"}.

Each query is fully materialized through the noop sink (evaluates every
expression, no driver-side collect — the number measures the engine,
not py4j transfer).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q1_pricing_summary",
    "q3_top_orders",
    "q5_nation_revenue",
    "q_top3_orders_per_customer",
    "q_events_hourly",
    "etl_recast_vocab",
    "etl_denormalize",
    "llm_quality",
    "llm_dedup_exact",
    "llm_minhash_pairs",
    "llm_cosine_topk",
    "llm_embedding_neardup",
    "llm_ngram_jaccard_pairs",
    "llm_fingerprint",
    "llm_lsh_topk",
    "q_salted_agg",
    "q_asof_join",
    "q_range_join",
    "q_percentiles",
    "llm_corpus_clean",
    "llm_repetition",
    "llm_decontaminate",
    "llm_pack_sequences",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))

    from flask_data_pipes_spark.session import EngineConfig, get_spark

    spark = get_spark(EngineConfig(app_name="fdps-bench", master=f"local[{cpus}]"))
    spark.sparkContext.setLogLevel("ERROR")

    from flask_data_pipes_spark import plans

    qs = plans.queries()

    # derive sf from the dir name (e.g. .../sf0.1 → 0.1)
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        sf = float(base.replace("sf", ""))
    except ValueError:
        sf = None

    # Warm up: touch every table once so the first timed query isn't
    # charged JVM/session/reader-metadata startup.
    from flask_data_pipes_spark.plans.catalog import load

    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        load(spark, sf_dir, t).count()

    # Steady-state measurement: first compile+JIT each query's generated
    # code against the smallest SF (same schema → same codegen classes),
    # so the timed run below measures data-proportional engine cost, not
    # one-time plan compilation. Standard warm-run benchmarking; the
    # timed run is the full query at the target SF.
    warm_dir = "/root/testdata/sf0.001"
    warm_dir = warm_dir if os.path.isdir(warm_dir) else sf_dir
    for name in HEADLINE:
        qs[name](spark, warm_dir).write.mode("overwrite").format("noop").save()

    # Min-of-N: local timings carry scheduler/GC noise well above the
    # per-query floor; the minimum is the best estimate of engine cost.
    # Queries with >1s of real work get an extra repeat — round 1→2
    # showed their minima move ±20% run-to-run on a loaded box, and one
    # more draw tightens the min estimate where a regression verdict
    # actually hinges.
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "2"))
    heavy = {
        "q1_pricing_summary",
        "q3_top_orders",
        "q_percentiles",
        "llm_minhash_pairs",
        "llm_ngram_jaccard_pairs",
        "llm_corpus_clean",
        "llm_lsh_topk",
        "llm_decontaminate",
        "llm_fingerprint",
    }
    load_before = os.getloadavg()
    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs[name]
        best = float("inf")
        n = max(1, repeats, 3 if name in heavy else 0)
        for _ in range(n):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_wall_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                # machine-load context so the recorded number can be
                # argued against its environment (1/5/15-min loadavg
                # sampled before and after the timed section).
                "loadavg_before": [round(x, 2) for x in load_before],
                "loadavg_after": [round(x, 2) for x in os.getloadavg()],
            }
        )
    )


if __name__ == "__main__":
    main()
