#!/usr/bin/env python
"""Time individual catalog queries through the noop sink (min-of-N).

Usage: python scripts/microbench.py [-n N] [--sf DIR] name [name ...]

Same methodology as bench.py (warm on sf0.001 first, then min-of-N at
the target SF through the noop sink) so numbers are comparable, without
paying for the whole headline stage while iterating on one operator.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("-n", type=int, default=3)
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--no-warm", action="store_true")
    args = ap.parse_args()

    from flask_data_pipes_spark.session import EngineConfig, get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    spark = get_spark(
        EngineConfig(app_name="fdps-microbench", master=f"local[{cpus}]")
    )
    spark.sparkContext.setLogLevel("ERROR")

    from flask_data_pipes_spark import plans
    from flask_data_pipes_spark.plans.catalog import load

    qs = plans.queries()
    for t in ["lineitem", "orders", "events", "documents", "embeddings"]:
        try:
            load(spark, args.sf, t).count()
        except Exception:
            pass
    warm_dir = "/root/testdata/sf0.001"
    warm_dir = warm_dir if os.path.isdir(warm_dir) else args.sf
    for name in args.names:
        if not args.no_warm:
            qs[name](spark, warm_dir).write.mode("overwrite").format("noop").save()
        best, all_runs = float("inf"), []
        for _ in range(max(1, args.n)):
            t0 = time.perf_counter()
            qs[name](spark, args.sf).write.mode("overwrite").format("noop").save()
            dt = time.perf_counter() - t0
            all_runs.append(round(dt, 3))
            best = min(best, dt)
        print(f"{name}: min={best:.3f}s runs={all_runs}")


if __name__ == "__main__":
    main()
