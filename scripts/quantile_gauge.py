#!/usr/bin/env python
"""KLL vs bottom-k quantile error at EQUAL STATE on the events table
(round 11, VERDICT r10 stretch): the "which sketch when" gauge that
completes the sketch family's guidance. Both sketches answer "how
distributed"; this measures, at the same number of retained rows, how
much rank accuracy the KLL compactor buys over a uniform bottom-k
sample — and prints KLL's a-priori certificate beside the observed
errors, because the certificate (not the average case) is why KLL
exists.

Method: build a deterministic KLL sketch (id-routed mode) at several k,
count its merged state rows S, then draw bottom-k samples with k = S
(three seeds — the sample's error is a random variable; KLL's is not)
and compare RANK error |true_rank(estimate) - target_rank| / n at the
standard quantiles. Exact ranks come from a full sort on the driver
(events at sf0.1 is small enough; the gauge is about sketch accuracy,
not scan speed).

Usage: python scripts/quantile_gauge.py [sf_dir]
Writes one JSON line (BENCH_QUANTILES.json shape) to stdout.
"""
import bisect
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QS = (0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))

    from pyspark.sql import functions as F

    from flask_data_pipes_spark.operators.sketches import (
        bottomk_sample,
        kll_build,
        kll_merge,
        kll_quantiles,
    )
    from flask_data_pipes_spark.session import EngineConfig, get_spark

    spark = get_spark(
        EngineConfig(app_name="quantile-gauge", master=f"local[{cpus}]")
    )
    spark.sparkContext.setLogLevel("ERROR")
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).select(
        "event_id", F.col("value").cast("double").alias("v")
    ).where(F.col("v").isNotNull())

    data = sorted(r["v"] for r in ev.select("v").collect())
    n = len(data)

    def rank_err(est: float, q: float) -> float:
        # rank of the estimate vs the target rank, as a fraction of n
        true_rank = bisect.bisect_right(data, est)
        target = int(q * (n - 1)) + 1
        return abs(true_rank - target) / n

    rows_out = []
    for k in (64, 128, 256):
        sk = kll_merge(
            kll_build(ev, "v", k=k, id_col="event_id", partitions=16), k=k
        )
        state = sk.count()
        kll_rows = {
            r["q"]: r["value"] for r in kll_quantiles(sk, QS).collect()
        }
        kll_errs = {q: round(rank_err(kll_rows[q], q), 6) for q in QS}
        # certificate: err_bound (absolute ranks) from the merged sketch
        # rebuild — from_rows resets compaction history, so certify with
        # the worst-case formula the tests use
        import math

        cert = (math.log2(max(2, n / k)) + 2) * (n / max(1, k - 1)) / n

        bk_errs = []
        for seed in (47, 101, 977):
            smp = sorted(
                r["v"]
                for r in bottomk_sample(ev, "event_id", k=state, seed=seed)
                .select("v")
                .collect()
            )
            errs = {}
            for q in QS:
                est = smp[min(len(smp) - 1, int(q * (len(smp) - 1)))]
                errs[q] = round(rank_err(est, q), 6)
            bk_errs.append(errs)
        rows_out.append(
            {
                "kll_k": k,
                "state_rows": state,
                "kll_rank_err": kll_errs,
                "kll_max_err": max(kll_errs.values()),
                "kll_cert_bound": round(cert, 6),
                "bottomk_rank_err_by_seed": bk_errs,
                "bottomk_max_err": max(
                    max(e.values()) for e in bk_errs
                ),
                "bottomk_mean_max_err": round(
                    sum(max(e.values()) for e in bk_errs) / len(bk_errs), 6
                ),
            }
        )

    print(
        json.dumps(
            {
                "metric": "quantile_sketch_error_equal_state",
                "table": "events.value",
                "sf_dir": sf_dir,
                "n": n,
                "quantiles": list(QS),
                "rows": rows_out,
                "note": (
                    "rank error |rank(est)-target|/n; bottom-k at k == "
                    "KLL's merged state rows; KLL is deterministic "
                    "(id-routed), bottom-k varies by seed — the "
                    "certificate column is KLL's a-priori worst-case "
                    "bound, which the sample has no analogue of"
                ),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
