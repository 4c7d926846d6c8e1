#!/usr/bin/env python
"""Capture .explain("formatted") for catalog queries into plans/r16/.

Usage: python scripts/capture_plans.py <suffix> [name ...]
  suffix: "before" or "after" (file name tag)
  names:  query names; default = bench.py HEADLINE list

Writes plans/r16/<name>_<suffix>.txt. Plans are built lazily (no
action is run), so this is cheap and safe to run alongside other work.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    from bench import HEADLINE

    names = sys.argv[2:] or HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from flask_data_pipes_spark.session import EngineConfig, get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    spark = get_spark(
        EngineConfig(app_name="fdps-capture-plans", master=f"local[{cpus}]")
    )
    spark.sparkContext.setLogLevel("ERROR")

    from flask_data_pipes_spark import plans

    qs = plans.queries()
    out_dir = os.path.join(HERE, "plans", "r16")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as e:  # noqa: BLE001 — record, keep going
            text = f"ERROR building/explaining {name}: {type(e).__name__}: {e}\n"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(text)
        print(f"{name}: {len(text)} bytes -> {path}")


if __name__ == "__main__":
    main()
