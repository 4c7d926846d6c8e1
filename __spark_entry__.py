"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship query (TPC-H-Q1-shaped pricing summary)
at sf0.001. `queries()` / `oracle_sql()` expose the full catalog from
flask_data_pipes_spark.plans — one entry per implemented operator from
SURVEY.md §2 (+ §2.9 extensions), each with a DuckDB oracle unless the
op is genuinely non-SQL-expressible.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from flask_data_pipes_spark import plans


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return plans.queries()["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return plans.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each query (absent → driver
    records a weaker rows-only check)."""
    return plans.oracle_sql()
