"""Plan-shape audits: assert the physical plans have the properties the
100 TB design depends on — broadcast joins for dims, pushed-down
filters, partial aggregation, and no cartesian products anywhere in the
catalog."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry


def _plan(spark, sf_dir, name: str) -> str:
    df = entry.queries()[name](spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_q3_broadcasts_customer(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q3_top_orders")
    assert "BroadcastHashJoin" in plan
    # top-k is TakeOrderedAndProject, not a global sort
    assert "TakeOrderedAndProject" in plan


def test_q5_broadcasts_all_dims(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q5_nation_revenue")
    assert plan.count("BroadcastHashJoin") >= 4  # customer/supplier/nation/region


def test_q1_pushes_filter_to_scan(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q1_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan


def test_q1_partial_aggregation(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q1_pricing_summary")
    # two HashAggregate nodes: partial (map-side) + final after shuffle
    assert plan.count("HashAggregate") >= 2


def test_scan_prunes_columns(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q_mktsegment_stats")
    # only the 2 needed columns reach the parquet reader
    assert "ReadSchema: struct<c_acctbal:double,c_mktsegment:string>" in plan
    assert "c_custkey" not in plan and "c_name" not in plan


@pytest.mark.parametrize("name", sorted(entry.queries()))
def test_no_cartesian_products(spark, sf_dir, name):
    df = entry.queries()[name](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, f"{name} plans a cartesian product"


@pytest.mark.parametrize(
    "name",
    [
        "etl_recast_vocab",
        "llm_quality",
        "llm_minhash_bands",
        "llm_dedup_exact",
        "llm_cosine_topk",
        "q_sessionize",
    ],
)
def test_no_python_in_hot_paths(spark, sf_dir, name):
    """The JVM-side claim: scalar vocabulary, hashing, folds, and window
    ops never drop into a Python worker (BatchEvalPython /
    ArrowEvalPython / FlatMapGroupsInPandas absent). Only the explicitly
    Pandas-backed multimodal ops may."""
    plan = _plan(spark, sf_dir, name)
    for marker in ("BatchEvalPython", "ArrowEvalPython", "FlatMapGroupsInPandas", "MapInPandas"):
        assert marker not in plan, f"{name} plan contains {marker}"
