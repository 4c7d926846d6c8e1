"""Physical-plan shape assertions — the scale contract, enforced.

Correctness tests prove the operators compute the right answer at small
SF; these tests prove the PLANS are the ones that survive a 100 TB /
1000-executor scale-up: filters and projections reach the parquet scan,
dimension joins broadcast instead of shuffling the fact table, nothing
degenerates into a cartesian product, and per-row operator pipelines
stay inside whole-stage codegen.

Plan text is taken from `explain(mode="formatted")` on the final
(AQE-prepared) physical plan.
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

import pytest

from flask_data_pipes_spark import plans


def _formatted_plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def _node_count(plan: str, node: str) -> int:
    """Count physical nodes via their '(n) NodeName' detail headers
    (the tree section prints every node a second time)."""
    return len(re.findall(rf"^\(\d+\) {node}", plan, re.M))


def _q(spark, sf_dir, name):
    return plans.queries()[name](spark, sf_dir)


def test_no_cartesian_anywhere(spark, sf_dir):
    """No catalog query may plan a cartesian/nested-loop product —
    the one shape that cannot survive any scale-up.

    (The single intended cross join — IVF's query×centroid table, a
    n_cells-row broadcast — plans as BroadcastNestedLoopJoin; anything
    CartesianProduct-shaped is a bug.)
    """
    for name, fn in plans.queries().items():
        plan = _formatted_plan(fn(spark, sf_dir))
        assert "CartesianProduct" not in plan, f"{name} plans a cartesian product"


@pytest.mark.parametrize("name", ["q3_top_orders", "q5_nation_revenue"])
def test_dim_joins_broadcast(spark, sf_dir, name):
    """Dimension joins must broadcast: the fact table never shuffles on
    a dimension key."""
    plan = _formatted_plan(_q(spark, sf_dir, name))
    assert "BroadcastHashJoin" in plan, f"{name}: no broadcast join in plan"


def test_q3_limit_is_take_ordered(spark, sf_dir):
    """ORDER BY + LIMIT must plan as TakeOrderedAndProject (per-partition
    top-k + merge), never a global sort materialization."""
    plan = _formatted_plan(_q(spark, sf_dir, "q3_top_orders"))
    assert "TakeOrderedAndProject" in plan


def test_q1_filter_pushed_to_scan(spark, sf_dir):
    """The shipdate predicate must reach the parquet scan as a pushed
    filter (row-group pruning at scale), and the scan must prune to the
    7 referenced columns."""
    plan = _formatted_plan(_q(spark, sf_dir, "q1_pricing_summary"))
    scan = plan[plan.index("Scan parquet") :]
    pushed = scan[scan.index("PushedFilters") :].splitlines()[0]
    assert "l_shipdate" in pushed, f"shipdate not pushed: {pushed}"
    read = scan[scan.index("ReadSchema") :].splitlines()[0]
    assert "l_comment" not in read, "scan reads unprojected columns"
    assert read.count(",") <= 7


def test_narrow_maps_have_no_exchange(spark, sf_dir):
    """Pure per-row operator queries (scalar vocab, token stats, quality,
    language id) must plan zero shuffles."""
    for name in ["etl_recast_vocab", "llm_token_stats", "llm_quality", "llm_langid"]:
        plan = _formatted_plan(_q(spark, sf_dir, name))
        assert "Exchange" not in plan, f"{name} shuffles a narrow map"


def test_q1_aggregate_is_partial_then_final(spark, sf_dir):
    """groupBy must plan map-side partial aggregation: two HashAggregate
    nodes around one Exchange, so only (#keys × #cores) rows shuffle
    regardless of input size."""
    plan = _formatted_plan(_q(spark, sf_dir, "q1_pricing_summary"))
    assert plan.count("HashAggregate") >= 2
    first_agg = plan.index("HashAggregate")
    assert "Exchange" in plan[first_agg:]


def test_exact_dedup_single_shuffle(spark, sf_dir):
    """Exact dedup = one shuffle on the fingerprint, nothing else."""
    plan = _formatted_plan(_q(spark, sf_dir, "llm_dedup_exact"))
    assert _node_count(plan, "Exchange") == 1


def test_minhash_pairs_shuffles_bounded(spark, sf_dir):
    """LSH pairing: band-key agg + pair distinct (+ the small-input
    spread) — shuffles must stay ≤3 and the signature subtree appears
    once (no self-join double evaluation: exactly one scan of
    documents)."""
    plan = _formatted_plan(_q(spark, sf_dir, "llm_minhash_pairs"))
    assert _node_count(plan, "Exchange") <= 3
    assert _node_count(plan, "Scan parquet") == 1


def test_cosine_topk_broadcasts_queries(spark, sf_dir):
    """Brute-force top-k must broadcast the query set (Q×N, linear in
    corpus) — the corpus side never shuffles for the join."""
    plan = _formatted_plan(_q(spark, sf_dir, "llm_cosine_topk"))
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
