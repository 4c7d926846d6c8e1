"""Semantics tests for operators/analytics.py beyond what the DuckDB
oracles assert: funnel ordering edge-cases and conversion windows,
cohort retention invariants, salted-join equivalence + plan shape,
compaction-plan bin invariants."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from flask_data_pipes_spark.operators.analytics import (
    cohort_retention,
    compaction_plan,
    funnel,
    salted_join,
)


def _ts(day, h=0, m=0):
    return datetime.datetime(2024, 1, day, h, m)


@pytest.fixture(scope="module")
def funnel_events(spark):
    # u1: full ordered funnel. u2: click BEFORE any view (click must
    # not count). u3: view only. u4: view then purchase (no click —
    # purchase must not count, funnel is ordered). u5: full funnel but
    # purchase 10 days after view (trimmed by conversion_window).
    rows = [
        (1, "u1", "view", _ts(1)), (2, "u1", "click", _ts(2)),
        (3, "u1", "purchase", _ts(3)),
        (4, "u2", "click", _ts(1)), (5, "u2", "view", _ts(2)),
        (6, "u3", "view", _ts(1)),
        (7, "u4", "view", _ts(1)), (8, "u4", "purchase", _ts(2)),
        (9, "u5", "view", _ts(1)), (10, "u5", "click", _ts(2)),
        (11, "u5", "purchase", _ts(11)),
    ]
    return spark.createDataFrame(
        rows, "event_id long, user_id string, event_type string, ts timestamp"
    )


def test_funnel_ordered_semantics(spark, funnel_events):
    out = funnel(
        funnel_events, ["view", "click", "purchase"], user_col="user_id",
        order_col="event_id",
    ).collect()
    by_step = {r.step: r.n_users for r in out}
    assert [r.step_idx for r in out] == [1, 2, 3]
    # views: u1,u2(view after click still counts as a view),u3,u4,u5
    assert by_step["view"] == 5
    # clicks at-or-after first view: u1, u5 (u2's click precedes its view)
    assert by_step["click"] == 2
    # purchases after a qualifying click: u1, u5 (u4 never clicked)
    assert by_step["purchase"] == 2


def test_funnel_conversion_window_trims(spark, funnel_events):
    out = funnel(
        funnel_events, ["view", "click", "purchase"], user_col="user_id",
        order_col="event_id", conversion_window=7 * 86400,
    ).collect()
    by_step = {r.step: r.n_users for r in out}
    # u5's purchase lands 10 days after its first view -> outside window
    assert by_step["purchase"] == 1
    assert by_step["click"] == 2


def test_funnel_validation(spark, funnel_events):
    with pytest.raises(ValueError, match="at least 2"):
        funnel(funnel_events, ["view"])
    with pytest.raises(ValueError, match="distinct"):
        funnel(funnel_events, ["view", "view"])


def test_funnel_single_shuffle_plan(spark, funnel_events):
    out = funnel(
        funnel_events, ["view", "click", "purchase"], user_col="user_id",
        order_col="event_id",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the per-user groupBy reuses the window's hash partitioning on
    # user_id: exactly one exchange over the event table (plus the
    # single-row final aggregate's trivial exchange)
    n_exchanges = plan.count("Exchange hashpartitioning(user_id")
    assert n_exchanges == 1, plan


def test_cohort_retention_invariants(spark):
    rows = [
        # u1 first event Mon Jan 1 week; active weeks 0 and 2
        (1, "u1", _ts(2)), (2, "u1", _ts(16)),
        # u2 same cohort, active week 0 only
        (3, "u2", _ts(3)),
        # u3 cohort of Jan 8 week, active weeks 0,1
        (4, "u3", _ts(9)), (5, "u3", _ts(16)),
    ]
    e = spark.createDataFrame(rows, "event_id long, user_id string, ts timestamp")
    out = cohort_retention(e, user_col="user_id", ts_col="ts").collect()
    cells = {(r.cohort_week.date(), r.week_offset): r for r in out}
    w1, w2 = datetime.date(2024, 1, 1), datetime.date(2024, 1, 8)
    assert cells[(w1, 0)].n_active == 2 and cells[(w1, 0)].retention == 1.0
    assert cells[(w1, 2)].n_active == 1
    assert cells[(w1, 2)].cohort_size == 2
    assert cells[(w1, 2)].retention == 0.5
    assert cells[(w2, 0)].n_active == 1
    assert cells[(w2, 1)].n_active == 1
    assert (w1, 1) not in cells  # no activity -> no row (sparse grid)


def test_salted_join_matches_plain_join(spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    plain = o.join(c, "o_custkey").orderBy("o_orderkey")
    salted = salted_join(o, c, on="o_custkey", n_salt=8).orderBy("o_orderkey")
    assert salted.columns == plain.columns
    assert salted.collect() == plain.collect()


def test_salted_join_left_keeps_unmatched(spark):
    big = spark.createDataFrame([(1, "a"), (2, "b"), (99, "z")], "k int, v string")
    small = spark.createDataFrame([(1, "x"), (2, "y")], "k int, w string")
    out = salted_join(big, small, on="k", how="left").orderBy("k").collect()
    assert len(out) == 3
    assert out[2].k == 99 and out[2].w is None
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(big, small, on="k", how="full")


def test_salted_join_plan_joins_on_salt(spark):
    big = spark.createDataFrame([(1, "a")], "k int, v string")
    small = spark.createDataFrame([(1, "x")], "k int, w string")
    out = salted_join(big, small, on="k", n_salt=4)
    plan = out._jdf.queryExecution().analyzed().toString()
    assert "__salt" in plan  # join condition carries the salt key
    # the exploded small side fans out n_salt ways
    assert salted_join(big, small.limit(1), on="k", n_salt=4).count() == 1
    exploded = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(3)))
    )
    assert exploded.count() == 4


def test_compaction_plan_bins_and_oversize(spark):
    rows = [
        ("p1", "f1", 60), ("p1", "f2", 60), ("p1", "f3", 300), ("p1", "f4", 10),
        ("p2", "f1", 50),
    ]
    files = spark.createDataFrame(rows, "part string, path string, size_bytes long")
    out = compaction_plan(
        files, size_col="size_bytes", target_bytes=100,
        scope_cols=["part"], order_col="path",
    )
    got = {(r.part, r.path): (r.bin_id, r.bin_seq) for r in out.collect()}
    # f1 starts bin 0 (before=0); f2 before=60 -> bin 0; f3 before=120
    # -> bin 1 (oversize, occupies bins 1-3 worth of budget); f4
    # before=420 -> bin 4: the prefix-sum jump gives the big file its
    # own bin and never co-locates the next file with it
    assert got[("p1", "f1")] == (0, 1)
    assert got[("p1", "f2")] == (0, 2)
    assert got[("p1", "f3")] == (1, 1)
    assert got[("p1", "f4")] == (4, 1)
    assert got[("p2", "f1")] == (0, 1)  # scopes never share bins


def test_compaction_plan_requires_scope(spark):
    files = spark.createDataFrame([("f1", 10)], "path string, size_bytes long")
    with pytest.raises(ValueError, match="scope_cols"):
        compaction_plan(files, size_col="size_bytes", target_bytes=100)


def test_bloom_semi_join_matches_plain_join(spark, sf_dir):
    from flask_data_pipes_spark.operators.analytics import bloom_semi_join

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    od = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .filter("o_totalprice > 300000")
        .withColumnRenamed("o_orderkey", "l_orderkey")
    )
    plain = li.join(od, "l_orderkey").orderBy("l_orderkey", "l_partkey")
    bloomed = bloom_semi_join(li, od, on="l_orderkey").orderBy(
        "l_orderkey", "l_partkey"
    )
    assert bloomed.columns == plain.columns
    assert bloomed.collect() == plain.collect()
    # left_semi leg
    sp = li.join(od, "l_orderkey", "left_semi").count()
    sb = bloom_semi_join(li, od, on="l_orderkey", how="left_semi").count()
    assert sp == sb
    with pytest.raises(ValueError, match="inner/left_semi"):
        bloom_semi_join(li, od, on="l_orderkey", how="left")


def test_bloom_semi_join_null_keys_and_multicol(spark):
    from flask_data_pipes_spark.operators.analytics import bloom_semi_join

    fact = spark.createDataFrame(
        [(1, "x", 10), (2, "y", 20), (None, "x", 30), (2, None, 40)],
        "k int, s string, v int",
    )
    dim = spark.createDataFrame(
        [(1, "x", "a"), (2, None, "b")], "k int, s string, w string"
    )
    plain = fact.join(dim, ["k", "s"]).collect()
    got = bloom_semi_join(fact, dim, on=["k", "s"]).collect()
    # null keys never match in either path (SQL equi-join semantics)
    assert sorted(map(tuple, got)) == sorted(map(tuple, plain))


def test_bloom_semi_join_filter_precedes_join_shuffle(spark, sf_dir):
    """The probe must be a plain Filter over the fact scan (fed by a
    1-row broadcast) — no explode, no aggregation, no fact-side
    exchange before the filter."""
    from flask_data_pipes_spark.operators.analytics import bloom_semi_join

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    od = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .filter("o_totalprice > 300000")
        .withColumnRenamed("o_orderkey", "l_orderkey")
    )
    plan = (
        bloom_semi_join(li, od, on="l_orderkey")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    # exactly ONE Generate — the dim-side bitmap build explodes the
    # dim's probe positions; the fact side must never explode (its
    # probe is k map lookups inside one codegen filter)
    assert plan.count("Generate explode") == 1, "fact-side explode crept in"
    assert "__bsj_map" in plan  # the broadcast bitmap feeds the filter
    # the 1-row bitmap reaches the fact as a broadcast nested loop,
    # not a cartesian product
    assert "BroadcastNestedLoopJoin" in plan


def test_robust_outliers_masks_nothing_and_single_shuffle(spark):
    """A giant anomaly inflates stddev enough to hide a second outlier
    from the z-score; the MAD gauge flags both. Plan: one Exchange."""
    from flask_data_pipes_spark.operators.expectations import robust_outliers

    rows = (
        [(i, "u1", 10.0 + (i % 3) * 0.1) for i in range(20)]
        + [(100, "u1", 10_000.0), (101, "u1", 50.0)]
    )
    df = spark.createDataFrame(rows, "event_id long, user_id string, value double")
    flagged = robust_outliers(df, "value", by="user_id")
    # read the plan BEFORE executing (post-collect, AQE's finalized
    # tree repeats the exchange in the string)
    plan = flagged._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning(user_id") == 1
    ids = {r.event_id for r in flagged.collect()}
    assert {100, 101} <= ids  # both anomalies flagged
    assert not (ids & set(range(20)))  # no normal row flagged
    # mean/stddev z-score at the same data: the 10k point drags the
    # stddev so far that 50.0 scores under 2.5 sigma — masked
    import statistics

    vals = [v for _, _, v in rows]
    mu, sd = statistics.mean(vals), statistics.stdev(vals)
    assert abs((50.0 - mu) / sd) < 2.5


def test_robust_outliers_zero_mad_group_skipped(spark):
    from flask_data_pipes_spark.operators.expectations import robust_outliers

    df = spark.createDataFrame(
        [(1, "u", 5.0), (2, "u", 5.0), (3, "u", 5.0), (4, "u", 9.0)],
        "event_id long, user_id string, value double",
    )
    # median 5, over half the rows equal -> MAD 0 -> group skipped
    assert robust_outliers(df, "value", by="user_id").count() == 0


def test_ohlc_bars_hand_fixture_and_partial_agg(spark):
    from flask_data_pipes_spark.operators.analytics import ohlc_bars

    rows = [
        ("A", _ts(1, 9, 5), 10.0), ("A", _ts(1, 9, 20), 30.0),
        ("A", _ts(1, 9, 40), 5.0), ("A", _ts(1, 10, 1), 7.0),
        ("B", _ts(1, 9, 30), 100.0),
    ]
    df = spark.createDataFrame(rows, "sym string, ts timestamp, value double")
    out = ohlc_bars(df, ts_col="ts", price_col="value", by="sym", unit="hour")
    plan = out._jdf.queryExecution().executedPlan().toString()
    # ordinary partial-aggregable groupBy: map-side HashAggregate
    # before the exchange, no Window/Sort-within-group
    assert "Window" not in plan
    bars = {(r.sym, r.bar_start.hour): r for r in out.collect()}
    a9 = bars[("A", 9)]
    assert (a9.open, a9.high, a9.low, a9.close, a9.n_events) == (
        10.0, 30.0, 5.0, 5.0, 3,
    )
    assert bars[("A", 10)].open == bars[("A", 10)].close == 7.0
    assert bars[("B", 9)].n_events == 1


def test_correlation_matrix_known_values(spark):
    from flask_data_pipes_spark.operators.expectations import (
        correlation_matrix,
    )

    rows = [(float(i), 2.0 * i + 1.0, -3.0 * i, 7.0) for i in range(50)]
    df = spark.createDataFrame(rows, "x double, y double, z double, c double")
    out = {
        (r.col_a, r.col_b): r.corr
        for r in correlation_matrix(df, ["x", "y", "z", "c"]).collect()
    }
    assert out[("x", "y")] == 1.0    # perfect positive
    assert out[("x", "z")] == -1.0   # perfect negative
    assert out[("x", "c")] is None   # zero-variance column -> NULL
    assert out[("y", "z")] == -1.0
    with pytest.raises(ValueError, match=">= 2"):
        correlation_matrix(df, ["x"])


def test_correlation_matrix_matches_numpy(spark, sf_dir):
    import numpy as np

    from flask_data_pipes_spark.operators.expectations import (
        correlation_matrix,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    got = {
        (r.col_a, r.col_b): r.corr
        for r in correlation_matrix(
            li, ["l_quantity", "l_extendedprice", "l_discount"]
        ).collect()
    }
    pdf = li.select("l_quantity", "l_extendedprice", "l_discount").toPandas()
    m = np.corrcoef(pdf.values.T)
    names = ["l_quantity", "l_extendedprice", "l_discount"]
    for i in range(3):
        for j in range(i + 1, 3):
            key = (names[i], names[j])
            assert abs(got[key] - m[i, j]) < 1e-6, (key, got[key], m[i, j])


def test_correlation_matrix_single_pass_plan(spark, sf_dir):
    """One scan into a 1-row aggregate: no hash-partitioned exchange
    anywhere (the only exchange is the SinglePartition final-aggregate
    merge), and the unpivot to pair rows runs on that single row."""
    from flask_data_pipes_spark.operators.expectations import (
        correlation_matrix,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    out = correlation_matrix(li, ["l_quantity", "l_extendedprice", "l_discount"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan
    assert plan.count("Scan parquet") == 1


# --- round-10: deterministic regression pins for the round-9 fixes ----------


def test_funnel_equal_ts_tie_counts(spark):
    """Deterministic pin of the round-9 tie fix (analytics.py step_rank
    tiebreaker): a step-k event at EXACTLY the ts of the user's earliest
    qualifying step-(k-1) event counts (pure `>=`). The event_ids are
    chosen so that WITHOUT the step-index tiebreaker the order_col would
    sort the later step first (run_prev still null -> the step would be
    lost), making this test red on a revert.
    """
    T = _ts(1)
    rows = [
        # u1: the ADVICE repro — 'b' and 'a' at the identical ts, with
        # 'b' carrying the LOWER event_id. n_b must still be 1.
        (1, "u1", "b", T), (2, "u1", "a", T),
        # u2: 3-step same-ts chain, event_ids reversed (c, b, a).
        (3, "u2", "c", T), (4, "u2", "b", T), (5, "u2", "a", T),
        # u3: control — 'b' strictly BEFORE 'a' must NOT count for b.
        (6, "u3", "b", _ts(1)), (7, "u3", "a", _ts(2)),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id string, event_type string, ts timestamp"
    )
    out = {
        r.step: r.n_users
        for r in funnel(
            df, ["a", "b", "c"], user_col="user_id", order_col="event_id"
        ).collect()
    }
    assert out == {"a": 3, "b": 2, "c": 1}
    # and without order_col the tiebreaker alone must settle the ties
    out2 = {
        r.step: r.n_users
        for r in funnel(df, ["a", "b", "c"], user_col="user_id").collect()
    }
    assert out2 == {"a": 3, "b": 2, "c": 1}


def test_funnel_tie_dense_corpus_matches_sequential_model(spark):
    """Seeded tie-dense corpus (many users, ts drawn from only 3
    distinct values, shuffled event_ids) vs the same pure-Python
    sequential `>=` model the property test and the DuckDB oracle
    compute — deterministic, so a tiebreaker revert fails every run."""
    import random

    rng = random.Random(1009)
    events = []
    for i in range(400):
        events.append(
            (i, f"u{rng.randrange(40)}", rng.choice(["a", "b", "c", "x"]),
             rng.choice([_ts(1), _ts(2), _ts(3)]))
        )
    df = spark.createDataFrame(
        events, "event_id long, user_id string, event_type string, ts timestamp"
    )
    got = {
        r.step: r.n_users
        for r in funnel(
            df, ["a", "b", "c"], user_col="user_id", order_col="event_id"
        ).collect()
    }
    per_user = {}
    for i, u, t, ts in events:
        per_user.setdefault(u, []).append((ts, i, t))
    want = {"a": 0, "b": 0, "c": 0}
    for evs in per_user.values():
        evs.sort(key=lambda e: (e[0], e[1]))
        t_prev = None
        for step in ["a", "b", "c"]:
            t_step = None
            for ts, _, t in evs:
                if t == step and (t_prev is None or ts >= t_prev):
                    t_step = ts
                    break
            if t_step is None:
                break
            want[step] += 1
            t_prev = t_step
    assert got == want


def test_reserved_column_guards(spark, funnel_events):
    """Inputs already carrying an operator's internal scratch-column
    names must error, not silently corrupt (round-8 ADVICE #4)."""
    from flask_data_pipes_spark.operators.analytics import bloom_semi_join

    with pytest.raises(ValueError, match="__run_0"):
        funnel(
            funnel_events.withColumn("__run_0", F.lit(1)),
            ["view", "click"], user_col="user_id",
        )
    with pytest.raises(ValueError, match="__cand_1"):
        funnel(
            funnel_events.withColumn("__cand_1", F.lit(1)),
            ["view", "click"], user_col="user_id",
        )
    big = spark.createDataFrame([(1, "a")], "k int, v string")
    small = spark.createDataFrame([(1, "d")], "k int, d string")
    with pytest.raises(ValueError, match="'big'.*__salt"):
        salted_join(big.withColumn("__salt", F.lit(0)), small, "k")
    with pytest.raises(ValueError, match="'small'.*__salt"):
        salted_join(big, small.withColumn("__salt", F.lit(0)), "k")
    with pytest.raises(ValueError, match="__bsj_map"):
        bloom_semi_join(big.withColumn("__bsj_map", F.lit(0)), small, "k")
