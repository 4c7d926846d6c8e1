"""Temporal join semantics (operators/temporal.py): backward-inclusive
as-of matching, tolerance, left-outer nulls, range-join boundary
inclusivity and pair uniqueness — plus plan-shape guards (no cartesian
or inequality join; as-of is one shuffle per side)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from flask_data_pipes_spark.operators.temporal import asof_join, range_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def sides(spark):
    left = spark.createDataFrame(
        [
            (1, "k1", _ts("2024-01-01T00:10:00")),
            (2, "k1", _ts("2024-01-01T00:20:00")),
            (3, "k2", _ts("2024-01-01T00:05:00")),  # before any right row
            (4, "k3", _ts("2024-01-01T01:00:00")),  # key absent on right
            (5, "k1", _ts("2024-01-01T00:15:00")),  # exact-tie with right
        ],
        "id long, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("k1", _ts("2024-01-01T00:09:00"), 10.0),
            ("k1", _ts("2024-01-01T00:15:00"), 20.0),
            ("k2", _ts("2024-01-01T00:30:00"), 30.0),
        ],
        "k string, rts timestamp, payload double",
    )
    return left, right


def test_asof_backward_inclusive(spark, sides):
    left, right = sides
    out = asof_join(left, right, on="k", left_ts="ts", right_ts="rts")
    got = {r["id"]: (r["rts"], r["payload"]) for r in out.collect()}
    assert got[1] == (_ts("2024-01-01T00:09:00"), 10.0)  # latest earlier
    assert got[2] == (_ts("2024-01-01T00:15:00"), 20.0)
    assert got[5] == (_ts("2024-01-01T00:15:00"), 20.0)  # tie is inclusive
    assert got[3] == (None, None)  # nothing at-or-before → left-outer null
    assert got[4] == (None, None)  # unseen key
    assert out.count() == left.count()  # never drops or duplicates rows


def test_asof_tolerance_nulls_stale_matches(spark, sides):
    left, right = sides
    out = asof_join(
        left, right, on="k", left_ts="ts", right_ts="rts", tolerance=60.0
    )
    got = {r["id"]: r["payload"] for r in out.collect()}
    assert got[1] == 10.0  # 60s-old match survives (inclusive)
    assert got[2] is None  # 5min-old match nulled
    assert got[5] == 20.0  # 0s-old match survives


def test_asof_same_ts_column_name(spark, sides):
    left, right = sides
    r2 = right.withColumnRenamed("rts", "ts")
    out = asof_join(left, r2, on="k", left_ts="ts")
    assert "ts_right" in out.columns
    got = {r["id"]: r["ts_right"] for r in out.collect()}
    assert got[1] == _ts("2024-01-01T00:09:00")


def test_asof_plan_one_shuffle_no_cartesian(spark, sides):
    left, right = sides
    df = asof_join(left, right, on="k", left_ts="ts", right_ts="rts")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # union + one hash-partitioning exchange for the window sort
    assert plan.count("Exchange") <= 2


def test_range_join_boundaries_and_uniqueness(spark):
    left = spark.createDataFrame(
        [(1, "k", _ts("2024-01-01T00:00:00"))],
        "lid long, k string, lts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, "k", _ts("2024-01-01T00:00:00")),  # delta=0 → excluded (>)
            (11, "k", _ts("2024-01-01T00:00:00.000001")),  # just inside
            (12, "k", _ts("2024-01-01T00:05:00")),  # delta=max → included (<=)
            (13, "k", _ts("2024-01-01T00:05:00.000001")),  # just outside
            (14, "k", _ts("2023-12-31T23:59:59")),  # before left
            (15, "x", _ts("2024-01-01T00:01:00")),  # other key
        ],
        "rid long, k string, rts timestamp",
    )
    out = range_join(
        left, right, on="k", left_ts="lts", right_ts="rts",
        min_delta=0.0, max_delta=300.0,
    )
    rids = sorted(r["rid"] for r in out.collect())
    assert rids == [11, 12]
    # narrower bucket width than the span: same result, still unique
    out2 = range_join(
        left, right, on="k", left_ts="lts", right_ts="rts",
        min_delta=0.0, max_delta=300.0, bucket_width=60.0,
    )
    assert sorted(r["rid"] for r in out2.collect()) == [11, 12]


def test_range_join_min_delta_offset_window(spark):
    left = spark.createDataFrame(
        [(1, "k", _ts("2024-01-01T00:00:00"))],
        "lid long, k string, lts timestamp",
    )
    right = spark.createDataFrame(
        [(i, "k", _ts("2024-01-01T00:00:00") + dt.timedelta(seconds=30 * i))
         for i in range(10)],
        "rid long, k string, rts timestamp",
    )
    # window (60s, 120s]: rids at 90s and 120s
    out = range_join(
        left, right, on="k", left_ts="lts", right_ts="rts",
        min_delta=60.0, max_delta=120.0,
    )
    assert sorted(r["rid"] for r in out.collect()) == [3, 4]


def test_range_join_plans_equi_join(spark):
    left = spark.createDataFrame(
        [(1, "k", _ts("2024-01-01T00:00:00"))],
        "lid long, k string, lts timestamp",
    )
    right = spark.createDataFrame(
        [(10, "k", _ts("2024-01-01T00:01:00"))],
        "rid long, k string, rts timestamp",
    )
    df = range_join(left, right, on="k", left_ts="lts", right_ts="rts")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
