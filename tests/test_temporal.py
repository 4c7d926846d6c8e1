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


# --- gapfill (time_bucket_gapfill + locf shape) -----------------------------

from flask_data_pipes_spark.operators.temporal import gapfill  # noqa: E402


@pytest.fixture(scope="module")
def sparse_events(spark):
    # k1: buckets 0, 3 occupied (gap at 1, 2); k2: bucket 1 only.
    return spark.createDataFrame(
        [
            ("k1", _ts("2024-01-01T00:00:30"), 10.0),
            ("k1", _ts("2024-01-01T00:00:45"), 20.0),
            ("k1", _ts("2024-01-01T00:03:10"), 40.0),
            ("k2", _ts("2024-01-01T00:01:15"), 7.0),
        ],
        "k string, ts timestamp, v double",
    )


def test_gapfill_dense_grid_zero_and_locf(spark, sparse_events):
    out = gapfill(
        sparse_events,
        ts="ts",
        by="k",
        step=60.0,
        aggs={"n": F.count(F.lit(1)), "s": F.sum("v")},
        fill={"n": "zero", "s": "locf"},
    )
    rows = {(r["k"], r["ts"].minute): r for r in out.collect()}
    # k1 grid is minutes 0..3 dense; k2 is the single minute 1.
    assert {(k, m) for (k, m) in rows} == {
        ("k1", 0), ("k1", 1), ("k1", 2), ("k1", 3), ("k2", 1)
    }
    assert rows[("k1", 0)]["n"] == 2 and rows[("k1", 0)]["s"] == 30.0
    assert not rows[("k1", 0)]["gap_filled"]
    # synthesized buckets: count zero-filled, sum carried forward
    for m in (1, 2):
        r = rows[("k1", m)]
        assert r["gap_filled"] and r["n"] == 0 and r["s"] == 30.0
    assert rows[("k1", 3)]["s"] == 40.0 and rows[("k1", 3)]["n"] == 1
    assert rows[("k2", 1)]["n"] == 1 and not rows[("k2", 1)]["gap_filled"]


def test_gapfill_bounds_and_const_and_global(spark, sparse_events):
    out = gapfill(
        sparse_events,
        ts="ts",
        by=None,
        step=60.0,
        aggs={"n": F.count(F.lit(1))},
        fill={"n": ("const", -1)},
        bounds=("2024-01-01T00:00:00", "2024-01-01T00:05:00"),
    ).collect()
    by_min = {r["ts"].minute: r for r in out}
    assert set(by_min) == {0, 1, 2, 3, 4, 5}  # bounds-driven, not extents
    assert by_min[0]["n"] == 2 and by_min[1]["n"] == 1 and by_min[3]["n"] == 1
    assert by_min[2]["n"] == -1 and by_min[2]["gap_filled"]
    assert by_min[4]["n"] == -1 and by_min[5]["n"] == -1


def test_gapfill_validation(spark, sparse_events):
    with pytest.raises(ValueError, match="unknown outputs"):
        gapfill(sparse_events, by="k", aggs={"n": F.count(F.lit(1))},
                fill={"nope": "zero"})
    with pytest.raises(ValueError, match="step"):
        gapfill(sparse_events, by="k", step=0.0)
    with pytest.raises(ValueError, match="fill policy"):
        gapfill(sparse_events, by="k", aggs={"n": F.count(F.lit(1))},
                fill={"n": "bogus"})


def test_gapfill_plan_no_cartesian(spark, sparse_events):
    plan = gapfill(
        sparse_events, by="k", step=60.0,
        aggs={"n": F.count(F.lit(1))}, fill={"n": "zero"},
    )._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan


def test_scd2_build_collapse_and_intervals(spark):
    import datetime as dt

    t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)
    rows = [
        # user 1: A, A (no-change, collapses), B, B, A -> versions A,B,A
        (1, t(0), "A"), (1, t(1), "A"), (1, t(2), "B"),
        (1, t(3), "B"), (1, t(4), "A"),
        # user 2: single state -> one open version
        (2, t(0), "X"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, st string")
    from flask_data_pipes_spark.operators.temporal import scd2_build

    out = scd2_build(df, "user_id", "ts", ["st"]).collect()
    u1 = sorted((r for r in out if r["user_id"] == 1), key=lambda r: r["version"])
    assert [r["st"] for r in u1] == ["A", "B", "A"]
    assert [r["valid_from"].second for r in u1] == [0, 2, 4]
    # valid_to chains to the NEXT version's valid_from
    assert [r["valid_to"].second if r["valid_to"] else None for r in u1] == [2, 4, None]
    assert [r["is_current"] for r in u1] == [False, False, True]
    u2 = [r for r in out if r["user_id"] == 2]
    assert len(u2) == 1 and u2[0]["is_current"] and u2[0]["version"] == 1


def test_scd2_build_null_attrs_and_no_collapse(spark):
    import datetime as dt

    t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)
    rows = [(1, t(0), None), (1, t(1), None), (1, t(2), "A")]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, st string")
    from flask_data_pipes_spark.operators.temporal import scd2_build

    # null state versions correctly: first null kept, second collapses
    # (null-safe equality), then the real value opens version 2
    out = sorted(
        scd2_build(df, "user_id", "ts", ["st"]).collect(),
        key=lambda r: r["version"],
    )
    assert [r["st"] for r in out] == [None, "A"]
    # collapse_unchanged=False keeps every observation
    out2 = scd2_build(
        df, "user_id", "ts", ["st"], collapse_unchanged=False
    ).collect()
    assert len(out2) == 3


def test_snapshot_diff_change_kinds_and_null_safety(spark):
    from flask_data_pipes_spark.operators.temporal import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", None), (3, "c", 30.0), (4, None, 40.0)],
        "k long, s string, v double",
    )
    new = spark.createDataFrame(
        [(2, "b", None), (3, "C", 30.0), (4, None, 41.0), (5, "e", 50.0)],
        "k long, s string, v double",
    )
    out = {r["k"]: r for r in snapshot_diff(old, new, "k").collect()}
    # 1 deleted, 5 inserted; 2 unchanged (NULL == NULL null-safely)
    assert out[1]["change_type"] == "delete" and out[1]["new_s"] is None
    assert out[5]["change_type"] == "insert" and out[5]["old_v"] is None
    assert 2 not in out
    # 3 updated on the string attr, 4 on the value (NULL-keyed attr ok)
    assert out[3]["change_type"] == "update" and out[3]["new_s"] == "C"
    assert out[4]["change_type"] == "update" and out[4]["new_v"] == 41.0
    assert set(out) == {1, 3, 4, 5}

    kept = snapshot_diff(old, new, "k", keep_unchanged=True).collect()
    assert {r["k"]: r["change_type"] for r in kept}[2] == "unchanged"
    assert len(kept) == 5


def test_snapshot_diff_validation(spark):
    from flask_data_pipes_spark.operators.temporal import snapshot_diff

    df = spark.createDataFrame([(1, 2)], "k long, v long")
    with pytest.raises(ValueError, match="lacks"):
        snapshot_diff(df, df.select("k"), "k", ["v"])
    with pytest.raises(ValueError, match="no compare columns"):
        snapshot_diff(df.select("k"), df.select("k"), "k")


def test_snapshot_diff_reserved_column_guard(spark):
    from flask_data_pipes_spark.operators.temporal import snapshot_diff
    from pyspark.sql import functions as F

    old = spark.createDataFrame([(1, "a")], "k int, v string")
    new = spark.createDataFrame([(1, "b")], "k int, v string")
    import pytest as _pt

    with _pt.raises(ValueError, match="'old'.*__sd_in_old"):
        snapshot_diff(old.withColumn("__sd_in_old", F.lit(True)), new, "k")
    with _pt.raises(ValueError, match="'new'.*__sd_in_new"):
        snapshot_diff(old, new.withColumn("__sd_in_new", F.lit(True)), "k")


def test_temporal_reserved_column_guards(spark):
    from pyspark.sql import functions as F
    from flask_data_pipes_spark.operators.temporal import (
        asof_join,
        gapfill,
        range_join,
    )
    import pytest as _pt

    l = spark.createDataFrame(
        [(1, __import__("datetime").datetime(2024, 1, 1))], "k int, ts timestamp"
    )
    r = spark.createDataFrame(
        [(1, __import__("datetime").datetime(2024, 1, 1), 2.0)],
        "k int, ts timestamp, v double",
    )
    with _pt.raises(ValueError, match="'left'.*__asof_side"):
        asof_join(l.withColumn("__asof_side", F.lit(9)), r, "k")
    with _pt.raises(ValueError, match="'right'.*__asof_payload"):
        asof_join(l, r.withColumn("__asof_payload", F.lit(9)), "k")
    with _pt.raises(ValueError, match="__rj_bucket"):
        range_join(l.withColumn("__rj_bucket", F.lit(9)), r, "k")
    with _pt.raises(ValueError, match="__gf_bucket_us"):
        gapfill(
            r.withColumn("__gf_bucket_us", F.lit(9)),
            ts="ts", step=60.0, aggs={"v": F.avg("v")}, by="k",
        )
    from flask_data_pipes_spark.operators.temporal import scd2_build

    with _pt.raises(ValueError, match="scd2_build.*__scd_chg"):
        scd2_build(
            r.withColumn("__scd_chg", F.lit(True)),
            key_cols="k", ts_col="ts", attr_cols=["v"],
        )
