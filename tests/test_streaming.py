"""Structured Streaming tests: file-source stream → watermarked rollup
and applyInPandasWithState sessionization, validated against their
batch twins on the same data (availableNow trigger drains the source
deterministically)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from flask_data_pipes_spark.streaming.stream import (
    EVENTS_SCHEMA,
    hourly_rollup,
    read_jsonl_stream,
    sessionize_batch,
    sessionize_stream,
)


@pytest.fixture(scope="module")
def landing(spark, tmp_path_factory):
    """Write sf0.001 events as JSONL into a landing dir (streaming
    sources need schemas + directories, not parquet snapshots)."""
    from flask_data_pipes_spark.plans.catalog import load

    tmp = tmp_path_factory.mktemp("stream")
    path = str(tmp / "events")
    e = load(spark, os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001"), "events")
    e.coalesce(2).write.mode("overwrite").option(
        "timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"
    ).json(path)
    return path


def _drain(stream_df, tmp_dir: str, name: str):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", os.path.join(tmp_dir, f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_hourly_rollup_stream_matches_batch(spark, landing, tmp_path):
    events = read_jsonl_stream(spark, landing, EVENTS_SCHEMA)
    rollup = hourly_rollup(events, watermark="100 days")  # nothing late in replay

    q = (
        rollup.writeStream.format("memory")
        .queryName("rollup_out")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt_rollup"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (str(r["hour"]), r["event_type"]): r["n_events"]
        for r in spark.sql("select * from rollup_out").collect()
    }

    batch = (
        spark.read.schema(EVENTS_SCHEMA).json(landing)
        .groupBy(F.date_trunc("hour", "ts").alias("hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    want = {
        (str(r["hour"]), r["event_type"]): r["n_events"] for r in batch.collect()
    }
    assert got == want


def test_sessionize_stream_closes_sessions(spark, landing, tmp_path):
    events = read_jsonl_stream(spark, landing, EVENTS_SCHEMA)
    sessions = sessionize_stream(events, gap_seconds=1800, watermark="100 days")
    _drain(sessions, str(tmp_path), "sessions_out")
    got = spark.sql("select * from sessions_out").collect()

    batch = sessionize_batch(
        spark.read.schema(EVENTS_SCHEMA).json(landing), gap_seconds=1800
    ).collect()

    # The replay closes every session whose gap elapsed within the data;
    # the final (open) session per user emits only on timeout — so the
    # streamed set must be a subset of batch sessions, and must cover
    # every CLOSED batch session (all but the last per user).
    got_keys = {(r["user_id"], str(r["session_start"])) for r in got}
    by_user_last = {}
    for r in batch:
        key = (r["user_id"], str(r["session_start"]))
        if (
            r["user_id"] not in by_user_last
            or str(r["session_start"]) > by_user_last[r["user_id"]]
        ):
            by_user_last[r["user_id"]] = str(r["session_start"])
    closed = {
        (r["user_id"], str(r["session_start"]))
        for r in batch
        if str(r["session_start"]) != by_user_last[r["user_id"]]
    }
    batch_keys = {(r["user_id"], str(r["session_start"])) for r in batch}
    assert got_keys <= batch_keys
    assert closed <= got_keys
    # aggregates agree for the sessions that did emit
    batch_by_key = {
        (r["user_id"], str(r["session_start"])): (r["n_events"], r["total_value"])
        for r in batch
    }
    for r in got:
        key = (r["user_id"], str(r["session_start"]))
        n, total = batch_by_key[key]
        assert r["n_events"] == n
        assert abs(r["total_value"] - total) < 1e-6
