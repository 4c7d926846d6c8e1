"""Temporal-join catalog entries (Spark-native superset, SURVEY.md
§2.8): as-of join and bounded range join over the events table, each
oracle-checked against DuckDB (ASOF JOIN / inequality join).

Both Spark plans avoid the naive inequality-join shape: `q_asof_join`
is one shuffle per side + a partition-local sort (merge-join cost);
`q_range_join` is an equi-join on (user, time-bucket) whose candidate
count is linear in data + true matches. See operators/temporal.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scalars import epoch_us
from ..operators.temporal import asof_join, gapfill, range_join
from .catalog import load, register


@register(
    "q_asof_join",
    oracle="""
    WITH p AS (
        SELECT event_id, user_id, ts::TIMESTAMP AS ts
        FROM events WHERE event_type = 'purchase'
    ),
    v AS (
        SELECT event_id AS view_id, user_id, ts::TIMESTAMP AS view_ts,
               value AS view_value
        FROM events WHERE event_type = 'view'
    )
    SELECT p.event_id, p.user_id, p.ts, v.view_id, v.view_ts,
           epoch_us(p.ts) - epoch_us(v.view_ts) AS gap_us
    FROM p ASOF LEFT JOIN v
      ON p.user_id = v.user_id AND p.ts >= v.view_ts
    """,
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each purchase, the user's most recent view at-or-before the
    purchase (backward inclusive as-of), left-outer. Timestamps are
    microsecond-unique in the testdata, so the match is deterministic.

    Scale: union-tag + running window — one shuffle on user_id, no
    range fan-out (operators/temporal.py design notes).
    """
    e = load(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = e.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        "user_id",
        F.col("ts").alias("view_ts"),
        F.col("value").alias("view_value"),
    )
    out = asof_join(
        purchases, views, on="user_id", left_ts="ts", right_ts="view_ts"
    )
    gap = epoch_us(F.col("ts")) - epoch_us(F.col("view_ts"))
    return out.select(
        "event_id", "user_id", "ts", "view_id", "view_ts", gap.alias("gap_us")
    )


@register(
    "q_range_join",
    oracle="""
    WITH c AS (
        SELECT event_id AS click_id, user_id, ts::TIMESTAMP AS click_ts
        FROM events WHERE event_type = 'click'
    ),
    e AS (
        SELECT event_id AS error_id, user_id, ts::TIMESTAMP AS error_ts
        FROM events WHERE event_type = 'error'
    )
    SELECT c.click_id, e.error_id, c.user_id,
           epoch_us(e.error_ts) - epoch_us(c.click_ts) AS gap_us
    FROM c JOIN e
      ON c.user_id = e.user_id
     AND e.error_ts > c.click_ts
     AND epoch_us(e.error_ts) - epoch_us(c.click_ts) <= 300000000
    """,
)
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every (click, error) pair by the same user where the error
    follows the click within 5 minutes — the event-correlation range
    join, bucketed so it plans as an equi-join (no inequality-join
    cartesian blow-up).
    """
    e = load(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("click_ts"),
    )
    errors = e.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        "user_id",
        F.col("ts").alias("error_ts"),
    )
    out = range_join(
        clicks,
        errors,
        on="user_id",
        left_ts="click_ts",
        right_ts="error_ts",
        min_delta=0.0,
        max_delta=300.0,
    )
    gap = epoch_us(F.col("error_ts")) - epoch_us(F.col("click_ts"))
    return out.select("click_id", "error_id", "user_id", gap.alias("gap_us"))


@register(
    "q_window_rolling",
    oracle="""
    SELECT event_id, user_id, ts::TIMESTAMP AS ts, value,
           lag(value) OVER w AS prev_value,
           lead(value) OVER w AS next_value,
           CAST(SUM(CAST(value AS DECIMAL(38,6)))
                OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS roll3_sum,
           COUNT(*) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS cum_events
    FROM events
    WHERE event_type = 'purchase'
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q_window_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-ordered analytics windows: lag/lead neighbors, a
    3-row rolling sum, and a cumulative event counter — the standard
    sliding-window feature-engineering shapes.

    The rolling sum goes through DECIMAL(38,6) so the frame sum is
    exact (engines may order float additions differently); the final
    value is cast back to double.

    Scale: a single shuffle on user_id, then partition-local sorts;
    no global ordering anywhere. All four outputs share ONE window
    definition, so Spark plans one Window operator (one sort), not
    four."""
    from pyspark.sql import Window

    e = load(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w3 = w.rowsBetween(-2, Window.currentRow)
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return e.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.sum(F.col("value").cast("decimal(38,6)")).over(w3)
        .cast("double")
        .alias("roll3_sum"),
        F.count(F.lit(1)).over(wcum).alias("cum_events"),
    )


@register(
    "q_gapfill_events",
    oracle="""
    WITH g AS (
      SELECT event_type,
             (epoch_us(ts::TIMESTAMP) // 600000000) * 600000000 AS bus,
             COUNT(*) AS n_events,
             CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value,
             CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*)
               AS avg_value
      FROM events GROUP BY 1, 2
    ),
    grid AS (
      SELECT event_type,
             unnest(generate_series(MIN(bus), MAX(bus), 600000000)) AS bus
      FROM g GROUP BY event_type
    ),
    j AS (
      SELECT grid.event_type, grid.bus,
             COALESCE(g.n_events, 0) AS n_events,
             COALESCE(g.sum_value, 0.0) AS sum_value,
             last_value(g.avg_value IGNORE NULLS) OVER (
               PARTITION BY grid.event_type ORDER BY grid.bus
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS avg_value,
             g.n_events IS NULL AS gap_filled
      FROM grid LEFT JOIN g USING (event_type, bus)
    )
    SELECT event_type, make_timestamp(bus) AS ts, n_events, sum_value,
           avg_value, gap_filled
    FROM j
    """,
)
def q_gapfill_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable rollup with gap-fill: 10-minute buckets per
    event_type on a DENSE grid — buckets with no events appear with
    n_events=0, sum_value=0, and the bucket average carried forward
    (LOCF), flagged `gap_filled`. The `time_bucket_gapfill` + `locf`
    shape dashboards need; a plain groupBy(window(...)) silently
    drops empty buckets.

    Exactness: sums go through DECIMAL(38,6) so both engines add
    exactly; avg is the exact decimal sum divided as double.

    Scale: raw rows aggregate FIRST (map-side combine, one shuffle on
    (type, bucket)); the grid is sequence+explode from the post-agg
    extents, so its size is time-range/step per type — independent of
    row count. LOCF windows over the grid, never raw rows
    (operators/temporal.py:180)."""
    e = load(spark, sf_dir, "events")
    dec_sum = F.sum(F.col("value").cast("decimal(38,6)")).cast("double")
    return gapfill(
        e,
        ts="ts",
        by="event_type",
        step=600.0,
        aggs={
            "n_events": F.count(F.lit(1)),
            "sum_value": dec_sum,
            "avg_value": dec_sum / F.count(F.lit(1)),
        },
        fill={
            "n_events": "zero",
            "sum_value": "zero",
            "avg_value": "locf",
        },
    ).select(
        "event_type", "ts", "n_events", "sum_value", "avg_value", "gap_filled"
    )


@register(
    "q_scd2_events",
    oracle="""
    WITH s AS (
      SELECT user_id, event_type, ts::TIMESTAMP AS ts, event_id,
             LAG(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
      FROM events
    ),
    chg AS (
      SELECT user_id, event_type, ts, event_id FROM s
      WHERE prev_type IS DISTINCT FROM event_type
    )
    SELECT user_id, event_type,
           ts AS valid_from,
           LEAD(ts) OVER (
             PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
           LEAD(ts) OVER (
             PARTITION BY user_id ORDER BY ts, event_id) IS NULL
             AS is_current,
           CAST(ROW_NUMBER() OVER (
             PARTITION BY user_id ORDER BY ts, event_id) AS INT) AS version
    FROM chg
    """,
)
def q_scd2_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 dimension history (operators/temporal.py::scd2_build):
    each user's event_type stream collapsed to versioned validity
    intervals — consecutive identical states merge, each retained
    version carries [valid_from, valid_to) with NULL valid_to / 
    is_current on the open version. The keep-history LOAD sibling of
    the reference's W4 batched type-1 upsert (SURVEY §2.5).

    Scale: one shuffle on user_id; the change-collapse lag and the
    interval-cut lead run partition-local over the same sort (single
    Window block, plan-asserted via the generic exchange budget)."""
    from ..operators.temporal import scd2_build

    e = load(spark, sf_dir, "events")
    return scd2_build(
        e,
        key_cols="user_id",
        ts_col="ts",
        attr_cols=["event_type"],
        order_cols=["event_id"],
    )


@register(
    "q_snapshot_diff",
    oracle="""
    WITH o AS (
      SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 13 <> 0
    ),
    n AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 10.0
                  ELSE o_totalprice END AS o_totalprice
      FROM orders WHERE o_orderkey % 17 <> 0
    ),
    d AS (
      SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
             CASE WHEN o.o_orderkey IS NULL THEN 'insert'
                  WHEN n.o_orderkey IS NULL THEN 'delete'
                  WHEN o.o_totalprice IS DISTINCT FROM n.o_totalprice
                    THEN 'update'
                  ELSE 'unchanged' END AS change_type,
             o.o_totalprice AS old_o_totalprice,
             n.o_totalprice AS new_o_totalprice
      FROM o FULL OUTER JOIN n ON o.o_orderkey = n.o_orderkey
    )
    SELECT * FROM d WHERE change_type <> 'unchanged'
    """,
)
def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed snapshot changeset (operators/temporal.py::snapshot_diff):
    two deterministic snapshots of `orders` — 'old' drops keys
    divisible by 13, 'new' drops keys divisible by 17 and bumps
    totalprice by 10.0 on keys divisible by 5 — diffed into the
    insert/delete/update rows that a CDC apply or `scd2_build` would
    consume. The diff-two-full-loads primitive that turns the
    reference's full-reload pipelines into incremental ones.

    Scale: ONE shuffle — a full-outer sort-merge join on the key; the
    null-safe struct compare and the change tag are row-local, and
    unchanged keys are dropped before anything downstream runs. With
    both snapshots written bucketed on the key the join goes
    exchange-free (test_plans asserts the bucketed-join shape)."""
    from ..operators.temporal import snapshot_diff

    o = load(spark, sf_dir, "orders")
    key = F.col("o_orderkey")
    old = o.where(key % 13 != 0).select("o_orderkey", "o_totalprice")
    new = o.where(key % 17 != 0).select(
        "o_orderkey",
        F.when(key % 5 == 0, F.col("o_totalprice") + 10.0)
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
    )
    return snapshot_diff(old, new, "o_orderkey", ["o_totalprice"])


@register(
    "q_asof_join_forward",
    oracle="""
    WITH p AS (
        SELECT event_id, user_id, ts::TIMESTAMP AS ts
        FROM events WHERE event_type = 'purchase'
    ),
    v AS (
        SELECT event_id AS view_id, user_id, ts::TIMESTAMP AS view_ts,
               value AS view_value
        FROM events WHERE event_type = 'view'
    )
    SELECT p.event_id, p.user_id, p.ts, v.view_id, v.view_ts,
           epoch_us(v.view_ts) - epoch_us(p.ts) AS gap_us
    FROM p ASOF LEFT JOIN v
      ON p.user_id = v.user_id AND p.ts <= v.view_ts
    """,
)
def q_asof_join_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of: for each purchase, the user's next view at-or-
    after it (the post-purchase-behavior question; DuckDB `ASOF ... ON
    p.ts <= v.view_ts` is the oracle). Completes pandas-merge_asof
    direction parity alongside q_asof_join's backward leg; `nearest`
    is property-tested against pandas directly.

    Scale: identical shape to the backward leg — union-tag + one
    running window over a (ts DESC, side) sort, one shuffle per side,
    no range fan-out.
    """
    e = load(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = e.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        "user_id",
        F.col("ts").alias("view_ts"),
        F.col("value").alias("view_value"),
    )
    out = asof_join(
        purchases,
        views,
        on="user_id",
        left_ts="ts",
        right_ts="view_ts",
        direction="forward",
    )
    gap = epoch_us(F.col("view_ts")) - epoch_us(F.col("ts"))
    return out.select(
        "event_id", "user_id", "ts", "view_id", "view_ts", gap.alias("gap_us")
    )
