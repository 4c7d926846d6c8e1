"""Behavioral-analytics catalog entries (Spark-native superset,
SURVEY.md §2.8): ordered funnel, weekly cohort retention, skew-salted
join, and the storage compaction planner — each DuckDB-oracled.

The reference has no cross-record analytics (one-record-at-a-time ETL,
`/root/reference` SURVEY §2); these are the standard queries an event
pipeline serves downstream, built on operators/analytics.py whose
shapes are designed for the 100 TB case (see that module's header).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.analytics import (
    bloom_semi_join,
    ohlc_bars,
    cohort_retention,
    compaction_plan,
    funnel,
    salted_join,
)
from .catalog import load, register


@register(
    "q_funnel",
    oracle="""
    WITH t1 AS (
      SELECT user_id, min(ts::TIMESTAMP) AS t
      FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    t2 AS (
      SELECT e.user_id, min(e.ts::TIMESTAMP) AS t
      FROM events e JOIN t1 ON e.user_id = t1.user_id
      WHERE e.event_type = 'click' AND e.ts::TIMESTAMP >= t1.t
      GROUP BY e.user_id
    ),
    t3 AS (
      SELECT e.user_id, min(e.ts::TIMESTAMP) AS t
      FROM events e JOIN t2 ON e.user_id = t2.user_id
      WHERE e.event_type = 'purchase' AND e.ts::TIMESTAMP >= t2.t
      GROUP BY e.user_id
    )
    SELECT * FROM (
      SELECT 1 AS step_idx, 'view' AS step,
             (SELECT COUNT(*) FROM t1) AS n_users
      UNION ALL
      SELECT 2, 'click', (SELECT COUNT(*) FROM t2)
      UNION ALL
      SELECT 3, 'purchase', (SELECT COUNT(*) FROM t3)
    ) ORDER BY step_idx
    """,
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel view → click → purchase: users who
    viewed, then clicked at-or-after their first view, then purchased
    at-or-after their earliest qualifying click.

    Scale: the oracle's formulation is one self-join per step (K
    shuffles + fan-out); the Spark plan is chained running-min window
    expressions over ONE (user, ts) sort — see
    operators/analytics.py::funnel.
    """
    e = load(spark, sf_dir, "events")
    return funnel(
        e,
        ["view", "click", "purchase"],
        user_col="user_id",
        type_col="event_type",
        ts_col="ts",
        order_col="event_id",
    )


@register(
    "q_cohort_retention",
    oracle="""
    WITH f AS (
      SELECT user_id, date_trunc('week', min(ts::TIMESTAMP)) AS cw
      FROM events GROUP BY user_id
    ),
    t AS (
      SELECT e.user_id, f.cw::TIMESTAMP AS cohort_week,
             CAST(floor(date_diff('day', f.cw::DATE, e.ts::DATE) / 7.0)
                  AS INT) AS week_offset
      FROM events e JOIN f USING (user_id)
    ),
    grid AS (
      SELECT cohort_week, week_offset,
             COUNT(DISTINCT user_id) AS n_active
      FROM t GROUP BY cohort_week, week_offset
    )
    SELECT g.cohort_week, g.week_offset, g.n_active,
           s.n_active AS cohort_size,
           round(g.n_active / s.n_active, 6) AS retention
    FROM grid g
    JOIN (SELECT cohort_week, n_active FROM grid WHERE week_offset = 0) s
      USING (cohort_week)
    ORDER BY g.cohort_week, g.week_offset
    """,
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: cohort = Monday-truncated week of each
    user's first event; n_active distinct users per (cohort_week,
    week_offset) cell, plus cohort_size and the retention ratio.

    Scale: one shuffle on user_id for the first-event window; the grid
    key count is O(weeks²) regardless of data volume, and cohort sizes
    come from the grid's own offset-0 cells (no second event scan).
    """
    e = load(spark, sf_dir, "events")
    return cohort_retention(e, user_col="user_id", ts_col="ts")


@register(
    "q_salted_join",
    oracle="""
    SELECT c.c_mktsegment,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
             AS revenue
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per market segment through the SALTED join path: the
    fact side fans out over 16 deterministic salts, the dim side is
    exploded 16×, the equi-join runs on (custkey, salt). The oracle is
    the PLAIN join — asserting the salt is semantics-free.

    Scale: the structural answer to a hot FK (one giant customer, or a
    null-heavy key) that pins a reducer where AQE's skew split can't
    reach (cached inputs, non-SMJ plans). Cost: dim shuffled 16×, fact
    once — see operators/analytics.py::salted_join.
    """
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    joined = salted_join(o, c, on="o_custkey", n_salt=16, salt_src="o_orderkey")
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(38,6)"))
        .cast("double")
        .alias("revenue"),
    )


@register(
    "q_session_window",
    oracle="""
    WITH g AS (
      SELECT user_id, event_id, ts::TIMESTAMP AS ts, value,
             CASE WHEN epoch_us(ts::TIMESTAMP) -
                       lag(epoch_us(ts::TIMESTAMP)) OVER (
                         PARTITION BY user_id
                         ORDER BY ts::TIMESTAMP, event_id)
                  >= 1800 * 1000000 THEN 1 ELSE 0 END AS brk
      FROM events
    ),
    s AS (
      SELECT user_id, ts, value,
             SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS seq
      FROM g
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 1800 SECOND AS session_end,
           COUNT(*)::INT AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
    FROM s GROUP BY user_id, seq
    """,
)
def q_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization through Spark's NATIVE session_window aggregate —
    the JVM-side twin of q_sessionize's lag+running-sum formulation and
    of the applyInPandasWithState streaming sessionizer. The oracle
    reproduces session_window's exclusive-end boundary (break at gap
    >= 1800 s, end = last event + gap) in exact integer microseconds.

    Scale: one shuffle on user_id, merging inside the aggregate
    operator — no second window pass, no Python state.
    """
    from ..streaming.stream import session_window_agg

    e = load(spark, sf_dir, "events")
    return session_window_agg(e, gap_seconds=1800)


@register(
    "q_compaction_plan",
    oracle="""
    WITH sized AS (
      SELECT source, doc_id, n_chars,
             SUM(n_chars) OVER (PARTITION BY source ORDER BY doc_id
                                ROWS UNBOUNDED PRECEDING) - n_chars
               AS before_bytes
      FROM documents
    ),
    binned AS (
      SELECT source, doc_id, n_chars,
             CAST(floor(before_bytes / 2000.0) AS BIGINT) AS bin_id
      FROM sized
    )
    SELECT source, doc_id, n_chars, bin_id,
           CAST(ROW_NUMBER() OVER (PARTITION BY source, bin_id
                                   ORDER BY doc_id) AS INT) AS bin_seq
    FROM binned
    """,
)
def q_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compaction plan over the documents table treated as a file
    listing (doc_id = file, n_chars = size, source = storage
    partition): next-fit bin-packing into ~2000-byte output bins via a
    per-scope exclusive prefix sum. Planning never crosses a source
    boundary — compaction respects partition boundaries by
    construction.

    Scale: the window partitions by the scope, so a million-partition
    lake plans in one parallel pass; there is no global sort (the
    degenerate scope-less plan is rejected by the operator).
    """
    d = load(spark, sf_dir, "documents").select("source", "doc_id", "n_chars")
    return compaction_plan(
        d,
        size_col="n_chars",
        target_bytes=2000,
        scope_cols=["source"],
        order_col="doc_id",
    )


@register(
    "q_bloom_semi_join",
    oracle="""
    SELECT o.o_orderpriority,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(38,6))) AS DOUBLE)
             AS revenue
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_totalprice > 400000
    GROUP BY o.o_orderpriority
    """,
)
def q_bloom_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by priority for high-value orders, with the lineitem
    fact reduced through the BLOOM SEMI-JOIN path: a 1 MiB bitmap of
    the qualifying order keys broadcasts, every lineitem row probes it
    in one codegen filter (k map lookups, no explode, no shuffle), and
    only the survivors enter the exact join. The oracle is the PLAIN
    join — bloom false positives die in the join, false negatives are
    impossible.

    Scale: at 100 TB the join exchange IS the cost; the pre-filter
    ships ~|matching| + eps*|fact| rows into it instead of all of them,
    with the dim reduced to a size-independent m/64-word bitmap. See
    operators/analytics.py::bloom_semi_join.
    """
    li = load(spark, sf_dir, "lineitem")
    od = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 400000)
        .withColumnRenamed("o_orderkey", "l_orderkey")
    )
    joined = bloom_semi_join(li, od, on="l_orderkey", m_bits=1 << 20, k=5)
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.col("l_extendedprice").cast("decimal(38,6)"))
        .cast("double")
        .alias("revenue"),
    )


@register(
    "q_event_outliers_mad",
    oracle="""
    WITH p AS (
      SELECT event_id, user_id, value FROM events
      WHERE event_type = 'purchase'
    ),
    m AS (
      SELECT user_id, quantile_cont(value, 0.5) AS med
      FROM p GROUP BY user_id
    ),
    d AS (
      SELECT p.event_id, p.user_id, p.value, m.med,
             abs(p.value - m.med) AS dev
      FROM p JOIN m USING (user_id)
    ),
    md AS (
      SELECT user_id, quantile_cont(dev, 0.5) AS mad
      FROM d GROUP BY user_id
    )
    SELECT d.event_id, d.user_id, d.value, d.med, md.mad,
           round(0.6745 * (d.value - d.med) / md.mad, 6) AS robust_z
    FROM d JOIN md USING (user_id)
    WHERE md.mad > 0
      AND abs(0.6745 * (d.value - d.med) / md.mad) > 3.5
    """,
)
def q_event_outliers_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user ROBUST outliers (modified z-score, Iglewicz–Hoaglin):
    purchases more than 3.5 MAD-scaled units from the user's median —
    the breakdown-resistant sibling of q_event_outliers' mean/stddev
    gauge (one giant anomaly inflates a stddev enough to mask its
    siblings; it cannot move a median).

    Scale: ONE shuffle — median and MAD both run as exact-percentile
    window aggregates over the same user partitioning (the oracle's
    two-join formulation is the proof of equivalence); see
    operators/expectations.py::robust_outliers.
    """
    from ..operators.expectations import robust_outliers

    e = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "value")
    )
    return robust_outliers(e, "value", by="user_id")


@register(
    "q_ohlc_bars",
    oracle="""
    SELECT event_type,
           date_trunc('hour', ts::TIMESTAMP) AS bar_start,
           arg_min(value, ts::TIMESTAMP) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           arg_max(value, ts::TIMESTAMP) AS close,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY event_type, date_trunc('hour', ts::TIMESTAMP)
    """,
)
def q_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC bars per event type — the market-data resample (the
    reference is Nasdaq's pipeline; this is the query its downstream
    serves). Open/Close are min_by/max_by aggregate buffers, NOT a
    sort-within-group, so the whole thing is one partial-aggregable
    groupBy: map side collapses each bar to one candidate row before
    the shuffle (timestamps are microsecond-unique, so open/close are
    deterministic).

    Scale: shuffle carries <= types*hours rows per partition at any
    event volume; see operators/analytics.py::ohlc_bars.
    """
    e = load(spark, sf_dir, "events")
    return ohlc_bars(e, ts_col="ts", price_col="value", by="event_type", unit="hour")


@register(
    "q_corr_matrix",
    oracle="""
    WITH c AS (
      SELECT l_quantity AS q, l_extendedprice AS p, l_discount AS d
      FROM lineitem
      WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
        AND l_discount IS NOT NULL
    ),
    m AS (
      SELECT COUNT(*) AS n,
             CAST(SUM(CAST(q AS DECIMAL(38,6))) AS DOUBLE) AS sq,
             CAST(SUM(CAST(p AS DECIMAL(38,6))) AS DOUBLE) AS sp,
             CAST(SUM(CAST(d AS DECIMAL(38,6))) AS DOUBLE) AS sd,
             CAST(SUM(CAST(q * q AS DECIMAL(38,12))) AS DOUBLE) AS sqq,
             CAST(SUM(CAST(p * p AS DECIMAL(38,12))) AS DOUBLE) AS spp,
             CAST(SUM(CAST(d * d AS DECIMAL(38,12))) AS DOUBLE) AS sdd,
             CAST(SUM(CAST(q * p AS DECIMAL(38,12))) AS DOUBLE) AS sqp,
             CAST(SUM(CAST(q * d AS DECIMAL(38,12))) AS DOUBLE) AS sqd,
             CAST(SUM(CAST(p * d AS DECIMAL(38,12))) AS DOUBLE) AS spd
      FROM c
    )
    SELECT * FROM (
      SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b,
             CASE WHEN (n*sqq - sq*sq) > 0 AND (n*spp - sp*sp) > 0 THEN
               round((n*sqp - sq*sp)
                     / sqrt((n*sqq - sq*sq) * (n*spp - sp*sp)), 6)
             END AS corr, n FROM m
      UNION ALL
      SELECT 'l_quantity', 'l_discount',
             CASE WHEN (n*sqq - sq*sq) > 0 AND (n*sdd - sd*sd) > 0 THEN
               round((n*sqd - sq*sd)
                     / sqrt((n*sqq - sq*sq) * (n*sdd - sd*sd)), 6)
             END, n FROM m
      UNION ALL
      SELECT 'l_extendedprice', 'l_discount',
             CASE WHEN (n*spp - sp*sp) > 0 AND (n*sdd - sd*sd) > 0 THEN
               round((n*spd - sp*sd)
                     / sqrt((n*spp - sp*sp) * (n*sdd - sd*sd)), 6)
             END, n FROM m
    ) ORDER BY col_a, col_b
    """,
)
def q_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass Pearson correlation matrix over lineitem's
    quantity/price/discount — column-redundancy profiling beside
    q_table_profile. Every moment is an exact decimal sum, so the
    assembled correlations match the oracle bit-for-bit after 6dp
    rounding (the z-score gauge's decimal-moment trick, generalized
    to k(k+1)/2 pair buffers in one partial-aggregable statement).

    Scale: one scan, one 1-row aggregate; the unpivot to pair rows
    runs on that single row. See
    operators/expectations.py::correlation_matrix.
    """
    from ..operators.expectations import correlation_matrix

    li = load(spark, sf_dir, "lineitem")
    return correlation_matrix(
        li, ["l_quantity", "l_extendedprice", "l_discount"]
    )


@register(
    "q_cumulative_users",
    oracle="""
    WITH f AS (
      SELECT user_id, MIN(ts::TIMESTAMP)::DATE AS first_day
      FROM events GROUP BY user_id
    ),
    per_day AS (
      SELECT first_day AS day, COUNT(*) AS new_users
      FROM f GROUP BY first_day
    )
    SELECT day::TIMESTAMP AS day, new_users,
           CAST(SUM(new_users) OVER (ORDER BY day
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS total_users
    FROM per_day
    """,
)
def q_cumulative_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users by day — the growth curve every event
    pipeline reports. COUNT(DISTINCT) OVER (ORDER BY day) is not
    window-expressible in either engine; the scalable identity is
    first-seen attribution: cumulative uniques at day D = count of
    users whose FIRST event is <= D, i.e. a per-day count of first
    appearances plus a running sum over the (tiny) day table.

    Scale: one user-keyed shuffle for the first-event min; the day
    table is calendar-sized regardless of event volume, so its window
    cumsum is trivially cheap (days, not rows). Day emitted as
    midnight timestamp for cross-engine pandas dtype parity.
    """
    from pyspark.sql import Window

    e = load(spark, sf_dir, "events")
    f = e.groupBy("user_id").agg(
        F.to_date(F.min("ts")).alias("first_day")
    )
    per_day = f.groupBy("first_day").agg(
        F.count(F.lit(1)).alias("new_users")
    )
    w = Window.orderBy("first_day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return per_day.select(
        F.col("first_day").cast("timestamp").alias("day"),
        "new_users",
        F.sum("new_users").over(w).cast("long").alias("total_users"),
    )
