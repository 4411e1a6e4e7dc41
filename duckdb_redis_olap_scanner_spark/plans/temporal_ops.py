"""Temporal-join catalog entries: as-of join and banded range join.

The reference class of engines (DuckDB) ships a native ASOF JOIN
(duckdb docs: ASOF joins; the oracle below uses it directly) — Spark
has no such operator, so ``operators/temporal.py`` re-expresses the
semantics as compositions whose heavy step is one equi-shuffle.
Timestamps are surfaced as ``unix_micros`` BIGINTs so both engines
hash identical integers.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..operators.temporal import asof_join, banded_range_join
from .catalog import register, table


@register(
    "asof_join_clicks_purchases",
    oracle="""
    SELECT l.event_id AS click_id, l.user_id,
           epoch_us(l.ts) AS click_us,
           r.event_id AS purchase_id,
           epoch_us(r.ts) AS purchase_us,
           r.value AS purchase_value
    FROM (SELECT * FROM events WHERE event_type = 'click') l
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
      ON l.user_id = r.user_id AND l.ts >= r.ts
    """,
    tags=("join", "temporal"),
    doc="As-of join: each click matched to the user's most recent "
    "purchase at or before it (NULL when none). Spark side is "
    "union+window (one shuffle on user_id) — no inequality-join "
    "blow-up; oracle is DuckDB's native ASOF LEFT JOIN.",
)
def asof_join_clicks_purchases(spark: SparkSession, sf: str):
    ev = table(spark, sf, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    res = asof_join(clicks, purchases, on="ts", by="user_id")
    return res.select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.unix_micros("ts").alias("click_us"),
        F.col("matched.event_id").alias("purchase_id"),
        F.unix_micros("matched.ts").alias("purchase_us"),
        F.col("matched.value").alias("purchase_value"),
    )


@register(
    "range_join_events_1h",
    oracle="""
    SELECT a.user_id, a.event_id AS a_id, b.event_id AS b_id,
           epoch_us(b.ts) - epoch_us(a.ts) AS micros_apart
    FROM events a JOIN events b
      ON a.user_id = b.user_id AND a.event_id < b.event_id
     AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR
    """,
    tags=("join", "temporal"),
    doc="Banded range join: same-user event pairs within one hour. The "
    "band grid turns the range predicate into an equi-join on "
    "(user_id, hour-bucket) with the left side exploded to its two "
    "candidate buckets — candidates stay bounded at any scale; DuckDB "
    "solves the same problem single-node with IEJoin.",
)
def range_join_events_1h(spark: SparkSession, sf: str):
    ev = table(spark, sf, "events").select("event_id", "user_id", "ts")
    res = banded_range_join(ev, ev, on="ts", by="user_id")
    return res.filter(F.col("a.event_id") < F.col("b.event_id")).select(
        "user_id",
        F.col("a.event_id").alias("a_id"),
        F.col("b.event_id").alias("b_id"),
        "micros_apart",
    )


@register(
    "recursive_date_spine",
    oracle="""
    WITH RECURSIVE d(day) AS (
      SELECT DATE '2024-01-01'
      UNION ALL
      SELECT CAST(day + INTERVAL 1 DAY AS DATE) FROM d
      WHERE day < DATE '2024-01-30'
    )
    SELECT strftime(d.day, '%Y-%m-%d') AS day,
           CAST(COALESCE(c.n, 0) AS BIGINT) AS n_events
    FROM d LEFT JOIN (
      SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n FROM events GROUP BY 1
    ) c USING (day)
    """,
    tags=("recursive",),
    doc="Recursive CTE (Spark 4 WITH RECURSIVE) date spine joined to "
    "daily event counts — days with zero events included. The classic "
    "gap-filling pattern for time-series reporting.",
)
def recursive_date_spine(spark: SparkSession, sf: str):
    spine = spark.sql(
        """
        WITH RECURSIVE d(day) AS (
          SELECT DATE '2024-01-01'
          UNION ALL
          SELECT CAST(day + INTERVAL 1 DAY AS DATE) FROM d
          WHERE day < DATE '2024-01-30'
        )
        SELECT day FROM d
        """
    )
    daily = (
        table(spark, sf, "events")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return spine.join(daily, "day", "left").select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.coalesce("n", F.lit(0)).alias("n_events"),
    )


@register(
    "hypertable_rollup",
    oracle="""
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS hour, COUNT(*) AS n,
             SUM(CAST(FLOOR(value * 100.0) AS BIGINT)) AS v
      FROM events GROUP BY 1
    )
    SELECT strftime(CAST(hour AS DATE), '%Y-%m-%d') AS day,
           CAST(SUM(n) AS BIGINT) AS n_events,
           CAST(SUM(v) AS BIGINT) AS sum_value_cents
    FROM hourly GROUP BY 1
    """,
    tags=("rollup", "temporal"),
    doc="Hypertable-style cascading rollup: raw events → hourly "
    "aggregate → daily aggregate by RE-aggregating the hourly layer "
    "(count/sum are associative). At scale the hourly layer is the "
    "materialized continuous aggregate; every coarser resolution "
    "derives from it without touching raw data.",
)
def hypertable_rollup(spark: SparkSession, sf: str):
    hourly = (
        table(spark, sf, "events")
        .groupBy(F.date_trunc("hour", "ts").alias("hour"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.floor(F.col("value") * 100).cast("long")).alias("v"),
        )
    )
    return hourly.groupBy(F.to_date("hour").alias("day")).agg(
        F.sum("n").alias("n_events"), F.sum("v").alias("sum_value_cents")
    ).select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "n_events",
        "sum_value_cents",
    )
