"""Catalog entries for the streaming operators, run in BATCH mode.

``F.window`` / ``F.session_window`` are ordinary Catalyst expressions
that also work on batch DataFrames, so the exact transformations the
streaming pipelines use (streaming/events.py) are hash-checked here
against DuckDB oracles; tests/test_streaming.py separately proves the
STREAM execution (availableNow + memory sink) produces identical rows.

Oracle arithmetic: Spark's tumbling window start for timestamp t is
``t - ((epoch_us(t) - start_offset) % slide_us)`` — re-derived in SQL
with integer µs math, formatted as strings (engine-stable).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..streaming import events as SE
from .catalog import register, table

# µs since epoch of the event timestamp, as exact integer math.
_EPOCH_US = "CAST(FLOOR(EXTRACT(EPOCH FROM ts) * 1000000) AS BIGINT)"


def _win_start_sql(window_us: int, offset_us: int = 0) -> str:
    """DuckDB: the tumbling-window start (as 'YYYY-MM-DD HH:MM:SS')."""
    return (
        f"strftime(to_timestamp(CAST(({_EPOCH_US} - "
        f"(({_EPOCH_US} - {offset_us}) % {window_us})) / 1000000 AS BIGINT)), "
        f"'%Y-%m-%d %H:%M:%S')"
    )


@register(
    "stream_tumbling_window",
    oracle=f"""
    SELECT {_win_start_sql(3_600_000_000)} AS win_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
    FROM events
    GROUP BY 1, 2
    """,
    tags=("streaming", "window"),
    doc="Watermarked tumbling-window counts (streaming/events.py) in batch "
    "mode — identical plan minus the watermark node.",
)
def stream_tumbling_window(spark: SparkSession, sf: str):
    return SE.tumbling_window_counts(table(spark, sf, "events"))


@register(
    "stream_sliding_window",
    oracle=f"""
    WITH starts AS (
        SELECT {_win_start_sql(1_800_000_000)} AS win_start FROM events
        UNION ALL
        SELECT strftime(to_timestamp(
                 CAST(({_EPOCH_US} - (({_EPOCH_US}) % 1800000000)
                       - 1800000000) / 1000000 AS BIGINT)),
               '%Y-%m-%d %H:%M:%S') AS win_start
        FROM events
    )
    SELECT win_start, COUNT(*) AS n_events
    FROM starts GROUP BY win_start
    """,
    tags=("streaming", "window"),
    doc="Sliding 1h/30min windows: every event lands in exactly two "
    "windows (the two 30-min-aligned starts within the preceding hour).",
)
def stream_sliding_window(spark: SparkSession, sf: str):
    return SE.sliding_window_counts(table(spark, sf, "events"))


@register(
    "stream_session_window",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts,
               CASE WHEN CAST(FLOOR(EXTRACT(EPOCH FROM ts) * 1000000) AS BIGINT)
                         - CAST(FLOOR(EXTRACT(EPOCH FROM LAG(ts) OVER w) * 1000000)
                                AS BIGINT) > 1800000000
                         OR LAG(ts) OVER w IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
        SELECT user_id, ts,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS UNBOUNDED PRECEDING) AS session_no
        FROM flagged
    )
    SELECT user_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
           COUNT(*) AS n_events
    FROM numbered GROUP BY user_id, session_no
    """,
    tags=("streaming", "window", "sessionize"),
    doc="session_window (30-min gap) vs a gaps-and-islands SQL oracle — "
    "the same sessions, derived two independent ways.",
)
def stream_session_window(spark: SparkSession, sf: str):
    return SE.session_window_stats(table(spark, sf, "events"))


@register(
    "stream_stream_join",
    oracle="""
    SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
           CAST(FLOOR(EXTRACT(EPOCH FROM p.ts) * 1000000) AS BIGINT)
             - CAST(FLOOR(EXTRACT(EPOCH FROM c.ts) * 1000000) AS BIGINT)
               AS lag_us
    FROM events c
    JOIN events p
      ON p.user_id = c.user_id
     AND c.event_type = 'click' AND p.event_type = 'purchase'
     AND CAST(FLOOR(EXTRACT(EPOCH FROM p.ts) * 1000000) AS BIGINT)
         - CAST(FLOOR(EXTRACT(EPOCH FROM c.ts) * 1000000) AS BIGINT)
         BETWEEN 0 AND 3600000000
    """,
    tags=("streaming", "join", "temporal"),
    doc="Stream-stream inner join (clicks→purchases within 1 h per "
    "user) in batch mode; streaming/events.py runs the identical plan "
    "with per-side watermarks bounding the join state. "
    "tests/test_streaming.py proves stream == batch row sets.",
)
def stream_stream_join(spark: SparkSession, sf: str):
    return SE.clicks_purchases_join(table(spark, sf, "events"))


@register(
    "stream_dedup_watermark",
    oracle="""
    SELECT DISTINCT user_id, event_type,
           strftime(date_trunc('minute', ts), '%Y-%m-%d %H:%M:%S')
               AS minute_start
    FROM events
    """,
    tags=("streaming", "dedup"),
    doc="Watermark-bounded streaming dedup (dropDuplicatesWithinWatermark "
    "over (user, type, minute) keys) in its batch form — a plain "
    "DISTINCT over the same keys. The streaming twin keeps dedup state "
    "only within the 1 h watermark horizon (state bounded by horizon, "
    "not stream length); tests/test_streaming.py proves the emitted "
    "key set matches and survives a checkpoint restart.",
)
def stream_dedup_watermark(spark: SparkSession, sf: str):
    return SE.dedup_events_within_watermark(table(spark, sf, "events"))
