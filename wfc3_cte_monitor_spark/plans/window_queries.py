"""Event-time window queries over the events table (SURVEY §2.10
additive surface). Batch forms of the streaming windows — the identical
groupBy(window(...)) plans run under readStream in streaming/events.py;
here they're registered as oracle-checked batch queries.

Window starts are epoch-aligned in both engines via pure timestamp
arithmetic (no to_timestamp: DuckDB's is timezone-typed and the oracle
must not depend on the harness's session timezone).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..sources.catalog import load_table
from .registry import register


# EV1 — tumbling 1-hour windows per event_type.
@register(
    "ev01_tumbling_window",
    oracle="""
    SELECT TIMESTAMP '1970-01-01 00:00:00'
               + CAST(floor(epoch(ts) / 3600) AS BIGINT) * INTERVAL 1 HOUR AS window_start,
           event_type,
           count(*)::BIGINT AS n_events,
           round(sum(value), 6) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
    tags=("streaming", "window"),
)
def ev01_tumbling_window(spark, sf_dir):
    """groupBy(window(ts, '1 hour'), event_type) — identical plan runs
    under Structured Streaming with a watermark."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "sum_value")
    )


# EV2 — sliding 1-hour windows, 30-minute slide (each event in 2 windows).
@register(
    "ev02_sliding_window",
    oracle="""
    WITH fanned AS (
        SELECT TIMESTAMP '1970-01-01 00:00:00'
                   + (CAST(floor((epoch(ts) - off) / 3600) AS BIGINT) * 3600 + off)
                     * INTERVAL 1 SECOND AS window_start,
               value
        FROM events, (VALUES (0), (1800)) offs(off)
    )
    SELECT window_start, count(*)::BIGINT AS n_events, round(sum(value), 6) AS sum_value
    FROM fanned GROUP BY 1
    """,
    tags=("streaming", "window"),
)
def ev02_sliding_window(spark, sf_dir):
    """window(ts, '1 hour', '30 minutes') — overlap fan-out is Spark's
    window explode; the oracle reproduces it as two aligned grids."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "sum_value")
    )


# EV3 — session windows (30-minute gap) per user.
@register(
    "ev03_session_window",
    oracle="""
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL 30 MINUTE AS session_end,
           count(*)::BIGINT AS n_events
    FROM (
        SELECT user_id, ts,
               sum(CASE WHEN _gap IS NULL OR _gap >= 1800 THEN 1 ELSE 0 END)
                   OVER (PARTITION BY user_id ORDER BY ts
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM (
            SELECT user_id, ts,
                   epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) AS _gap
            FROM events
        )
    )
    GROUP BY user_id, session_id
    """,
    tags=("streaming", "session"),
)
def ev03_session_window(spark, sf_dir):
    """session_window(ts, '30 minutes') per user — Spark's native session
    operator; session_end is last event + gap (Spark's convention)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )
