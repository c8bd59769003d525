"""Structured Streaming surface over the events table (SURVEY §2.10).

The reference is batch-only; "incremental" means re-running with upsert
idempotency (run_uvis_external_cte.py:66-85). The streaming surface is
additive: the SAME window plans registered as batch queries
(plans/window_queries.py) run here under ``readStream`` with watermarks —
DataFrame-first design means the logical plan is shared, only the source
and trigger differ.

Local testing drives the file source with ``processAllAvailable()`` and a
memory sink; in production the source line becomes Kafka and the sink a
``foreachBatch`` upsert (operators/upsert.py) for exactly-once MERGE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Schema the stream falls back to when the events file doesn't exist yet
# (declaring a stream over a not-yet-populated directory is a standard
# file-source setup): the generator's historical nanos-long layout.
_EVENTS_FALLBACK_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),  # epoch nanos under nanosAsLong
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet.

    The generated ``ts`` column has shipped as both TIMESTAMP(NANOS)
    (readable only as a long under nanosAsLong) and TIMESTAMP(MICROS);
    a stream needs its schema up front, so probe the footer with a batch
    read. If the file doesn't exist yet, fall back to the documented
    nanos-long schema so the stream can still be declared before data
    arrives. The ns → µs conversion is keyed off the parquet logical-type
    ANNOTATION (events_ts_kind), not the Spark-facing LongType, so an
    unannotated INT64 micros column is never wrongly divided."""
    from pyspark.errors.exceptions.captured import AnalysisException

    from ..sources.catalog import events_ts_kind, table_path

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = table_path(sf_dir, "events")
    try:
        batch_schema = spark.read.parquet(path).schema
    except AnalysisException:
        batch_schema = _EVENTS_FALLBACK_SCHEMA
    ts_is_long = isinstance(batch_schema["ts"].dataType, T.LongType)
    raw = (
        spark.readStream.schema(batch_schema)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")  # file source needs a dir
        .load(sf_dir)
    )
    if ts_is_long:
        kind = events_ts_kind(path)
        micros = F.expr("ts div 1000") if kind in ("ns", None) else F.col("ts")
        raw = raw.withColumn("ts", F.timestamp_micros(micros))
    # Watermarks demand TIMESTAMP (ltz) — this Spark build rejects NTZ
    # event time (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE) — so the
    # in-stream event-time column stays LTZ. Session TZ is pinned to UTC
    # (session.prepare), making the relabel deterministic; the window
    # functions below cast their OUTPUT time columns back to
    # TIMESTAMP_NTZ so batch/stream twins share one schema and collected
    # values never route through the driver OS timezone.
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


def windowed_counts_stream(events: DataFrame, window: str = "1 hour",
                           watermark: str = "2 hours") -> DataFrame:
    """Tumbling event-time windows with late-data watermark — the
    streaming twin of the 'tumbling' arm of ev01_event_windows."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            # NTZ output (batch-twin schema); deterministic under the
            # pinned-UTC session TZ
            F.col("w.start").cast("timestamp_ntz").alias("window_start"),
            "event_type", "n_events", "sum_value",
        )
    )


def sessionized_stream(events: DataFrame, gap: str = "30 minutes",
                       watermark: str = "2 hours") -> DataFrame:
    """Session windows per user (streaming twin of the 'session' arm of
    ev01_event_windows)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").cast("timestamp_ntz").alias("session_start"),
            F.col("w.end").cast("timestamp_ntz").alias("session_end"),
            "n_events",
        )
    )


# Windowed portable HyperLogLog (the streaming face of d05's 'hll'
# sketch): per (tumbling window, event_type), 64 registers over hashed
# user ids. Register value = max rho — an INCREMENTAL aggregate, so the
# same plan runs under readStream (registers absorb micro-batches, late
# data re-raises a max under the watermark) and in batch; the estimate
# is a read-time fold over the ≤64-row-per-group register state, never
# over events. P=6 here (windowed cardinalities are small) ⇒ w = h>>6
# is 54-bit and rho = 55 - bitlength(w) ∈ [1, 55]; the harmonic sum is
# carried as the exact bigint Σ 2^(55-M) (≤ 64·2^55 < 2^63), keeping
# the estimate bit-identical cross-engine (same scheme as the d05 arm,
# re-based from its 50-bit layout).
HLLW_P = 6
HLLW_M = 1 << HLLW_P
HLLW_EST_NUM = (0.7213 / (1.0 + 1.079 / HLLW_M)) * HLLW_M * HLLW_M * float(1 << 55)


def windowed_hll_registers(events: DataFrame, window: str = "1 hour",
                           watermark: str | None = None) -> DataFrame:
    """(window_start, event_type, bucket, mr): the HLL register state for
    per-window distinct-user estimation. One function body serves batch
    AND streaming (pass ``watermark`` for the stream form) — the unified
    DataFrame API is the point: the sketch state a Kafka job maintains
    is provably the same relation the batch audit recomputes."""
    from ..functions.text import portable_hash64

    src = events.withWatermark("ts", watermark) if watermark else events
    h = portable_hash64(F.col("user_id"))
    hb = src.select(
        F.window("ts", window).alias("w"), "event_type", h.alias("h")
    ).select(
        "w", "event_type",
        (F.col("h") % HLLW_M).alias("bucket"),
        F.shiftright("h", HLLW_P).alias("wv"),
    )
    rho = F.when(F.col("wv") == 0, F.lit(55)).otherwise(
        F.lit(55) - F.length(F.bin("wv"))
    )
    return (
        hb.select("w", "event_type", "bucket", rho.alias("rho"))
        .groupBy("w", "event_type", "bucket")
        .agg(F.max("rho").alias("mr"))
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("window_start"),
            "event_type", "bucket", "mr",
        )
    )


def stream_dedup(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Stateful natural-key dedup within the watermark — the streaming
    form of the reference's insert-or-update idempotency (S7). Output ts
    is NTZ (batch-twin schema)."""
    return (
        events.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["event_id"])
        .withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    )


def attributed_events(events: DataFrame, trigger_type: str = "purchase",
                      cause_type: str = "click",
                      attribution_window: str = "6 hours",
                      watermark: str = "2 hours",
                      join_type: str = "inner") -> DataFrame:
    """STREAM-STREAM interval join: attribute each trigger event (e.g. a
    purchase) to the same user's cause events (e.g. clicks) within the
    preceding attribution window — the remaining streaming operator class
    (two unbounded sides) after the windowed aggs / stateful dedup /
    stream-static incremental MERGE surfaces.

    Both sides carry watermarks and the join condition is time-bounded,
    so Spark can expire buffered state (a side's rows are droppable once
    the other side's watermark passes ts + window) — the state-bounding
    contract a production stream needs. Inner-join results emit without
    waiting for the watermark, so a file-source test sees every match.

    The SAME plan runs in batch (``withWatermark`` is a no-op on batch
    inputs): feed it the batch events table and it is a plain interval
    join — the batch/stream-twin design the module is built around.
    Expects an LTZ ``ts`` event-time column (watermarks reject NTZ);
    outputs NTZ, deterministic under the session's pinned-UTC timezone.

    ``join_type='left_outer'`` additionally emits UNATTRIBUTED triggers
    with NULL cause columns — in streaming these rows surface only once
    the watermark passes the trigger's time bound (state expiry decides
    "no cause is coming"), the semantics a conversion funnel needs.
    """
    trig = (
        events.where(F.col("event_type") == trigger_type)
        .select(
            "user_id",
            F.col("event_id").alias("trigger_id"),
            F.col("ts").alias("t_ts"),
        )
        .withWatermark("t_ts", watermark)
    )
    cause = (
        events.where(F.col("event_type") == cause_type)
        .select(
            F.col("user_id").alias("_c_user"),
            F.col("event_id").alias("cause_id"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", watermark)
    )
    joined = trig.join(
        cause,
        (F.col("user_id") == F.col("_c_user"))
        & (F.col("c_ts") >= F.col("t_ts") - F.expr(f"INTERVAL {attribution_window}"))
        & (F.col("c_ts") <= F.col("t_ts")),
        join_type,
    )
    return joined.select(
        "user_id",
        "trigger_id",
        "cause_id",
        F.col("t_ts").cast("timestamp_ntz").alias("trigger_ts"),
        F.col("c_ts").cast("timestamp_ntz").alias("cause_ts"),
        F.round(F.col("t_ts").cast("double") - F.col("c_ts").cast("double"), 6).alias(
            "lag_seconds"
        ),
    )


def run_to_memory(stream_df: DataFrame, name: str, output_mode: str = "append"):
    """Drive a streaming DataFrame to completion against the memory sink
    (local verification harness)."""
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    return q
