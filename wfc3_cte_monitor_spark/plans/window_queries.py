"""Event-time window queries over the events table (SURVEY §2.10
additive surface). Batch forms of the streaming windows — the identical
groupBy(window(...)) plans run under readStream in streaming/events.py;
here they're registered as one oracle-checked batch query (the driver
gate caps the registry at 50 queries, so the window shapes and the
interval-join batch twin ride as arms of one tagged union).

Window starts are epoch-aligned in both engines via pure timestamp
arithmetic (no to_timestamp: DuckDB's is timezone-typed and the oracle
must not depend on the harness's session timezone).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..functions.text import portable_hash64, portable_hash64_sql
from ..sources.catalog import load_table
from ..streaming.events import HLLW_EST_NUM, HLLW_M, HLLW_P
from .registry import register


# EV1 tumbling + EV2 sliding + EV3 session windows + the interval-join
# batch twin in one result:
#   kind='tumbling' — window(ts, '1 hour') per event_type
#   kind='sliding'  — window(ts, '1 hour', '30 minutes') (each event in 2)
#   kind='session'  — session_window(ts, '30 minutes') per user
#   kind='attrib'   — LEFT OUTER interval join (purchase ← same-user
#                     clicks within 6 h); window_start/window_end carry
#                     (trigger_ts, cause_ts), key is user:trigger[:cause],
#                     sum_value the attribution lag in seconds
#   kind='asof'     — AS-OF JOIN (purchase ← single LATEST same-user
#                     click at-or-before, operators/asof_join.py): one
#                     union+window shuffle in Spark vs DuckDB's NATIVE
#                     ASOF LEFT JOIN as the oracle. window_start/
#                     window_end carry (purchase_ts, matched_click_ts),
#                     key is user:purchase, sum_value the as-of lag in
#                     seconds (NULL when no prior click exists).
#   kind='resample' — time-series REGULARIZATION: per-user 6 h grid,
#                     forward-filled via the same as-of operator (grid ←
#                     events backward); n_events flags filled vs empty
#                     grid points, sum_value the carried value.
#   kind='funnel3'  — ORDERED-SEQUENCE FUNNEL (view → click → purchase
#                     per user) via stacked running windows on ONE
#                     shuffle; n_events = stage reached, sum_value the
#                     completion lag.
#   kind='cohort'   — COHORT RETENTION triangle: per (first-seen week,
#                     activity week) the distinct active users and the
#                     retention rate vs cohort size; key = week offset.
#   kind='profile'  — batch twin of the CUSTOM-STATE streaming operator
#                     (streaming/stateful.running_user_profile,
#                     applyInPandasWithState): the converged per-user
#                     profile (event count, value sum, first/last seen).
#                     tests/test_streaming.py proves the stream's final
#                     emission equals this aggregate, so arm + test gate
#                     the custom-state path end-to-end.
#   kind='hllw'     — WINDOWED DISTINCT-USER HLL (the streaming face of
#                     d05's sketch suite): per (1 h tumbling window,
#                     event_type), a 64-register portable HyperLogLog
#                     over hashed user ids next to the exact distinct
#                     count. Registers are an incremental max — the
#                     IDENTICAL plan body runs under readStream
#                     (streaming/events.windowed_hll_registers;
#                     tests/test_streaming.py proves stream register
#                     state == batch register state), and the estimate
#                     folds ≤64 register rows per group, never events.
#                     Column mapping: key = event_type, n_events =
#                     exact distinct hashed-user count (collisions at
#                     60 bits are negligible and engine-identical),
#                     sum_value = the raw HLL estimate (round 6),
#                     bit-exact cross-engine via the integer harmonic
#                     sum Σ 2^(55-M).
#   kind='topk'     — per-event-type top-3 users by event count
#                     (deterministic count-desc/user-asc tiebreak): the
#                     EXACT batch twin of the bounded-state streaming
#                     heavy-hitter operator (streaming/stateful.
#                     stream_topk_mg — a Misra-Gries summary with at
#                     most `capacity` counters per key, the O(keys×cap)
#                     state shape an unbounded stream needs;
#                     stream-vs-python-fold equivalence and both MG
#                     error bounds audited in tests/test_streaming.py).
#   kind='dedup'    — batch twin of the watermarked stateful dedup
#                     (streaming/events.stream_dedup /
#                     dropDuplicatesWithinWatermark): the events corpus
#                     with every 97th event REDELIVERED (identical copy —
#                     the at-least-once scenario the operator exists
#                     for) collapses back to one row per event_id;
#                     n_events pins the pre-dedup delivery count, so a
#                     missed collapse or a double-application breaks the
#                     hash. Stream == batch equivalence is proven in
#                     tests/test_streaming.py.
@register(
    "ev01_event_windows",
    oracle=f"""
    SELECT 'tumbling' AS kind, window_start,
           window_start + INTERVAL 1 HOUR AS window_end,
           event_type AS key, n_events, sum_value
    FROM (
        SELECT TIMESTAMP '1970-01-01 00:00:00'
                   + CAST(floor(epoch(ts) / 3600) AS BIGINT) * INTERVAL 1 HOUR AS window_start,
               event_type,
               count(*)::BIGINT AS n_events,
               round(sum(value), 6) AS sum_value
        FROM events
        GROUP BY 1, 2
    )
    UNION ALL
    SELECT 'sliding', window_start,
           window_start + INTERVAL 1 HOUR,
           CAST(NULL AS VARCHAR), n_events, sum_value
    FROM (
        WITH fanned AS (
            SELECT TIMESTAMP '1970-01-01 00:00:00'
                       + (CAST(floor((epoch(ts) - off) / 3600) AS BIGINT) * 3600 + off)
                         * INTERVAL 1 SECOND AS window_start,
                   value
            FROM events, (VALUES (0), (1800)) offs(off)
        )
        SELECT window_start, count(*)::BIGINT AS n_events, round(sum(value), 6) AS sum_value
        FROM fanned GROUP BY 1
    )
    UNION ALL
    SELECT 'attrib', p.ts, c.ts,
           CAST(p.user_id AS VARCHAR) || ':' || CAST(p.event_id AS VARCHAR)
               || coalesce(':' || CAST(c.event_id AS VARCHAR), ''),
           1::BIGINT,
           round(epoch(p.ts) - epoch(c.ts), 6)
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id
     AND c.ts >= p.ts - INTERVAL 6 HOUR AND c.ts <= p.ts
    UNION ALL
    SELECT 'asof', p.ts, c.ts,
           CAST(p.user_id AS VARCHAR) || ':' || CAST(p.event_id AS VARCHAR),
           1::BIGINT,
           round(epoch(p.ts) - epoch(c.ts), 6)
    FROM (SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT user_id, ts, max(event_id) AS click_id
                    FROM events WHERE event_type = 'click' GROUP BY user_id, ts) c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    UNION ALL
    SELECT 'resample', g.gts, c.ts, CAST(g.user_id AS VARCHAR),
           CAST(CASE WHEN c.ts IS NULL THEN 0 ELSE 1 END AS BIGINT),
           round(c.v, 6)
    FROM (
        SELECT user_id,
               TIMESTAMP '1970-01-01 00:00:00' + (s * INTERVAL 1 SECOND) AS gts
        FROM (
            SELECT user_id,
                   CAST(floor(epoch(min(ts)) / 21600) * 21600 AS BIGINT) AS s0,
                   CAST(floor(epoch(max(ts)) / 21600) * 21600 AS BIGINT) AS s1
            FROM events WHERE user_id < 5 GROUP BY user_id
        ), UNNEST(generate_series(s0, s1, 21600)) AS t(s)
    ) g
    ASOF LEFT JOIN (
        SELECT user_id, ts, (max(struct_pack(eid := event_id, v := value))).v AS v
        FROM events WHERE user_id < 5 GROUP BY user_id, ts
    ) c ON g.user_id = c.user_id AND g.gts >= c.ts
    UNION ALL
    SELECT 'funnel3', s1, s3, CAST(user_id AS VARCHAR),
           CAST(1 + CAST(s2 IS NOT NULL AS INT) + CAST(s3 IS NOT NULL AS INT) AS BIGINT),
           round(epoch(s3) - epoch(s1), 6)
    FROM (
        SELECT user_id,
               min(CASE WHEN event_type = 'view' THEN ts END) AS s1,
               min(cok) AS s2,
               min(CASE WHEN event_type = 'purchase' AND rc IS NOT NULL THEN ts END) AS s3
        FROM (
            SELECT *, min(cok) OVER w2 AS rc
            FROM (
                SELECT user_id, ts, event_id, event_type,
                       CASE WHEN event_type = 'click' AND rv IS NOT NULL THEN ts END AS cok
                FROM (
                    SELECT user_id, ts, event_id, event_type,
                           min(CASE WHEN event_type = 'view' THEN ts END) OVER w1 AS rv
                    FROM events
                    WINDOW w1 AS (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                )
            )
            WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        )
        GROUP BY user_id
    ) WHERE s1 IS NOT NULL
    UNION ALL
    SELECT 'cohort',
           TIMESTAMP '1970-01-01 00:00:00' + (cw * 604800) * INTERVAL 1 SECOND,
           TIMESTAMP '1970-01-01 00:00:00' + (aw * 604800) * INTERVAL 1 SECOND,
           CAST(aw - cw AS VARCHAR),
           n_active,
           round(CAST(n_active AS DOUBLE) / cohort_size, 6)
    FROM (
        SELECT f.cw, a.aw,
               count(DISTINCT a.user_id)::BIGINT AS n_active,
               min(cs.n)::BIGINT AS cohort_size
        FROM (
            SELECT user_id, CAST(floor(epoch(min(ts)) / 604800) AS BIGINT) AS cw
            FROM events GROUP BY user_id
        ) f
        JOIN (
            SELECT DISTINCT user_id,
                   CAST(floor(epoch(ts) / 604800) AS BIGINT) AS aw
            FROM events
        ) a ON a.user_id = f.user_id
        JOIN (
            SELECT cw, count(*)::BIGINT AS n FROM (
                SELECT user_id, CAST(floor(epoch(min(ts)) / 604800) AS BIGINT) AS cw
                FROM events GROUP BY user_id
            ) GROUP BY cw
        ) cs ON cs.cw = f.cw
        GROUP BY f.cw, a.aw
    )
    UNION ALL
    SELECT 'profile', min(ts), max(ts), CAST(user_id AS VARCHAR),
           count(*)::BIGINT, round(sum(value), 6)
    FROM events GROUP BY user_id
    UNION ALL
    SELECT 'dedup', min_ts, min_ts, CAST(event_id AS VARCHAR), n_copies,
           round(value, 6)
    FROM (
        SELECT event_id, min(ts) AS min_ts, count(*)::BIGINT AS n_copies,
               any_value(value) AS value
        FROM (SELECT event_id, ts, value FROM events
              UNION ALL
              SELECT event_id, ts, value FROM events WHERE event_id % 97 = 0)
        GROUP BY event_id
    ) WHERE n_copies > 1
    UNION ALL
    SELECT 'session', session_start,
           session_end, CAST(user_id AS VARCHAR), n_events,
           CAST(NULL AS DOUBLE)
    FROM (
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
    )
    UNION ALL
    SELECT 'hllw', window_start, window_start + INTERVAL 1 HOUR, event_type,
           exact_u,
           round({HLLW_EST_NUM!r}
                 / CAST(zhit + ({HLLW_M} - nb) * (1::BIGINT << 55) AS DOUBLE), 6)
    FROM (
        SELECT window_start, event_type,
               CAST(count(*) AS BIGINT) AS nb,
               CAST(sum(1::BIGINT << (55 - mr)) AS BIGINT) AS zhit,
               CAST(sum(nu) AS BIGINT) AS exact_u
        FROM (
            SELECT window_start, event_type, h % {HLLW_M} AS bucket,
                   max(CASE WHEN h >> {HLLW_P} = 0 THEN 55
                            ELSE 55 - length(bin(h >> {HLLW_P})) END) AS mr,
                   count(*) AS nu
            FROM (
                SELECT DISTINCT
                       TIMESTAMP '1970-01-01 00:00:00'
                           + CAST(floor(epoch(ts) / 3600) AS BIGINT)
                             * INTERVAL 1 HOUR AS window_start,
                       event_type, {portable_hash64_sql('user_id')} AS h
                FROM events
            )
            GROUP BY 1, 2, 3
        )
        GROUP BY 1, 2
    )
    UNION ALL
    SELECT 'topk', CAST(NULL AS TIMESTAMP), CAST(NULL AS TIMESTAMP),
           event_type || ':' || CAST(user_id AS VARCHAR),
           cnt, CAST(rnk AS DOUBLE)
    FROM (
        SELECT event_type, user_id, count(*)::BIGINT AS cnt,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY count(*) DESC, user_id) AS rnk
        FROM events GROUP BY event_type, user_id
    ) WHERE rnk <= 3
    """,
    tags=("streaming", "window", "session", "hll", "topk"),
)
def ev01_event_windows(spark, sf_dir):
    """Tumbling, sliding, and session event-time windows — the identical
    groupBy(window(...)) / session_window plans run under Structured
    Streaming with a watermark (tests/test_streaming.py proves
    batch == streaming output)."""
    ev = load_table(spark, sf_dir, "events")
    null_str = F.lit(None).cast("string")

    tumbling = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.lit("tumbling").alias("kind"),
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            F.col("event_type").alias("key"),
            "n_events",
            "sum_value",
        )
    )
    sliding = (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.lit("sliding").alias("kind"),
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            null_str.alias("key"),
            "n_events",
            "sum_value",
        )
    )
    session = (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
        .select(
            F.lit("session").alias("kind"),
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            F.col("user_id").cast("string").alias("key"),
            "n_events",
            F.lit(None).cast("double").alias("sum_value"),
        )
    )
    # 'attrib' — the stream-stream interval join's batch twin under the
    # driver gate (streaming/events.attributed_events; the stream form is
    # proven equal to this plan in tests/test_streaming.py). LEFT OUTER:
    # unattributed triggers ride as NULL-cause rows — in streaming those
    # only emit once the watermark expires the trigger's state, the
    # funnel semantics worth gating. Watermarks need an LTZ event-time
    # column; deterministic under the pinned-UTC session, and the
    # function emits NTZ back.
    from ..streaming.events import attributed_events

    attrib = attributed_events(
        ev.withColumn("ts", F.col("ts").cast("timestamp")), join_type="left_outer"
    ).select(
        F.lit("attrib").alias("kind"),
        F.col("trigger_ts").alias("window_start"),
        F.col("cause_ts").alias("window_end"),
        # NULL semantics mirror the oracle's || exactly: a NULL user or
        # trigger id propagates to a NULL key (concat), while a NULL
        # cause (the outer rows) drops its segment (coalesce) — concat_ws
        # would silently skip NULL user/trigger segments and diverge
        F.concat(
            F.col("user_id").cast("string"),
            F.lit(":"),
            F.col("trigger_id").cast("string"),
            F.coalesce(
                F.concat(F.lit(":"), F.col("cause_id").cast("string")), F.lit("")
            ),
        ).alias("key"),
        F.lit(1).cast("bigint").alias("n_events"),
        F.col("lag_seconds").alias("sum_value"),
    )
    # 'asof' — the AS-OF JOIN operator (operators/asof_join.py): each
    # purchase matched to the single LATEST same-user click at-or-before
    # it. Deliberate contrast with 'attrib' (the interval join takes ALL
    # clicks in a window; as-of takes exactly one) and a genuinely
    # independent oracle — DuckDB runs its NATIVE ASOF LEFT JOIN while
    # Spark runs the union+window single-shuffle plan. Clicks are
    # pre-aggregated to one row per (user, ts) (max event_id) because
    # as-of is ambiguous under right-timestamp ties in both engines.
    from ..operators.asof_join import asof_join

    purch = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("purchase_id")
    )
    clicks = (
        ev.where(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
    )
    asof = asof_join(
        purch, clicks, on=["user_id"], left_ts="ts", right_ts="ts"
    ).select(
        F.lit("asof").alias("kind"),
        F.col("ts").alias("window_start"),
        F.col("asof_matched_ts").alias("window_end"),
        F.concat(
            F.col("user_id").cast("string"), F.lit(":"), F.col("purchase_id").cast("string")
        ).alias("key"),
        F.lit(1).cast("bigint").alias("n_events"),
        # NTZ → LTZ cast is deterministic under the pinned-UTC session
        # (same idiom as attributed_events' lag_seconds)
        F.round(
            F.col("ts").cast("timestamp").cast("double")
            - F.col("asof_matched_ts").cast("timestamp").cast("double"),
            6,
        ).alias("sum_value"),
    )
    # 'resample' — TIME-SERIES REGULARIZATION (gap-fill to a regular
    # grid with forward-fill): per user a 6-hour grid spanning their
    # activity, each grid point carrying the LAST observed value
    # at-or-before it — built by REUSING the as-of operator (grid ←
    # events, backward). The grid is generated distributed (per-user
    # sequence + explode, no driver loop); values at duplicate (user,
    # ts) collapse via the deterministic lexicographic max(struct)
    # argmax. window_start/window_end = (grid point, source event ts),
    # n_events = 1 if the point is filled else 0, sum_value the filled
    # value. At 100 TB the grid relation is (users × span/step) rows of
    # two longs and rides the same single key shuffle as any as-of.
    u5 = ev.where(F.col("user_id") < 5)
    bounds = u5.groupBy("user_id").agg(
        (F.floor(F.min("ts").cast("timestamp").cast("double") / 21600) * 21600)
        .cast("bigint").alias("s0"),
        (F.floor(F.max("ts").cast("timestamp").cast("double") / 21600) * 21600)
        .cast("bigint").alias("s1"),
    )
    grid = bounds.select(
        "user_id", F.explode(F.expr("sequence(s0, s1, 21600)")).alias("gsec")
    ).select(
        "user_id", F.timestamp_seconds("gsec").cast("timestamp_ntz").alias("gts")
    )
    vals = u5.groupBy("user_id", "ts").agg(
        F.max(F.struct(F.col("event_id").alias("eid"), F.col("value").alias("v")))["v"].alias("v")
    )
    resample = asof_join(grid, vals, on=["user_id"], left_ts="gts", right_ts="ts").select(
        F.lit("resample").alias("kind"),
        F.col("gts").alias("window_start"),
        F.col("asof_matched_ts").alias("window_end"),
        F.col("user_id").cast("string").alias("key"),
        F.when(F.col("asof_matched_ts").isNull(), 0).otherwise(1)
        .cast("bigint").alias("n_events"),
        F.round("v", 6).alias("sum_value"),
    )
    # 'funnel3' — ORDERED-SEQUENCE FUNNEL (MATCH_RECOGNIZE-lite): per
    # user, the earliest view → click-after-view → purchase-after-that
    # chain, detected with STACKED RUNNING WINDOWS over one (user)
    # partition — each stage's running min feeds the next stage's
    # eligibility, so arbitrary-length ordered patterns cost one shuffle
    # + one sort (consecutive Window nodes share the exchange AND the
    # sort), never a per-stage self-join. n_events = stage reached
    # (1-3), window_start/window_end = (first view, completing
    # purchase), sum_value = completion lag seconds (NULL if the funnel
    # never completes). Ties resolved by the total (ts, event_id) order,
    # identical in both engines.
    wrun = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    f3 = ev.select("user_id", "ts", "event_id", "event_type").withColumn(
        "rv", F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(wrun)
    )
    f3 = f3.withColumn(
        "cok",
        F.when(
            (F.col("event_type") == "click") & F.col("rv").isNotNull(), F.col("ts")
        ),
    ).withColumn("rc", F.min("cok").over(wrun))
    f3agg = (
        f3.groupBy("user_id")
        .agg(
            F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("s1"),
            F.min("cok").alias("s2"),
            F.min(
                F.when(
                    (F.col("event_type") == "purchase") & F.col("rc").isNotNull(),
                    F.col("ts"),
                )
            ).alias("s3"),
        )
        .where(F.col("s1").isNotNull())
    )
    funnel3 = f3agg.select(
        F.lit("funnel3").alias("kind"),
        F.col("s1").alias("window_start"),
        F.col("s3").alias("window_end"),
        F.col("user_id").cast("string").alias("key"),
        (
            F.lit(1)
            + F.col("s2").isNotNull().cast("int")
            + F.col("s3").isNotNull().cast("int")
        ).cast("bigint").alias("n_events"),
        F.round(
            F.col("s3").cast("timestamp").cast("double")
            - F.col("s1").cast("timestamp").cast("double"),
            6,
        ).alias("sum_value"),
    )
    # 'cohort' — COHORT RETENTION: users grouped by first-seen week
    # (epoch-aligned 604800 s floor, identical arithmetic both engines),
    # per (cohort week, activity week) the distinct active users and the
    # retention rate against the cohort's size — the classic retention
    # triangle. Two user-keyed aggregations + one tiny cohort-size join;
    # at 100 TB the matrix is (weeks²) rows regardless of corpus size.
    # Column mapping: window_start/window_end = (cohort week, activity
    # week), key = week offset, n_events = distinct active users,
    # sum_value = round(retention rate, 6).
    firstw = ev.groupBy("user_id").agg(
        F.floor(F.min("ts").cast("timestamp").cast("double") / 604800)
        .cast("bigint").alias("cw")
    )
    activew = ev.select(
        "user_id",
        F.floor(F.col("ts").cast("timestamp").cast("double") / 604800)
        .cast("bigint").alias("aw"),
    ).distinct()
    csize = firstw.groupBy("cw").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    cohort = (
        firstw.join(activew, "user_id")
        .groupBy("cw", "aw")
        .agg(F.count_distinct("user_id").cast("bigint").alias("n_active"))
        .join(F.broadcast(csize), "cw")
        .select(
            F.lit("cohort").alias("kind"),
            F.timestamp_seconds(F.col("cw") * 604800)
            .cast("timestamp_ntz").alias("window_start"),
            F.timestamp_seconds(F.col("aw") * 604800)
            .cast("timestamp_ntz").alias("window_end"),
            (F.col("aw") - F.col("cw")).cast("string").alias("key"),
            F.col("n_active").alias("n_events"),
            F.round(F.col("n_active").cast("double") / F.col("n"), 6).alias("sum_value"),
        )
    )
    # 'profile' — batch twin of the applyInPandasWithState running
    # profile: the converged per-user (count, sum, first/last ts);
    # test_streaming proves the stream's final emission equals this.
    profile = (
        ev.groupBy("user_id")
        .agg(
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.lit("profile").alias("kind"),
            F.col("first_ts").alias("window_start"),
            F.col("last_ts").alias("window_end"),
            F.col("user_id").cast("string").alias("key"),
            "n_events",
            "sum_value",
        )
    )

    # 'dedup' — batch twin of stream_dedup (dropDuplicatesWithinWatermark)
    # over an at-least-once corpus: every 97th event redelivered as an
    # identical copy; one groupBy on the natural key collapses it and
    # keeps the delivery count as evidence. All aggregates are over
    # identical copies, so any_value/first are deterministic.
    replayed = ev.select("event_id", "ts", "value").where(F.col("event_id") % 97 == 0)
    dedup = (
        ev.select("event_id", "ts", "value").unionByName(replayed)
        .groupBy("event_id")
        .agg(
            F.min("ts").alias("min_ts"),
            F.count(F.lit(1)).cast("bigint").alias("n_copies"),
            F.first("value").alias("value"),
        )
        .where(F.col("n_copies") > 1)
        .select(
            F.lit("dedup").alias("kind"),
            F.col("min_ts").alias("window_start"),
            F.col("min_ts").alias("window_end"),
            F.col("event_id").cast("string").alias("key"),
            F.col("n_copies").alias("n_events"),
            F.round("value", 6).alias("sum_value"),
        )
    )
    # 'hllw' — windowed distinct-user HLL next to the exact count (see
    # the arm comment). The register computation is the same plan body
    # streaming/events.windowed_hll_registers runs under readStream
    # (equivalence proven in tests/test_streaming.py); the batch arm
    # additionally dedups (window, type, user-hash) so the exact count
    # rides the same aggregation chain — an audit column the streaming
    # form deliberately omits (count-distinct isn't an incremental agg).
    duh = (
        ev.select(
            F.window("ts", "1 hour").alias("w"),
            "event_type",
            portable_hash64(F.col("user_id")).alias("h"),
        )
        .distinct()
        .select(
            "w", "event_type",
            (F.col("h") % HLLW_M).alias("bucket"),
            F.shiftright("h", HLLW_P).alias("wv"),
        )
    )
    hrho = F.when(F.col("wv") == 0, F.lit(55)).otherwise(
        F.lit(55) - F.length(F.bin("wv"))
    )
    hregs = (
        duh.select("w", "event_type", "bucket", hrho.alias("rho"))
        .groupBy("w", "event_type", "bucket")
        .agg(F.max("rho").alias("mr"), F.count(F.lit(1)).alias("nu"))
    )
    hper = hregs.groupBy("w", "event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("nb"),
        F.sum(F.expr("shiftleft(cast(1 as bigint), 55 - mr)"))
        .cast("bigint").alias("zhit"),
        F.sum("nu").cast("bigint").alias("exact_u"),
    )
    hzint = F.col("zhit") + (F.lit(HLLW_M) - F.col("nb")) * F.lit(1 << 55)
    hllw = hper.select(
        F.lit("hllw").alias("kind"),
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        F.col("event_type").alias("key"),
        F.col("exact_u").alias("n_events"),
        F.round(F.lit(HLLW_EST_NUM) / hzint.cast("double"), 6).alias("sum_value"),
    )
    # 'topk' — per-event-type top-3 users by event count (deterministic
    # tiebreak: count desc, user_id asc): the EXACT batch twin of the
    # bounded-state streaming heavy-hitter operator
    # (streaming/stateful.stream_topk_mg, Misra-Gries summary via
    # applyInPandasWithState — stream-vs-python equivalence and both MG
    # error bounds audited against THIS arm's exact counts in
    # tests/test_streaming.py). One user-keyed agg + one per-type
    # window; at scale the agg is the map-side-combined count and the
    # window sees only distinct (type, user) rows.
    from pyspark.sql import Window as W

    wtk = W.partitionBy("event_type").orderBy(F.desc("cnt"), F.asc("user_id"))
    topk = (
        ev.groupBy("event_type", "user_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .withColumn("rnk", F.row_number().over(wtk))
        .where(F.col("rnk") <= 3)
        .select(
            F.lit("topk").alias("kind"),
            F.lit(None).cast("timestamp").alias("window_start"),
            F.lit(None).cast("timestamp").alias("window_end"),
            F.concat("event_type", F.lit(":"), F.col("user_id").cast("string")).alias("key"),
            F.col("cnt").alias("n_events"),
            F.col("rnk").cast("double").alias("sum_value"),
        )
    )
    return (
        tumbling.unionAll(sliding).unionAll(session)
        .unionAll(attrib).unionAll(asof).unionAll(resample)
        .unionAll(funnel3).unionAll(cohort).unionAll(profile)
        .unionAll(dedup).unionAll(hllw).unionAll(topk)
    )
