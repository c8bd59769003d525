"""Custom stateful streaming operator via applyInPandasWithState.

The built-in stateful operators (window aggs, session_window,
dropDuplicatesWithinWatermark) cover the reference surface; this adds the
custom-state escape hatch the prompt's streaming checklist names: a
per-user RUNNING PROFILE (event count, value sum, last-seen timestamp)
maintained across micro-batches with an idle-timeout that finalizes and
emits a user's profile when they go quiet.

State is a single fixed-width row per key (count, sum, last_ts) — the
shape that scales: state size is O(active keys), independent of event
volume, and the per-batch work is an Arrow-batched pandas reduction.
"""

from __future__ import annotations

import datetime as dt

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id bigint, n_events bigint, sum_value double, last_ts timestamp, finalized boolean"
)
STATE_SCHEMA = "n_events bigint, sum_value double, last_ts_micros bigint"


def _make_update(idle_timeout_ms: int | None):
    def _update(key, pdf_iter, state: GroupState):
        (user_id,) = key
        n, total, last_micros = state.get if state.exists else (0, 0.0, 0)

        if state.hasTimedOut:
            state.remove()
            yield pd.DataFrame(
                [{
                    "user_id": user_id,
                    "n_events": n,
                    "sum_value": float(total),
                    "last_ts": pd.Timestamp(last_micros, unit="us"),
                    "finalized": True,
                }]
            )
            return

        for pdf in pdf_iter:
            n += len(pdf)
            total += float(pdf["value"].sum())
            batch_last = pdf["ts"].max()
            last_micros = max(last_micros, int(pd.Timestamp(batch_last).value // 1000))

        state.update((n, float(total), last_micros))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            [{
                "user_id": user_id,
                "n_events": n,
                "sum_value": float(total),
                "last_ts": pd.Timestamp(last_micros, unit="us"),
                "finalized": False,
            }]
        )

    return _update


def running_user_profile(events: DataFrame, idle_timeout_ms: int | None = None) -> DataFrame:
    """events(user_id, ts, value, ...) stream → per-user running profile,
    emitted each micro-batch.

    With ``idle_timeout_ms`` set, a quiet user's profile is finalized and
    state dropped after that much processing-time idle — note the engine
    then keeps scheduling empty state-cleanup batches, so a test harness
    must poll rather than ``processAllAvailable()`` (which never returns
    while timeout work is pending)."""
    timeout = (
        GroupStateTimeout.NoTimeout if idle_timeout_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_update(idle_timeout_ms),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=timeout,
        )
    )


# ---------------------------------------------------------------------------
# Streaming AS-OF join (the temporal-join face of operators/asof_join.py).
#
# Batch as-of is one union+window pass; under a stream neither side is
# complete, so the operator becomes stateful: per key, remember enough
# clicks to answer "latest click at-or-before ts" for any purchase the
# watermark hasn't sealed yet, and emit each purchase exactly once, when
# the watermark guarantees no earlier click can still arrive.
#
# State is BOUNDED by the watermark lag, not the stream: clicks at or
# below the watermark can only ever be beaten by a later click for the
# purchases that remain (all of which sit above the watermark), so they
# collapse into ONE (ts, id) register; only in-flight rows — clicks and
# purchases above the watermark — are buffered. Finalization rides
# EventTimeTimeout: the key times out when the watermark passes its
# earliest pending purchase, so emission needs no new data for the key
# (Spark's no-data batches deliver the timeout).
# ---------------------------------------------------------------------------

ASOF_OUTPUT_SCHEMA = (
    "user_id bigint, purchase_id bigint, purchase_ts timestamp, "
    "matched_ts timestamp, matched_id bigint, lag_seconds double"
)
ASOF_STATE_SCHEMA = (
    "last_click_ts bigint, last_click_id bigint, "
    "click_ts array<bigint>, click_id array<bigint>, "
    "purch_ts array<bigint>, purch_id array<bigint>"
)


# "no sealed click yet" sentinel for the register: far below any real
# epoch-microsecond value (|real ts| ~ 1e15), INCLUDING pre-1970
# negative timestamps — a -1 sentinel would swallow any click before
# 1970 since every such ts compares below it.
_NO_TS = -(1 << 62)


def _asof_update(key, pdf_iter, state: GroupState):
    (user_id,) = key
    if state.exists:
        lct, lci, cts, cis, pts, pis = state.get
        cts, cis, pts, pis = list(cts), list(cis), list(pts), list(pis)
    else:
        lct, lci, cts, cis, pts, pis = _NO_TS, -1, [], [], [], []

    if not state.hasTimedOut:
        for pdf in pdf_iter:
            for ts, kind, eid in zip(pdf["ts"], pdf["kind"], pdf["event_id"]):
                us = int(pd.Timestamp(ts).value // 1000)
                if kind == "click":
                    cts.append(us)
                    cis.append(int(eid))
                else:
                    pts.append(us)
                    pis.append(int(eid))

    wm_us = state.getCurrentWatermarkMs() * 1000

    # Finalize sealed purchases (ts <= watermark): every click at-or-
    # before such a purchase has either arrived or is late beyond the
    # watermark contract. Deterministic under right-ts ties: greater id
    # wins, matching the batch arm's max(event_id) pre-aggregation.
    out = []
    sealed = sorted(
        (i for i in range(len(pts)) if pts[i] <= wm_us),
        key=lambda i: (pts[i], pis[i]),
    )
    for i in sealed:
        best_ts, best_id = lct, lci
        for ct, ci in zip(cts, cis):
            if ct <= pts[i] and (ct > best_ts or (ct == best_ts and ci > best_id)):
                best_ts, best_id = ct, ci
        hit = best_ts > _NO_TS
        out.append(
            {
                "user_id": user_id,
                "purchase_id": pis[i],
                "purchase_ts": pd.Timestamp(pts[i], unit="us"),
                "matched_ts": pd.Timestamp(best_ts, unit="us") if hit else pd.NaT,
                "matched_id": best_id if hit else None,
                "lag_seconds": round((pts[i] - best_ts) / 1e6, 6) if hit else None,
            }
        )
    if sealed:
        keep = [i for i in range(len(pts)) if pts[i] > wm_us]
        pts, pis = [pts[i] for i in keep], [pis[i] for i in keep]

    # Collapse clicks at-or-below the watermark into the single register:
    # the purchases that remain all sit above the watermark, so among
    # these clicks only the latest can ever win.
    keep_c, keep_i = [], []
    for ct, ci in zip(cts, cis):
        if ct <= wm_us:
            if ct > lct or (ct == lct and ci > lci):
                lct, lci = ct, ci
        else:
            keep_c.append(ct)
            keep_i.append(ci)
    cts, cis = keep_c, keep_i

    state.update((lct, lci, cts, cis, pts, pis))
    if pts:
        # fire when the watermark passes the earliest pending purchase
        # (must be strictly above the current watermark to be accepted)
        state.setTimeoutTimestamp(max(min(pts) // 1000, state.getCurrentWatermarkMs() + 1))
    if out:
        yield pd.DataFrame(out)


def stream_asof(events: DataFrame) -> DataFrame:
    """Streaming as-of join over the events stream: each purchase emitted
    exactly once — when the watermark seals it — with the latest same-user
    click at-or-before it, equal to the batch ev01 'asof' arm
    (tests/test_streaming.py proves it). ``events`` must carry a
    watermark on ``ts`` (LTZ) wide enough for the source's disorder.

    Epoch floor: Spark clamps the watermark at epoch 0 and drops
    stateful-operator input rows below the watermark, so PRE-1970 event
    times never reach this operator (pinned in
    tests/test_streaming.py::test_stream_asof_pre_epoch_click); the
    batch operator has no such floor.

    Watermark-advance gotcha: Catalyst pushes this function's
    ``event_type`` filter BELOW the upstream watermark node, so only
    rows that SURVIVE the filter advance the watermark — a stream whose
    tail is all non-purchase/click traffic stalls sealing until the next
    click/purchase arrives (an at-scale liveness property, not a
    correctness one)."""
    tagged = events.where(F.col("event_type").isin("purchase", "click")).select(
        "user_id", "ts", F.col("event_type").alias("kind"), "event_id"
    )
    return tagged.groupBy("user_id").applyInPandasWithState(
        _asof_update,
        outputStructType=ASOF_OUTPUT_SCHEMA,
        stateStructType=ASOF_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


# --- bounded-state streaming heavy hitters (Misra-Gries) ---------------------
#
# Exact streaming top-k needs one counter per distinct value — unbounded
# state. The Misra-Gries summary keeps AT MOST `capacity` counters per
# key and guarantees (a) any value with true count > n/(capacity+1)
# is present, and (b) est_count <= true_count <= est_count +
# n/(capacity+1) — the classic bounded-state heavy-hitter contract, and
# the shape a 100 TB stream needs (state is O(keys x capacity),
# independent of stream length). Ingestion order is pinned (each
# micro-batch sorted by (ts, event_id) before the fold) so the summary
# is DETERMINISTIC given the batch sequence; the equivalence test folds
# the same order in pure python and demands exact counter equality, and
# separately audits both error bounds against exact counts.

TOPK_OUTPUT_SCHEMA = "event_type string, user_id bigint, est_count bigint, n_seen bigint"
TOPK_STATE_SCHEMA = "users array<bigint>, counts array<bigint>, n_seen bigint"


def _topk_update_factory(capacity: int):
    def _update(key, pdf_iter, state: GroupState):
        (event_type,) = key
        if state.exists:
            users, counts, n_seen = state.get
            ctr = {int(u): int(c) for u, c in zip(users, counts)}
        else:
            ctr, n_seen = {}, 0
        frames = list(pdf_iter)
        if frames:
            batch = pd.concat(frames).sort_values(["ts", "event_id"])
            for uid in (int(u) for u in batch["user_id"].tolist()):
                n_seen += 1
                if uid in ctr:
                    ctr[uid] += 1
                elif len(ctr) < capacity:
                    ctr[uid] = 1
                else:
                    # decrement-all; drop zeros; the new item is NOT added
                    ctr = {u: c - 1 for u, c in ctr.items() if c > 1}
        us = sorted(ctr)
        state.update((us, [ctr[u] for u in us], int(n_seen)))
        yield pd.DataFrame(
            {
                "event_type": [event_type] * len(us),
                "user_id": us,
                "est_count": [ctr[u] for u in us],
                "n_seen": [int(n_seen)] * len(us),
            }
        )

    return _update


def stream_topk_mg(events: DataFrame, capacity: int = 8) -> DataFrame:
    """Per event_type, a Misra-Gries heavy-hitter summary of user_ids
    maintained across micro-batches; each invocation emits the key's
    full current summary (<= capacity rows) stamped with n_seen, so a
    consumer takes the max-n_seen emission as the latest."""
    return events.groupBy("event_type").applyInPandasWithState(
        _topk_update_factory(capacity),
        TOPK_OUTPUT_SCHEMA,
        TOPK_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


def misra_gries_py(values, capacity: int) -> dict:
    """Pure-python fold of the same summary (the tests' reference)."""
    ctr: dict = {}
    for v in values:
        if v in ctr:
            ctr[v] += 1
        elif len(ctr) < capacity:
            ctr[v] = 1
        else:
            ctr = {u: c - 1 for u, c in ctr.items() if c > 1}
    return ctr
