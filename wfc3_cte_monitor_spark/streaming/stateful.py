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
