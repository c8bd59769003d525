"""Unit tests for the as-of join (operators/asof_join.py) and SCD2
history tracking (operators/upsert.scd2) — the ev01 'asof' and s07
'scd2' arms gate the same operators against DuckDB end-to-end; here the
semantics are pinned on hand-built frames where the right answer is
known by inspection: inclusive boundaries, unmatched-left NULLs,
forward direction, tolerance cutoffs, NULL-payload atomicity, version
interval closing."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from wfc3_cte_monitor_spark.operators.asof_join import asof_join
from wfc3_cte_monitor_spark.operators.upsert import scd2


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00"), "p1"),
            (1, _ts("2024-01-01T09:00:00"), "p2"),  # exactly on a right ts
            (1, _ts("2024-01-01T08:00:00"), "p3"),  # before any right row
            (2, _ts("2024-01-01T12:00:00"), "p4"),  # key with no right rows
        ],
        schema="uid int, ts timestamp, pid string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T09:00:00"), 7, 1.5),
            (1, _ts("2024-01-01T09:30:00"), 8, None),  # NULL payload value
            (3, _ts("2024-01-01T05:00:00"), 9, 2.0),
        ],
        schema="uid int, ts timestamp, cid int, score double",
    )
    return left, right


def test_asof_backward_inclusive_and_unmatched(spark):
    left, right = _frames(spark)
    out = {
        r["pid"]: r
        for r in asof_join(left, right, on=["uid"], left_ts="ts", right_ts="ts").collect()
    }
    assert len(out) == 4
    # p1 at 10:00 → latest right is 09:30 (cid 8), whose score is NULL —
    # the struct fill must NOT stitch in 09:00's score (atomicity).
    assert out["p1"]["cid"] == 8 and out["p1"]["score"] is None
    assert out["p1"]["asof_matched_ts"] == _ts("2024-01-01T09:30:00")
    # p2 at exactly 09:00 → inclusive boundary matches cid 7
    assert out["p2"]["cid"] == 7 and out["p2"]["score"] == 1.5
    # p3 predates all right rows; p4's key has none — NULLs throughout
    for pid in ("p3", "p4"):
        assert out[pid]["cid"] is None
        assert out[pid]["asof_matched_ts"] is None


def test_asof_forward(spark):
    left, right = _frames(spark)
    out = {
        r["pid"]: r
        for r in asof_join(
            left, right, on=["uid"], left_ts="ts", right_ts="ts", direction="forward"
        ).collect()
    }
    assert out["p3"]["cid"] == 7  # earliest right at-or-after 08:00
    assert out["p2"]["cid"] == 7  # inclusive at 09:00
    assert out["p1"]["cid"] is None  # nothing after 10:00
    assert out["p4"]["cid"] is None


def test_asof_tolerance(spark):
    left, right = _frames(spark)
    out = {
        r["pid"]: r
        for r in asof_join(
            left,
            right,
            on=["uid"],
            left_ts="ts",
            right_ts="ts",
            tolerance=F.expr("INTERVAL 10 MINUTES"),
        ).collect()
    }
    # p1's nearest right row is 30 min back → beyond tolerance → NULLed
    assert out["p1"]["cid"] is None and out["p1"]["asof_matched_ts"] is None
    # p2's match is exact (0 min) → kept
    assert out["p2"]["cid"] == 7


def test_asof_payload_collision_raises(spark):
    left, right = _frames(spark)
    try:
        asof_join(
            left.withColumnRenamed("pid", "cid"), right,
            on=["uid"], left_ts="ts", right_ts="ts",
        )
    except ValueError as e:
        assert "collide" in str(e)
    else:
        raise AssertionError("expected ValueError on payload collision")


def test_scd2_intervals(spark):
    snaps = spark.createDataFrame(
        [
            ("a", 1, 10.0),
            ("a", 2, 11.0),
            ("a", 3, 12.0),
            ("b", 1, 20.0),
        ],
        schema="k string, version int, v double",
    )
    rows = {
        (r["k"], r["version"]): r
        for r in scd2(snaps, keys=["k"], version_col="version").collect()
    }
    assert rows[("a", 1)]["valid_to"] == 2 and not rows[("a", 1)]["is_current"]
    assert rows[("a", 2)]["valid_to"] == 3 and not rows[("a", 2)]["is_current"]
    assert rows[("a", 3)]["valid_to"] is None and rows[("a", 3)]["is_current"]
    assert rows[("b", 1)]["valid_to"] is None and rows[("b", 1)]["is_current"]
    # history is lossless: every input version survives
    assert len(rows) == 4


def test_asof_single_exchange_plan(spark):
    """The scalable property itself: the as-of plan contains exactly one
    hash exchange (the key shuffle) and no nested-loop join."""
    left, right = _frames(spark)
    plan = (
        asof_join(left, right, on=["uid"], left_ts="ts", right_ts="ts")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    n_exchange = plan.count("Exchange hashpartitioning")
    assert n_exchange == 1, plan


def test_asof_null_right_ts_dropped(spark):
    """A NULL-timestamp right row can never satisfy any as-of inequality
    (DuckDB ASOF agrees); it must be dropped, not smuggled into a
    NULL-matched_ts row that looks unmatched but carries payload."""
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:00:00"), "p1")], "uid int, ts timestamp, pid string"
    )
    right = spark.createDataFrame(
        [(1, None, 7, 1.5), (1, _ts("2024-01-01T09:00:00"), 8, 2.0)],
        "uid int, ts timestamp, cid int, score double",
    )
    for direction in ("backward", "forward"):
        rows = asof_join(
            left, right, on=["uid"], left_ts="ts", right_ts="ts", direction=direction
        ).collect()
        assert len(rows) == 1
        r = rows[0]
        if direction == "backward":
            assert r["cid"] == 8 and r["asof_matched_ts"] is not None
        else:
            assert r["cid"] is None and r["asof_matched_ts"] is None
            # NULL-ts payload must not leak into the "unmatched" row
            assert r["score"] is None


def test_asof_null_left_ts_unmatched_all_directions(spark):
    """A NULL *left* timestamp satisfies no as-of inequality either —
    DuckDB ASOF leaves the row unmatched. Without an explicit guard the
    forward/nearest desc NULLS-LAST sort would hand it the earliest
    right payload."""
    left = spark.createDataFrame(
        [(1, None, "pnull"), (1, _ts("2024-01-01T10:00:00"), "p1")],
        "uid int, ts timestamp, pid string",
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01T09:00:00"), 7, 1.5)],
        "uid int, ts timestamp, cid int, score double",
    )
    for direction in ("backward", "forward", "nearest"):
        out = {
            r["pid"]: r
            for r in asof_join(
                left, right, on=["uid"], left_ts="ts", right_ts="ts",
                direction=direction,
            ).collect()
        }
        assert len(out) == 2  # the NULL-ts left row survives (left-outer)
        r = out["pnull"]
        assert r["cid"] is None and r["score"] is None
        assert r["asof_matched_ts"] is None, direction


def test_asof_working_name_collision_raises(spark):
    left, right = _frames(spark)
    for bad in ("_asof_ts", "_asof_side", "_asof_match"):
        try:
            asof_join(
                left.withColumn(bad, F.lit(1)), right,
                on=["uid"], left_ts="ts", right_ts="ts",
            )
        except ValueError as e:
            assert "working names" in str(e)
        else:
            raise AssertionError(f"expected ValueError for left column {bad}")
    # _mb/_mf only clash under direction='nearest'
    asof_join(
        left, right.withColumn("_mb", F.lit(1)).drop("_mb"),
        on=["uid"], left_ts="ts", right_ts="ts",
    )  # sanity: clean frames still fine
    try:
        asof_join(
            left, right.withColumn("_mf", F.lit(1)),
            on=["uid"], left_ts="ts", right_ts="ts", direction="nearest",
        )
    except ValueError as e:
        assert "_mf" in str(e)
    else:
        raise AssertionError("expected ValueError for right column _mf")


def test_asof_nearest(spark):
    left, right = _frames(spark)
    out = {
        r["pid"]: r
        for r in asof_join(
            left, right, on=["uid"], left_ts="ts", right_ts="ts", direction="nearest"
        ).collect()
    }
    assert out["p1"]["cid"] == 8    # 09:30 (30 min back) vs nothing forward
    assert out["p2"]["cid"] == 7    # exact hit, gap 0 both ways -> backward
    assert out["p3"]["cid"] == 7    # 09:00 forward (60 min) vs nothing back
    assert out["p4"]["cid"] is None

    # still ONE exchange: both direction fills share the key shuffle
    plan = (
        asof_join(left, right, on=["uid"], left_ts="ts", right_ts="ts",
                  direction="nearest")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_asof_nearest_tolerance(spark):
    left, right = _frames(spark)
    out = {
        r["pid"]: r["cid"]
        for r in asof_join(
            left, right, on=["uid"], left_ts="ts", right_ts="ts",
            direction="nearest", tolerance=F.expr("INTERVAL 45 MINUTES"),
        ).collect()
    }
    assert out["p1"] == 8      # 30 min gap within tolerance
    assert out["p3"] is None   # 60 min forward gap beyond tolerance
