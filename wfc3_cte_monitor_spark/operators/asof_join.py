"""As-of (temporal nearest-predecessor) join.

The reference's coefficient retrieval picks "the slope set in effect at
an exposure's date" by sorting coeff epochs and scanning for the last one
at-or-before the observation (wfc3_cte_monitor/run_outputs.py:70-419
re-reads the freshest coeff table per increment; the epoch-band join J7
is the ±band variant of the same association). The general operator — for
each left row, the single latest right row with right_ts <= left_ts per
key — is an AS-OF JOIN. Spark has no native one; the naive encoding
(range join + row_number) plans as a BroadcastNestedLoopJoin or an
exploded range join, O(|L|·|R|) per key.

Spark-first shape (the scalable one): UNION the two sides tagged, ONE
shuffle on the key, sort within the partition by (ts, side), and carry
the right payload forward as a single packed struct with
``last(struct, ignorenulls=True)`` over an unbounded-preceding running
window — each left row then holds exactly the latest at-or-before right
row, atomically (a per-column fill could stitch together different right
rows when a payload value is legitimately NULL). Cost is a single hash
exchange plus a partition-local sort on both inputs combined,
independent of how many right rows precede each left row (the range-join
encoding pays for all of them). At 100 TB both sides shuffle by the same
key once; no broadcast, no fan-out, skew handled by AQE like any other
wide sort.

DuckDB implements ASOF JOIN natively, which gives the driver gate a
genuinely independent oracle for the operator (plans/window_queries.py
'asof' arm).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_TS = "_asof_ts"
_SIDE = "_asof_side"
_M = "_asof_match"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    direction: str = "backward",
    tolerance: Column | None = None,
) -> DataFrame:
    """For each ``left`` row, attach the single nearest ``right`` row per
    ``on`` key: latest ``right_ts`` <= ``left_ts`` (``backward``,
    inclusive), earliest ``right_ts`` >= ``left_ts`` (``forward``), or
    whichever of the two is closer (``nearest``, ties to backward —
    still ONE shuffle: both fills share the key exchange).

    Unmatched left rows keep NULL right columns (left-outer semantics,
    matching DuckDB ``ASOF LEFT JOIN``). The matched right timestamp is
    returned as ``asof_matched_ts``; ``tolerance`` (a Column comparable
    to ``left_ts - right_ts``) NULLs out matches farther than the bound,
    mirroring pandas ``merge_asof``.

    Determinism: ``right`` must be unique per (key, right_ts) — ties
    among right rows at one timestamp make every as-of definition
    ambiguous (DuckDB included); pre-aggregate to one row per (key, ts)
    first. Left duplicates are fine. NULL right timestamps are dropped
    here (enforced, not just documented): no as-of inequality can ever
    hold for them — DuckDB's ASOF agrees — and left in, the backward
    sort (NULLs first) would smuggle their payload into a
    NULL-``asof_matched_ts`` row that looks unmatched but carries data.
    NULL *left* timestamps come back unmatched (NULL right columns) in
    every direction, for the same reason.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction!r}"
        )
    on = list(on)
    right = right.where(F.col(right_ts).isNotNull())
    r_types = dict(right.dtypes)
    payload = [c for c in right.columns if c not in on and c != right_ts]
    overlap = (set(payload) | {"asof_matched_ts"}) & set(left.columns)
    if overlap:
        raise ValueError(f"right payload columns collide with left: {sorted(overlap)}")
    internal = {_TS, _SIDE, _M} | ({"_mb", "_mf"} if direction == "nearest" else set())
    taken = internal & (set(left.columns) | set(right.columns))
    if taken:
        raise ValueError(
            f"input columns collide with asof_join working names: {sorted(taken)}"
        )

    match_schema = "struct<" + ",".join(
        [f"ts:{r_types[right_ts]}"] + [f"{c}:{r_types[c]}" for c in payload]
    ) + ">"
    null_match = F.lit(None).cast(match_schema)

    l_tag = left.select(
        *on,
        F.col(left_ts).alias(_TS),
        F.lit(1).alias(_SIDE),
        null_match.alias(_M),
        *[F.col(c) for c in left.columns if c not in on],
    )
    r_match = F.struct(
        F.col(right_ts).alias("ts"), *[F.col(c).alias(c) for c in payload]
    ).cast(match_schema)
    l_types = dict(left.dtypes)
    r_tag = right.select(
        *on,
        F.col(right_ts).alias(_TS),
        F.lit(0).alias(_SIDE),
        r_match.alias(_M),
        *[F.lit(None).cast(l_types[c]).alias(c) for c in left.columns if c not in on],
    )
    unioned = l_tag.unionByName(r_tag)

    # Right rows sort BEFORE left rows at an equal timestamp (side 0 < 1)
    # in both directions, so the boundary is inclusive — ts == left_ts
    # matches, like DuckDB's >= / <= ASOF inequality.
    def _fill(asc: bool) -> Column:
        order = F.col(_TS).asc() if asc else F.col(_TS).desc()
        w = (
            Window.partitionBy(*on)
            .orderBy(order, F.col(_SIDE).asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return F.last(_M, ignorenulls=True).over(w)

    if direction == "nearest":
        # both fills ride the SAME key exchange (two sorts, one shuffle);
        # per row the smaller absolute gap wins, ties to backward
        # (pandas merge_asof ties are version-dependent; callers needing
        # the other tie rule pick a direction explicitly)
        filled = unioned.withColumn("_mb", _fill(True)).withColumn("_mf", _fill(False))
        gap_b = F.col(_TS) - F.col("_mb")["ts"]
        gap_f = F.col("_mf")["ts"] - F.col(_TS)
        pick = (
            F.when(F.col("_mb").isNull(), F.col("_mf"))
            .when(F.col("_mf").isNull(), F.col("_mb"))
            .when(gap_f < gap_b, F.col("_mf"))
            .otherwise(F.col("_mb"))
        )
        filled = filled.withColumn(_M, pick).drop("_mb", "_mf")
    else:
        filled = unioned.withColumn(_M, _fill(direction == "backward"))

    out = filled.where(F.col(_SIDE) == 1)
    match = F.col(_M)
    if tolerance is not None:
        if direction == "nearest":
            gap = F.greatest(
                F.col(_TS) - match["ts"], match["ts"] - F.col(_TS)
            )  # |gap| for either side
        else:
            gap = (
                F.col(_TS) - match["ts"]
                if direction == "backward"
                else match["ts"] - F.col(_TS)
            )
        match = F.when(match.isNotNull() & (gap <= tolerance), F.col(_M))
    # A NULL left timestamp satisfies no as-of inequality in ANY direction
    # (DuckDB ASOF leaves such rows unmatched). backward's asc NULLS-FIRST
    # sort already yields NULL, but forward/nearest sort desc NULLS-LAST,
    # where the running fill would hand the row the earliest right payload
    # — guard explicitly so all three directions agree.
    match = F.when(F.col(_TS).isNotNull(), match)
    return out.select(
        *on,
        F.col(_TS).alias(left_ts),
        *[F.col(c) for c in left.columns if c not in on and c != left_ts],
        match["ts"].alias("asof_matched_ts"),
        *[match[c].alias(c) for c in payload],
    )
