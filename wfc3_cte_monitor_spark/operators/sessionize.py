"""Sessionization operators.

Two distinct semantics from the reference:

1. ``sessionize`` — standard gap-based sessionization (lag + running sum of
   gap-exceeded flags). This is the general-purpose, SQL-expressible form
   used for the events table and for the epoch band-join dimension.

2. ``find_epochs_pairwise`` — the reference's quirky *pairwise* epoch merge
   (wfc3_cte_monitor/uvis_external_cte_plots.py:2173-2212): over the sorted
   distinct observation dates, if the NEXT date is < ``gap`` days away the
   two are replaced by their rounded mean and BOTH are consumed (the scan
   then moves past the pair — merges never chain transitively).

   The sequential walk has a closed window-function form. Split the sorted
   dates into *clusters* at every gap >= threshold; within a cluster every
   adjacent gap is < threshold, so the greedy scan always sees a mergeable
   neighbor and simply pairs positions (1,2), (3,4), ... with an odd
   leftover emitted unmerged. That makes the operator pure codegen (two
   window passes + one aggregation) — no Python, no per-group walk — and
   gives it an exact ANSI-SQL twin (``find_epochs_sql``). Equivalence to
   the reference's imperative scan is property-tested against a literal
   re-implementation of the walk (tests/test_scale_ops.py).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    ts_col: str,
    group_cols: Sequence[str],
    gap: Column | float,
    gap_expr: Column | None = None,
) -> DataFrame:
    """Assign ``session_id`` (1-based per group) by splitting whenever the
    gap to the previous row meets/exceeds ``gap``.

    ``gap_expr`` customizes the gap metric; default is the difference of
    ``ts_col`` cast to double seconds (works for timestamps and numerics).
    One shuffle on ``group_cols``; both window functions share the same
    partitioning/ordering so they pipeline into a single sort.
    """
    w = Window.partitionBy(*group_cols).orderBy(ts_col)
    if gap_expr is None:
        dt = dict(df.dtypes).get(ts_col, "")
        # TIMESTAMP_NTZ has no direct double cast; hop through ltz (session
        # timezone is pinned UTC by session.prepare, so the hop is exact)
        secs = (
            F.col(ts_col).cast("timestamp").cast("double")
            if dt.startswith("timestamp")
            else F.col(ts_col).cast("double")
        )
        gap_expr = secs - F.lag(secs).over(w)
    prev = F.lag(ts_col).over(w)
    is_new = F.when(prev.isNull() | (gap_expr >= gap), 1).otherwise(0)
    return df.withColumn(
        "session_id",
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("bigint"),
    )


def sessionize_sql(source: str, ts_col: str, group_cols: Sequence[str], gap_seconds: float) -> str:
    """DuckDB twin of :func:`sessionize` (timestamp gap in seconds)."""
    part = ", ".join(group_cols)
    return f"""
    SELECT * EXCLUDE (_is_new),
           sum(_is_new) OVER (PARTITION BY {part} ORDER BY {ts_col}
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
    FROM (
        SELECT *,
               CASE WHEN lag({ts_col}) OVER (PARTITION BY {part} ORDER BY {ts_col}) IS NULL
                         OR epoch({ts_col}) - epoch(lag({ts_col}) OVER (PARTITION BY {part} ORDER BY {ts_col}))
                            >= {gap_seconds}
                    THEN 1 ELSE 0 END AS _is_new
        FROM ({source})
    )
    """


def find_epochs_pairwise(
    df: DataFrame,
    date_col: str,
    group_cols: Sequence[str],
    gap: float = 30.0,
) -> DataFrame:
    """Reference-parity epoch finder: per group, sorted distinct dates with
    adjacent dates < ``gap`` apart merged PAIRWISE to ``round(mean)``
    (uvis_external_cte_plots.py:2196-2209 — consumes two at a time, no
    transitive chaining; the rounded mean is Python ``round`` = half-even,
    hence ``bround``). Returns (group_cols..., epoch double).

    Closed form (see module docstring): cluster at gaps >= threshold, then
    pair positions within each cluster two at a time. Both window columns
    share one (partition, order) spec → a single shuffle + sort; the
    pair aggregation is a cheap second shuffle over the already-tiny
    distinct-date set.

    ``group_cols`` is required: a global (ungrouped) ordering would funnel
    the whole date set through one partition — the reference only ever
    epochs per target, so the global form is disallowed rather than left
    as a scale trap.
    """
    if not group_cols:
        raise ValueError(
            "find_epochs_pairwise requires group_cols: a global pairwise "
            "walk needs a total order (single-partition sort) and does not "
            "scale; epoch per target/group instead."
        )
    distinct = df.select(*group_cols, F.col(date_col).cast("double").alias("_d")).distinct()

    w = Window.partitionBy(*group_cols).orderBy("_d")
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    far = F.when(
        F.lag("_d").over(w).isNull() | ((F.col("_d") - F.lag("_d").over(w)) >= gap), 1
    )
    marked = distinct.select(
        *group_cols,
        "_d",
        F.row_number().over(w).alias("_rn"),
        # far is 1 at each cluster's first row, NULL inside → running max
        # of (far * rn) is the current cluster's starting row number.
        F.max(far * F.row_number().over(w)).over(run).alias("_cstart"),
    )
    pairs = marked.groupBy(
        *group_cols,
        F.col("_cstart"),
        F.floor((F.col("_rn") - F.col("_cstart")) / 2).alias("_pair"),
    ).agg(
        F.count(F.lit(1)).alias("_n"),
        F.min("_d").alias("_lo"),
        F.sum("_d").alias("_sum"),
    )
    return pairs.select(
        *group_cols,
        F.when(F.col("_n") == 2, F.bround(F.col("_sum") / 2.0))
        .otherwise(F.col("_lo"))
        .alias("epoch"),
    )


def find_epochs_sql(source: str, date_col: str, group_cols: Sequence[str], gap: float = 30.0) -> str:
    """DuckDB twin of :func:`find_epochs_pairwise` (``round_even`` is
    DuckDB's half-even round, matching Spark's ``bround`` / Python's
    ``round``)."""
    g = ", ".join(group_cols)
    part = f"PARTITION BY {g} " if group_cols else ""
    return f"""
    SELECT {g}{', ' if g else ''}
           CASE WHEN count(*) = 2 THEN round_even(sum(_d) / 2.0, 0)
                ELSE min(_d) END AS epoch
    FROM (
        SELECT *, max(_far * _rn) OVER ({part}ORDER BY _d
                                        ROWS UNBOUNDED PRECEDING) AS _cstart
        FROM (
            SELECT *,
                   row_number() OVER ({part}ORDER BY _d) AS _rn,
                   CASE WHEN lag(_d) OVER ({part}ORDER BY _d) IS NULL
                             OR _d - lag(_d) OVER ({part}ORDER BY _d) >= {gap}
                        THEN 1 END AS _far
            FROM (SELECT DISTINCT {g}{', ' if g else ''}
                         CAST({date_col} AS DOUBLE) AS _d FROM ({source}))
        )
    )
    GROUP BY {g}{', ' if g else ''}_cstart, (_rn - _cstart) // 2
    """
