"""Sessionization operators.

Two distinct semantics from the reference:

1. ``sessionize`` — standard gap-based sessionization (lag + running sum of
   gap-exceeded flags). This is the general-purpose, SQL-expressible form
   used for the events table and for the epoch band-join dimension.

2. ``find_epochs_pairwise`` — the reference's quirky *pairwise* epoch merge
   (wfc3_cte_monitor/uvis_external_cte_plots.py:2173-2212): over the sorted
   distinct observation dates, if the NEXT date is < ``gap`` days away the
   two are replaced by their rounded mean and BOTH are consumed (the scan
   then moves past the pair — merges never chain transitively). We keep
   that exact behavior for parity, implemented distributively per group:
   within each group the date list is small (distinct observation epochs),
   so the pairwise walk runs as a grouped pandas UDF while the heavy
   distinct happens in Spark.
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd

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
    transitive chaining). Returns (group_cols..., epoch double).

    The distinct is distributed; the walk itself is O(#epochs-per-group)
    (tens of rows) inside applyInPandas.
    """
    distinct = df.select(*group_cols, F.col(date_col).cast("double").alias("_d")).distinct()

    out_fields = ", ".join(f"{c} string" for c in group_cols)  # refined below
    # Preserve the group-key dtypes by pulling them from the input schema.
    in_schema = {f.name: f.dataType.simpleString() for f in distinct.schema.fields}
    out_fields = ", ".join(f"{c} {in_schema[c]}" for c in group_cols)
    schema = f"{out_fields}, epoch double" if group_cols else "epoch double"

    def walk(pdf: pd.DataFrame) -> pd.DataFrame:
        dates = sorted(pdf["_d"].tolist())
        epochs: list[float] = []
        i = 0
        while i < len(dates):
            if i + 1 < len(dates) and (dates[i + 1] - dates[i]) < gap:
                epochs.append(float(round((dates[i] + dates[i + 1]) / 2.0)))
                i += 2
            else:
                epochs.append(float(dates[i]))
                i += 1
        base = {c: [pdf[c].iloc[0]] * len(epochs) for c in group_cols}
        base["epoch"] = epochs
        return pd.DataFrame(base)

    if group_cols:
        return distinct.groupBy(*group_cols).applyInPandas(walk, schema=schema)
    return distinct.groupBy(F.lit(1).alias("_g")).applyInPandas(
        lambda pdf: walk(pdf).assign(_g=1), schema="_g int, epoch double"
    ).drop("_g")
