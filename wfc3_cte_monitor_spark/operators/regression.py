"""Per-group ordinary-least-squares regression as closed-form aggregates.

Reference semantics: ``scipy.stats.linregress(x, y)`` per (image-pair,
fluxbin) group — slope, intercept, stderr; the pipeline stores
``stddev = stderr * sqrt(n)`` (wfc3_cte_monitor/uvis_external_cte_plots.py:189-196).

Spark-first: no UDF — slope/intercept/stderr are pure aggregate
expressions (covar_pop / var_pop / avg / count), one map-side-combinable
groupBy. This is the 100 TB-safe shape: a single shuffle on the group
keys, no per-group collect.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def linregress_agg(
    df: DataFrame,
    x: str,
    y: str,
    group_cols: Sequence[str],
    round_to: int | None = 6,
) -> DataFrame:
    """GroupBy ``group_cols`` and fit y = slope*x + intercept per group.

    Output columns: group_cols + (slope, intercept, stderr, slopestdev,
    num_points). Groups with n <= 2 or zero x-variance yield NULL stats
    (the reference writes slope=0/n=0 for *empty* bins — that fill happens
    at the bin fan-out layer, not here).
    """
    xc, yc = F.col(x), F.col(y)
    agged = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("num_points"),
        F.covar_pop(xc, yc).alias("_cxy"),
        F.var_pop(xc).alias("_vx"),
        F.var_pop(yc).alias("_vy"),
        F.avg(xc).alias("_mx"),
        F.avg(yc).alias("_my"),
    )
    n = F.col("num_points")
    slope = F.col("_cxy") / F.col("_vx")
    intercept = F.col("_my") - slope * F.col("_mx")
    # stderr^2 = ( (Syy - slope*Sxy) / (n-2) ) / Sxx   with S** = n * pop-moment
    mse = (n * F.col("_vy") - slope * n * F.col("_cxy")) / (n - F.lit(2))
    stderr = F.sqrt(mse / (n * F.col("_vx")))
    valid = (n > 2) & (F.col("_vx") > 0)

    def _r(c):
        # + 0.0 folds a rounded -0.0 to 0.0 (Spark and DuckDB disagree on
        # the sign of zero after rounding a tiny negative)
        return (F.round(c, round_to) + F.lit(0.0)) if round_to is not None else c

    return agged.select(
        *group_cols,
        _r(F.when(valid, slope)).alias("slope"),
        _r(F.when(valid, intercept)).alias("intercept"),
        _r(F.when(valid, stderr)).alias("stderr"),
        _r(F.when(valid, stderr * F.sqrt(n))).alias("slopestdev"),
        n.cast("bigint").alias("num_points"),
    )


def linregress_sql(
    source: str,
    x: str,
    y: str,
    group_cols: Sequence[str],
    round_to: int = 6,
) -> str:
    """DuckDB oracle twin of :func:`linregress_agg` — identical formulas
    from the same population moments so fp noise stays below the rounding
    quantum."""
    g = ", ".join(group_cols)
    return f"""
    SELECT {g},
           round(CASE WHEN num_points > 2 AND _vx > 0 THEN _cxy / _vx END, {round_to}) + 0.0 AS slope,
           round(CASE WHEN num_points > 2 AND _vx > 0 THEN _my - (_cxy / _vx) * _mx END, {round_to}) + 0.0 AS intercept,
           round(CASE WHEN num_points > 2 AND _vx > 0 THEN
                 sqrt(((num_points * _vy - (_cxy / _vx) * num_points * _cxy) / (num_points - 2)) / (num_points * _vx))
             END, {round_to}) + 0.0 AS stderr,
           round(CASE WHEN num_points > 2 AND _vx > 0 THEN
                 sqrt(((num_points * _vy - (_cxy / _vx) * num_points * _cxy) / (num_points - 2)) / (num_points * _vx))
                 * sqrt(num_points)
             END, {round_to}) + 0.0 AS slopestdev,
           num_points
    FROM (
        SELECT {g},
               count(*)::BIGINT AS num_points,
               covar_pop({x}, {y}) AS _cxy,
               var_pop({x}) AS _vx,
               var_pop({y}) AS _vy,
               avg({x}) AS _mx,
               avg({y}) AS _my
        FROM ({source})
        GROUP BY {g}
    )
    """
