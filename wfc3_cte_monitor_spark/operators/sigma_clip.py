"""Iterative sigma-clipping as a declarative DataFrame transform.

Reference semantics: ``scipy.stats.sigmaclip(x, low=N, high=N)`` — keep
``mean - N*std <= x <= mean + N*std`` (INCLUSIVE bounds, population std;
scipy removes only points strictly outside, so a zero-variance group is
kept whole), recompute and repeat until fixpoint (reference: wfc3_cte_monitor/uvis_external_cte_plots.py:174-181
at 4 sigma, :713-716 at 1.3 sigma). For a distributed, oracle-expressible
operator we bound the iteration count (the reference data converges in <=3
passes); the oracle SQL unrolls the same number of passes.

Scale notes: the per-group mean/std are window aggregates over the group
keys — one hash-partition shuffle on the first iteration, after which the
partitioning is reused for subsequent iterations (the filter preserves the
exchange), so the whole clip is a single shuffle regardless of iteration
count. No collect, no UDF: everything stays in whole-stage codegen.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Shared engine+oracle bound for AGGRESSIVE (σ ≈ 1.3) clips, where even
# Gaussian groups keep shedding tail mass for dozens of passes before
# scipy's fixpoint (measured on the a09 data: 23/33/38 passes at
# sf0.001/0.01/0.1; growth is ~log n — ~+5 passes per 10× group size —
# so 64 covers group sizes orders of magnitude past the largest tested
# corpus). Extra passes beyond the fixpoint are identity filters, so a
# generous matched bound IS fixpoint semantics for any group converging
# within it. CRITICAL: the engine and the oracle must use THIS SAME
# bound (a true-fixpoint engine vs a bounded oracle would silently
# diverge on a group that converges past the bound). Convergence audit:
# tests/test_properties.py. Mild clips (σ = 4) converge in ≤3 passes on
# realistic near-Gaussian data.
SIGMA13_ITERS = 64


def sigma_clip(
    df: DataFrame,
    value_col: str | Column,
    group_cols: Sequence[str],
    sigma: float = 4.0,
    iterations: int = 3,
) -> DataFrame:
    """Return ``df`` with rows outside ``mean ± sigma*stddev_pop`` of their
    group removed, re-evaluated ``iterations`` times (fixed count for
    determinism; matches scipy's inclusive keep condition)."""
    value = F.col(value_col) if isinstance(value_col, str) else value_col
    w = Window.partitionBy(*group_cols)
    for _ in range(iterations):
        df = (
            df.withColumn("_mu", F.avg(value).over(w))
            .withColumn("_sd", F.stddev_pop(value).over(w))
            .where(
                (value >= F.col("_mu") - sigma * F.col("_sd"))
                & (value <= F.col("_mu") + sigma * F.col("_sd"))
            )
            .drop("_mu", "_sd")
        )
    return df


def sigma_clip_fixpoint(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str],
    sigma: float = 4.0,
    max_iters: int = 50,
) -> DataFrame:
    """Exact scipy-fixpoint semantics (iterate until no row is removed) as
    a grouped pandas UDF — the fallback SURVEY §7.3 names for groups where
    the bounded unrolling might not have converged. The declarative
    :func:`sigma_clip` is preferred (oracle-expressible, no Python); this
    variant exists for strict scipy.stats.sigmaclip parity
    (uvis_external_cte_plots.py:174-181)."""
    import pandas as pd

    schema = df.schema

    def clip(pdf: pd.DataFrame) -> pd.DataFrame:
        keep = pdf
        for _ in range(max_iters):
            v = keep[value_col].to_numpy(dtype=float)
            mu, sd = v.mean(), v.std()
            mask = (v >= mu - sigma * sd) & (v <= mu + sigma * sd)
            if mask.all():
                break
            keep = keep[mask]
            if keep.empty:
                break
        return keep

    return df.groupBy(*group_cols).applyInPandas(clip, schema=schema)


def sigma_clip_sql(
    source: str,
    value_col: str,
    group_cols: Sequence[str],
    sigma: float = 4.0,
    iterations: int = 3,
) -> str:
    """ANSI-SQL unrolling of :func:`sigma_clip` (for DuckDB oracles):
    one window-filter CTE per iteration over ``source`` (a table name or
    parenthesized subquery)."""
    part = ", ".join(group_cols)
    body = f"SELECT * FROM {source}"
    for i in range(iterations):
        body = f"""
        SELECT * FROM (
            SELECT *,
                   avg({value_col}) OVER (PARTITION BY {part}) AS _mu{i},
                   stddev_pop({value_col}) OVER (PARTITION BY {part}) AS _sd{i}
            FROM ({body})
        )
        WHERE {value_col} >= _mu{i} - {sigma} * _sd{i}
          AND {value_col} <= _mu{i} + {sigma} * _sd{i}
        """
    return body
