"""Phot/Results wide↔long layout transforms (A7 + the Results pivot).

Reference: the mag sidecar file is LONG (one row per source×radius); the
Phot table is WIDE (42 measurement columns, 3 per radius), produced by a
radius-walking loop (wfc3_cte_monitor/database_update.py:327-560, loop at
:443-478). Results is wide by flux bin (table_definitions/results.txt).

Spark-first: `groupBy().pivot(values=...)` with explicit pivot values
(no extra distinct pass) for long→wide; `stack` for wide→long. The long
view is the query-friendly layout — "select the flux column for aperture
r" becomes a filter — and at 100 TB it avoids reading 42 columns when one
is needed.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schemas import APERTURES, FLUXBIN_LABELS


def mag_long_to_phot_wide(mag: DataFrame, id_cols: Sequence[str]) -> DataFrame:
    """Long mag rows (id_cols..., radius, flux, mnbkgrd, totbkgrd) → wide
    Phot layout with flux_R/mnbkgrd_R/totbkgrd_R columns."""
    pivoted = (
        mag.groupBy(*id_cols)
        .pivot("radius", APERTURES)
        .agg(
            F.first("flux").alias("flux"),
            F.first("mnbkgrd").alias("mnbkgrd"),
            F.first("totbkgrd").alias("totbkgrd"),
        )
    )
    # Spark names pivoted columns "<value>_<alias>"; normalize to the
    # reference's "<alias>_<radius>" names.
    renames = {f"{r}_{m}": f"{m}_{r}" for r in APERTURES for m in ("flux", "mnbkgrd", "totbkgrd")}
    return pivoted.select(
        *id_cols,
        *[F.col(src).alias(dst) for src, dst in renames.items()],
    )


def phot_wide_to_long(phot: DataFrame, id_cols: Sequence[str]) -> DataFrame:
    """Wide Phot → long (id_cols..., radius, flux, mnbkgrd, totbkgrd) via a
    single `stack` projection (no shuffle)."""
    triples = ", ".join(
        f"{r}, flux_{r}, mnbkgrd_{r}, totbkgrd_{r}" for r in APERTURES
    )
    stack = f"stack({len(APERTURES)}, {triples}) AS (radius, flux, mnbkgrd, totbkgrd)"
    return phot.selectExpr(*id_cols, stack)


def results_long_to_wide(results_long: DataFrame, id_cols: Sequence[str]) -> DataFrame:
    """Long per-(pair, aperture, fluxbin) slopes → the wide Results layout
    slope_B / slopestdev_B / numpoints_B (table_definitions/results.txt)."""
    pivoted = (
        results_long.groupBy(*id_cols)
        .pivot("fluxbin", FLUXBIN_LABELS)
        .agg(
            F.first("slope").alias("slope"),
            F.first("slopestdev").alias("slopestdev"),
            F.first("num_points").alias("numpoints"),
        )
    )
    renames = {
        f"{b}_{m}": f"{m}_{b}" for b in FLUXBIN_LABELS for m in ("slope", "slopestdev", "numpoints")
    }
    return pivoted.select(
        *id_cols,
        *[F.col(src).alias(dst) for src, dst in renames.items()],
    )
