"""Trend/model layer (SURVEY.md §3.3): epoch-banded slope retrieval and
the empirical-model fit over the domain tables.

Mirrors ``plot_cteslope_vs_time_setup`` / ``plot_cteslope_vs_logflux_setup``
(wfc3_cte_monitor/uvis_external_cte_plots.py:1297-1445, :1450-1674): the
reference loops targets × proposals × exptimes × dateobs issuing per-cell
queries; here each layer is one DataFrame plan —

  epochs   = pairwise-merged session dimension (find_epochs quirk intact)
  banded   = observations band-joined to epochs (±30 days)
  slopes   = Results (long view) joined to the banded pair modes
  fit      = 9-coefficient polyfit2d per mode group (applyInPandas)
  eval     = closed-form model evaluation column (N2)

Stderr conventions preserved per query (SURVEY §2 F13): cte-vs-time uses
stdev/n (uvis_external_cte_plots.py:1413), logflux uses stdev/sqrt(n)
(:1633) — an intentional reference inconsistency.

Aggregation grain: the reference's plot routines scatter the PER-PAIR
points (one slope per image pair per fluxbin, :377-398 vs-time, :538-553
logflux — the "need to average" comment at :518 notwithstanding, no
averaging happens there). Those per-pair rows are exactly the pre-groupBy
``joined`` relation below; the registered trend view summarizes them per
(target, epoch, fluxbin) with mean ± stderr, which is the queryable form
of the same data — drop the groupBy to recover the scatter points
verbatim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.band_join import band_join
from ..operators.phot_layout import phot_wide_to_long  # noqa: F401  (re-export convenience)
from ..operators.polyfit import polyfit2d
from ..operators.sessionize import find_epochs_pairwise


def epoch_dimension(fileinfo: DataFrame, gap: float = 30.0) -> DataFrame:
    """Distinct observation dates → pairwise-merged epochs per target
    (find_epochs, uvis_external_cte_plots.py:2173-2212)."""
    return find_epochs_pairwise(fileinfo, "dateobs", ["targname"], gap=gap)


def observations_by_epoch(fileinfo: DataFrame, epochs: DataFrame, band: float = 30.0) -> DataFrame:
    """Band-join exposures to their epoch (J7): |dateobs - epoch| <= band.
    The epoch dimension is tiny → broadcast fan-out side."""
    return band_join(
        fileinfo,
        F.broadcast(epochs.withColumnRenamed("targname", "epoch_targname")),
        left_val=F.col("dateobs").cast("double"),
        right_val=F.col("epoch"),
        band=band,
        fan_side="right",
    ).where(F.col("targname") == F.col("epoch_targname")).drop("epoch_targname")


def results_long_view(results_wide: DataFrame) -> DataFrame:
    """Wide Results → long (pair, aperture, fluxbin, slope, stdev, n) via
    one stack projection."""
    from ..schemas import FLUXBIN_LABELS

    triples = ", ".join(
        f"'{b}', slope_{b}, slopestdev_{b}, numpoints_{b}" for b in FLUXBIN_LABELS
    )
    stack = (
        f"stack({len(FLUXBIN_LABELS)}, {triples})"
        " AS (fluxbin, slope, slopestdev, num_points)"
    )
    return results_wide.selectExpr(
        "targname", "imagename_1", "imagename_2", "aperture", stack
    )


def cte_slope_vs_time(fileinfo: DataFrame, slopes_long: DataFrame,
                      epochs: DataFrame) -> DataFrame:
    """Slope trend per (target, epoch, fluxbin): pair modes band-joined to
    epochs, slopes pulled from the long valid-fit slope rows
    (``compute_results_long``); stderr = stdev / n (:1413).

    Consuming the pre-pivot long form is equivalent to stacking the wide
    Results and filtering num_points > 0 — zero-filled bins are exactly
    the rows absent from the long form — without paying the 27-column
    pivot + 8× stack round-trip (test_trends pins the equivalence).

    When ``slopes_long`` carries an ``aperture`` column (the multi-
    aperture form of ``compute_results_long``), aperture rides the trend
    grain too — the reference re-runs its whole trend/output loop once
    per aperture (run_outputs.py:225-295); here it is one more grouping
    column on the same single pass."""
    from .pipeline import query_for_pair

    ap_cols = ["aperture"] if "aperture" in slopes_long.columns else []
    pairs = query_for_pair(fileinfo).select(
        "targname", "dateobs", "exptime", "ctecorr", "imagename_1", "imagename_2"
    )
    obs = band_join(
        pairs,
        F.broadcast(epochs.withColumnRenamed("targname", "epoch_targname")),
        left_val=F.col("dateobs").cast("double"),
        right_val=F.col("epoch"),
        band=30.0,
        fan_side="right",
    ).where(F.col("targname") == F.col("epoch_targname"))
    joined = obs.join(slopes_long, ["targname", "imagename_1", "imagename_2"])
    return (
        joined.groupBy("targname", "epoch", *ap_cols, "fluxbin")
        .agg(
            F.avg("slope").alias("mean_slope"),
            F.avg(F.col("slopestdev") / F.col("num_points")).alias("mean_stderr"),
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        )
    )


def cte_slope_vs_logflux(fileinfo: DataFrame, phot_long: DataFrame,
                         slopes_long: DataFrame, epochs: DataFrame,
                         aperture: int | list[int] = 3) -> DataFrame:
    """Slope vs log-flux per epoch: per (epoch, fluxbin) the mean log10
    net flux against the stored slope. The per-image flux list is 4σ-clipped
    before its mean is taken (``sigmaclip(fluxes, high=4, low=4)`` at
    uvis_external_cte_plots.py:1610-1613); stderr = stdev / sqrt(n)
    (:1633).

    A list ``aperture`` sweeps the trend per aperture in ONE pass
    (matching the multi-aperture form of ``compute_results_long``): the
    per-image flux, its σ-clip, and the slope join all carry aperture as
    a grouping column — the reference's per-aperture output loop
    (run_outputs.py:225-295) as one more key, not another pass."""
    from ..operators.sigma_clip import sigma_clip
    from .pipeline import query_for_pair

    apertures = [aperture] if isinstance(aperture, int) else sorted(aperture)
    multi = len(apertures) > 1
    ap_cols = ["aperture"] if multi else []

    pairs = query_for_pair(fileinfo).select("targname", "dateobs", "imagename_1", "imagename_2")
    obs = band_join(
        pairs,
        F.broadcast(epochs.withColumnRenamed("targname", "epoch_targname")),
        left_val=F.col("dateobs").cast("double"),
        right_val=F.col("epoch"),
        band=30.0,
        fan_side="right",
    ).where(F.col("targname") == F.col("epoch_targname"))

    p = phot_long.where(F.col("radius").isin(apertures)).select(
        F.col("imagename").alias("imagename_1"),
        (F.col("flux") - F.col("totbkgrd")).alias("net_flux"),
        *([F.col("radius").alias("aperture")] if multi else []),
    )
    clipped = sigma_clip(
        obs.join(p, "imagename_1"),
        "net_flux",
        ["targname", "epoch", *ap_cols, "imagename_1", "imagename_2"],
        sigma=4.0,
        iterations=3,
    )
    flux_per_pair = clipped.groupBy(
        "targname", "epoch", *ap_cols, "imagename_1", "imagename_2"
    ).agg(F.avg("net_flux").alias("mean_flux"))

    joined = flux_per_pair.join(
        slopes_long, ["targname", "imagename_1", "imagename_2", *ap_cols]
    )
    return (
        joined.groupBy("targname", "epoch", *ap_cols, "fluxbin")
        .agg(
            F.avg(F.log10("mean_flux")).alias("mean_logflux"),
            F.avg("slope").alias("mean_slope"),
            F.avg(F.col("slopestdev") / F.sqrt(F.col("num_points"))).alias("mean_stderr"),
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        )
    )


def skipbins_filter(trend: DataFrame, targname_col: str = "targname",
                    fluxbin_col: str = "fluxbin") -> DataFrame:
    """Drop each target's lowest flux bins before model fitting
    (uvis_external_cte_plots.py:1648-1653): '6791' targets skip the first
    TWO bins of the config list, every other target skips the first one —
    the low bins fit badly. Bin order is the config-list order
    (config.py:14-16), i.e. the FLUX_BINS index.

    The reference implements the skip as list slicing
    (``log10fluxes[skipbins:]``, :665/:721), which equals a per-bin filter
    only under its one-point-per-bin layout; this predicate form IS the
    stated intent ("low flux bins fit badly") and stays correct when a bin
    holds many pairs."""
    from ..operators.bins import FLUX_BINS

    labels = [f"{int(lo)}_{int(hi)}" for lo, hi in FLUX_BINS]
    skip2 = F.col(targname_col).contains("6791")
    skipped = F.when(skip2, F.col(fluxbin_col).isin(labels[:2])).otherwise(
        F.col(fluxbin_col) == labels[0]
    )
    return trend.where(~skipped)


def fit_empirical_model(trend: DataFrame, d_col: str = "epoch",
                        f_col: str = "mean_logflux", s_col: str = "mean_slope",
                        group_cols: list[str] | None = None) -> DataFrame:
    """9-coefficient 2-D polynomial fit per group (N1;
    fit_empirical_model uvis_external_cte_plots.py:596-778) — the
    coefficients DataFrame replaces the reference's loose coeff txt files
    (S6)."""
    d = trend.withColumn("_d", F.col(d_col) - 55400.0)  # MJD offset (:605-609)
    return polyfit2d(d, "_d", f_col, s_col, group_cols or ["targname"])
