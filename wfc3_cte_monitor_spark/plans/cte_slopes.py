"""Flagship analytic: the CTE-slope pipeline re-expressed as ONE Spark DAG.

Reference trace (SURVEY.md §3.2; wfc3_cte_monitor/uvis_external_cte_plots.py:1119-1292):
chip-pair matching → per-pair photometry fetch → master-id alignment →
background subtraction → overlapping flux-bin fan-out → 4σ sigma-clip →
per-bin linear regression of flux_ratio vs y-position → slope/stddev/n per
bin, with empty bins written as zeros (:198-201). The reference runs this
as hundreds of per-pair SQLite queries plus scipy on driver-side lists;
here it is a single declarative plan: one self-join, one broadcast bin
fan-out, one window-clip shuffle, one aggregation.

The synthetic-table analog (FIXTURES.md §6) maps lineitem's
(l_orderkey, l_linenumber∈{1,2}) to (observation mode, chip),
l_extendedprice to flux, l_quantity to y-position, and l_returnflag to the
observation-mode grouping.

Scale shape: the self-join shuffles on the pair key once; the bin fan-out
is broadcast (8 rows); the clip + regression share one hash partitioning
on (mode, fluxbin). No collect, no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.bins import FLUX_BINS, bin_fanout, binspec_df, binspec_sql
from ..operators.pairs import pair_self_join
from ..operators.regression import linregress_agg, linregress_sql
from ..operators.sigma_clip import sigma_clip, sigma_clip_sql
from ..sources.catalog import load_table

SIGMA = 4.0
CLIP_ITERS = 3


def cte_slope_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (mode, fluxbin): sigma-clipped regression slope of the chip1/chip2
    flux ratio vs y-position, empty bins filled with zeros."""
    li = load_table(spark, sf_dir, "lineitem")
    pairs = pair_self_join(
        li,
        keys=["l_orderkey"],
        side_col="l_linenumber",
        side_1=1,
        side_2=2,
        payload=["l_extendedprice", "l_quantity", "l_returnflag"],
    ).select(
        F.col("l_returnflag_1").alias("mode"),
        F.col("l_extendedprice_1").alias("flux_1"),
        F.col("l_extendedprice_2").alias("flux_2"),
        F.col("l_quantity_1").alias("ypos"),
        (F.col("l_extendedprice_1") / F.col("l_extendedprice_2")).alias("flux_ratio"),
    )
    spec = binspec_df(spark)
    fan = bin_fanout(pairs, spec, ["flux_1", "flux_2"])
    clipped = sigma_clip(fan, "flux_ratio", ["mode", "fluxbin"], sigma=SIGMA, iterations=CLIP_ITERS)
    reg = linregress_agg(clipped, x="ypos", y="flux_ratio", group_cols=["mode", "fluxbin"])

    all_groups = (
        pairs.select("mode").distinct().crossJoin(F.broadcast(spec.select("fluxbin")))
    )
    # Zero-fill convention: the reference writes (0, 0, 0) for empty bins
    # (uvis_external_cte_plots.py:198-201). Bins whose fit is invalid
    # (n <= 2 or zero x-variance → NULL slope) are treated the same way —
    # num_points is zeroed together with slope/slopestdev so rows are
    # internally consistent (documented deviation: the reference would
    # attempt linregress on n in {1,2} and emit nan).
    return all_groups.join(reg, ["mode", "fluxbin"], "left").select(
        "mode",
        "fluxbin",
        F.coalesce("slope", F.lit(0.0)).alias("slope"),
        F.coalesce("slopestdev", F.lit(0.0)).alias("slopestdev"),
        F.when(F.col("slope").isNotNull(), F.col("num_points"))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("num_points"),
    )


def cte_slope_pairs_oracle() -> str:
    clip = sigma_clip_sql("fan", "flux_ratio", ["mode", "fluxbin"], sigma=SIGMA, iterations=CLIP_ITERS)
    reg = linregress_sql("SELECT * FROM clipped", x="ypos", y="flux_ratio", group_cols=["mode", "fluxbin"])
    return f"""
    WITH pairs AS (
        SELECT l1.l_returnflag AS mode,
               l1.l_extendedprice AS flux_1,
               l2.l_extendedprice AS flux_2,
               l1.l_quantity AS ypos,
               l1.l_extendedprice / l2.l_extendedprice AS flux_ratio
        FROM lineitem l1
        JOIN lineitem l2 ON l1.l_orderkey = l2.l_orderkey
        WHERE l1.l_linenumber = 1 AND l2.l_linenumber = 2
    ),
    fan AS (
        SELECT p.*, b.fluxbin
        FROM pairs p
        JOIN {binspec_sql(FLUX_BINS)} b
          ON p.flux_1 > b.bin_lo AND p.flux_1 < b.bin_hi
         AND p.flux_2 > b.bin_lo AND p.flux_2 < b.bin_hi
    ),
    clipped AS ({clip}),
    reg AS ({reg})
    SELECT g.mode, g.fluxbin,
           coalesce(reg.slope, 0.0) AS slope,
           coalesce(reg.slopestdev, 0.0) AS slopestdev,
           (CASE WHEN reg.slope IS NOT NULL THEN reg.num_points ELSE 0 END)::BIGINT AS num_points
    FROM (SELECT DISTINCT p.mode, b.fluxbin FROM pairs p CROSS JOIN {binspec_sql(FLUX_BINS)} b) g
    LEFT JOIN reg ON g.mode = reg.mode AND g.fluxbin = reg.fluxbin
    """
