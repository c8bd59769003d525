"""Flagship #2: the 180°-rotated-visit CTE-slope path.

Reference: for 180°-rotation datasets there is no chip pairing — images
pair POSITIONALLY within (filter, exptime, ctecorr, chip) by sorted name
split on the visit substring (`query_for_180pair`,
wfc3_cte_monitor/database_queries.py:683-740; README.md:599-609), then the
same ratio → overlapping bins → σ-clip → regression analysis runs per
pair (uvis_external_cte_plots.py:1119-1292).

Synthetic analog: lineitem rows pair by rank within
(l_returnflag, side = l_linenumber <= 3); the composed DAG is
rank-pairing (J4/W2) → bin fan-out (A6) → σ-clip (A4) → regression (A5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.bins import FLUX_BINS, bin_fanout, binspec_df, binspec_sql
from ..operators.pairs import rank_pairing
from ..operators.regression import linregress_agg, linregress_sql
from ..operators.sigma_clip import sigma_clip, sigma_clip_sql
from ..sources.catalog import load_table

SIGMA = 4.0
CLIP_ITERS = 3


def cte_slope_180pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (mode, fluxbin): σ-clipped regression slope of the visit1/visit2
    flux ratio vs y-position, pairs formed by rank within side."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        # project BEFORE the rank window: the sort shuffles every carried
        # column, and only these survive to the output
        .select("l_orderkey", "l_linenumber", "l_returnflag",
                "l_extendedprice", "l_quantity", "l_partkey", "l_suppkey")
        .withColumn("uid", F.col("l_orderkey") * 10 + F.col("l_linenumber"))
    )
    # (l_orderkey, l_linenumber) is NOT unique in the synthetic lineitem —
    # the order must be total or the pairing is engine-dependent
    paired = rank_pairing(
        li,
        group_cols=["l_returnflag"],
        side_col=F.col("l_linenumber") <= 3,
        order_col=["uid", "l_extendedprice", "l_partkey", "l_suppkey", "l_quantity"],
        payload=["l_extendedprice", "l_quantity"],
    ).select(
        F.col("l_returnflag").alias("mode"),
        F.col("l_extendedprice_1").alias("flux_1"),
        F.col("l_extendedprice_2").alias("flux_2"),
        F.col("l_quantity_1").alias("ypos"),
        (F.col("l_extendedprice_1") / F.col("l_extendedprice_2")).alias("flux_ratio"),
    )
    spec = binspec_df(spark)
    fan = bin_fanout(paired, spec, ["flux_1", "flux_2"])
    clipped = sigma_clip(fan, "flux_ratio", ["mode", "fluxbin"], sigma=SIGMA, iterations=CLIP_ITERS)
    reg = linregress_agg(clipped, x="ypos", y="flux_ratio", group_cols=["mode", "fluxbin"])
    # Zero-fill frame: a mode appears in `paired` iff BOTH sides are
    # non-empty (rank 1 then exists on each side of the rank equi-join),
    # so the distinct-modes-with-pairs set is a cheap two-counter
    # aggregate on the BASE table — `paired.select("mode").distinct()`
    # would re-execute the whole rank-window + self-join subtree for a
    # second time just to enumerate a handful of groups.
    side = F.col("l_linenumber") <= 3
    modes = (
        # NULL guard: groupBy would keep a NULL-key group that the pair
        # equi-join (and the oracle's a.key = b.key) can never produce
        li.where(F.col("l_returnflag").isNotNull())
        .groupBy("l_returnflag")
        .agg(
            F.sum(side.cast("int")).alias("_n1"),
            F.sum((~side).cast("int")).alias("_n2"),
        )
        .where((F.col("_n1") > 0) & (F.col("_n2") > 0))
        .select(F.col("l_returnflag").alias("mode"))
    )
    all_groups = modes.crossJoin(F.broadcast(spec.select("fluxbin")))
    return all_groups.join(reg, ["mode", "fluxbin"], "left").select(
        "mode",
        "fluxbin",
        F.coalesce("slope", F.lit(0.0)).alias("slope"),
        F.coalesce("slopestdev", F.lit(0.0)).alias("slopestdev"),
        # invalid fits (NULL slope) zero num_points too — see cte_slopes.py
        F.when(F.col("slope").isNotNull(), F.col("num_points"))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("num_points"),
    )


def cte_slope_180pairs_oracle() -> str:
    clip = sigma_clip_sql("fan", "flux_ratio", ["mode", "fluxbin"], sigma=SIGMA, iterations=CLIP_ITERS)
    reg = linregress_sql("SELECT * FROM clipped", x="ypos", y="flux_ratio", group_cols=["mode", "fluxbin"])
    return f"""
    WITH ranked AS (
        SELECT l_returnflag, (l_linenumber <= 3) AS _side,
               l_extendedprice, l_quantity,
               row_number() OVER (PARTITION BY l_returnflag, (l_linenumber <= 3)
                                  ORDER BY l_orderkey * 10 + l_linenumber,
                                           l_extendedprice, l_partkey, l_suppkey, l_quantity
                                 ) AS pair_rank
        FROM lineitem
    ),
    pairs AS (
        SELECT a.l_returnflag AS mode,
               a.l_extendedprice AS flux_1,
               b.l_extendedprice AS flux_2,
               a.l_quantity AS ypos,
               a.l_extendedprice / b.l_extendedprice AS flux_ratio
        FROM ranked a JOIN ranked b
          ON a.l_returnflag = b.l_returnflag AND a.pair_rank = b.pair_rank
         AND a._side AND NOT b._side
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
