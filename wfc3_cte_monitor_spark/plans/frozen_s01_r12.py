"""PINNED round-12 twin of ``s01_header_derivations`` — the bench's
SECOND cross-version control, added per r12 verdict ask #3: the r12
driver window's io_ratio 1.34 moved zero-code-change queries +26-48%
(s01 itself +48%, the suite's most I/O-shaped query) with no per-query
control outside t01. This pin gives `live − pinned` coverage for the
I/O-shaped end of the suite, where the io sentinel's 1-file probe
cannot see shape-specific drift.

Pinned at the r13 boundary from the r12-close plan body (s01 is
UNCHANGED in r13 at pin time, so the snapshot is exactly the code that
produced BENCH_r12's s01 numbers); verified row-identical to live s01
at sf0.001 + sf0.01 (recorded in SCALING.md round-13).

CONTRACT (same as the t01 pin): bench.py times this pin alongside the
live query in the same randomized sweeps; `live − pinned` = cost of
post-r12 code changes to s01, `pinned_rN vs pinned_r{N-1}` = pure host
drift on code-identical plans. Rules: NEVER edit this module (re-pin a
new one instead); ``sources.catalog.load_table`` is the declared stable
shared substrate (the parquet nanos/timezone handling must stay common
or the pin stops reading the same bytes); everything else the plan
touches — the header projection, ``derive_fileinfo_columns``,
``totbkgrd_expr``, ``rd2xy`` — is COPIED below so no later refactor of
the live modules can leak into the control. Not registered, no oracle;
tests/test_plan_shape.py arm-compares the pin against live every run.

Body copied from plans/domain_queries.py::s01_header_derivations +
sources/header_derive.py + operators/image_ops.py::rd2xy at the r13
boundary (HEAD 492504f).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table

_S01_CODES_180 = ["etq", "euq", "ewq", "f2q", "xsq", "xtq", "xvq", "y1q"]
_S01_POSTARG2 = [0.0, 0.05, -0.1, 5.0, 80.0, -100.0]
_S01_WCS = [
    ("ngc104", 5.0, 1.0, 101.3, 3.7, 2048.0, -2.9, 99.1, 1025.5),
    ("ngc6583", 4.0, -2.0, 97.6, -1.3, 1900.0, 4.1, 103.8, 980.0),
]


def _derive_fileinfo_columns_r12(
    headers: DataFrame, flashlvl_desired: float | None = None
) -> DataFrame:
    dateobs = F.substring(F.col("expstart").cast("string"), 1, 5).cast("int")
    codes_180 = list(_S01_CODES_180)
    is_180 = F.col("targname").contains("6583")
    code_hit = F.lit(False)
    for c in codes_180:
        code_hit = code_hit | F.col("imagename").contains(c)
    chip = (
        F.when(is_180 & code_hit, 1)
        .when(is_180, 2)
        .when(F.abs(F.col("postarg2")) <= 0.1, 2)
        .when(F.abs(F.col("postarg2")) >= 80.0, 1)
        .otherwise(F.lit(None).cast("int"))
    )
    ctecorr = F.when(F.col("imagename").contains("_flc"), 1).otherwise(0)
    exp_length = F.when(F.col("exptime") <= 60, "s").otherwise("l")
    skip = F.when(
        (~is_180)
        & (F.abs(F.col("postarg2")) > 0.1)
        & (F.abs(F.col("postarg2")) < 80.0),
        "false_subdither",
    ).otherwise(F.lit(None).cast("string"))
    if "postarg1" in headers.columns:
        skip = F.when(
            (~is_180) & (F.col("postarg1") > 0.1), "false_xdither"
        ).otherwise(skip)
    if flashlvl_desired is not None:
        skip = F.when(
            F.col("flashlvl").cast("int") != int(flashlvl_desired), "false_pf"
        ).otherwise(skip)
    skip = F.when(F.col("chinject") != "NO", "false_chinject").otherwise(skip)
    return (
        headers.withColumn("ingest_date", F.current_date())
        .withColumn("dateobs", dateobs)
        .withColumn("chip", chip)
        .withColumn("ctecorr", ctecorr)
        .withColumn("exp_length", exp_length)
        .withColumn("flashlvl", F.col("flashlvl").cast("int"))
        .withColumn("targname", F.lower("targname"))
        .withColumn("skip_reason", skip)
    )


def _totbkgrd_expr_r12(mnbkgrd: Column, radius: Column) -> Column:
    return mnbkgrd * (F.lit(math.pi) * radius * radius)


def _rd2xy_r12(
    sources: DataFrame,
    wcs: DataFrame,
    ra: str = "ra",
    dec: str = "dec",
    key: str = "imagename",
) -> DataFrame:
    j = sources.crossJoin(F.broadcast(wcs)) if key not in sources.columns else (
        sources.join(F.broadcast(wcs), key)
    )
    dra = F.col(ra) - F.col("ra0")
    ddec = F.col(dec) - F.col("dec0")
    return (
        j.withColumn("xpix", F.col("ax") * dra + F.col("bx") * ddec + F.col("x0"))
        .withColumn("ypix", F.col("ay") * dra + F.col("by") * ddec + F.col("y0"))
    )


def s01_header_derivations_r12(spark: SparkSession, sf_dir: str) -> DataFrame:
    k = F.col("o_orderkey")
    headers = load_table(spark, sf_dir, "orders").select(
        F.format_string(
            "i%09d%s_%s.fits",
            k,
            F.when(k % 11 == 0, "etq").when(k % 11 == 1, "xsq").otherwise("abq"),
            F.when(k % 2 == 0, "flc").otherwise("flt"),
        ).alias("imagename"),
        (F.lit(50000.0) + (k % 3000) + (k % 100) / 100.0).alias("expstart"),
        F.element_at(
            F.array(*[F.lit(v) for v in _S01_POSTARG2]), (k % 6 + 1).cast("int")
        ).alias("postarg2"),
        F.element_at(
            F.array(F.lit(30.0), F.lit(60.0), F.lit(360.0)), (k % 3 + 1).cast("int")
        ).alias("exptime"),
        (k % 3).cast("double").alias("flashlvl"),
        F.when(k % 7 == 0, "NGC6583").otherwise("NGC104").alias("targname"),
        F.when(k % 13 == 0, "CONT").otherwise("NO").alias("chinject"),
        ((k % 50) / 10.0).alias("mnbkgrd"),
        (2 + k % 4).cast("double").alias("radius"),
        (F.lit(5.0) + (k % 360) / 100.0).alias("ra"),
        (F.lit(1.0) - (k % 180) / 200.0).alias("dec"),
    )
    derived = _derive_fileinfo_columns_r12(headers, flashlvl_desired=0)
    wcs = spark.createDataFrame(
        _S01_WCS,
        "targname string, ra0 double, dec0 double, ax double, bx double,"
        " x0 double, ay double, by double, y0 double",
    )
    return _rd2xy_r12(derived, wcs, key="targname").select(
        "imagename",
        "targname",
        "dateobs",
        "chip",
        "ctecorr",
        "exp_length",
        "flashlvl",
        "skip_reason",
        "ingest_date",
        _totbkgrd_expr_r12(F.col("mnbkgrd"), F.col("radius")).alias("totbkgrd"),
        "xpix",
        "ypix",
    )
