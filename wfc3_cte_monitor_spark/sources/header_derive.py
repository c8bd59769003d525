"""FITS-header → FileInfo column derivations (S1).

Reference: ``create_param_dict`` walks ~20 header keywords per exposure
and derives the observation-mode keys imperatively
(wfc3_cte_monitor/run_image_extraction.py:148-443). The derivations are
pure functions of header values, so here they're `withColumn`
expressions over a header table — per-exposure Python becomes one
vectorized projection that Catalyst folds into the scan:

- ``dateobs``  = first 5 digits of EXPSTART (MJD day)      (:308-310)
- ``chip``     = 2 if |POSTARG2| <= 0.1 (not y-dithered),
  1 if |POSTARG2| >= 80 (chip-length dither); the in-between
  "small subdither" range is unusable → skip_reason
  ``false_subdither``                                       (:358-375)
- 180° dataset (targname contains '6583'): chip hardcoded by
  imagename code list                                       (:348-356)
- ``ctecorr``  = 1 for *_flc.fits, 0 for *_flt.fits        (:378-381)
- ``exp_length`` = 's' if EXPTIME <= 60 else 'l'           (:384-387)
- ``flashlvl`` = int (the reference zero-pads into a Float column,
  :421 — normalized per SURVEY §1.2)
- ``targname`` = lowercased                                 (:1054)

Skip-sentinels: the reference returns ``'false_*'`` strings to mark
unusable exposures (:274-340); here that's a ``skip_reason`` column —
NULL means usable — so downstream filters are explicit predicates.
The reference checks (and returns) in a fixed order, so when several
conditions hold the FIRST one names the skip; the column preserves that
precedence: ``false_chinject`` (:274-277) > ``false_pf`` (:279-290) >
``false_xdither`` (:332-340, non-180° POSTARG1 > 0.1) >
``false_subdither`` (:368-375). ``false_field`` (104-CAL2 special
fields, :298-305) is out of scope — the synthetic corpus has no such
targets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def derive_fileinfo_columns(headers: DataFrame,
                            flashlvl_desired: float | None = None) -> DataFrame:
    """headers(imagename, expstart, postarg2, exptime, flashlvl, targname,
    chinject, ...) → + (dateobs, chip, ctecorr, exp_length, skip_reason)."""
    dateobs = F.substring(F.col("expstart").cast("string"), 1, 5).cast("int")
    # run_image_extraction.py:348-375: the 180-degree dataset ('6583')
    # hardcodes usable chips by imagename code; otherwise POSTARG2 decides —
    # |postarg2| <= 0.1 → chip 2 (not y-dithered), >= 80 → chip 1 (dithered
    # by a chip length). The 0.1 < |postarg2| < 80 subdither range is
    # unusable and becomes skip_reason='false_subdither' below.
    codes_180 = ["etq", "euq", "ewq", "f2q", "xsq", "xtq", "xvq", "y1q"]
    is_180 = F.col("targname").contains("6583")
    # plain OR chain, not exists() over an array literal: higher-order
    # functions run interpreted (outside whole-stage codegen) and their
    # lambda resolution is a measurable analyzer cost
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

    # build lowest-precedence first; each later when() OVERRIDES, so the
    # chain ends at the reference's first-returned (highest-precedence)
    # sentinel: chinject > pf > xdither > subdither
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
        headers.withColumn("ingest_date", F.current_date())  # F7 (database_update.py:298)
        .withColumn("dateobs", dateobs)
        .withColumn("chip", chip)
        .withColumn("ctecorr", ctecorr)
        .withColumn("exp_length", exp_length)
        .withColumn("flashlvl", F.col("flashlvl").cast("int"))
        .withColumn("targname", F.lower("targname"))
        .withColumn("skip_reason", skip)
    )


def totbkgrd_expr(mnbkgrd: Column, radius: Column) -> Column:
    """A8: totbkgrd = mnbkgrd × circular-aperture area (π r²)
    (wfc3_cte_monitor/database_update.py:506-509, IRAF path)."""
    import math

    return mnbkgrd * (F.lit(math.pi) * radius * radius)
