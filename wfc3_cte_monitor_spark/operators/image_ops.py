"""Image-domain numerical operators (SURVEY §2.9 N3/N4/N5), Spark-first.

The reference does these imperatively per image:

- N4 sky↔pixel WCS transforms: ``skytopix.rd2xy`` called in a Python loop
  per star — "This part is very, very slow. Parallelize?"
  (run_image_extraction.py:650-651). A linear WCS is an affine map per
  image, so the transform is a broadcast join of the per-image affine
  coefficients + pure column arithmetic: no loop, no UDF, fully codegen.
- N5 DQ/cosmic-ray masking: pure-Python double loops over 4096×2051
  arrays (run_image_extraction.py:793-798, :833-838). On array columns
  this is `transform`/`filter`/`zip_with` — per-pixel work stays JVM-side.
- N3 aperture photometry: sum of pixel values within a radius of a
  source center (do_photom → external photutils_plus apphot,
  run_image_extraction.py:448-579). Expressed over a flattened pixel
  array with index arithmetic inside `aggregate` — the demonstration
  keeps the query-surface shape (per-source rows out, pixels dropped);
  production-scale decode plumbing lives in multimodal/blobs.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# DQ flags considered good: 0 (clean) and 32 (CTE tail) —
# run_image_extraction.py:783-789.
GOOD_DQ = (0, 32)


def apply_pam(pixels: Column, pam: Column) -> Column:
    """S2: pixel-area-map correction — elementwise multiply of the chip
    array by the PAM array (run_image_extraction.py:93-143). One
    ``zip_with`` pass; the reference loads both as full numpy arrays per
    image and multiplies in driver memory."""
    return F.zip_with(pixels, pam, lambda p, a: p * a)


def rd2xy(sources: DataFrame, wcs: DataFrame, ra: str = "ra", dec: str = "dec",
          key: str = "imagename") -> DataFrame:
    """Sky→pixel for every (source, image) via per-image affine WCS:
    x = ax·(ra-ra0) + bx·(dec-dec0) + x0 ; y analogous.
    ``wcs``: (key, ra0, dec0, ax, bx, x0, ay, by, y0) — tiny, broadcast;
    ``key`` is the solution's grain (per image, or per target when one
    pointing solution covers a target's exposures)."""
    j = sources.crossJoin(F.broadcast(wcs)) if key not in sources.columns else (
        sources.join(F.broadcast(wcs), key)
    )
    dra = F.col(ra) - F.col("ra0")
    ddec = F.col(dec) - F.col("dec0")
    return j.withColumn("xpix", F.col("ax") * dra + F.col("bx") * ddec + F.col("x0")) \
            .withColumn("ypix", F.col("ay") * dra + F.col("by") * ddec + F.col("y0"))


def mask_bad_pixels(pixels: Column, dq: Column, good_flags=GOOD_DQ) -> Column:
    """N5: NULL out pixels whose DQ flag is bad — `zip_with` over the
    (pixels, dq) arrays; the reference's double Python loop becomes one
    JVM pass."""
    flags = F.array(*[F.lit(g) for g in good_flags])
    return F.zip_with(
        pixels, dq,
        lambda p, d: F.when(F.array_contains(flags, d), p).otherwise(F.lit(None)),
    )


def good_pixel_fraction(dq: Column, good_flags=GOOD_DQ) -> Column:
    flags = F.array(*[F.lit(g) for g in good_flags])
    return F.size(F.filter(dq, lambda d: F.array_contains(flags, d))) / F.size(dq)


def aperture_sum(pixels: Column, width: Column, xc: Column, yc: Column, radius: float) -> Column:
    """N3: sum of non-NULL pixels within ``radius`` of (xc, yc) over a
    row-major flattened image array. Index arithmetic inside a single
    fold — pixel data never leaves the executor."""
    r2 = F.lit(float(radius) * float(radius))

    def in_aperture(acc, pair):
        # pair: struct(pixel, idx); idx → (x, y) = (idx % width, idx div width)
        x = pair["idx"] % width
        y = (pair["idx"] / width).cast("long")
        d2 = (x - xc) * (x - xc) + (y - yc) * (y - yc)
        return acc + F.when(pair["pix"].isNotNull() & (d2 <= r2), pair["pix"]).otherwise(0.0)

    indexed = F.zip_with(
        pixels,
        F.sequence(F.lit(0), F.size(pixels) - 1),
        lambda p, i: F.struct(p.alias("pix"), i.cast("long").alias("idx")),
    )
    return F.aggregate(indexed, F.lit(0.0), in_aperture)
