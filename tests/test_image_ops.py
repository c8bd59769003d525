"""N3/N4/N5 image-domain operators + exact-fixpoint sigma-clip fallback."""

from __future__ import annotations

import numpy as np

from pyspark.sql import functions as F

from wfc3_cte_monitor_spark.operators.image_ops import (
    aperture_sum,
    good_pixel_fraction,
    mask_bad_pixels,
    rd2xy,
)
from wfc3_cte_monitor_spark.operators.sigma_clip import sigma_clip, sigma_clip_fixpoint


def test_apply_pam(spark):
    from wfc3_cte_monitor_spark.operators.image_ops import apply_pam

    df = spark.createDataFrame(
        [([10.0, 20.0, 30.0], [1.0, 0.5, 2.0])], "pix array<double>, pam array<double>"
    )
    got = df.select(apply_pam(F.col("pix"), F.col("pam")).alias("c")).first().c
    assert got == [10.0, 10.0, 60.0]


def test_rd2xy_affine(spark):
    wcs = spark.createDataFrame(
        [("im1", 6.0, -72.0, 100.0, 0.0, 2048.0, 0.0, -100.0, 1024.0)],
        "imagename string, ra0 double, dec0 double, ax double, bx double,"
        " x0 double, ay double, by double, y0 double",
    )
    src = spark.createDataFrame(
        [("im1", 1, 6.01, -72.02), ("im1", 2, 6.0, -72.0)],
        "imagename string, master_id int, ra double, dec double",
    )
    out = {r.master_id: (r.xpix, r.ypix) for r in rd2xy(src, wcs).collect()}
    assert np.allclose(out[1], (2048.0 + 1.0, 1024.0 + 2.0))
    assert np.allclose(out[2], (2048.0, 1024.0))


def test_mask_and_fraction(spark):
    df = spark.createDataFrame(
        [([1.0, 2.0, 3.0, 4.0], [0, 32, 16, 4])],
        "pix array<double>, dq array<int>",
    )
    out = df.select(
        mask_bad_pixels(F.col("pix"), F.col("dq")).alias("masked"),
        F.round(good_pixel_fraction(F.col("dq")), 6).alias("frac"),
    ).first()
    assert out.masked == [1.0, 2.0, None, None]
    assert out.frac == 0.5


def test_aperture_sum_matches_numpy(spark):
    rng = np.random.default_rng(9)
    w, h = 16, 12
    img = rng.uniform(0, 100, (h, w))
    xc, yc, radius = 7.0, 5.0, 3.5
    ys, xs = np.mgrid[0:h, 0:w]
    expect = img[(xs - xc) ** 2 + (ys - yc) ** 2 <= radius**2].sum()
    df = spark.createDataFrame(
        [(img.flatten().tolist(),)], "pix array<double>"
    ).withColumn("width", F.lit(w))
    got = df.select(
        F.round(
            aperture_sum(F.col("pix"), F.col("width"), F.lit(xc), F.lit(yc), radius), 6
        ).alias("s")
    ).first().s
    assert abs(got - expect) < 1e-4, (got, expect)


def test_sigma_clip_fixpoint_matches_declarative_when_converged(spark):
    rng = np.random.default_rng(21)
    vals = np.concatenate([rng.normal(50, 3, 400), [500.0, -200.0]])
    df = spark.createDataFrame([(float(v),) for v in vals], "x double").withColumn("g", F.lit(1))
    declarative = sorted(r.x for r in sigma_clip(df, "x", ["g"], 4.0, 5).collect())
    fixpoint = sorted(r.x for r in sigma_clip_fixpoint(df, "x", ["g"], 4.0).collect())
    assert np.allclose(declarative, fixpoint)
    assert len(fixpoint) < len(vals)
