"""Deterministic domain fixtures per FIXTURES.md §1-3.

Synthetic master/fileinfo/phot tables exercising the reference-specific
semantics: the exactly-one-chip-pair-per-mode contract, overlapping flux
bins populated end to end, a PLANTED per-bin slope in the chip1/chip2
flux ratio (so the pipeline test can assert recovery), ~2% >4σ outliers
to exercise sigma-clipping, and a pair of observation dates <30 days
apart to exercise epoch merging.
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession

PLANTED_SLOPE = 4.0e-5  # flux_ratio = 1 + slope*(ypix-1024) + noise

TARGETS = {"ngc104": 400, "ngc6791": 150, "ngc6583": 80}  # density contrast
DATEOBSS = [56000, 56020, 56200]  # first two <30 days apart (epoch merge)


def make_domain_fixtures(spark: SparkSession, seed: int = 42,
                         n_outlier_frac: float = 0.02):
    """Returns (master, fileinfo, phot_long) DataFrames."""
    rng = np.random.default_rng(seed)
    masters, fileinfos, mags = [], [], []
    ingest = dt.date(2015, 6, 1)

    for targ, n_stars in TARGETS.items():
        ypix = rng.uniform(0, 2048, n_stars)
        masters.append(pd.DataFrame({
            "targname": targ,
            "master_id": np.arange(1, n_stars + 1),
            "xpix": rng.uniform(0, 4096, n_stars),
            "ypix": ypix,
            "ra": 6.0 + rng.normal(0, 0.05, n_stars),
            "dec": -72.0 + rng.normal(0, 0.05, n_stars),
        }))
        for dateobs in DATEOBSS:
            for ctecorr in (0, 1):
                suffix = "flc" if ctecorr else "flt"
                mode = dict(
                    targname=targ, proposid="13083", dateobs=dateobs,
                    filter="F502N", exptime=360.0, chinject="NO",
                    flashlvl=0, ctecorr=ctecorr, postarg1=0.0,
                )
                im1 = f"i{targ[-3:]}{dateobs}c1_{suffix}.fits"
                im2 = f"i{targ[-3:]}{dateobs}c2_{suffix}.fits"
                for chip, im in ((1, im1), (2, im2)):
                    fileinfos.append({
                        **mode, "imagename": im, "imagepath": f"/data/{targ}/{im}",
                        "ingest_date": ingest, "mnclip_bkgrd": 30.0 + rng.uniform(0, 5),
                        "chip": chip, "flashdur": 0.0, "flashcur": "ZERO",
                        "shutrpos": "A", "postarg2": 0.0 if chip == 1 else 82.06,
                        **{f"{c}_{corner}": 0.0 for c in ("ra", "dec")
                           for corner in ("lowerleft", "lowerright", "upperright", "upperleft")},
                    })
                # photometry: both chips see ~90% of stars; chip1 flux is
                # chip2 flux scaled by the planted ramp in ypix.
                present = rng.random(n_stars) < 0.9
                ids = np.arange(1, n_stars + 1)[present]
                y = ypix[present]
                flux2 = 10 ** rng.uniform(np.log10(260), np.log10(30000), present.sum())
                noise = rng.normal(0, 2e-3, present.sum())
                out_mask = rng.random(present.sum()) < n_outlier_frac
                noise[out_mask] += rng.choice([-1, 1], out_mask.sum()) * rng.uniform(
                    0.05, 0.2, out_mask.sum()
                )
                ratio = 1.0 + PLANTED_SLOPE * (y - 1024.0) + noise
                flux1 = flux2 * ratio
                for chip, im, flux in ((1, im1, flux1), (2, im2, flux2)):
                    for radius in (3, 5):
                        mags.append(pd.DataFrame({
                            "targname": targ, "imagename": im,
                            "master_id": ids, "find_id": np.arange(len(ids)),
                            "radius": radius,
                            "xpix": rng.uniform(0, 4096, len(ids)),
                            "ypix": y,
                            "flux": flux * (1.0 if radius == 3 else 1.08),
                            "mnbkgrd": np.zeros(len(ids)),
                            "totbkgrd": np.zeros(len(ids)),
                        }))

    master = spark.createDataFrame(pd.concat(masters, ignore_index=True))
    fileinfo = spark.createDataFrame(pd.DataFrame(fileinfos))
    phot_long = spark.createDataFrame(pd.concat(mags, ignore_index=True))
    return master, fileinfo, phot_long
