"""Trend/model layer (§3.3) over the domain fixtures: epoch dimension,
band-joined retrieval, empirical-model fit, discovery skip-lists."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from wfc3_cte_monitor_spark.plans.pipeline import compute_results
from wfc3_cte_monitor_spark.plans.trends import (
    cte_slope_vs_logflux,
    cte_slope_vs_time,
    epoch_dimension,
    fit_empirical_model,
    results_long_view,
)
from wfc3_cte_monitor_spark.testing.fixtures import DATEOBSS, PLANTED_SLOPE, TARGETS, make_domain_fixtures


@pytest.fixture(scope="module")
def domain(spark):
    master, fileinfo, phot_long = make_domain_fixtures(spark)
    results = compute_results(fileinfo, phot_long, aperture=3)
    return fileinfo.cache(), phot_long.cache(), results.cache()


def test_epoch_dimension_merges_close_dates(spark, domain):
    fileinfo, _, _ = domain
    epochs = epoch_dimension(fileinfo)
    per_target = {}
    for r in epochs.collect():
        per_target.setdefault(r.targname, []).append(r.epoch)
    # fixture dates 56000/56020/56200: first two merge pairwise -> 56010
    for targ in TARGETS:
        assert sorted(per_target[targ]) == [56010.0, 56200.0]


def test_cte_slope_vs_time_trend(spark, domain):
    fileinfo, _, results = domain
    epochs = epoch_dimension(fileinfo)
    trend = cte_slope_vs_time(fileinfo, results, epochs)
    rows = trend.collect()
    assert rows
    # every (targname, epoch) combo appears; slopes near the planted value
    seen = {(r.targname, r.epoch) for r in rows}
    assert len(seen) == len(TARGETS) * 2
    dense = [r.mean_slope for r in rows if r.n_pairs >= 2 and r.mean_slope != 0.0]
    assert dense
    assert abs(float(np.median(dense)) - PLANTED_SLOPE) < 0.5 * PLANTED_SLOPE


def test_cte_slope_vs_logflux_and_fit(spark, domain):
    fileinfo, phot_long, results = domain
    epochs = epoch_dimension(fileinfo)
    trend = cte_slope_vs_logflux(fileinfo, phot_long, results, epochs).cache()
    rows = trend.collect()
    assert rows and all(r.mean_logflux > 0 for r in rows if r.mean_logflux is not None)
    coeffs = fit_empirical_model(trend).collect()
    # 9 coefficients per target
    per = {}
    for r in coeffs:
        per.setdefault(r.targname, []).append((r.i, r.j, r.coeff))
    assert set(per) == set(TARGETS)
    assert all(len(v) == 9 for v in per.values())


def test_results_long_view_roundtrip(spark, domain):
    _, _, results = domain
    long = results_long_view(results)
    assert long.count() == results.count() * 8
    assert {"fluxbin", "slope", "slopestdev", "num_points"} <= set(long.columns)


def test_discovery_skip_lists(spark, tmp_path):
    import os

    from wfc3_cte_monitor_spark.sources.discovery import apply_skip_lists, discover_images

    names = ["ibwb05abq_flc.txt", "ibwb06abq_flc.txt", "ic5p07xyq_flt.txt", "ic5p08xyq_flt.txt"]
    for n in names:
        (tmp_path / n).write_text("x")
    imgs = discover_images(spark, str(tmp_path))
    assert imgs.count() == 4
    with_prop = imgs.withColumn(
        "proposid",
        F.when(F.col("prefix") == "ibwb", "14012").otherwise("12379"),
    )
    kept = apply_skip_lists(with_prop)  # drops 14012 v05 and 12379 v07
    kept_names = {r.imagename for r in kept.collect()}
    assert kept_names == {"ibwb06abq_flc.txt", "ic5p08xyq_flt.txt"}
