"""Trend/model layer (§3.3) over the domain fixtures: epoch dimension,
band-joined retrieval, empirical-model fit, discovery skip-lists."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from wfc3_cte_monitor_spark.plans.pipeline import compute_results, compute_results_long
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
    slopes = compute_results_long(fileinfo, phot_long, aperture=3)
    return fileinfo.cache(), phot_long.cache(), slopes.cache()


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
    fileinfo, _, slopes = domain
    epochs = epoch_dimension(fileinfo)
    trend = cte_slope_vs_time(fileinfo, slopes, epochs)
    rows = trend.collect()
    assert rows
    # every (targname, epoch) combo appears; slopes near the planted value
    seen = {(r.targname, r.epoch) for r in rows}
    assert len(seen) == len(TARGETS) * 2
    dense = [r.mean_slope for r in rows if r.n_pairs >= 2 and r.mean_slope != 0.0]
    assert dense
    assert abs(float(np.median(dense)) - PLANTED_SLOPE) < 0.5 * PLANTED_SLOPE


def test_cte_slope_vs_logflux_and_fit(spark, domain):
    fileinfo, phot_long, slopes = domain
    epochs = epoch_dimension(fileinfo)
    trend = cte_slope_vs_logflux(fileinfo, phot_long, slopes, epochs).cache()
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
    fileinfo, phot_long, slopes = domain
    results = compute_results(fileinfo, phot_long, aperture=3)
    long = results_long_view(results)
    assert long.count() == results.count() * 8
    assert {"fluxbin", "slope", "slopestdev", "num_points"} <= set(long.columns)
    # The trend layer's long input must be exactly the wide layout
    # stacked back and stripped of zero-filled bins — the equivalence
    # that lets cs03/cs04/n03 skip the pivot + stack round-trip.
    stacked = {
        (r.targname, r.imagename_1, r.imagename_2, r.fluxbin,
         round(r.slope, 9), round(r.slopestdev, 9), r.num_points)
        for r in long.where(F.col("num_points") > 0).collect()
    }
    direct = {
        (r.targname, r.imagename_1, r.imagename_2, r.fluxbin,
         round(r.slope, 9), round(r.slopestdev, 9), int(r.num_points))
        for r in slopes.collect()
    }
    assert stacked == direct


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


def test_coeff_latextable_literal(spark):
    from wfc3_cte_monitor_spark.sources.coeff_table import print_coeff_latextable

    rows = [
        ("pf0_short", i, j, (i * 3 + j + 1) * 0.0123)
        for i in range(3) for j in range(3)
    ] + [
        ("pf6_long", i, j, -(i * 3 + j + 1) * 4.56e-5)
        for i in range(3) for j in range(3)
    ]
    coeffs = spark.createDataFrame(rows, "mode string, i int, j int, coeff double")
    out = print_coeff_latextable(coeffs, "mode")
    expected = "\n".join([
        "\\begin{table}",
        "\\begin{tabular}{ccc}",
        "Mode & pf0_short & pf6_long \\\\",
        "C00 & 1.23e-02 & -4.56e-05 \\\\",
        "C01 & 2.46e-02 & -9.12e-05 \\\\",
        "C02 & 3.69e-02 & -1.37e-04 \\\\",
        "C10 & 4.92e-02 & -1.82e-04 \\\\",
        "C11 & 6.15e-02 & -2.28e-04 \\\\",
        "C12 & 7.38e-02 & -2.74e-04 \\\\",
        "C20 & 8.61e-02 & -3.19e-04 \\\\",
        "C21 & 9.84e-02 & -3.65e-04 \\\\",
        "C22 & 1.11e-01 & -4.10e-04 \\\\",
        "\\end{tabular}",
        "\\end{table}",
    ])
    assert out == expected


def test_coeff_latextable_from_polyfit(spark, domain):
    from wfc3_cte_monitor_spark.sources.coeff_table import print_coeff_latextable

    fileinfo, phot_long, slopes = domain
    epochs = epoch_dimension(fileinfo)
    trend = cte_slope_vs_logflux(fileinfo, phot_long, slopes, epochs)
    coeffs = fit_empirical_model(trend).withColumnRenamed("targname", "mode")
    out = print_coeff_latextable(coeffs, "mode")
    assert out.startswith("\\begin{table}")
    assert "C22" in out and out.count("\\\\") == 10  # header + 9 coeff rows


def test_n03_anomaly_zscore_matches_python(spark, sf_smoke):
    """The rolling z-score anomaly columns: an expanding-window pure-
    python rederivation over the collected backtest rows must reproduce
    zscore (to the rounding quantum) and the anomaly flag exactly —
    strictly-prior-epoch history, n>=3 and positive variance guards."""
    import math

    from wfc3_cte_monitor_spark.plans.domain_queries import n03_model_backtest

    rows = n03_model_backtest(spark, sf_smoke).collect()
    assert rows
    series: dict = {}
    for r in sorted(rows, key=lambda r: (r.targname, r.aperture, r.fluxbin, r.epoch)):
        key = (r.targname, r.aperture, r.fluxbin)
        hist = series.setdefault(key, [])
        xi = round(r.observed_slope * 1e8)
        n = len(hist)
        if n >= 3:
            s, ss = sum(hist), sum(v * v for v in hist)
            var = (ss - s * s / n) / (n - 1)
            if var > 0:
                z = (xi - s / n) / math.sqrt(var)
                assert r.zscore is not None and abs(r.zscore - z) <= 1e-6, (key, r.epoch)
                assert r.anomaly == (1 if abs(z) > 2 else 0), (key, r.epoch)
            else:
                assert r.zscore is None and r.anomaly == 0, (key, r.epoch)
        else:
            assert r.zscore is None and r.anomaly == 0, (key, r.epoch)
        hist.append(xi)
    assert any(r.anomaly == 1 for r in rows)  # the detector actually fires
