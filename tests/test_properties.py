"""Property-based operator tests (hypothesis): random inputs, invariant
assertions against independent reference implementations."""

from __future__ import annotations

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from wfc3_cte_monitor_spark.operators.band_join import band_join
from wfc3_cte_monitor_spark.operators.regression import linregress_agg
from wfc3_cte_monitor_spark.operators.sigma_clip import sigma_clip
from wfc3_cte_monitor_spark.operators.upsert import upsert

_SETTINGS = settings(
    max_examples=8,  # each example spins Spark jobs — keep the count tight
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

finite = st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, width=64)


def _sigmaclip_ref(vals, n_sigma, iters):
    c = np.asarray(vals, dtype=float)
    for _ in range(iters):
        mu, sd = c.mean(), c.std()
        # scipy.stats.sigmaclip keeps with INCLUSIVE bounds
        kept = c[(c >= mu - n_sigma * sd) & (c <= mu + n_sigma * sd)]
        if kept.size == c.size:
            break
        c = kept
    return sorted(c.tolist())


@_SETTINGS
@given(st.lists(finite, min_size=5, max_size=60), st.sampled_from([1.5, 2.5, 4.0]))
def test_sigma_clip_property(spark, vals, sigma):
    df = spark.createDataFrame([(float(v),) for v in vals], "x double").withColumn("g", F.lit(1))
    got = sorted(r.x for r in sigma_clip(df, "x", ["g"], sigma, 3).collect())
    assert np.allclose(got, _sigmaclip_ref(vals, sigma, 3))


@_SETTINGS
@given(st.lists(st.tuples(finite, finite), min_size=4, max_size=50))
def test_linregress_property(spark, points):
    xs = np.array([p[0] for p in points])
    ys = np.array([p[1] for p in points])
    df = spark.createDataFrame(
        [(float(x), float(y)) for x, y in points], "x double, y double"
    ).withColumn("g", F.lit(1))
    row = linregress_agg(df, "x", "y", ["g"], round_to=None).collect()[0]
    if np.var(xs) > 1e-9 and len(points) > 2:
        slope = np.cov(xs, ys, bias=True)[0, 1] / np.var(xs)
        assert row.slope is not None
        assert np.isclose(row.slope, slope, rtol=1e-6, atol=1e-9)
        assert np.isclose(row.intercept, ys.mean() - slope * xs.mean(), rtol=1e-6, atol=1e-6)
    assert row.num_points == len(points)


@_SETTINGS
@given(st.lists(st.tuples(finite, finite), min_size=1, max_size=40),
       st.sampled_from([1.0, 10.0, 250.0]))
def test_band_join_property(spark, pairs, band):
    lvals = [p[0] for p in pairs]
    rvals = [p[1] for p in pairs][: max(1, len(pairs) // 3)]
    left = spark.createDataFrame([(i, float(v)) for i, v in enumerate(lvals)], "lid int, lv double")
    right = spark.createDataFrame([(i, float(v)) for i, v in enumerate(rvals)], "rid int, rv double")
    naive = {
        (i, j) for i, lv in enumerate(lvals) for j, rv in enumerate(rvals) if abs(lv - rv) <= band
    }
    got = {(r.lid, r.rid) for r in band_join(left, right, F.col("lv"), F.col("rv"), band).collect()}
    assert got == naive


@_SETTINGS
@given(st.dictionaries(st.integers(0, 20), finite, min_size=1, max_size=15),
       st.dictionaries(st.integers(0, 20), finite, min_size=1, max_size=15))
def test_upsert_property(spark, base_kv, upd_kv):
    base = spark.createDataFrame([(k, v, 1) for k, v in base_kv.items()], "k int, v double, ver int")
    upd = spark.createDataFrame([(k, v, 2) for k, v in upd_kv.items()], "k int, v double, ver int")
    got = {r.k: r.v for r in upsert(base, upd, ["k"], "ver").collect()}
    expect = {**base_kv, **upd_kv}
    assert set(got) == set(expect)
    assert all(np.isclose(got[k], expect[k]) for k in expect)


def _epoch_walk_ref(dates, gap=30.0):
    """Literal reference scan (uvis_external_cte_plots.py:2196-2209)."""
    ds = sorted(set(dates))
    out, i = [], 0
    while i < len(ds):
        if i + 1 < len(ds) and (ds[i + 1] - ds[i]) < gap:
            out.append(float(round((ds[i] + ds[i + 1]) / 2.0)))
            i += 2
        else:
            out.append(float(ds[i]))
            i += 1
    return sorted(out)


@_SETTINGS
@given(
    groups=st.lists(
        st.lists(st.integers(min_value=0, max_value=500), min_size=1, max_size=40),
        min_size=1,
        max_size=4,
    ),
    gap=st.sampled_from([5.0, 30.0, 100.0]),
)
def test_find_epochs_window_form_property(spark, groups, gap):
    from wfc3_cte_monitor_spark.operators.sessionize import find_epochs_pairwise

    rows = [(f"g{i}", d) for i, ds in enumerate(groups) for d in ds]
    df = spark.createDataFrame(rows, "targ string, dateobs int")
    got: dict[str, list[float]] = {}
    for r in find_epochs_pairwise(df, "dateobs", ["targ"], gap=gap).collect():
        got.setdefault(r.targ, []).append(r.epoch)
    for i, ds in enumerate(groups):
        assert sorted(got[f"g{i}"]) == _epoch_walk_ref(ds, gap), (i, ds, gap)
