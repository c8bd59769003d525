"""End-to-end domain pipeline tests (SURVEY.md §5 strategy #2/#3):
operator-level parity vs scipy/numpy and fixture-based slope recovery."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from wfc3_cte_monitor_spark.operators.polyfit import polyfit2d, polyfit2d_np
from wfc3_cte_monitor_spark.operators.sessionize import find_epochs_pairwise
from wfc3_cte_monitor_spark.operators.sigma_clip import sigma_clip
from wfc3_cte_monitor_spark.operators.upsert import upsert
from wfc3_cte_monitor_spark.plans.pipeline import (
    compute_results,
    query_for_180pair,
    query_for_matching_imagename,
    query_for_pair,
)
from wfc3_cte_monitor_spark.schemas import FLUXBIN_LABELS, PHOT_SCHEMA, RESULTS_SCHEMA
from wfc3_cte_monitor_spark.testing.fixtures import PLANTED_SLOPE, make_domain_fixtures


@pytest.fixture(scope="module")
def fixtures(spark):
    master, fileinfo, phot_long = make_domain_fixtures(spark)
    return master.cache(), fileinfo.cache(), phot_long.cache()


def test_pair_contract(spark, fixtures):
    _, fileinfo, _ = fixtures
    pairs = query_for_pair(fileinfo)
    rows = pairs.collect()
    # 3 targets × 3 dates × 2 ctecorr = 18 pairs, each exactly one chip1+chip2
    assert len(rows) == 18
    assert all(r.imagename_1 != r.imagename_2 for r in rows)


def test_matching_imagename_symmetric(spark, fixtures):
    _, fileinfo, _ = fixtures
    im1 = fileinfo.where((F.col("chip") == 1)).select("imagename").first()[0]
    match = query_for_matching_imagename(fileinfo, im1).collect()
    assert len(match) == 1
    # intended semantics: the reverse direction works too (reference bug fixed)
    back = query_for_matching_imagename(fileinfo, match[0][0]).collect()
    assert back[0][0] == im1


def test_results_recovers_planted_slope(spark, fixtures):
    _, fileinfo, phot_long = fixtures
    results = compute_results(fileinfo, phot_long, aperture=3).cache()
    rows = results.collect()
    assert len(rows) == 18
    assert set(RESULTS_SCHEMA.fieldNames()) - {"slopefile", "slopefile_path"} <= set(
        results.columns
    ) | {"targname", "imagename_1", "imagename_2", "aperture"}
    # the densest bins should recover the planted ramp slope
    good = [
        r[f"slope_{b}"]
        for r in rows
        for b in FLUXBIN_LABELS
        if r[f"numpoints_{b}"] and r[f"numpoints_{b}"] > 30
    ]
    assert good, "no populated bins"
    med = float(np.median(good))
    assert abs(med - PLANTED_SLOPE) < 0.35 * PLANTED_SLOPE, med


def _sigmaclip_reference(vals: np.ndarray, n_sigma: float, iters: int) -> np.ndarray:
    """Literal numpy port of the scipy.stats.sigmaclip loop the reference
    relies on (uvis_external_cte_plots.py:174-181): INCLUSIVE keep bounds
    mean ± n·std (population std), re-evaluated each pass."""
    c = vals.astype(float)
    for _ in range(iters):
        mu, sd = c.mean(), c.std()
        kept = c[(c >= mu - n_sigma * sd) & (c <= mu + n_sigma * sd)]
        if kept.size == c.size:
            break
        c = kept
    return c


def test_multi_aperture_sweep_equals_per_aperture_runs(spark, fixtures):
    # the single-pass aperture sweep (aperture as a grouping column) must
    # produce exactly the union of the per-aperture runs it replaces
    _, fileinfo, phot_long = fixtures
    apertures = [2, 3]
    swept = compute_results(fileinfo, phot_long, aperture=apertures)
    swept_rows = {tuple(r) for r in swept.select(*sorted(swept.columns)).collect()}
    union_rows = set()
    for a in apertures:
        one = compute_results(fileinfo, phot_long, aperture=a).withColumn(
            "aperture", F.lit(float(a))
        )
        union_rows |= {tuple(r) for r in one.select(*sorted(one.columns)).collect()}
    assert sorted(swept.columns) == sorted(
        compute_results(fileinfo, phot_long, aperture=2).columns
    )
    assert swept_rows == union_rows


def test_sigma_clip_matches_reference_loop(spark):
    rng = np.random.default_rng(7)
    vals = np.concatenate([rng.normal(100, 5, 500), [250.0, -40.0, 400.0]])
    df = spark.createDataFrame([(float(v),) for v in vals], "x double")
    ours = sorted(
        r.x for r in sigma_clip(df.withColumn("g", F.lit(1)), "x", ["g"], 4.0, 3).collect()
    )
    expected = sorted(_sigmaclip_reference(vals, 4.0, 3).tolist())
    assert np.allclose(ours, expected)
    assert len(ours) < len(vals)  # outliers actually removed


def test_find_epochs_pairwise_quirk(spark):
    # reference behavior (uvis_external_cte_plots.py:2196-2209): pairwise,
    # not transitive — [100, 120, 140] merges (100,120)->110 and keeps 140.
    df = spark.createDataFrame([("t", d) for d in [100, 120, 140]], "targ string, dateobs int")
    out = sorted(r.epoch for r in find_epochs_pairwise(df, "dateobs", ["targ"]).collect())
    assert out == [110.0, 140.0]
    # and a lone pair >30 apart stays separate
    df2 = spark.createDataFrame([("t", d) for d in [100, 135]], "targ string, dateobs int")
    out2 = sorted(r.epoch for r in find_epochs_pairwise(df2, "dateobs", ["targ"]).collect())
    assert out2 == [100.0, 135.0]
    # the global (ungrouped) form is a deliberate scale trap → rejected
    import pytest

    with pytest.raises(ValueError):
        find_epochs_pairwise(df2, "dateobs", [])


def _epoch_walk_reference(dates, gap=30.0):
    """Literal re-implementation of the reference's imperative scan
    (uvis_external_cte_plots.py:2196-2209) for equivalence testing."""
    dates = sorted(set(dates))
    epochs, i = [], 0
    while i < len(dates):
        if i + 1 < len(dates) and (dates[i + 1] - dates[i]) < gap:
            epochs.append(float(round((dates[i] + dates[i + 1]) / 2.0)))
            i += 2
        else:
            epochs.append(float(dates[i]))
            i += 1
    return epochs


def test_find_epochs_window_form_equals_walk(spark):
    # adversarial gap structures: chains, exact-boundary gaps, odd clusters
    cases = [
        [0, 10, 20, 40, 80, 85, 90, 130],
        [0, 29, 31, 60, 89, 90, 91, 92, 93],
        [0, 30, 60, 90],          # all exactly at the boundary -> no merges
        [0, 29, 58, 87],          # chain of close gaps, odd length
        [5],
        [1, 2],
        list(range(0, 300, 7)),   # long single cluster, even size
        list(range(0, 301, 7)),   # long single cluster, odd size
    ]
    rows = [(f"g{i}", d) for i, ds in enumerate(cases) for d in ds]
    df = spark.createDataFrame(rows, "targ string, dateobs int")
    got = {}
    for r in find_epochs_pairwise(df, "dateobs", ["targ"]).collect():
        got.setdefault(r.targ, []).append(r.epoch)
    for i, ds in enumerate(cases):
        assert sorted(got[f"g{i}"]) == sorted(_epoch_walk_reference(ds)), f"case {i}: {ds}"


def test_polyfit2d_matches_numpy(spark):
    rng = np.random.default_rng(3)
    n = 60
    d = rng.uniform(0, 2000, n)
    f = rng.uniform(2.0, 4.5, n)
    true = np.array([0.01, -0.003, 0.0005, 1e-5, -2e-6, 3e-7, -1e-9, 2e-10, -3e-11])
    design = np.column_stack([(f ** j) * (d ** i) for i in range(3) for j in range(3)])
    s = design @ true + rng.normal(0, 1e-4, n)
    pdf = [(float(dd), float(ff), float(ss), "g") for dd, ff, ss in zip(d, f, s)]
    df = spark.createDataFrame(pdf, "d double, f double, s double, grp string")
    out = polyfit2d(df, "d", "f", "s", ["grp"]).orderBy("i", "j").collect()
    got = np.array([r.coeff for r in out])
    expected = polyfit2d_np(d, f, s)
    assert np.allclose(got, expected, rtol=1e-8)
    assert out[0].num_points == n


def test_polyfit2d_strict_raises_on_underdetermined(spark):
    # 4 points < 9 needed: default emits NaN coeffs; strict raises — the
    # n01 exactly-determined grid wants a loud failure, not a NaN row set
    import pytest as _pytest

    rows = [(0.0, 0.0, 1.0, "g"), (1.0, 0.0, 2.0, "g"),
            (0.0, 1.0, 3.0, "g"), (1.0, 1.0, 4.0, "g")]
    df = spark.createDataFrame(rows, "d double, f double, s double, grp string")
    lax = polyfit2d(df, "d", "f", "s", ["grp"]).collect()
    # applyInPandas surfaces the NaN sentinel as NULL after Arrow transfer
    assert len(lax) == 9
    assert all(r.coeff is None or np.isnan(r.coeff) for r in lax)
    with _pytest.raises(Exception, match="polyfit2d.strict."):
        polyfit2d(df, "d", "f", "s", ["grp"], strict=True).collect()


def test_upsert_idempotent(spark):
    base = spark.createDataFrame(
        [(1, 10.0, 1), (2, 20.0, 1), (3, 30.0, 1)], "k int, v double, version int"
    )
    updates = spark.createDataFrame([(2, 99.0, 2), (4, 40.0, 2)], "k int, v double, version int")
    once = upsert(base, updates, ["k"], "version")
    twice = upsert(once, updates, ["k"], "version")
    got = {r.k: r.v for r in twice.collect()}
    assert got == {1: 10.0, 2: 99.0, 3: 30.0, 4: 40.0}
    # re-running leaves the table unchanged (README.md:517-521 contract)
    assert sorted(once.collect()) == sorted(twice.collect())


def test_180pair_visit_split(spark, fixtures):
    _, fileinfo, _ = fixtures
    # fixture imagenames carry the dateobs in positions 5-6; just assert the
    # operator runs and pairs rank-wise without error on a side predicate.
    out = query_for_180pair(fileinfo, "F502N", 360.0, 0, 1)
    assert out.columns == ["targname", "pair_rank", "imagename_1", "imagename_2"]


def test_phot_layout_roundtrip(spark):
    import pandas as pd

    from wfc3_cte_monitor_spark.operators.phot_layout import (
        mag_long_to_phot_wide,
        phot_wide_to_long,
    )
    from wfc3_cte_monitor_spark.schemas import APERTURES

    rows = []
    for fid in range(5):
        for r in APERTURES:
            rows.append({"find_id": fid, "imagename": "im1", "radius": r,
                         "flux": 100.0 * fid + r, "mnbkgrd": 1.0 + r, "totbkgrd": 2.0 * r})
    mag = spark.createDataFrame(pd.DataFrame(rows))
    wide = mag_long_to_phot_wide(mag, ["find_id", "imagename"])
    assert f"flux_{APERTURES[0]}" in wide.columns and f"totbkgrd_{APERTURES[-1]}" in wide.columns
    assert wide.count() == 5
    long_again = phot_wide_to_long(wide, ["find_id", "imagename"])
    assert long_again.count() == 5 * len(APERTURES)
    orig = {(r.find_id, r.radius): r.flux for r in mag.collect()}
    back = {(r.find_id, r.radius): r.flux for r in long_again.collect()}
    assert orig == back


def test_sigma_clip_bounded_unrolling_is_fixpoint_on_gate_data(spark):
    """The declarative sigma_clip bounds the reference's iterate-until-
    convergence at 3 passes, claiming the gate data converges by then
    (operators/sigma_clip.py module docstring). Check the claim instead
    of trusting it: a 4th pass over the domain-analog pipeline must
    change nothing."""
    from wfc3_cte_monitor_spark.plans.domain_queries import analog_fileinfo, analog_phot
    from wfc3_cte_monitor_spark.plans.pipeline import compute_results_long

    sf = "/root/testdata/sf0.001"
    fi, ph = analog_fileinfo(spark, sf), analog_phot(spark, sf)
    key = lambda r: (r["targname"], r["imagename_1"], r["imagename_2"], r["fluxbin"])
    three = {key(r): (round(r["slope"], 10), r["num_points"])
             for r in compute_results_long(fi, ph, iterations=3).collect()}
    four = {key(r): (round(r["slope"], 10), r["num_points"])
            for r in compute_results_long(fi, ph, iterations=4).collect()}
    assert three == four


def test_slope_pipeline_single_data_exchange(spark, fixtures):
    # The pair_id rekey's contract: the data-sized align → bin fan-out →
    # σ-clip → regression chain runs off ONE hash exchange (the explicit
    # pair_id repartition); every other join in the long pipeline is a
    # broadcast. A second hashpartitioning exchange on the measurement
    # path means a downstream stage stopped reusing the partitioning.
    # Asserted on the EnsureRequirements-time static plan (the module's
    # plan-shape convention — AQE only coalesces/rewrites downward from
    # here, it never adds a distribution requirement), so no execution
    # is needed.
    from wfc3_cte_monitor_spark.plans.pipeline import compute_results_long

    _, fileinfo, phot_long = fixtures
    reg = compute_results_long(fileinfo, phot_long, aperture=3)
    plan = reg._jdf.queryExecution().executedPlan().toString()
    n_hash = plan.count("Exchange hashpartitioning")
    assert n_hash <= 1, f"expected the single pair_id exchange, saw {n_hash}:\n{plan}"
    assert "SortMergeJoin" not in plan


def test_pair_id_surrogate_is_collision_free_on_gate_data(spark, fixtures):
    # pair_id = xxhash64(targname, imagename_1, imagename_2) stands in
    # for the pair identity through every data-sized stage; a collision
    # would silently merge two pairs' measurements. The probability is
    # ~n^2/2^65 for broadcast-bounded n, but the invariant is cheap to
    # pin on the fixture and (via the same expression) any analog table.
    _, fileinfo, _ = fixtures
    pairs = query_for_pair(fileinfo).select("targname", "imagename_1", "imagename_2")
    n_pairs = pairs.distinct().count()
    n_ids = (
        pairs.select(F.xxhash64("targname", "imagename_1", "imagename_2").alias("pair_id"))
        .distinct()
        .count()
    )
    assert n_pairs == n_ids
