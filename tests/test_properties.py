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


def _iters_to_fixpoint(v: np.ndarray, sigma: float, max_iters: int = 500) -> int:
    keep = v
    for i in range(1, max_iters + 1):
        mu, sd = keep.mean(), keep.std()
        mask = (keep >= mu - sigma * sd) & (keep <= mu + sigma * sd)
        if mask.all():
            return i - 1
        keep = keep[mask]
    return max_iters


def test_sigma_clip_convergence_bounds():
    """Convergence audit for the bounded unrolls vs scipy's run-to-fixpoint
    (uvis_external_cte_plots.py:174-181, :713-716). Pure numpy — the
    engine's unroll and this loop share the (inclusive-keep, population
    std) semantics, so iterations-to-fixpoint is the only question.

    Pins the two regimes the registered queries rely on:
    - σ = 4: realistic (near-Gaussian) groups reach fixpoint in ≤ 3
      passes at any gated group size, so iterations=3 IS scipy there
      (heavy-tailed data is different — documented by the divergence
      probe below — and has sigma_clip_fixpoint for exact parity);
    - σ = 1.3: even Gaussian groups shed tail mass for dozens of passes
      (a09's real bins: 23/33/38 passes at sf0.001/0.01/0.1), and
      SIGMA13_ITERS must cover the fixpoint for every adversarial shape
      at sizes through 10× the largest tested corpus group."""
    from wfc3_cte_monitor_spark.operators.sigma_clip import SIGMA13_ITERS

    rng = np.random.default_rng(20260813)

    # σ=4, near-Gaussian (the flux-ratio shape): fixpoint in ≤3 passes
    for n in (5, 20, 100, 1000, 5000):
        for _ in range(20):
            v = 1.0 + 0.05 * rng.standard_normal(n)
            assert _iters_to_fixpoint(v, 4.0) <= 3, n

    # σ=4, heavy-tailed: bounded-3 genuinely diverges from fixpoint —
    # the documented reason sigma_clip_fixpoint exists
    assert any(
        _iters_to_fixpoint(rng.standard_cauchy(200), 4.0) > 3 for _ in range(20)
    )

    # σ=1.3: SIGMA13_ITERS covers the fixpoint for Gaussian AND
    # adversarial heavy-tailed groups at realistic sizes — including
    # groups the size of a09's actual sf0.1 bins (~100k rows) and 10×
    # beyond (convergence grows ~ +5 passes per 10× group size)
    shapes = [
        lambda n: rng.standard_normal(n),
        lambda n: rng.standard_cauchy(n),
        lambda n: rng.lognormal(0, 2, n),
        lambda n: rng.pareto(1.1, n),
        lambda n: np.where(rng.random(n) < 0.1,
                           rng.normal(0, 50, n), rng.normal(0, 1, n)),
    ]
    worst = 0
    for gen in shapes:
        for n in (20, 200, 2000, 6000):
            for _ in range(5):
                worst = max(worst, _iters_to_fixpoint(gen(n), 1.3))
    for n in (100_000, 1_000_000):
        worst = max(worst, _iters_to_fixpoint(rng.standard_normal(n), 1.3))
        worst = max(worst, _iters_to_fixpoint(rng.lognormal(0, 2, n), 1.3))
    # a09's engine iterates to the SAME bound the oracle unrolls; the
    # margin below is what guarantees bound == fixpoint on real data
    assert worst <= SIGMA13_ITERS - 8, worst


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


# Printable-ASCII documents, including whitespace variety (tab/newline/
# vertical-tab made the Java-vs-RE2 \s divergence observable before the
# pattern was pinned to an explicit class).
_ascii_doc = st.text(
    alphabet=st.characters(min_codepoint=0x20, max_codepoint=0x7E) | st.sampled_from("\t\n\x0b\f\r"),
    max_size=120,
)


@_SETTINGS
@given(st.lists(_ascii_doc, min_size=1, max_size=12))
def test_text_primitives_cross_engine_fuzz(spark, texts):
    """Spark and DuckDB must agree EXACTLY on the portable text
    primitives for arbitrary printable-ASCII input — the property the
    whole oracle-gating strategy rests on. Also: the BPE-ish count
    dominates the whitespace count (every whitespace token contains at
    least one BPE-ish token)."""
    import duckdb

    from wfc3_cte_monitor_spark.functions.text import (
        bpe_token_count,
        bpe_token_count_sql,
        token_count,
        token_count_sql,
        winnow_fingerprints,
        winnow_fp_sql_list,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = {
        r.doc_id: r
        for r in df.select(
            "doc_id",
            token_count("text").alias("ws"),
            bpe_token_count("text").alias("bpe"),
        ).collect()
    }
    wf = {
        r.doc_id: (r.n_winnow_fp, r.winnow_fp_sum)
        for r in winnow_fingerprints(df, "doc_id", "text").collect()
    }

    con = duckdb.connect()
    wfl = winnow_fp_sql_list("text")
    for i, t in enumerate(texts):
        ws, bpe, n_fp, s_fp = con.execute(
            f"""SELECT {token_count_sql('text')},
                       {bpe_token_count_sql('text')},
                       CAST(len(_wf) AS BIGINT),
                       CAST(coalesce(list_sum(_wf), 0) AS BIGINT)
                FROM (SELECT text, {wfl} AS _wf FROM (SELECT ? AS text))""",
            [t],
        ).fetchone()
        assert rows[i].ws == ws, (t, rows[i].ws, ws)
        assert rows[i].bpe == bpe, (t, rows[i].bpe, bpe)
        got_wf = wf.get(i, (0, 0))
        assert got_wf == (n_fp, s_fp), (t, got_wf, (n_fp, s_fp))
        assert rows[i].bpe >= rows[i].ws, t


def test_quantile_sketch_within_bin_of_exact(spark):
    """o02's histogram-sketch estimates: the sketch bin midpoint must sit
    within one bin width + the local order-stat gap of the exact
    interpolated percentile (numpy reference), for every group."""
    from wfc3_cte_monitor_spark.plans.parity_queries2 import (
        QSK_LOG2S,
        o02_percentiles,
    )
    from wfc3_cte_monitor_spark.sources.catalog import load_table

    sf = "/root/testdata/sf0.001"
    width = 1.0 / (1 << QSK_LOG2S)
    ev = load_table(spark, sf, "events").select("event_type", "value").collect()
    groups: dict[str, list[float]] = {}
    for r in ev:
        groups.setdefault(r.event_type, []).append(r.value)
    rows = {r.event_type: r for r in o02_percentiles(spark, sf).collect()}
    assert rows.keys() == groups.keys()
    for et, vals in groups.items():
        v = np.sort(np.asarray(vals))
        r = rows[et]
        for q, sk in ((0.5, r.sk_p50), (0.9, r.sk_p90)):
            exact = float(np.quantile(v, q))
            # anchor order stat the sketch rounds to, and its successor
            lo = int(np.floor(q * (len(v) - 1)))
            gap = float(v[min(lo + 1, len(v) - 1)] - v[lo])
            assert abs(sk - exact) <= width + gap + 1e-9, (et, q, sk, exact)


@_SETTINGS
@given(
    st.lists(st.integers(min_value=0, max_value=5), min_size=2, max_size=30),
    st.integers(min_value=0, max_value=5),
    st.integers(min_value=0, max_value=5),
)
def test_merge_apply_transform_matches_greedy(spark, seq, a, b):
    """The merge2 positional apply (absorb i when (i-1,i) matched;
    rewrite when (i,i+1) matches) must equal left-to-right greedy pair
    replacement for any sequence, whenever the pair members differ — the
    non-overlap argument the arm relies on, fuzzed over adversarial
    arrays (pairs at either end, chained abab runs, repeats)."""
    from pyspark.sql import functions as F

    if a == b:
        return  # the arm's winner constraint excludes equal residues
    NID = -1
    df = spark.createDataFrame([(1, [int(x) for x in seq])], "id long, th array<bigint>")
    expr = f"""filter(transform(sequence(1, size(th)), i -> CASE
        WHEN i > 1 AND element_at(th, greatest(i - 1, 1)) = {a}
             AND element_at(th, i) = {b} THEN CAST(NULL AS BIGINT)
        WHEN try_element_at(th, i + 1) = {b}
             AND element_at(th, i) = {a} THEN CAST({NID} AS BIGINT)
        ELSE element_at(th, i) END), x -> x IS NOT NULL)"""
    (got,) = df.select(F.expr(expr).alias("m")).collect()[0]

    out, i = [], 0
    while i < len(seq):
        if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
            out.append(NID)
            i += 2
        else:
            out.append(seq[i])
            i += 1
    assert list(got) == out, (seq, a, b, list(got), out)


@_SETTINGS
@given(
    st.lists(  # left: (key, ts-offset-seconds, id)
        st.tuples(st.integers(0, 3), st.integers(0, 10_000), st.integers(0, 10**6)),
        min_size=1, max_size=25,
    ),
    st.lists(  # right: (key, ts-offset-seconds, id)
        st.tuples(st.integers(0, 3), st.integers(0, 10_000), st.integers(0, 10**6)),
        min_size=0, max_size=25,
    ),
    st.sampled_from(["backward", "forward"]),
)
def test_asof_join_matches_pandas_merge_asof(spark, left_rows, right_rows, direction):
    """Differential oracle: operators/asof_join vs pandas.merge_asof
    (by-key, inclusive boundary) on random inputs. Right side deduped to
    one row per (key, ts) — the operator's documented determinism
    contract — keeping the max id, matching the gated arm."""
    import datetime as dt

    import pandas as pd

    from wfc3_cte_monitor_spark.operators.asof_join import asof_join

    t0 = dt.datetime(2024, 1, 1)
    lpdf = pd.DataFrame(
        [
            {"k": k, "ts": t0 + dt.timedelta(seconds=s), "lid": i}
            for i, (k, s, _x) in enumerate(left_rows)
        ]
    )
    rseen: dict = {}
    for k, s, rid in right_rows:
        key = (k, s)
        rseen[key] = max(rseen.get(key, -1), rid)
    rpdf = pd.DataFrame(
        [
            {"k": k, "ts": t0 + dt.timedelta(seconds=s), "rid": rid}
            for (k, s), rid in sorted(rseen.items())
        ],
        columns=["k", "ts", "rid"],
    )
    if rpdf.empty:
        rpdf = rpdf.astype({"k": "int64", "ts": "datetime64[ns]", "rid": "int64"})

    left = spark.createDataFrame(lpdf[["k", "ts", "lid"]], "k long, ts timestamp, lid long")
    right = spark.createDataFrame(rpdf, "k long, ts timestamp, rid long") if len(rpdf) else (
        spark.createDataFrame([], "k long, ts timestamp, rid long")
    )

    got = {
        r["lid"]: (r["rid"], r["asof_matched_ts"])
        for r in asof_join(
            left, right, on=["k"], left_ts="ts", right_ts="ts", direction=direction
        ).collect()
    }

    want_df = pd.merge_asof(
        lpdf.sort_values(["ts", "lid"]).reset_index(drop=True),
        rpdf.sort_values("ts").reset_index(drop=True),
        on="ts", by="k", direction=direction, allow_exact_matches=True,
    )
    want = {
        int(row.lid): (
            None if pd.isna(row.rid) else int(row.rid),
        )
        for row in want_df.itertuples()
    }
    assert set(got) == set(want)
    for lid, (rid, _mts) in got.items():
        assert (rid,) == want[lid], (lid, rid, want[lid], direction)


@_SETTINGS
@given(
    st.lists(  # (key, version) change events; duplicates dropped below
        st.tuples(st.integers(0, 5), st.integers(1, 6)),
        min_size=1, max_size=30,
    )
)
def test_scd2_property(spark, kv):
    """SCD2 vs a pure-python reference: for each key, versions sorted
    ascending chain valid_to = next version; exactly the last is
    current; history is lossless."""
    from wfc3_cte_monitor_spark.operators.upsert import scd2

    rows = sorted({(k, v) for k, v in kv})
    df = spark.createDataFrame([(k, v, float(k * 100 + v)) for k, v in rows],
                               "k int, version int, payload double")
    got = {
        (r["k"], r["version"]): (r["valid_to"], r["is_current"])
        for r in scd2(df, keys=["k"], version_col="version").collect()
    }
    assert len(got) == len(rows)
    by_key: dict = {}
    for k, v in rows:
        by_key.setdefault(k, []).append(v)
    for k, versions in by_key.items():
        versions.sort()
        for i, v in enumerate(versions):
            want_to = versions[i + 1] if i + 1 < len(versions) else None
            assert got[(k, v)] == (want_to, want_to is None), (k, v)


def _del_sigs(s: str) -> set:
    """Pure-python mirror of functions/dedup.deletion_signatures."""
    return {s[:i] + s[i + 1:] for i in range(len(s))} | {s}


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@_SETTINGS
@given(st.lists(st.text(alphabet="abc", min_size=1, max_size=7), min_size=2, max_size=12))
def test_deletion_signature_pigeonhole(spark, words):
    """The blocking COMPLETENESS claim behind d03's fuzzy arm, fuzzed:
    every pair within Levenshtein distance 1 must share a deletion
    signature (pure-python invariant), and the Spark fuzzy_candidates
    pipeline must surface every such pair as a candidate."""
    from wfc3_cte_monitor_spark.functions.dedup import fuzzy_candidates

    words = sorted(set(words))
    want = {
        (i, j)
        for i in range(len(words))
        for j in range(i + 1, len(words))
        if _lev(words[i], words[j]) <= 1
    }
    # invariant, checked directly: distance <= 1 => signature sets meet
    for i, j in want:
        assert _del_sigs(words[i]) & _del_sigs(words[j]), (words[i], words[j])

    named = spark.createDataFrame(list(enumerate(words)), "id long, name string")
    cands = {
        (r["id_a"], r["id_b"])
        for r in fuzzy_candidates(named, "id", "name").collect()
    }
    assert want <= cands  # blocking may over-generate, never under


@_SETTINGS
@given(
    st.lists(st.tuples(st.integers(0, 2), st.integers(0, 500), st.integers(0, 10**6)),
             min_size=1, max_size=20),
    st.lists(st.tuples(st.integers(0, 2), st.integers(0, 500), st.integers(0, 10**6)),
             min_size=0, max_size=20),
)
def test_asof_nearest_matches_reference(spark, left_rows, right_rows):
    """direction='nearest' vs a pure-python reference implementing the
    documented rule: smaller absolute gap wins, ties to backward."""
    import datetime as dt

    from wfc3_cte_monitor_spark.operators.asof_join import asof_join

    t0 = dt.datetime(2024, 1, 1)
    rseen: dict = {}
    for k, s, rid in right_rows:
        rseen[(k, s)] = max(rseen.get((k, s), -1), rid)

    def ref(k, s):
        back = [(ts, rid) for (rk, ts), rid in rseen.items() if rk == k and ts <= s]
        fwd = [(ts, rid) for (rk, ts), rid in rseen.items() if rk == k and ts >= s]
        b = max(back) if back else None
        f = min(fwd) if fwd else None
        if b is None:
            return f[1] if f else None
        if f is None:
            return b[1]
        return f[1] if (f[0] - s) < (s - b[0]) else b[1]

    left = spark.createDataFrame(
        [(i, k, t0 + dt.timedelta(seconds=s)) for i, (k, s, _x) in enumerate(left_rows)],
        "lid long, k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(k, t0 + dt.timedelta(seconds=s), rid) for (k, s), rid in sorted(rseen.items())]
        or [(None, None, None)],
        "k long, ts timestamp, rid long",
    ).where(F.col("k").isNotNull())

    got = {
        r["lid"]: r["rid"]
        for r in asof_join(
            left, right, on=["k"], left_ts="ts", right_ts="ts", direction="nearest"
        ).collect()
    }
    want = {i: ref(k, s) for i, (k, s, _x) in enumerate(left_rows)}
    assert got == want


@_SETTINGS
@given(
    st.lists(
        st.tuples(st.integers(0, 5), st.integers(-1000, 1000)),
        min_size=1,
        max_size=80,
    ),
    st.sampled_from([1, 2, 4, 16]),
)
def test_salted_rank_property(spark, rows, n_buckets):
    """salted_rank == plain window row_number for arbitrary group/order
    distributions (incl. all-one-group, constant order keys, negative
    keys) at every bucket count — the rank SET per group is exact; with
    ties the assignment is arbitrary in both, so compare per-group
    sorted (order_val, rank) multisets only where order keys are unique
    and rank SETS everywhere."""
    from wfc3_cte_monitor_spark.operators.salting import salted_rank

    df = spark.createDataFrame([(g, v) for g, v in rows], "g int, v int")
    got = salted_rank(df, "g", "v", n_buckets=n_buckets).collect()
    by_g: dict[int, list] = {}
    for r in got:
        by_g.setdefault(r.g, []).append((r.v, r.rnk))
    for g, pairs in by_g.items():
        vals = sorted(v for v, _ in pairs)
        # rank set is exactly 1..n
        assert sorted(rk for _, rk in pairs) == list(range(1, len(pairs) + 1))
        # where order keys are unique, rank must equal the sort position
        from collections import Counter

        cnt = Counter(vals)
        pos = {}
        i = 1
        for v in vals:
            if cnt[v] == 1:
                pos[v] = i
            i += 1
        for v, rk in pairs:
            if v in pos:
                assert rk == pos[v], (g, v, rk, pos[v])


@given(
    st.dictionaries(
        st.integers(0, 30),
        st.lists(st.integers(1, 9), min_size=0, max_size=24),
        min_size=2,
        max_size=12,
    ),
    st.integers(1, 4),
    st.integers(1, 3),
)
@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
def test_dict_bpe_lifecycle_property(docs, rounds, m):
    """Property form of the dict-BPE cross-engine gate, DuckDB-only (no
    Spark jobs — runs in milliseconds per example): for ARBITRARY small
    corpora, the generated dict-mode CTE chain must agree with the
    pure-python witness on the dictionary, the vocab, and the training
    encode; the encode→decode roundtrip over a corpus with injected
    OOV docs must be lossless back to the translated original. Extends
    the five fixed-seed cases with hypothesis-driven shapes (empty
    docs, single-token docs, all-identical corpora, m larger than the
    candidate pool)."""
    import duckdb

    from wfc3_cte_monitor_spark.operators.bpe_batch import (
        DICT_PACK,
        OOV_ID,
        batched_bpe_ctes_sql,
        batched_bpe_py,
        bpe_dict_decode_ctes_sql,
        bpe_dict_encode_ctes_sql,
    )

    # train needs at least one bigram somewhere or every round is the
    # identity — that case is legal and must ALSO hold, so no filtering
    full = dict(docs)
    full[999] = [3, 5, 10**6 + 7]  # guaranteed-OOV token rides through
    con = duckdb.connect()
    con.execute("CREATE TABLE thstr (doc_id BIGINT, th BIGINT[])")
    for d_, t in docs.items():
        con.execute("INSERT INTO thstr VALUES (?, ?)", [d_, t])
    con.execute("CREATE TABLE thsall (doc_id BIGINT, th BIGINT[])")
    for d_, t in full.items():
        con.execute("INSERT INTO thsall VALUES (?, ?)", [d_, t])
    sql = f"""WITH {batched_bpe_ctes_sql('thstr', rounds=rounds, m=m,
                                          prefix='bd', dict_mode=True)},
        {bpe_dict_encode_ctes_sql('thsall', rounds=rounds,
                                  trainer_prefix='bd', prefix='bi')},
        {bpe_dict_decode_ctes_sql(f'biths{rounds}', rounds=rounds,
                                  trainer_prefix='bd', prefix='bx')}
        SELECT 'v', round, rnk, ar, br, nid, cnt, NULL FROM bdvocab
        UNION ALL SELECT 'e', doc_id, NULL, NULL, NULL, NULL, NULL, th
        FROM bdths{rounds}
        UNION ALL SELECT 'x', doc_id, NULL, NULL, NULL, NULL, NULL, th
        FROM bxths{rounds}
        UNION ALL SELECT 'd', tid, NULL, tok, NULL, NULL, NULL, NULL
        FROM bddict"""
    rows = con.execute(sql).fetchall()
    ddict = {r[3]: r[1] for r in rows if r[0] == "d"}
    toks = sorted({t for ts in docs.values() for t in ts})
    pyd = {t: i for i, t in enumerate(toks)}
    assert ddict == pyd
    tr_ids = {d_: [pyd[t] for t in ts] for d_, ts in docs.items()}
    py_enc, py_voc = batched_bpe_py(
        tr_ids, rounds, m, pack=DICT_PACK, vocab_base=len(pyd)
    )
    assert sorted(py_voc) == sorted(r[1:7] for r in rows if r[0] == "v")
    assert py_enc == {r[1]: list(r[7]) for r in rows if r[0] == "e"}
    # decode(encode(full)) == translate-with-OOV(full), exactly
    want = {d_: [pyd.get(t, OOV_ID) for t in ts] for d_, ts in full.items()}
    assert want == {r[1]: list(r[7]) for r in rows if r[0] == "x"}
