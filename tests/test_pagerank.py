"""integer_pagerank operator-level tests: the Spark loop, the DuckDB
generated-CTE chain and the pure-python recurrence must agree exactly
(all-integer arithmetic — no tolerance) on fuzzed random graphs."""

from __future__ import annotations

import duckdb
import pytest

from wfc3_cte_monitor_spark.operators.pagerank import (
    integer_pagerank,
    integer_pagerank_ctes_sql,
    integer_pagerank_py,
)


def _spark_pr(spark, edges, k):
    df = spark.createDataFrame(edges, "src long, dst long, w long")
    return {
        r["node"]: (r["mass"], r["prev_mass"])
        for r in integer_pagerank(df, k=k, node_col="node").collect()
    }


def _duck_pr(edges, k):
    vals = ", ".join(f"({s}, {d}, {w})" for s, d, w in edges)
    ctes = integer_pagerank_ctes_sql("pre", k=k)
    sql = f"""
    WITH pre AS (SELECT * FROM (VALUES {vals}) AS t(src, dst, w)),
    {ctes}
    SELECT a.node, a.mass, b.mass FROM pr{k} a JOIN pr{k - 1} b ON a.node = b.node
    """
    return {r[0]: (r[1], r[2]) for r in duckdb.connect().execute(sql).fetchall()}


def test_pagerank_three_engines_agree_on_random_graphs(spark):
    import random

    rng = random.Random(20260818)
    for trial in range(3):
        n = rng.randrange(4, 12)
        m = rng.randrange(3, 3 * n)
        edges = {}
        for _ in range(m):
            s, d = rng.randrange(n), rng.randrange(n)
            if s != d:
                edges[(s, d)] = edges.get((s, d), 0) + rng.randrange(1, 4)
        e = [(s, d, w) for (s, d), w in edges.items()]
        if not e:
            continue
        k = rng.randrange(1, 5)
        want = integer_pagerank_py(e, k=k)
        assert _spark_pr(spark, e, k) == want, (trial, e, k)
        assert _duck_pr(e, k) == want, (trial, e, k)


def test_pagerank_sink_and_source_structure(spark):
    """A hub pointed at by everyone must outrank its pointers; a pure
    source (no inlinks) holds exactly the uniform base; dangling-node
    mass evaporates deterministically (Σ mass < scale but > 0)."""
    from wfc3_cte_monitor_spark.operators.pagerank import PR_SCALE

    # 0..3 all point at 4; 4 points nowhere (dangling hub)
    e = [(i, 4, 1) for i in range(4)]
    got = _spark_pr(spark, e, 5)
    assert got == integer_pagerank_py(e, k=5)
    masses = {v: m for v, (m, _) in got.items()}
    base = (PR_SCALE * 15) // (100 * 5)
    for v in range(4):
        assert masses[v] == base  # pure sources: base only
    assert masses[4] > masses[0] * 2  # the hub dominates
    assert 0 < sum(masses.values()) <= PR_SCALE


def test_pagerank_rejects_bad_k(spark):
    df = spark.createDataFrame([(1, 2, 1)], "src long, dst long, w long")
    with pytest.raises(ValueError):
        integer_pagerank(df, k=0)
    with pytest.raises(ValueError):
        integer_pagerank_ctes_sql("e", k=0)


def test_pagerank_weight_cap_enforced_all_twins(spark):
    """r8 ADVICE: weights past ~1.1e7 overflow int64 in the mass
    distribution — Spark (non-ANSI) would wrap silently while DuckDB
    errors. All three twins now clamp w to PR_W_CAP at ingestion, so a
    pathological multiplicity yields the SAME (finite, positive) masses
    everywhere instead of divergent failure modes."""
    from wfc3_cte_monitor_spark.operators.pagerank import PR_W_CAP

    # w far past the documented 2^63/(scale*damp/100) bound; uncapped,
    # retained*w ≈ 8.5e11 * 2e9 ≈ 1.7e21 >> 2^63
    e = [(1, 2, 2 * 10**9), (2, 3, 1), (3, 1, PR_W_CAP + 5)]
    want = integer_pagerank_py(e, k=3)
    capped = integer_pagerank_py([(s, d, min(w, PR_W_CAP)) for s, d, w in e], k=3)
    assert want == capped  # the python twin itself clamps
    assert all(m > 0 for m, _ in want.values())  # no wrap to negatives
    assert _spark_pr(spark, e, 3) == want
    assert _duck_pr(e, 3) == want


def test_pagerank_null_weight_fails_fast(spark):
    """r9 ADVICE: least(w, cap) ignores NULLs in Spark, so a NULL edge
    weight used to saturate silently to the cap. The contract is bigint
    w >= 1 — a NULL is a caller bug and must raise at execution, not
    distribute 10^6 units of phantom mass."""
    df = spark.createDataFrame(
        [(1, 2, 3), (2, 1, None)], "src long, dst long, w long"
    )
    with pytest.raises(Exception, match="must be non-null"):
        integer_pagerank(df, k=1, node_col="node").collect()
