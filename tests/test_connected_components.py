"""connected_components must reach the true fixpoint — in particular on
chains longer than any fixed round count (the case the old 3-round
propagation in d02 could not collapse)."""

from __future__ import annotations

from pyspark.sql import functions as F

from wfc3_cte_monitor_spark.operators.connected_components import connected_components


def _run(spark, n_vertices, undirected_edges):
    vertices = spark.createDataFrame([(i,) for i in range(n_vertices)], "doc_id long")
    if undirected_edges:
        both = [(a, b) for a, b in undirected_edges] + [(b, a) for a, b in undirected_edges]
    else:
        both = []
    edges = spark.createDataFrame(both or [(None, None)], "src long, dst long")
    if not both:
        edges = edges.where(F.col("src").isNotNull())
    out = connected_components(vertices, edges)
    return {r["doc_id"]: r["label"] for r in out.collect()}


def test_long_chain_collapses(spark):
    # a 40-vertex path: 0-1-2-...-39. Fixed 3-round HashMin labels vertex
    # 39 as 36; the converged operator must label everything 0.
    labels = _run(spark, 40, [(i, i + 1) for i in range(39)])
    assert set(labels.values()) == {0}


def test_disjoint_components_and_singletons(spark):
    labels = _run(spark, 10, [(1, 2), (2, 3), (5, 6), (8, 9)])
    assert labels[1] == labels[2] == labels[3] == 1
    assert labels[5] == labels[6] == 5
    assert labels[8] == labels[9] == 8
    for singleton in (0, 4, 7):
        assert labels[singleton] == singleton


def test_no_edges(spark):
    labels = _run(spark, 5, [])
    assert labels == {i: i for i in range(5)}


def test_star_and_cycle(spark):
    # star centered high (7 connects 3,4,5,6) plus a 3-cycle 0-1-2-0
    labels = _run(spark, 8, [(7, 3), (7, 4), (7, 5), (7, 6), (0, 1), (1, 2), (2, 0)])
    assert labels[3] == labels[4] == labels[5] == labels[6] == labels[7] == 3
    assert labels[0] == labels[1] == labels[2] == 0


def test_random_graphs_match_union_find(spark):
    """Deterministic pseudo-random graphs vs a pure-python union-find
    reference — the operator must produce the component MINIMUM for
    every vertex on shapes (chains, cliques, stars, crosses) that no
    hand-built case enumerates."""
    import random

    rng = random.Random(20260815)
    for trial in range(3):
        n = rng.randrange(12, 40)
        m = rng.randrange(0, n * 2)
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
        edges = [(a, b) for a, b in edges if a != b]

        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        want = {v: find(v) for v in range(n)}

        got = _run(spark, n, edges)
        assert got == want, (trial, n, edges)


def test_incremental_components_equals_full(spark):
    """Incremental maintenance == full recompute, fuzzed over random
    base/delta edge splits INCLUDING delta-only vertices and
    cross-component merge cascades (a delta edge chain merging three
    existing components through a new vertex)."""
    import random

    from pyspark.sql import functions as F

    from wfc3_cte_monitor_spark.operators.connected_components import (
        incremental_components,
    )

    rng = random.Random(20260816)
    for trial in range(3):
        n_base = rng.randrange(8, 20)
        n_new = rng.randrange(1, 5)
        n = n_base + n_new
        base_edges = [
            (rng.randrange(n_base), rng.randrange(n_base))
            for _ in range(rng.randrange(0, n_base))
        ]
        base_edges = [(a, b) for a, b in base_edges if a != b]
        # delta edges may touch new vertices and bridge old components
        delta_edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(rng.randrange(1, n))
        ]
        delta_edges = [(a, b) for a, b in delta_edges if a != b]

        full = _run(spark, n, base_edges + delta_edges)

        store = _run(spark, n_base, base_edges)  # persisted labeling
        labels = spark.createDataFrame(
            [(v, l) for v, l in store.items()]
            + [(v, v) for v in range(n_base, n)],  # new vertices self-labeled
            "doc_id long, label long",
        )
        both = [(a, b) for a, b in delta_edges] + [(b, a) for a, b in delta_edges]
        ne = spark.createDataFrame(both or [(None, None)], "src long, dst long")
        if not both:
            ne = ne.where(F.col("src").isNotNull())
        got = {
            r["doc_id"]: r["label"]
            for r in incremental_components(labels, ne).collect()
        }
        assert got == full, (trial, base_edges, delta_edges)


def test_incremental_components_orphan_endpoint_raises(spark):
    """The self-label caller contract is ENFORCED: a delta edge whose
    endpoint has no store row raises instead of silently dropping the
    edge (which would yield a wrong labeling)."""
    from wfc3_cte_monitor_spark.operators.connected_components import (
        incremental_components,
    )

    labels = spark.createDataFrame([(0, 0), (1, 0)], "doc_id long, label long")
    # vertex 99 never self-labeled
    ne = spark.createDataFrame([(1, 99), (99, 1)], "src long, dst long")
    try:
        incremental_components(labels, ne)
    except ValueError as e:
        assert "99" in str(e) and "self-label" in str(e)
    else:
        raise AssertionError("expected ValueError for orphan endpoint")


def test_incremental_components_never_shuffles_the_store(spark):
    """The maintenance contract at scale: the corpus-sized label store
    STREAMS through broadcast joins (delta side broadcast) and never
    rides an exchange — an un-hinted plan was observed to SortMergeJoin,
    exchanging the store for the two lookups and the final remap."""
    from pyspark.sql import functions as F

    from wfc3_cte_monitor_spark.operators.connected_components import (
        incremental_components,
    )

    labels = spark.createDataFrame([(i, i) for i in range(1000)], "doc_id long, label long")
    ne = spark.createDataFrame([(1, 2), (2, 1)], "src long, dst long")
    out = incremental_components(labels, ne)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the final remap must broadcast the (delta-sized) remap relation:
    # no exchange may partition the store by its label column
    assert "Exchange hashpartitioning(label#" not in plan, plan
    # and the result is still the merged labeling
    rows = {r["doc_id"]: r["label"] for r in out.collect()}
    assert rows[1] == rows[2] == min(1, 2) and rows[3] == 3


def test_incremental_components_with_reps_equals_full_election(spark):
    """Decision-store maintenance == full recompute + full re-election,
    fuzzed: merged components must re-elect their representative as the
    argmax of (nu, -id) over the WHOLE merged membership — which the
    operator reaches from the merged old winners only."""
    import random

    from pyspark.sql import functions as F

    from wfc3_cte_monitor_spark.operators.connected_components import (
        incremental_components_with_reps,
    )

    rng = random.Random(20260817)
    for trial in range(3):
        n_base = rng.randrange(8, 20)
        n_new = rng.randrange(1, 5)
        n = n_base + n_new
        nu = {v: rng.randrange(1, 6) for v in range(n)}  # ties are common
        base_edges = [
            (rng.randrange(n_base), rng.randrange(n_base))
            for _ in range(rng.randrange(0, n_base))
        ]
        base_edges = [(a, b) for a, b in base_edges if a != b]
        delta_edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(rng.randrange(1, n))
        ]
        delta_edges = [(a, b) for a, b in delta_edges if a != b]

        # pure-python reference: full CC then argmax(nu, -id) per component
        full = _run(spark, n, base_edges + delta_edges)
        comp_members: dict[int, list[int]] = {}
        for v, l in full.items():
            comp_members.setdefault(l, []).append(v)
        want_rep = {
            l: max(ms, key=lambda v: (nu[v], -v)) for l, ms in comp_members.items()
        }

        # persisted base store: base CC labels + per-component election
        base = _run(spark, n_base, base_edges)
        base_members: dict[int, list[int]] = {}
        for v, l in base.items():
            base_members.setdefault(l, []).append(v)
        base_rep = {
            l: max(ms, key=lambda v: (nu[v], -v)) for l, ms in base_members.items()
        }
        rows = [(v, base[v], nu[v], base_rep[base[v]]) for v in range(n_base)]
        # new vertices enter self-labeled as their own rep
        rows += [(v, v, nu[v], v) for v in range(n_base, n)]
        store = spark.createDataFrame(
            rows, "doc_id long, label long, nu long, rep_id long"
        )
        both = [(a, b) for a, b in delta_edges] + [(b, a) for a, b in delta_edges]
        ne = spark.createDataFrame(both, "src long, dst long")

        got = {
            r["doc_id"]: (r["label"], r["rep_id"], r["keep"])
            for r in incremental_components_with_reps(store, ne).collect()
        }
        for v in range(n):
            l, rep, keep = got[v]
            assert l == full[v], (trial, v, got[v], full[v])
            assert rep == want_rep[full[v]], (trial, v, got[v], want_rep[full[v]])
            assert keep == (1 if v == rep else 0), (trial, v, got[v])


def test_cc_foreign_edge_endpoints_are_ignored(spark):
    """An edge endpoint absent from `vertices` must neither receive a
    label nor propagate one — the pre-incident-optimization semantics,
    now enforced by the incident ∩ vertices intersection."""
    vertices = spark.createDataFrame([(5,), (6,), (7,)], "doc_id long")
    # 0 is NOT a vertex; edges 0-5 and 0-6 must not merge 5 and 6
    # through the foreign vertex, nor relabel them to 0
    both = [(0, 5), (5, 0), (0, 6), (6, 0)]
    edges = spark.createDataFrame(both, "src long, dst long")
    out = {r["doc_id"]: r["label"] for r in connected_components(vertices, edges).collect()}
    assert out == {5: 5, 6: 6, 7: 7}
