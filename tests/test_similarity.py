"""IVF inverted-file ANN: recall vs brute force, deterministic build."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_ivf_ann_recall_vs_bruteforce(spark, sf_smoke):
    from wfc3_cte_monitor_spark.functions.similarity import cosine_topk, ivf_ann
    from wfc3_cte_monitor_spark.sources.catalog import load_table

    emb = load_table(spark, sf_smoke, "embeddings")
    pred = F.col("vec_id") < 8
    exact = {(r.query_id, r.neighbor_id) for r in cosine_topk(emb, k=5, query_pred=pred).collect()}
    approx_rows = ivf_ann(emb, k=5, nprobe=3, query_pred=pred).collect()
    approx = {(r.query_id, r.neighbor_id) for r in approx_rows}
    # per-query structure: <=5 neighbors, ranks 1..n, no self-matches
    per = {}
    for r in approx_rows:
        per.setdefault(r.query_id, []).append(r.rank)
        assert r.query_id != r.neighbor_id
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in per.values())
    # recall against brute force: nprobe=3/16 lists should still find a
    # meaningful share of true neighbors on the smoke corpus
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.3, recall


def test_ivf_assignment_deterministic(spark, sf_smoke):
    from wfc3_cte_monitor_spark.functions.similarity import ivf_assign, ivf_centroids
    from wfc3_cte_monitor_spark.sources.catalog import load_table

    emb = load_table(spark, sf_smoke, "embeddings")
    cents = ivf_centroids(emb)
    a1 = {r.vec_id: r.list_id for r in ivf_assign(emb, cents).collect()}
    a2 = {r.vec_id: r.list_id for r in ivf_assign(emb, cents).collect()}
    assert a1 == a2
    assert set(a1.values()) <= set(range(16))


def test_ivf_refine_improves_or_holds_quantization(spark, sf_smoke):
    """Lloyd iterations must not increase total quantization error
    (sum of 1 - cos(v, centroid)) and must keep the list count stable."""
    from wfc3_cte_monitor_spark.functions.similarity import (
        cosine,
        ivf_assign,
        ivf_centroids,
        ivf_refine,
    )
    from wfc3_cte_monitor_spark.sources.catalog import load_table

    emb = load_table(spark, sf_smoke, "embeddings")
    c0 = ivf_centroids(emb)
    c1 = ivf_refine(emb, c0, iterations=2)
    assert c1.count() == c0.count()

    def err(cents):
        a = ivf_assign(emb, cents)
        return (
            a.join(cents, "list_id")
            .select((1.0 - cosine(F.col("v"), F.col("cv"))).alias("e"))
            .agg(F.sum("e"))
            .collect()[0][0]
        )

    e0, e1 = err(c0), err(c1)
    assert e1 <= e0 + 1e-9, (e0, e1)


def test_ivf_refine_deterministic(spark, sf_smoke):
    from wfc3_cte_monitor_spark.functions.similarity import ivf_centroids, ivf_refine
    from wfc3_cte_monitor_spark.sources.catalog import load_table

    emb = load_table(spark, sf_smoke, "embeddings")
    c = ivf_centroids(emb)
    r1 = {r.list_id: tuple(r.cv) for r in ivf_refine(emb, c).collect()}
    r2 = {r.list_id: tuple(r.cv) for r in ivf_refine(emb, c).collect()}
    assert r1 == r2


def test_ivf_refine_matches_numpy_reference(spark, sf_smoke):
    # the fused assignment+partial-sum Lloyd pass must equal a naive
    # single-machine Lloyd step: assign on rounded sims (half-away,
    # list_id tiebreak), per-list component mean rounded to 6, empty
    # lists keeping the previous centroid
    import numpy as np

    from wfc3_cte_monitor_spark.functions.similarity import (
        N_LISTS,
        _round6_half_away,
        ivf_centroids,
        ivf_refine,
    )
    from wfc3_cte_monitor_spark.sources.catalog import load_table

    emb = load_table(spark, sf_smoke, "embeddings")
    rows = sorted(
        ((r.vec_id, np.array(r.embedding, dtype=float)) for r in emb.collect()),
        key=lambda t: t[0],
    )
    M = np.stack([v for _, v in rows])
    C = M[:N_LISTS].copy()
    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
    sims = _round6_half_away((M @ Cn.T) / np.linalg.norm(M, axis=1, keepdims=True))
    best = np.argmax(sims, axis=1)
    expected = {}
    for lid in range(N_LISTS):
        members = M[best == lid]
        if len(members):
            expected[lid] = tuple(
                float(np.round(x, 6)) for x in members.mean(axis=0)
            )
        else:
            expected[lid] = tuple(C[lid])

    got = {
        r.list_id: tuple(r.cv)
        for r in ivf_refine(emb, ivf_centroids(emb), iterations=1).collect()
    }
    assert set(got) == set(expected)
    for lid in expected:
        assert np.allclose(got[lid], expected[lid], atol=1.5e-6), lid


def test_int8_quantization_bounds(spark, sf_smoke):
    """int8_quantized must emit components in [-127, 127] whose scale
    reconstruction stays within half a quantization step per component,
    and whose reconstructed cosine tracks the exact cosine."""
    import numpy as np

    from wfc3_cte_monitor_spark.functions.similarity import (
        decoded_corpus, int8_quantized,
    )
    from wfc3_cte_monitor_spark.sources.catalog import load_table

    emb = load_table(spark, sf_smoke, "embeddings")
    corpus = {r.vec_id: np.array(r.v) for r in decoded_corpus(emb, checkpoint=False).collect()}
    rows = int8_quantized(decoded_corpus(emb, checkpoint=False)).collect()
    assert len(rows) == len(corpus)
    for r in rows:
        q = np.array(r.qv, dtype=float)
        v = corpus[r.vec_id]
        assert np.abs(np.array(r.qv)).max() <= 127
        # reconstruction error per component ≤ s/2 (+ float slack)
        assert np.abs(q * r.s - v).max() <= r.s / 2 + 1e-12, r.vec_id
    ids = sorted(corpus)[:20]
    qrows = {r.vec_id: (np.array(r.qv, dtype=float), r.s) for r in rows}
    errs = []
    for a, b in zip(ids, ids[1:]):
        va, vb = corpus[a], corpus[b]
        qa, sa = qrows[a]
        qb, sb = qrows[b]
        exact = va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb))
        quant = (qa @ qb) * sa * sb / (np.linalg.norm(va) * np.linalg.norm(vb))
        errs.append(abs(exact - quant))
    assert max(errs) < 0.01, max(errs)


def test_trunc_arm_matches_numpy_prefix_topk(spark, sf_smoke):
    """The e02 'trunc' arm: top-3 by cosine over the first _TRUNC_D
    components must equal a numpy reference computed from the raw
    vectors (same rounding, same (sim desc, id) tiebreak)."""
    import numpy as np

    from wfc3_cte_monitor_spark.plans.similarity_queries import (
        _TRUNC_D,
        e02_ann_neardup,
    )
    from wfc3_cte_monitor_spark.sources.catalog import load_table

    emb = load_table(spark, sf_smoke, "embeddings").collect()
    ids = np.array([r.vec_id for r in emb])
    order = np.argsort(ids, kind="stable")
    ids = ids[order]
    M = np.stack([np.asarray(emb[i].embedding, dtype=np.float64) for i in order])
    P = M[:, :_TRUNC_D]

    rows = [
        r for r in e02_ann_neardup(spark, sf_smoke).collect() if r.kind == "trunc"
    ]
    by_query: dict[int, list] = {}
    for r in rows:
        by_query.setdefault(r.query_id, []).append(r)

    qidx = {int(v): i for i, v in enumerate(ids)}
    for q in [int(v) for v in ids if v < 10]:
        sims = P @ P[qidx[q]] / (
            np.linalg.norm(P, axis=1) * np.linalg.norm(P[qidx[q]])
        )
        cand = [
            (-round(float(s), 6), int(i)) for s, i in zip(sims, ids) if i != q
        ]
        expect = sorted(cand)[:3]
        got = sorted((-r.sim, r.neighbor_id) for r in by_query[q])
        assert len(got) == 3
        assert [(round(-e[0], 6), e[1]) for e in expect] == [
            (round(-g[0], 6), g[1]) for g in got
        ], (q, expect, got)


def test_semdedup_finds_planted_vector_dups(spark, sf_smoke):
    """Plant an exact copy and a tiny-perturbation copy of two corpus
    vectors: both copies land in the same cluster as their original and
    must be removed with the original as keeper (cosine ~1 >= tau)."""
    from pyspark.sql import functions as F

    from wfc3_cte_monitor_spark.functions.similarity import ivf_semdedup
    from wfc3_cte_monitor_spark.sources.catalog import load_table

    emb = load_table(spark, sf_smoke, "embeddings").select("vec_id", "embedding")
    exact = emb.where(F.col("vec_id") == 3).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    near = emb.where(F.col("vec_id") == 7).select(
        (F.col("vec_id") + 200000).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(1.001)).cast(
            "array<float>"
        ).alias("embedding"),
    )
    corpus = emb.unionByName(exact).unionByName(near)
    removed = {
        r["removed_id"]: r["keeper_id"]
        for r in ivf_semdedup(corpus, tau=0.95).collect()
    }
    assert removed.get(100003) == 3
    # scaling preserves direction: cosine(v, 1.001*v) == 1 up to rounding
    assert removed.get(200007) == 7


def test_semdedup_keeper_is_min_qualifying_id(spark):
    """Three mutually-near vectors: 1 and 2 both qualify against 3; the
    keeper must be the MINIMUM qualifying lower id (deterministic), and
    the lowest id of the group must never be removed."""
    from wfc3_cte_monitor_spark.functions.similarity import ivf_semdedup

    base = [1.0] * 64
    rows = [
        (1, [x * 1.0 for x in base]),
        (2, [x * 1.0002 for x in base]),
        (3, [x * 1.0001 for x in base]),
        (4, [-x for x in base]),  # opposite direction: untouched
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {r["removed_id"]: r["keeper_id"] for r in ivf_semdedup(df, tau=0.9).collect()}
    assert got == {2: 1, 3: 1}
