"""Similarity-search queries over the embeddings table (additive surface):
brute-force cosine top-k baseline and the LSH-bucketed ANN scale path."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..checkpointing import materialize
from ..functions.similarity import (
    cosine_pd,
    cosine_sql,
    cosine_topk,
    decoded_corpus,
    ivf_ann,
    ivf_ann_sql,
    lsh_index,
    lsh_index_sql,
    neardup_pairs,
    neardup_pairs_sql,
)
from ..sources.catalog import load_table, spread
from .registry import register

_Q = "vec_id < 10"  # deterministic query set at every scale factor


# E1 — tagged union of the exact baseline and the IVF scale path:
#   kind='brute' — brute-force cosine top-5: query set broadcast against
#                  the streaming corpus (the correctness baseline).
#   kind='ivf'   — IVF (inverted-file) ANN top-5: sampled-init coarse
#                  quantizer (first nlist ids) REFINED with one
#                  deterministic Lloyd iteration (assign → per-list
#                  rounded component mean → reassign), nprobe probed
#                  lists per query, exact cosine re-rank on candidates
#                  only. Complements e02's LSH: recall bought with
#                  probed lists, not tables.
# Both branches gate against the same DuckDB twin structure, so IVF's
# deterministic build (centroid choice, Lloyd step, tiebreaks) is
# oracle-checked — and its recall is readable against the brute rows.
_IVF_REFINE_ITERS = 1


@register(
    "e01_cosine_topk",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
               FROM embeddings WHERE {_Q}),
    corpus AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS nv
               FROM embeddings),
    scored AS (
        SELECT q.query_id, corpus.neighbor_id,
               round({cosine_sql('q.qv', 'corpus.nv')}, 6) AS sim
        FROM corpus CROSS JOIN q
        WHERE corpus.neighbor_id <> q.query_id
    ),
    brute AS (
        SELECT 'brute' AS kind, query_id, neighbor_id, sim,
               CAST(rank AS INT) AS rank FROM (
            SELECT *, row_number() OVER (PARTITION BY query_id
                                         ORDER BY sim DESC, neighbor_id) AS rank
            FROM scored
        ) WHERE rank <= 5
    ),
    ivf AS ({ivf_ann_sql('embeddings', k=5, query_pred=_Q,
                         refine_iterations=_IVF_REFINE_ITERS)}),
    recall AS (
        SELECT b.query_id,
               count(i.neighbor_id)::BIGINT AS n_hits,
               round(count(i.neighbor_id) / 5.0, 6) AS recall_at_5
        FROM brute b
        LEFT JOIN ivf i ON i.query_id = b.query_id
                       AND i.neighbor_id = b.neighbor_id
        GROUP BY b.query_id
    )
    SELECT * FROM brute
    UNION ALL
    SELECT 'ivf' AS kind, query_id, neighbor_id, sim, rank FROM ivf
    UNION ALL
    SELECT 'recall' AS kind, query_id, n_hits AS neighbor_id,
           recall_at_5 AS sim, 5 AS rank
    FROM recall
    """,
    tags=("similarity", "topk", "ivf"),
)
def e01_cosine_topk(spark, sf_dir):
    """Top-5 cosine neighbors for 10 query vectors: exact brute-force
    baseline (query table broadcast, no corpus shuffle) unioned with the
    IVF approximate path (Lloyd-refined centroids; candidates via an
    equi-join on list_id — the probed-lists layout that at scale reads
    nprobe bucketed lists instead of the corpus), plus a 'recall' arm
    measuring the IVF path against the exact baseline per query
    (recall@5 — the ANN audit the driver value-checks, so an IVF change
    that silently trades recall away fails the gate, not just a
    dashboard)."""
    emb = spread(load_table(spark, sf_dir, "embeddings"), "vec_id")
    # ONE decoded-corpus materialization (vec_id, float64 v, norm) feeds
    # every corpus-sized pass — Lloyd partials, assignment, brute scoring
    # and the candidate re-rank otherwise each re-decode parquet and
    # re-widen float32→float64 (the r4 weak finding: the Lloyd arm
    # double-paid the corpus). The Lloyd collect materializes it; all
    # later passes read cached blocks and pay only their matmul.
    corpus = decoded_corpus(emb)
    # each arm feeds BOTH the union and the recall join; checkpoint the
    # ≤ k×n_queries-row results (lazily — no blocking materialization on
    # the timed path) so the corpus-sized scoring pipelines execute once.
    # Exchange reuse hides the duplication at sf0.1 (A/B was a wash) but
    # not at 10×: the corpus probe measured 6.2 s vs 2.4 s at sf1 with
    # the subtrees re-executed.
    brute = cosine_topk(corpus=corpus, k=5, query_pred=F.col("vec_id") < 10).select(
        F.lit("brute").alias("kind"), "query_id", "neighbor_id", "sim", "rank"
    ).transform(materialize)
    ivf = ivf_ann(corpus=corpus, k=5, query_pred=F.col("vec_id") < 10,
                  refine_iterations=_IVF_REFINE_ITERS).select(
        F.lit("ivf").alias("kind"), "query_id", "neighbor_id", "sim", "rank"
    ).transform(materialize)
    # with the arms materialized, the audit join is over two tiny cached
    # relations
    recall = (
        brute.select("query_id", "neighbor_id")
        .join(ivf.select("query_id", "neighbor_id").withColumn("_hit", F.lit(1)),
              ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(F.sum(F.coalesce("_hit", F.lit(0))).alias("n_hits"))
        .select(
            F.lit("recall").alias("kind"),
            "query_id",
            F.col("n_hits").cast("bigint").alias("neighbor_id"),
            F.round(F.col("n_hits") / F.lit(5.0), 6).alias("sim"),
            F.lit(5).alias("rank"),
        )
    )
    return brute.unionAll(ivf).unionAll(recall)


# E2 — tagged union of the two LSH-bucketed vector workloads:
#   kind='ann'     — multi-table LSH ANN (8 tables × 2 hyperplanes):
#                    a corpus vector is a candidate when it shares ANY
#                    table's bucket with a query; exact cosine re-ranks.
#                    (query_id, neighbor_id) = (query, neighbor); rank ≤ 3.
#   kind='neardup' — embedding-cosine near-duplicate pairs over the
#                    SELF-join near-dup index (4 tables × 8 planes, 256
#                    buckets/table); exact cosine ≥ τ on bucket-colliding
#                    pairs only. (query_id, neighbor_id) = (id_a < id_b);
#                    rank = pair rank by sim desc WITHIN id_a — a
#                    per-id window, because a global rank would funnel
#                    every surviving pair through one sort task at scale.
#   kind='recall'  — recall@3 of the LSH ANN arm vs a brute-force top-3
#                    baseline on the same 10 queries, per query — the
#                    audit that makes a hyperplane/table change that
#                    silently craters recall FAIL the value gate (the
#                    e01 'recall' arm's twin for the LSH path).
# τ = 0.35 is matched to this synthetic corpus's similarity scale (max
# pairwise cosine ≈ 0.51 — no planted near-dups); the plan is
# threshold-independent. Both branches confine quadratic work to buckets.
_ND_TAU = 0.35


@register(
    "e02_ann_neardup",
    oracle=f"""
    WITH idx AS ({lsh_index_sql('embeddings')}),
    q AS (SELECT vec_id AS query_id, v AS qv, table_id, bucket FROM idx WHERE {_Q}),
    cands AS (
        SELECT DISTINCT q.query_id, c.vec_id AS neighbor_id
        FROM idx c JOIN q ON c.table_id = q.table_id AND c.bucket = q.bucket
        WHERE c.vec_id <> q.query_id
    ),
    scored AS (
        SELECT cands.query_id, cands.neighbor_id,
               round({cosine_sql(
                   'CAST(a.embedding AS DOUBLE[])', 'CAST(b.embedding AS DOUBLE[])')}, 6) AS sim
        FROM cands
        JOIN embeddings a ON a.vec_id = cands.query_id
        JOIN embeddings b ON b.vec_id = cands.neighbor_id
    ),
    ann AS (
        SELECT 'ann' AS kind, query_id, neighbor_id, sim, CAST(rank AS INT) AS rank FROM (
            SELECT *, row_number() OVER (PARTITION BY query_id
                                         ORDER BY sim DESC, neighbor_id) AS rank
            FROM scored
        ) WHERE rank <= 3
    ),
    nd AS ({neardup_pairs_sql('embeddings', _ND_TAU)}),
    brute3 AS (
        SELECT query_id, neighbor_id FROM (
            SELECT q.query_id, c.vec_id AS neighbor_id,
                   row_number() OVER (
                       PARTITION BY q.query_id
                       ORDER BY round({cosine_sql(
                           'q.qv', 'CAST(c.embedding AS DOUBLE[])')}, 6) DESC,
                                c.vec_id) AS rnk
            FROM embeddings c
            CROSS JOIN (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
                        FROM embeddings WHERE {_Q}) q
            WHERE c.vec_id <> q.query_id
        ) WHERE rnk <= 3
    ),
    rec AS (
        SELECT b.query_id,
               count(i.neighbor_id)::BIGINT AS n_hits,
               round(count(i.neighbor_id) / 3.0, 6) AS recall_at_3
        FROM brute3 b
        LEFT JOIN ann i ON i.query_id = b.query_id
                       AND i.neighbor_id = b.neighbor_id
        GROUP BY b.query_id
    )
    SELECT * FROM ann
    UNION ALL
    SELECT 'neardup' AS kind, id_a AS query_id, id_b AS neighbor_id, sim,
           CAST(row_number() OVER (PARTITION BY id_a
                                   ORDER BY sim DESC, id_b) AS INT) AS rank
    FROM nd
    UNION ALL
    SELECT 'recall' AS kind, query_id, n_hits AS neighbor_id,
           recall_at_3 AS sim, 3 AS rank
    FROM rec
    """,
    tags=("similarity", "ann", "lsh", "dedup", "neardup"),
)
def e02_ann_neardup(spark, sf_dir):
    """LSH ANN + embedding-cosine near-dup, one tagged union: candidate
    generation in BOTH branches is an equi-join on (table_id, bucket) —
    never a cross join — and only candidates pay the exact-cosine cost.
    The 100 TB shape: each index is written bucketed so ANN probes are
    pruned scans and the near-dup self-join is co-located."""
    emb = spread(load_table(spark, sf_dir, "embeddings"), "vec_id")
    # the ANN arm reads the index twice (query probe + corpus side of the
    # candidate join); materialize the pruned bucket layout once so the
    # Arrow bucket pass runs a single time (vectors re-attach by id later)
    idx = lsh_index(emb).select("vec_id", "table_id", "bucket").transform(materialize)
    # Candidate generation and the multi-table collision dedup move bare
    # (query_id, neighbor_id) pairs — never the 512-byte embedding arrays,
    # which would otherwise ride through two shuffles (dropDuplicates +
    # the rank window). Vectors re-attach afterwards: the 10-row query
    # side broadcast, the corpus side an id equi-join (co-located by id
    # at scale). Measured 2.7× on the branch at sf0.1.
    q = idx.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "table_id", "bucket"
    )
    cands = (
        idx.join(F.broadcast(q), ["table_id", "bucket"])
        .where(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    qv = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").cast("array<double>").alias("qv")
    )
    nv = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").cast("array<double>").alias("nv")
    )
    cos = cosine_pd()
    scored = (
        cands.join(F.broadcast(qv), "query_id")
        .join(nv, "neighbor_id")
        .select("query_id", "neighbor_id", F.round(cos(F.col("qv"), F.col("nv")), 6).alias("sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    # ann feeds the union AND the recall audit join — lazily checkpoint
    # the ≤ 3×n_queries-row result so the candidate pipeline runs once
    # (same diamond hygiene as e01's arms)
    ann = (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= 3)
        .select(F.lit("ann").alias("kind"), "query_id", "neighbor_id", "sim", "rank")
        .transform(materialize)
    )
    nd = neardup_pairs(emb, _ND_TAU)
    wn = Window.partitionBy("id_a").orderBy(F.col("sim").desc(), F.col("id_b"))
    neardup = nd.select(
        F.lit("neardup").alias("kind"),
        F.col("id_a").alias("query_id"),
        F.col("id_b").alias("neighbor_id"),
        "sim",
        F.row_number().over(wn).cast("int").alias("rank"),
    )
    # recall@3 audit: brute-force top-3 baseline on the same query set
    # (one streamed corpus pass, query side broadcast), hits counted
    # against the ann arm per query — the driver value-checks it, so a
    # plane/table change that trades recall away fails the gate
    brute3 = cosine_topk(
        corpus=decoded_corpus(emb, checkpoint=False), k=3,
        query_pred=F.col("vec_id") < 10,
    ).select("query_id", "neighbor_id")
    recall = (
        brute3
        .join(ann.select("query_id", "neighbor_id").withColumn("_hit", F.lit(1)),
              ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(F.sum(F.coalesce("_hit", F.lit(0))).alias("n_hits"))
        .select(
            F.lit("recall").alias("kind"),
            "query_id",
            F.col("n_hits").cast("bigint").alias("neighbor_id"),
            F.round(F.col("n_hits") / F.lit(3.0), 6).alias("sim"),
            F.lit(3).alias("rank"),
        )
    )
    return ann.unionAll(neardup).unionAll(recall)
