"""Similarity-search queries over the embeddings table (additive surface):
brute-force cosine top-k baseline and the LSH-bucketed ANN scale path."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..functions.similarity import cosine, cosine_sql, cosine_topk, lsh_index, lsh_index_sql
from ..sources.catalog import load_table, spread
from .registry import register

_Q = "vec_id < 10"  # deterministic query set at every scale factor


# E1 — brute-force cosine top-k (correctness baseline).
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
    )
    SELECT query_id, neighbor_id, sim, CAST(rank AS INT) AS rank FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY sim DESC, neighbor_id) AS rank
        FROM scored
    ) WHERE rank <= 5
    """,
    tags=("similarity", "topk"),
)
def e01_cosine_topk(spark, sf_dir):
    """Top-5 cosine neighbors for 10 query vectors, corpus-side streaming
    with the query table broadcast (no corpus shuffle)."""
    emb = spread(load_table(spark, sf_dir, "embeddings"), "vec_id")
    return cosine_topk(emb, k=5, query_pred=F.col("vec_id") < 10)


# E2 — multi-table LSH ANN: 8 tables × 2 random hyperplanes; a corpus
# vector is a candidate when it shares ANY table's bucket with the query,
# then exact cosine re-ranks the candidates.
@register(
    "e02_lsh_ann",
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
    )
    SELECT query_id, neighbor_id, sim, CAST(rank AS INT) AS rank FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY sim DESC, neighbor_id) AS rank
        FROM scored
    ) WHERE rank <= 3
    """,
    tags=("similarity", "ann", "lsh"),
)
def e02_lsh_ann(spark, sf_dir):
    """ANN via the multi-table LSH index: candidate generation is an
    equi-join on (table_id, bucket) — never a cross join — and only
    candidates pay the exact-cosine cost. The 100 TB shape: the index is
    written bucketed so probes are pruned scans."""
    emb = spread(load_table(spark, sf_dir, "embeddings"), "vec_id")
    idx = lsh_index(emb)
    q = idx.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), "table_id", "bucket"
    )
    cands = (
        idx.join(F.broadcast(q), ["table_id", "bucket"])
        .where(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "qv", "v")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cands.select(
        "query_id", "neighbor_id", F.round(cosine(F.col("qv"), F.col("v")), 6).alias("sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= 3)
        .select("query_id", "neighbor_id", "sim", "rank")
    )
