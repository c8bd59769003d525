"""Similarity-search queries over the embeddings table (additive surface):
brute-force cosine top-k baseline and the LSH-bucketed ANN scale path."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..functions.similarity import bucket_expr, bucket_expr_sql, cosine, cosine_sql, cosine_topk
from ..sources.catalog import load_table
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
    emb = load_table(spark, sf_dir, "embeddings")
    return cosine_topk(emb, k=5, query_pred=F.col("vec_id") < 10)


# E2 — LSH-bucketed ANN: 4 integer hyperplanes → 16 buckets; candidates
# share the query's bucket, then exact cosine re-ranks inside the bucket.
@register(
    "e02_lsh_ann",
    oracle=f"""
    WITH bucketed AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
               {bucket_expr_sql('embedding')} AS bucket
        FROM embeddings
    ),
    q AS (SELECT vec_id AS query_id, v AS qv, bucket FROM bucketed WHERE {_Q}),
    scored AS (
        SELECT q.query_id, c.vec_id AS neighbor_id, q.bucket,
               round({cosine_sql('q.qv', 'c.v')}, 6) AS sim
        FROM bucketed c JOIN q ON c.bucket = q.bucket
        WHERE c.vec_id <> q.query_id
    )
    SELECT query_id, neighbor_id, bucket, sim, CAST(rank AS INT) AS rank FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY sim DESC, neighbor_id) AS rank
        FROM scored
    ) WHERE rank <= 3
    """,
    tags=("similarity", "ann", "lsh"),
)
def e02_lsh_ann(spark, sf_dir):
    """ANN via random-hyperplane buckets: the equi-join on bucket id
    replaces the cross join — the 100 TB shape (quadratic work confined
    to buckets)."""
    emb = load_table(spark, sf_dir, "embeddings")
    bucketed = emb.select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("v"),
        bucket_expr(F.col("embedding")).alias("bucket"),
    )
    q = bucketed.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), "bucket"
    )
    scored = (
        bucketed.join(F.broadcast(q), "bucket")
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            "bucket",
            F.round(cosine(F.col("qv"), F.col("v")), 6).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= 3)
        .select("query_id", "neighbor_id", "bucket", "sim", "rank")
    )
