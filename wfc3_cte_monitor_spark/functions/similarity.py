"""Vector similarity search over an embedding column.

Two paths, mirroring what a production corpus needs:

- BRUTE-FORCE COSINE TOP-K: the correctness baseline. Query set ×
  corpus cross join with the query side broadcast; the dot product is a
  built-in fold (`zip_with` + `aggregate`), JVM-side. At 100 TB you run
  this only for small query batches — which is exactly its shape: the
  corpus side streams, nothing shuffles but the tiny query table.
- LSH-BUCKETED ANN (random-hyperplane signs): integer hyperplanes from a
  deterministic formula (portable to the DuckDB oracle), bucket =
  sign-bit vector; candidate generation is an equi-join on bucket id, so
  the quadratic work is confined to buckets. The scale path.

Floating policy: float32 embeddings are widened to float64 (exact), both
engines fold the dot product sequentially, outputs round to 6 decimals.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

N_PLANES = 4  # 16 buckets — sized for the synthetic corpus; parameter at scale


def _as_double(col: Column) -> Column:
    return col.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def cosine_sql(a: str, b: str) -> str:
    return (
        f"list_dot_product({a}, {b}) / "
        f"(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})))"
    )


def hyperplane(j: int, dim: int = 64) -> list[int]:
    """Deterministic integer hyperplane — identical literal on both engines."""
    return [((j * 131 + k * 17) % 13) - 6 for k in range(dim)]


def bucket_expr(emb: Column, n_planes: int = N_PLANES, dim: int = 64) -> Column:
    """LSH bucket id: bit j = (emb · hyperplane_j >= 0)."""
    acc = F.lit(0)
    for j in range(n_planes):
        plane = F.array(*[F.lit(float(v)) for v in hyperplane(j, dim)])
        bit = F.when(dot(_as_double(emb), plane) >= 0, F.lit(1 << j)).otherwise(F.lit(0))
        acc = acc + bit
    return acc.cast("int")


def bucket_expr_sql(emb: str, n_planes: int = N_PLANES, dim: int = 64) -> str:
    parts = []
    for j in range(n_planes):
        plane = "[" + ", ".join(f"{float(v)!r}" for v in hyperplane(j, dim)) + "]::DOUBLE[]"
        parts.append(
            f"CASE WHEN list_dot_product(CAST({emb} AS DOUBLE[]), {plane}) >= 0 "
            f"THEN {1 << j} ELSE 0 END"
        )
    return "CAST(" + " + ".join(parts) + " AS INT)"


def cosine_topk(embeddings: DataFrame, query_ids: list[int] | None = None,
                k: int = 5, query_pred: Column | None = None) -> DataFrame:
    """Brute-force top-k cosine neighbors for a small query set."""
    from pyspark.sql import Window

    if query_pred is None:
        query_pred = F.col("vec_id").isin(query_ids)
    q = embeddings.where(query_pred).select(
        F.col("vec_id").alias("query_id"), _as_double(F.col("embedding")).alias("qv")
    )
    corpus = embeddings.select(
        F.col("vec_id").alias("neighbor_id"), _as_double(F.col("embedding")).alias("nv")
    )
    scored = (
        corpus.join(F.broadcast(q))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id", "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("nv")), 6).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", F.col("rank").cast("int").alias("rank"))
    )
