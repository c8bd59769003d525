"""Storage layout for the domain tables (SURVEY §1.3 decision).

The reference's per-target SQLite tables + directory-per-proposal globs
(run_image_extraction.py:963-979) become partitioned columnar layout:

- fileinfo / phot partitioned by ``(targname, proposid)`` — the two
  columns every reference query filters on, so partition pruning replaces
  the manual directory walk;
- results partitioned by ``targname``;
- phot additionally bucketed by ``imagename`` where a metastore is
  available, co-locating the J1 fan-in join.

Writers are idempotent per-partition (dynamic partition overwrite): the
re-run contract (README.md:497-533) holds at the storage layer too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

PARTITIONING = {
    "master": ["targname"],
    "fileinfo": ["targname", "proposid"],
    "phot": ["targname", "proposid"],
    "results": ["targname"],
}


def write_domain_table(df: DataFrame, name: str, root: str) -> str:
    """Write a domain table with its canonical partitioning; dynamic
    overwrite touches only the partitions present in ``df``."""
    spark = df.sparkSession
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    path = f"{root}/{name}"
    cols = [c for c in PARTITIONING.get(name, []) if c in df.columns]
    writer = df.write.mode("overwrite")
    if cols:
        writer = writer.partitionBy(*cols)
    writer.parquet(path)
    return path


def read_domain_table(spark: SparkSession, name: str, root: str) -> DataFrame:
    return spark.read.parquet(f"{root}/{name}")


def write_bucketed(df: DataFrame, table: str, path: str, bucket_cols: list[str],
                   num_buckets: int = 16) -> None:
    """Persist a table bucketed (and sorted) by its join key.

    Bucketing is the co-located-join answer at 100 TB: both sides of an
    equi-join written with the same bucketing need NO shuffle and NO sort
    at read time — the SortMergeJoin consumes bucket files directly
    (verified in tests: zero Exchange in the joined plan). The reference's
    equivalent is its per-target table split (database_interface.py:326-349),
    which co-locates only by target; bucketing generalizes it to any key
    and any bucket count.

    Uses ``saveAsTable`` (bucket metadata lives in the session catalog;
    on a cluster, a metastore) with an explicit external ``path``.
    """
    (
        df.write.mode("overwrite")
        .format("parquet")
        .option("path", path)
        .bucketBy(num_buckets, *bucket_cols)
        .sortBy(*bucket_cols)
        .saveAsTable(table)
    )
