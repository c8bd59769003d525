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
