#!/usr/bin/env python
"""Ingestion throughput: reference-style row-at-a-time SQLite vs this
engine's bulk columnar write.

The reference's documented bottleneck is photometry ingestion — one
INSERT per (image, star) row through the ORM, preceded by a natural-key
probe SELECT (wfc3_cte_monitor/database_update.py:214-255); the README
warns full ingestion "could take dayyys" and that SQLite ingestion
cannot be parallelized (README.md:429-432, :962-976).

This script measures both patterns on the same lineitem rows:
  1. reference emulation: sqlite3, per-row key-probe SELECT + INSERT
     (single process, single thread — the only mode SQLite allows);
  2. engine path: Spark reads the parquet and writes a partitioned
     parquet table (the upsert MERGE shape adds one shuffle).

Usage: python scripts/ingest_compare.py [sf_dir] [row_cap]
Prints one JSON line with rows/sec for both paths.
"""

from __future__ import annotations

import json
import os
import sqlite3
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def reference_ingest(rows: list[tuple], db_path: str) -> float:
    con = sqlite3.connect(db_path)
    con.execute(
        "CREATE TABLE lineitem (l_orderkey INT, l_linenumber INT, l_quantity REAL,"
        " l_extendedprice REAL, PRIMARY KEY (l_orderkey, l_linenumber, l_extendedprice))"
    )
    t0 = time.perf_counter()
    cur = con.cursor()
    for r in rows:
        # the reference's insert_or_update: probe the natural key, then
        # insert; the ORM autocommits each statement (engine.execute,
        # database_update.py:246-255), so commit per row
        cur.execute(
            "SELECT 1 FROM lineitem WHERE l_orderkey=? AND l_linenumber=? AND l_extendedprice=?",
            (r[0], r[1], r[3]),
        )
        if cur.fetchone() is None:
            cur.execute("INSERT INTO lineitem VALUES (?,?,?,?)", r)
        con.commit()
    elapsed = time.perf_counter() - t0
    con.close()
    return elapsed


def spark_ingest(sf_dir: str, out_dir: str) -> tuple[float, int]:
    from pyspark.sql import functions as F

    from wfc3_cte_monitor_spark.session import get_spark

    spark = get_spark("ingest-bench")
    df = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
        (F.col("l_orderkey") % 16).alias("bucket"),
    )
    n = df.count()  # warm the scan so the write measures the write
    t0 = time.perf_counter()
    df.write.mode("overwrite").partitionBy("bucket").parquet(out_dir)
    elapsed = time.perf_counter() - t0
    spark.stop()
    return elapsed, n


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cap = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000

    import duckdb

    rows = duckdb.connect().execute(
        f"SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice"
        f" FROM '{sf_dir}/lineitem.parquet' LIMIT {cap}"
    ).fetchall()

    with tempfile.TemporaryDirectory() as tmp:
        ref_sec = reference_ingest(rows, f"{tmp}/ref.db")
        spark_sec, n_spark = spark_ingest(sf_dir, f"{tmp}/spark_out")

    print(json.dumps({
        "reference_rows": len(rows),
        "reference_sec": round(ref_sec, 3),
        "reference_rows_per_sec": round(len(rows) / ref_sec, 1),
        "engine_rows": n_spark,
        "engine_sec": round(spark_sec, 3),
        "engine_rows_per_sec": round(n_spark / spark_sec, 1),
        "engine_vs_reference_rate": round((n_spark / spark_sec) / (len(rows) / ref_sec), 1),
    }))


if __name__ == "__main__":
    main()
