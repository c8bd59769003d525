#!/usr/bin/env python
"""sf1 scaling probe (VERDICT r3 #7): run the flagship (cs05) and the
trend query (cs03) once at sf0.1 and once at a synthesized sf1 (10x
replicas of sf0.1's orders/lineitem, keys remapped, dates shifted one
TPC-H date-range per replica so the epoch dimension scales too — "more
exposures over more epochs", the domain's growth axis), and record wall
time + exchange/scan counts per plan. Output: one JSON line per
(query, sf) plus a SCALING.md sidecar written by the caller.

The probe data lives under /tmp — it is a bench sidecar, never an oracle
input.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PROBE_DIR = "/tmp/wfc3_sf1_probe"
SRC = "/root/testdata/sf0.1"
REPLICAS = 10
KEY_OFFSET = 10_000_000
DAY_SHIFT = 2557  # ~ the TPC-H order-date span, so replicas extend the epoch axis

QUERIES = ["cs05_results_wide", "cs03_cte_vs_time", "cs04_cte_vs_logflux"]
# LLM-pipeline probes: replicas are EXACT copies under remapped ids —
# 10x growth that is pure duplication, the realistic stress for a dedup
# pipeline (d02's verified-edge set grows ~100x per bucket) and a
# work-shape-preserving scale-up for the ANN path (cosine is unchanged
# by duplication).
CORPUS_QUERIES = [
    "d02_lsh_dedup_pipeline",
    "e01_cosine_topk",
    "d03_minhash_lsh",
    "t02_text_profile",
]


def build_probe_data() -> None:
    import duckdb

    os.makedirs(PROBE_DIR, exist_ok=True)
    _build_events_probe()
    if all(
        os.path.exists(f"{PROBE_DIR}/{t}.parquet")
        for t in ("orders", "lineitem", "documents", "embeddings")
    ):
        return
    con = duckdb.connect()
    con.execute(f"""
        COPY (
            SELECT o.* REPLACE (
                o_orderkey + i * {KEY_OFFSET} AS o_orderkey,
                o_orderdate + to_days((i * {DAY_SHIFT})::INT) AS o_orderdate)
            FROM read_parquet('{SRC}/orders.parquet') o,
                 range({REPLICAS}) t(i)
        ) TO '{PROBE_DIR}/orders.parquet' (FORMAT PARQUET)
    """)
    con.execute(f"""
        COPY (
            SELECT l.* REPLACE (l_orderkey + i * {KEY_OFFSET} AS l_orderkey)
            FROM read_parquet('{SRC}/lineitem.parquet') l,
                 range({REPLICAS}) t(i)
        ) TO '{PROBE_DIR}/lineitem.parquet' (FORMAT PARQUET)
    """)
    con.execute(f"""
        COPY (
            SELECT d.* REPLACE (doc_id + i * {KEY_OFFSET} AS doc_id)
            FROM read_parquet('{SRC}/documents.parquet') d,
                 range({REPLICAS}) t(i)
        ) TO '{PROBE_DIR}/documents.parquet' (FORMAT PARQUET)
    """)
    con.execute(f"""
        COPY (
            SELECT e.* REPLACE (vec_id + i * {KEY_OFFSET} AS vec_id)
            FROM read_parquet('{SRC}/embeddings.parquet') e,
                 range({REPLICAS}) t(i)
        ) TO '{PROBE_DIR}/embeddings.parquet' (FORMAT PARQUET)
    """)


def _build_events_probe() -> None:
    """10x events: ids AND user ids offset per replica (key cardinality
    scales; per-key session/as-of work stays constant), ts shifted one
    replica-span per copy so the event-time axis extends like the
    domain's epoch axis. Written separately from the TPC-H tables so
    older probe dirs upgrade in place."""
    import duckdb

    # dimension tables ride along unscaled (the growth axis is the fact
    # tables); symlinked so probe-dir queries that read them resolve
    for dim in ("region", "nation", "customer", "supplier", "part"):
        dst = f"{PROBE_DIR}/{dim}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{SRC}/{dim}.parquet", dst)
    if os.path.exists(f"{PROBE_DIR}/events.parquet"):
        return
    con = duckdb.connect()
    con.execute(f"""
        COPY (
            SELECT e.* REPLACE (
                event_id + i * {KEY_OFFSET} AS event_id,
                user_id + i * {KEY_OFFSET} AS user_id,
                ts + to_days((i * {DAY_SHIFT})::INT) AS ts)
            FROM read_parquet('{SRC}/events.parquet') e,
                 range({REPLICAS}) t(i)
        ) TO '{PROBE_DIR}/events.parquet' (FORMAT PARQUET)
    """)


def plan_stats(df) -> dict:
    spark = df.sparkSession
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    return {
        "exchanges": len(re.findall(r"\(\d+\) Exchange", plan)),
        "scans": len(re.findall(r"\(\d+\) Scan parquet", plan)),
        "bnlj": len(re.findall(r"\(\d+\) BroadcastNestedLoopJoin", plan)),
        "smj": len(re.findall(r"\(\d+\) SortMergeJoin", plan)),
    }


def main() -> None:
    from wfc3_cte_monitor_spark.plans.registry import load_all
    from wfc3_cte_monitor_spark.session import get_spark

    build_probe_data()
    spark = get_spark("wfc3-scale-probe")
    specs = load_all()
    # warm the python worker pool once
    par = spark.sparkContext.defaultParallelism
    (spark.range(par).repartition(par).mapInPandas(lambda it: it, "id long")
     .write.mode("overwrite").format("noop").save())

    queries = QUERIES
    if os.environ.get("PROBE_CORPUS"):
        queries = CORPUS_QUERIES
    out = []
    for sf_name, sf_dir in (("sf0.1", SRC), ("sf1", PROBE_DIR)):
        for q in queries:
            df = specs[q].fn(spark, sf_dir)
            stats = plan_stats(df)
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                df = specs[q].fn(spark, sf_dir)
                df.write.mode("overwrite").format("noop").save()
                best = min(best, time.perf_counter() - t0)
                spark.sparkContext._jvm.System.gc()
            rec = {"query": q, "sf": sf_name, "best_sec": round(best, 2), **stats}
            out.append(rec)
            print(json.dumps(rec), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
