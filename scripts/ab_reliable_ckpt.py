#!/usr/bin/env python
"""A/B the reliable-checkpoint switch at sf1 (VERDICT r6 ask #8).

``spark.wfc3.checkpoint.reliable=true`` routes every diamond-reuse
materialization through ``DataFrame.checkpoint`` (blocks written to the
checkpoint directory — HDFS/S3 on a cluster, local disk here) instead of
``localCheckpoint`` (executor-memory blocks). The reliable path survives
executor churn / dynamic allocation; this script prices that insurance
so SCALING.md's cluster-posture recommendation carries a number.

Runs the materialization-heavy query subset at the sf1 probe corpus,
interleaved best-of-N per mode, and prints one JSON line per query plus
a summary table row for SCALING.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wfc3_cte_monitor_spark.checkpointing import DIR_CONF, RELIABLE_CONF
from wfc3_cte_monitor_spark.plans.registry import load_all
from wfc3_cte_monitor_spark.session import get_spark

# The queries whose plans carry materialize() sites (diamond reuse /
# iteration hygiene) — the only ones the switch can affect.
QUERIES = ["d02_lsh_dedup_pipeline", "t01_token_stats", "t02_text_profile",
           "e01_cosine_topk", "cs03_cte_vs_time"]
PASSES = int(os.environ.get("AB_PASSES", "3"))
CKPT_DIR = "/tmp/wfc3_reliable_ckpt_ab"


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/tmp/wfc3_sf1_probe")
    spark = get_spark("wfc3-ab-reliable-ckpt")
    spark.conf.set(DIR_CONF, CKPT_DIR)
    specs = load_all()

    par = spark.sparkContext.defaultParallelism
    (
        spark.range(par).repartition(par)
        .mapInPandas(lambda it: it, "id long")
        .write.mode("overwrite").format("noop").save()
    )
    for q in QUERIES:  # warm footers/codegen in the default mode
        specs[q].fn(spark, sf_dir).write.mode("overwrite").format("noop").save()

    results: dict[str, dict[str, list[float]]] = {
        q: {"local": [], "reliable": []} for q in QUERIES
    }
    for _ in range(PASSES):
        for q in QUERIES:
            for mode, flag in (("local", "false"), ("reliable", "true")):
                spark.conf.set(RELIABLE_CONF, flag)
                t0 = time.perf_counter()
                specs[q].fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
                results[q][mode].append(round(time.perf_counter() - t0, 3))
                spark.sparkContext._jvm.System.gc()
    spark.conf.set(RELIABLE_CONF, "false")

    rows = []
    for q in QUERIES:
        lo = min(results[q]["local"])
        re_ = min(results[q]["reliable"])
        rows.append({
            "query": q, "local_best": lo, "reliable_best": re_,
            "overhead_x": round(re_ / lo, 2),
            "local_passes": results[q]["local"],
            "reliable_passes": results[q]["reliable"],
        })
        print(json.dumps(rows[-1], separators=(",", ":")))
    total_lo = round(sum(r["local_best"] for r in rows), 2)
    total_re = round(sum(r["reliable_best"] for r in rows), 2)
    print(json.dumps({
        "sf_dir": sf_dir, "subset_local": total_lo, "subset_reliable": total_re,
        "overhead_x": round(total_re / total_lo, 2),
    }, separators=(",", ":")))
    shutil.rmtree(CKPT_DIR, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
