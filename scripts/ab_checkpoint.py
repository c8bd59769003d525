#!/usr/bin/env python
"""A/B/C the fileinfo-analog materialization in the trend queries
(VERDICT r3 #1): eager localCheckpoint (r3 shape) vs lazy localCheckpoint
vs none (r2 shape), interleaved best-of-N so a host-noise burst can't
poison one variant's whole sample.

Prints one JSON line per (query, mode) with all passes + best/median.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wfc3_cte_monitor_spark.plans.registry import load_all
from wfc3_cte_monitor_spark.session import get_spark

QUERIES = ["cs03_cte_vs_time", "n03_model_backtest"]
MODES = ["eager", "lazy", "none"]
PASSES = int(os.environ.get("AB_PASSES", "5"))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("wfc3-cte-ab-ckpt")
    specs = load_all()

    # warmups: parquet footers + codegen + python worker pool
    par = spark.sparkContext.defaultParallelism
    (
        spark.range(par).repartition(par)
        .mapInPandas(lambda it: it, "id long")
        .write.mode("overwrite").format("noop").save()
    )
    os.environ["WFC3_TREND_FI_CKPT"] = "none"
    for q in QUERIES:
        specs[q].fn(spark, sf_dir).write.mode("overwrite").format("noop").save()

    times: dict[tuple[str, str], list[float]] = {
        (q, m): [] for q in QUERIES for m in MODES
    }
    for p in range(PASSES):
        for mode in MODES:
            os.environ["WFC3_TREND_FI_CKPT"] = mode
            for q in QUERIES:
                t0 = time.perf_counter()
                specs[q].fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
                times[(q, mode)].append(time.perf_counter() - t0)
                spark.sparkContext._jvm.System.gc()
        print(f"# pass {p + 1}/{PASSES} done", flush=True)

    for q in QUERIES:
        for m in MODES:
            ts = sorted(round(t, 3) for t in times[(q, m)])
            print(json.dumps({
                "query": q, "mode": m, "passes": ts,
                "best": ts[0], "median": ts[len(ts) // 2],
            }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
