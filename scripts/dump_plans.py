#!/usr/bin/env python
"""Dump `.explain("formatted")` for headline queries to plans/r13/.

Usage:
    python scripts/dump_plans.py <suffix> [query ...]

Writes plans/r13/<query>_<suffix>.txt for each named query (default:
every bench headline query). Builds each query exactly as bench.py's
full run does (no arm filter), so the captured plan is the benched
plan. Eager-construction queries execute their build-time stages while
the plan is captured; that is the same cost bench pays and does not
affect the captured string.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wfc3_cte_monitor_spark.plans.registry import QUERIES, load_all
from wfc3_cte_monitor_spark.session import get_spark


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    load_all()
    if not names:
        import bench

        names = list(bench.HEADLINE)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r13"
    )
    os.makedirs(out_dir, exist_ok=True)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    for name in names:
        t0 = time.time()
        spark.sparkContext.setJobDescription(f"dump_plans: build {name}")
        df = QUERIES[name].fn(spark, sf_dir)
        text = df._jdf.queryExecution().explainString(mode)
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(text)
        print(f"{name}: {time.time() - t0:.1f}s build, {len(text)} chars -> {path}")
        spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
