#!/usr/bin/env python
"""Hunt the 'WindowExec: No Partition Defined' warnings to a concrete
site (r13 verdict ask #5).

The driver's bench stderr shows bursts of the warning, but every FINAL
benched plan is global-window-free (plans/r13 census). The warning is
emitted from WindowExec.requiredChildDistribution at PLANNING time, so
it can come from subtrees that execute during query CONSTRUCTION
(eager collects, checkpoint materializations, iterative-loop probes)
and are truncated out of the final plan string.

Method: route log4j through a per-phase marker logger, then (a) build
and (b) noop-execute every headline query, counting warnings between
markers. Warnings are counted from the JVM-side LogAppender via a
stderr capture file the caller tees.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wfc3_cte_monitor_spark.plans.registry import load_all
from wfc3_cte_monitor_spark.session import get_spark


def main() -> None:
    spark = get_spark("windowexec-hunt")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    specs = load_all()
    import bench

    jlog = spark.sparkContext._jvm.org.slf4j.LoggerFactory.getLogger("HUNT")
    names = list(bench.HEADLINE)
    for name in names:
        jlog.warn(f"=== build {name} ===")
        df = specs[name].fn(spark, sf_dir)
        jlog.warn(f"=== exec {name} ===")
        t0 = time.time()
        df.write.mode("overwrite").format("noop").save()
        jlog.warn(f"=== done {name} ({time.time() - t0:.1f}s) ===")
    jlog.warn("=== hunt complete ===")
    spark.stop()


if __name__ == "__main__":
    main()
