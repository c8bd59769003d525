#!/usr/bin/env python
"""Per-arm sf1 attribution for d01_dedup_exact (r13, pre-emptive).

d01 is the worst sf1 cell after the decomposed/accepted t02 (ratio
4.06 at r12, 4.00 at r13) and has never been attributed. It IS a
tagged-union query, so each arm can be isolated with the registry's
arm filter + a which-restricted noop write (Catalyst prunes the other
union branches through the literal `which` columns; the shared
fingerprint checkpoint still builds once per run, so each arm's number
includes the shared substrate — same caveat as bench's `only:` arm
prices). The FULL query is timed too so the arm numbers can be read
against it.

Branches: 'exact' (whole-doc fingerprint window), 'spans' (substring
shingle dedup), 'incr' (store+delta incremental dedup).

Serialize with everything else — never run while a bench is in flight.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scale_probe import PROBE_DIR, SRC, build_probe_data  # noqa: E402

PASSES = int(os.environ.get("D01_PROBE_PASSES", "3"))
ARMS = ("exact", "spans", "incr")


def main() -> None:
    from pyspark.sql import functions as F

    from wfc3_cte_monitor_spark.plans.registry import load_all, set_arm_filter
    from wfc3_cte_monitor_spark.session import get_spark

    build_probe_data()
    spark = get_spark("d01-sf1-arms")
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all()
    fn = specs["d01_dedup_exact"].fn

    def run(sf_dir: str, arm: str | None) -> float:
        # time BUILD + EXECUTE together (bench_sf1's run_once shape):
        # d01's dominant compute — the shared fingerprint relation —
        # is a materialize() whose stages run at plan-build time under
        # AQE (SCALING.md §Round-13 planning-tax mechanism), so timing
        # only the noop write would exclude the query's main cost.
        if arm is not None:
            set_arm_filter({"d01_dedup_exact": frozenset({arm})})
        try:
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            if arm is not None:
                df = df.where(F.col("which") == arm)
            df.write.mode("overwrite").format("noop").save()
            el = time.perf_counter() - t0
        finally:
            set_arm_filter(None)
        spark.sparkContext._jvm.System.gc()
        return el

    # warm both scales once
    run(SRC, None)
    run(PROBE_DIR, None)

    samples: dict[tuple[str, str], list[float]] = {}
    for _ in range(PASSES):
        for sf_name, sf_dir in (("sf0.1", SRC), ("sf1", PROBE_DIR)):
            for tag in (None, *ARMS):
                el = run(sf_dir, tag)
                samples.setdefault((tag or "full", sf_name), []).append(el)

    out = {}
    for tag in ("full", *ARMS):
        b01 = min(samples[(tag, "sf0.1")])
        b1 = min(samples[(tag, "sf1")])
        out[tag] = {
            "sf0.1": round(b01, 2),
            "sf1": round(b1, 2),
            "ratio": round(b1 / b01, 2) if b01 else None,
            "passes_sf0.1": [round(x, 2) for x in samples[(tag, "sf0.1")]],
            "passes_sf1": [round(x, 2) for x in samples[(tag, "sf1")]],
        }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
