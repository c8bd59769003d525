#!/usr/bin/env python
"""Per-site planning-tax census (groundwork for the r13 candidate).

r12's construction_s __none__ baseline + cProfile found that
``localCheckpoint(eager=False)`` pays full Catalyst planning of its
subtree at BUILD time (Dataset.checkpoint → queryExecution.toRdd):
~30 truncation points cost ~7.3 s of t01's ~12 s no-family build at
sf0.1. This probe itemizes that tax: it wraps checkpointing.materialize
with a timer + caller attribution during ONE t01 build per arm
configuration and prints a ranked per-site table — the shopping list
for deciding, per site, whether the subtree's planning cost exceeds
the reuse its truncation saves.

Read-only with respect to plans: the wrapper delegates to the real
materialize, so the built DataFrame is byte-identical.
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from wfc3_cte_monitor_spark import checkpointing
    from wfc3_cte_monitor_spark.plans.registry import load_all, set_arm_filter
    from wfc3_cte_monitor_spark.session import get_spark

    spark = get_spark("planning-tax-probe")
    specs = load_all()
    fn = specs["t01_token_stats"].fn

    real = checkpointing.materialize
    sites: dict[str, list[float]] = {}
    recording = False

    def timed(df, eager: bool = False, force: bool = False):
        t0 = time.perf_counter()
        out = real(df, eager=eager, force=force)
        el = time.perf_counter() - t0
        if recording:
            # attribute to the nearest repo frame outside checkpointing
            site = "?"
            for fr in reversed(traceback.extract_stack(limit=12)[:-1]):
                if "wfc3_cte_monitor_spark" in fr.filename and "checkpointing" not in fr.filename:
                    site = f"{os.path.basename(fr.filename)}:{fr.lineno}"
                    break
            sites.setdefault(site, []).append(el)
        return out

    # patch every import site that bound the name at module load
    import wfc3_cte_monitor_spark.operators.bpe_batch as bb
    import wfc3_cte_monitor_spark.plans.bpe_dict_queries as bdq
    import wfc3_cte_monitor_spark.plans.text_queries as tq

    patched = []
    for mod in (checkpointing, bb, bdq, tq):
        if getattr(mod, "materialize", None) is real:
            mod.materialize = timed
            patched.append(mod.__name__)

    try:
        for label, arms in (
            ("noD", frozenset({"doc"})),
            ("full", None),
        ):
            set_arm_filter(
                None if arms is None else {"t01_token_stats": arms}
            )
            try:
                fn(spark, SRC)  # warm (JIT + parquet footer cache)
                sites.clear()
                recording = True
                t0 = time.perf_counter()
                fn(spark, SRC)
                build = time.perf_counter() - t0
                recording = False
            finally:
                set_arm_filter(None)
            table = sorted(
                ((sum(v), len(v), k) for k, v in sites.items()), reverse=True
            )
            print(json.dumps({
                "config": label,
                "build_s": round(build, 2),
                "materialize_total_s": round(sum(t for t, _, _ in table), 2),
                "sites": [
                    {"site": k, "calls": n, "total_s": round(t, 3)}
                    for t, n, k in table
                ],
            }), flush=True)
    finally:
        for mod in (checkpointing, bb, bdq, tq):
            mod.materialize = real

    print(json.dumps({"patched_modules": patched}), flush=True)


if __name__ == "__main__":
    main()
