#!/usr/bin/env python
"""Price the r13 planning-tax shave candidate: DEFERRED lazy checkpoints.

Mechanism under test (see checkpointing.materialize's ``defer`` docs):
with AQE on, ``localCheckpoint(eager=False)``'s ``toRdd`` materializes
every non-result query stage — each truncation point with a shuffle in
its subtree runs serialized driver-side mini-jobs at plan-BUILD time
(r12 census: ~10.7 s of t01's sf0.1 build inside materialize calls).
Planning the subtree non-adaptively keeps the truncation but defers
stage execution into the consumer's own jobs.

Two parts:

1. MECHANISM probe — a synthetic shuffle subtree; count jobs submitted
   during the localCheckpoint call with AQE on vs off. Proves (or
   refutes) the stage-materialization reading of the r12 tax.

2. t01 CONFIG A/B — monkeypatch materialize at t01's import sites:
     baseline        : r12 behavior (what the pinned twin runs)
     defer           : every eager=False site (force included) deferred
     defer_eager_nar : deferred EXCEPT narrow subtrees (no Aggregate/
                       Join in the analyzed plan), which go eager=True —
                       the anti-race config: widely-shared narrow roots
                       (token-hash relation, per-round corpus rewrites)
                       are computed once at build instead of racing in
                       sibling consumer stages.
   Per config: build wall, execute (noop) wall, total, build-time job
   count; PASSES interleaved passes, best-of. Row-identity of the
   'defer' configs vs baseline is checked at sf0.001 first (cheap).

Serialize with everything else — never run while a bench is in flight.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CHECK_SF = "/root/testdata/sf0.001"
PASSES = int(os.environ.get("DEFER_PROBE_PASSES", "3"))
# Optional arm restriction (comma-separated, e.g. "doc"): times the
# BENCH ARM-SWEEP shape, where defer's pruning effect is structural —
# un-requested arms' deferred subtrees are never executed (the which-
# filter prunes their union branches), while the default AQE path
# executes every truncation point's stages at build regardless.
ARMS = os.environ.get("DEFER_PROBE_ARMS", "")


def main() -> None:
    from pyspark.sql import functions as F

    from wfc3_cte_monitor_spark import checkpointing
    from wfc3_cte_monitor_spark.plans.registry import load_all
    from wfc3_cte_monitor_spark.session import get_spark

    spark = get_spark(
        "defer-probe", extra_conf={"spark.ui.retainedJobs": "200000"}
    )
    sc = spark.sparkContext

    def n_jobs() -> int:
        return len(sc.statusTracker().getJobIdsForGroup(None) or [])

    # ---- part 1: mechanism ------------------------------------------------
    base = spark.read.parquet(os.path.join(SRC, "documents.parquet"))
    for aqe in ("true", "false"):
        spark.conf.set("spark.sql.adaptive.enabled", aqe)
        agg = base.groupBy((F.col("doc_id") % 97).alias("k")).agg(
            F.count(F.lit(1)).alias("c"), F.sum(F.length("text")).alias("s")
        )
        j0, t0 = n_jobs(), time.perf_counter()
        ck = agg.localCheckpoint(eager=False)
        el = time.perf_counter() - t0
        jb = n_jobs() - j0
        t0 = time.perf_counter()
        ck.write.mode("overwrite").format("noop").save()
        ex = time.perf_counter() - t0
        print(json.dumps({
            "mechanism": {"aqe": aqe, "ckpt_call_s": round(el, 3),
                          "jobs_during_call": jb, "exec_s": round(ex, 3)},
        }), flush=True)
    spark.conf.set("spark.sql.adaptive.enabled", "true")

    # ---- part 2: t01 config A/B ------------------------------------------
    import wfc3_cte_monitor_spark.operators.bpe_batch as bb
    import wfc3_cte_monitor_spark.operators.pagerank as prm
    import wfc3_cte_monitor_spark.plans.bpe_dict_queries as bdq
    import wfc3_cte_monitor_spark.plans.text_queries as tq

    real = checkpointing.materialize
    mode = {"name": "baseline"}

    def _is_narrow(df) -> bool:
        a = df._jdf.queryExecution().analyzed().toString()
        return not any(k in a for k in ("Aggregate", "Join", "Window", "Sort"))

    def patched(df, eager: bool = False, force: bool = False, defer: bool = False):
        m = mode["name"]
        if m == "baseline" or eager:
            return real(df, eager=eager, force=force)
        if m == "defer":
            return real(df, eager=False, force=force, defer=True)
        if m == "defer_eager_nar":
            if _is_narrow(df):
                return real(df, eager=True, force=force)
            return real(df, eager=False, force=force, defer=True)
        raise AssertionError(m)

    mods = (checkpointing, bb, bdq, tq, prm)
    for mod in mods:
        if getattr(mod, "materialize", None) is real:
            mod.materialize = patched

    try:
        from wfc3_cte_monitor_spark.plans.registry import set_arm_filter

        specs = load_all()
        fn = specs["t01_token_stats"].fn
        if ARMS:
            set_arm_filter(
                {"t01_token_stats": frozenset(ARMS.split(","))}
            )

        # cheap row-identity gate first
        mode["name"] = "baseline"
        ref = sorted(map(tuple, fn(spark, CHECK_SF).collect()))
        for m in ("defer", "defer_eager_nar"):
            mode["name"] = m
            got = sorted(map(tuple, fn(spark, CHECK_SF).collect()))
            same = got == ref
            print(json.dumps({"identity": {m: same, "rows": len(got)}}),
                  flush=True)
            if not same:
                raise SystemExit(f"config {m} changed t01 rows — abort")

        # timed passes, interleaved
        results: dict[str, list[dict]] = {}
        for p in range(PASSES):
            for m in ("baseline", "defer", "defer_eager_nar"):
                mode["name"] = m
                j0, t0 = n_jobs(), time.perf_counter()
                df = fn(spark, SRC)
                build = time.perf_counter() - t0
                jb = n_jobs() - j0
                t0 = time.perf_counter()
                df.write.mode("overwrite").format("noop").save()
                ex = time.perf_counter() - t0
                sc._jvm.System.gc()
                rec = {"build_s": round(build, 3), "exec_s": round(ex, 3),
                       "total_s": round(build + ex, 3), "build_jobs": jb}
                results.setdefault(m, []).append(rec)
                print(json.dumps({"pass": p, "config": m, **rec}), flush=True)

        summary = {}
        for m, rs in results.items():
            summary[m] = {
                "best_total_s": round(min(r["total_s"] for r in rs), 3),
                "best_build_s": round(min(r["build_s"] for r in rs), 3),
                "best_exec_s": round(min(r["exec_s"] for r in rs), 3),
                "build_jobs": rs[0]["build_jobs"],
            }
        for m in ("defer", "defer_eager_nar"):
            summary[f"delta_{m}_s"] = round(
                summary[m]["best_total_s"] - summary["baseline"]["best_total_s"], 3
            )
        print(json.dumps({"metric": "defer_probe", "sf_dir": SRC,
                          "passes": PASSES, "arms": ARMS or None,
                          "summary": summary}), flush=True)
    finally:
        if ARMS:
            set_arm_filter(None)
        for mod in mods:
            mod.materialize = real


if __name__ == "__main__":
    main()
