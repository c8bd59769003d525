#!/usr/bin/env python
"""dictD price reconciliation probe (r11 verdict ask #3).

BENCH_r11 priced the dictD family two ways that disagree by 3.4x the
recorded twin noise band: live − pinned = +8.22 s in the driver's
window (sust_med_ratio 1.32) vs +5.77 s in the builder's quiet window
(band ±0.7 s). Hypothesis: the family's eager training construction
runs ~dozens of SEQUENTIAL small Spark jobs, and per-job fixed
overhead (scheduler + barrier latency) amplifies under sustained host
pressure far more than a shuffle-bound query of equal quiet wall.

This probe measures, on the CURRENT code (post r12 barrier diet):

1. The family's quiet price: t01 FULL vs t01 with the D family's
   construction gate closed (set_arm_filter to a non-D arm name; the
   lazy non-D union is identical either way, so full − noD is exactly
   the D family: construction + its five arms' execution). This is
   the same subtraction the r11 twin made, minus twin-vs-live noise.
2. The family's JOB COUNT: Spark jobs launched while building +
   executing each shape (the barrier census the hypothesis needs).
3. Barrier sensitivity: both shapes re-timed while SUSTAINED_LOAD
   background CPU burners run. If full (and the D-family delta)
   inflates disproportionately to noD under identical pressure,
   barrier-amplification is confirmed with numbers; if both inflate
   alike, the r11 spread was plain window noise.

One JSON line per sample; summary last. Run QUIET (nothing else on
the host) — the script brings its own pressure for phase 3.

Semantics note: set_arm_filter gates only EAGER construction (the
arms_requested gate in text_queries); the lazy tagged-union arms are
not pruned by it, so the noD shape still executes every pre-D arm —
which is the point: noD ≡ the r10 arm set, full − noD ≡ the dictD
family, matching what BENCH_r11's live − pinned measured.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PASSES = 3
BURNERS = int(os.environ.get("PROBE_BURNERS", "16"))
# any single non-D arm name closes the D construction gate while the
# lazy union (every pre-D arm) still builds and executes
NO_D_FILTER = frozenset({"doc"})


def _burn(stop_flag) -> None:
    x = 1.0001
    while not stop_flag.value:
        for _ in range(100_000):
            x = x * 1.0000001 % 9.7
    _ = x


def main() -> None:
    from wfc3_cte_monitor_spark.plans.registry import load_all, set_arm_filter
    from wfc3_cte_monitor_spark.session import get_spark

    # job census caveat (r12 ADVICE): getJobIdsForGroup only sees jobs
    # the status store retained (spark.ui.retainedJobs, default 1000) —
    # a full-shape t01 build launches ~230 jobs per run and PASSES runs
    # accumulate, so raise the cap well past the session's lifetime
    # total at BUILD time; the effective value is recorded in the
    # artifact so any undercount is diagnosable.
    spark = get_spark(
        "dictd-price-probe", extra_conf={"spark.ui.retainedJobs": "200000"}
    )
    sc = spark.sparkContext
    retained_jobs = int(sc.getConf().get("spark.ui.retainedJobs", "1000"))
    specs = load_all()
    fn = specs["t01_token_stats"].fn

    def run(tag: str, arms: frozenset | None) -> tuple[float, int]:
        """Build + execute t01 under the given arm filter; returns
        (wall seconds, Spark jobs launched)."""
        set_arm_filter(None if arms is None else {"t01_token_stats": arms})
        group = f"probe-{tag}-{time.monotonic_ns()}"
        sc.setJobGroup(group, tag)
        try:
            t0 = time.perf_counter()
            df = fn(spark, SRC)
            df.write.mode("overwrite").format("noop").save()
            el = time.perf_counter() - t0
        finally:
            set_arm_filter(None)
            # truly clear the group (r12 ADVICE: setJobGroup("", "")
            # makes later ungrouped jobs share the "" group)
            sc._jsc.sc().clearJobGroup()
        jobs = len(sc.statusTracker().getJobIdsForGroup(group))
        sc._jvm.System.gc()
        return el, jobs

    # warm-up: one full build of each shape (JIT + parquet cache)
    run("warm-full", None)
    run("warm-noD", NO_D_FILTER)

    def sweep(label: str) -> dict:
        samples: dict[str, list[tuple[float, int]]] = {"full": [], "noD": []}
        for _ in range(PASSES):
            for tag, arms in (("full", None), ("noD", NO_D_FILTER)):
                el, jobs = run(tag, arms)
                samples[tag].append((el, jobs))
                print(json.dumps({"phase": label, "shape": tag,
                                  "wall_s": round(el, 3), "jobs": jobs}),
                      flush=True)
        out = {}
        for tag, ss in samples.items():
            out[tag] = {"best_s": round(min(s[0] for s in ss), 3),
                        "med_s": round(sorted(s[0] for s in ss)[len(ss) // 2], 3),
                        "jobs": ss[0][1]}
        out["d_price_best_s"] = round(out["full"]["best_s"] - out["noD"]["best_s"], 3)
        out["d_price_med_s"] = round(out["full"]["med_s"] - out["noD"]["med_s"], 3)
        return out

    quiet = sweep("quiet")

    stop = mp.Value("b", False)
    procs = [mp.Process(target=_burn, args=(stop,), daemon=True) for _ in range(BURNERS)]
    for p in procs:
        p.start()
    try:
        loaded = sweep(f"loaded-{BURNERS}burners")
    finally:
        stop.value = True
        for p in procs:
            p.join(timeout=5)

    def infl(tag: str) -> float:
        return round(loaded[tag]["best_s"] / quiet[tag]["best_s"], 2)

    summary = {
        "metric": "dictd_price_probe",
        "sf_dir": SRC,
        "passes": PASSES,
        "burners": BURNERS,
        "retained_jobs_cap": retained_jobs,
        "quiet": quiet,
        "loaded": loaded,
        "inflation_best": {t: infl(t) for t in ("full", "noD")},
        "d_price_quiet_s": quiet["d_price_best_s"],
        "d_price_loaded_s": loaded["d_price_best_s"],
        "jobs_delta_full_minus_noD": quiet["full"]["jobs"] - quiet["noD"]["jobs"],
        "reading": "if full inflates >> noD under load (and the loaded "
        "D price >> quiet D price), the sequential-job construction "
        "amplifies sustained pressure — the r11 spread's mechanism",
    }
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
