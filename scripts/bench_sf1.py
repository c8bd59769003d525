#!/usr/bin/env python
"""Per-round sf1 scale artifact (VERDICT r5 #8): run the scale-sensitive
query subset once at sf0.1 and at the synthesized sf1 (scale_probe's 10x
replicated tables) with JVM-probe calibration, and write
``BENCH_SF1_r{N}.json`` at the repo root so scale regressions are tracked
round-over-round instead of re-derived by hand.

Round number: ``--round N`` / ``$SPARK_GRAFT_ROUND``, else inferred as
(max existing BENCH_r{N}.json) + 1 — the round whose bench the driver has
not yet recorded.

The probe data lives under /tmp — a bench sidecar, never an oracle input.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scale_probe import PROBE_DIR, SRC, build_probe_data, plan_stats  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# The scale-audit subset: the flagship/trend chain plus the corpus-sized
# LLM-pipeline paths whose sf1 behavior the round verdicts track.
QUERIES = [
    "cs03_cte_vs_time",
    "cs04_cte_vs_logflux",
    "cs05_results_wide",
    "d01_dedup_exact",  # exact/spans/incr — the fp-store path's 10x shape
    "d02_lsh_dedup_pipeline",
    "d03_minhash_lsh",
    "e01_cosine_topk",
    "e02_ann_neardup",
    "t01_token_stats",
    "t02_text_profile",
    "d05_minhash_accuracy",  # sketch suite: corpus-pass scaling of HLL/CMS/Bloom
    "ev01_event_windows",  # windows + interval join + as-of at 10x events
]

PASSES = 2  # best-of-2 per (query, sf): one repeat absorbs most bursts


def infer_round() -> int:
    arg = None
    if "--round" in sys.argv:
        arg = sys.argv[sys.argv.index("--round") + 1]
    arg = arg or os.environ.get("SPARK_GRAFT_ROUND")
    if arg:
        return int(arg)
    ns = [
        int(m.group(1))
        for f in os.listdir(REPO)
        if (m := re.match(r"BENCH_r(\d+)\.json$", f))
    ]
    return (max(ns) + 1) if ns else 1


def main() -> None:
    from wfc3_cte_monitor_spark.plans.registry import load_all
    from wfc3_cte_monitor_spark.session import get_spark

    rnd = infer_round()
    build_probe_data()
    spark = get_spark("wfc3-bench-sf1")
    specs = load_all()
    par = spark.sparkContext.defaultParallelism
    # warm the Python worker pool + parquet footers
    (spark.range(par).repartition(par).mapInPandas(lambda it: it, "id long")
     .write.mode("overwrite").format("noop").save())

    probe_df = spark.range(0, 200_000_000, 1, par).selectExpr("sum(id * 3 + 1) AS s")
    probe_log: list[float] = []

    def probe() -> float:
        t0 = time.perf_counter()
        probe_df.write.mode("overwrite").format("noop").save()
        el = time.perf_counter() - t0
        probe_log.append(el)
        return el

    def run_once(q: str, sf_dir: str) -> float:
        t0 = time.perf_counter()
        specs[q].fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        el = time.perf_counter() - t0
        spark.sparkContext._jvm.System.gc()
        return el

    results: dict[str, dict] = {}
    probe()
    last = probe()
    # interleave (all queries at 0.1, then all at 1, twice) so one burst
    # cannot poison a single query's whole sample set — same rationale as
    # bench.py's interleaved passes
    samples: dict[tuple[str, str], list[tuple[float, float, float, float]]] = {}
    teardown_log: dict[tuple[str, str], list[float]] = {}

    def sample(q: str, sf_name: str, sf_dir: str) -> None:
        # e02/ev01 calibration fix (r10 verdict ask #5): a 10x-scale
        # Arrow-heavy query's own teardown (worker-pool drain + driver
        # GC) inflates the probe IMMEDIATELY after it — a deterministic
        # SELF-effect, not host noise, which is why the same two
        # python-heavy cells flagged `sf1_clean: false` three rounds
        # running while every JVM-only neighbor stayed clean. Take a
        # TEARDOWN probe first (recorded for attribution, excluded from
        # the gate), then the bracketing probe — the gate now measures
        # the host, not the query's wake.
        nonlocal last
        el = run_once(q, sf_dir)
        p_teardown = probe()
        p = probe()
        samples.setdefault((q, sf_name), []).append((el, last, p, p_teardown))
        teardown_log.setdefault((q, sf_name), []).append(p_teardown)
        last = p

    for _ in range(PASSES):
        for sf_name, sf_dir in (("sf0.1", SRC), ("sf1", PROBE_DIR)):
            for q in QUERIES:
                if q not in specs:
                    continue
                sample(q, sf_name, sf_dir)

    # bounded redo backstop (bench.py's pattern): a cell with no clean
    # sample after the scheduled passes gets fresh attempts in a later
    # window — a REAL host burst over both passes is recoverable, and a
    # cell still flagged after redos is genuinely unmeasurable-quiet.
    # pmin/gate are recomputed after EVERY redo attempt and once more
    # before the final flags (r11 ADVICE): redo-window probes can lower
    # pmin, and judging redo samples against the stale pre-redo gate
    # could mark cells clean at up to ~1.5x the true quiet floor.
    def _gate() -> float:
        pmin = min(probe_log)
        return max(1.5 * pmin, pmin + 0.3)

    redo_budget = 6
    # outer loop (r12 ADVICE): the break-check uses the gate AS OF THAT
    # MOMENT, and later probes can lower pmin — a cell judged clean
    # early in the sweep can be unclean under the final, tighter gate
    # after its redo opportunity passed. After each full sweep, re-scan
    # under the recomputed gate and spend any remaining budget on cells
    # that lost their clean sample; stop when a sweep adds nothing.
    while redo_budget > 0:
        spent_before = redo_budget
        for sf_name, sf_dir in (("sf0.1", SRC), ("sf1", PROBE_DIR)):
            for q in QUERIES:
                if q not in specs:
                    continue
                tries = 0
                while tries < 2 and redo_budget > 0:
                    if any(
                        max(s[1], s[2]) <= _gate() for s in samples[(q, sf_name)]
                    ):
                        break
                    sample(q, sf_name, sf_dir)
                    tries += 1
                    redo_budget -= 1
        if redo_budget == spent_before:
            break
    gate = _gate()

    for q in QUERIES:
        if q not in specs:
            continue
        rec: dict = {}
        for sf_name, sf_dir in (("sf0.1", SRC), ("sf1", PROBE_DIR)):
            ss = samples[(q, sf_name)]
            rec[sf_name] = round(min(s[0] for s in ss), 2)
            rec[f"{sf_name}_clean"] = any(max(s[1], s[2]) <= gate for s in ss)
            rec[f"{sf_name}_teardown_probe"] = round(
                min(teardown_log[(q, sf_name)]), 3
            )
        rec["ratio"] = round(rec["sf1"] / rec["sf0.1"], 2) if rec["sf0.1"] else None
        stats = plan_stats(specs[q].fn(spark, PROBE_DIR))
        rec.update({f"sf1_{k}": v for k, v in stats.items()})
        results[q] = rec
        print(json.dumps({"query": q, **rec}), flush=True)

    out = {
        "metric": "sf1_scale_subset",
        "round": rnd,
        "passes": PASSES,
        "calibration": {
            "probe_min": round(min(probe_log), 4),
            "probe_max": round(max(probe_log), 4),
            "gate": round(gate, 4),
        },
        "queries": results,
    }
    path = os.path.join(REPO, f"BENCH_SF1_r{rnd:02d}.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
