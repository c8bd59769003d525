#!/usr/bin/env python
"""Two-decade scale ladder (round-13 extension of the per-round sf1
probe): run the LLM-pipeline query subset at sf0.1, sf1 (scale_probe's
10x replicas) and a synthesized sf10 (100x replicas of sf0.1's
documents/embeddings) in ONE session, so each accepted-shape ruling
("fixed costs amortize") is tested across two decades instead of one.

Why 100x replication is the INTERESTING stress and not just a bigger
sf1: pure duplication turns every document into a 100-clone exact-dup
cluster, so candidate-pair relations inside d02/e02 grow ~C(100,2)/
C(10,2) = 110x per decade BY CONSTRUCTION — the same mega-cluster shape
a real 100 TB crawl has (boilerplate pages, mirrored sites). A cell
that goes quadratic here is telling the truth about production, and the
production remedy (exact-group representatives before LSH) is what the
ladder is meant to motivate or clear.

Methodology mirrors scripts/bench_sf1.py: JVM probe calibration with
teardown attribution, interleaved passes so one burst cannot poison a
cell, best-of over samples. Differences, all recorded in the artifact:
  - driver memory raised via SPARK_GRAFT_DRIVER_MEM (default 48g here)
    so the 100x corpus's shuffles spill instead of OOM — every cell in
    the ladder runs in the SAME session, so ratios stay comparable;
  - quadratic-candidate cells (d02, e02) get ONE sf10 sample, taken
    last, behind a wall-budget guard (projected from their sf1 wall x
    an edge-growth factor) — a blown budget records a skip, not a hang.

The probe data lives under /tmp — a bench sidecar, never an oracle
input. Output: SF10_LADDER_r{N}.json at the repo root.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")

from scale_probe import (  # noqa: E402
    KEY_OFFSET,
    PROBE_DIR,
    SRC,
    build_probe_data,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF10_DIR = "/tmp/wfc3_sf10_probe"
SF10_REPLICAS = 100

# Tier A: expected ~linear per decade (corpus passes, bucketed joins
# with bounded bucket fan-in, fixed query sets). Best-of-2 at every sf.
LINEAR_QUERIES = [
    "d01_dedup_exact",
    "d03_minhash_lsh",
    "d05_minhash_accuracy",
    "e01_cosine_topk",
    "t01_token_stats",
    "t02_text_profile",
]
# Tier B: candidate-pair relations grow ~110x per decade under pure
# duplication (see module docstring). One sf10 sample each, run last,
# behind the wall budget.
QUADRATIC_QUERIES = ["d02_lsh_dedup_pipeline", "e02_ann_neardup"]

PASSES = 2
SF10_BUDGET_S = float(os.environ.get("SF10_BUDGET_S", "2400"))
# --only linear|quadratic restricts the run to one tier (the quadratic
# tier's sf10 cells are budget-guarded, so a full run that spends its
# budget on tier A records skips there; a tier-B-only re-run with
# SF10_BUDGET_S raised fills them in a fresh session). The artifact
# name gains a -{tier} suffix so the runs don't clobber each other.
ONLY = sys.argv[sys.argv.index("--only") + 1] if "--only" in sys.argv else None


def build_sf10_data() -> None:
    import duckdb

    os.makedirs(SF10_DIR, exist_ok=True)
    if all(
        os.path.exists(f"{SF10_DIR}/{t}.parquet")
        for t in ("documents", "embeddings", "part")
    ):
        return
    con = duckdb.connect()
    # 100x documents/embeddings, ids remapped per replica (the sf1
    # probe's scheme; i*KEY_OFFSET keeps replica id spaces disjoint).
    con.execute(f"""
        COPY (
            SELECT d.* REPLACE (doc_id + i * {KEY_OFFSET} AS doc_id)
            FROM read_parquet('{SRC}/documents.parquet') d,
                 range({SF10_REPLICAS}) t(i)
        ) TO '{SF10_DIR}/documents.parquet' (FORMAT PARQUET)
    """)
    con.execute(f"""
        COPY (
            SELECT e.* REPLACE (vec_id + i * {KEY_OFFSET} AS vec_id)
            FROM read_parquet('{SRC}/embeddings.parquet') e,
                 range({SF10_REPLICAS}) t(i)
        ) TO '{SF10_DIR}/embeddings.parquet' (FORMAT PARQUET)
    """)
    # part is d03's planted-contam dimension — a fixed eval set by
    # design, copied verbatim (the eval benchmark does not grow with
    # the training corpus).
    con.execute(f"""
        COPY (SELECT * FROM read_parquet('{SRC}/part.parquet'))
        TO '{SF10_DIR}/part.parquet' (FORMAT PARQUET)
    """)
    con.close()


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
    build_sf10_data()
    spark = get_spark("wfc3-sf10-ladder")
    specs = load_all()
    par = spark.sparkContext.defaultParallelism
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

    t_start = time.perf_counter()
    samples: dict[tuple[str, str], list[tuple[float, float, float, float]]] = {}
    skipped: dict[str, str] = {}
    probe()
    last = probe()

    def sample(q: str, sf_name: str, sf_dir: str) -> None:
        nonlocal last
        el = run_once(q, sf_dir)
        p_teardown = probe()
        p = probe()
        samples.setdefault((q, sf_name), []).append((el, last, p, p_teardown))
        last = p
        print(
            json.dumps({"sample": q, "sf": sf_name, "wall_s": round(el, 2),
                        "probe": round(p, 3)}),
            flush=True,
        )

    scales = [("sf0.1", SRC), ("sf1", PROBE_DIR), ("sf10", SF10_DIR)]
    linear = [] if ONLY == "quadratic" else LINEAR_QUERIES
    quadratic = [] if ONLY == "linear" else QUADRATIC_QUERIES
    for _ in range(PASSES):
        for sf_name, sf_dir in scales:
            for q in linear:
                if q not in specs:
                    continue
                sample(q, sf_name, sf_dir)

    # Tier B: sf0.1/sf1 cells first (cheap, both passes), then ONE sf10
    # sample each behind the budget guard.
    for _ in range(PASSES):
        for sf_name, sf_dir in scales[:2]:
            for q in quadratic:
                if q not in specs:
                    continue
                sample(q, sf_name, sf_dir)
    for q in quadratic:
        if q not in specs:
            continue
        sf1_wall = min(s[0] for s in samples[(q, "sf1")])
        projected = 30.0 * sf1_wall  # ~110x edges on an edge-minor cell
        remaining = SF10_BUDGET_S - (time.perf_counter() - t_start)
        if projected > remaining:
            skipped[q] = (
                f"sf10 skipped: projected ~{projected:.0f}s (30x sf1 wall, "
                f"~110x candidate edges) > remaining budget {remaining:.0f}s"
            )
            print(json.dumps({"skip": q, "reason": skipped[q]}), flush=True)
            continue
        sample(q, "sf10", SF10_DIR)

    pmin = min(probe_log)
    gate = max(1.5 * pmin, pmin + 0.3)

    results: dict[str, dict] = {}
    for q in linear + quadratic:
        if q not in specs:
            continue
        rec: dict = {}
        for sf_name, _ in scales:
            ss = samples.get((q, sf_name))
            if not ss:
                continue
            rec[sf_name] = round(min(s[0] for s in ss), 2)
            rec[f"{sf_name}_clean"] = any(max(s[1], s[2]) <= gate for s in ss)
        if "sf1" in rec and "sf0.1" in rec and rec["sf0.1"]:
            rec["ratio_1"] = round(rec["sf1"] / rec["sf0.1"], 2)
        if "sf10" in rec and "sf1" in rec and rec["sf1"]:
            rec["ratio_10"] = round(rec["sf10"] / rec["sf1"], 2)
        if q in skipped:
            rec["sf10_skipped"] = skipped[q]
        # no plan_stats here: exchange/scan counts are scale-invariant
        # and already recorded per-round by bench_sf1; re-deriving them
        # at sf10 would re-execute the eager builds (minutes for t01).
        results[q] = rec
        print(json.dumps({"query": q, **rec}), flush=True)

    out = {
        "metric": "sf10_scale_ladder",
        "round": rnd,
        "passes": PASSES,
        "sf10_passes_quadratic_tier": 1,
        "driver_mem": os.environ["SPARK_GRAFT_DRIVER_MEM"],
        "replicas": {"sf1": 10, "sf10": SF10_REPLICAS},
        "semantics": (
            "ratio_1 = sf1/sf0.1 wall, ratio_10 = sf10/sf1 wall; linear "
            "scaling reads as ~10 per decade. sf10 is 100x pure "
            "duplication of sf0.1 documents/embeddings: d02/e02 "
            "candidate-pair relations grow ~110x per decade by "
            "construction (100-clone clusters), which is the "
            "mega-duplicate shape of a real crawl, not an artifact."
        ),
        "calibration": {
            "probe_min": round(pmin, 4),
            "probe_max": round(max(probe_log), 4),
            "gate": round(gate, 4),
        },
        "queries": results,
    }
    suffix = f"-{ONLY}" if ONLY else ""
    path = os.path.join(REPO, f"SF10_LADDER_r{rnd:02d}{suffix}.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
