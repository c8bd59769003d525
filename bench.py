#!/usr/bin/env python
"""Benchmark harness: runs the registered headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is materialized with a noop write (full plan execution, no
driver-side collect), so the numbers measure engine throughput, not
result serialization.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from wfc3_cte_monitor_spark.plans.registry import load_all, set_arm_filter
from wfc3_cte_monitor_spark.session import get_spark

# Headline queries: the flagship DAG + one representative per operator
# family. Kept explicit so the bench is stable as the registry grows.
HEADLINE = [
    "cs01_cte_slope_pairs",
    "cs02_cte_slope_180pairs",
    "cs03_cte_vs_time",
    "cs04_cte_vs_logflux",
    "cs05_results_wide",
    "n03_model_backtest",
    "s01_header_derivations",
    "m01_multimodal_decode",
    "a02_pricing_summary",
    "a04_sigmaclip_mean",
    "a05_regression",
    "a06_overlapping_bins",
    "a07_pivot_wide",
    "a10_sessionize",
    "j01_fanout_join",
    "j02_pair_selfjoin",
    "j07_epoch_band_join",
    "j09_star_join",
    "s07_upsert_merge",
    "n01_quadratic_fit",
    "d01_dedup_exact",
    "d02_lsh_dedup_pipeline",
    "d03_minhash_lsh",
    "e01_cosine_topk",
    "e02_ann_neardup",
    "t01_token_stats",
    "t02_text_profile",
    "ev01_event_windows",
]

# ROUND-OVER-ROUND CONTINUITY (r6 verdict ask #2): the headline total
# moves every round because new oracle-gated arms join existing queries,
# which makes "did the engine get faster" an attribution exercise. The
# FROZEN subtotal times each query restricted to its PREVIOUS-round arm
# set, so round N's frozen_total vs round N-1's TOTAL is one
# subtraction. Arms added after the previous round's boundary are listed
# here per query as (arm_column, frozen_arm_values); queries not listed
# are unchanged and reuse their full-run best. New arms join the frozen
# set only at the NEXT round boundary (update this dict then).
#
# r10 comparison rule: BENCH_r10's frozen_total (t01 replaced by its
# PINNED r9 twin, everything else live) subtracts from BENCH_r09.json's
# TOTAL (82.852 raw on a host_ratio-1.309 window) — both numbers
# measure the full r9 arm set; host drift reads off the sentinels.
FROZEN_ARMS: dict[str, tuple[str, tuple[str, ...]]] = {
    # r11 boundary: EMPTY on purpose (same reasoning as r10). The one
    # arm-set delta this round (t01 gains the dictD family) is carried
    # by the PINNED r10 code twin below — pinned code has no D arms,
    # so t01#frozen is exactly the r10 arm set on r10 code, which
    # dominates an arm-restriction on current code (and a FROZEN_ARMS
    # entry would SHADOW the pinned twin in the builder wiring). The
    # machinery stays for rounds where a changed query has no pinned
    # twin.
}

# PINNED-CODE twins (r8 verdict ask #2): the r8 frozen twin restricted
# ARMS on CURRENT code, so shared-stage code changes leaked into the
# "frozen" number (t01#frozen 10.49s was unexplainable by host drift
# alone). A pinned twin is a verbatim COPY of the previous round's plan
# body, never edited after its boundary — timing it alongside the live
# query makes `live − pinned` the cost of this round's code changes and
# `pinned_rN vs pinned_r{N-1}` pure host drift, with no arm-set or
# shared-stage ambiguity. Re-pin a NEW module at each future boundary
# where the query's code changed; SCALING.md records each re-pin.
PINNED_TWINS: dict[str, tuple[str, str]] = {
    # re-pinned at the r14 boundary (r13 verdict ask #4): the live t01
    # changed in r13 (counts0 round-0 pair-count reuse + the url-arm
    # SaltDecision aggregate), so the r12 twin stopped isolating r14's
    # changes. frozen_t01_r13 was PRE-pinned at the END of r13
    # (scripts/gen_frozen_t01_r13.py) and verified row-identical to
    # live t01 at sf0.001 + sf0.01 before any r14 edit;
    # tests/test_plan_shape.py's pin test imports and compares THIS pin
    # every run (continuous verification, not trust-from-pin-time).
    # frozen_t01_r12 retired at the flip. In BENCH_r14, live − pinned
    # prices exactly ROUND-14's t01 code changes; pinned_r14 vs
    # BENCH_r13's live t01 (23.65 s driver window) is pure host drift
    # on code-identical plans.
    #
    # R15 BUILDER: if round 14 changes t01, pre-pin a fresh
    # plans/frozen_t01_r14.py at the r14 close (gen script pattern),
    # flip this entry, retire frozen_t01_r13, port the pin test, record
    # in SCALING.md. Do NOT flip before the driver writes BENCH_r14.
    "t01_token_stats": (
        "wfc3_cte_monitor_spark.plans.frozen_t01_r13",
        "t01_token_stats_r13",
    ),
    # SECOND pin (r12 verdict ask #3): an I/O-shaped control. The r12
    # window's io_ratio 1.34 moved zero-code-change queries +26-48%
    # (s01 +48%, the most I/O-shaped query) with no per-query control
    # outside t01; this pin gives `live − pinned` coverage at the
    # I/O-shaped end of the suite. Pinned at the r13 boundary from the
    # r12-close body (s01 unchanged at pin time), verified
    # row-identical at sf0.001 + sf0.01.
    "s01_header_derivations": (
        "wfc3_cte_monitor_spark.plans.frozen_s01_r12",
        "s01_header_derivations_r12",
    ),
}

# HOST-DRIFT SENTINEL (r7 verdict ask #2): a PINNED workload — fixed
# literal data, JVM-only (codegen range scan + hash agg, no I/O, no
# Python), never to be touched across rounds — timed in the same
# interleave as the query passes. Its best-of-session against the pinned
# reference below turns "is this host window slower than last round's"
# from a forensic multi-run session into one recorded ratio:
#   host_ratio = sentinel_s / SENTINEL_REF_S
#   frozen_total_norm = frozen_total / host_ratio
# SENTINEL_REF_S was pinned from quiet-window r8 measurements on the
# round-8 host; it is an ANCHOR, not a prediction — only the ratio's
# round-over-round movement carries meaning. Do not re-pin it unless the
# sentinel workload itself changes (then re-pin and note it in
# SCALING.md).
SENTINEL_REF_S = 0.97

# I/O-FLAVORED SENTINEL (r8 verdict ask #3): the CPU sentinel is blind
# to contention that squeezes only the I/O path (page cache pressure,
# disk scheduler bursts) — its documented blind spot made the r8
# normalization contestable for I/O-mixed queries. This second pinned
# workload is a fixed parquet scan + filter + hash agg over a
# DETERMINISTIC file (generated from spark.range once, content
# identical whenever regenerated, never edited). Both ratios are
# emitted; frozen_total_norm stays CPU-sentinel-based (protocol
# continuity), the I/O ratio is the recorded second witness that says
# whether an I/O-heavy query's drift tracks the host's I/O path.
# SENTINEL_IO_REF_S pinned from quiet-window r9 measurements on the
# round-9 host — an ANCHOR, not a prediction (same rule as above).
IO_SENTINEL_PATH = "/tmp/wfc3_bench_io_sentinel_v1"
SENTINEL_IO_REF_S = 0.62

# SUSTAINED-LOAD SENTINEL (r10 verdict ask #3): both short sentinels
# sample ~1 s of host state, and two consecutive rounds hit drift they
# could not see — r9: inflated sentinels + fast queries; r10: quiet
# sentinels + zero-code-change queries reading +8-16% (twin swinging
# 12.39-13.80 s). Contention that only materializes under SUSTAINED
# load (cgroup CPU-quota periods, turbo/thermal limits, page-cache
# churn from a co-tenant) is invisible to a 1 s probe but fully visible
# to a 5-13 s query. This third pinned workload integrates ~9 s of
# mixed CPU + shuffle + join work (fixed-seed generated relations: a
# 600M-row modular-arithmetic scan into a 1M-group hash agg, joined
# against a second 150M-row aggregate, one final reduction — JVM-only,
# deterministic, never to be touched). One sample per interleaved
# sweep. What each sentinel CAN attribute (recorded in SCALING.md):
# CPU/I-O ratios move → instantaneous host pressure on that path;
# sustained ratio moves with quiet short sentinels → sustained-load
# throttling (the r10 signature); ALL quiet while live−pinned moves →
# engine code cost (only the twin separates code from host). Within a
# session, min is the anchor comparator (noise only inflates) and the
# min↔median spread is the sustained-pressure signal — both emitted.
# SENTINEL_SUST_REF_S pinned from quiet-window r11 measurements on the
# round-11 host (6 warm passes: 12.85 8.74 8.50 7.90 8.27 8.31 → min
# 7.90, median 8.5) — an ANCHOR, not a prediction (same rule as above).
SENTINEL_SUST_REF_S = 7.9


def _frozen_builder(specs, name: str, col: str, vals: tuple[str, ...]):
    def build(spark, sf_dir):
        # two pruning mechanisms, both needed: set_arm_filter skips arms
        # whose CONSTRUCTION is eager (driver-side convergence collects),
        # the .where lets Catalyst constant-fold lazily-built union
        # branches whose literal tag can't match down to empty relations.
        set_arm_filter({name: set(vals)})
        try:
            from pyspark.sql import functions as F

            df = specs[name].fn(spark, sf_dir)
            return df.where(F.col(col).isin(*vals)) if col in df.columns else df
        finally:
            set_arm_filter(None)

    return build


def _t01_salt_decision() -> dict | None:
    """The url-arm SaltDecision t01's build recorded this session
    (plans/text_queries.LAST_URL_SALT_DECISION), or None if t01 never
    built. Copied so later builds can't mutate the artifact."""
    try:
        from wfc3_cte_monitor_spark.plans.text_queries import (
            LAST_URL_SALT_DECISION,
        )
    except Exception:
        return None
    return dict(LAST_URL_SALT_DECISION) or None


def main() -> None:
    bench_t0 = time.perf_counter()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = -1.0  # unrecognized dir naming; timings still valid
    spark = get_spark("wfc3-cte-bench")

    specs = load_all()
    names = [n for n in HEADLINE if n in specs]

    # Builders: every headline query plus a "<name>#frozen" twin per
    # query that either gained arms since the boundary (FROZEN_ARMS,
    # arm-restriction on current code) or has a pinned-code copy
    # (PINNED_TWINS, previous round's verbatim plan body) — measured
    # with the SAME pass/probe/redo machinery.
    builders = {n: specs[n].fn for n in names}
    frozen_keys: dict[str, str] = {}
    for n, (col, vals) in FROZEN_ARMS.items():
        if n in names:
            key = n + "#frozen"
            builders[key] = _frozen_builder(specs, n, col, vals)
            frozen_keys[n] = key
    import importlib

    for n, (mod_name, fn_name) in PINNED_TWINS.items():
        if n in names and n not in frozen_keys:
            key = n + "#frozen"
            builders[key] = getattr(importlib.import_module(mod_name), fn_name)
            frozen_keys[n] = key
    run_list = names + sorted(frozen_keys.values())

    # Twin placement is RANDOMIZED within each sweep (deterministic
    # seed per pass) instead of appended at the end: the r8 end-of-
    # sweep slot put every twin sample in the same (documented slow)
    # window, biasing twin-vs-live deltas.
    import random

    def sweep_order(seed: int) -> list[str]:
        order = list(names)
        rng = random.Random(seed)
        for key in sorted(frozen_keys.values()):
            order.insert(rng.randrange(len(order) + 1), key)
        return order

    # Warm the JVM + parquet footer caches with the cheapest query once.
    specs[names[0]].fn(spark, sf_dir).write.mode("overwrite").format("noop").save()

    # Warm the Python/Arrow worker pool: the first pandas-UDF task pays
    # fork + numpy/pandas import once per core — an environment startup
    # cost, not a query cost; without this it lands on whichever query
    # first touches Python and misattributes ~4s of its "cold" time.
    par = spark.sparkContext.defaultParallelism
    (
        spark.range(par).repartition(par)
        .mapInPandas(lambda it: it, "id long")
        .write.mode("overwrite").format("noop").save()
    )

    # Per-pass GC attribution: local mode is ONE JVM, so the GC-bean
    # collection-time delta across a pass is exactly the stop-the-world
    # time the query's tasks shared. A pass whose wall sits 10s above its
    # best with ~10s of GC delta is self-explaining (the n03-class
    # spread r5 could not attribute); a slow pass with ~0 GC points at
    # scheduling/contention instead.
    _mf = spark.sparkContext._jvm.java.lang.management.ManagementFactory
    _gc_beans = _mf.getGarbageCollectorMXBeans()
    # JVM pid via ProcessHandle (the MXBean's getProcessCpuTime lives on
    # the com.sun interface, which py4j cannot reach through JPMS);
    # /proc/<pid>/stat utime+stime gives the same process-CPU clock.
    _jvm_pid = int(spark.sparkContext._jvm.java.lang.ProcessHandle.current().pid())
    _tick = os.sysconf("SC_CLK_TCK")

    def _gc_ms() -> int:
        return sum(int(b.getCollectionTime()) for b in _gc_beans)

    def _cpu_ms() -> int:
        # JVM process CPU (driver + all local-mode executor threads).
        # Per-pass delta separates the two slow-pass causes the wall
        # clock can't: cpu ≈ typical but wall inflated → the JVM was
        # STARVED (external contention); cpu inflated with wall → the
        # pass genuinely did more work (plan/JIT/GC-adjacent).
        with open(f"/proc/{_jvm_pid}/stat") as fh:
            parts = fh.read().rsplit(") ", 1)[1].split()
        return (int(parts[11]) + int(parts[12])) * 1000 // _tick

    gc_log: dict[str, list[int]] = {}
    cpu_log: dict[str, list[int]] = {}

    # --- per-pass STAGE metrics from the AppStatusStore (r6 ask #3) ----------
    # Task-time is the wall clock's missing witness: a slow pass whose
    # summed executorRunTime matches the fast pass's did the SAME work —
    # the extra wall is host interference (starved threads), not plan
    # cost. Stages completed during a pass are identified by stage id
    # above the last high-water mark, so status-store eviction of old
    # stages can't corrupt the deltas.
    _store = spark.sparkContext._jsc.sc().statusStore()
    _jvm2 = spark.sparkContext._jvm
    _qarr = spark.sparkContext._gateway.new_array(_jvm2.double, 0)
    _hiwater = [-1]
    _bus = spark.sparkContext._jsc.sc().listenerBus()

    def _new_stage_totals() -> dict[str, int]:
        # The AppStatusStore is fed by the ASYNC listener bus: a stage
        # whose completion event hasn't been processed yet would be
        # excluded from this pass's run_ms AND permanently skipped via
        # the raised high-water mark — undercounting a pass's task time
        # and mislabeling a genuinely-slow pass as 'interference'. Drain
        # the bus first so stage deltas are complete.
        try:
            _bus.waitUntilEmpty(10_000)
        except Exception:
            pass  # timed out mid-burst: proceed with what's visible
        stages = _store.stageList(
            _jvm2.java.util.ArrayList(), False, False, _qarr,
            _jvm2.java.util.ArrayList(),
        )
        out = {"stages": 0, "tasks": 0, "run_ms": 0, "cpu_ms": 0,
               "gc_ms": 0, "deser_ms": 0}
        max_id = _hiwater[0]
        it = stages.iterator()
        while it.hasNext():
            st = it.next()
            sid = st.stageId()
            if sid <= _hiwater[0]:
                continue
            max_id = max(max_id, sid)
            if st.status().toString() != "COMPLETE":
                continue
            out["stages"] += 1
            out["tasks"] += st.numCompleteTasks()
            out["run_ms"] += st.executorRunTime()
            out["cpu_ms"] += int(st.executorCpuTime()) // 1_000_000
            out["gc_ms"] += st.jvmGcTime()
            out["deser_ms"] += st.executorDeserializeTime()
        _hiwater[0] = max_id
        return out

    stage_log: dict[str, list[dict[str, int]]] = {}

    def run_once(name: str) -> float:
        _new_stage_totals()  # flush probe/warmup stages past the high-water
        g0, c0 = _gc_ms(), _cpu_ms()
        t0 = time.perf_counter()
        builders[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
        elapsed = time.perf_counter() - t0
        stage_log.setdefault(name, []).append(_new_stage_totals())
        gc_log.setdefault(name, []).append(_gc_ms() - g0)
        cpu_log.setdefault(name, []).append(_cpu_ms() - c0)
        # release dropped shuffle files/broadcasts: the ContextCleaner only
        # frees them after a driver GC, and letting them pile up across ~75
        # executions skews late queries (observed 4s -> 27s on the same plan)
        spark.sparkContext._jvm.System.gc()
        return elapsed

    # --- calibration probe --------------------------------------------------
    # A fixed CPU-bound job timed BETWEEN passes. Host-noise bursts here
    # last tens of seconds, so a burst that inflates a query pass also
    # inflates the probes bracketing it; a pass whose surrounding probes
    # drifted past the gate is marked SUSPECT and re-run. This is the
    # r4 lesson: dispersion/stall triggers can't save a query when EVERY
    # scheduled pass lands in a burst — only an external time reference
    # can (official r4 best-of sat 2-3x above quiet-window reruns).
    # This leg is deliberately JVM-only (codegen range-sum, no I/O, no
    # Python) so its reference floor is tight; the Python-worker domain
    # gets its OWN separately-gated leg below (r5's attempt to share one
    # gate failed because the Arrow roundtrip jitters ~2.4x even quiet).
    probe_df = spark.range(0, 200_000_000, 1, par).selectExpr(
        "sum(id * 3 + 1) AS s"
    )
    probe_log: list[float] = []

    # Second, separately-gated probe for the PYTHON-WORKER domain: a tiny
    # fixed mapInPandas job (fork-warmed pool, numpy already imported) that
    # pays one Arrow roundtrip per core plus a bounded numpy kernel. The
    # JVM probe is blind to contention that squeezes only the Arrow/pandas
    # workers (r5: n03 spanned 4.2-18.3s with every pass "clean"); this
    # leg sees it. It is gated on ITS OWN session-min with a WIDER gate —
    # the roundtrip itself jitters ~2.4x between quiet windows, which is
    # why the r5 attempt to fold a Python leg into the shared JVM gate
    # poisoned the reference and was rejected — and it only flags queries
    # whose physical plan actually contains Python eval nodes.
    def _py_work(it):
        import numpy as np  # already imported in the warmed workers

        for pdf in it:
            a = np.arange(200_000, dtype="float64")
            yield pdf.assign(id=pdf["id"] + int(np.sin(a).sum() * 0))

    pyprobe_df = spark.range(par).repartition(par).mapInPandas(_py_work, "id long")
    pyprobe_log: list[float] = []

    # The pinned host-drift sentinel (see SENTINEL_REF_S above): big
    # enough (~1-1.5s quiet) that scheduler jitter is a small fraction,
    # JVM-only so the Python worker pool can't color it, one hash-agg
    # exchange so it exercises the shuffle machinery queries live on.
    sentinel_df = (
        spark.range(0, 1_000_000_000, 1, par)
        .selectExpr("id % 4096 AS k", "id * 3 + 1 AS v")
        .groupBy("k")
        .sum("v")
    )
    sentinel_log: list[float] = []

    def sentinel() -> float:
        t0 = time.perf_counter()
        sentinel_df.write.mode("overwrite").format("noop").save()
        s = time.perf_counter() - t0
        sentinel_log.append(s)
        return s

    # The pinned I/O sentinel (see SENTINEL_IO_REF_S above). The file is
    # deterministic spark.range output — (re)generated only when absent,
    # byte-stable content, fixed 32-way layout; the job is a full scan
    # (two bigints + a short string column), a 1-in-11 filter and one
    # hash agg: scan-dominated by construction.
    if not os.path.exists(os.path.join(IO_SENTINEL_PATH, "_SUCCESS")):
        (
            spark.range(0, 40_000_000, 1, 32)
            .selectExpr(
                "id % 9973 AS k", "id * 7 + 3 AS v",
                "concat('r-', id % 131071) AS s",
            )
            .write.mode("overwrite").parquet(IO_SENTINEL_PATH)
        )
    io_sentinel_df = (
        spark.read.parquet(IO_SENTINEL_PATH)
        .where("v % 11 = 0")
        .selectExpr("k", "v", "length(s) AS ls")
        .groupBy("k")
        .sum("v", "ls")
    )
    io_sentinel_log: list[float] = []

    def io_sentinel() -> float:
        t0 = time.perf_counter()
        io_sentinel_df.write.mode("overwrite").format("noop").save()
        s = time.perf_counter() - t0
        io_sentinel_log.append(s)
        return s

    # The pinned sustained-load sentinel (see SENTINEL_SUST_REF_S
    # above): ~9 s quiet of mixed CPU + two hash-agg shuffles + one
    # 1M×1M join + final reduction, all from deterministic range
    # generators — long enough to feel sustained-load throttling the
    # 1 s probes cannot.
    from pyspark.sql import functions as _SF

    sust_sentinel_df = (
        spark.range(0, 600_000_000, 1, par)
        .selectExpr("id % 1048576 AS k", "(id * 31 + 7) % 1000000007 AS v")
        .groupBy("k")
        .agg(_SF.sum("v").alias("sv"), _SF.count(_SF.lit(1)).alias("c"))
        .join(
            spark.range(0, 150_000_000, 1, par)
            .selectExpr("id % 1048576 AS k", "(id * 13 + 5) % 999983 AS w")
            .groupBy("k")
            .agg(_SF.sum("w").alias("sw")),
            "k",
        )
        .selectExpr("sum(sv + sw * c) AS s")
    )
    sust_sentinel_log: list[float] = []

    def sust_sentinel() -> float:
        t0 = time.perf_counter()
        sust_sentinel_df.write.mode("overwrite").format("noop").save()
        s = time.perf_counter() - t0
        sust_sentinel_log.append(s)
        return s

    def probe() -> tuple[float, float]:
        t0 = time.perf_counter()
        probe_df.write.mode("overwrite").format("noop").save()
        jvm = time.perf_counter() - t0
        probe_log.append(jvm)
        t0 = time.perf_counter()
        pyprobe_df.write.mode("overwrite").format("noop").save()
        py = time.perf_counter() - t0
        pyprobe_log.append(py)
        return jvm, py

    # A pass is SUSPECT when either bracketing probe exceeds
    # max(1.5x session-min, session-min + 0.5s): the ratio term is the
    # r4 drift gate, the absolute term keeps the gate meaningful — the
    # probe itself jitters ~2x around a ~0.1s floor (JIT/GC/scheduling),
    # which is noise no multi-second query can feel, while a real host
    # burst inflates the probe by SECONDS. Without the absolute floor the
    # first calibrated run marked 21/26 queries all-suspect and burned
    # the whole redo budget on phantom drift; with 0.5s slack a follow-up
    # run flagged nothing. 0.3s splits the difference: >3x the observed
    # quiet-window probe jitter, far below any burst that matters.
    PROBE_DRIFT = 1.5
    PROBE_SLACK_S = 0.3
    # Python-leg gate: wider than the JVM gate because the Arrow worker
    # roundtrip itself jitters ~2.4x between quiet windows (measured r5)
    # — 3x + 1.0s only trips on multi-second worker-pool stalls, which is
    # the n03/e01/m01 failure mode this leg exists to surface.
    PYPROBE_DRIFT = 3.0
    PYPROBE_SLACK_S = 1.0

    # Does this query's physical plan run anything in Python workers?
    # Decided from the plan itself (not a hand-kept list) so the py-leg
    # gate tracks the code: only those queries can be py-flagged.
    _PY_NODES = ("ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas",
                 "BatchEvalPython", "PythonUDF", "FlatMapGroupsInPandasWithState")
    uses_python: dict[str, bool] = {}

    def _uses_python(name: str) -> bool:
        if name not in uses_python:
            # build the probe plan with checkpoint truncation DISABLED:
            # the lazy-checkpoint sites re-root their subtree at a
            # LogicalRDD, which would hide e.g. e01's pandas-UDF stages
            # from the inspector (observed: e01 read as Python-free)
            from wfc3_cte_monitor_spark.checkpointing import DISABLE_CONF

            spark.conf.set(DISABLE_CONF, "true")
            try:
                plan = (
                    builders[name](spark, sf_dir)
                    ._jdf.queryExecution().executedPlan().toString()
                )
            finally:
                spark.conf.set(DISABLE_CONF, "false")
            uses_python[name] = any(m in plan for m in _PY_NODES)
        return uses_python[name]

    # per query: list of (elapsed, jvm_before, jvm_after, py_before, py_after)
    all_passes: dict[str, list[tuple[float, float, float, float, float]]] = {n: [] for n in run_list}

    # Three passes per query, INTERLEAVED across queries (pass 1 of every
    # query, then pass 2, then pass 3): consecutive per-query passes let
    # one burst poison all of a single query's samples (r3: cs03 spread
    # 8.3-16.2s); interleaving decorrelates the burst from any one query.
    # Pass 1 ("cold") pays plan compilation + whole-stage codegen; passes
    # 2-3 are steady-state. Consecutive queries share the bracketing
    # probe, so calibration costs one probe pair per pass, not two.
    # Scheduled pass count: 3 is the measurement protocol (cold + two
    # steady-state, interleaved); SPARK_GRAFT_BENCH_PASSES=1 is a smoke
    # knob for validating the harness itself without the full budget.
    n_passes = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "3")))

    # warm the sentinel plans once, untimed: the first executions pay
    # whole-stage codegen (~3.5s vs ~1s steady) which would otherwise
    # make pass-1's samples pure compile noise (the I/O sentinel's
    # warm run also primes the page cache — deliberate: the steady-state
    # cached-scan floor is the pinned reference, not cold disk)
    sentinel_df.write.mode("overwrite").format("noop").save()
    io_sentinel_df.write.mode("overwrite").format("noop").save()
    sust_sentinel_df.write.mode("overwrite").format("noop").save()

    probe()  # settle + first sample
    last_probe = probe()
    for p_i in range(n_passes):
        sentinel()  # one pinned-workload sample per interleaved sweep
        io_sentinel()
        sust_sentinel()
        for name in sweep_order(1000 + p_i):
            elapsed = run_once(name)
            p_after = probe()
            all_passes[name].append((elapsed, *last_probe, *p_after))
            last_probe = p_after

    # FROZEN session minima (r5 ADVICE): the redo decisions and the final
    # clean flags must use the SAME reference, or a probe minimum found
    # after a query's redos can retroactively mark passes the redo phase
    # accepted as suspect — an inconsistent confidence record. Freeze
    # after the scheduled passes (28+ samples: plenty to find the quiet
    # floor); later probes still log for the spread record but never move
    # the gate.
    probe_min = min(probe_log)
    pyprobe_min = min(pyprobe_log)

    def jvm_clean(p: tuple[float, ...]) -> bool:
        return max(p[1], p[2]) <= max(PROBE_DRIFT * probe_min, probe_min + PROBE_SLACK_S)

    def py_clean(p: tuple[float, ...]) -> bool:
        return max(p[3], p[4]) <= max(
            PYPROBE_DRIFT * pyprobe_min, pyprobe_min + PYPROBE_SLACK_S
        )

    def clean(name: str, p: tuple[float, ...]) -> bool:
        return jvm_clean(p) and (py_clean(p) if _uses_python(name) else True)

    # Redo phase: any query with no CLEAN warm pass gets re-run (fresh
    # probe bracket each time) until one lands in a quiet window.
    # Globally bounded so a fully-loaded host can't run away.
    redo_budget = 20 if n_passes >= 2 else 0
    n_redone = 0
    for name in run_list:
        tries = 0
        while tries < 3 and redo_budget > 0:
            if any(clean(name, p) for p in all_passes[name][1:]):
                break
            elapsed = run_once(name)
            p_after = probe()
            all_passes[name].append((elapsed, *last_probe, *p_after))
            last_probe = p_after
            tries += 1
            redo_budget -= 1
            n_redone += 1

    # One extra interleaved pass over every query when time permits — a
    # sample in yet another time window, budgeted against wall-clock so
    # the driver's timeout is never approached.
    EXTRA_PASS_BUDGET_S = 420.0
    if n_passes >= 3 and time.perf_counter() - bench_t0 < EXTRA_PASS_BUDGET_S:
        sentinel()
        io_sentinel()
        sust_sentinel()
        for name in sweep_order(1999):
            elapsed = run_once(name)
            p_after = probe()
            all_passes[name].append((elapsed, *last_probe, *p_after))
            last_probe = p_after

    # --- per-arm timing manifest (r8 verdict ask #4) ----------------------
    # The mega-queries host 7-15 tagged-union arms each; their headline
    # numbers are unreadable without per-arm prices, which until r8 were
    # narrated as session-prose A/Bs. One arm-restricted timing per arm,
    # machine-emitted, JVM fully warm (runs after the scheduled passes):
    #   only:<arm>    — the arm alone plus the shared stages it pulls in
    #                   (NOT a marginal price: shared stages are counted
    #                   in every arm's 'only' time);
    #   without:<arm> — for eager pseudo-arms (construction-time work
    #                   outside the tag column), the complement run; the
    #                   marginal price is queries_best[q] − without:<arm>.
    # Arm sets are DISCOVERED from the result relation (distinct over
    # the tag column), so the manifest tracks the code with no
    # hand-kept list to go stale.
    ARM_PRICE_QUERIES = [
        "t01_token_stats", "t02_text_profile", "d03_minhash_lsh",
        "ev01_event_windows", "d02_lsh_dedup_pipeline",
    ]
    PSEUDO_ARMS = {  # set_arm_filter-consulted construction gates
        "t02_text_profile": ("tri",),
        "d02_lsh_dedup_pipeline": ("incr_cc",),
    }
    ARM_PRICE_TOTAL_BUDGET_S = 1500.0  # wall gate: never threaten the driver timeout
    arm_prices: dict[str, dict[str, float]] = {}

    def _timed_noop(df) -> float:
        t0 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        el = time.perf_counter() - t0
        spark.sparkContext._jvm.System.gc()  # same cleaner hygiene as run_once
        return el

    if n_passes >= 3:
        from pyspark.sql import functions as _F

        for qname in ARM_PRICE_QUERIES:
            if qname not in specs:
                continue
            if time.perf_counter() - bench_t0 > ARM_PRICE_TOTAL_BUDGET_S:
                arm_prices.setdefault("_truncated", {})[qname] = -1.0
                continue

            # the budget is re-checked INSIDE the per-arm loop too (r9
            # ADVICE: checking only between queries let one query's
            # full sweep — untimed arm discovery + up to ~16 timed arm
            # runs — overshoot the wall gate by minutes); a partial
            # entry carries an explicit truncation marker so the
            # manifest never reads as a complete sweep when it isn't.
            def _over_budget() -> bool:
                return time.perf_counter() - bench_t0 > ARM_PRICE_TOTAL_BUDGET_S

            entry: dict[str, float] = {}
            df_full = specs[qname].fn(spark, sf_dir)
            tag_col = next((c for c in ("which", "kind") if c in df_full.columns), None)
            truncated = False
            if tag_col is not None:
                vals = sorted(
                    r[0] for r in df_full.select(tag_col).distinct().collect()
                    if r[0] is not None
                )
                for v in vals:
                    if _over_budget():
                        truncated = True
                        break
                    set_arm_filter({qname: {v}})
                    try:
                        d = specs[qname].fn(spark, sf_dir)
                        entry["only:" + v] = round(
                            _timed_noop(d.where(_F.col(tag_col) == v)), 3
                        )
                    finally:
                        set_arm_filter(None)
            for pv in PSEUDO_ARMS.get(qname, ()):
                if truncated or _over_budget():
                    truncated = True
                    break
                # complement run: every tag arm, pseudo-arm excluded
                set_arm_filter({qname: {"__all_but__" + pv}})
                try:
                    entry["without:" + pv] = round(
                        _timed_noop(specs[qname].fn(spark, sf_dir)), 3
                    )
                finally:
                    set_arm_filter(None)
            if truncated:
                entry["_truncated_mid_sweep"] = -1.0
                arm_prices.setdefault("_truncated", {})[qname] = -1.0
            arm_prices[qname] = entry

    # --- eager-construction pricing (r11 verdict ask #4) ------------------
    # Families whose cost lands at plan-BUILD time (driver-side collects
    # while fn() constructs the DataFrame: d02's incremental-CC store
    # build, t01's dictD training rounds) are invisible to the per-arm
    # noop timer above — the arm manifest priced the dictD family's lazy
    # arms at ~2.9 s and left the eager slice attributable only by
    # subtraction. construction_s times the fn() CALL ITSELF with the
    # family's arms requested (the construction gates consult
    # active_arms, so exactly that family's eager work runs), plus a
    # "__none__" baseline with every eager gate closed (pure lazy plan
    # assembly). SEMANTICS: a family's eager scans EXECUTE their shared
    # lazy prerequisites (t01's tokenize+hash checkpoint, d02's shingle
    # pipeline), so construction_s[fam] is "when the wall is paid"
    # (query wall ≈ construction + noop-write residue; the write then
    # reuses the checkpoints), NOT the family's marginal price — that
    # stays full-vs-excluded (the twin / dictd_price_probe numbers).
    EAGER_FAMILIES: dict[str, dict[str, frozenset[str]]] = {
        "t01_token_stats": {
            "dictD": frozenset({"dictD", "mergeD", "encodeD", "inferD", "decodeD"}),
            # any single lazy arm name closes every eager gate
            "__none__": frozenset({"doc"}),
        },
        "d02_lsh_dedup_pipeline": {
            "incr_cc": frozenset({"incr_cc"}),
            "__none__": frozenset({"full"}),
        },
    }
    construction_s: dict[str, dict[str, float]] = {}
    construction_samples: dict[str, dict[str, int]] = {}
    if n_passes >= 3:
        # min of 2 INTERLEAVED samples (r12 ADVICE: every other bench
        # number is best-of-N across sweeps; a single-sample
        # construction_s put one host burst directly in the artifact).
        # The budget gate runs per FAMILY, not per query, so a slow
        # first family can't blow the wall mid-query; families cut
        # short carry an explicit sample count for the reader.
        _cons_raw: dict[str, dict[str, list[float]]] = {}
        for _rep in range(2):
            for qname, fams in EAGER_FAMILIES.items():
                if qname not in specs:
                    continue
                for fam, fam_arms in fams.items():
                    got = _cons_raw.setdefault(qname, {}).setdefault(fam, [])
                    if time.perf_counter() - bench_t0 > ARM_PRICE_TOTAL_BUDGET_S:
                        if not got:
                            construction_s.setdefault("_truncated", {})[qname] = -1.0
                        continue
                    set_arm_filter({qname: fam_arms})
                    try:
                        t0 = time.perf_counter()
                        specs[qname].fn(spark, sf_dir)
                        got.append(time.perf_counter() - t0)
                    finally:
                        set_arm_filter(None)
        for qname, fams in _cons_raw.items():
            for fam, samples in fams.items():
                # a family cut to ZERO samples is still NAMED (count 0)
                # so the reader can tell skipped from never-defined
                construction_samples.setdefault(qname, {})[fam] = len(samples)
                if samples:
                    construction_s.setdefault(qname, {})[fam] = round(
                        min(samples), 3
                    )

    # Self-describing marginal (r12 verdict ask #5): construction_s[fam]
    # INCLUDES the shared lazy prerequisites the family's eager scans
    # execute (t01's tokenize+hash checkpoint), so the readable marginal
    # is family − __none__ — emitted here so BENCH_DETAIL can't be
    # misread without SCALING.md in hand.
    construction_marginal_s: dict[str, dict[str, float]] = {}
    for qname, fams in construction_s.items():
        if qname.startswith("_") or "__none__" not in fams:
            continue
        base = fams["__none__"]
        for fam, v in fams.items():
            if fam != "__none__":
                construction_marginal_s.setdefault(qname, {})[fam] = round(
                    v - base, 3
                )

    # --- arm-placement policy hook (r11 verdict ask #5) -------------------
    # COVERAGE.md §"Arm-placement policy" sets a per-arm price ceiling:
    # a new family lands on a BENCHED host only if its steady-state cost
    # belongs in the headline number, and any 'only:' arm price above
    # the ceiling must cite a SCALING.md justification. This emits the
    # violations into every artifact so the policy is checked by the
    # bench, not by prose review. (only: prices include the shared
    # stages an arm pulls in, so the shared-substrate floor — tokenize +
    # per-doc stats for t01 — sits in every arm's price; the ceiling is
    # set above that floor.)
    ARM_PRICE_CEILING_S = 2.5
    arm_ceiling_flags: dict[str, dict[str, float]] = {}
    for qname, entry in arm_prices.items():
        if qname.startswith("_"):
            continue
        over = {
            k: v
            for k, v in entry.items()
            if k.startswith("only:") and v > ARM_PRICE_CEILING_S
        }
        if over:
            arm_ceiling_flags[qname] = over

    def best_of(name: str) -> float:
        """Per-query headline: best over ALL passes. Host noise can only
        INFLATE a wall-clock sample, never deflate it, so the fastest
        pass is always valid evidence of engine cost — even when its
        probe bracket was flagged (a burst near a pass proves nothing
        about the pass's own quiet portions). The clean flags therefore
        drive the REDO decision (guarantee at least one quiet sample
        exists) and the sidecar's confidence record, not sample
        selection: preferring a slower clean pass over a faster suspect
        one was observed to over-report a query by 2x in one window."""
        return min(p[0] for p in all_passes[name])

    timings = {n: round(p[0][0], 3) for n, p in all_passes.items()}
    timings_warm = {
        n: round(min(t[0] for t in (p[1:] or p)), 3) for n, p in all_passes.items()
    }
    timings_best = {n: round(best_of(n), 3) for n in run_list}
    passes = {n: [round(t[0], 3) for t in p] for n, p in all_passes.items()}
    clean_flags = {
        n: [clean(n, p) for p in ps] for n, ps in all_passes.items()
    }
    py_clean_flags = {
        n: [py_clean(p) for p in ps] for n, ps in all_passes.items() if _uses_python(n)
    }
    all_suspect = sorted(n for n, flags in clean_flags.items() if not any(flags))

    # Slow-pass attribution KEYED ON TASK TIME, not wall (r6 ask #3): for
    # every pass with wall > 1.5x the query's best, compare its summed
    # executorRunTime to the best pass's. Within 1.25x -> the work was
    # identical, the wall gap is host INTERFERENCE; above -> the pass
    # genuinely did more task work (GC pressure, spill, recompilation —
    # see its gc_ms). This is the n03-outlier decomposition the wall
    # clock alone could never make.
    slow_pass_attribution: dict[str, list[dict]] = {}
    for n, ps in all_passes.items():
        walls = [p[0] for p in ps]
        runs = [m["run_ms"] for m in stage_log.get(n, [])]
        if len(runs) != len(walls) or not runs:
            continue
        i_best = walls.index(min(walls))
        for i, (wall, run) in enumerate(zip(walls, runs)):
            if wall > 1.5 * walls[i_best] and wall - walls[i_best] > 0.5:
                ref = max(runs[i_best], 1)
                slow_pass_attribution.setdefault(n, []).append({
                    "pass": i,
                    "wall": round(wall, 3),
                    "wall_best": round(walls[i_best], 3),
                    "run_ms": run,
                    "run_ms_best": runs[i_best],
                    "gc_ms": stage_log[n][i]["gc_ms"],
                    "cause": "interference" if run <= 1.25 * ref else "extra_work",
                })

    total = round(sum(timings_best[n] for n in names), 3)
    # Frozen subtotal: previous round's arm set per query — the round-
    # over-round comparable number (changed queries use their #frozen
    # twin's best).
    frozen_total = round(
        sum(timings_best[frozen_keys.get(n, n)] for n in names), 3
    )
    # Host-drift normalization: best-of-session sentinel vs the pinned
    # anchor. Host noise only INFLATES the sentinel, so min is the right
    # statistic (same argument as best_of). ratio > 1 → this window is
    # slower than the anchor window; dividing the frozen subtotal by it
    # expresses the round in anchor-window seconds.
    sentinel_s = round(min(sentinel_log), 3)
    host_ratio = round(sentinel_s / SENTINEL_REF_S, 4)
    frozen_total_norm = round(frozen_total / host_ratio, 3)
    sentinel_io_s = round(min(io_sentinel_log), 3)
    io_ratio = round(sentinel_io_s / SENTINEL_IO_REF_S, 4)
    # sustained sentinel: min anchors against the pinned reference (noise
    # only inflates); the min↔median spread within the session is the
    # sustained-pressure signal the short sentinels cannot carry
    sentinel_sust_s = round(min(sust_sentinel_log), 3)
    sust_ratio = round(sentinel_sust_s / SENTINEL_SUST_REF_S, 4)
    sentinel_sust_med_s = round(
        sorted(sust_sentinel_log)[len(sust_sentinel_log) // 2], 3
    )
    sust_med_ratio = round(sentinel_sust_med_s / SENTINEL_SUST_REF_S, 4)

    # Full per-pass detail (cold/warm split + min/median/max spread, so a
    # noisy-neighbor stall is distinguishable from a plan regression) goes
    # to a sidecar file: the driver's tail capture truncates long stdout
    # lines, which made the round-2 headline machine-unreadable.
    detail = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "frozen_total": frozen_total,
        "sentinel_s": sentinel_s,
        "sentinel_ref_s": SENTINEL_REF_S,
        "host_ratio": host_ratio,
        "frozen_total_norm": frozen_total_norm,
        "sentinel_passes": [round(s, 3) for s in sentinel_log],
        "sentinel_io_s": sentinel_io_s,
        "sentinel_io_ref_s": SENTINEL_IO_REF_S,
        "io_ratio": io_ratio,
        "sentinel_io_passes": [round(s, 3) for s in io_sentinel_log],
        "sentinel_sust_s": sentinel_sust_s,
        "sentinel_sust_ref_s": SENTINEL_SUST_REF_S,
        "sust_ratio": sust_ratio,
        "sentinel_sust_med_s": sentinel_sust_med_s,
        "sust_med_ratio": sust_med_ratio,
        "sentinel_sust_passes": [round(s, 3) for s in sust_sentinel_log],
        # r9 verdict ask #6: frozen_total_norm divides a MIXED CPU/I-O
        # workload by the CPU ratio alone, so it is DIRECTIONAL, not a
        # precise host-independent number. The I/O-normalized companion
        # below brackets the truth from the other side: when the two
        # agree the window is uniform drift and either is trustworthy;
        # when they diverge (|host_ratio − io_ratio| large) quote raw
        # totals + both ratios and normalize nothing.
        "frozen_total_norm_io": round(frozen_total / io_ratio, 3) if io_ratio > 0 else None,
        "norm_basis": "frozen_total_norm is CPU-sentinel-based; "
        "frozen_total_norm_io is IO-sentinel-based; both directional — "
        "a mixed workload has no single drift ratio",
        "arm_prices": arm_prices,
        "construction_s": construction_s,
        "construction_samples": construction_samples,
        "construction_marginal_s": construction_marginal_s,
        "construction_semantics": "construction_s[fam] = wall of the fn() "
        "build with only that family's eager gates open, INCLUDING the "
        "shared lazy prerequisites its scans execute; the family's "
        "readable marginal price is construction_marginal_s[fam] = "
        "family - __none__ (min of 2 interleaved samples; "
        "construction_samples records how many landed)",
        "arm_ceiling_flags": arm_ceiling_flags,
        # r12 verdict ask #7: the url-arm SaltDecision recorded by t01's
        # build (log-only; see plans/text_queries.LAST_URL_SALT_DECISION)
        "t01_url_salt_decision": _t01_salt_decision(),
        "frozen_arms": {n: list(v[1]) for n, v in FROZEN_ARMS.items()},
        "pinned_twins": {n: f"{m}.{f}" for n, (m, f) in PINNED_TWINS.items()},
        "queries_best": timings_best,
        "queries_cold": timings,
        "cold_total": round(sum(timings.values()), 3),
        "queries_warm": timings_warm,
        "warm_total": round(sum(timings_warm.values()), 3),
        "passes": passes,
        "gc_ms": gc_log,
        "cpu_ms": cpu_log,
        "stage_metrics": stage_log,
        "slow_pass_attribution": slow_pass_attribution,
        "clean": clean_flags,
        "py_clean": py_clean_flags,
        "uses_python": {n: _uses_python(n) for n in names},
        "all_suspect": all_suspect,
        "calibration": {
            # minima FROZEN after the scheduled passes — the same reference
            # the redo decisions used (r5 ADVICE consistency fix)
            "probe_min": round(probe_min, 4),
            "probe_median": round(sorted(probe_log)[len(probe_log) // 2], 4),
            "probe_max": round(max(probe_log), 4),
            "probe_min_all": round(min(probe_log), 4),
            "probe_drift_gate": PROBE_DRIFT,
            "pyprobe_min": round(pyprobe_min, 4),
            "pyprobe_median": round(sorted(pyprobe_log)[len(pyprobe_log) // 2], 4),
            "pyprobe_max": round(max(pyprobe_log), 4),
            "pyprobe_min_all": round(min(pyprobe_log), 4),
            "pyprobe_drift_gate": PYPROBE_DRIFT,
            "n_probes": len(probe_log),
            "n_redone": n_redone,
        },
        "spread": {
            n: {
                "min": min(p),
                "median": sorted(p)[len(p) // 2],
                "max": max(p),
            }
            for n, p in passes.items()
        },
    }
    detail_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json")
    with open(detail_path, "w") as fh:
        json.dump(detail, fh, indent=1)

    # The ONE driver-parsed line: compact — headline value + per-query
    # best-of-3 only. Keep this under ~2 KB so tail capture can't split it.
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "frozen_total": frozen_total,
                "sentinel_s": sentinel_s,
                "host_ratio": host_ratio,
                "frozen_total_norm": frozen_total_norm,
                "sentinel_io_s": sentinel_io_s,
                "io_ratio": io_ratio,
                "sentinel_sust_s": sentinel_sust_s,
                "sust_ratio": sust_ratio,
                "sust_med_ratio": sust_med_ratio,
                # self-description (r9 verdict ask #6): what the
                # normalized number can and cannot claim
                "norm_basis": "cpu-sentinel-only; directional — "
                "overstates precision when io_ratio diverges from "
                "host_ratio; raw totals + both ratios are the record",
                "queries": {n: timings_best[n] for n in names},
                "frozen_queries": {
                    k: timings_best[k] for k in sorted(frozen_keys.values())
                },
                "sf": sf,
            },
            separators=(",", ":"),
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
