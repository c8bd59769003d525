"""One switch for every diamond-reuse materialization in the engine.

Every plan that feeds one relation into several downstream subtrees
(the pair map + re-attach + zero-fill in ``plans/pipeline``, the LSH
index layouts and decoded corpus in ``functions/similarity``, the
band/edge tables in ``plans/dedup_queries``, the trend/fileinfo analogs
in ``plans/domain_queries``) truncates the shared subtree with a
checkpoint so it executes once. Two strategies exist:

- ``localCheckpoint`` (default): executor-local, unreplicated blocks —
  the fast single-node path, and the right call on a static cluster
  willing to retry a query on executor loss. NOT survivable under
  dynamic allocation or a lost executor: the blocks have no lineage
  left to recompute (see SCALING.md "Cluster caveat").
- ``checkpoint`` (``spark.wfc3.checkpoint.reliable=true``): blocks
  written to the SparkContext checkpoint directory — set it to HDFS/S3
  via ``spark.wfc3.checkpoint.dir`` (applied on first use if the
  context has no directory yet) — so a 100 TB run survives executor
  churn at the cost of a distributed write per materialization.

The plan shapes around these sites are identical either way; only the
storage of the truncation point changes. Callers must not call
``DataFrame.localCheckpoint`` directly — route through
:func:`materialize` so the conf governs every site at once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

RELIABLE_CONF = "spark.wfc3.checkpoint.reliable"
DIR_CONF = "spark.wfc3.checkpoint.dir"
# Plan-introspection escape hatch: a checkpoint re-roots the plan at a
# LogicalRDD, which HIDES the truncated subtree from any plan inspector
# (bench.py's Python-node detector would read an e01 full of pandas UDFs
# as Python-free). Tooling that needs the WHOLE logical plan sets this to
# skip truncation while it builds the throwaway introspection DataFrame.
DISABLE_CONF = "spark.wfc3.checkpoint.disable"


def reliable_enabled(spark) -> bool:
    return spark.conf.get(RELIABLE_CONF, "false").lower() == "true"


def materialize(
    df: DataFrame, eager: bool = False, force: bool = False, defer: bool = False
) -> DataFrame:
    """Truncate lineage at ``df``: ``localCheckpoint`` by default,
    reliable ``checkpoint`` when ``spark.wfc3.checkpoint.reliable=true``.

    ``eager=False`` keeps the materialization off the caller's critical
    path until first use (the measured winner on the timed queries —
    domain_queries._materialize_fi's A/B); ``eager=True`` is for
    read-then-overwrite hygiene (streaming stores) where the blocking
    barrier is the point.

    ``force=True`` truncates even in introspection mode: ITERATIVE
    operators that execute convergence probes while the plan is being
    CONSTRUCTED (connected_components' per-round Σlabel collect) must
    keep per-round truncation or round k's probe re-executes rounds
    1..k-1's untruncated lineage — the plan doubles per pointer-jumping
    round, so a DISABLE_CONF build goes exponential (observed: bench's
    Python-node inspector hung on d02 once the incr_cc arm tripled the
    CC invocations). The introspection loss is nil in practice: by the
    time the inspector sees the query, the fixpoint's rounds have
    already EXECUTED during construction, so any Python eval upstream of
    the loop ran (and was timed) regardless of what the final plan
    string shows.

    ``defer=True`` (r13, per-callsite OPT-IN so the pinned bench twins'
    shared substrate keeps its r12 behavior) plans the checkpoint
    subtree NON-adaptively before truncating. Mechanism: with AQE on,
    ``Dataset.localCheckpoint(eager=False)``'s ``queryExecution.toRdd``
    returns an AdaptiveSparkPlanExec whose doExecute MATERIALIZES every
    non-result query stage — each lazy truncation point with a shuffle
    in its subtree runs serialized driver-side mini-jobs at plan-BUILD
    time (the r12 "planning tax": ~245 ms × 30 sites ≈ 12 s of t01's
    sf0.1 wall). A non-adaptive subtree plan pays only Catalyst
    planning + codegen at build and defers stage execution to first
    use, where the DAG scheduler runs the truncated subtrees inside
    the consumer's own job (shared SHUFFLE stages dedup naturally —
    one map stage per shuffle dependency regardless of consumer
    count). Trade-offs, both deliberate: (a) the subtree itself loses
    AQE (static 32-partition shuffles; explicit broadcast() hints keep
    their joins) — right for the bounded iterative-trainer relations
    this is used on, wrong for skew-prone corpus joins, so it stays
    per-site; (b) NARROW shared chains under a deferred checkpoint can
    be computed by racing sibling stages before the block cache fills —
    keep widely-shared narrow roots (token-hash relations, per-round
    corpus rewrites) on the default path or eager=True. The conf flip
    is session-scoped and restored immediately; plan construction here
    is single-threaded (bench, tests, driver gate all build serially).
    """
    spark = df.sparkSession
    if not force and spark.conf.get(DISABLE_CONF, "false").lower() == "true":
        return df  # introspection mode: keep the full plan visible
    if not reliable_enabled(spark):
        if defer and not eager:
            old = spark.conf.get("spark.sql.adaptive.enabled", "true")
            spark.conf.set("spark.sql.adaptive.enabled", "false")
            try:
                return df.localCheckpoint(eager=False)
            finally:
                spark.conf.set("spark.sql.adaptive.enabled", old)
        return df.localCheckpoint(eager=eager)
    sc = spark.sparkContext
    if sc._jsc.sc().getCheckpointDir().isEmpty():
        sc.setCheckpointDir(spark.conf.get(DIR_CONF, "/tmp/wfc3_reliable_ckpt"))
    if defer and not eager:
        old = spark.conf.get("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        try:
            return df.checkpoint(eager=False)
        finally:
            spark.conf.set("spark.sql.adaptive.enabled", old)
    return df.checkpoint(eager=eager)
