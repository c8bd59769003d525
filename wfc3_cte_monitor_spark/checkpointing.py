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


def materialize(df: DataFrame, eager: bool = False, force: bool = False) -> DataFrame:
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
    string shows."""
    spark = df.sparkSession
    if not force and spark.conf.get(DISABLE_CONF, "false").lower() == "true":
        return df  # introspection mode: keep the full plan visible
    if not reliable_enabled(spark):
        return df.localCheckpoint(eager=eager)
    sc = spark.sparkContext
    if sc._jsc.sc().getCheckpointDir().isEmpty():
        sc.setCheckpointDir(spark.conf.get(DIR_CONF, "/tmp/wfc3_reliable_ckpt"))
    return df.checkpoint(eager=eager)
