"""Connected components over an edge list, to CONVERGENCE.

Dedup cluster assignment is a connected-components problem: near-dup
pairs form edges, and a chain a–b–c must collapse into ONE cluster even
though a and c were never directly compared. A fixed-round label
propagation (what d02 ran through round 6) only guarantees collapse for
paths up to its round count; this operator iterates HashMin label
propagation WITH pointer jumping until a fixpoint, so the result is the
true component minimum regardless of chain length.

Per round (all equi-joins / key-partitioned aggs, no all-pairs stage):
  1. HashMin: label(v) ← min(label(v), min over neighbors' labels) —
     one join of the (pre-partitioned, lineage-truncated) edge list with
     the label relation plus a map-side-combined min agg.
  2. Pointer jumping: label(v) ← label(label(v)) — one self-join of the
     label relation. This is the step that turns O(diameter) HashMin
     rounds into O(log n): labels hop along shortcut pointers, so a
     10⁶-doc duplication chain converges in ~20 rounds, not 10⁶.
  3. Convergence check: labels are vertex ids and only ever DECREASE,
     so Σ label (exact, decimal(38,0)) is strictly monotone until the
     fixpoint — one tiny scalar agg per round, no change-join.

Iterative-algorithm hygiene (same lesson as d02's edge materialization):
every round's label relation is materialized with truncated lineage,
otherwise round k's plan re-embeds rounds 1..k-1.

At 100 TB: rounds are O(log max-component); each round is one shuffle of
the label relation (vertex-sized, 2 longs) against the stationary edge
partitioning — vectors/text never ride any of it. The alternating
large-star/small-star formulation (Kiveris et al., "Connected
Components in MapReduce and Beyond") is the same complexity with a
2-step alternation; HashMin+jumping is chosen for its simpler invariant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..checkpointing import materialize


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    id_col: str = "doc_id",
    max_iter: int = 25,
) -> DataFrame:
    """(vertex id) + bidirectional (src, dst) edges → (id_col, label)
    where label = min vertex id of the connected component.

    ``edges`` must contain both directions of every undirected edge (the
    caller usually unions (a,b) with (b,a)); ``vertices`` one row per id.
    Raises if ``max_iter`` rounds don't reach the fixpoint — with pointer
    jumping that needs a component of > ~2^max_iter chained vertices,
    i.e. it flags a bug, not a big input.
    """
    labels = vertices.select(F.col(id_col), F.col(id_col).alias("label"))
    prev_sum = None
    for _ in range(max_iter):
        nbr_min = (
            edges.join(
                labels.select(F.col(id_col).alias("dst"), F.col("label").alias("nl")),
                "dst",
            )
            .groupBy("src")
            .agg(F.min("nl").alias("nbr_min"))
        )
        hashmin = labels.join(
            nbr_min, labels[id_col] == nbr_min["src"], "left"
        ).select(
            F.col(id_col),
            F.least(F.col("label"), F.coalesce("nbr_min", F.col("label"))).alias("label"),
        )
        jump = hashmin.select(
            F.col(id_col).alias("pj_id"), F.col("label").alias("pj_label")
        )
        labels = materialize(
            hashmin.join(jump, hashmin["label"] == jump["pj_id"], "left").select(
                F.col(id_col),
                F.coalesce("pj_label", "label").alias("label"),
            )
        )
        cur_sum = labels.agg(
            F.sum(F.col("label").cast("decimal(38,0)")).alias("s")
        ).collect()[0]["s"]
        if cur_sum == prev_sum:
            return labels
        prev_sum = cur_sum
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds "
        "(component deeper than 2^max_iter — almost certainly a bug)"
    )
