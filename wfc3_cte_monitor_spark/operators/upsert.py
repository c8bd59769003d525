"""Idempotent natural-key upsert (S7).

Reference: ``insert_or_update`` probes the natural key with a SELECT and
then row-at-a-time INSERTs or UPDATEs (wfc3_cte_monitor/database_update.py:214-255
with per-table key probes :82-209) — the documented reason full ingestion
"could take dayyys" (README.md:429-432).

Spark-first: MERGE semantics without Delta — union base + updates and keep
the highest-version row per natural key (row_number window). At cluster
scale the same logic is one shuffle on the natural key and writes back via
partition-overwrite; with Delta on the classpath it becomes ``MERGE INTO``
directly. Re-running with the same updates is a no-op (the reference's
``--pr 'last'`` idempotency contract, README.md:497-533).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def upsert(base: DataFrame, updates: DataFrame, keys: Sequence[str], version_col: str) -> DataFrame:
    """Latest-wins merge of ``updates`` into ``base`` on ``keys``.

    Rows must carry ``version_col`` (ingest batch id / timestamp); the
    highest version per key wins, ties broken deterministically in favor
    of the later branch (updates get a tiebreak flag)."""
    tagged = base.withColumn("_src", F.lit(0)).unionByName(updates.withColumn("_src", F.lit(1)))
    w = Window.partitionBy(*keys).orderBy(F.col(version_col).desc(), F.col("_src").desc())
    return (
        tagged.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn", "_src")
    )


def scd2(snapshots: DataFrame, keys: Sequence[str], version_col: str) -> DataFrame:
    """Type-2 slowly-changing dimension from versioned change rows.

    Where :func:`upsert` keeps only the latest row per natural key (the
    reference's ``insert_or_update`` overwrite semantics,
    wfc3_cte_monitor/database_update.py:214-255), SCD2 keeps EVERY
    version and closes each one's validity when its successor arrives:
    ``valid_to`` = the next version for the key (``lead`` over the key's
    version order), ``is_current`` = no successor exists. ``snapshots``
    is the union of all change batches, each row carrying
    ``version_col`` (batch id / effective timestamp).

    Same scale shape as upsert — ONE shuffle on the natural key, then a
    partition-local sort; history length per key only affects the local
    sort, never the exchange count. Re-applying an already-applied batch
    is idempotent only if the caller dedups (key, version) first, same
    contract as the reference's ``--pr 'last'`` re-runs.
    """
    w = Window.partitionBy(*keys).orderBy(F.col(version_col).asc())
    nxt = F.lead(version_col).over(w)
    return snapshots.withColumn("valid_to", nxt).withColumn(
        "is_current", nxt.isNull()
    )
