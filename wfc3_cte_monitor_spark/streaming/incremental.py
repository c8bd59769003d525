"""Incremental Results maintenance: new exposures stream in, only the
affected image pairs are recomputed.

The reference's "update" mode re-runs the whole extraction + slope
pipeline over every file and re-probes the DB row by row
(run_image_extraction.py:963-979 glob walk; database_update.py's
key-probe + INSERT loop — the documented "could take dayyys" path).
The Spark-native answer: exposures arrive on a stream; each micro-batch

1. derives the affected PAIR KEYS (the mode keys of the new exposures —
   a pair's slopes depend only on its own two images' photometry);
2. recomputes ``compute_results`` restricted to those pairs (a filter
   on the pair key before the self-join, so the work per batch is
   O(new pairs), not O(corpus));
3. MERGEs the fresh wide rows into the Results store with the S7
   insert-or-update semantics (``operators/upsert.upsert``).

This is exactly-once per batch under checkpointing (foreachBatch with a
deterministic MERGE is idempotent: re-processing a batch rewrites the
same rows with the same values).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.upsert import upsert
from ..plans.pipeline import compute_results

PAIR_KEY_COLS = ["targname", "imagename_1", "imagename_2"]


def affected_pairs(new_fileinfo: DataFrame, all_fileinfo: DataFrame) -> DataFrame:
    """Pair keys whose inputs changed: every pair with at least one side
    among the new exposures. Computed by running the pair contract over
    the FULL fileinfo but semi-joined to the new images — at scale the
    mode-key self-join is pruned by the (tiny) new-image set broadcast."""
    from ..plans.pipeline import query_for_pair

    pairs = query_for_pair(all_fileinfo)
    new_names = new_fileinfo.select(F.col("imagename").alias("_new")).distinct()
    return (
        pairs.join(
            F.broadcast(new_names),
            (pairs.imagename_1 == F.col("_new")) | (pairs.imagename_2 == F.col("_new")),
            "leftsemi",
        )
        .select(*PAIR_KEY_COLS)
        .distinct()
    )


def incremental_results_batch(
    results_store: DataFrame,
    new_fileinfo: DataFrame,
    all_fileinfo: DataFrame,
    phot_long: DataFrame,
    aperture: int = 3,
) -> DataFrame:
    """One maintenance step: recompute the wide Results rows for the
    affected pairs only and MERGE them into the store."""
    touched = affected_pairs(new_fileinfo, all_fileinfo)
    # restrict fileinfo to images belonging to touched pairs before the
    # (quadratic-looking) pair self-join: per-batch work is bounded by
    # the touched set, not the corpus
    touched_images = touched.select(
        F.col("imagename_1").alias("imagename")
    ).unionByName(touched.select(F.col("imagename_2").alias("imagename"))).distinct()
    fi = all_fileinfo.join(F.broadcast(touched_images), "imagename", "leftsemi")
    fresh = compute_results(fi, phot_long, aperture=aperture)
    return upsert(
        results_store.withColumn("_v", F.lit(0)),
        fresh.withColumn("_v", F.lit(1)),
        keys=[*PAIR_KEY_COLS, "aperture"],
        version_col="_v",
    ).drop("_v")


def maintain_results_stream(
    spark: SparkSession,
    fileinfo_stream: DataFrame,
    all_fileinfo: DataFrame,
    phot_long: DataFrame,
    store_path: str,
    checkpoint: str,
    aperture: int = 3,
):
    """Wire the batch step into Structured Streaming via foreachBatch:
    each micro-batch of newly ingested exposures updates only its
    affected pairs in the parquet Results store.

    ``all_fileinfo`` is a static snapshot; the batch rows are unioned
    into it before pairing, so exposures that are genuinely NEW (absent
    from the snapshot) still form pairs — otherwise a stale snapshot
    would make every batch a silent no-op."""
    from pyspark.errors import AnalysisException

    def step(batch_df: DataFrame, batch_id: int) -> None:
        try:
            store = spark.read.parquet(store_path)
        except AnalysisException:
            # ONLY path-not-found bootstraps an empty store; any other
            # read failure must propagate — falling through here would
            # overwrite the whole store with just this batch's pairs
            store = None
        corpus = all_fileinfo.unionByName(batch_df).dropDuplicates(["imagename"])
        fresh = (
            incremental_results_batch(store, batch_df, corpus, phot_long, aperture)
            if store is not None
            else compute_results(
                corpus.join(
                    F.broadcast(batch_df.select("imagename").distinct()),
                    "imagename",
                    "leftsemi",
                ),
                phot_long,
                aperture,
            )
        )
        # materialize BEFORE overwriting: the merged plan lazily reads the
        # store being replaced (read-then-overwrite-same-path corrupts
        # otherwise). A table format with real MERGE (or dynamic partition
        # overwrite on the store's partition key) removes both this copy
        # and the full rewrite at scale.
        fresh = fresh.localCheckpoint(eager=True)
        fresh.write.mode("overwrite").parquet(store_path)

    return (
        fileinfo_stream.writeStream.foreachBatch(step)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
    )
