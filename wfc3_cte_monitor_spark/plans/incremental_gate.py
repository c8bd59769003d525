"""Driver gate for incremental Results maintenance — the 'incr' arm of
s07.

The reference's most-used deployment path is the ``--pr 'last'`` re-run:
only newly ingested exposures are processed and the Results table is
updated in place (run_uvis_external_cte.py:66-85, README.md:497-533 —
the documented "could take dayyys" loop when run from scratch). Its
modern twin is ``streaming/incremental.maintain_results_stream``: a
Structured-Streaming foreachBatch that recomputes ONLY the image pairs
an arriving exposure touches and MERGEs them into the store.

This arm proves the core invariant end-to-end under the DuckDB oracle:

    seed(snapshot) + stream(increment batches)  ==  full recompute

Fixture (restricted to one target so the arm stays cheap at bench
scale — the invariant is pair-local, so one target proves it):

- corpus  = week-subset analog fileinfo, targname '1-URGENT', first
  150 weeks (the fixture tables are derived once per process and read
  as parquet thereafter — the arm's repeated cost is fixture-sized);
- split   = weeks divisible by 4 are the INCREMENT, the rest the
  snapshot the store is seeded from;
- batches = the increment's chip-1 exposures, then its chip-2
  exposures — the two sides of every new pair arrive in DIFFERENT
  micro-batches, exercising the sidecar corpus logic (a pair must form
  once its partner side lands, not only within one batch);
- final   = the store parquet after the stream drains, reduced to one
  fingerprint row (decimal-exact sums, so cross-engine float summation
  order cannot perturb the hash).

The oracle recomputes the SAME restricted wide Results from scratch and
fingerprints identically — so a merge that loses a pair, double-applies
a batch, or fails to form a cross-batch pair breaks the value hash.
"""

from __future__ import annotations

import os
import shutil
import time
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import FLUXBIN_LABELS

_INCR_TARG = "1-URGENT"
# weeks % 4 == 0 → dateobs % 28 == 0 (dateobs = week * 7)
_NEW_PRED_SQL = "dateobs % 28 = 0"
# bound the fixture to the first ~130 observed weeks (the analog's
# dateobs domain starts at 1092) — the invariant is pair-local, so a
# bounded pair population proves it at a fraction of the bench cost
_INCR_MAX_DATEOBS = 2000


def _new_pred():
    return F.col("dateobs") % 28 == 0


def _base_dir(sf_dir: str) -> str:
    tag = os.path.basename(sf_dir.rstrip("/")) or "sf"
    return f"/tmp/wfc3_cte_s07_incr_{tag}_pid{os.getpid()}"


# fixture dirs already laid down by this process — the restricted
# fileinfo/phot analogs are deterministic per sf_dir, so deriving them
# from orders/lineitem once per session (instead of 3x per arm
# invocation x bench pass) keeps the arm's repeated cost at the size of
# the FIXTURE, not the corpus
_FIXTURES_DONE: set[str] = set()


def _fixture_tables(spark: SparkSession, sf_dir: str):
    """Materialize (once per process) the restricted fileinfo/phot
    fixture as parquet and return (fileinfo, phot) readers."""
    from .domain_queries import analog_fileinfo, analog_phot

    tag = os.path.basename(sf_dir.rstrip("/")) or "sf"
    fix = f"/tmp/wfc3_cte_s07_incrfix_{tag}_pid{os.getpid()}"
    if fix not in _FIXTURES_DONE:
        import atexit

        shutil.rmtree(fix, ignore_errors=True)
        atexit.register(shutil.rmtree, fix, ignore_errors=True)
        fi_all = analog_fileinfo(spark, sf_dir, week_subset=True).where(
            (F.col("targname") == _INCR_TARG)
            & (F.col("dateobs") < _INCR_MAX_DATEOBS)
        )
        fi_all.write.mode("overwrite").parquet(f"{fix}/fi")
        images = spark.read.parquet(f"{fix}/fi").select("imagename")
        ph = analog_phot(spark, sf_dir, week_subset=True).join(
            F.broadcast(images), "imagename", "leftsemi"
        )
        ph.write.mode("overwrite").parquet(f"{fix}/ph")
        _FIXTURES_DONE.add(fix)
    return spark.read.parquet(f"{fix}/fi"), spark.read.parquet(f"{fix}/ph")


def _fingerprint(df: DataFrame) -> DataFrame:
    """(which='incr', k, v, ver): num_points total, decimal-exact sum of
    rounded slope/stdev measures, pair-row count. Per-bin terms are cast
    to DECIMAL(18,8) BEFORE any summation, so neither row-internal
    addition order nor cross-row fold order can produce fp divergence
    between the engines (per-value equality is already guaranteed — the
    cs05 gate hash-matches the same wide rows)."""
    np_total = reduce(
        lambda a, b: a + b, [F.col(f"numpoints_{b}").cast("bigint") for b in FLUXBIN_LABELS]
    )
    sv = reduce(
        lambda a, b: a + b,
        [
            F.round(F.col(f"slope_{b}"), 6).cast("decimal(18,8)")
            + F.round(F.col(f"slopestdev_{b}"), 6).cast("decimal(18,8)")
            for b in FLUXBIN_LABELS
        ],
    )
    return df.agg(
        F.lit("incr").alias("which"),
        F.sum(np_total).cast("bigint").alias("k"),
        F.sum(sv).cast("double").alias("v"),
        F.count(F.lit(1)).cast("int").alias("ver"),
    )


def incremental_merge_arm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the seed → stream → merge cycle and return the fingerprint of
    the final store. Re-entrant: every invocation rebuilds its (sf, pid)-
    keyed scratch tree from scratch, so repeated bench passes measure the
    same work."""
    from ..streaming.incremental import maintain_results_stream
    from .pipeline import compute_results

    base = _base_dir(sf_dir)
    shutil.rmtree(base, ignore_errors=True)
    import atexit

    atexit.register(shutil.rmtree, base, ignore_errors=True)
    store = f"{base}/store"
    src = f"{base}/src"
    os.makedirs(src, exist_ok=True)

    fi_all, ph = _fixture_tables(spark, sf_dir)
    snapshot = fi_all.where(~_new_pred())
    incoming = fi_all.where(_new_pred())

    # seed the store from the snapshot corpus (the state a deployment
    # has before new exposures arrive)
    compute_results(snapshot, ph, aperture=3).write.mode("overwrite").parquet(store)

    # two micro-batch files: chip-1 exposures first, chip-2 second —
    # each new pair's sides arrive in different batches. Explicit
    # strictly increasing mtimes pin the file-source batch order.
    for i, batch in enumerate(
        (incoming.where(F.col("chip") == 1), incoming.where(F.col("chip") == 2))
    ):
        bdir = f"{src}/b{i}"
        batch.coalesce(1).write.mode("overwrite").parquet(bdir)
        ts = time.time() - 1000.0 + i * 10.0
        for root, _dirs, files in os.walk(bdir):
            for f in files:
                os.utime(os.path.join(root, f), (ts, ts))

    stream = (
        spark.readStream.schema(fi_all.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    q = maintain_results_stream(
        spark, stream, snapshot, ph, store,
        checkpoint=f"{base}/ckpt", aperture=3, ingested_path=f"{base}/ingested",
    ).start()
    try:
        if not q.awaitTermination(600):
            raise TimeoutError("incremental maintenance stream did not drain in 600s")
    finally:
        q.stop()

    return _fingerprint(spark.read.parquet(store))


def incremental_trend_arm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The TREND twin of :func:`incremental_merge_arm` — the reference's
    other ``--pr 'last'`` consumer (run_outputs.py:70-419 re-runs the
    trend/output layer after every increment).

    Unlike Results, the trend aggregate is NOT pair-local: a new exposure
    adds a date that can merge its target's epoch clusters, shifting
    every trend row of that target (``streaming/incremental.
    maintain_trend_stream`` maintains at TARGET grain for exactly this
    reason). The two chip-split micro-batches exercise both halves of
    that hazard: batch 1 (chip-1 exposures) forms NO new pairs but
    SHIFTS the epoch dimension — the maintained store must re-aggregate
    existing pairs under the new epochs; batch 2 lands the partner
    chips and the new pairs must appear under the final epochs. The
    final store (dynamic-partition-overwritten per target) is reduced to
    one decimal-exact fingerprint; the oracle full-recomputes the same
    trend with the fixture restriction applied INSIDE the CTE chain
    (epochs must cluster the restricted date set).

    Cycle: seed store from snapshot trend → stream increment in two
    batches (foreachBatch: recompute touched targets over snapshot ∪
    all-ingested, overwrite their partitions) → fingerprint == oracle's
    from-scratch trend. A merge that loses a batch's exposures from the
    corpus sidecar, skips the epoch re-clustering, or drops a cross-batch
    pair breaks k, v or ver."""
    from ..streaming.incremental import maintain_trend_stream, trend_for_targets

    base = _base_dir(sf_dir) + "_trend"
    shutil.rmtree(base, ignore_errors=True)
    import atexit

    atexit.register(shutil.rmtree, base, ignore_errors=True)
    store = f"{base}/store"
    src = f"{base}/src"
    os.makedirs(src, exist_ok=True)

    fi_all, ph = _fixture_tables(spark, sf_dir)
    snapshot = fi_all.where(~_new_pred())
    incoming = fi_all.where(_new_pred())

    # seed: the trend of the snapshot corpus, stored partitioned by
    # targname (the maintenance grain maintain_trend_stream overwrites)
    (
        trend_for_targets(snapshot, ph, snapshot.select("targname"), aperture=3)
        .write.mode("overwrite").partitionBy("targname").parquet(store)
    )

    for i, batch in enumerate(
        (incoming.where(F.col("chip") == 1), incoming.where(F.col("chip") == 2))
    ):
        bdir = f"{src}/b{i}"
        batch.coalesce(1).write.mode("overwrite").parquet(bdir)
        ts = time.time() - 1000.0 + i * 10.0
        for root, _dirs, files in os.walk(bdir):
            for f in files:
                os.utime(os.path.join(root, f), (ts, ts))

    stream = (
        spark.readStream.schema(fi_all.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    q = maintain_trend_stream(
        spark, stream, snapshot, ph, store,
        checkpoint=f"{base}/ckpt", aperture=3, ingested_path=f"{base}/ingested",
    ).start()
    try:
        if not q.awaitTermination(600):
            raise TimeoutError("incremental trend stream did not drain in 600s")
    finally:
        q.stop()

    return _trend_fingerprint(spark.read.parquet(store))


def _trend_fingerprint(df: DataFrame) -> DataFrame:
    """(which='incr_trend', k, v, ver): pair-count total, decimal-exact
    sum of the per-row round-stable(8) trend measures (×1e6 so the %.6f
    detail string downstream keeps the full 1e-8-per-row resolution),
    trend-row count. Per-row rounding first (round_stable absorbs the
    engines' avg summation-order noise, same policy the cs03 gate hash-
    matches at 8 decimals), THEN exact decimal summation — fold order
    cannot perturb the fingerprint."""
    from ..functions.scalars import round_stable

    sv = (
        round_stable("mean_slope", 8).cast("decimal(18,10)")
        + round_stable("mean_stderr", 8).cast("decimal(18,10)")
    )
    return df.agg(
        F.lit("incr_trend").alias("which"),
        F.sum("n_pairs").cast("bigint").alias("k"),
        (F.sum(sv) * F.lit(1_000_000)).cast("double").alias("v"),
        F.count(F.lit(1)).cast("int").alias("ver"),
    )


def incr_trend_arm_sql(slope_ctes_restricted: str, epochs_sql: str, obs_sql: str) -> str:
    """DuckDB twin: from-scratch trend over the RESTRICTED corpus (the
    restriction lives inside ``slope_ctes_restricted``'s fi CTE so the
    epoch dimension clusters the fixture's date set), reduced to the
    identical decimal-exact fingerprint."""
    from ..functions.scalars import round_stable_sql

    ms = round_stable_sql("avg(r.slope)", 8)
    se = round_stable_sql("avg(r.slopestdev / r.num_points)", 8)
    return f"""
    SELECT 'incr_trend' AS which,
           CAST(sum(n_pairs) AS BIGINT) AS k,
           CAST(sum(CAST(mean_slope AS DECIMAL(18,10))
                    + CAST(mean_stderr AS DECIMAL(18,10))) * 1000000 AS DOUBLE) AS v,
           CAST(count(*) AS INT) AS ver
    FROM (
        WITH {slope_ctes_restricted},
        epochs AS ({epochs_sql}),
        obs AS ({obs_sql})
        SELECT o.targname, o.epoch, r.fluxbin,
               {ms} AS mean_slope,
               {se} AS mean_stderr,
               count(*)::BIGINT AS n_pairs
        FROM obs o
        JOIN reg r ON o.targname = r.targname
                  AND o.imagename_1 = r.imagename_1
                  AND o.imagename_2 = r.imagename_2
        WHERE r.slope IS NOT NULL
        GROUP BY o.targname, o.epoch, r.fluxbin
    )
    """


def incr_arm_sql(slope_ctes: str, wide_cols: str) -> str:
    """DuckDB twin: full recompute of the restricted wide Results (the
    same CTE chain cs05 gates, week-subset, one target) reduced to the
    identical decimal-exact fingerprint."""
    np_total = " + ".join(f"numpoints_{b}" for b in FLUXBIN_LABELS)
    sv = " + ".join(
        f"CAST(round(slope_{b}, 6) AS DECIMAL(18,8))"
        f" + CAST(round(slopestdev_{b}, 6) AS DECIMAL(18,8))"
        for b in FLUXBIN_LABELS
    )
    return f"""
    SELECT 'incr' AS which,
           CAST(sum({np_total}) AS BIGINT) AS k,
           CAST(sum({sv}) AS DOUBLE) AS v,
           CAST(count(*) AS INT) AS ver
    FROM (
        WITH {slope_ctes}
        SELECT p.targname, p.imagename_1, p.imagename_2,
               {wide_cols}
        FROM pairs p
        LEFT JOIN reg r ON p.targname = r.targname
                       AND p.imagename_1 = r.imagename_1
                       AND p.imagename_2 = r.imagename_2
        WHERE p.targname = '{_INCR_TARG}' AND p.dateobs < {_INCR_MAX_DATEOBS}
        GROUP BY p.targname, p.imagename_1, p.imagename_2
    )
    """
