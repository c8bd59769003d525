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
