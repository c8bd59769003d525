"""ASCII sidecar round-trip gate (S3/S4/S5/S6) — the 'ascii' arms of s07.

The reference's boundary I/O lives in loose whitespace/tab files:
master catalogs ``.cat`` (database_reset.py:304-344), per-image ``.coo``
and ``.mag`` extractions (database_update.py:356-376,
run_image_extraction.py:667-679), slope text files
(uvis_external_cte_plots.py:293-305), and glob discovery with visit
skip-lists (run_image_extraction.py:984-1025).

This module drives every one of those formats through a WRITE → READ →
AGGREGATE round trip under the DuckDB oracle gate:

- synthetic rows are derived from the ``customer`` parquet with values
  that are exact multiples of 2^-5, so the text round trip and the
  cross-engine double sums are all EXACT (no fp-noise rounding needed);
- Spark writes the files in the reference's formats (space- or
  tab-delimited CSV), reads them back through ``sources/ascii_io.py``'s
  explicit-schema readers, and reduces each table to one fingerprint row
  (id-sum, value-sum, count);
- the oracle recomputes the identical fingerprints straight from
  parquet — it never sees the files, so any writer/reader format defect
  (delimiter, column order, type parse) breaks the hash match.

The discovery arm (S5) touches real files whose names are derived from
c_custkey, globs them back via ``sources/discovery.py``, and anti-joins
the skip-list — the oracle recomputes the surviving-file fingerprint
from the same closed form.

Files land under a temp dir keyed on (sf_dir, pid) — two concurrent
harness runs with different scale factors (or processes) can't
cross-contaminate each other's round-trip reads. On a real cluster the
sidecar dir would be shared storage; the round-trip gate itself is a
local-mode correctness harness, not a scale surface.

The sidecar writes are independent tiny Spark jobs, so they are
SUBMITTED CONCURRENTLY from a thread pool (Spark's scheduler handles
multi-threaded job submission); serial submission made this fixture I/O
the arm's critical path (~1.3s of the s07 bench time at sf0.1).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _roundtrip_dir(sf_dir: str) -> str:
    tag = os.path.basename(sf_dir.rstrip("/")) or "sf"
    base = f"/tmp/wfc3_cte_s07_ascii_{tag}_pid{os.getpid()}"
    _cleanup_at_exit(base)
    return base


_CLEANUP_REGISTERED: set[str] = set()


def _cleanup_at_exit(base: str) -> None:
    """pid-keyed dirs would otherwise leak one sidecar tree per process
    on a long-lived host; remove ours when the process exits."""
    if base in _CLEANUP_REGISTERED:
        return
    import atexit
    import shutil

    atexit.register(shutil.rmtree, base, ignore_errors=True)
    _CLEANUP_REGISTERED.add(base)


# dirs whose static discovery fixture files were already laid down by this
# process — the 12 touched files are constants, one pass per session
_FIXTURES_DONE: set[str] = set()

# Discovery fixture: one file per c_custkey 1..12, visit = custkey mod 4,
# flc (ctecorr) for even keys. Skip-list drops visit '01' proposals
# (custkeys 1, 5, 9) — the reference's hardcoded bad-visit pattern.
_DISC_KEYS = range(1, 13)
_DISC_SKIPS = [(f"c{k:03d}", f"{k % 4:02d}") for k in (1, 5, 9)]


def _cat_rows(customer: DataFrame) -> DataFrame:
    ck = F.col("c_custkey")
    return customer.select(
        ck.cast("int").alias("master_id"),
        ((ck % 4096) + 0.5).alias("xpix"),
        ((ck % 2051) + 0.25).alias("ypix"),
        ((ck % 360) + 0.125).alias("ra"),
        ((ck % 180) - 90 + 0.0625).alias("dec"),
    )


def _coo_rows(customer: DataFrame) -> DataFrame:
    ck = F.col("c_custkey")
    return customer.select(
        ck.cast("int").alias("master_id"),
        (ck + 1).cast("int").alias("extr_id"),
        ((ck % 1024) + 0.5).alias("extr_xpix"),
        ((ck % 512) + 0.25).alias("extr_ypix"),
        ((ck % 360) + 0.0625).alias("extr_ra"),
        ((ck % 90) + 0.03125).alias("extr_dec"),
    )


def _mag_rows(customer: DataFrame) -> DataFrame:
    ck = F.col("c_custkey")
    r = F.col("radius")
    return customer.select(
        ck.alias("c_custkey"), F.explode(F.array(F.lit(3), F.lit(5), F.lit(7))).alias("radius")
    ).select(
        F.col("c_custkey").cast("int").alias("find_id"),
        r.cast("int").alias("radius"),
        (r * 100 + (F.col("c_custkey") % 1000) * 0.25).alias("flux"),
        ((F.col("c_custkey") % 4096) + 0.5).alias("xpix"),
        ((F.col("c_custkey") % 2051) + 0.25).alias("ypix"),
        ((F.col("c_custkey") % 100) * 0.125).alias("mnbkgrd"),
        ((F.col("c_custkey") % 100) * 0.125 * r).alias("totbkgrd"),
    )


def _slope_rows(customer: DataFrame) -> DataFrame:
    ck = F.col("c_custkey")
    return customer.select(
        ((ck % 200) * 0.03125 - 3.0).alias("slope"),
        ((ck % 50) * 0.0625).alias("slope_stddev"),
        (ck % 30 + 3).cast("int").alias("num_points"),
        ((ck % 5) * 0.5).alias("low_bin"),
        ((ck % 5) * 0.5 + 0.5).alias("high_bin"),
    )


def _fingerprint(which: str, k, v, ver) -> list:
    return [
        F.lit(which).alias("which"),
        k.cast("bigint").alias("k"),
        v.cast("double").alias("v"),
        ver.cast("int").alias("ver"),
    ]


def ascii_roundtrip_arms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write .cat/.coo/.mag/slope sidecars + discovery fixture files, read
    them back through the S3/S4/S5/S6 sources, fingerprint each."""
    from ..sources import ascii_io
    from ..sources.catalog import load_table
    from ..sources.discovery import apply_skip_lists, discover_images

    from ..sources.layout import read_domain_table, write_domain_table
    from .domain_queries import analog_fileinfo

    customer = load_table(spark, sf_dir, "customer").select("c_custkey")
    base = _roundtrip_dir(sf_dir)
    img_dir = f"{base}/images"
    dom = f"{base}/domain"

    def _touch_fixtures() -> None:
        if img_dir in _FIXTURES_DONE:
            return
        os.makedirs(img_dir, exist_ok=True)
        for old in os.listdir(img_dir):
            os.unlink(os.path.join(img_dir, old))
        for k in _DISC_KEYS:
            suffix = "flc" if k % 2 == 0 else "flt"
            with open(os.path.join(img_dir, f"c{k:03d}{k % 4:02d}x_{suffix}.txt"), "w") as fh:
                fh.write("x")
        _FIXTURES_DONE.add(img_dir)

    # S8 input: the domain table written with its canonical partitioning
    fi = analog_fileinfo(spark, sf_dir).select("targname", "proposid", "dateobs", "ctecorr")

    # The four sidecar formats keep the reference's exact delimiters (the
    # .cat is space-delimited, the rest tabs — database_reset.py:304-344,
    # database_update.py:356-376), so they stay separate writes; the jobs
    # are independent and tiny, so submit them in parallel.
    writes = [
        lambda: _cat_rows(customer).write.mode("overwrite").option("delimiter", " ").csv(f"{base}/cat"),
        lambda: _coo_rows(customer).write.mode("overwrite").option("delimiter", "\t").csv(f"{base}/coo"),
        lambda: _mag_rows(customer).write.mode("overwrite").option("delimiter", "\t").csv(f"{base}/mag"),
        lambda: _slope_rows(customer).write.mode("overwrite").option("delimiter", "\t").csv(f"{base}/slope"),
        lambda: write_domain_table(fi, "master", dom),  # master layout: partition by targname
        _touch_fixtures,
    ]
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=len(writes)) as ex:
        for fut in [ex.submit(w) for w in writes]:
            fut.result()

    cat = ascii_io.read_master_cat(spark, f"{base}/cat").agg(
        *_fingerprint(
            "cat",
            F.sum("master_id"),
            F.sum("xpix") + F.sum("ypix") + F.sum("ra") + F.sum("dec"),
            F.count(F.lit(1)),
        )
    )
    coo = ascii_io.read_coo(spark, f"{base}/coo").agg(
        *_fingerprint(
            "coo",
            F.sum("master_id") + F.sum("extr_id"),
            F.sum("extr_xpix") + F.sum("extr_ypix") + F.sum("extr_ra") + F.sum("extr_dec"),
            F.count(F.lit(1)),
        )
    )
    mag = ascii_io.read_mag(spark, f"{base}/mag").agg(
        *_fingerprint(
            "mag",
            F.sum(F.col("find_id").cast("bigint") * F.col("radius")),
            F.sum("flux") + F.sum("xpix") + F.sum("ypix") + F.sum("mnbkgrd") + F.sum("totbkgrd"),
            F.count(F.lit(1)),
        )
    )
    slope = ascii_io.read_slope_file(spark, f"{base}/slope").agg(
        *_fingerprint(
            "slope",
            F.sum("num_points"),
            F.sum("slope") + F.sum("slope_stddev") + F.sum("low_bin") + F.sum("high_bin"),
            F.count(F.lit(1)),
        )
    )
    disc = apply_skip_lists(
        discover_images(spark, img_dir), proposid_col="prefix", skip_visits=_DISC_SKIPS
    ).agg(
        *_fingerprint(
            "disc",
            F.count(F.lit(1)),
            F.sum("ctecorr"),
            F.count_distinct("visit"),
        )
    )

    # S8 — storage-layout round trip (written above with its canonical
    # partitioning, dynamic partition overwrite): read it back through a
    # PARTITION-PRUNED filter, fingerprint. The layout convention
    # (sources/layout.py) replaces the reference's sorted loose-file
    # outputs; the pruned read is the 100 TB point of it.
    layout = (
        read_domain_table(spark, "master", dom)
        .where(F.col("targname") == "1-URGENT")
        .agg(
            *_fingerprint(
                "layout",
                F.sum("dateobs"),
                F.sum("ctecorr"),
                F.count_distinct("proposid"),
            )
        )
    )

    return (
        cat.unionByName(coo)
        .unionByName(mag)
        .unionByName(slope)
        .unionByName(disc)
        .unionByName(layout)
    )


# The oracle recomputes every fingerprint from parquet — the files never
# enter DuckDB, so the comparison proves the write→read round trip.
from .domain_queries import _fileinfo_sql as _domain_fileinfo_sql  # noqa: E402

_FILEINFO_FULL_SQL = _domain_fileinfo_sql()

ASCII_ARMS_SQL = f"""
    SELECT 'cat' AS which,
           CAST(sum(c_custkey) AS BIGINT) AS k,
           CAST(sum((c_custkey % 4096) + 0.5) + sum((c_custkey % 2051) + 0.25)
              + sum((c_custkey % 360) + 0.125) + sum((c_custkey % 180) - 90 + 0.0625) AS DOUBLE) AS v,
           CAST(count(*) AS INT) AS ver
    FROM customer
    UNION ALL
    SELECT 'coo',
           CAST(sum(c_custkey) + sum(c_custkey + 1) AS BIGINT),
           CAST(sum((c_custkey % 1024) + 0.5) + sum((c_custkey % 512) + 0.25)
              + sum((c_custkey % 360) + 0.0625) + sum((c_custkey % 90) + 0.03125) AS DOUBLE),
           CAST(count(*) AS INT)
    FROM customer
    UNION ALL
    SELECT 'mag',
           CAST(sum(c_custkey * radius) AS BIGINT),
           CAST(sum(radius * 100 + (c_custkey % 1000) * 0.25)
              + sum((c_custkey % 4096) + 0.5) + sum((c_custkey % 2051) + 0.25)
              + sum((c_custkey % 100) * 0.125) + sum((c_custkey % 100) * 0.125 * radius) AS DOUBLE),
           CAST(count(*) AS INT)
    FROM customer CROSS JOIN (VALUES (3), (5), (7)) r(radius)
    UNION ALL
    SELECT 'slope',
           CAST(sum(c_custkey % 30 + 3) AS BIGINT),
           CAST(sum((c_custkey % 200) * 0.03125 - 3.0) + sum((c_custkey % 50) * 0.0625)
              + sum((c_custkey % 5) * 0.5) + sum((c_custkey % 5) * 0.5 + 0.5) AS DOUBLE),
           CAST(count(*) AS INT)
    FROM customer
    UNION ALL
    SELECT 'disc',
           CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN c_custkey % 2 = 0 THEN 1 ELSE 0 END) AS DOUBLE),
           CAST(count(DISTINCT c_custkey % 4) AS INT)
    FROM customer
    WHERE c_custkey BETWEEN 1 AND 12 AND c_custkey % 4 <> 1
    UNION ALL
    SELECT 'layout',
           CAST(sum(dateobs) AS BIGINT),
           CAST(sum(ctecorr) AS DOUBLE),
           CAST(count(DISTINCT proposid) AS INT)
    FROM ({_FILEINFO_FULL_SQL}) WHERE targname = '1-URGENT'
"""
