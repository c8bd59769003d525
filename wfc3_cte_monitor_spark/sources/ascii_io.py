"""Readers/writers for the reference's ascii sidecar formats (S3/S4/S6).

Reference formats (FIXTURES.md §5):
- master catalog ``.cat``: whitespace ascii, no header — id xpix ypix ra dec
  (wfc3_cte_monitor/database_reset.py:322-328)
- ``.coo``: tab-separated with a ``#`` header line — master_id extr_id
  extr_xpix extr_ypix extr_ra extr_dec (run_image_extraction.py:667-679)
- ``.mag`` (python-phot path): one row per source×radius — ID radius
  aperture_sum xcenter ycenter mean_local_bkgrd tot_local_bkgrd
  (database_update.py:367-376)
- slope file: slope slope_stddev num_points low_bin high_bin
  (uvis_external_cte_plots.py:295-305)

All are explicit-schema `spark.read.csv` — never inferSchema (a second
pass over 100 TB of sidecars) — and tolerate ``#`` comment lines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_READ_OPTS = {"comment": "#", "ignoreLeadingWhiteSpace": "true", "ignoreTrailingWhiteSpace": "true"}


def read_master_cat(spark: SparkSession, path: str) -> DataFrame:
    return (
        spark.read.options(**_READ_OPTS, delimiter=" ")
        .schema("master_id INT, xpix DOUBLE, ypix DOUBLE, ra DOUBLE, dec DOUBLE")
        .csv(path)
    )


def read_coo(spark: SparkSession, path: str) -> DataFrame:
    return (
        spark.read.options(**_READ_OPTS, delimiter="\t")
        .schema(
            "master_id INT, extr_id INT, extr_xpix DOUBLE, extr_ypix DOUBLE,"
            " extr_ra DOUBLE, extr_dec DOUBLE"
        )
        .csv(path)
    )


def read_mag(spark: SparkSession, path: str) -> DataFrame:
    """Long-format photometry: one row per source×radius (pivot input)."""
    return (
        spark.read.options(**_READ_OPTS, delimiter="\t")
        .schema(
            "find_id INT, radius INT, flux DOUBLE, xpix DOUBLE, ypix DOUBLE,"
            " mnbkgrd DOUBLE, totbkgrd DOUBLE"
        )
        .csv(path)
    )


def read_slope_file(spark: SparkSession, path: str) -> DataFrame:
    return (
        spark.read.options(**_READ_OPTS, delimiter="\t")
        .schema(
            "slope DOUBLE, slope_stddev DOUBLE, num_points INT,"
            " low_bin DOUBLE, high_bin DOUBLE"
        )
        .csv(path)
    )


def write_table(df: DataFrame, path: str, fmt: str = "parquet", partition_by: list[str] | None = None) -> None:
    """Sink (S6): columnar parquet by default — slope/coeff text files
    become table partitions instead of loose files."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    getattr(w, fmt)(path)
