"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``wfc3_cte_monitor_spark``; this module only
adapts the registry to the driver contract.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from wfc3_cte_monitor_spark.plans.registry import load_all  # noqa: E402
from wfc3_cte_monitor_spark.session import prepare  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Runs the domain flagship in its real shape (SURVEY.md §3.2):
    compute_results over analog fileinfo/phot — pair self-join → phot
    master-id alignment → overlapping flux-bin fan-out → 4σ sigma-clip →
    per-bin regression → wide Results pivot with zero-filled empty bins.
    """
    prepare(spark)
    from wfc3_cte_monitor_spark.plans.domain_queries import cs05_results_wide

    return cs05_results_wide(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            prepare(spark)
            return fn(spark, sf_dir)

        run.__doc__ = fn.__doc__
        return run

    return {name: wrap(spec.fn) for name, spec in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle twin for each SQL-expressible query."""
    return {name: spec.oracle for name, spec in load_all().items() if spec.oracle is not None}
