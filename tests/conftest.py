from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wfc3_cte_monitor_spark.session import get_spark  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECTNESS = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    if os.environ.get("SPARK_GRAFT_PLAIN_SESSION"):
        # Driver-parity mode: an untouched default session, exactly what
        # the external driver hands the entry points — the engine must
        # self-configure via prepare(), not rely on the tuned builder.
        from pyspark.sql import SparkSession

        s = (
            SparkSession.builder.master(f"local[{cpus}]")
            .appName("wfc3-cte-tests-plain")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
        s.sparkContext.setLogLevel("ERROR")
    else:
        s = get_spark("wfc3-cte-tests", cpus=cpus)
    yield s


@pytest.fixture(scope="session")
def sf_smoke() -> str:
    return SF_SMOKE


@pytest.fixture(scope="session")
def sf_correctness() -> str:
    return SF_CORRECTNESS
