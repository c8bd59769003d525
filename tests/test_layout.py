"""Partitioned storage layout: pruning + idempotent dynamic overwrite."""

from __future__ import annotations

from pyspark.sql import functions as F

from wfc3_cte_monitor_spark.sources.layout import read_domain_table, write_domain_table
from wfc3_cte_monitor_spark.testing.fixtures import make_domain_fixtures


def test_partitioned_write_prunes_and_overwrites(spark, tmp_path):
    _, fileinfo, _ = make_domain_fixtures(spark)
    root = str(tmp_path)
    write_domain_table(fileinfo, "fileinfo", root)

    back = read_domain_table(spark, "fileinfo", root)
    assert back.count() == fileinfo.count()

    # partition pruning: a targname filter must hit PartitionFilters
    pruned = back.where(F.col("targname") == "ngc104")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(targname" in plan, plan

    # dynamic overwrite of ONE target's partition leaves others intact
    one = fileinfo.where(F.col("targname") == "ngc104").withColumn(
        "mnclip_bkgrd", F.lit(99.0)
    )
    write_domain_table(one, "fileinfo", root)
    back2 = read_domain_table(spark, "fileinfo", root)
    assert back2.count() == fileinfo.count()  # other targets untouched
    assert back2.where(F.col("targname") == "ngc104").agg(
        F.min("mnclip_bkgrd")
    ).first()[0] == 99.0
    assert back2.where(F.col("targname") != "ngc104").agg(
        F.max("mnclip_bkgrd")
    ).first()[0] < 99.0
