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


def test_bucketed_join_eliminates_shuffle(spark, sf_smoke, tmp_path_factory):
    """Both sides bucketed+sorted on the join key -> the equi-join plan
    contains NO Exchange and NO Sort (co-located join); the plain parquet
    join of the same data shuffles both sides."""
    from wfc3_cte_monitor_spark.sources.catalog import load_table
    from wfc3_cte_monitor_spark.sources.layout import write_bucketed

    tmp = tmp_path_factory.mktemp("bucketed")
    orders = load_table(spark, sf_smoke, "orders").select("o_orderkey", "o_orderpriority")
    lineitem = load_table(spark, sf_smoke, "lineitem").select("l_orderkey", "l_quantity")
    prev_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        write_bucketed(orders, "b_orders", str(tmp / "o"), ["o_orderkey"], 8)
        write_bucketed(lineitem, "b_lineitem", str(tmp / "l"), ["l_orderkey"], 8)

        # at smoke scale the planner would just broadcast the small side
        # (which also skips bucketing); force the SortMergeJoin path that a
        # large-x-large join takes so the bucket co-location is observable
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        bo, bl = spark.table("b_orders"), spark.table("b_lineitem")
        joined = bo.join(bl, bo.o_orderkey == bl.l_orderkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan

        # sanity: same join over plain parquet DOES shuffle
        plain = orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        plain_plan = plain._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plain_plan

        # and the result matches the plain join
        assert joined.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thresh)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
