"""SQL API surface: every capability is reachable through plain
``spark.sql`` over registered views (the engine's equivalent of the
reference's manual SQLite inspection shell, README.md:340-372)."""

from __future__ import annotations

from wfc3_cte_monitor_spark.sources.catalog import register_views


def test_sql_over_views(spark, sf_smoke):
    register_views(spark, sf_smoke)
    out = spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               round(avg(l_extendedprice), 4) AS avg_price,
               count(*) AS n
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY 1, 2
        """
    ).collect()
    assert len(out) == 6
    assert all(r.n > 0 and r.avg_price > 0 for r in out)


def test_sql_join_and_window(spark, sf_smoke):
    register_views(spark, sf_smoke)
    out = spark.sql(
        """
        SELECT o_orderpriority, rank
        FROM (
            SELECT o.o_orderpriority,
                   row_number() OVER (PARTITION BY o.o_orderpriority
                                      ORDER BY sum(l.l_extendedprice) DESC, o.o_orderkey) AS rank,
                   o.o_orderkey
            FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
            GROUP BY o.o_orderpriority, o.o_orderkey
        )
        WHERE rank <= 3
        """
    ).collect()
    assert len(out) == 15  # 5 priorities x top-3
