"""wfc3_cte_monitor_spark — a PySpark-native analytics engine.

A brand-new, Spark-first re-expression of the query and data-processing
capabilities of the reference pipeline ``cgosmeyer/wfc3_cte_monitor``
(a single-process SQLite + NumPy/SciPy batch pipeline; see SURVEY.md).

Everything here is declarative DataFrame/SQL so Catalyst + Tungsten pick
the physical strategy; Pandas UDFs are used only where built-in operators
genuinely can't express the semantics (tiny per-group polynomial fits).

Layout
------
- ``session``    — tuned SparkSession factory (local testing; cluster-safe confs)
- ``sources``    — parquet/csv catalog loaders for the synthetic test tables
                   and the reference's sidecar ascii formats
- ``operators``  — relational/statistical operators the reference implies
                   (sigma-clip, per-group regression, overlapping bins,
                   sessionization, pair self-joins, band join, upsert,
                   polyfit2d, point-in-polygon)
- ``functions``  — scalar function surface + text/dedup/similarity ops
- ``plans``      — end-to-end query DAGs + the driver-facing query registry
- ``streaming``  — Structured Streaming surface over the events table
"""

__version__ = "0.1.0"
