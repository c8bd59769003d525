"""Point-in-polygon spatial predicate (J6).

Reference: master-catalog stars are tested against each exposure's
footprint quadrilateral (4 RA/Dec corners) with
``matplotlib.path.Path.contains_points``
(wfc3_cte_monitor/run_image_extraction.py:584-689, polygon at :633-644).

Spark-first: for a CONVEX quad with counter-clockwise vertices the test is
four half-plane sign checks — pure column arithmetic, no UDF, stays inside
whole-stage codegen, and (unlike a Python UDF) pushes through Catalyst.
The same expression doubles as the join condition of a theta-join
master × images at scale (broadcast the per-image corner struct).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

Quad = Sequence[tuple[float, float]]  # 4 vertices, counter-clockwise


def _edges(quad: Quad):
    return [(quad[i], quad[(i + 1) % 4]) for i in range(4)]


def point_in_quad(x: str | Column, y: str | Column, quad: Quad) -> Column:
    """Boolean Column: (x, y) inside-or-on the convex ccw quadrilateral.
    cross((v2-v1), (p-v1)) >= 0 for every edge."""
    xc = F.col(x) if isinstance(x, str) else x
    yc = F.col(y) if isinstance(y, str) else y
    cond = F.lit(True)
    for (x1, y1), (x2, y2) in _edges(quad):
        cross = (F.lit(x2 - x1) * (yc - F.lit(y1))) - (F.lit(y2 - y1) * (xc - F.lit(x1)))
        cond = cond & (cross >= 0)
    return cond


def point_in_quad_sql(x: str, y: str, quad: Quad) -> str:
    """DuckDB twin — identical arithmetic, term for term."""
    parts = []
    for (x1, y1), (x2, y2) in _edges(quad):
        parts.append(f"(({x2 - x1}) * ({y} - ({y1})) - ({y2 - y1}) * ({x} - ({x1})) >= 0)")
    return " AND ".join(parts)
