"""2-D polynomial CTE model: closed-form fit + evaluation (N1/N2).

Reference: ``polyfit2d`` fits slope(d, f) = Σ c_ij · f^j · d^i (order 2 in
log-flux f and epoch d) with np.linalg.lstsq per parameter group
(wfc3_cte_monitor/uvis_external_cte_plots.py:2216-2249); ``solve_for_slope``
evaluates the 9-coefficient surface (plot_model_on_reality.py:48-113).

Two Spark-first forms:

- ``poly2_eval`` — the evaluation is a pure column expression (N2).
- ``quadfit_agg`` — a 1-D quadratic fit y = c0 + c1·x + c2·x² per group as
  CLOSED-FORM aggregates (Cramer's rule over the 3×3 normal equations).
  No UDF, map-side combinable, oracle-expressible. Center/scale x before
  calling so the moments stay O(1) and cross-engine fp noise stays far
  below the rounding quantum.
- the full 9-coefficient 2-D fit stays in ``operators/polyfit.py`` as a
  tiny-group applyInPandas (groups are ≤ tens of rows in the reference).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def poly2_eval(d: Column, f: Column, coeffs: Sequence[Sequence[float]]) -> Column:
    """slope = Σ_{i,j} c[i][j] · f^j · d^i for the 3×3 coefficient grid
    (plot_model_on_reality.py:48-113)."""
    acc = F.lit(0.0)
    for i in range(3):
        for j in range(3):
            acc = acc + F.lit(coeffs[i][j]) * F.pow(f, j) * F.pow(d, i)
    return acc


def poly2_eval_sql(d: str, f: str, coeffs: Sequence[Sequence[float]]) -> str:
    terms = [
        f"({coeffs[i][j]!r} * pow({f}, {j}) * pow({d}, {i}))" for i in range(3) for j in range(3)
    ]
    return " + ".join(terms)


def quadfit_agg(
    df: DataFrame, x: str, y: str, group_cols: Sequence[str], round_to: int = 4
) -> DataFrame:
    """Per-group quadratic least squares via Cramer's rule on the normal
    equations — sums of x^k and x^k·y only, all map-side combinable."""
    xc, yc = F.col(x), F.col(y)
    agged = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("double").alias("s0"),
        F.sum(xc).alias("s1"),
        F.sum(xc * xc).alias("s2"),
        F.sum(xc * xc * xc).alias("s3"),
        F.sum(xc * xc * xc * xc).alias("s4"),
        F.sum(yc).alias("t0"),
        F.sum(xc * yc).alias("t1"),
        F.sum(xc * xc * yc).alias("t2"),
    )
    s0, s1, s2, s3, s4 = (F.col(c) for c in ("s0", "s1", "s2", "s3", "s4"))
    t0, t1, t2 = (F.col(c) for c in ("t0", "t1", "t2"))

    def det3(a, b, c, d, e, f_, g, h, i):
        return a * (e * i - f_ * h) - b * (d * i - f_ * g) + c * (d * h - e * g)

    det = det3(s0, s1, s2, s1, s2, s3, s2, s3, s4)
    c0 = det3(t0, s1, s2, t1, s2, s3, t2, s3, s4) / det
    c1 = det3(s0, t0, s2, s1, t1, s3, s2, t2, s4) / det
    c2 = det3(s0, s1, t0, s1, s2, t1, s2, s3, t2) / det
    valid = F.abs(det) > 1e-12
    return agged.select(
        *group_cols,
        (F.round(F.when(valid, c0), round_to) + F.lit(0.0)).alias("c0"),
        (F.round(F.when(valid, c1), round_to) + F.lit(0.0)).alias("c1"),
        (F.round(F.when(valid, c2), round_to) + F.lit(0.0)).alias("c2"),
        F.col("s0").cast("bigint").alias("num_points"),
    )


def quadfit_sql(source: str, x: str, y: str, group_cols: Sequence[str], round_to: int = 4) -> str:
    g = ", ".join(group_cols)

    def det3(a, b, c, d, e, f_, gg, h, i):
        return (
            f"({a} * ({e} * {i} - {f_} * {h}) - {b} * ({d} * {i} - {f_} * {gg})"
            f" + {c} * ({d} * {h} - {e} * {gg}))"
        )

    det = det3("s0", "s1", "s2", "s1", "s2", "s3", "s2", "s3", "s4")
    c0 = det3("t0", "s1", "s2", "t1", "s2", "s3", "t2", "s3", "s4")
    c1 = det3("s0", "t0", "s2", "s1", "t1", "s3", "s2", "t2", "s4")
    c2 = det3("s0", "s1", "t0", "s1", "s2", "t1", "s2", "s3", "t2")
    return f"""
    SELECT {g},
           round(CASE WHEN abs({det}) > 1e-12 THEN {c0} / {det} END, {round_to}) + 0.0 AS c0,
           round(CASE WHEN abs({det}) > 1e-12 THEN {c1} / {det} END, {round_to}) + 0.0 AS c1,
           round(CASE WHEN abs({det}) > 1e-12 THEN {c2} / {det} END, {round_to}) + 0.0 AS c2,
           CAST(s0 AS BIGINT) AS num_points
    FROM (
        SELECT {g},
               CAST(count(*) AS DOUBLE) AS s0,
               sum({x}) AS s1,
               sum({x} * {x}) AS s2,
               sum({x} * {x} * {x}) AS s3,
               sum({x} * {x} * {x} * {x}) AS s4,
               sum({y}) AS t0,
               sum({x} * {y}) AS t1,
               sum({x} * {x} * {y}) AS t2
        FROM ({source})
        GROUP BY {g}
    )
    """
