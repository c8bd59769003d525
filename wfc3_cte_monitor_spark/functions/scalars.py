"""Cross-engine-deterministic scalar/aggregate expression helpers.

The DuckDB-oracle gate hashes result values, so floating-point noise from
different partial-aggregation orders would read as wrongness. Policy
(mirrored in every oracle SQL string):

- ``dsum``: sums of fixed-point quantities (money, quantities) go through
  DECIMAL(18,s) so both engines sum EXACTLY, then cast back to DOUBLE.
  A double is never exactly representable at a decimal half-tie, so the
  double→decimal rounding step is also engine-independent.
- ``davg``: exact decimal sum divided by count — one deterministic double
  division instead of an order-dependent running mean.
- ``r6``/``r4``: round derived statistics (variances, slopes, ratios)
  whose cross-engine noise is ~1e-12 relative — far below the quantum.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dsum(col: str | Column, scale: int = 2) -> Column:
    """Exact sum via decimal; returns DOUBLE."""
    return F.sum(_c(col).cast(f"decimal(18,{scale})")).cast("double")


def davg(col: str | Column, scale: int = 2) -> Column:
    """Exact-sum average; returns DOUBLE."""
    return (
        F.sum(_c(col).cast(f"decimal(18,{scale})")).cast("double")
        / F.count(F.lit(1))
    )


def disc_price_sum(price: str, discount: str, scale: int = 2) -> Column:
    """Exact sum of price*(1-discount): each FACTOR is cast to decimal (the
    source columns are exact 2-decimal values, so the cast is tie-free on
    both engines), then multiplied in exact decimal arithmetic. Casting the
    double PRODUCT would hit engine-dependent rounding near half-cent
    boundaries — observed as cent-level mismatches vs DuckDB."""
    p = _c(price).cast(f"decimal(18,{scale})")
    d = _c(discount).cast(f"decimal(18,{scale})")
    return F.sum(p * (F.lit(1).cast("decimal(3,0)") - d)).cast("double")


def disc_price_sum_sql(price: str, discount: str, scale: int = 2) -> str:
    return (
        f"CAST(SUM(CAST({price} AS DECIMAL(18,{scale})) * "
        f"(1 - CAST({discount} AS DECIMAL(18,{scale})))) AS DOUBLE)"
    )


def r6(col: str | Column) -> Column:
    return F.round(_c(col), 6)


def r4(col: str | Column) -> Column:
    return F.round(_c(col), 4)


# Relative nudge for boundary-stable rounding. Rounding a double that sits
# EXACTLY on a half-quantum decimal boundary is engine-dependent (Spark
# rounds the double's exact decimal expansion via BigDecimal HALF_UP;
# DuckDB scales-multiplies then nearbyints) — and such exact boundaries
# are COMMON when the input is itself a quotient of an already-rounded
# value (e.g. avg of round(x,6)/n hits odd multiples of 5e-9 whenever n is
# a small power of two). The nudge shifts the value ~600 ULPs off the
# boundary — far above the engines' 1-ULP disagreement range, far below
# the rounding quantum — identically on both engines (same IEEE multiply
# of the same double). The trailing ``+ 0.0`` folds -0.0 to 0.0 (DuckDB
# keeps the sign of a rounded tiny negative; Spark does not).
_NUDGE = 1.0 + 2e-13


def round_stable(col: str | Column, n: int) -> Column:
    """Boundary-stable cross-engine round: use for SECOND-stage rounding —
    any value derived from already-rounded/quantized inputs."""
    return F.round(_c(col) * _NUDGE, n) + F.lit(0.0)


def round_stable_sql(expr: str, n: int) -> str:
    """DuckDB twin of :func:`round_stable`."""
    return f"(round(({expr}) * {_NUDGE!r}, {n}) + 0.0)"


def dsum_sql(expr: str, scale: int = 2) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE)"


def davg_sql(expr: str, scale: int = 2) -> str:
    return f"(CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE) / count(*))"
