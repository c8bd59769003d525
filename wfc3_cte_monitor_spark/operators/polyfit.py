"""2-D polynomial least-squares fit per group (N1).

Reference: ``polyfit2d`` builds the 9-column design matrix
[f^j·d^i for i,j in 0..2] and solves with np.linalg.lstsq per
(target, filter, exp_length, flashlvl, ctecorr, aperture) epoch set
(wfc3_cte_monitor/uvis_external_cte_plots.py:2216-2249, wrapper
``fit_empirical_model`` :596-778).

Groups are tiny (one point per epoch×fluxbin — tens of rows), so this is
the textbook applyInPandas case: Spark shuffles once on the group keys,
each group fits locally with the identical numpy code, and the output is
a 9-row-per-group coefficients DataFrame. The closed-form 1-D quadratic
(functions/model.quadfit_agg) covers the oracle-expressible surface; this
operator is the full-parity path.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame


def polyfit2d_np(d: np.ndarray, f: np.ndarray, s: np.ndarray, order: int = 2) -> np.ndarray:
    """Least-squares S(d, f) = Σ c[i, j]·f^j·d^i; returns (order+1)² coeffs
    in row-major (i, j) order — same design-matrix layout as the reference."""
    cols = [(f ** j) * (d ** i) for i in range(order + 1) for j in range(order + 1)]
    design = np.column_stack(cols)
    coeffs, *_ = np.linalg.lstsq(design, s, rcond=None)
    return coeffs


def polyfit2d(
    df: DataFrame,
    d: str,
    f: str,
    s: str,
    group_cols: Sequence[str],
    order: int = 2,
    strict: bool = False,
) -> DataFrame:
    """Per-group 2-D polynomial fit → one row per (group, i, j) coefficient.

    Underdetermined groups (n < (order+1)²) emit NaN coefficients by
    default — the sparse-data convention. ``strict=True`` RAISES on such
    a group instead: callers whose input is an exactly-determined grid by
    construction (the n01 gate's 3×3 node grid) want a loud failure, not
    a NaN-vs-partial-oracle hash mismatch, when an input cell goes
    missing at some scale factor."""
    in_schema = {fld.name: fld.dataType.simpleString() for fld in df.schema.fields}
    group_fields = ", ".join(f"{c} {in_schema[c]}" for c in group_cols)
    out_schema = f"{group_fields}, i int, j int, coeff double, num_points bigint"

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        sub = pdf[[d, f, s]].dropna()
        n = len(sub)
        rows = []
        base = {c: pdf[c].iloc[0] for c in group_cols}
        if n >= (order + 1) ** 2:
            coeffs = polyfit2d_np(
                sub[d].to_numpy(float), sub[f].to_numpy(float), sub[s].to_numpy(float), order
            )
        elif strict:
            raise ValueError(
                f"polyfit2d(strict): group {base!r} has {n} usable points, "
                f"needs >= {(order + 1) ** 2} for an order-{order} 2-D fit"
            )
        else:
            coeffs = np.full((order + 1) ** 2, np.nan)
        k = 0
        for i in range(order + 1):
            for j in range(order + 1):
                rows.append({**base, "i": i, "j": j, "coeff": float(coeffs[k]), "num_points": n})
                k += 1
        return pd.DataFrame(rows)

    return df.groupBy(*group_cols).applyInPandas(fit, schema=out_schema)
