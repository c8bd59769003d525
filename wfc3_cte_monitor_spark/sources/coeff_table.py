"""LaTeX coefficient-table formatter (SURVEY §7.1(5)).

Reference: ``print_coeff_latextable`` (wfc3_cte_monitor/
print_coeff_latextable.py:22-40) reads one coeff txt file per observation
mode, builds a 9-row table (Mode = C00..C22, one column per mode, values
'%0.2e') and ascii-writes it as LaTeX. Here the coefficients come from
the polyfit2d/quadfit DataFrame instead of loose txt files; the pivot is
a Spark transform and only the final 9×k grid is collected for
formatting — a formatter is inherently driver-side output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

COEFF_LABELS = [f"C{i}{j}" for i in range(3) for j in range(3)]


def coeff_table_wide(coeffs: DataFrame, mode_col: str, value_col: str = "coeff") -> DataFrame:
    """(mode, i, j, coeff) long rows → 9-row wide grid: Mode label column
    plus one column per observation mode (groupBy().pivot(), explicit
    label ordering C00..C22 as the reference's row order)."""
    modes = [r[0] for r in coeffs.select(mode_col).distinct().orderBy(mode_col).collect()]
    # internal label name avoids Spark's case-insensitive collision when the
    # caller's mode column is literally named "mode"
    return (
        coeffs.withColumn("_coeff_label", F.format_string("C%d%d", F.col("i"), F.col("j")))
        .groupBy("_coeff_label")
        .pivot(mode_col, modes)
        .agg(F.first(value_col))
        .orderBy("_coeff_label")
        .withColumnRenamed("_coeff_label", "Mode")
    )


def print_coeff_latextable(coeffs: DataFrame, mode_col: str, value_col: str = "coeff") -> str:
    """Render the coefficient grid as a LaTeX tabular with '%0.2e' values
    (print_coeff_latextable.py:36-40's ascii latex output)."""
    wide = coeff_table_wide(coeffs, mode_col, value_col)
    cols = wide.columns  # Mode first, then the pivoted mode columns
    lines = [
        "\\begin{table}",
        "\\begin{tabular}{" + "c" * len(cols) + "}",
        " & ".join(cols) + " \\\\",
    ]
    for row in wide.collect():
        cells = [row[0]] + [
            ("" if v is None else "%0.2e" % v) for v in row[1:]
        ]
        lines.append(" & ".join(cells) + " \\\\")
    lines += ["\\end{tabular}", "\\end{table}"]
    return "\n".join(lines)
