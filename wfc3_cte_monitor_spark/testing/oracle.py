"""Local mirror of the driver's DuckDB-oracle correctness gate.

The driver runs each ``queries()[name]`` Spark query and its
``oracle_sql()[name]`` twin on DuckDB over the same parquet tables and
compares row count + schema + order-insensitive value hash. This module
reproduces that comparison locally so parity regressions surface in
``pytest`` long before a round's verify runs.
"""

from __future__ import annotations

import datetime as _dt
import math
from dataclasses import dataclass, field
from decimal import Decimal

import duckdb

from ..sources.catalog import TABLES, table_path

FLOAT_REL_TOL = 1e-9
FLOAT_ABS_TOL = 1e-9


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{table_path(sf_dir, t)}'")
    return con


def _canon(v):
    """Canonicalize a cell for cross-engine comparison."""
    if v is None:
        return None
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, list):
        return tuple(_canon(x) for x in v)
    return v


def _sort_key(row):
    """Tolerance-stable row key: floats sort by a 6-significant-digit
    rendering (a quantum far coarser than FLOAT_REL_TOL) so two rows that
    differ only within comparison tolerance land in the same position on
    both engines; the exact repr is kept as a secondary key so genuinely
    different rows still order deterministically."""

    def cell(v):
        if v is None:
            return ("\0", "\0")
        if isinstance(v, float):
            return (f"float:{v:.6g}", repr(v))
        return (f"{type(v).__name__}:{v!r}", "")

    return tuple(cell(v) for v in row)


def _cells_equal(a, b) -> bool:
    if a is None or b is None:
        return a is b
    if isinstance(a, float) and isinstance(b, float):
        return math.isclose(a, b, rel_tol=FLOAT_REL_TOL, abs_tol=FLOAT_ABS_TOL)
    return a == b


@dataclass
class CompareResult:
    name: str
    ok: bool
    spark_rows: int
    oracle_rows: int
    issues: list[str] = field(default_factory=list)

    def __str__(self) -> str:
        status = "OK" if self.ok else "MISMATCH"
        msg = f"[{status}] {self.name}: spark={self.spark_rows} oracle={self.oracle_rows}"
        for i in self.issues[:8]:
            msg += f"\n    - {i}"
        return msg


def compare_query(spark, name: str, sf_dir: str) -> CompareResult:
    from ..plans.registry import load_all
    from ..session import prepare

    # the driver's queries() wrapper runs prepare() before each query;
    # mirror that so the comparison holds on an arbitrary plain session
    prepare(spark)
    spec = load_all()[name]
    sdf = spec.fn(spark, sf_dir)
    spark_cols = list(sdf.columns)
    spark_rows = [tuple(r) for r in sdf.collect()]

    if spec.oracle is None:
        return CompareResult(name, ok=True, spark_rows=len(spark_rows), oracle_rows=-1,
                             issues=["rows-only (no oracle SQL)"])

    con = duckdb_connect(sf_dir)
    cur = con.execute(spec.oracle)
    oracle_cols = [d[0] for d in cur.description]
    oracle_rows = cur.fetchall()

    issues: list[str] = []
    if sorted(spark_cols) != sorted(oracle_cols):
        issues.append(f"schema mismatch: spark={sorted(spark_cols)} oracle={sorted(oracle_cols)}")
    if len(spark_rows) != len(oracle_rows):
        issues.append(f"row count mismatch: spark={len(spark_rows)} oracle={len(oracle_rows)}")

    if not issues:
        # Align column order by sorted name (the driver sorts columns by name).
        s_idx = [spark_cols.index(c) for c in sorted(spark_cols)]
        o_idx = [oracle_cols.index(c) for c in sorted(oracle_cols)]
        s_sorted = sorted(
            (tuple(_canon(r[i]) for i in s_idx) for r in spark_rows), key=_sort_key
        )
        o_sorted = sorted(
            (tuple(_canon(r[i]) for i in o_idx) for r in oracle_rows), key=_sort_key
        )
        bad = 0
        for rn, (sr, orow) in enumerate(zip(s_sorted, o_sorted)):
            for cn, (a, b) in enumerate(zip(sr, orow)):
                if not _cells_equal(a, b):
                    bad += 1
                    if bad <= 5:
                        issues.append(
                            f"row {rn} col {sorted(spark_cols)[cn]}: spark={a!r} oracle={b!r}"
                        )
        if bad > 5:
            issues.append(f"... {bad} mismatched cells total")

    return CompareResult(
        name, ok=not issues, spark_rows=len(spark_rows), oracle_rows=len(oracle_rows), issues=issues
    )
