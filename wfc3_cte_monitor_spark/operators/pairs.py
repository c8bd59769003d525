"""Pair-matching joins.

The reference never writes a SQL JOIN — pairing is done with looped
two-phase queries (N+1) and positional zips. The real relational
semantics (SURVEY.md §2.3):

- J2 ``pair_self_join``: two scans of the exposure table with the same
  conjunctive mode-key filter, one per chip, zipped → a self-join on the
  mode keys with a side predicate on each alias
  (wfc3_cte_monitor/database_queries.py:589-678).
- J3 ``matching_lookup``: given one row, find the row with identical keys
  and the opposite side (database_queries.py:527-584 — the reference's
  chip2→chip1 direction is broken by a `==`-for-`=` bug; we implement the
  intended symmetric semantics).
- J4 ``rank_pairing``: sort within a group, split by a side predicate,
  pair positionally → row_number per (group, side) + equi-join on rank
  (database_queries.py:683-740).

All are single shuffle-equi-joins on the key columns; when one side is a
filtered trickle (the usual case — one mode's exposures) AQE broadcasts it.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def pair_self_join(
    df: DataFrame,
    keys: Sequence[str],
    side_col: str,
    side_1,
    side_2,
    payload: Sequence[str],
) -> DataFrame:
    """Self-join rows sharing ``keys``, side_1 on the left, side_2 on the
    right. Payload columns come out suffixed ``_1`` / ``_2``."""
    left = df.where(F.col(side_col) == side_1).select(
        *keys, *[F.col(c).alias(f"{c}_1") for c in payload]
    )
    right = df.where(F.col(side_col) == side_2).select(
        *keys, *[F.col(c).alias(f"{c}_2") for c in payload]
    )
    return left.join(right, on=list(keys), how="inner")


def matching_lookup(
    df: DataFrame,
    keys: Sequence[str],
    side_col: str,
    ident_col: str,
    ident_value,
) -> DataFrame:
    """Given the identifier of one row, return its opposite-side partner(s):
    read the row's keys, then equi-join back on the keys with the side
    flipped. Intended (bug-free) semantics of J3."""
    probe = df.where(F.col(ident_col) == ident_value).select(
        *keys, F.col(side_col).alias("_side"), F.col(ident_col).alias("_ident")
    )
    return (
        df.join(F.broadcast(probe), on=list(keys), how="inner")
        .where(F.col(side_col) != F.col("_side"))
        .drop("_side", "_ident")
    )


def rank_pairing(
    df: DataFrame,
    group_cols: Sequence[str],
    side_col: str | Column,
    order_col: str | Sequence[str],
    payload: Sequence[str],
) -> DataFrame:
    """Positional pairing: rank rows by ``order_col`` within
    (group, side) and inner-join side TRUE to side FALSE on
    (group, rank). ``side_col`` may be a boolean Column expression (the
    reference splits on a visit-substring test, database_queries.py:736-737).

    ``order_col`` accepts a composite (list) — it must be a TOTAL order
    within each (group, side): row_number breaks ties arbitrarily, so a
    non-unique order makes the pairing nondeterministic (and
    engine-dependent).
    """
    order = [order_col] if isinstance(order_col, str) else list(order_col)
    side = F.col(side_col) if isinstance(side_col, str) else side_col
    ranked = df.withColumn("_side", side).withColumn(
        "pair_rank",
        F.row_number().over(Window.partitionBy(*group_cols, "_side").orderBy(*order)),
    )
    left = ranked.where(F.col("_side")).select(
        *group_cols, "pair_rank", *[F.col(c).alias(f"{c}_1") for c in payload]
    )
    right = ranked.where(~F.col("_side")).select(
        *group_cols, "pair_rank", *[F.col(c).alias(f"{c}_2") for c in payload]
    )
    return left.join(right, on=[*group_cols, "pair_rank"], how="inner")
