"""Banded range join (J7): |left_val - right_val| <= band as an EQUI-join.

Spark has no native range-join strategy, so ``left JOIN right ON
abs(l - r) <= band`` plans as a BroadcastNestedLoopJoin — O(|L|·|R|)
predicate evaluations (measured 5.6s for 150k × 80 at sf0.1). The classic
fix (SURVEY.md §4 custom-work item 3): bucket both sides by ``band``-sized
intervals, fan the SMALLER side out to buckets {b-1, b, b+1}, hash-join on
the bucket, then refine with the exact predicate. Values within ``band``
of each other always land within one bucket of each other, so the fan-out
is lossless; each (left row, right row) pair can meet in at most one
bucket row, so no dedup is needed.

At 100 TB this turns the band join into an ordinary shuffle/broadcast
hash join that AQE can size — the NLJ would be quadratic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def band_join(
    left: DataFrame,
    right: DataFrame,
    left_val: Column,
    right_val: Column,
    band: float,
    fan_side: str = "right",
    how: str = "inner",
) -> DataFrame:
    """Join rows where ``abs(left_val - right_val) <= band``.

    ``fan_side`` names the (smaller) side that gets the 3× bucket fan-out;
    the other side computes a single bucket. Both value expressions must
    be numeric (cast dates/timestamps to epoch days/seconds first).
    """
    lb = F.floor(left_val / band).cast("bigint")
    rb = F.floor(right_val / band).cast("bigint")
    if fan_side == "right":
        r = right.withColumn(
            "_bucket", F.explode(F.array(rb - 1, rb, rb + 1))
        )
        l = left.withColumn("_bucket", lb)
    else:
        l = left.withColumn("_bucket", F.explode(F.array(lb - 1, lb, lb + 1)))
        r = right.withColumn("_bucket", rb)
    joined = l.join(r, "_bucket", how)
    return joined.where(F.abs(left_val - right_val) <= band).drop("_bucket")
