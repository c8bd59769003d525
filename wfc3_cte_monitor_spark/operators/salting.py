"""Key salting for skewed joins (SURVEY §7.4 100 TB posture).

The reference's clusters differ in density by 10-100× (NGC104 dense vs
NGC6791 sparse, README.md:81-83), so the phot↔master join on
``master_id`` is skewed: a dense target's images each carry thousands of
matched stars. AQE's skew-join split handles moderate skew; for a
pathologically hot key the classic remedy is salting — replicate the
small side N ways, scatter the big side across the N replicas, join on
(key, salt). This operator packages that rewrite.

The salt on the big side is a deterministic hash of stable columns (NOT
rand(): a nondeterministic salt breaks retries/speculative execution —
a retried task would re-scatter rows differently).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_rank(
    df: DataFrame,
    part_col: str,
    order_col: str,
    n_buckets: int = 32,
    out: str = "rnk",
) -> DataFrame:
    """Exact per-``part_col`` ``row_number() ORDER BY order_col`` that
    scatters a mega-hot partition key instead of funnelling it through
    one task.

    A window's exchange hashes on the partition key alone, so a 50%-hot
    key puts 50% of ALL rows in one task — and AQE's skew handling never
    fires there (OptimizeSkewedJoin rewrites sort-merge/shuffled-hash
    JOINS only; there is no skew rule for Window exchanges — pinned by
    tests/test_scale_ops.py::test_mega_domain_window_skew_drill). The
    remedy is an ORDER-CORRELATED salt: bucket each row by where its
    order key falls inside its group's [min, max] range, rank locally
    within (key, bucket), then add per-bucket offsets. Because every
    row in bucket b orders before every row in bucket b+1, local rank +
    offset IS the exact global rank.

    Cost: one extra pre-pass (per-key min/max aggregate, map-side
    combinable, |keys| output rows → broadcast) and the offsets relation
    (|keys| × n_buckets rows → broadcast). All full-data exchanges hash
    on (key, bucket): the hot key spreads across n_buckets tasks.

    Ties in ``order_col`` within one group are assigned ranks in an
    arbitrary (but bucket-stable) order — the same contract as plain
    ``row_number``. Equal values always land in the same bucket, so the
    rank set {1..n} per group is exact regardless.
    """
    lo, hi = f"_{out}_lo", f"_{out}_hi"
    bkt, lrnk, off = f"_{out}_bkt", f"_{out}_lrnk", f"_{out}_off"
    bounds = df.groupBy(part_col).agg(
        F.min(order_col).alias(lo), F.max(order_col).alias(hi)
    )
    d = df.join(F.broadcast(bounds), part_col)
    span = F.col(hi).cast("double") - F.col(lo).cast("double") + F.lit(1.0)
    bucket = F.when(F.col(hi) == F.col(lo), F.lit(0)).otherwise(
        F.least(
            F.lit(n_buckets - 1),
            F.floor(
                (F.col(order_col).cast("double") - F.col(lo).cast("double"))
                * n_buckets
                / span
            ).cast("int"),
        )
    )
    d = d.withColumn(bkt, bucket).drop(lo, hi)
    from pyspark.sql import Window

    local = d.withColumn(
        lrnk, F.row_number().over(Window.partitionBy(part_col, bkt).orderBy(order_col))
    )
    counts = d.groupBy(part_col, bkt).agg(F.count(F.lit(1)).alias("_c"))
    offsets = counts.withColumn(
        off,
        F.coalesce(
            F.sum("_c").over(
                Window.partitionBy(part_col)
                .orderBy(bkt)
                .rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    ).select(part_col, bkt, off)
    return (
        local.join(F.broadcast(offsets), [part_col, bkt])
        .withColumn(out, (F.col(lrnk) + F.col(off)).cast("int"))
        .drop(bkt, lrnk, off)
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    keys: Sequence[str],
    n_salts: int = 8,
    scatter_cols: Sequence[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``keys`` with ``small`` replicated
    ``n_salts`` ways and ``big`` scattered by a deterministic hash of
    ``scatter_cols`` (default: all of big's non-key columns)."""
    scatter = list(scatter_cols) if scatter_cols else [c for c in big.columns if c not in keys]
    big_salted = big.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in scatter]), F.lit(n_salts)).cast("int")
    )
    small_salted = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return big_salted.join(small_salted, [*keys, "_salt"], how).drop("_salt")
