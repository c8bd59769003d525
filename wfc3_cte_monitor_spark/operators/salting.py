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
