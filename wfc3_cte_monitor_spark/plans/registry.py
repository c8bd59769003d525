"""Driver-facing query registry.

Every operator from SURVEY.md §2 (and the additive LLM-data-pipeline
surface) registers a named query here: a Spark callable ``(spark, sf_dir)
-> DataFrame`` plus, where the semantics are ANSI-SQL-expressible, a DuckDB
oracle SQL string over the same parquet tables. The driver's correctness
gate runs both at sf=0.01 and compares row count + schema + order-
insensitive value hash.

Determinism rules every registered query follows (so value hashes match
across engines):

- alias every computed column identically in Spark and SQL;
- money sums go through ``DECIMAL(18,2)`` so both engines sum exactly,
  then cast back to DOUBLE;
- derived floating stats (avg/slope/stderr/similarity) are wrapped in
  ``round(x, N)`` on BOTH sides, with N chosen so cross-engine fp noise
  sits far below the rounding quantum;
- counts cast to BIGINT; no unordered LIMIT without a total tiebreak.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None = None  # DuckDB SQL twin; None → rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


QUERIES: dict[str, QuerySpec] = {}

# Optional per-query arm restriction, set by bench.py's frozen-arm pass
# (BENCH continuity: time round N's engine on round N-1's arm set).
# Lazy tagged-union arms are pruned by a Catalyst filter on the literal
# `which` column; arms with EAGER construction cost (iterative operators
# that collect() driver-side while the plan is being BUILT, e.g. d02's
# incremental-CC arm) additionally consult :func:`active_arms` and skip
# construction entirely. None → no restriction (the normal gate path).
_ARM_FILTER: dict[str, frozenset[str]] | None = None


def set_arm_filter(filt: dict[str, frozenset[str]] | None) -> None:
    global _ARM_FILTER
    _ARM_FILTER = None if filt is None else {k: frozenset(v) for k, v in filt.items()}


def active_arms(name: str) -> frozenset[str] | None:
    """The arm set query ``name`` should build, or None for all arms."""
    return None if _ARM_FILTER is None else _ARM_FILTER.get(name)


_ALL_BUT = "__all_but__"


def arms_requested(arms: frozenset[str] | None, names) -> bool:
    """True iff an :func:`active_arms` set requests ANY of ``names`` —
    the ONE interpreter for every eager-construction gate.

    Understands bench.py's complement token ``__all_but__<arm>`` (the
    pseudo-arm pricing run: "every arm EXCEPT <arm>"): such a set
    requests ``names`` unless every one of them is excluded. r11
    ADVICE: gates that intersected the raw set treated the complement
    token as "none of my arms" and would silently skip an eager family
    — misattributing its cost to the pseudo-arm — the moment the
    host query gained a PSEUDO_ARMS entry."""
    if arms is None:
        return True
    excluded = {a[len(_ALL_BUT):] for a in arms if a.startswith(_ALL_BUT)}
    if excluded:
        # complement sets must be PURE: a mixed filter like
        # {'doc', '__all_but__dictD'} has no defined semantics (the
        # plain names would be silently ignored — r12 ADVICE), and
        # bench.py never emits one; fail loudly instead of widening.
        plain = {a for a in arms if not a.startswith(_ALL_BUT)}
        if plain:
            raise ValueError(
                f"arm filter mixes plain arms {sorted(plain)} with "
                f"complement tokens {sorted(excluded)}; use one "
                f"__all_but__<arm> token alone"
            )
        if len(excluded) != 1:
            raise ValueError(
                f"arm filter carries {len(excluded)} complement tokens "
                f"{sorted(excluded)}; exactly one __all_but__<arm> token "
                "is allowed (bench.py only ever emits a singleton)"
            )
        return any(n not in excluded for n in names)
    return bool(set(names) & arms)


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):  # decorator
    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=(fn.__doc__ or "").strip(), tags=tags)
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import every plan module so the registry is fully populated."""
    from . import parity_queries  # noqa: F401

    for mod in (
        "parity_queries2",
        "domain_queries",
        "multimodal_queries",
        "dedup_queries",
        "similarity_queries",
        "text_queries",
        "window_queries",
    ):
        try:
            __import__(f"{__package__}.{mod}")
        except ModuleNotFoundError as e:
            # tolerate only a module that doesn't exist yet (incremental
            # rounds) — a broken existing module must fail loudly, not
            # silently shrink the registry
            if e.name != f"{__package__}.{mod}":
                raise
    return QUERIES
