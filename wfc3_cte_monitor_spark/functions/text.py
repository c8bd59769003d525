"""Text-analysis expression toolkit (additive LLM-data-pipeline surface).

Everything here is a PAIRED construction: a Spark Column expression and a
DuckDB SQL fragment computing the identical value, so the dedup/text
queries are fully oracle-checkable. The only primitive shared between the
engines is md5 — both produce the same hex string, and both can parse a
15-hex-digit prefix into a BIGINT — which gives a portable 60-bit hash
that MinHash/SimHash build on (no engine-private hash functions).

All expressions are built-in-function compositions (split / transform /
aggregate / bitwise) — JVM-side, codegen-friendly, no Python UDFs — so
they hold up on a 100 TB corpus.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


# --- normalization & tokens -------------------------------------------------

def norm_text(col: str | Column) -> Column:
    """lower + strip non-alphanumerics + trim."""
    return F.trim(F.regexp_replace(F.lower(_c(col)), "[^a-z0-9 ]", ""))


def norm_text_sql(col: str) -> str:
    return f"trim(regexp_replace(lower({col}), '[^a-z0-9 ]', '', 'g'))"


def tokens(col: str | Column) -> Column:
    return F.split(norm_text(col), r"\s+")


def tokens_sql(col: str) -> str:
    return f"string_split_regex({norm_text_sql(col)}, '\\s+')"


def shingles(col: str | Column, k: int = 3) -> Column:
    """Word k-gram shingles (distinct), [] when fewer than k tokens."""
    t = tokens(col)
    make = F.transform(
        F.sequence(F.lit(1), F.size(t) - (k - 1)),
        lambda i: F.concat_ws(" ", F.slice(t, i, k)),
    )
    return F.array_distinct(F.when(F.size(t) >= k, make).otherwise(F.array()))


def shingles_sql(col: str, k: int = 3) -> str:
    t = tokens_sql(col)
    joined = " || ' ' || ".join(f"t[i + {j}]" for j in range(k))
    return (
        f"list_distinct(CASE WHEN len(t) >= {k} THEN "
        f"list_transform(range(1, len(t) - {k - 2}), i -> {joined}) "
        f"ELSE [] END) FROM (SELECT {t} AS t)"
    )


def shingles_sql_inline(col: str, k: int = 3) -> str:
    """Same as shingles_sql but as a pure expression (t inlined)."""
    t = tokens_sql(col)
    joined = " || ' ' || ".join(f"({t})[i + {j}]" for j in range(k))
    return (
        f"list_distinct(CASE WHEN len({t}) >= {k} THEN "
        f"list_transform(range(1, len({t}) - {k - 2}), i -> {joined}) "
        f"ELSE [] END)"
    )


# --- portable 60-bit hash ----------------------------------------------------

def portable_hash64(col: str | Column) -> Column:
    """md5-prefix hash: identical in Spark and DuckDB (60 bits, positive)."""
    return F.conv(F.substring(F.md5(_c(col).cast("string")), 1, 15), 16, 10).cast("bigint")


def portable_hash64_sql(col: str) -> str:
    return f"CAST(CONCAT('0x', substr(md5(CAST({col} AS VARCHAR)), 1, 15)) AS BIGINT)"


# --- text statistics ----------------------------------------------------------

def token_count(col: str | Column) -> Column:
    t = tokens(col)
    return F.when(F.length(norm_text(col)) == 0, 0).otherwise(F.size(t)).cast("bigint")


def token_count_sql(col: str) -> str:
    return (
        f"CAST(CASE WHEN length({norm_text_sql(col)}) = 0 THEN 0 "
        f"ELSE len({tokens_sql(col)}) END AS BIGINT)"
    )


def punct_ratio(col: str | Column) -> Column:
    """Fraction of characters that are not [a-zA-Z0-9 ]."""
    c = _c(col)
    stripped = F.regexp_replace(c, "[a-zA-Z0-9 ]", "")
    return F.when(F.length(c) > 0, F.length(stripped) / F.length(c)).otherwise(0.0)


def punct_ratio_sql(col: str) -> str:
    return (
        f"CASE WHEN length({col}) > 0 THEN "
        f"length(regexp_replace({col}, '[a-zA-Z0-9 ]', '', 'g'))::DOUBLE / length({col}) "
        f"ELSE 0.0 END"
    )


def stopword_hits(col: str | Column, stopwords: list[str]) -> Column:
    """Count of tokens that are in ``stopwords`` (with repetition)."""
    t = tokens(col)
    arr = F.array(*[F.lit(s) for s in stopwords])
    return F.size(F.filter(t, lambda x: F.array_contains(arr, x))).cast("bigint")


def stopword_hits_sql(col: str, stopwords: list[str]) -> str:
    lits = ", ".join(f"'{s}'" for s in stopwords)
    return (
        f"CAST(len(list_filter({tokens_sql(col)}, x -> list_contains([{lits}], x))) AS BIGINT)"
    )
