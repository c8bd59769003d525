"""Text-analysis queries over the documents table (additive surface):
token counting, language-ID heuristic, quality scoring, fingerprinting."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.text import (
    norm_text,
    norm_text_sql,
    portable_hash64,
    portable_hash64_sql,
    punct_ratio,
    punct_ratio_sql,
    stopword_hits,
    stopword_hits_sql,
    token_count,
    token_count_sql,
    tokens,
    tokens_sql,
)
from ..sources.catalog import load_table
from .registry import register

# Tiny per-language stopword profiles for the n-gram/stopword heuristic.
LANG_PROFILES = {
    "en": ["the", "a", "of", "and", "to"],
    "es": ["el", "la", "de", "y", "que"],
    "fr": ["le", "la", "de", "et", "que"],
    "de": ["der", "die", "das", "und", "zu"],
}


# T1 — token counting + basic stats.
@register(
    "t01_token_stats",
    oracle=f"""
    SELECT doc_id,
           {token_count_sql('text')} AS n_tokens,
           CAST(length(text) AS BIGINT) AS n_chars_raw,
           round({punct_ratio_sql('text')}, 6) AS punct_ratio,
           CAST(len(list_distinct({tokens_sql('text')})) AS BIGINT) AS n_unique_tokens
    FROM documents
    """,
    tags=("text", "tokens"),
)
def t01_token_stats(spark, sf_dir):
    """Whitespace tokenization stats: counts, punctuation ratio, vocab."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        token_count("text").alias("n_tokens"),
        F.length("text").cast("bigint").alias("n_chars_raw"),
        F.round(punct_ratio("text"), 6).alias("punct_ratio"),
        F.size(F.array_distinct(tokens("text"))).cast("bigint").alias("n_unique_tokens"),
    )


# T2 — language-ID heuristic: stopword-profile hit counts, argmax with a
# deterministic tiebreak (profile order). A real corpus would use n-gram
# profiles; the operator/oracle shape is identical.
def _langid_spark(docs):
    hits = {lang: stopword_hits("text", words) for lang, words in LANG_PROFILES.items()}
    scored = docs.select(
        "doc_id", "lang", *[h.alias(f"hits_{lang}") for lang, h in hits.items()]
    )
    best = F.lit("und")
    best_score = F.lit(-1).cast("bigint")
    for lang in LANG_PROFILES:  # later profiles win only strictly
        c = F.col(f"hits_{lang}")
        best = F.when(c > best_score, F.lit(lang)).otherwise(best)
        best_score = F.when(c > best_score, c).otherwise(best_score)
    return scored.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        *[F.col(f"hits_{lang}") for lang in LANG_PROFILES],
        F.when(best_score <= 0, "und").otherwise(best).alias("predicted_lang"),
    )


def _langid_sql() -> str:
    hit_cols = ", ".join(
        f"{stopword_hits_sql('text', words)} AS hits_{lang}"
        for lang, words in LANG_PROFILES.items()
    )
    langs = list(LANG_PROFILES)
    best, best_score = "'und'", "CAST(-1 AS BIGINT)"
    for lang in langs:
        best = f"CASE WHEN hits_{lang} > {best_score} THEN '{lang}' ELSE {best} END"
        best_score = f"CASE WHEN hits_{lang} > {best_score} THEN hits_{lang} ELSE {best_score} END"
    return f"""
    SELECT doc_id, lang AS labeled_lang,
           {', '.join(f'hits_{lang}' for lang in langs)},
           CASE WHEN {best_score} <= 0 THEN 'und' ELSE {best} END AS predicted_lang
    FROM (SELECT doc_id, lang, {hit_cols} FROM documents)
    """


register("t02_lang_id", oracle=_langid_sql(), tags=("text", "langid"))(
    lambda spark, sf_dir: _langid_spark(load_table(spark, sf_dir, "documents"))
)


# T3 — quality score: composite of length, punctuation, stopword density,
# vocabulary diversity (the usual pre-training filters).
@register(
    "t03_quality_score",
    oracle=f"""
    SELECT doc_id,
           round(
               0.3 * least(ln(1 + {token_count_sql('text')}) / ln(201), 1.0)
             + 0.3 * (1.0 - least({punct_ratio_sql('text')} * 5, 1.0))
             + 0.2 * least(({stopword_hits_sql('text', LANG_PROFILES['en'])}::DOUBLE
                            / greatest({token_count_sql('text')}, 1)) * 10, 1.0)
             + 0.2 * (len(list_distinct({tokens_sql('text')}))::DOUBLE
                      / greatest({token_count_sql('text')}, 1))
           , 6) AS quality
    FROM documents
    """,
    tags=("text", "quality"),
)
def t03_quality_score(spark, sf_dir):
    """Composite quality in [0,1]: length, punctuation, stopword density,
    type/token ratio — all built-in expressions."""
    docs = load_table(spark, sf_dir, "documents")
    n_tok = token_count("text")
    stop = stopword_hits("text", LANG_PROFILES["en"]).cast("double")
    uniq = F.size(F.array_distinct(tokens("text"))).cast("double")
    quality = (
        0.3 * F.least(F.log(1 + n_tok) / F.log(F.lit(201.0)), F.lit(1.0))
        + 0.3 * (1.0 - F.least(punct_ratio("text") * 5, F.lit(1.0)))
        + 0.2 * F.least((stop / F.greatest(n_tok, F.lit(1))) * 10, F.lit(1.0))
        + 0.2 * (uniq / F.greatest(n_tok, F.lit(1)))
    )
    return docs.select("doc_id", F.round(quality, 6).alias("quality"))


# T4 — document fingerprint: 60-bit content hash of the normalized text +
# a locality-insensitive prefix bucket (sharding/dedup key at scale).
@register(
    "t04_fingerprint",
    oracle=f"""
    SELECT doc_id,
           {portable_hash64_sql(norm_text_sql('text'))} AS fingerprint,
           {portable_hash64_sql(norm_text_sql('text'))} % 1024 AS shard
    FROM documents
    """,
    tags=("text", "fingerprint"),
)
def t04_fingerprint(spark, sf_dir):
    """Deterministic content fingerprint + shard bucket."""
    docs = load_table(spark, sf_dir, "documents")
    fp = portable_hash64(norm_text("text"))
    return docs.select("doc_id", fp.alias("fingerprint"), (fp % 1024).alias("shard"))
