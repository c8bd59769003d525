"""Text-analysis queries over the documents table (additive surface):
token counting, language-ID heuristic, quality scoring, fingerprinting."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.text import (
    bpe_token_count,
    bpe_token_count_sql,
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
from ..sources.catalog import load_table, spread
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
           {bpe_token_count_sql('text')} AS n_bpe_tokens,
           CAST(length(text) AS BIGINT) AS n_chars_raw,
           round({punct_ratio_sql('text')}, 6) AS punct_ratio,
           CAST(len(list_distinct({tokens_sql('text')})) AS BIGINT) AS n_unique_tokens
    FROM documents
    """,
    tags=("text", "tokens"),
)
def t01_token_stats(spark, sf_dir):
    """Tokenization stats: whitespace count, BPE-ish pre-tokenizer count
    (letter/digit/symbol runs with leading-space affinity — the GPT-2
    first-split shape, engine-portable regex), punctuation ratio,
    vocab."""
    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    return docs.select(
        "doc_id",
        token_count("text").alias("n_tokens"),
        bpe_token_count("text").alias("n_bpe_tokens"),
        F.length("text").cast("bigint").alias("n_chars_raw"),
        F.round(punct_ratio("text"), 6).alias("punct_ratio"),
        F.size(F.array_distinct(tokens("text"))).cast("bigint").alias("n_unique_tokens"),
    )


# T2 — language-ID heuristic: stopword-profile hit counts, argmax with a
# deterministic tiebreak (profile order). A real corpus would use n-gram
# profiles; the operator/oracle shape is identical.
def _langid_columns():
    """Language-ID as pure column expressions (argmax over stopword-profile
    hit counts, later profiles win only strictly) — composable into any
    projection without a join."""
    hits = {lang: stopword_hits("text", words) for lang, words in LANG_PROFILES.items()}
    best = F.lit("und")
    best_score = F.lit(-1).cast("bigint")
    for lang in LANG_PROFILES:  # later profiles win only strictly
        c = hits[lang]
        best = F.when(c > best_score, F.lit(lang)).otherwise(best)
        best_score = F.when(c > best_score, c).otherwise(best_score)
    return [
        *[hits[lang].alias(f"hits_{lang}") for lang in LANG_PROFILES],
        F.when(best_score <= 0, "und").otherwise(best).alias("predicted_lang"),
    ]


def _langid_spark(docs):
    return docs.select("doc_id", F.col("lang").alias("labeled_lang"), *_langid_columns())


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


# T2 + T3 + T4 + SimHash — the per-document text-analysis profile as one
# joined result (50-query driver cap): language-ID heuristic, composite
# quality score, content fingerprint + shard, and the 16-bit SimHash
# signature, all keyed by doc_id.
def _quality_sql() -> str:
    return f"""
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
    """


def _profile_sql() -> str:
    from ..functions.dedup import simhash16_sql
    from ..functions.text import winnow_fp_sql_list

    return f"""
    WITH langid AS ({_langid_sql()}),
    quality AS ({_quality_sql()}),
    fp AS (
        SELECT doc_id, fingerprint, shard,
               CAST(len(_wf) AS BIGINT) AS n_winnow_fp,
               CAST(coalesce(list_sum(_wf), 0) AS BIGINT) AS winnow_fp_sum
        FROM (
            SELECT doc_id,
                   {portable_hash64_sql(norm_text_sql('text'))} AS fingerprint,
                   {portable_hash64_sql(norm_text_sql('text'))} % 1024 AS shard,
                   {winnow_fp_sql_list('text')} AS _wf
            FROM documents
        )
    ),
    sim AS ({simhash16_sql('documents', 'doc_id', tokens_sql('text'))})
    SELECT l.doc_id, l.labeled_lang,
           l.hits_en, l.hits_es, l.hits_fr, l.hits_de, l.predicted_lang,
           q.quality, f.fingerprint, f.shard, f.n_winnow_fp, f.winnow_fp_sum,
           s.simhash
    FROM langid l
    JOIN quality q ON l.doc_id = q.doc_id
    JOIN fp f ON l.doc_id = f.doc_id
    JOIN sim s ON l.doc_id = s.doc_id
    """


@register("t02_text_profile", oracle=_profile_sql(),
          tags=("text", "langid", "quality", "fingerprint", "simhash"))
def t02_text_profile(spark, sf_dir):
    """Per-document analysis profile: stopword-profile language ID
    (argmax with deterministic tiebreak), composite quality in [0,1]
    (length, punctuation, stopword density, type/token ratio),
    content fingerprint + shard bucket, rolling-hash winnowing
    fingerprints (Rabin-Karp token 3-gram polynomial → min-per-window-
    of-4 selection, emitted as count + sum reductions), 16-bit SimHash.
    All built-in expressions; one narrow join chain on doc_id."""
    from ..functions.dedup import simhash16
    from ..functions.text import winnow_fingerprints

    # the documents parquet is a single file → spread the CPU-heavy text
    # expressions across the executor threads (the shuffle is a few MB).
    # NOT checkpointed: the three branches re-read the spread exchange
    # (reused), and materializing raw text measured slightly slower than
    # scan pipelining at both sf0.1 and the 10x corpus.
    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")

    n_tok = token_count("text")
    stop = stopword_hits("text", LANG_PROFILES["en"]).cast("double")
    uniq = F.size(F.array_distinct(tokens("text"))).cast("double")
    quality = (
        0.3 * F.least(F.log(1 + n_tok) / F.log(F.lit(201.0)), F.lit(1.0))
        + 0.3 * (1.0 - F.least(punct_ratio("text") * 5, F.lit(1.0)))
        + 0.2 * F.least((stop / F.greatest(n_tok, F.lit(1))) * 10, F.lit(1.0))
        + 0.2 * (uniq / F.greatest(n_tok, F.lit(1)))
    )
    fp = portable_hash64(norm_text("text"))
    # lang-id and the scalar profile are per-row projections of the same
    # scan — ONE select, no join between them; only SimHash (explode +
    # groupBy vote) genuinely needs its own aggregation branch
    langid_cols = _langid_columns()
    profile = docs.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        *langid_cols,
        F.round(quality, 6).alias("quality"),
        fp.alias("fingerprint"),
        (fp % 1024).alias("shard"),
    )
    sim = simhash16(docs.select("doc_id", tokens("text").alias("t")), "doc_id", F.col("t"))
    wf = winnow_fingerprints(docs.select("doc_id", "text"), "doc_id", "text")
    joined = (
        profile.join(sim, "doc_id")
        .join(wf, "doc_id", "left")
        .withColumn("n_winnow_fp", F.coalesce("n_winnow_fp", F.lit(0)).cast("bigint"))
        .withColumn("winnow_fp_sum", F.coalesce("winnow_fp_sum", F.lit(0)).cast("bigint"))
    )
    # column order mirrors the oracle's select list
    cols = [c for c in joined.columns if c not in ("n_winnow_fp", "winnow_fp_sum", "simhash")]
    return joined.select(*cols, "n_winnow_fp", "winnow_fp_sum", "simhash")
