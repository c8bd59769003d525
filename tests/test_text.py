

from pyspark.sql import functions as F

def test_stopword_hits_regex_equals_filter_form(spark, sf_smoke):
    """The regexp_count rewrite must count exactly what the token-filter
    form counts (with repetition) on the real corpus."""
    from wfc3_cte_monitor_spark.functions.text import stopword_hits, tokens
    from wfc3_cte_monitor_spark.plans.text_queries import LANG_PROFILES
    from wfc3_cte_monitor_spark.sources.catalog import load_table

    docs = load_table(spark, sf_smoke, "documents")
    arr_form = {}
    for lang, words in LANG_PROFILES.items():
        warr = F.array(*[F.lit(w) for w in words])
        arr_form[lang] = F.size(
            F.filter(tokens("text"), lambda x: F.array_contains(warr, x))
        ).cast("bigint")
    both = docs.select(
        "doc_id",
        *[stopword_hits("text", w).alias(f"fast_{l}") for l, w in LANG_PROFILES.items()],
        *[c.alias(f"slow_{l}") for l, c in arr_form.items()],
    )
    for r in both.collect():
        for lang in LANG_PROFILES:
            assert r[f"fast_{lang}"] == r[f"slow_{lang}"], (r["doc_id"], lang)
