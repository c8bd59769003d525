#!/usr/bin/env python
"""Per-branch sf1 attribution for t02_text_profile (r10 verdict ask #4).

t02 has been the worst sf1 cell every probe (ratio 5.56 at r8, 5.69 at
r10; every other cell ≤ 4.23) and was never decomposed — it is not a
tagged-union query, so bench.py's arm-price machinery (which restricts
on a `which` column) cannot price it. Its physical branches are:

  profile   — the wide per-doc projection: lang-id, quality, PII
              regexes, repetition, boilerplate columns (incl. the
              small suffix-frequency aggregate + broadcast flag join)
  tri       — the character-trigram lang-id columns ON TOP of profile
              (priced as profile_with_tri − profile_no_tri via the
              'tri' pseudo-arm gate)
  simhash   — token explode + per-bit majority vote groupBy
  winnow    — Rabin-Karp k-gram polynomial + min-per-window selection
  tfidf     — (doc, term-hash) tf aggregate + df join-back + argmax

This script times each branch in isolation at sf0.1 and the synthetic
sf1 (scale_probe's 10x corpus), interleaved best-of-N, and prints one
JSON line per branch plus a summary — the numbers behind SCALING.md's
"t02 sf1 decomposition" section. Branch relations are rebuilt here
from the same public helpers t02 uses; the FULL query is timed too so
the branch sum can be sanity-checked against it.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scale_probe import PROBE_DIR, SRC, build_probe_data  # noqa: E402

PASSES = 3


def branches(spark, sf_dir):
    from pyspark.sql import functions as F

    from wfc3_cte_monitor_spark.functions.dedup import simhash16
    from wfc3_cte_monitor_spark.functions.text import tokens, winnow_fingerprints
    from wfc3_cte_monitor_spark.plans.registry import load_all, set_arm_filter
    from wfc3_cte_monitor_spark.sources.catalog import load_table, spread

    specs = load_all()
    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")

    def full(_s=specs, _d=sf_dir):
        return _s["t02_text_profile"].fn(spark, _d)

    def full_no_tri():
        set_arm_filter({"t02_text_profile": {"__all_but__tri"}})
        try:
            return specs["t02_text_profile"].fn(spark, sf_dir)
        finally:
            set_arm_filter(None)

    def simhash():
        return simhash16(
            docs.select("doc_id", tokens("text").alias("t")), "doc_id", F.col("t")
        )

    def winnow():
        return winnow_fingerprints(docs.select("doc_id", "text"), "doc_id", "text")

    def tfidf():
        from wfc3_cte_monitor_spark.checkpointing import materialize
        from wfc3_cte_monitor_spark.functions.text import portable_hash64

        tft = materialize(
            docs.select("doc_id", F.explode(tokens("text")).alias("tok"))
            .where(F.col("tok") != "")
            .select("doc_id", portable_hash64("tok").alias("th"))
            .groupBy("doc_id", "th")
            .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
        )
        tdf = tft.groupBy("th").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
        tn = docs.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        return (
            tft.join(tdf, "th")
            .join(F.broadcast(tn))
            .select("doc_id", "th", F.expr("tf * ((n * 1000000) DIV df)").alias("s"))
            .groupBy("doc_id")
            .agg(F.max(F.struct("s", "th")).alias("m"))
            .select("doc_id", F.col("m.s").alias("w"), F.col("m.th").alias("t"))
        )

    return {
        "full": full,
        "full_no_tri": full_no_tri,
        "simhash": simhash,
        "winnow": winnow,
        "tfidf": tfidf,
    }


def main() -> None:
    from wfc3_cte_monitor_spark.session import get_spark

    build_probe_data()
    spark = get_spark("t02-sf1-arms")
    spark.sparkContext.setLogLevel("ERROR")
    par = spark.sparkContext.defaultParallelism
    (spark.range(par).repartition(par).mapInPandas(lambda it: it, "id long")
     .write.mode("overwrite").format("noop").save())

    samples: dict[tuple[str, str], list[float]] = {}
    for _ in range(PASSES):
        for sf_name, sf_dir in (("sf0.1", SRC), ("sf1", PROBE_DIR)):
            for bname, build in branches(spark, sf_dir).items():
                t0 = time.perf_counter()
                build().write.mode("overwrite").format("noop").save()
                el = time.perf_counter() - t0
                spark.sparkContext._jvm.System.gc()
                samples.setdefault((bname, sf_name), []).append(el)

    out = {}
    for bname in ("full", "full_no_tri", "simhash", "winnow", "tfidf"):
        b01 = min(samples[(bname, "sf0.1")])
        b1 = min(samples[(bname, "sf1")])
        out[bname] = {
            "sf0.1": round(b01, 2),
            "sf1": round(b1, 2),
            "ratio": round(b1 / b01, 2) if b01 else None,
            "passes_sf0.1": [round(x, 2) for x in samples[(bname, "sf0.1")]],
            "passes_sf1": [round(x, 2) for x in samples[(bname, "sf1")]],
        }
    # derived: the tri columns' marginal price at each scale
    out["tri_marginal"] = {
        sf: round(out["full"][sf] - out["full_no_tri"][sf], 2)
        for sf in ("sf0.1", "sf1")
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
