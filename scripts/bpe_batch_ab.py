#!/usr/bin/env python
"""Batched-BPE m-scaling A/B (r8 verdict ask #5, recorded in r10).

Times the SAME 6-merge vocab-build budget through the batched trainer
(`operators/bpe_batch.batched_bpe_train`) at three batch widths:

  m=1 x 6 rounds   — degenerates to the sequential trainer's job shape
  m=3 x 2 rounds   — the gated 'mergeB' configuration
  m=6 x 1 round    — one ranking, one positional pass

The claim under test: wall scales with ROUND count (each round = one
corpus bigram-count shuffle + one corpus rewrite), not merge count —
i.e. a vocab of V merges costs O(V/m) jobs. Caveat recorded with the
numbers: the three configs pick different winner SETS (m=1 re-ranks
after every merge and may pick pairs that overlap earlier winners;
m=6 picks 6 pairwise-disjoint pairs from one ranking), so this is a
jobs-shape A/B at equal merge budget, not an identical-output A/B —
the identical-output proof is tests/test_bpe_batch.py.

Usage: python scripts/bpe_batch_ab.py   (env: SPARK_GRAFT_SF_DIR, _CPUS)
Prints one JSON line; paste the numbers into SCALING.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from wfc3_cte_monitor_spark.session import get_spark  # noqa: E402
from wfc3_cte_monitor_spark.sources.catalog import load_table  # noqa: E402
from wfc3_cte_monitor_spark.operators.bpe_batch import batched_bpe_train  # noqa: E402
from wfc3_cte_monitor_spark.checkpointing import materialize  # noqa: E402
from wfc3_cte_monitor_spark.functions.text import portable_hash64, tokens  # noqa: E402

PASSES = 3  # best-of


def main() -> None:
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("bpe-batch-ab", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf, "documents")
    # the same token-hash relation shape t01 trains on, materialized
    # OUTSIDE the timed region (both configs consume the identical input)
    thd = materialize(
        docs.select(
            "doc_id",
            F.transform(
                F.filter(tokens("text"), lambda x: x != F.lit("")),
                lambda x: portable_hash64(x),
            ).alias("th"),
        )
    )
    thd.count()  # force the materialization before timing

    def run(rounds: int, m: int) -> tuple[float, int, int]:
        best = float("inf")
        vrows = crows = 0
        for _ in range(PASSES):
            t0 = time.perf_counter()
            corpus, vocab = batched_bpe_train(thd, rounds=rounds, m=m)
            # consume both outputs (vocab rows + encoded-corpus length sum)
            vrows = vocab.count()
            crows = corpus.select(F.sum(F.size("th"))).collect()[0][0]
            best = min(best, time.perf_counter() - t0)
        return round(best, 3), vrows, crows

    out = {"metric": "bpe_batch_m_scaling", "unit": "sec", "sf": sf, "passes": PASSES}
    for rounds, m in ((6, 1), (2, 3), (1, 6)):
        sec, vrows, toks = run(rounds, m)
        out[f"m{m}_r{rounds}"] = {"sec": sec, "vocab_rows": vrows, "total_tokens": toks}

    # Dictionary-form capacity run: 24 merges (3 rounds x m=8) — a build
    # the h-embedded scheme's 7-slot bound refuses outright. Timed with
    # the re-key (dictionary build + corpus translation) INSIDE the
    # measurement: that is the honest one-off cost a production vocab
    # build pays once before its O(vocab/m) rounds.
    from wfc3_cte_monitor_spark.operators.bpe_batch import batched_bpe_train_dict

    best = float("inf")
    vrows = toks = 0
    for _ in range(PASSES):
        t0 = time.perf_counter()
        corpus, vocab, _d = batched_bpe_train_dict(thd, rounds=3, m=8)
        vrows = vocab.count()
        toks = corpus.select(F.sum(F.size("th"))).collect()[0][0]
        best = min(best, time.perf_counter() - t0)
    out["dict_m8_r3"] = {
        "sec": round(best, 3),
        "vocab_rows": vrows,
        "total_tokens": toks,
        "note": "incl. dictionary build + corpus translation (the re-key)",
    }

    # Inference path: encode the whole corpus with the FROZEN artifacts
    # (dictionary + vocab from the last dict training run above) — the
    # per-shard cost a production pipeline pays after training once.
    from wfc3_cte_monitor_spark.operators.bpe_batch import encode_with_dict

    corpus, vocab, dict_df = batched_bpe_train_dict(thd, rounds=3, m=8)
    vocab = vocab.cache(); vocab.count()
    dict_df = dict_df.cache(); dict_df.count()
    best = float("inf")
    for _ in range(PASSES):
        t0 = time.perf_counter()
        enc = encode_with_dict(thd, dict_df, vocab, rounds=3)
        toks = enc.select(F.sum(F.size("th"))).collect()[0][0]
        best = min(best, time.perf_counter() - t0)
    out["encode_frozen"] = {
        "sec": round(best, 3),
        "total_tokens": toks,
        "note": "one full-corpus inference pass with the frozen dict+vocab",
    }
    print(json.dumps(out, separators=(",", ":")))
    spark.stop()


if __name__ == "__main__":
    main()
