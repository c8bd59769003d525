#!/usr/bin/env python
"""Dict-trainer O(V/m) probe (r11 verdict ask #6).

The batched trainer's scale claim is that a vocabulary of V merges
costs O(V/m) Spark jobs — wall grows with ROUNDS (V/m), not with the
merge count V. The r10 m-scaling A/B measured this only to 7 merges
(the embedded scheme's int64 slot bound); the dictionary form has
unbounded capacity but had only ever run 12 merges. This probe runs
``batched_bpe_train_dict`` at sf0.1 over the same token-hash corpus
t01 trains on (doc_id % 2 == 0 slice of documents) at:

  (rounds=2, m=6)  -> 12 merges  (baseline, 2 rounds)
  (rounds=8, m=6)  -> 48 merges  (the ask's cell: 4x rounds, 4x merges)
  (rounds=4, m=12) -> 48 merges  (same merges, HALF the rounds)

If wall is proportional to rounds: (8,6) reads ~4x the (2,6) wall and
~2x the (4,12) wall, while (4,12) and (8,6) deliver the SAME vocab
size. Each cell is timed best-of-PASSES, interleaved, forcing full
execution with a noop write of the encoded corpus + the vocab count.
One JSON line per cell, then a summary — the numbers behind
SCALING.md's "dict trainer rounds-scaling" row.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PASSES = 3
CELLS = [(2, 6), (8, 6), (4, 12)]
TRAIN_MOD = 2  # t01's training slice (T01D_TRAIN_MOD)


def main() -> None:
    from pyspark.sql import functions as F

    from wfc3_cte_monitor_spark.functions.text import portable_hash64, tokens
    from wfc3_cte_monitor_spark.operators.bpe_batch import batched_bpe_train_dict
    from wfc3_cte_monitor_spark.checkpointing import materialize
    from wfc3_cte_monitor_spark.session import get_spark
    from wfc3_cte_monitor_spark.sources.catalog import load_table, spread

    spark = get_spark("bpe-dict-rounds-scaling")
    docs = spread(load_table(spark, SRC, "documents"), "doc_id")
    # the same tokenize+hash relation t01 trains on, materialized so
    # every cell starts from identical executor-local input (the probe
    # prices the TRAINER, not the tokenize pass)
    thd = materialize(
        docs.select(
            "doc_id",
            F.transform(
                F.filter(tokens("text"), lambda x: x != F.lit("")),
                lambda x: portable_hash64(x),
            ).alias("th"),
        ),
        force=True,
    )
    train = thd.where(F.col("doc_id") % TRAIN_MOD == 0)
    train.write.mode("overwrite").format("noop").save()  # warm input blocks

    samples: dict[tuple[int, int], list[float]] = {c: [] for c in CELLS}
    vocab_sizes: dict[tuple[int, int], int] = {}
    for p in range(PASSES):
        for rounds, m in CELLS:
            t0 = time.perf_counter()
            enc, vocab, _dict = batched_bpe_train_dict(train, rounds=rounds, m=m)
            enc.write.mode("overwrite").format("noop").save()
            nv = vocab.count()
            el = time.perf_counter() - t0
            samples[(rounds, m)].append(el)
            vocab_sizes[(rounds, m)] = nv
            spark.sparkContext._jvm.System.gc()
            print(
                json.dumps(
                    {
                        "pass": p,
                        "rounds": rounds,
                        "m": m,
                        "merges_applied": nv,
                        "wall_s": round(el, 3),
                    }
                ),
                flush=True,
            )

    best = {c: min(s) for c, s in samples.items()}
    b26 = best[(2, 6)]
    summary = {
        "metric": "bpe_dict_rounds_scaling",
        "sf_dir": SRC,
        "passes": PASSES,
        "best_s": {f"r{r}_m{m}": round(v, 3) for (r, m), v in best.items()},
        "merges": {f"r{r}_m{m}": vocab_sizes[(r, m)] for (r, m) in CELLS},
        "wall_ratio_r8m6_vs_r2m6": round(best[(8, 6)] / b26, 2),
        "wall_ratio_r8m6_vs_r4m12": round(best[(8, 6)] / best[(4, 12)], 2),
        "claim": "wall tracks rounds (V/m), not merges V: expect ~4x and ~2x",
    }
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
