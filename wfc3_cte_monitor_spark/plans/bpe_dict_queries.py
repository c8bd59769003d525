"""The dictionary-form batched BPE trainer + frozen-dictionary
inference, oracle-gated (r10 verdict ask #1).

``t01_token_stats``'s 'mergeB' arm gates the batched trainer in its
h-EMBEDDED nid scheme — cross-engine traceable, but int64-bounded to 7
merge slots. The PRODUCTION form (``operators/bpe_batch.py``
``batched_bpe_train_dict``, reference parity anchor: the reference has
no tokenizer at all — this is part of the additive LLM-pipeline
surface) re-keys the corpus to dense dictionary ids and allocates
fresh new-token ids above the dictionary: unbounded merge capacity and
the true-BPE identity (a merged token is a NEW symbol the pair counter
can distinguish). Until this round it was tested only against the
pure-python witness; this query makes it carry a CORRECTNESS entry
like every other first-class capability, INCLUDING the frozen-
dictionary inference pass (``encode_with_dict``) over docs unseen at
training time.

Shape of the gate:

* train slice = even doc_ids (so inference genuinely sees OOV tokens);
* ``T03_ROUNDS × T03_M = 4 × 3 = 12`` merges — deliberately past the
  embedded scheme's 7-slot refusal, exercising exactly the capacity
  the dictionary form exists for;
* arms: 'dict' (dictionary summary: size + content/id-assignment
  fingerprint), 'vocab' (one row per applied merge), 'encode' (the
  training run's own encoded corpus, per-doc before/after lengths +
  sequence fingerprint), 'infer' (the frozen-artifact encode of the
  FULL corpus — per-doc lengths, OOV count, sequence fingerprint),
  'decode' (the id-space ROUNDTRIP: unmerge the inference output in
  reverse round order and gate per-doc that it reproduces the
  translated original exactly — encode is a bijection given the
  vocab, and both engines must agree it is lossless).

Scale shape (sf-independent argument): the dictionary build is one
corpus explode + distinct + ``salted_rank`` over order-range buckets
(no global window, no hot key); the translate pass is one posexplode +
one tok-equi-join against the vocabulary-sized dictionary (broadcast
while it fits, co-partitioned shuffle past the threshold) + one doc
re-group; each training round is ONE map-side-combined bigram-count
shuffle over injectively-packed bigints plus a row-local rewrite off a
1-row broadcast map; inference is ``rounds`` row-local passes. The one
driver-side scalar is the dictionary COUNT (the nid allocation base)
plus the 1-row vocab max(round) scan inside ``encode_with_dict`` —
both bounded by construction.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..checkpointing import materialize
from ..functions.text import portable_hash64, portable_hash64_sql, tokens, tokens_sql
from ..sources.catalog import load_table, spread
from .registry import register

T03_ROUNDS = 4  # training rounds gated
T03_M = 3       # batched merges/round — 12 total, past the embedded 7-slot bound
T03_TRAIN_MOD = 2  # train slice: doc_id % 2 == 0; odd docs are inference-only


def _t03_sql() -> str:
    from ..operators.bpe_batch import (
        batched_bpe_ctes_sql,
        bpe_dict_decode_ctes_sql,
        bpe_dict_encode_ctes_sql,
    )

    def fp_arr(col: str) -> str:
        return portable_hash64_sql(
            f"coalesce(array_to_string(list_transform({col},"
            " x -> CAST(x AS VARCHAR)), ','), '')"
        )
    return f"""
    WITH toks AS (
        SELECT doc_id, {tokens_sql('text')} AS t FROM documents
    ),
    ths AS (
        SELECT doc_id,
               list_transform(list_filter(t, x -> x <> ''),
                              x -> {portable_hash64_sql('x')}) AS th
        FROM toks
    ),
    thstr AS (SELECT doc_id, th FROM ths WHERE doc_id % {T03_TRAIN_MOD} = 0),
    {batched_bpe_ctes_sql('thstr', rounds=T03_ROUNDS, m=T03_M,
                          prefix='bd', dict_mode=True)},
    {bpe_dict_encode_ctes_sql('ths', rounds=T03_ROUNDS,
                              trainer_prefix='bd', prefix='bi')},
    {bpe_dict_decode_ctes_sql(f'biths{T03_ROUNDS}', rounds=T03_ROUNDS,
                              trainer_prefix='bd', prefix='bx')}
    SELECT 'dict' AS which, CAST(-1 AS BIGINT) AS doc_id,
           CAST(NULL AS INT) AS chunk_id,
           v.vb AS n_tokens, CAST(NULL AS BIGINT) AS n_after,
           CAST(NULL AS BIGINT) AS n_aux, f.dfp AS fp
    FROM bdvbc v, (SELECT bit_xor({portable_hash64_sql(
        "CAST(tok AS VARCHAR) || ':' || CAST(tid AS VARCHAR)")}) AS dfp
                   FROM bddict) f
    UNION ALL
    SELECT 'vocab', ar * {1 << 31} + br,
           CAST(-(round * {T03_M} + rnk) AS INT),
           cnt, CAST(rnk AS BIGINT), ar, nid
    FROM bdvocab
    UNION ALL
    SELECT 'encode', t0.doc_id, CAST(NULL AS INT),
           CAST(len(t0.th) AS BIGINT), CAST(len(te.th) AS BIGINT),
           CAST(NULL AS BIGINT), {fp_arr('te.th')}
    FROM thstr t0 JOIN bdths{T03_ROUNDS} te USING (doc_id)
    UNION ALL
    SELECT 'infer', t0.doc_id, CAST(NULL AS INT),
           CAST(len(t0.th) AS BIGINT), CAST(len(ti.th) AS BIGINT),
           CAST(len(list_filter(ti.th, x -> x < 0)) AS BIGINT),
           {fp_arr('ti.th')}
    FROM ths t0 JOIN biths{T03_ROUNDS} ti USING (doc_id)
    UNION ALL
    SELECT 'decode', t0.doc_id, CAST(NULL AS INT),
           CAST(len(dx.th) AS BIGINT),
           CAST(CASE WHEN dx.th = t0.th THEN 1 ELSE 0 END AS BIGINT),
           CAST(NULL AS BIGINT),
           {fp_arr('dx.th')}
    FROM biths0 t0 JOIN bxths{T03_ROUNDS} dx USING (doc_id)
    """


@register(
    "t03_bpe_dict_train",
    oracle=_t03_sql(),
    tags=("text", "tokenizer", "bpe", "dict"),
)
def t03_bpe_dict_train(spark, sf_dir):
    """Dictionary-form batched BPE: train 4 rounds × 3 merges on the
    even-doc_id half of the corpus (dense-id dictionary via salted_rank,
    fresh new-token ids above the vocab base — 12 merges, past the
    h-embedded scheme's 7-slot bound), then run the frozen-dictionary
    INFERENCE pass over the full corpus (odd docs carry genuinely
    unseen tokens → OOV_ID). Arms: 'dict' summary (size + content
    fingerprint pinning the dense-id assignment), 'vocab' (one row per
    merge: round/rank/members/count/nid), 'encode' (training corpus
    before/after lengths + encoded-sequence fingerprints), 'infer'
    (full-corpus lengths, OOV counts, fingerprints), 'decode' (the
    reverse-round unmerge roundtrip — per-doc lossless-match flag +
    decoded fingerprints). Cross-engine gate:
    the DuckDB twin is the dict-mode generated CTE chain
    (operators/bpe_batch.py batched_bpe_ctes_sql(dict_mode=True) +
    bpe_dict_encode_ctes_sql)."""
    from ..operators.bpe_batch import (
        OOV_ID,
        batched_bpe_train_dict,
        decode_with_dict,
        encode_with_dict,
        translate_corpus,
    )

    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    thd = materialize(
        docs.select(
            "doc_id",
            F.transform(
                F.filter(tokens("text"), lambda x: x != F.lit("")),
                lambda x: portable_hash64(x),
            ).alias("th"),
        )
    )
    train = thd.where(F.col("doc_id") % T03_TRAIN_MOD == 0)
    enc, vocab, dict_df = batched_bpe_train_dict(train, rounds=T03_ROUNDS, m=T03_M)
    # rounds intentionally omitted: derived from the vocab (the r10
    # ADVICE contract) — the gate exercises the derivation path.
    # materialized at the QUERY level: the encoded corpus feeds two
    # arms (infer + the decode roundtrip) — pay the lazy chain once
    inf = materialize(encode_with_dict(thd, dict_df, vocab), force=True)

    def _fp(col):
        return portable_hash64(
            F.coalesce(
                F.array_join(F.transform(col, lambda x: x.cast("string")), ","),
                F.lit(""),
            )
        )

    # per-row hash via the Column-form portable_hash64 (the SQL-string
    # form is DuckDB dialect — its '0x…' hex cast doesn't parse in
    # Spark), then one bit_xor reduction
    dict_arm = dict_df.select(
        portable_hash64(
            F.concat(
                F.col("tok").cast("string"), F.lit(":"), F.col("tid").cast("string")
            )
        ).alias("_h")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        F.expr("bit_xor(_h)").alias("fp"),
    ).select(
        F.lit("dict").alias("which"),
        F.lit(-1).cast("bigint").alias("doc_id"),
        F.lit(None).cast("int").alias("chunk_id"),
        "n_tokens",
        F.lit(None).cast("bigint").alias("n_after"),
        F.lit(None).cast("bigint").alias("n_aux"),
        "fp",
    )
    vocab_arm = vocab.select(
        F.lit("vocab").alias("which"),
        (F.col("ar") * (1 << 31) + F.col("br")).alias("doc_id"),
        (-(F.col("round") * T03_M + F.col("rnk"))).cast("int").alias("chunk_id"),
        F.col("cnt").alias("n_tokens"),
        F.col("rnk").cast("bigint").alias("n_after"),
        F.col("ar").alias("n_aux"),
        F.col("nid").alias("fp"),
    )
    encode_arm = (
        train.select("doc_id", F.size("th").cast("bigint").alias("_n0"))
        .join(enc, "doc_id")
        .select(
            F.lit("encode").alias("which"),
            "doc_id",
            F.lit(None).cast("int").alias("chunk_id"),
            F.col("_n0").alias("n_tokens"),
            F.size("th").cast("bigint").alias("n_after"),
            F.lit(None).cast("bigint").alias("n_aux"),
            _fp("th").alias("fp"),
        )
    )
    infer_arm = (
        thd.select("doc_id", F.size("th").cast("bigint").alias("_n0"))
        .join(inf, "doc_id")
        .select(
            F.lit("infer").alias("which"),
            "doc_id",
            F.lit(None).cast("int").alias("chunk_id"),
            F.col("_n0").alias("n_tokens"),
            F.size("th").cast("bigint").alias("n_after"),
            F.size(F.filter("th", lambda x: x < F.lit(0)))
            .cast("bigint")
            .alias("n_aux"),
            _fp("th").alias("fp"),
        )
    )
    # 'decode' arm: id-space roundtrip — unmerging the inference output
    # in reverse round order must reproduce the translated-with-OOV
    # original exactly (encode is a bijection given the vocab); the
    # per-doc match flag is value-gated, so both engines must agree the
    # roundtrip is lossless, not merely agree on a fingerprint
    dec = decode_with_dict(inf, vocab)
    tr0 = translate_corpus(thd, dict_df, oov_id=OOV_ID)
    decode_arm = (
        tr0.select("doc_id", F.col("th").alias("_t0"))
        .join(dec, "doc_id")
        .select(
            F.lit("decode").alias("which"),
            "doc_id",
            F.lit(None).cast("int").alias("chunk_id"),
            F.size("th").cast("bigint").alias("n_tokens"),
            F.when(F.col("th") == F.col("_t0"), 1)
            .otherwise(0)
            .cast("bigint")
            .alias("n_after"),
            F.lit(None).cast("bigint").alias("n_aux"),
            _fp("th").alias("fp"),
        )
    )
    return (
        dict_arm.unionAll(vocab_arm)
        .unionAll(encode_arm)
        .unionAll(infer_arm)
        .unionAll(decode_arm)
    )
