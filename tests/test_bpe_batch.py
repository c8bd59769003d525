"""Batched-merge BPE trainer (operators/bpe_batch) — the invariants its
docstring promises, each proved against multiple engines:

  1. batched application ≡ applying the same winner set ONE MEMBER AT A
     TIME, in any order (the disjointness argument);
  2. m=1 degenerates to the gated sequential trainer's exact winner /
     apply semantics (same (cnt DESC, h, mx) tiebreak, same
     iteration-indexed nid);
  3. the empty-batch identity (no valid pair → the pass is a no-op,
     not a corpus wipe);
  4. Spark ≡ pure-python twin ≡ DuckDB CTE twin on typical, chained,
     residue-colliding, and degenerate corpora.

Reference parity: the reference repo has no tokenizer trainer — this is
part of the additive LLM-pipeline layer (SURVEY.md §2 'beyond').
"""

from __future__ import annotations

import random

import duckdb
import pytest

from wfc3_cte_monitor_spark.operators.bpe_batch import (
    NID_BASE,
    PAIR_PACK,
    apply_merge_batch,
    batched_bpe_ctes_sql,
    batched_bpe_py,
    batched_bpe_train,
)

# --------------------------------------------------------------- corpora
# C1: seeded-random corpus over a small alphabet INCLUDING a residue
# collision (77 and 77 + 2^30 match identically in merge semantics —
# both twins key on residues, the collision must not diverge them).
_rng = random.Random(20260816)
_ALPHABET = [3, 5, 9, 12, 77, 77 + PAIR_PACK, 104, 200, 512, 900, 1300, 4096]
C1 = {
    d: [_rng.choice(_ALPHABET) for _ in range(_rng.randrange(0, 41))]
    for d in range(1, 31)
}

# C3: adversarial chains/overlaps for the positional one-pass apply.
C3 = {
    101: [3, 5, 3, 5, 3, 5, 3, 5],   # abababab
    102: [3, 3, 5, 5],               # aabb
    103: [9, 12, 9, 12, 9, 12],      # xyxyxy
    104: [5, 3, 5, 5],               # suffix repeats
    105: [3, 5, 5, 3, 5],            # merge then straggler member
    106: [77, 77 + PAIR_PACK, 5],    # residue-colliding adjacent pair
}

# C2: degenerate — no non-self pair anywhere (empty docs, singletons,
# constant runs whose only bigram is a self-pair).
C2 = {
    201: [],
    202: [7],
    203: [9, 9, 9, 9],
    204: [4096],
    205: [12, 12],
}


def _spark_df(spark, docs):
    return spark.createDataFrame(
        [(d, t) for d, t in sorted(docs.items())],
        "doc_id long, th array<bigint>",
    )


def _spark_train(spark, docs, rounds, m):
    enc, vocab = batched_bpe_train(_spark_df(spark, docs), rounds=rounds, m=m)
    enc_d = {r["doc_id"]: list(r["th"]) for r in enc.collect()}
    voc = sorted(
        (r["round"], r["rnk"], r["ar"], r["br"], r["nid"], r["cnt"])
        for r in vocab.collect()
    )
    return enc_d, voc


def _duck_train(docs, rounds, m):
    con = duckdb.connect()
    vals = ", ".join(
        f"({d}, {list(map(int, t))}::BIGINT[])" for d, t in sorted(docs.items())
    ) or "(0, []::BIGINT[]) LIMIT 0"
    ctes = batched_bpe_ctes_sql("ths0", rounds=rounds, m=m)
    sql = f"""
    WITH ths0 AS (SELECT * FROM (VALUES {vals}) AS t(doc_id, th)),
    {ctes}
    SELECT doc_id, th FROM bbths{rounds}
    """
    enc_d = {r[0]: list(r[1]) for r in con.execute(sql).fetchall()}
    vsql = f"""
    WITH ths0 AS (SELECT * FROM (VALUES {vals}) AS t(doc_id, th)),
    {ctes}
    SELECT round, rnk, ar, br, nid, cnt FROM bbvocab
    """
    voc = sorted(tuple(r) for r in con.execute(vsql).fetchall())
    return enc_d, voc


def _py_train(docs, rounds, m):
    enc_d, voc = batched_bpe_py(docs, rounds=rounds, m=m)
    return enc_d, sorted(voc)


def _apply_one_pair_py(docs, ar, br, nid):
    """Greedy left-to-right application of ONE merge pair — the
    sequential trainer's apply step, as a plain-python reference."""
    out = {}
    for d, t in docs.items():
        res, i = [], 0
        while i < len(t):
            if (
                i + 1 < len(t)
                and t[i] % PAIR_PACK == ar
                and t[i + 1] % PAIR_PACK == br
            ):
                res.append(nid)
                i += 2
            else:
                res.append(t[i])
                i += 1
        out[d] = res
    return out


def _sequential_trainer_py(docs, k):
    """The gated t01 trainer's semantics, minimal python form: per
    iteration w (1-based) pick THE single winner by (cnt DESC, h, mx)
    among non-self pairs, nid = h + w·2^60, apply greedily, recount. An
    iteration with no valid pair applies the identity (the LEFT-JOIN
    degenerate guard)."""
    cur = {d: list(t) for d, t in docs.items()}
    vocab = []
    for w in range(1, k + 1):
        counts: dict[tuple, int] = {}
        for t in cur.values():
            for a, b in zip(t, t[1:]):
                key = ((a % PAIR_PACK) * PAIR_PACK + b % PAIR_PACK, a ^ b)
                counts[key] = counts.get(key, 0) + 1
        cands = sorted(
            (
                (h, mx, c)
                for (h, mx), c in counts.items()
                if h // PAIR_PACK != h % PAIR_PACK
            ),
            key=lambda x: (-x[2], x[0], x[1]),
        )
        if not cands:
            continue
        h, mx, c = cands[0]
        ar, br = h // PAIR_PACK, h % PAIR_PACK
        nid = h + w * NID_BASE
        vocab.append((w, ar, br, nid, c))
        cur = _apply_one_pair_py(cur, ar, br, nid)
    return cur, vocab


# ----------------------------------------------------------------- tests
@pytest.mark.parametrize("rounds,m", [(2, 3), (3, 2), (1, 7), (2, 1)])
def test_three_engines_agree(spark, rounds, m):
    docs = {**C1, **C3}
    py_enc, py_voc = _py_train(docs, rounds, m)
    sp_enc, sp_voc = _spark_train(spark, docs, rounds, m)
    assert sp_voc == py_voc
    assert sp_enc == py_enc
    dk_enc, dk_voc = _duck_train(docs, rounds, m)
    assert dk_voc == py_voc
    assert dk_enc == py_enc


def test_empty_batch_identity(spark):
    for rounds, m in [(1, 4), (2, 2)]:
        py_enc, py_voc = _py_train(C2, rounds, m)
        assert py_voc == []
        assert py_enc == C2
        sp_enc, sp_voc = _spark_train(spark, C2, rounds, m)
        assert sp_voc == []
        assert sp_enc == C2
        dk_enc, dk_voc = _duck_train(C2, rounds, m)
        assert dk_voc == []
        assert dk_enc == C2


def test_batched_application_equals_sequential_any_order(spark):
    """The module's core claim: ONE positional pass over a pairwise-
    disjoint batch ≡ applying its members one at a time — in any
    order. Winner set from the python twin's round 0; application
    cross-checked Spark-batch vs python-sequential (forward AND
    reversed member order)."""
    docs = {**C1, **C3}
    _, voc = _py_train(docs, 1, 4)
    members = [(ar, br, nid) for (_r, _j, ar, br, nid, _c) in voc]
    assert len(members) >= 2, "fixture must exercise a real batch"
    # sequential applications, both orders
    seq_fwd = dict(docs)
    for ar, br, nid in members:
        seq_fwd = _apply_one_pair_py(seq_fwd, ar, br, nid)
    seq_rev = dict(docs)
    for ar, br, nid in reversed(members):
        seq_rev = _apply_one_pair_py(seq_rev, ar, br, nid)
    assert seq_fwd == seq_rev, "disjoint members must commute"
    # one batched Spark pass over the same winner set
    batch = spark.createDataFrame(members, "ar long, br long, nid long")
    got = {
        r["doc_id"]: list(r["th"])
        for r in apply_merge_batch(_spark_df(spark, docs), batch).collect()
    }
    assert got == seq_fwd


def test_m1_degenerates_to_sequential_trainer(spark):
    """m=1 must reproduce the gated trainer's recurrence exactly:
    same winner per iteration (same tiebreak), same nid indexing
    (batched r·m+rnk = (r+1)·1 ≡ sequential w), same greedy apply."""
    for docs in (C1, C3, {**C1, **C3}):
        seq_enc, seq_voc = _sequential_trainer_py(docs, k=3)
        py_enc, py_voc = _py_train(docs, 3, 1)
        assert [(r + 1, ar, br, nid, c) for (r, _j, ar, br, nid, c) in py_voc] == seq_voc
        assert py_enc == seq_enc
    sp_enc, sp_voc = _spark_train(spark, {**C1, **C3}, 3, 1)
    seq_enc, seq_voc = _sequential_trainer_py({**C1, **C3}, k=3)
    assert [(r + 1, ar, br, nid, c) for (r, _j, ar, br, nid, c) in sp_voc] == seq_voc
    assert sp_enc == seq_enc


def test_batch_members_pairwise_disjoint():
    """Every round's batch must hold pairwise-disjoint member residues —
    the precondition the one-pass apply's correctness proof stands on."""
    _, voc = _py_train({**C1, **C3}, 1, 7)
    by_round: dict[int, list] = {}
    for r, _j, ar, br, _nid, _c in voc:
        by_round.setdefault(r, []).extend([ar, br])
    assert by_round, "fixture must produce at least one non-empty batch"
    for r, residues in by_round.items():
        assert len(residues) == len(set(residues)), (r, residues)


def test_rejects_bad_params(spark):
    df = _spark_df(spark, C3)
    with pytest.raises(ValueError):
        batched_bpe_train(df, rounds=0, m=2)
    with pytest.raises(ValueError):
        batched_bpe_train(df, rounds=1, m=0)
    with pytest.raises(ValueError):
        batched_bpe_ctes_sql("x", rounds=0, m=2)
    with pytest.raises(ValueError):
        batched_bpe_ctes_sql("x", rounds=1, m=0)
    # the 7-slot nid bound is ENFORCED in all three twins (slot 8's
    # nid = 8*2^60 + h overflows int64 — DuckDB errors, ANSI Spark too)
    with pytest.raises(ValueError, match="slot"):
        batched_bpe_train(df, rounds=2, m=4)
    with pytest.raises(ValueError, match="slot"):
        batched_bpe_ctes_sql("x", rounds=1, m=8)
    with pytest.raises(ValueError, match="slot"):
        batched_bpe_py(C3, rounds=4, m=2)


# ------------------------------------------------- dictionary-id form
# (batched_bpe_train_dict — the production re-key path the h-embedded
# scheme's NID_SLOTS_MAX bound points at; fresh dense new-token ids,
# true-BPE identity, no slot cap.)

from wfc3_cte_monitor_spark.operators.bpe_batch import (  # noqa: E402
    DICT_PACK,
    NID_SLOTS_MAX,
    batched_bpe_train_dict,
    dense_token_ids,
    translate_corpus,
)


def _py_dict(docs):
    """python twin of dense_token_ids: distinct tokens sorted ascending
    → id 0..V-1."""
    toks = sorted({t for ts in docs.values() for t in ts})
    return {t: i for i, t in enumerate(toks)}


def test_dense_ids_and_translate_roundtrip(spark):
    docs = {**C1, **C2, **C3}
    df = _spark_df(spark, docs)
    d = {r["tok"]: r["tid"] for r in dense_token_ids(df).collect()}
    assert d == _py_dict(docs)  # bijective, dense, value-ordered
    tr = {r["doc_id"]: list(r["th"]) for r in translate_corpus(df, dense_token_ids(df)).collect()}
    assert set(tr) == set(docs)  # empty docs survive
    inv = {i: t for t, i in d.items()}
    for doc, ts in docs.items():
        assert [inv[i] for i in tr[doc]] == ts  # lossless round-trip


@pytest.mark.parametrize("rounds,m", [(3, 2), (4, 3)])  # (4,3)=12 > 7 slots
def test_dict_mode_matches_python_witness(spark, rounds, m):
    docs = {**C1, **C3}
    d = _py_dict(docs)
    tdocs = {doc: [d[t] for t in ts] for doc, ts in docs.items()}
    py_enc, py_voc = batched_bpe_py(
        tdocs, rounds, m, pack=DICT_PACK, vocab_base=len(d)
    )
    enc, vocab, dict_df = batched_bpe_train_dict(
        _spark_df(spark, docs), rounds=rounds, m=m
    )
    sp_enc = {r["doc_id"]: list(r["th"]) for r in enc.collect()}
    sp_voc = sorted(
        (r["round"], r["rnk"], r["ar"], r["br"], r["nid"], r["cnt"])
        for r in vocab.collect()
    )
    assert sp_voc == sorted(py_voc)
    assert sp_enc == py_enc
    # fresh ids: every nid above the dictionary, inside the slot range
    v = len(d)
    assert all(v <= row[4] < v + rounds * m for row in sp_voc)


def test_dict_single_round_equals_embedded_winners(spark):
    """Where the two schemes coincide (ONE round — no merged token can
    re-enter the pair counts), the winner SETS resolve to the same
    token pairs. Collision-free alphabet, distinct winner counts (the
    tiebreak h differs across schemes, so equal counts could legally
    order differently)."""
    docs = {
        1: [1, 2] * 10,   # (1,2) x 10 … top
        2: [3, 4] * 7,    # (3,4) x 7  … second
        3: [5, 6] * 3,
        4: [7, 8] * 2,
    }
    m = 2
    _, emb_voc = _spark_train(spark, docs, rounds=1, m=m)
    emb_pairs = [(row[2], row[3]) for row in emb_voc]  # residues == tokens here
    enc, vocab, dict_df = batched_bpe_train_dict(_spark_df(spark, docs), rounds=1, m=m)
    inv = {r["tid"]: r["tok"] for r in dict_df.collect()}
    dict_pairs = [
        (inv[r["ar"]], inv[r["br"]])
        for r in sorted(vocab.collect(), key=lambda r: r["rnk"])
    ]
    assert dict_pairs == emb_pairs == [(1, 2), (3, 4)]


def test_dict_mode_capacity_beyond_embedded_slots(spark):
    """12 merge slots: the embedded scheme REFUSES (int64 bound), the
    dictionary scheme builds the vocab."""
    docs = {**C1, **C3}
    with pytest.raises(ValueError, match="slot"):
        batched_bpe_train(_spark_df(spark, docs), rounds=4, m=3)
    enc, vocab, _ = batched_bpe_train_dict(_spark_df(spark, docs), rounds=4, m=3)
    rows = vocab.collect()
    assert len(rows) > NID_SLOTS_MAX  # more merges than the embedded cap
    assert enc.count() == len(docs)


def test_dict_rejects_bad_params(spark):
    df = _spark_df(spark, C3)
    with pytest.raises(ValueError):
        batched_bpe_train_dict(df, rounds=0, m=2)
    with pytest.raises(ValueError):
        batched_bpe_train_dict(df, rounds=1, m=0)


@pytest.mark.parametrize("seed", [1, 2, 3, 4, 5])
def test_dict_mode_randomized_seeds(spark, seed):
    """Dict-mode Spark ≡ python witness across independent random
    corpora (beyond the single seeded C1 fixture): alphabet, doc count,
    doc lengths and merge budget all vary with the seed; every budget
    exceeds the embedded scheme's 7-slot bound at seed >= 3."""
    rng = random.Random(987_000 + seed)
    alphabet = rng.sample(range(1, 100_000), rng.randrange(6, 16))
    docs = {
        d: [rng.choice(alphabet) for _ in range(rng.randrange(0, 30))]
        for d in range(rng.randrange(5, 25))
    }
    rounds, m = (2, 3) if seed < 3 else (rng.randrange(3, 5), rng.randrange(3, 5))
    d = _py_dict(docs)
    tdocs = {doc: [d[t] for t in ts] for doc, ts in docs.items()}
    py_enc, py_voc = batched_bpe_py(tdocs, rounds, m, pack=DICT_PACK, vocab_base=len(d))
    enc, vocab, _ = batched_bpe_train_dict(_spark_df(spark, docs), rounds=rounds, m=m)
    assert {r["doc_id"]: list(r["th"]) for r in enc.collect()} == py_enc
    assert sorted(
        (r["round"], r["rnk"], r["ar"], r["br"], r["nid"], r["cnt"])
        for r in vocab.collect()
    ) == sorted(py_voc)


# ---------------------------------------------- frozen-dictionary encode
from wfc3_cte_monitor_spark.operators.bpe_batch import (  # noqa: E402
    OOV_ID,
    encode_with_dict,
)


def _py_encode_with_dict(docs, d, vocab_rows, rounds):
    """python witness for encode_with_dict: translate with OOV, then
    apply each round's (disjoint) pair batch greedily in round order."""
    cur = {doc: [d.get(t, OOV_ID) for t in ts] for doc, ts in docs.items()}
    by_round = {}
    for (r, _j, ar, br, nid, _c) in vocab_rows:
        by_round.setdefault(r, {})[ar] = (br, nid)
    for r in range(rounds):
        pairs = by_round.get(r, {})
        nxt = {}
        for doc, t in cur.items():
            out, i = [], 0
            while i < len(t):
                hit = pairs.get(t[i])
                if hit is not None and i + 1 < len(t) and t[i + 1] == hit[0]:
                    out.append(hit[1])
                    i += 2
                else:
                    out.append(t[i])
                    i += 1
            nxt[doc] = out
        cur = nxt
    return cur


def test_encode_with_dict_self_consistent(spark):
    """Encoding the TRAINING corpus with the frozen artifacts must equal
    the training run's own encoded output."""
    docs = {**C1, **C3}
    rounds, m = 3, 2
    enc, vocab, dict_df = batched_bpe_train_dict(_spark_df(spark, docs), rounds=rounds, m=m)
    trained = {r["doc_id"]: list(r["th"]) for r in enc.collect()}
    re_enc = encode_with_dict(_spark_df(spark, docs), dict_df, vocab, rounds=rounds)
    assert {r["doc_id"]: list(r["th"]) for r in re_enc.collect()} == trained


def test_encode_with_dict_new_docs_and_oov(spark):
    """The inference path on UNSEEN docs: OOV tokens ride through as
    OOV_ID, known pairs still merge; cross-checked against the python
    witness. 999983 and 777777 never appear in the training corpus."""
    docs = {**C1, **C3}
    rounds, m = 2, 3
    _enc, vocab, dict_df = batched_bpe_train_dict(_spark_df(spark, docs), rounds=rounds, m=m)
    d = _py_dict(docs)
    vocab_rows = sorted(
        (r["round"], r["rnk"], r["ar"], r["br"], r["nid"], r["cnt"])
        for r in vocab.collect()
    )
    new_docs = {
        901: [3, 5, 999983, 3, 5],        # known pair around an OOV token
        902: [999983, 777777],            # all-OOV
        903: [],                          # empty doc
        904: [9, 12, 9, 12, 777777, 9, 12],
        905: [77, 77 + PAIR_PACK, 5],     # the residue-colliding fixture
    }
    got = {
        r["doc_id"]: list(r["th"])
        for r in encode_with_dict(_spark_df(spark, new_docs), dict_df, vocab, rounds=rounds).collect()
    }
    want = _py_encode_with_dict(new_docs, d, vocab_rows, rounds)
    assert got == want
    assert got[902] == [OOV_ID, OOV_ID]  # OOV rides through verbatim
    assert got[903] == []


def test_encode_with_dict_rounds_contract(spark):
    """r10 ADVICE: an explicit `rounds` smaller than the vocab's round
    count silently under-encoded (later merge rounds skipped with no
    error). Now: rounds=None derives max(round)+1 from the vocab,
    an under-covering explicit value raises, an over-covering one
    stays a harmless identity no-op."""
    docs = {**C1, **C3}
    rounds, m = 3, 2
    _enc, vocab, dict_df = batched_bpe_train_dict(
        _spark_df(spark, docs), rounds=rounds, m=m
    )
    derived = {
        r["doc_id"]: list(r["th"])
        for r in encode_with_dict(_spark_df(spark, docs), dict_df, vocab).collect()
    }
    explicit = {
        r["doc_id"]: list(r["th"])
        for r in encode_with_dict(
            _spark_df(spark, docs), dict_df, vocab, rounds=rounds
        ).collect()
    }
    assert derived == explicit
    over = {
        r["doc_id"]: list(r["th"])
        for r in encode_with_dict(
            _spark_df(spark, docs), dict_df, vocab, rounds=rounds + 2
        ).collect()
    }
    assert over == explicit  # extra rounds: empty batch -> identity
    import pytest as _pytest

    with _pytest.raises(ValueError, match="does not cover"):
        encode_with_dict(_spark_df(spark, docs), dict_df, vocab, rounds=rounds - 1)
    # r11 ADVICE: an explicit TRUSTED rounds (validate_rounds=False)
    # skips the eager vocab scan — the builder stays lazy — and must
    # encode identically to the validated path
    trusted = {
        r["doc_id"]: list(r["th"])
        for r in encode_with_dict(
            _spark_df(spark, docs), dict_df, vocab,
            rounds=rounds, validate_rounds=False,
        ).collect()
    }
    assert trusted == explicit
    from wfc3_cte_monitor_spark.operators.bpe_batch import decode_with_dict

    enc_df = encode_with_dict(_spark_df(spark, docs), dict_df, vocab)
    dec_trusted = {
        r["doc_id"]: list(r["th"])
        for r in decode_with_dict(
            enc_df, vocab, rounds=rounds, validate_rounds=False
        ).collect()
    }
    dec_derived = {
        r["doc_id"]: list(r["th"])
        for r in decode_with_dict(enc_df, vocab).collect()
    }
    assert dec_trusted == dec_derived


def test_dense_token_ids_with_count_returns_count_explicitly(spark):
    """r11 ADVICE: the vocabulary count used to ride back on the
    relation as a monkey-patched attribute that any intermediate
    transformation silently dropped. The tuple form is the contract:
    count present when the adaptive-bucket path counted (n_buckets
    None), None when an explicit n_buckets made counting unnecessary;
    the relation itself is unchanged either way."""
    from wfc3_cte_monitor_spark.operators.bpe_batch import (
        dense_token_ids,
        dense_token_ids_with_count,
    )

    df = _spark_df(spark, C1)
    rel, v = dense_token_ids_with_count(df)
    distinct_toks = {t for th in C1.values() for t in th}
    assert v == len(distinct_toks)
    assert rel.count() == v
    rel2, v2 = dense_token_ids_with_count(df, n_buckets=4)
    assert v2 is None
    got = {(r["tok"], r["tid"]) for r in rel2.collect()}
    assert got == {(r["tok"], r["tid"]) for r in rel.collect()}
    # the convenience wrapper returns just the relation
    assert {(r["tok"], r["tid"]) for r in dense_token_ids(df).collect()} == got


def test_dict_mode_sql_twin_matches_python_witness():
    """The dict-mode generated CTE chain (batched_bpe_ctes_sql with
    dict_mode=True + bpe_dict_encode_ctes_sql) must reproduce the
    python dict-mode witness end-to-end: dense dictionary (ordered by
    token value), vocab (fresh nids above the vocab base), training
    encode, and the frozen-dictionary inference pass over docs with
    genuinely unseen (OOV) tokens. DuckDB-only — the Spark side is
    cross-checked by t01_token_stats' dictD/mergeD/encodeD/inferD/
    decodeD oracle-gated arms (plans/bpe_dict_queries.py; the
    standalone t03 query was folded into t01 under the 50-query
    driver cap)."""
    import duckdb

    from wfc3_cte_monitor_spark.operators.bpe_batch import (
        batched_bpe_ctes_sql,
        bpe_dict_encode_ctes_sql,
    )

    train = {
        0: [3, 5, 3, 5, 9, 12, 9, 12, 3, 5],
        2: [9, 12, 9, 12, 7, 7, 7],
        4: [3, 5, 7, 9, 12],
        6: [],
    }
    full = dict(train)
    full.update({
        1: [3, 5, 999983, 3, 5],
        3: [999983, 777777],
        5: [],
        7: [12, 9, 12, 9, 3, 5, 3, 5, 3, 5],
    })
    rounds, m = 4, 3

    con = duckdb.connect()
    con.execute("CREATE TABLE thstr (doc_id BIGINT, th BIGINT[])")
    for d, t in train.items():
        con.execute("INSERT INTO thstr VALUES (?, ?)", [d, t])
    con.execute("CREATE TABLE thsall (doc_id BIGINT, th BIGINT[])")
    for d, t in full.items():
        con.execute("INSERT INTO thsall VALUES (?, ?)", [d, t])
    sql = f"""WITH {batched_bpe_ctes_sql('thstr', rounds=rounds, m=m,
                                          prefix='bd', dict_mode=True)},
        {bpe_dict_encode_ctes_sql('thsall', rounds=rounds,
                                  trainer_prefix='bd', prefix='bi')}
        SELECT 'v', round, rnk, ar, br, nid, cnt, NULL FROM bdvocab
        UNION ALL SELECT 'e', doc_id, NULL, NULL, NULL, NULL, NULL, th
        FROM bdths{rounds}
        UNION ALL SELECT 'i', doc_id, NULL, NULL, NULL, NULL, NULL, th
        FROM biths{rounds}
        UNION ALL SELECT 'd', tid, NULL, tok, NULL, NULL, NULL, NULL
        FROM bddict"""
    rows = con.execute(sql).fetchall()
    dvocab = sorted(r[1:7] for r in rows if r[0] == "v")
    denc = {r[1]: list(r[7]) for r in rows if r[0] == "e"}
    dinf = {r[1]: list(r[7]) for r in rows if r[0] == "i"}
    ddict = {r[3]: r[1] for r in rows if r[0] == "d"}

    toks = sorted({t for ts in train.values() for t in ts})
    pyd = {t: i for i, t in enumerate(toks)}
    assert ddict == pyd
    tr_ids = {d: [pyd[t] for t in ts] for d, ts in train.items()}
    pyenc, pyvocab = batched_bpe_py(
        tr_ids, rounds, m, pack=DICT_PACK, vocab_base=len(pyd)
    )
    assert sorted(pyvocab) == dvocab
    assert pyenc == denc
    # inference witness: translate full corpus with OOV, apply in round order
    want = _py_encode_with_dict(
        {d: ts for d, ts in full.items()}, pyd,
        pyvocab, rounds,
    )
    assert want == dinf
    assert dinf[3] == [OOV_ID, OOV_ID]  # all-OOV doc rides through
    assert dinf[5] == []                # empty doc survives
    assert len(dvocab) == 5 and all(nid >= len(pyd) for (*_, nid, _c) in dvocab)


def test_decode_with_dict_roundtrip(spark):
    """decode(encode(corpus)) must reproduce the translated-with-OOV
    corpus EXACTLY (encode is a bijection given the vocab): expansion
    runs in reverse round order because a later round's nid can carry
    an earlier round's nid as a member. OOV_ID is a fixpoint."""
    from wfc3_cte_monitor_spark.operators.bpe_batch import decode_with_dict

    docs = {**C1, **C3}
    rounds, m = 3, 2
    _enc, vocab, dict_df = batched_bpe_train_dict(
        _spark_df(spark, docs), rounds=rounds, m=m
    )
    d = _py_dict(docs)
    full = dict(docs)
    full.update({901: [3, 5, 999983, 3, 5], 902: [999983, 777777], 903: []})
    enc_full = encode_with_dict(_spark_df(spark, full), dict_df, vocab)
    dec = decode_with_dict(enc_full, vocab)  # rounds derived from vocab
    got = {r["doc_id"]: list(r["th"]) for r in dec.collect()}
    want = {doc: [d.get(t, OOV_ID) for t in ts] for doc, ts in full.items()}
    assert got == want


def test_decode_sql_twin_matches_spark():
    """The DuckDB decode chain (bpe_dict_decode_ctes_sql) must undo the
    encode chain back to the translated corpus — checked against the
    python translate witness, same fixture as the encode twin test."""
    import duckdb

    from wfc3_cte_monitor_spark.operators.bpe_batch import (
        batched_bpe_ctes_sql,
        bpe_dict_decode_ctes_sql,
        bpe_dict_encode_ctes_sql,
    )

    train = {
        0: [3, 5, 3, 5, 9, 12, 9, 12, 3, 5],
        2: [9, 12, 9, 12, 7, 7, 7],
        4: [3, 5, 7, 9, 12],
        6: [],
    }
    full = dict(train)
    full.update({1: [3, 5, 999983, 3, 5], 3: [999983, 777777], 5: []})
    rounds, m = 4, 3
    con = duckdb.connect()
    con.execute("CREATE TABLE thstr (doc_id BIGINT, th BIGINT[])")
    for d_, t in train.items():
        con.execute("INSERT INTO thstr VALUES (?, ?)", [d_, t])
    con.execute("CREATE TABLE thsall (doc_id BIGINT, th BIGINT[])")
    for d_, t in full.items():
        con.execute("INSERT INTO thsall VALUES (?, ?)", [d_, t])
    sql = f"""WITH {batched_bpe_ctes_sql('thstr', rounds=rounds, m=m,
                                          prefix='bd', dict_mode=True)},
        {bpe_dict_encode_ctes_sql('thsall', rounds=rounds,
                                  trainer_prefix='bd', prefix='bi')},
        {bpe_dict_decode_ctes_sql(f'biths{rounds}', rounds=rounds,
                                  trainer_prefix='bd', prefix='bx')}
        SELECT x.doc_id, x.th, t0.th FROM bxths{rounds} x
        JOIN biths0 t0 USING (doc_id)"""
    rows = con.execute(sql).fetchall()
    toks = sorted({t for ts in train.values() for t in ts})
    pyd = {t: i for i, t in enumerate(toks)}
    want = {doc: [pyd.get(t, OOV_ID) for t in ts] for doc, ts in full.items()}
    got = {r[0]: list(r[1]) for r in rows}
    translated = {r[0]: list(r[2]) for r in rows}
    assert got == want            # decode == python translate witness
    assert got == translated      # and == the chain's own biths0
