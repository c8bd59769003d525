

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


def test_bpe_token_count_diverges_from_whitespace_and_matches_duckdb():
    """On punctuation/digit-laden text the BPE-ish split must count runs
    (letters / digits / other symbols, leading-space affinity) — more
    tokens than whitespace — and Spark's Java-regex count must equal
    DuckDB's RE2 count on the same strings."""
    import duckdb

    from wfc3_cte_monitor_spark.functions.text import (
        bpe_token_count,
        bpe_token_count_sql,
        token_count,
    )
    from wfc3_cte_monitor_spark.session import get_spark

    spark = get_spark()
    # cross-engine equality is asserted for ALL cases; exact counts only
    # for the unambiguous ones (below)
    texts = [
        "hello, world!",        # hello | , | _world | ! = 4
        "abc123",               # abc | 123 = 2
        "a  b",                 # engine-equality only (bare-space runs are fiddly)
        "",
        "   ",
        "v2.0-rc1",             # engine-equality only
        "the quick brown fox",  # 4 word tokens
        "a\x0bb",               # vertical tab: the Java-\s-vs-RE2 divergence case
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id long, text string")
    got = {
        r.id: (r.n_ws, r.n_bpe)
        for r in df.select(
            "id",
            token_count("text").alias("n_ws"),
            bpe_token_count("text").alias("n_bpe"),
        ).collect()
    }
    con = duckdb.connect()
    for i, t in enumerate(texts):
        (oracle_n,) = con.execute(
            f"SELECT {bpe_token_count_sql('t.text')} FROM (SELECT ? AS text) t", [t]
        ).fetchone()
        assert got[i][1] == oracle_n, (t, got[i][1], oracle_n)
    # unambiguous exact counts
    assert got[0][1] == 4
    assert got[1][1] == 2
    assert got[3][1] == 0
    assert got[4][1] == 0
    assert got[6][1] == 4
    # divergence from whitespace where punctuation/digits exist
    assert got[0][1] > got[0][0] or got[0][0] == 4  # "hello, world!" ws=2
    assert got[0][0] == 2
    assert got[1][0] == 1


def test_winnow_fingerprints_detect_shared_runs():
    """Rabin-Karp + winnowing: (a) Spark matches a pure-python
    rederivation, (b) two docs sharing a long token run share
    fingerprints even at different offsets, (c) short docs degrade
    gracefully (single window / empty)."""
    import hashlib

    from wfc3_cte_monitor_spark.functions.text import (
        ROLL_B,
        ROLL_M,
        WINNOW_K,
        WINNOW_W,
        winnow_fingerprints,
    )
    from wfc3_cte_monitor_spark.session import get_spark

    def py_hash(tok: str) -> int:
        return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % ROLL_M

    def py_fps(text: str) -> set[int]:
        toks = [t for t in text.lower().split() if t]
        hs = [py_hash(t) for t in toks]
        m = len(toks) - (WINNOW_K - 1)
        if m < 1:
            return set()
        kh = [
            (((hs[p] * ROLL_B + hs[p + 1]) % ROLL_M) * ROLL_B + hs[p + 2]) % ROLL_M
            for p in range(m)
        ]
        if m < WINNOW_W:
            return {min(kh)}
        return {min(kh[p : p + WINNOW_W]) for p in range(m - WINNOW_W + 1)}

    shared = "alpha beta gamma delta epsilon zeta eta theta"
    texts = [
        f"intro words here {shared} closing words",
        f"{shared} and a completely different tail of tokens",
        "tiny doc",          # < k tokens -> empty
        "one two three",     # exactly k -> single window
        "unrelated content entirely about other things today",
    ]
    spark = get_spark()
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_winnow_fp, r.winnow_fp_sum)
        for r in winnow_fingerprints(df, "doc_id", "text").collect()
    }
    for i, t in enumerate(texts):
        ref = py_fps(t)
        expect = (len(ref), sum(ref)) if ref else None
        assert got.get(i) == expect, (i, got.get(i), ref)
    assert py_fps(texts[0]) & py_fps(texts[1])          # shared run -> shared fps
    assert not (py_fps(texts[0]) & py_fps(texts[4]))    # unrelated -> disjoint


def test_mix_arm_temperature_weighting(spark, sf_smoke):
    """The t01 'mix' arm must honor the α=0.5 mixing contract on the
    real corpus: weights sum to 1, every doc is sampled ≥ once, replica
    counts are exactly epochs × doc-count, and the sqrt temperature
    never upweights a LARGER domain above a smaller one."""
    from wfc3_cte_monitor_spark.plans.text_queries import t01_token_stats

    mix = {
        r.doc_id: r
        for r in t01_token_stats(spark, sf_smoke)
        .where("which = 'mix'")
        .collect()
    }
    assert len(mix) == 5  # en/es/fr/de/zh
    assert abs(sum(r.punct_ratio for r in mix.values()) - 1.0) < 5e-6  # Σw_d = 1
    for r in mix.values():
        # n_bpe_tokens ≡ domain doc count, n_chars ≡ replicas emitted,
        # n_unique ≡ distinct docs among replicas (see the arm comment)
        assert r.n_unique == r.n_bpe_tokens          # every doc sampled ≥ once
        assert r.n_chars % r.n_bpe_tokens == 0        # replicas = epochs × docs
        assert r.n_chars // r.n_bpe_tokens >= 1
    by_docs = sorted(mix.values(), key=lambda r: r.n_bpe_tokens)
    # α = 0.5 monotonicity: a domain with more docs never gets MORE
    # epochs than a smaller one (per-doc token lengths are iid across
    # domains in the synthetic corpus, so doc count orders token mass)
    epochs = [r.n_chars // r.n_bpe_tokens for r in by_docs]
    assert all(a >= b for a, b in zip(epochs, epochs[1:])), epochs


def test_boilerplate_detect_and_strip(spark, sf_smoke):
    """t02's boilerplate columns on the real corpus: every 3rd doc (the
    planted footer population) must be flagged, its stripped fingerprint
    must equal the pre-plant content fingerprint, and no unplanted doc
    may be flagged (random 4-gram suffixes can't reach the ≥20%
    per-source frequency bar)."""
    from wfc3_cte_monitor_spark.plans.text_queries import _BOILER_MOD, t02_text_profile

    rows = t02_text_profile(spark, sf_smoke).select(
        "doc_id", "fingerprint", "boiler", "boiler_fp"
    ).collect()
    assert rows
    for r in rows:
        planted = r.doc_id % _BOILER_MOD == 0
        assert r.boiler == (1 if planted else 0), r.doc_id
        if planted:
            # stripping the footer must recover the original content
            assert r.boiler_fp == r.fingerprint, r.doc_id
        else:
            assert r.boiler_fp == r.fingerprint  # untouched text, same fp


def test_score_arm_matches_python_reference(spark, sf_smoke):
    """The t01 'score' arm's hashed-feature linear score must equal an
    independent pure-Python recomputation (hashlib md5 prefix, same
    bucket/weight arithmetic) on every doc of the real corpus."""
    import hashlib

    from wfc3_cte_monitor_spark.plans.text_queries import (
        SCORE_D,
        SCORE_MOD,
        SCORE_MULT,
        SCORE_SHIFT,
        t01_token_stats,
    )
    from wfc3_cte_monitor_spark.sources.catalog import load_table
    import re

    def py_score(text):
        norm = re.sub(r"[^a-z0-9 ]", "", text.lower()).strip()
        toks = [t for t in re.split(r"\s+", norm) if t]
        n = n_pos = score = 0
        buckets = set()
        for t in toks:
            b = int(hashlib.md5(t.encode()).hexdigest()[:15], 16) % SCORE_D
            w = (b * SCORE_MULT) % SCORE_MOD - SCORE_SHIFT
            n += 1
            n_pos += w > 0
            score += w
            buckets.add(b)
        return n, n_pos, score, len(buckets)

    docs = {r.doc_id: r.text for r in load_table(spark, sf_smoke, "documents").collect()}
    rows = t01_token_stats(spark, sf_smoke).where("which = 'score'").collect()
    scored = {r.doc_id: r for r in rows}
    checked = 0
    for doc_id, text in docs.items():
        n, n_pos, score, nb = py_score(text)
        if n == 0:
            assert doc_id not in scored
            continue
        r = scored[doc_id]
        assert (r.n_tokens, r.n_bpe_tokens, r.n_chars, r.n_unique) == (
            n, n_pos, score, nb,
        ), (doc_id, r)
        assert r.punct_ratio == round(score / n, 6), (doc_id, r.punct_ratio)
        checked += 1
    assert checked == len(rows) > 0


def test_sample_arm_matches_python_reference(spark, sf_smoke):
    """The t01 'sample' arm: Bernoulli membership and the fixed-size
    holdout are pure functions of (doc_id, lang) — recompute both
    stratified draws in Python from the raw table and require the gated
    counts / xors to match exactly."""
    import hashlib
    from functools import reduce

    from wfc3_cte_monitor_spark.plans.text_queries import (
        HOLD_K,
        SAMPLE_MOD,
        t01_token_stats,
    )
    from wfc3_cte_monitor_spark.sources.catalog import load_table

    def h64(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    docs = load_table(spark, sf_smoke, "documents").select("doc_id", "lang").collect()
    strata: dict[str, list[int]] = {}
    for r in docs:
        strata.setdefault(r.lang, []).append(r.doc_id)

    rows = {r.doc_id: r for r in
            t01_token_stats(spark, sf_smoke).where("which = 'sample'").collect()}
    assert len(rows) == len(strata)
    for lang, ids in strata.items():
        r = rows[h64(lang)]
        sampled = [i for i in ids if h64(f"smp|{i}") % SAMPLE_MOD == 0]
        hold = sorted((h64(f"hold|{i}"), i) for i in ids)[:HOLD_K]
        assert r.n_tokens == len(ids)
        assert r.n_bpe_tokens == len(sampled)
        assert r.n_chars == min(HOLD_K, len(ids))
        if sampled:
            assert r.n_unique == reduce(lambda a, b: a ^ b, sampled)
        assert r.fp == reduce(lambda a, b: a ^ b, (hk for hk, _ in hold))
        assert r.punct_ratio == round(len(sampled) / len(ids), 6)


def test_merge_arm_matches_python_reference(spark, sf_smoke):
    """The t01 'merge' arm: the top-K adjacent-pair counts (one BPE
    vocabulary-induction iteration) recomputed in pure Python from the
    raw corpus must match the gated hashes/counts/ranks exactly."""
    import hashlib
    import re
    from collections import Counter

    from wfc3_cte_monitor_spark.plans.text_queries import MERGE_K, t01_token_stats
    from wfc3_cte_monitor_spark.sources.catalog import load_table

    def h64(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    def toks(text):
        norm = re.sub(r"[^a-z0-9 ]", "", text.lower()).strip()
        return [t for t in re.split(r"\s+", norm) if t != ""] if norm else []

    def pair_key(a: str, b: str) -> int:
        return (h64(a) % (1 << 30)) * (1 << 30) + h64(b) % (1 << 30)

    cnt: Counter = Counter()
    docs_with: dict[tuple, set] = {}
    for r in load_table(spark, sf_smoke, "documents").select("doc_id", "text").collect():
        ts = toks(r.text)
        for a, b in zip(ts, ts[1:]):
            cnt[(a, b)] += 1
            docs_with.setdefault((a, b), set()).add(r.doc_id)
    tot = sum(cnt.values())
    expect = sorted(cnt.items(), key=lambda kv: (-kv[1], pair_key(*kv[0])))[:MERGE_K]

    all_rows = t01_token_stats(spark, sf_smoke).collect()
    rows = sorted(
        (r for r in all_rows if r.which == "merge"), key=lambda r: r.chunk_id
    )
    assert len(rows) == MERGE_K
    for rank, ((pair, c), r) in enumerate(zip(expect, rows), start=1):
        a, b = pair
        assert r.chunk_id == rank
        assert r.doc_id == pair_key(a, b)
        assert r.n_tokens == c
        assert r.n_bpe_tokens == len(docs_with[pair])
        assert r.n_chars == h64(a) ^ h64(b)
        assert r.punct_ratio == round(c / tot, 6)

    # iteration 2: apply the top DISTINCT-member pair in Python (the
    # engine works in the 30-bit residue space — replicate that exactly,
    # merged token id = pair key + 2^60), recount, compare.
    P = 1 << 30
    win = min(
        (
            (pair, c)
            for pair, c in cnt.items()
            if h64(pair[0]) % (1 << 30) != h64(pair[1]) % (1 << 30)
        ),
        key=lambda kv: (-kv[1], pair_key(*kv[0])),
    )[0]
    ar, br = h64(win[0]) % P, h64(win[1]) % P
    nid = pair_key(*win) + (1 << 60)
    cnt2: Counter = Counter()
    docs2: dict[int, set] = {}
    for r in load_table(spark, sf_smoke, "documents").select("doc_id", "text").collect():
        hs = [h64(t) for t in toks(r.text)]
        if len(hs) < 2:
            continue
        out, i = [], 0
        while i < len(hs):
            if i + 1 < len(hs) and hs[i] % P == ar and hs[i + 1] % P == br:
                out.append(nid)
                i += 2
            else:
                out.append(hs[i])
                i += 1
        for x, y in zip(out, out[1:]):
            k2 = (x % P) * P + (y % P)
            cnt2[(k2, x ^ y)] += 1
            docs2.setdefault(k2, set()).add(r.doc_id)
    tot2 = sum(cnt2.values())
    expect2 = sorted(cnt2.items(), key=lambda kv: (-kv[1], kv[0][0]))[:MERGE_K]
    rows2 = sorted(
        (r for r in all_rows if r.which == "merge2"), key=lambda r: r.chunk_id
    )
    assert len(rows2) == MERGE_K
    for rank, (((k2, mx), c), r) in enumerate(zip(expect2, rows2), start=1):
        assert (r.chunk_id, r.doc_id, r.n_tokens) == (rank, k2, c)
        assert r.n_bpe_tokens == len(docs2[k2])
        assert r.n_chars == mx
        assert r.punct_ratio == round(c / tot2, 6)


def test_tfidf_top_term_matches_python_reference(spark, sf_smoke):
    """t02's tfidf columns: the rarity-weighted top term per doc
    (score = tf · (N·10⁶ DIV df), deterministic (score, hash) argmax)
    recomputed in pure Python must match exactly."""
    import hashlib
    import re
    from collections import Counter

    from wfc3_cte_monitor_spark.plans.text_queries import t02_text_profile
    from wfc3_cte_monitor_spark.sources.catalog import load_table

    def h64(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    def toks(text):
        norm = re.sub(r"[^a-z0-9 ]", "", text.lower()).strip()
        return [t for t in re.split(r"\s+", norm) if t != ""] if norm else []

    docs = {
        r.doc_id: Counter(h64(t) for t in toks(r.text))
        for r in load_table(spark, sf_smoke, "documents").select("doc_id", "text").collect()
    }
    n = len(docs)
    df: Counter = Counter()
    for tf in docs.values():
        for th in tf:
            df[th] += 1

    rows = {r.doc_id: r for r in
            t02_text_profile(spark, sf_smoke).select("doc_id", "tfidf_w", "tfidf_top").collect()}
    assert rows.keys() == docs.keys()
    for doc_id, tf in docs.items():
        r = rows[doc_id]
        if not tf:
            assert r.tfidf_w is None and r.tfidf_top is None
            continue
        w, h = max((c * ((n * 1_000_000) // df[th]), th) for th, c in tf.items())
        assert (r.tfidf_w, r.tfidf_top) == (w, h), doc_id


def test_bpe_trainer_matches_pure_python_greedy(spark, sf_smoke):
    """The k-iteration BPE trainer (t01 'mergeK' arm, k=K_BPE>=3): an
    INDEPENDENT pure-Python greedy implementation of the same algorithm
    (packed-residue pair keys, ar!=br winner rule, positional
    non-overlapping apply, iteration-indexed new-token ids) must produce
    the identical iteration-k top-10 and accumulated vocab."""
    import hashlib
    import re
    from collections import defaultdict

    from wfc3_cte_monitor_spark.plans.text_queries import (
        K_BPE,
        MERGE_K,
        _PAIR_PACK as P,
        t01_token_stats,
    )
    from wfc3_cte_monitor_spark.sources.catalog import load_table

    assert K_BPE >= 3  # the verdict ask: gate at k >= 3

    def h64(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    corpus = {}
    for r in load_table(spark, sf_smoke, "documents").select("doc_id", "text").collect():
        t = re.sub(r"[^a-z0-9 ]", "", r.text.lower()).strip()
        corpus[r.doc_id] = [h64(x) for x in re.split(r"\s+", t) if x]

    def bigram_counts(cur):
        cnt: dict = defaultdict(int)
        nd: dict = defaultdict(set)
        for d, th in cur.items():
            for i in range(len(th) - 1):
                key = ((th[i] % P) * P + th[i + 1] % P, th[i] ^ th[i + 1])
                cnt[key] += 1
                nd[key].add(d)
        return cnt, nd

    cur = corpus
    cnt, nd = bigram_counts(cur)
    vocab = []
    for w in range(1, K_BPE):
        h, mx = min(
            (k for k in cnt if k[0] // P != k[0] % P),
            key=lambda k: (-cnt[k], k[0], k[1]),  # (cnt desc, h, mx) — engine tiebreak
        )
        ar, br, nid = h // P, h % P, h + w * (1 << 60)
        vocab.append((h, -w, cnt[(h, mx)], len(nd[(h, mx)]), mx, nid))
        nxt = {}
        for d, th in cur.items():
            if len(th) < 2:
                continue
            out = []
            for i in range(len(th)):
                if i > 0 and th[i - 1] % P == ar and th[i] % P == br:
                    continue  # absorbed into the pair starting at i-1
                if i + 1 < len(th) and th[i] % P == ar and th[i + 1] % P == br:
                    out.append(nid)
                else:
                    out.append(th[i])
            nxt[d] = out
        cur = nxt
        cnt, nd = bigram_counts(cur)

    tot = sum(cnt.values())
    top = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))[:MERGE_K]
    want_top = {
        (h, rnk, c, len(nd[(h, mx)]), mx): c / tot
        for rnk, ((h, mx), c) in enumerate(top, start=1)
    }

    rows = [
        r
        for r in t01_token_stats(spark, sf_smoke).where("which = 'mergeK'").collect()
    ]
    got_vocab = sorted(
        (r.doc_id, r.chunk_id, r.n_tokens, r.n_bpe_tokens, r.n_chars, r.fp)
        for r in rows
        if r.chunk_id < 0
    )
    assert got_vocab == sorted(vocab)
    got_top = {
        (r.doc_id, r.chunk_id, r.n_tokens, r.n_bpe_tokens, r.n_chars): r.punct_ratio
        for r in rows
        if r.chunk_id >= 1
    }
    assert set(got_top) == set(want_top)
    for k, rel in want_top.items():
        # rounding policy differs between engines' round() and Python's
        # banker's round — compare the raw ratio within the quantum
        assert abs(got_top[k] - rel) <= 1e-6, (k, got_top[k], rel)


def test_trigram_langid_on_natural_language(spark):
    """The t02 trigram language-ID columns, driven on real natural-
    language sentences (the synthetic corpus is word-salad with no
    character-level language signal — see the t02 docstring): each
    language's text must classify correctly, and an off-vocabulary text
    must come back 'und' with zero hits."""
    from pyspark.sql import functions as F

    from wfc3_cte_monitor_spark.functions.text import norm_text
    from wfc3_cte_monitor_spark.plans.text_queries import LANG_TRIGRAMS

    sents = [
        (1, "en", "the cat sat on the mat and the dog ran to the tree of life"),
        (2, "es", "el perro y el gato estan en el jardin y el sol brilla"),
        (3, "fr", "le chien et le chat sont dans le jardin et le ciel est bleu"),
        (4, "de", "der hund und die katze sind in der stadt und das haus ist zu klein"),
        (5, "und", "xxxx yyyy zzzz qqqq"),
    ]
    docs = spark.createDataFrame(sents, "doc_id long, want string, text string")
    nt = F.concat(F.lit(" "), norm_text("text"), F.lit(" "))
    trid = docs.select("doc_id", nt.alias("_nt")).select(
        "doc_id",
        F.explode(
            F.expr("transform(sequence(1, length(_nt) - 2), i -> substring(_nt, i, 3))")
        ).alias("tri"),
    )
    prof = spark.createDataFrame(
        [(lang, t) for lang, ts in LANG_TRIGRAMS.items() for t in ts],
        "tlg string, tri string",
    )
    best = {
        r["doc_id"]: (r["lg"], r["hits"])
        for r in trid.join(F.broadcast(prof), "tri")
        .groupBy("doc_id", "tlg").agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.min(F.struct((-F.col("c")).alias("ns"), F.col("tlg").alias("lg"))).alias("m"))
        .select("doc_id", F.col("m.lg").alias("lg"), (-F.col("m.ns")).alias("hits"))
        .collect()
    }
    for doc_id, want, _ in sents:
        if want == "und":
            assert doc_id not in best  # zero profile hits anywhere
        else:
            assert best[doc_id][0] == want, (doc_id, want, best.get(doc_id))
            assert best[doc_id][1] > 0


def test_bpe_ctes_sql_k_parameterization():
    """The generated trainer SQL must be valid for ANY k >= 2 (k == 2
    previously emitted duplicate bgtot2/bgtop2 CTEs — DuckDB binder
    error) and reject k < 2 (iteration 2's counts feed 'merge2')."""
    import re

    import duckdb
    import pytest

    from wfc3_cte_monitor_spark.plans.text_queries import (
        _bpe_arms_sql,
        _bpe_ctes_sql,
    )

    with pytest.raises(ValueError):
        _bpe_ctes_sql(1)

    for k in (2, 3, 4):
        ctes = _bpe_ctes_sql(k)
        names = re.findall(r"\b((?:bgagg|bgw|ths|bgtot|bgtop)\d+) AS \(", ctes)
        assert len(names) == len(set(names)), (k, sorted(names))
        sql = f"""
        WITH ths AS (
            SELECT * FROM (VALUES
                (1, [1,2,1,2,3]::BIGINT[]),
                (2, [2,3,1,2]::BIGINT[]),
                (3, [1,2]::BIGINT[])
            ) AS t(doc_id, th)
        ),
        {ctes}
        {_bpe_arms_sql(k)}
        """
        rows = duckdb.connect().execute(sql).fetchall()
        assert rows, k


def _py_planted_url(doc_id: int, source: str) -> str:
    """Pure-python twin of functions/urls.planted_url."""
    scheme = "HTTPS" if doc_id % 2 == 0 else "http"
    www = "WWW." if doc_id % 3 == 0 else ""
    suffix = ".CO.UK" if doc_id % 5 == 0 else ".com"
    if doc_id % 4 == 0:
        port = ":443" if doc_id % 2 == 0 else ":80"
    elif doc_id % 4 == 1:
        port = ":8080"
    else:
        port = ""
    path = "" if doc_id % 13 == 0 else f"/D/{doc_id}"
    if doc_id % 11 == 0:
        query = "gclid=zzz"
    elif doc_id % 2 == 0:
        query = f"utm_source=feed&id={doc_id}&utm_campaign=x"
    else:
        query = f"id={doc_id}&ref=abc"
    frag = "#sec-2" if doc_id % 7 == 0 else ""
    return f"{scheme}://{www}{source}{suffix}{port}{path}?{query}{frag}"


def test_url_arm_matches_python_reference(spark, sf_smoke):
    """t01 'url' arm: canonical-URL fingerprints, registered-domain
    grouping, per-domain rank and cap decision must all match a pure-
    python rederivation (urls.canonicalize_py + manual rank/cap)."""
    import hashlib

    from wfc3_cte_monitor_spark.functions.urls import canonicalize_py
    from wfc3_cte_monitor_spark.plans.text_queries import URL_CAP_N, t01_token_stats
    from wfc3_cte_monitor_spark.sources.catalog import load_table

    def h64(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    docs = {
        r.doc_id: r.source
        for r in load_table(spark, sf_smoke, "documents").select("doc_id", "source").collect()
    }
    canon = {d: canonicalize_py(_py_planted_url(d, s)) for d, s in docs.items()}
    by_dom: dict[str, list[int]] = {}
    for d, (_, dom) in sorted(canon.items()):
        by_dom.setdefault(dom, []).append(d)

    rows = {
        r.doc_id: r
        for r in t01_token_stats(spark, sf_smoke).where("which = 'url'").collect()
    }
    assert set(rows) == set(docs)
    for dom, members in by_dom.items():
        for rnk, d in enumerate(members, start=1):
            r = rows[d]
            cu, _ = canon[d]
            assert r.chunk_id == rnk, (d, dom)
            assert r.n_tokens == len(members)
            assert r.n_bpe_tokens == (1 if rnk <= URL_CAP_N else 0)
            assert r.n_chars == h64(dom)
            assert r.n_unique == len(cu)
            assert r.fp == h64(cu), (d, cu)
            assert abs(r.punct_ratio - min(len(members), URL_CAP_N) / len(members)) <= 1e-6


def test_encode_arm_matches_python_reference(spark, sf_smoke):
    """t01 'encode' arm: applying the trained k-merge vocab to EVERY doc
    (including short docs, which pass through) must reproduce the pure-
    python greedy encoder's per-doc lengths and exact sequences
    (fingerprint of the comma-joined decimal render)."""
    import hashlib
    import re
    from collections import defaultdict

    from wfc3_cte_monitor_spark.plans.text_queries import (
        K_BPE,
        _PAIR_PACK as P,
        t01_token_stats,
    )
    from wfc3_cte_monitor_spark.sources.catalog import load_table

    def h64(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    corpus = {}
    for r in load_table(spark, sf_smoke, "documents").select("doc_id", "text").collect():
        t = re.sub(r"[^a-z0-9 ]", "", r.text.lower()).strip()
        corpus[r.doc_id] = [h64(x) for x in re.split(r"\s+", t) if x]

    def bigram_counts(cur):
        cnt: dict = defaultdict(int)
        for th in cur.values():
            for i in range(len(th) - 1):
                cnt[((th[i] % P) * P + th[i + 1] % P, th[i] ^ th[i + 1])] += 1
        return cnt

    cur = dict(corpus)
    for w in range(1, K_BPE):
        cnt = bigram_counts(cur)
        h, mx = min(
            (k for k in cnt if k[0] // P != k[0] % P),
            key=lambda k: (-cnt[k], k[0], k[1]),
        )
        ar, br, nid = h // P, h % P, h + w * (1 << 60)
        nxt = {}
        for d, th in cur.items():
            if len(th) < 2:
                nxt[d] = th  # short docs pass through (complete corpus)
                continue
            out = []
            for i in range(len(th)):
                if i > 0 and th[i - 1] % P == ar and th[i] % P == br:
                    continue
                if i + 1 < len(th) and th[i] % P == ar and th[i + 1] % P == br:
                    out.append(nid)
                else:
                    out.append(th[i])
            nxt[d] = out
        cur = nxt

    rows = {
        r.doc_id: r
        for r in t01_token_stats(spark, sf_smoke).where("which = 'encode'").collect()
    }
    assert set(rows) == set(corpus)  # EVERY doc is encoded
    for d, th0 in corpus.items():
        r = rows[d]
        assert r.n_tokens == len(th0), d
        assert r.n_bpe_tokens == len(cur[d]), d
        assert r.fp == h64(",".join(str(x) for x in cur[d])), d


def test_lm_arm_matches_python_reference(spark, sf_smoke):
    """t01 'lm' arm: add-one-smoothed bigram-LM scores in integer
    micro-units, OOV counts, avg-log-prob ratio and fixed-threshold
    bucket must match a pure-python LM trained on the same slice."""
    import hashlib
    import math
    import re

    from wfc3_cte_monitor_spark.plans.text_queries import (
        LM_BUCKETS,
        LM_TRAIN_MOD,
        t01_token_stats,
    )
    from wfc3_cte_monitor_spark.sources.catalog import load_table

    def h64(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    def r0(x: float) -> int:  # round half away from zero (both engines)
        return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)

    corpus = {}
    for r in load_table(spark, sf_smoke, "documents").select("doc_id", "text").collect():
        t = re.sub(r"[^a-z0-9 ]", "", r.text.lower()).strip()
        corpus[r.doc_id] = [h64(x) for x in re.split(r"\s+", t) if x]

    ctx: dict = {}
    pc: dict = {}
    vocab = set()
    for d, th in corpus.items():
        if d % LM_TRAIN_MOD == 0:
            vocab.update(th)
            for i in range(len(th) - 1):
                ctx[th[i]] = ctx.get(th[i], 0) + 1
                pc[(th[i], th[i + 1])] = pc.get((th[i], th[i + 1]), 0) + 1
    V = len(vocab)

    rows = {
        r.doc_id: r
        for r in t01_token_stats(spark, sf_smoke).where("which = 'lm'").collect()
    }
    assert set(rows) == set(corpus)
    assert any(r.n_bpe_tokens > 0 for r in rows.values())  # OOV exists
    for d, th in corpus.items():
        nb = max(len(th) - 1, 0)
        score = 0
        n_oov = 0
        for i in range(nb):
            c_ab = pc.get((th[i], th[i + 1]), 0)
            c_ctx = ctx.get(th[i], 0)
            if c_ab == 0:
                n_oov += 1
            score += r0(1e6 * math.log((c_ab + 1) / (c_ctx + V)))
        r = rows[d]
        assert r.n_tokens == nb and r.fp == score, (d, r.fp, score)
        assert r.n_bpe_tokens == n_oov, d
        if nb == 0:
            assert r.chunk_id == -1 and r.punct_ratio == 0.0
        else:
            avg = score / nb
            want_b = min(LM_BUCKETS - 1, max(0, math.floor((avg + 15e6) / 1e6)))
            assert r.chunk_id == want_b, (d, r.chunk_id, want_b)
            assert abs(r.punct_ratio - avg / 1e6) <= 1e-6, d


def test_rank_arm_matches_python_reference(spark, sf_smoke):
    """t01 'rank' arm: the planted domain link graph and the k-iteration
    integer PageRank must match integer_pagerank_py exactly (masses,
    penultimate masses, in/out degrees) — the all-integer recurrence is
    the cross-engine determinism contract."""
    import hashlib

    from wfc3_cte_monitor_spark.functions.urls import canonicalize_py
    from wfc3_cte_monitor_spark.operators.pagerank import (
        PR_SCALE,
        integer_pagerank_py,
    )
    from wfc3_cte_monitor_spark.plans.text_queries import PR_K, t01_token_stats
    from wfc3_cte_monitor_spark.sources.catalog import load_table

    def h64(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    docs = {
        r.doc_id: r.source
        for r in load_table(spark, sf_smoke, "documents").select("doc_id", "source").collect()
    }
    dom = {d: canonicalize_py(_py_planted_url(d, s))[1] for d, s in docs.items()}
    n = len(docs)
    links: dict = {}
    cite_pairs = [(d, (d * 131 + 7) % n) for d in docs]
    # the r9 skew family: every third doc also cites (5d+1) mod n,
    # concentrating extra in-mass on four hub domains
    cite_pairs += [(d, (d * 5 + 1) % n) for d in docs if d % 3 == 0]
    for d, t in cite_pairs:
        if t in dom and dom[d] != dom[t]:
            links[(dom[d], dom[t])] = links.get((dom[d], dom[t]), 0) + 1
    edges = [(s, t, w) for (s, t), w in links.items()]
    want = integer_pagerank_py(edges, k=PR_K)
    outw: dict = {}
    indeg: dict = {}
    for s, t, w in edges:
        outw[s] = outw.get(s, 0) + w
        indeg[t] = indeg.get(t, 0) + 1

    rows = {
        r.doc_id: r
        for r in t01_token_stats(spark, sf_smoke).where("which = 'rank'").collect()
    }
    assert set(rows) == {h64(v) for v in want}
    for v, (mass, prev) in want.items():
        r = rows[h64(v)]
        assert r.n_chars == mass, (v, r.n_chars, mass)
        assert r.fp == prev, (v, r.fp, prev)
        assert r.n_tokens == outw.get(v, 0), v
        assert r.n_bpe_tokens == indeg.get(v, 0), v
        assert abs(r.punct_ratio - mass / PR_SCALE) <= 1e-6, v
        # r9: the PIPELINE DECISION rides n_unique — kept iff the
        # domain's mass is at least the uniform share scale/N
        assert r.n_unique == (1 if mass * len(want) >= PR_SCALE else 0), v
    assert any(r.n_unique == 1 for r in rows.values())
    assert any(r.n_unique == 0 for r in rows.values())
    # sanity: rank mass is conserved up to deterministic flooring leak
    total = sum(m for m, _ in want.values())
    assert 0 < total <= PR_SCALE


def test_url_canonicalizer_fuzz_three_engines(spark):
    """Randomized URL component combinations (beyond the planted set):
    Spark columns, the DuckDB twin and canonicalize_py must produce
    identical canonical strings and registered domains."""
    import random

    import duckdb

    from wfc3_cte_monitor_spark.functions.urls import (
        canonicalize_py,
        url_table_sql,
        with_url_columns,
    )

    rng = random.Random(20260819)
    schemes = ["http", "HTTP", "https", "HTTPS", "ftp"]
    hosts = ["Example.COM", "www.example.com", "WWW.a.b.CO.UK", "localhost",
             "sub.host.github.io", "x.org.uk", "a.com.au", "deep.sub.domain.net"]
    ports = ["", ":80", ":443", ":8080", ":8443"]
    paths = ["", "/", "/A/b", "/p?x", "/with%20esc"]
    queries = ["", "?a=1", "?utm_source=x", "?a=1&utm_b=2&gclid=9&z=3",
               "?fbclid=only", "?utm_a=1&utm_b=2"]
    frags = ["", "#f", "#sec?fake=1&utm_x=2"]
    urls = []
    for _ in range(120):
        p = rng.choice(paths)
        q = rng.choice(queries) if "?" not in p else ""
        urls.append(
            rng.choice(schemes) + "://" + rng.choice(hosts) + rng.choice(ports)
            + p + q + rng.choice(frags)
        )
    df = spark.createDataFrame([(i, u) for i, u in enumerate(urls)], "id long, u string")
    got = {
        r.id: (r.canon_url, r.reg_domain)
        for r in with_url_columns(df, "u").collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{u}')" for i, u in enumerate(urls))
        + ") AS t(id, u)"
    )
    ora = {r[0]: (r[1], r[2]) for r in con.execute(url_table_sql("t", "id", "u")).fetchall()}
    for i, u in enumerate(urls):
        py = canonicalize_py(u)
        assert got[i] == py, (u, got[i], py)
        assert ora[i] == py, (u, ora[i], py)


def test_bpe_degenerate_corpus_passes_through(spark, tmp_path):
    """r8 ADVICE: when an iteration has no valid merge pair (here: every
    doc is a single token, so the bigram relation is EMPTY), the winner
    relation is empty and the old cross join silently emptied the whole
    encoded relation. The left-join guard must make every application a
    no-op instead: the 'encode' arm returns the COMPLETE corpus with
    after == before counts, and no vocab rows are emitted. Verified on
    BOTH engines (the DuckDB twin has the same LEFT JOIN ON TRUE guard)."""
    import duckdb

    from wfc3_cte_monitor_spark.plans.registry import load_all

    n = 24
    rows = [(i, f"tok{i}", "en", "src%d" % (i % 3), len(f"tok{i}")) for i in range(n)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    spec = load_all()["t01_token_stats"]
    out = spec.fn(spark, str(tmp_path)).where("which in ('encode', 'mergeK')").collect()
    enc = [r for r in out if r.which == "encode"]
    assert len(enc) == n, "degenerate corpus must survive the merge loop intact"
    assert all(r.n_tokens == 1 and r.n_bpe_tokens == 1 for r in enc)
    assert not [r for r in out if r.which == "mergeK" and (r.chunk_id or 0) < 0], (
        "no merges exist on a bigram-free corpus"
    )

    con = duckdb.connect()
    pq_glob = str(tmp_path / "documents.parquet") + "/*.parquet"
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{pq_glob}')"
    )
    oenc = con.execute(
        f"SELECT * FROM ({spec.oracle}) WHERE which = 'encode'"
    ).fetchall()
    assert len(oenc) == n


def test_with_url_columns_collision_safety(spark):
    """r8 ADVICE: the old bare _u/_host… intermediates silently
    overwrote-and-dropped caller columns. Now caller columns with the
    old names survive untouched, and the reserved prefix is rejected
    loudly."""
    import pytest as _pytest

    from wfc3_cte_monitor_spark.functions.urls import with_url_columns

    df = spark.createDataFrame(
        [(1, "https://www.a.co.uk/x?utm_source=z&id=1", "keepme", 7)],
        "id long, u string, _host string, _q long",
    )
    out = with_url_columns(df, "u")
    assert out.columns == ["id", "u", "_host", "_q", "canon_url", "reg_domain"]
    row = out.collect()[0]
    assert row["_host"] == "keepme" and row["_q"] == 7
    assert row["canon_url"] == "https://a.co.uk/x?id=1"
    assert row["reg_domain"] == "a.co.uk"

    clash = df.withColumn("_wfc3url_u", df.id)
    with _pytest.raises(ValueError, match="reserved intermediate"):
        with_url_columns(clash, "u")
