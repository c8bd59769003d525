"""PINNED round-11 twin of ``t01_token_stats`` — the bench's
cross-version control, PRE-pinned at the END of round 11 (the live t01
gained the dictD arm family in r11, so frozen_t01_r10 stops isolating
r12's changes at the next boundary; pinning now guarantees the
snapshot is genuinely r11 code no matter when r12 first edits t01).

ACTIVE since the r12 flip (status note only — plan body untouched):
bench.py PINNED_TWINS points here, frozen_t01_r10 is retired, and
tests/test_plan_shape.py arm-compares this pin against live t01 every
CI run. In BENCH_r12, live − pinned prices round-12 t01 changes.

This module is a FROZEN COPY of the r11 plan body: the full r10 pin
content (21-arm t01 incl. 'mergeB', urls, integer_pagerank, the
embedded-scheme batched trainer) PLUS verbatim r11-close copies of
operators/salting.salted_rank, the dictionary-form functions of
operators/bpe_batch.py (dense_token_ids / translate_corpus /
encode_with_dict / decode_with_dict / batched_bpe_train_dict and
helpers), and plans/bpe_dict_queries.dict_bpe_arms — appended to the
union unconditionally (the pin never consults the arm-filter
registry).

CONTRACT (unchanged): bench.py times the pin alongside the live query
in the same randomized sweeps; live − pinned = cost of post-r11 code
changes to t01, pinned_rN vs pinned_r_N-1_ = pure host drift. Rules as
before: NEVER edit (re-pin instead); the remaining imports
(functions/text, checkpointing, sources/catalog) are the stable shared
substrate; not registered, no oracle. Pin verification: row-identical
to live t01 at sf0.001 + sf0.01 at pin time (recorded in SCALING.md
round-11).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..checkpointing import materialize
from ..functions.text import (
    bpe_token_count,
    norm_text,
    portable_hash64,
    punct_ratio,
    token_count,
    tokens,
)
from ..sources.catalog import load_table, spread

# ---------------------------------------------------------------- r9 constants
CHUNK_TOKENS = 50
PACK_TOKENS = 512
N_SHARDS = 64
MIX_BUDGET_X = 2  # token budget = 2× corpus tokens
SCORE_D = 64           # feature-hash buckets
SCORE_MULT = 2654435761  # Knuth multiplicative constant (weight mix)
SCORE_MOD = 1001
SCORE_SHIFT = 500      # weights = (b*MULT % MOD) - SHIFT ∈ [-500, 500]
SAMPLE_MOD = 10        # Bernoulli rate = 1/10 by hash residue
HOLD_K = 25            # fixed-size per-stratum holdout
MERGE_K = 10           # BPE merge candidates gated
K_BPE = 3              # BPE trainer iterations gated (the 'mergeK' arm)
CAP_N = 2              # per-source quota ('cap' arm) — binds at every sf
URL_CAP_N = 3          # per-REGISTERED-DOMAIN quota ('url' arm)
LM_TRAIN_MOD = 9       # bigram-LM train slice: doc_id % 9 == 0 ('lm' arm)
LM_BUCKETS = 20        # fixed-threshold perplexity buckets ('lm' arm)
PR_K = 5               # PageRank power iterations ('rank' arm)
BB_ROUNDS = 2          # batched BPE trainer rounds gated ('mergeB' arm)
BB_M = 3               # batched merges/round — rounds·m ≤ NID_SLOTS_MAX
_PAIR_PACK = 1 << 30   # pair key = (ha % 2^30)·2^30 + hb % 2^30, < 2^60


# ------------------------------------------- functions/urls.py @ r9 (pinned)
TRACKING_PREFIXES = ("utm_", "fbclid=", "gclid=")
MULTI_SUFFIXES = ("co.uk", "org.uk", "ac.uk", "com.au", "co.jp", "github.io")

# reserved prefix for bound intermediate columns (dropped before return)
_TMP = "_wfc3url"

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_HOSTPORT_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
_QUERY_RE = r"\?([^#]*)"


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col



def with_url_columns(
    df: DataFrame,
    url_col: str | Column,
    out_canon: str = "canon_url",
    out_domain: str = "reg_domain",
) -> DataFrame:
    """Add ``canon_url`` and ``reg_domain`` columns derived from
    ``url_col``. Intermediates are BOUND via withColumn before reuse
    (the CollapseProject lesson from the t02 trigram columns: a lambda
    or multi-reference over a raw expression re-evaluates it per use).
    Intermediate names carry a collision-safe prefix and are asserted
    absent from the input (r8 ADVICE: the old bare ``_u``/``_host``…
    names silently overwrote-then-dropped caller columns)."""
    clash = [c for c in df.columns if c.startswith(_TMP)]
    if clash:
        raise ValueError(
            f"with_url_columns: input already has reserved intermediate "
            f"column(s) {clash} (prefix {_TMP!r})"
        )
    parts = df.withColumn(_TMP + "_u", F.regexp_replace(_c(url_col), r"#.*$", ""))
    parts = (
        parts.withColumn(_TMP + "_scheme", F.lower(F.regexp_extract(_TMP + "_u", _SCHEME_RE, 1)))
        .withColumn(_TMP + "_hp", F.lower(F.regexp_extract(_TMP + "_u", _HOSTPORT_RE, 1)))
        .withColumn(_TMP + "_path", F.regexp_extract(_TMP + "_u", _PATH_RE, 1))
        .withColumn(_TMP + "_q", F.regexp_extract(_TMP + "_u", _QUERY_RE, 1))
    )
    parts = parts.withColumn(
        _TMP + "_host",
        F.regexp_replace(
            F.regexp_replace(_TMP + "_hp", r":[0-9]+$", ""), r"^www\.", ""
        ),
    ).withColumn(_TMP + "_port", F.regexp_extract(_TMP + "_hp", r":([0-9]+)$", 1))
    parts = parts.withColumn(
        _TMP + "_cq",
        F.array_join(
            F.filter(
                F.split(_TMP + "_q", "&"),
                lambda x: ~reduce(
                    Column.__or__, [x.startswith(p) for p in TRACKING_PREFIXES]
                ),
            ),
            "&",
        ),
    )
    default_port = (
        (F.col(_TMP + "_port") == "")
        | ((F.col(_TMP + "_scheme") == "http") & (F.col(_TMP + "_port") == "80"))
        | ((F.col(_TMP + "_scheme") == "https") & (F.col(_TMP + "_port") == "443"))
    )
    canon = F.concat(
        F.col(_TMP + "_scheme"),
        F.lit("://"),
        F.col(_TMP + "_host"),
        F.when(default_port, F.lit("")).otherwise(F.concat(F.lit(":"), F.col(_TMP + "_port"))),
        F.when(F.col(_TMP + "_path") == "", F.lit("/")).otherwise(F.col(_TMP + "_path")),
        F.when(F.col(_TMP + "_cq") == "", F.lit("")).otherwise(
            F.concat(F.lit("?"), F.col(_TMP + "_cq"))
        ),
    )
    is_multi = reduce(
        Column.__or__, [F.col(_TMP + "_host").endswith("." + s) for s in MULTI_SUFFIXES]
    )
    dom = (
        F.when(~F.col(_TMP + "_host").contains("."), F.col(_TMP + "_host"))
        .when(is_multi, F.regexp_extract(_TMP + "_host", r"([^.]+\.[^.]+\.[^.]+)$", 1))
        .otherwise(F.regexp_extract(_TMP + "_host", r"([^.]+\.[^.]+)$", 1))
    )
    return (
        parts.withColumn(out_canon, canon)
        .withColumn(out_domain, dom)
        .drop(_TMP + "_u", _TMP + "_scheme", _TMP + "_hp", _TMP + "_host", _TMP + "_port", _TMP + "_path", _TMP + "_q", _TMP + "_cq")
    )


def planted_url(doc_id: str | Column = "doc_id", source: str | Column = "source") -> Column:
    """Deterministic URL fixture per document (the corpus has no URL
    column — same plant pattern as t02's PII/boilerplate): doc_id
    residues drive mixed-case scheme/host, www prefixes, default and
    non-default ports, multi-part public suffixes, tracking params
    (including all-tracking queries), fragments, and empty paths — one
    of each canonicalization rule is exercised at every sf."""
    d, s = _c(doc_id), _c(source)
    ds = d.cast("string")
    scheme = F.when(d % 2 == 0, F.lit("HTTPS")).otherwise(F.lit("http"))
    www = F.when(d % 3 == 0, F.lit("WWW.")).otherwise(F.lit(""))
    suffix = F.when(d % 5 == 0, F.lit(".CO.UK")).otherwise(F.lit(".com"))
    port = (
        F.when((d % 4 == 0) & (d % 2 == 0), F.lit(":443"))
        .when(d % 4 == 0, F.lit(":80"))
        .when(d % 4 == 1, F.lit(":8080"))
        .otherwise(F.lit(""))
    )
    path = F.when(d % 13 == 0, F.lit("")).otherwise(F.concat(F.lit("/D/"), ds))
    query = (
        F.when(d % 11 == 0, F.lit("gclid=zzz"))
        .when(
            d % 2 == 0,
            F.concat(F.lit("utm_source=feed&id="), ds, F.lit("&utm_campaign=x")),
        )
        .otherwise(F.concat(F.lit("id="), ds, F.lit("&ref=abc")))
    )
    frag = F.when(d % 7 == 0, F.lit("#sec-2")).otherwise(F.lit(""))
    return F.concat(scheme, F.lit("://"), www, s, suffix, port, path, F.lit("?"), query, frag)


# ---------------------------------------- operators/pagerank.py @ r9 (pinned)
PR_SCALE = 10**12  # rank mass in micro-units: Σ mass_0 ≈ PR_SCALE
PR_DAMP = 85       # damping factor, percent
# Edge-weight clamp: retained·w with retained ≤ scale·damp/100 ≈ 8.5e11
# needs w ≲ 1.08e7 to stay inside int64; 1e6 leaves a 10× margin.
PR_W_CAP = 10**6


def integer_pagerank(
    edges: DataFrame,
    k: int = 5,
    node_col: str = "node",
    scale: int = PR_SCALE,
    damp: int = PR_DAMP,
) -> DataFrame:
    """``edges``: (src, dst, w) weighted directed edges (bigint w ≥ 1)
    → (node_col, mass, prev_mass): integer rank mass after ``k`` and
    ``k−1`` iterations (the penultimate mass lets callers gate the
    convergence trajectory, not just the fixpoint-ish endpoint).

    Node set = every id appearing as src or dst; N and the uniform base
    term ride a broadcast 1-row count relation (no driver collect — the
    loop stays lazy)."""
    if k < 1:
        raise ValueError(f"integer_pagerank needs k >= 1 iterations, got {k}")
    # overflow-bound enforcement (see module docstring): clamp w BEFORE
    # anything reads it, so outw and every contribution see the same
    # saturated weights — one row-local projection, no shuffle. least()
    # ignores NULLs in Spark, which would silently saturate a NULL
    # weight to the cap (r9 ADVICE) — a NULL w is a caller bug (the
    # contract is bigint w ≥ 1), so fail fast at execution instead.
    edges = edges.select(
        "src",
        "dst",
        F.when(
            F.col("w").isNull(),
            F.expr(
                "CAST(raise_error('integer_pagerank: edge weight w must"
                " be non-null') AS BIGINT)"
            ),
        )
        .otherwise(F.least(F.col("w"), F.lit(PR_W_CAP)))
        .cast("bigint")
        .alias("w"),
    )
    nodes = (
        edges.select(F.col("src").alias(node_col))
        .union(edges.select(F.col("dst").alias(node_col)))
        .distinct()
        .transform(materialize)
    )
    n_rel = nodes.agg(F.count(F.lit(1)).cast("bigint").alias("_n"))
    # consumed once per iteration — truncate so round i doesn't re-run
    # the out-weight agg over the edge lineage i times
    outw = edges.groupBy("src").agg(
        F.sum("w").cast("bigint").alias("_W")
    ).transform(materialize)
    base = F.expr(f"({scale} * {100 - damp}) DIV (100 * _n)")
    mass = nodes.join(F.broadcast(n_rel)).select(
        node_col, F.expr(f"{scale} DIV _n").alias("mass")
    ).transform(materialize)
    prev = mass
    for _ in range(k):
        contrib = (
            edges.join(mass.withColumnRenamed(node_col, "src"), "src")
            .join(outw, "src")
            .groupBy("dst")
            .agg(
                F.sum(F.expr(f"((mass * {damp}) DIV 100) * w DIV _W"))
                .cast("bigint")
                .alias("_m")
            )
        )
        prev = mass
        mass = materialize(
            nodes.join(F.broadcast(n_rel))
            .join(contrib.withColumnRenamed("dst", node_col), node_col, "left")
            .select(
                node_col,
                (base + F.coalesce("_m", F.lit(0))).cast("bigint").alias("mass"),
            )
        )
    return mass.join(
        prev.withColumnRenamed("mass", "prev_mass"), node_col
    ).select(node_col, "mass", "prev_mass")




# ------------- pinned r10 copies of operators/bpe_batch.py (embedded path)
PAIR_PACK = 1 << 30
NID_BASE = 1 << 60
NID_SLOTS_MAX = 7


def bigram_counts(ths: DataFrame, pack: int = PAIR_PACK) -> DataFrame:
    """(h, mx, cnt) over adjacent token-residue pairs of ``ths`` —
    ``ths``: (doc_id, th array<bigint>). Same packing, same tiebreak
    columns as the sequential trainer's pair vocab (ndocs omitted: the
    trainer ranks on (cnt, h, mx) only). ``pack`` parameterizes the
    pair key base: PAIR_PACK (2^30 residues, the gate-traceable
    h-embedded scheme) or DICT_PACK (2^31, dense dictionary ids where
    ``id % pack == id`` — injective packing, true-BPE identity)."""
    return materialize(
        ths.where(F.size("th") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(th)-1),"
                    " i -> struct(element_at(th, i) AS ha,"
                    " element_at(th, i+1) AS hb))"
                )
            ).alias("p")
        )
        .select(
            (
                (F.col("p.ha") % pack) * pack + F.col("p.hb") % pack
            ).alias("h"),
            F.col("p.ha").bitwiseXOR(F.col("p.hb")).alias("mx"),
        )
        .groupBy("h", "mx")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def _rank_small(df: DataFrame, cols=("cnt", "h", "mx")) -> DataFrame:
    """Rank a POST-LIMIT candidate window by (cnt DESC, h, mx) without a
    global window (the repo-wide no-unpartitioned-window rule): a
    broadcast inequality self-join counts strict predecessors. Input
    must already be bounded (≤ probe window rows)."""
    c, h, mx = cols
    return (
        df.alias("x")
        .join(
            F.broadcast(df.alias("y")),
            F.expr(
                f"y.{c} > x.{c} OR (y.{c} = x.{c} AND y.{h} < x.{h}) "
                f"OR (y.{c} = x.{c} AND y.{h} = x.{h} AND y.{mx} < x.{mx})"
            ),
            "left",
        )
        .groupBy(f"x.{c}", f"x.{h}", f"x.{mx}")
        .agg((F.count(f"y.{h}") + 1).cast("int").alias("rnk"))
        .select(F.col(h), F.col(mx), F.col(c), "rnk")
    )


def compatible_topm(
    counts: DataFrame,
    m: int,
    round_idx: int,
    probe_mult: int = 4,
    pack: int = PAIR_PACK,
    vocab_base: int | None = None,
) -> DataFrame:
    """The round's batch: up to ``m`` pairwise-compatible winners from
    the top ``probe_mult·m`` candidates → (ar, br, nid, rnk).

    nid scheme: with ``vocab_base=None`` (default, the gated form)
    ``nid = h + (round_idx·m + batch_rank)·2^60`` — h-embedded,
    cross-engine traceable, 7-slot int64 bound. With ``vocab_base=V``
    (the dictionary form) ``nid = V + round_idx·m + batch_rank - 1`` —
    a fresh dense id above the V-token dictionary, no slot bound."""
    if m < 1:
        raise ValueError(f"batch size m must be >= 1, got {m}")
    window = max(probe_mult * m, m + 2)
    top = materialize(
        counts.where(F.expr(f"h DIV {pack} <> h % {pack}"))
        .orderBy(F.desc("cnt"), F.asc("h"), F.asc("mx"))
        .limit(window),
        eager=False,
    )
    rnk = _rank_small(top).selectExpr(
        "h", "mx", "cnt", "rnk",
        f"h DIV {pack} AS ar", f"h % {pack} AS br",
    )
    # conservative prefix rule: drop x if ANY higher-ranked candidate in
    # the window shares a member residue with it
    survivors = (
        rnk.alias("x")
        .join(
            F.broadcast(rnk.alias("y")),
            F.expr(
                "y.rnk < x.rnk AND (y.ar = x.ar OR y.ar = x.br "
                "OR y.br = x.ar OR y.br = x.br)"
            ),
            "left_anti",
        )
        .select("h", "mx", "cnt", "ar", "br")
    )
    batch = _rank_small(survivors).where(F.col("rnk") <= m)
    nid_expr = (
        f"h + ({round_idx} * {m} + rnk) * {NID_BASE} AS nid"
        if vocab_base is None
        else f"CAST({vocab_base} + {round_idx} * {m} + rnk - 1 AS BIGINT) AS nid"
    )
    return batch.selectExpr(
        f"h DIV {pack} AS ar",
        f"h % {pack} AS br",
        nid_expr,
        "rnk",
        "cnt",
    )


def apply_merge_batch(ths: DataFrame, batch: DataFrame, pack: int = PAIR_PACK) -> DataFrame:
    """One positional pass applying every (ar, br, nid) of ``batch`` to
    the token arrays. The batch rides a 1-row broadcast MAP relation
    (ar → (br, nid)); map keys are unique because batch members are
    pairwise disjoint. Same residue-matching semantics as the
    sequential trainer's CASE (left-to-right greedy, i+1 lookahead via
    try_element_at for DuckDB-compatible NULL-past-the-end; map lookups
    via try_element_at too — a non-member residue must yield NULL →
    identity, never an ANSI lookup error)."""
    mp = batch.agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("ar"), F.struct("br", "nid")))
        ).alias("_mp")
    )
    apply_expr = f"""filter(transform(sequence(1, size(th)), i -> CASE
        WHEN i > 1 AND try_element_at(_mp, element_at(th, greatest(i - 1, 1))
                 % {pack}).br = element_at(th, i) % {pack}
            THEN CAST(NULL AS BIGINT)
        WHEN try_element_at(_mp, element_at(th, i) % {pack}).br
                 = try_element_at(th, i + 1) % {pack}
            THEN try_element_at(_mp, element_at(th, i) % {pack}).nid
        ELSE element_at(th, i) END), x -> x IS NOT NULL)"""
    return ths.join(F.broadcast(mp), F.lit(True), "left").select(
        "doc_id",
        F.when(F.size("th") >= 2, F.expr(apply_expr))
        .otherwise(F.col("th"))
        .alias("th"),
    )


def batched_bpe_train(
    ths: DataFrame, rounds: int, m: int, probe_mult: int = 4
) -> tuple[DataFrame, DataFrame]:
    """Run ``rounds`` batched rounds of up to ``m`` merges each over
    ``ths`` (doc_id, th). Returns (encoded corpus, vocab) where vocab is
    one row per applied winner: (round, rnk, ar, br, nid, cnt) — cnt is
    the pair's bigram count at selection time, gateable against the SQL
    twin. Fully lazy; the corpus relation is materialized per round so
    round r's plan never re-embeds rounds 1..r-1."""
    if rounds < 1:
        raise ValueError(f"batched_bpe_train needs rounds >= 1, got {rounds}")
    if rounds * m > NID_SLOTS_MAX:
        raise ValueError(
            f"rounds*m = {rounds * m} exceeds the {NID_SLOTS_MAX}-slot nid "
            "space (see NID_SLOTS_MAX: slot*2^60 + h overflows int64 past "
            "slot 7; re-key to dictionary ids for larger vocab builds)"
        )
    cur = ths
    vocab: DataFrame | None = None
    for r in range(rounds):
        batch = materialize(
            compatible_topm(bigram_counts(cur), m, r, probe_mult), eager=False
        )
        tagged = batch.select(
            F.lit(r).cast("int").alias("round"), "rnk", "ar", "br", "nid", "cnt"
        )
        vocab = tagged if vocab is None else vocab.unionAll(tagged)
        cur = materialize(apply_merge_batch(cur, batch))
    return cur, vocab


# ---------------------------------------------------------------------------
# Dictionary-id form: the PRODUCTION re-key path the h-embedded scheme's
# 7-slot bound points at (NID_SLOTS_MAX above). Two differences, both
# deliberate:
#   1. CAPACITY — new-token ids are dense ints above the dictionary, so
#      merge count is bounded by DICT_PACK, not by 7 int64 slots.
#   2. SEMANTICS — under the h-embedded scheme a merged token's residue
#      (nid % 2^30) EQUALS its right member's residue, so in later
#      rounds the pair counter cannot tell them apart (a deliberate
#      property shared with the gated sequential trainer so the two
#      cross-check). Dictionary ids are fresh, so a merged token is a
#      NEW symbol — the true-BPE identity a production tokenizer needs.
# tests/test_bpe_batch.py pins both: dict ≡ embedded where the schemes
# coincide (single round — no merged token can re-enter the counts),
# dict ≡ the python dict-mode witness over multiple rounds, and a
# 12-merge build that the embedded scheme's slot check refuses.

DICT_PACK = 1 << 31  # ids < 2^31 ⇒ id % DICT_PACK == id and
#                      a·DICT_PACK + b < 2^62: injective int64 packing




# ---- r11 additions: the dictionary-form BPE lifecycle (dictD family) ----
# verbatim copies of operators/salting.salted_rank, the dict-form
# functions of operators/bpe_batch.py, and plans/bpe_dict_queries.
# dict_bpe_arms, taken at the r11 close — the pin must not import the
# evolving modules.

def salted_rank(
    df: DataFrame,
    part_col: str,
    order_col: str,
    n_buckets: int = 32,
    out: str = "rnk",
) -> DataFrame:
    """Exact per-``part_col`` ``row_number() ORDER BY order_col`` that
    scatters a mega-hot partition key instead of funnelling it through
    one task.

    A window's exchange hashes on the partition key alone, so a 50%-hot
    key puts 50% of ALL rows in one task — and AQE's skew handling never
    fires there (OptimizeSkewedJoin rewrites sort-merge/shuffled-hash
    JOINS only; there is no skew rule for Window exchanges — pinned by
    tests/test_scale_ops.py::test_mega_domain_window_skew_drill). The
    remedy is an ORDER-CORRELATED salt: bucket each row by where its
    order key falls inside its group's [min, max] range, rank locally
    within (key, bucket), then add per-bucket offsets. Because every
    row in bucket b orders before every row in bucket b+1, local rank +
    offset IS the exact global rank.

    Cost: one extra pre-pass (per-key min/max aggregate, map-side
    combinable, |keys| output rows → broadcast) and the offsets relation
    (|keys| × n_buckets rows → broadcast). All full-data exchanges hash
    on (key, bucket): the hot key spreads across n_buckets tasks.

    Ties in ``order_col`` within one group are assigned ranks in an
    arbitrary (but bucket-stable) order — the same contract as plain
    ``row_number``. Equal values always land in the same bucket, so the
    rank set {1..n} per group is exact regardless. NULL order keys get
    a dedicated first bucket, matching ``row_number``'s NULLS FIRST.

    ``order_col`` must be numeric: bucketing maps it through a cast to
    double, and for strings (or other non-numeric types) that mapping
    is not order-preserving ('15' < '2' lexically but 15.0 > 2.0), so
    the bucket-monotonicity invariant the exact-rank proof relies on
    would silently break — rejected up front instead.

    Cost note: the input's lineage is evaluated three times (bounds
    aggregate, the bucketed rank pass, the bucket-counts aggregate) —
    callers whose input is an expensive pipeline should materialize it
    first (as dense_token_ids in operators/bpe_batch.py does).
    """
    from pyspark.sql.types import (
        ByteType, DateType, DecimalType, DoubleType, FloatType,
        IntegerType, LongType, ShortType, TimestampType,
    )

    ot = df.schema[order_col].dataType
    _OK = (ByteType, ShortType, IntegerType, LongType, FloatType,
           DoubleType, DecimalType, DateType, TimestampType)
    if not isinstance(ot, _OK):
        raise TypeError(
            f"salted_rank order_col {order_col!r} has type {ot.simpleString()}; "
            "bucketing is only order-preserving for numeric/date/timestamp "
            "types (a lexical order key would silently mis-rank)"
        )
    lo, hi = f"_{out}_lo", f"_{out}_hi"
    bkt, lrnk, off = f"_{out}_bkt", f"_{out}_lrnk", f"_{out}_off"
    # r10 ADVICE: withColumn would silently OVERWRITE an input column
    # named `out`, and an input carrying one of the internal temporaries
    # (or the counts alias "_c") would corrupt the rank arithmetic —
    # reject up front instead of silently replacing.
    clash = {out, lo, hi, bkt, lrnk, off, "_c"} & set(df.columns)
    if clash:
        raise ValueError(
            f"salted_rank output/temp column(s) {sorted(clash)} already "
            f"exist in the input; pass a different `out` or rename the "
            "colliding input columns"
        )
    oc = (
        F.col(order_col).cast("timestamp").cast("double")
        if isinstance(ot, DateType)
        else F.col(order_col).cast("double")
    )
    bounds = df.groupBy(part_col).agg(F.min(oc).alias(lo), F.max(oc).alias(hi))
    d = df.join(F.broadcast(bounds), part_col)
    span = F.col(hi) - F.col(lo) + F.lit(1.0)
    bucket = (
        F.when(oc.isNull(), F.lit(-1))  # NULLS FIRST, own bucket
        .when(F.col(hi) <= F.col(lo), F.lit(0))
        .otherwise(
            F.least(
                F.lit(n_buckets - 1),
                F.floor((oc - F.col(lo)) * n_buckets / span).cast("int"),
            )
        )
    )
    d = d.withColumn(bkt, bucket).drop(lo, hi)
    from pyspark.sql import Window

    local = d.withColumn(
        lrnk, F.row_number().over(Window.partitionBy(part_col, bkt).orderBy(order_col))
    )
    counts = d.groupBy(part_col, bkt).agg(F.count(F.lit(1)).alias("_c"))
    offsets = counts.withColumn(
        off,
        F.coalesce(
            F.sum("_c").over(
                Window.partitionBy(part_col)
                .orderBy(bkt)
                .rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    ).select(part_col, bkt, off)
    return (
        local.join(F.broadcast(offsets), [part_col, bkt])
        .withColumn(out, (F.col(lrnk) + F.col(off)).cast("int"))
        .drop(bkt, lrnk, off)
    )


DICT_PACK = 1 << 31  # ids < 2^31 ⇒ id % DICT_PACK == id and
OOV_ID = -1  # unseen-token id for frozen-dictionary encoding: negative,

def dense_token_ids(ths: DataFrame, n_buckets: int | None = None) -> DataFrame:
    """(tok, tid) — every distinct token value of ``ths`` mapped to a
    dense id 0..V-1 ordered by token value. Built WITHOUT a global
    window: `salted_rank` over a single group spreads the rank
    computation across order-range buckets (the same order-correlated
    salt that fixes mega-key window skew) — the only single-task
    relations are the broadcast per-bucket bounds/offsets.

    ``n_buckets=None`` (default) adapts the bucket fan-out to the
    vocabulary size: one bucket per ~64k distinct tokens, capped at
    256 — a small vocabulary ranks in one task instead of paying the
    256-bucket bounds/offset machinery in stage latency, a 100 TB
    vocabulary still spreads across 256. The count this needs is the
    nid allocation base ``batched_bpe_train_dict`` pays anyway — it
    rides back on the returned relation as ``_wfc3_vocab_count`` so
    the caller doesn't count twice."""
    # materialized: salted_rank evaluates its input's lineage three
    # times (bounds / rank pass / bucket counts), and this lineage is a
    # corpus-wide explode+distinct shuffle — pay it once
    toks = materialize(
        ths.select(F.explode("th").alias("tok")).distinct(), force=True
    )
    v: int | None = None
    if n_buckets is None:
        v = toks.count()
        n_buckets = min(256, v // 65536 + 1)
    out = salted_rank(
        toks.withColumn("_g", F.lit(1)), "_g", "tok", n_buckets=n_buckets, out="_r"
    ).select("tok", (F.col("_r").cast("bigint") - 1).alias("tid"))
    if v is not None:
        out._wfc3_vocab_count = v
    return out


def translate_corpus(
    ths: DataFrame, dict_df: DataFrame, oov_id: int | None = None
) -> DataFrame:
    """Rewrite (doc_id, th) token-hash arrays into dictionary-id arrays
    via ``dict_df`` (tok, tid). One posexplode + one equi-join on tok
    (the dictionary is vocabulary-sized: Catalyst broadcasts it while it
    fits, a co-partitioned shuffle join past the threshold) + one doc_id
    re-group; empty docs survive via the left join-back.

    ``oov_id=None`` (training): every token is by construction in the
    dictionary — inner join. ``oov_id=k`` (frozen-dictionary encoding):
    unseen tokens map to ``k`` instead of being dropped."""
    pos = ths.select("doc_id", F.posexplode("th").alias("pos", "tok"))
    if oov_id is None:
        hit = pos.join(dict_df, "tok").select("doc_id", "pos", "tid")
    else:
        hit = pos.join(dict_df, "tok", "left").select(
            "doc_id",
            "pos",
            F.coalesce("tid", F.lit(oov_id).cast("bigint")).alias("tid"),
        )
    arr = hit.groupBy("doc_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "tid"))),
            lambda s: s["tid"],
        ).alias("th")
    )
    return ths.select("doc_id").join(arr, "doc_id", "left").select(
        "doc_id",
        F.coalesce("th", F.expr("CAST(array() AS ARRAY<BIGINT>)")).alias("th"),
    )


def _vocab_rounds(vocab: DataFrame, rounds: int | None, who: str) -> int:
    """Round count for a frozen-vocab pass: derived from the vocab
    (max(round)+1 — one 1-row scan of the bounded vocab relation) when
    ``rounds`` is None; an explicit under-covering value raises (it
    would silently skip merge rounds — r10 ADVICE), a larger one is a
    harmless identity no-op."""
    max_round = vocab.agg(F.max("round").alias("_mr")).collect()[0]["_mr"]
    n_rounds = 0 if max_round is None else int(max_round) + 1
    if rounds is None:
        return n_rounds
    if rounds < n_rounds:
        raise ValueError(
            f"{who} rounds={rounds} does not cover the vocab's "
            f"{n_rounds} merge rounds — the later rounds would be silently "
            "skipped; pass rounds=None to derive it"
        )
    return rounds


def encode_with_dict(
    ths: DataFrame, dict_df: DataFrame, vocab: DataFrame, rounds: int | None = None
) -> DataFrame:
    """Tokenizer INFERENCE: encode (doc_id, th) token-hash docs with a
    FROZEN dictionary + merge vocab from ``batched_bpe_train_dict`` —
    the pass a production pipeline runs over every new corpus shard
    after training once. Unseen tokens become ``OOV_ID`` (negative —
    every merge-map lookup on it misses, so it rides through verbatim).

    Per round the vocab slice is pairwise-disjoint BY CONSTRUCTION
    (that is what compatible_topm guarantees), so each round is one
    positional pass; batches from different rounds are NOT mutually
    disjoint and must apply in round order — ``rounds`` passes total,
    each a row-local rewrite off a broadcast ≤m-entry map. The vocab
    relation is bounded (≤ rounds·m rows), never corpus-sized.

    Unlike the TRAINER loop (whose round-r counts re-read round r-1's
    corpus, forcing per-round materialization), inference is a LINEAR
    chain — each round's output feeds only the next — so the passes
    compose into one lazy plan: ONE job for the whole encode instead
    of one per round (measured: −1.4 s of pure job-scheduling latency
    at gate scale). A checkpoint every ``_MAT_EVERY`` rounds bounds
    the generated-code depth on deep production vocab builds.

    ``rounds=None`` (default) derives the round count from the vocab
    itself (max(round)+1 — one 1-row scan of the bounded vocab
    relation). An explicit ``rounds`` smaller than what the vocab
    carries would SILENTLY skip the later merge rounds
    (under-encoding with no error — r10 ADVICE), so it is validated
    and raises; a larger value is a harmless no-op and stays allowed
    (the extra passes see empty batches → identity)."""
    rounds = _vocab_rounds(vocab, rounds, "encode_with_dict")
    _MAT_EVERY = 8
    cur = translate_corpus(ths, dict_df, oov_id=OOV_ID)
    for r in range(rounds):
        batch = vocab.where(F.col("round") == r).select("ar", "br", "nid")
        cur = apply_merge_batch(cur, batch, pack=DICT_PACK)
        if (r + 1) % _MAT_EVERY == 0 and r + 1 < rounds:
            cur = materialize(cur, force=True)
    return cur


def expand_merge_batch(ths: DataFrame, batch: DataFrame) -> DataFrame:
    """Inverse of :func:`apply_merge_batch` for ONE round: every merged
    token id in ``batch`` (ar, br, nid) expands back to its member pair
    [ar, br]; all other ids (dictionary ids, OOV_ID, other rounds'
    nids) ride through. Row-local flatten-transform off a 1-row
    broadcast nid-keyed map; an empty batch makes the map NULL and the
    pass the identity (same degenerate guard as apply)."""
    mp = batch.agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("nid"), F.struct("ar", "br")))
        ).alias("_dmp")
    )
    expr = """flatten(transform(th, x -> CASE
        WHEN try_element_at(_dmp, x) IS NOT NULL
        THEN array(try_element_at(_dmp, x).ar, try_element_at(_dmp, x).br)
        ELSE array(x) END))"""
    return ths.join(F.broadcast(mp), F.lit(True), "left").select(
        "doc_id", F.expr(expr).alias("th")
    )


def decode_with_dict(
    enc: DataFrame, vocab: DataFrame, rounds: int | None = None
) -> DataFrame:
    """Tokenizer DECODE: invert :func:`encode_with_dict` in id space —
    expand each round's merges in REVERSE round order (round r's fresh
    nids may contain earlier rounds' nids as members, so later rounds
    must unmerge first), recovering the dictionary-id translation of
    the original corpus exactly. OOV_ID is a fixpoint (never a map
    key). Lossless by construction: encode is a bijection between the
    translated corpus and (encoded corpus, vocab).

    Like encode, decode is a LINEAR chain of row-local rewrites — the
    passes compose into one lazy plan, checkpointed every ``_MAT_EVERY``
    rounds for codegen depth."""
    rounds = _vocab_rounds(vocab, rounds, "decode_with_dict")
    _MAT_EVERY = 8
    cur = enc
    for i, r in enumerate(reversed(range(rounds))):
        batch = vocab.where(F.col("round") == r).select("ar", "br", "nid")
        cur = expand_merge_batch(cur, batch)
        if (i + 1) % _MAT_EVERY == 0 and i + 1 < rounds:
            cur = materialize(cur, force=True)
    return cur


def batched_bpe_train_dict(
    ths: DataFrame, rounds: int, m: int, probe_mult: int = 4
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """The dictionary-id batched trainer: re-keys the corpus to dense
    ids, then runs ``rounds`` × ``m`` batched merges with fresh new-token
    ids allocated above the dictionary. Returns (encoded corpus in
    dictionary ids, vocab rows (round, rnk, ar, br, nid, cnt) — ar/br/
    nid all dictionary ids, and the dictionary itself (tok, tid)).

    The single driver-side scalar is the dictionary COUNT (the
    allocation base) — one number, not data. Everything else matches
    ``batched_bpe_train``'s shape: one count shuffle + one row-local
    rewrite per round, relations materialized per round."""
    if rounds < 1:
        raise ValueError(f"batched_bpe_train_dict needs rounds >= 1, got {rounds}")
    if m < 1:
        raise ValueError(f"batch size m must be >= 1, got {m}")
    dense = dense_token_ids(ths)
    dict_df = materialize(dense, force=True)
    # the adaptive-bucket path already counted the vocabulary; reuse it
    vocab_base = getattr(dense, "_wfc3_vocab_count", None)
    if vocab_base is None:
        vocab_base = dict_df.count()
    # max allocated nid is vocab_base + rounds*m - 1; it must stay < DICT_PACK
    if vocab_base + rounds * m - 1 >= DICT_PACK:
        raise ValueError(
            f"dictionary size {vocab_base} + {rounds * m} merges exceeds "
            f"DICT_PACK={DICT_PACK}: ids would no longer pack injectively"
        )
    cur = materialize(translate_corpus(ths, dict_df), force=True)
    vocab: DataFrame | None = None
    for r in range(rounds):
        batch = materialize(
            compatible_topm(
                bigram_counts(cur, pack=DICT_PACK),
                m,
                r,
                probe_mult,
                pack=DICT_PACK,
                vocab_base=vocab_base,
            ),
            eager=False,
            force=True,
        )
        tagged = batch.select(
            F.lit(r).cast("int").alias("round"), "rnk", "ar", "br", "nid", "cnt"
        )
        vocab = tagged if vocab is None else vocab.unionAll(tagged)
        cur = materialize(apply_merge_batch(cur, batch, pack=DICT_PACK), force=True)
    return cur, vocab, dict_df


T01D_ROUNDS = 4  # training rounds gated
T01D_M = 3       # batched merges/round — 12 total, past the embedded 7-slot bound
T01D_TRAIN_MOD = 2  # train slice: doc_id % 2 == 0; odd docs are inference-only


def dict_bpe_arms_r11(thd: DataFrame) -> DataFrame:
    """Build the five Spark-side arms off the SHARED materialized
    token-hash relation ``thd`` (doc_id, th) — t01 pays the tokenize +
    hash pass once for all its arms. Returns one 9-column relation in
    t01's layout, union of dictD/mergeD/encodeD/inferD/decodeD."""
    train = thd.where(F.col("doc_id") % T01D_TRAIN_MOD == 0)
    enc, vocab, dict_df = batched_bpe_train_dict(
        train, rounds=T01D_ROUNDS, m=T01D_M
    )
    # rounds intentionally omitted: derived from the vocab (the r10
    # ADVICE contract) — the gate exercises the derivation path.
    # materialized: the encoded corpus feeds two arms (inferD + the
    # decodeD roundtrip) — pay the lazy chain once
    inf = materialize(encode_with_dict(thd, dict_df, vocab), force=True)

    def _fp(col):
        return portable_hash64(
            F.coalesce(
                F.array_join(F.transform(col, lambda x: x.cast("string")), ","),
                F.lit(""),
            )
        )

    def _nulls():
        return [
            F.lit(None).cast("bigint").alias("n_chars"),
            F.lit(None).cast("bigint").alias("n_unique"),
            F.lit(None).cast("double").alias("punct_ratio"),
        ]

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
        F.lit("dictD").alias("which"),
        F.lit(-1).cast("bigint").alias("doc_id"),
        F.lit(None).cast("int").alias("chunk_id"),
        "n_tokens",
        F.lit(None).cast("bigint").alias("n_bpe_tokens"),
        *_nulls(),
        "fp",
    )
    vocab_arm = vocab.select(
        F.lit("mergeD").alias("which"),
        (F.col("ar") * (1 << 31) + F.col("br")).alias("doc_id"),
        (-(F.col("round") * T01D_M + F.col("rnk"))).cast("int").alias("chunk_id"),
        F.col("cnt").alias("n_tokens"),
        F.col("rnk").cast("bigint").alias("n_bpe_tokens"),
        F.col("ar").alias("n_chars"),
        F.col("br").alias("n_unique"),
        F.lit(None).cast("double").alias("punct_ratio"),
        F.col("nid").alias("fp"),
    )
    encode_arm = (
        train.select("doc_id", F.size("th").cast("bigint").alias("_n0"))
        .join(enc, "doc_id")
        .select(
            F.lit("encodeD").alias("which"),
            "doc_id",
            F.lit(None).cast("int").alias("chunk_id"),
            F.col("_n0").alias("n_tokens"),
            F.size("th").cast("bigint").alias("n_bpe_tokens"),
            *_nulls(),
            _fp("th").alias("fp"),
        )
    )
    infer_arm = (
        thd.select("doc_id", F.size("th").cast("bigint").alias("_n0"))
        .join(inf, "doc_id")
        .select(
            F.lit("inferD").alias("which"),
            "doc_id",
            F.lit(None).cast("int").alias("chunk_id"),
            F.col("_n0").alias("n_tokens"),
            F.size("th").cast("bigint").alias("n_bpe_tokens"),
            F.size(F.filter("th", lambda x: x < F.lit(0)))
            .cast("bigint")
            .alias("n_chars"),
            F.lit(None).cast("bigint").alias("n_unique"),
            F.lit(None).cast("double").alias("punct_ratio"),
            _fp("th").alias("fp"),
        )
    )
    # decodeD: unmerging the inference output in reverse round order
    # must reproduce the translated-with-OOV original exactly; the
    # per-doc match flag is value-gated, so both engines must agree the
    # roundtrip is lossless, not merely agree on a fingerprint
    dec = decode_with_dict(inf, vocab)
    tr0 = translate_corpus(thd, dict_df, oov_id=OOV_ID)
    decode_arm = (
        tr0.select("doc_id", F.col("th").alias("_t0"))
        .join(dec, "doc_id")
        .select(
            F.lit("decodeD").alias("which"),
            "doc_id",
            F.lit(None).cast("int").alias("chunk_id"),
            F.size("th").cast("bigint").alias("n_tokens"),
            F.when(F.col("th") == F.col("_t0"), 1)
            .otherwise(0)
            .cast("bigint")
            .alias("n_bpe_tokens"),
            *_nulls(),
            _fp("th").alias("fp"),
        )
    )
    return (
        dict_arm.unionAll(vocab_arm)
        .unionAll(encode_arm)
        .unionAll(infer_arm)
        .unionAll(decode_arm)
    )


def t01_token_stats_r11(spark, sf_dir):
    """Tokenization stats ('doc' arm: whitespace count, BPE-ish
    pre-tokenizer count — letter/digit/symbol runs with leading-space
    affinity, the GPT-2 first-split shape, engine-portable regex —
    punctuation ratio, vocab, whole-doc fingerprint) + fixed-budget
    token chunking ('chunk' arm: 50-token windows, per-chunk stats and
    content fingerprint) + sequence packing ('pack' arm: shard-local
    greedy fill of chunks into 512-token packs — per pack the token
    total, member-chunk count, distinct source docs, fill ratio, and a
    bit_xor content fingerprint; the chunk→pack chain is the
    training-data materialization an LLM pipeline runs before batch
    assembly) + temperature domain mixing ('mix' arm: α=0.5 weights
    ∝ sqrt(domain size) set per-domain epoch counts against a 2×-corpus
    token budget; every doc explodes into its domain's replica count,
    each replica keyed by a deterministic training-order shuffle hash —
    per-domain weight, replica totals, and a bit_xor over the shuffle
    keys are all value-gated) + model-based quality scoring ('score'
    arm: fastText-style linear classifier over hashed token features —
    exact bigint sparse dot product per doc, one map-side-combined
    groupBy).

    NEW (r8): 'url' — URL canonicalization + registered-domain
    extraction feeding a per-domain cap (functions/urls.py; planted
    deterministic URLs exercise every rule; the canonical-string
    fingerprint is the gate); 'encode' — the corpus-scale application
    of the trained BPE vocab (per-doc before/after counts + the exact
    encoded sequence fingerprint; the trainer relation now carries
    short docs through so the final merged relation IS the complete
    encoded corpus); 'lm' — bigram-LM perplexity quality scoring
    (CCNet-style), counts trained on the doc_id % 9 slice, add-one
    smoothed log-probs in integer micro-units for cross-engine
    determinism, per-doc score + OOV count + fixed-threshold bucket;
    'rank' — domain-level link-graph PAGERANK over a planted citation
    graph (operators/pagerank.py: all-integer power iterations,
    node-scale joins, corpus touched once for edge derivation; final +
    penultimate masses, in/out degrees gated).
    Each has a pure-python reference test in tests/test_text.py."""
    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    # per-doc stats materialize ONCE (numeric columns only — the text is
    # projected away, so this is a few MB at any corpus size): the 'doc'
    # arm is a projection of it and the 'mix' arm's domain aggregation
    # reads it instead of re-tokenizing the corpus (measured: the
    # duplicate tokenize pass alone was ~0.9 s of t01's sf0.1 cost)
    per_doc = docs.select(
        "doc_id",
        "lang",
        "source",
        token_count("text").alias("n_tokens"),
        bpe_token_count("text").alias("n_bpe_tokens"),
        F.length("text").cast("bigint").alias("n_chars"),
        F.size(F.array_distinct(tokens("text"))).cast("bigint").alias("n_unique"),
        F.round(punct_ratio("text"), 6).alias("punct_ratio"),
        portable_hash64(norm_text("text")).alias("fp"),
    ).transform(materialize)
    doc_arm = per_doc.select(
        F.lit("doc").alias("which"),
        "doc_id",
        F.lit(-1).cast("int").alias("chunk_id"),
        "n_tokens", "n_bpe_tokens", "n_chars", "n_unique",
        "punct_ratio", "fp",
    )
    # bind tokens to a COLUMN before the windowing lambda (see the arm
    # comment); the explode is row-local — no shuffle at any corpus size
    # four arms read the tokenized corpus (chunk, pack, score, merge);
    # measured A/B at sf0.1: materializing the token arrays is a WASH
    # (4.8 vs 4.7 s — the checkpoint write of corpus-sized arrays costs
    # what the saved re-splits save; the arms' own explodes + shuffles
    # dominate), so base stays a recomputed projection and the pruned
    # columnar scan is re-read per arm
    base = docs.select("doc_id", tokens("text").alias("t")).withColumn(
        "n_chunks",
        F.ceil(F.greatest(F.size("t"), F.lit(1)) / F.lit(float(CHUNK_TOKENS))).cast("int"),
    )
    k = CHUNK_TOKENS
    chunked = base.select(
        "doc_id",
        F.posexplode(
            F.expr(f"transform(sequence(0, n_chunks - 1), i -> slice(t, i*{k}+1, {k}))")
        ).alias("chunk_id", "ct"),
    )
    ctext = F.array_join("ct", " ")
    chunk_arm = chunked.select(
        F.lit("chunk").alias("which"),
        "doc_id",
        F.col("chunk_id").cast("int"),
        F.size("ct").cast("bigint").alias("n_tokens"),
        bpe_token_count(ctext).alias("n_bpe_tokens"),
        F.length(ctext).cast("bigint").alias("n_chars"),
        F.size(F.array_distinct("ct")).cast("bigint").alias("n_unique"),
        F.lit(None).cast("double").alias("punct_ratio"),
        portable_hash64(ctext).alias("fp"),
    )
    # 'pack' arm: shard-local greedy fill. The cumulative window is the
    # only shuffle (partitioned by shard — a GLOBAL order would funnel
    # the corpus through one sort task); pack membership = the pack of
    # the chunk's starting offset in its shard's token stream.
    from pyspark.sql import Window

    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id", "chunk_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = (
        chunked.select(
            (F.col("doc_id") % N_SHARDS).alias("shard"),
            "doc_id",
            "chunk_id",
            F.size("ct").cast("bigint").alias("n_tok"),
            F.length(ctext).cast("bigint").alias("n_ch"),
            portable_hash64(ctext).alias("cfp"),
        )
        .withColumn("cum", F.sum("n_tok").over(w))
        .withColumn(
            "pack_id",
            F.floor((F.col("cum") - F.col("n_tok")) / float(PACK_TOKENS)).cast("bigint"),
        )
    )
    pack_arm = (
        packed.groupBy("shard", "pack_id")
        .agg(
            F.sum("n_tok").cast("bigint").alias("n_tokens"),
            F.count(F.lit(1)).cast("bigint").alias("n_bpe_tokens"),
            F.sum("n_ch").cast("bigint").alias("n_chars"),
            F.count_distinct("doc_id").cast("bigint").alias("n_unique"),
            F.round(F.sum("n_tok") / F.lit(float(PACK_TOKENS)), 6).alias("punct_ratio"),
            F.expr("bit_xor(cfp)").alias("fp"),
        )
        .select(
            F.lit("pack").alias("which"),
            F.col("shard").alias("doc_id"),
            F.col("pack_id").cast("int").alias("chunk_id"),
            "n_tokens", "n_bpe_tokens", "n_chars", "n_unique",
            "punct_ratio", "fp",
        )
    )
    # 'mix' arm: α=0.5 temperature domain mixing (see the arm comment).
    # Two tiny aggs feed a broadcast 5-row weight dim; the replica
    # explode is row-local, so the corpus never shuffles for this arm.
    dom = per_doc.select("lang", "doc_id", F.col("n_tokens").alias("ntok"))
    # materialized (5 rows): wts is read TWICE (the reps broadcast and
    # the final select) and tot reads domstats again — un-truncated,
    # each of those four evaluations would re-aggregate (and before
    # per_doc was shared, re-tokenize: 1.6 s → 4.2 s at sf0.1);
    # checkpointed, everything downstream is 5-row arithmetic
    domstats = (
        dom.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("ntok").cast("bigint").alias("tok_d"),
        )
        # integer micro-unit sqrt weights: bigint sums are order-free
        # where a 4-double sum is not (see the arm comment's tie note)
        .withColumn("s_i", F.round(F.sqrt("n_docs") * 1e6, 0).cast("bigint"))
        .transform(materialize)
    )
    tot = domstats.agg(
        F.sum("s_i").cast("bigint").alias("denom"),
        F.sum("tok_d").cast("bigint").alias("tot_tok"),
    )
    w_d = F.col("s_i").cast("double") / F.col("denom")
    wts = domstats.join(F.broadcast(tot)).select(
        "lang", "n_docs", "tok_d",
        w_d.alias("w_d"),
        F.greatest(
            F.lit(1),
            F.floor(
                w_d * (MIX_BUDGET_X * F.col("tot_tok")) / F.col("tok_d") + 0.5
            ).cast("int"),
        ).alias("epochs"),
    )
    reps = (
        dom.join(F.broadcast(wts.select("lang", "epochs")), "lang")
        .select(
            "lang", "doc_id",
            F.explode(F.sequence(F.lit(1), F.col("epochs"))).alias("replica"),
        )
        .select(
            "lang", "doc_id",
            portable_hash64(F.concat_ws(":", "doc_id", "replica")).alias("key"),
        )
    )
    ragg = reps.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("replicas"),
        F.count_distinct("doc_id").cast("bigint").alias("uniq"),
        F.expr("bit_xor(key)").alias("fp"),
    )
    # domain id = hash of the lang itself (content-addressed): a
    # row_number index would need an unpartitioned window — a global
    # sort funnel the plan-shape guard rightly rejects even at 5 rows
    mix_arm = wts.join(ragg, "lang").select(
        F.lit("mix").alias("which"),
        portable_hash64("lang").alias("doc_id"),
        F.lit(-1).cast("int").alias("chunk_id"),
        F.col("tok_d").alias("n_tokens"),
        F.col("n_docs").alias("n_bpe_tokens"),
        F.col("replicas").alias("n_chars"),
        F.col("uniq").alias("n_unique"),
        F.round("w_d", 6).alias("punct_ratio"),
        "fp",
    )
    # 'score' arm: hashed-feature linear quality scorer (see the arm
    # comment). base already binds the token array to a column — reuse
    # it so the corpus isn't re-split; the explode is row-local and the
    # single groupBy's map-side combine keeps the shuffle per-doc-sized.
    feat = (
        base.select("doc_id", F.explode("t").alias("tok"))
        .where(F.col("tok") != "")
        .select("doc_id", (portable_hash64("tok") % SCORE_D).alias("b"))
        .withColumn("wgt", (F.col("b") * SCORE_MULT) % SCORE_MOD - SCORE_SHIFT)
    )
    score_arm = (
        feat.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.sum(F.when(F.col("wgt") > 0, 1).otherwise(0))
            .cast("bigint").alias("n_bpe_tokens"),
            F.sum("wgt").cast("bigint").alias("n_chars"),
            F.count_distinct("b").cast("bigint").alias("n_unique"),
        )
        .select(
            F.lit("score").alias("which"),
            "doc_id",
            F.lit(-1).cast("int").alias("chunk_id"),
            "n_tokens", "n_bpe_tokens", "n_chars", "n_unique",
            F.round(F.col("n_chars") / F.col("n_tokens"), 6).alias("punct_ratio"),
            F.lit(None).cast("bigint").alias("fp"),
        )
    )
    # 'sample' arm: deterministic stratified sampling (see the arm
    # comment). Reads per_doc (already materialized — no text, no extra
    # corpus pass): the Bernoulli draw is a row-local hash predicate,
    # the holdout is one per-stratum rank shuffle.
    smp_sel = F.when(
        portable_hash64(F.concat(F.lit("smp|"), F.col("doc_id").cast("string")))
        % SAMPLE_MOD
        == 0,
        1,
    ).otherwise(0)
    sampagg = (
        per_doc.select("lang", "doc_id", smp_sel.alias("sel"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pop"),
            F.sum("sel").cast("bigint").alias("n_samp"),
            F.expr("bit_xor(CASE WHEN sel = 1 THEN doc_id END)").alias("sxor"),
        )
    )
    holdagg = (
        per_doc.select(
            "lang",
            "doc_id",
            portable_hash64(
                F.concat(F.lit("hold|"), F.col("doc_id").cast("string"))
            ).alias("hkey"),
        )
        .withColumn(
            "rn",
            F.row_number().over(Window.partitionBy("lang").orderBy("hkey", "doc_id")),
        )
        .where(F.col("rn") <= HOLD_K)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_hold"),
            F.expr("bit_xor(hkey)").alias("hfp"),
        )
    )
    sample_arm = sampagg.join(holdagg, "lang").select(
        F.lit("sample").alias("which"),
        portable_hash64("lang").alias("doc_id"),
        F.lit(-1).cast("int").alias("chunk_id"),
        F.col("n_pop").alias("n_tokens"),
        F.col("n_samp").alias("n_bpe_tokens"),
        F.col("n_hold").alias("n_chars"),
        F.col("sxor").alias("n_unique"),
        F.round(F.col("n_samp").cast("double") / F.col("n_pop"), 6).alias(
            "punct_ratio"
        ),
        F.col("hfp").alias("fp"),
    )
    # 'funnel' arm: FILTER-CASCADE SURVIVAL REPORT — the bookkeeping
    # every corpus-curation pipeline publishes: three cumulative filter
    # stages (length floor → vocabulary floor → length ceiling, all
    # integer thresholds so no fp boundary can flip membership) with
    # per-stage (n_in, n_out, dropped, survivor-set xor, survival rate).
    # The survivor XOR gates the exact surviving SET, not just counts —
    # a filter that swaps two docs with equal tallies still fails.
    # Reads per_doc; one tiny aggregate, three projected rows. Column
    # mapping: doc_id ≡ stage, n_tokens ≡ n_in, n_bpe_tokens ≡ n_out,
    # n_chars ≡ dropped, n_unique ≡ xor of survivors, punct_ratio ≡
    # round(survival, 6).
    fflags = per_doc.select(
        "doc_id",
        (F.col("n_tokens") >= 20).alias("c1"),
        ((F.col("n_tokens") >= 20) & (F.col("n_unique") >= 15)).alias("c2"),
        (
            (F.col("n_tokens") >= 20)
            & (F.col("n_unique") >= 15)
            & (F.col("n_tokens") <= 90)
        ).alias("c3"),
    )
    fagg = fflags.agg(
        F.count(F.lit(1)).cast("bigint").alias("n0"),
        F.sum(F.when(F.col("c1"), 1).otherwise(0)).cast("bigint").alias("n1"),
        F.sum(F.when(F.col("c2"), 1).otherwise(0)).cast("bigint").alias("n2"),
        F.sum(F.when(F.col("c3"), 1).otherwise(0)).cast("bigint").alias("n3"),
        F.expr("bit_xor(CASE WHEN c1 THEN doc_id END)").alias("x1"),
        F.expr("bit_xor(CASE WHEN c2 THEN doc_id END)").alias("x2"),
        F.expr("bit_xor(CASE WHEN c3 THEN doc_id END)").alias("x3"),
    ).transform(materialize)  # 1 row; three projections below read it

    def _funnel_row(stage, n_in, n_out, sx):
        return fagg.select(
            F.lit("funnel").alias("which"),
            F.lit(stage).cast("bigint").alias("doc_id"),
            F.lit(-1).cast("int").alias("chunk_id"),
            F.col(n_in).alias("n_tokens"),
            F.col(n_out).alias("n_bpe_tokens"),
            (F.col(n_in) - F.col(n_out)).alias("n_chars"),
            F.col(sx).alias("n_unique"),
            F.round(F.col(n_out).cast("double") / F.col(n_in), 6).alias("punct_ratio"),
            F.lit(None).cast("bigint").alias("fp"),
        )

    funnel_arm = (
        _funnel_row(1, "n0", "n1", "x1")
        .unionAll(_funnel_row(2, "n1", "n2", "x2"))
        .unionAll(_funnel_row(3, "n2", "n3", "x3"))
    )
    # 'cap' arm: PER-SOURCE QUOTA — the per-domain cap of the CCNet/
    # RefinedWeb-style pipelines: rank each source's docs by vocabulary
    # richness (n_unique desc, doc_id tiebreak — deterministic in both
    # engines) and keep the top CAP_N. Reads per_doc (no extra corpus
    # pass); one shuffle on source for the two windows. Column meanings:
    # chunk_id ≡ rank within source, n_tokens ≡ the doc's distinct-token
    # count (the rank key), n_bpe_tokens ≡ source population, n_chars ≡
    # kept count, punct_ratio ≡ kept fraction, fp ≡ hash64(source).
    wcap = Window.partitionBy("source").orderBy(F.col("n_unique").desc(), "doc_id")
    cap_arm = (
        per_doc.select("source", "doc_id", "n_unique")
        .withColumn("rnk", F.row_number().over(wcap))
        .withColumn(
            "n_pop", F.count(F.lit(1)).over(Window.partitionBy("source")).cast("bigint")
        )
        .where(F.col("rnk") <= CAP_N)
        .select(
            F.lit("cap").alias("which"),
            "doc_id",
            F.col("rnk").cast("int").alias("chunk_id"),
            F.col("n_unique").alias("n_tokens"),
            F.col("n_pop").alias("n_bpe_tokens"),
            F.least(F.col("n_pop"), F.lit(CAP_N).cast("bigint")).alias("n_chars"),
            F.lit(None).cast("bigint").alias("n_unique"),
            F.round(
                F.least(F.col("n_pop"), F.lit(CAP_N).cast("bigint")).cast("double")
                / F.col("n_pop"),
                6,
            ).alias("punct_ratio"),
            portable_hash64("source").alias("fp"),
        )
    )
    # 'url' arm: URL CANONICALIZATION + REGISTERED-DOMAIN CAP — the
    # first grouping key of a web-corpus pipeline (the CCNet/RefinedWeb
    # per-domain quota), on planted deterministic URLs (the corpus has
    # no URL column; same plant pattern as t02's PII/boilerplate — the
    # plant exercises every canonicalization rule: mixed case, www,
    # default/non-default ports, multi-part public suffixes, tracking
    # params incl. all-tracking queries, fragments, empty paths).
    # Canonicalize + domain-extract are pure row-local expressions
    # (functions/urls.py); the ONLY exchange is the per-domain window —
    # the shape a per-domain cap has at any scale (a skewed mega-domain
    # is AQE skew-split territory, SCALING.md). Column meanings:
    # chunk_id ≡ rank within domain, n_tokens ≡ domain population,
    # n_bpe_tokens ≡ kept-under-cap flag, n_chars ≡ hash64(reg_domain),
    # n_unique ≡ length(canon_url), punct_ratio ≡ kept fraction, fp ≡
    # hash64(canon_url) — the fingerprint IS the canonicalization gate.
    # pinned module-level copies of planted_url / with_url_columns

    urls_df = with_url_columns(
        docs.select("doc_id", planted_url("doc_id", "source").alias("_url")), "_url"
    )
    wdom = Window.partitionBy("reg_domain").orderBy("doc_id")
    url_arm = (
        urls_df.withColumn("rnk", F.row_number().over(wdom))
        .withColumn(
            "n_pop",
            F.count(F.lit(1)).over(Window.partitionBy("reg_domain")).cast("bigint"),
        )
        .select(
            F.lit("url").alias("which"),
            "doc_id",
            F.col("rnk").cast("int").alias("chunk_id"),
            F.col("n_pop").alias("n_tokens"),
            (F.col("rnk") <= URL_CAP_N).cast("bigint").alias("n_bpe_tokens"),
            portable_hash64("reg_domain").alias("n_chars"),
            F.length("canon_url").cast("bigint").alias("n_unique"),
            F.round(
                F.least(F.col("n_pop"), F.lit(URL_CAP_N).cast("bigint")).cast("double")
                / F.col("n_pop"),
                6,
            ).alias("punct_ratio"),
            portable_hash64("canon_url").alias("fp"),
        )
    )
    # 'rank' arm: domain-level LINK-GRAPH PAGERANK (the Common-Crawl
    # "rank domains, filter the tail" quality signal) over a planted
    # deterministic link graph: doc d cites doc (131·d + 7) mod N, and
    # every third doc ALSO cites (5·d + 1) mod N (N riding a broadcast
    # 1-row count — no collect). The second family is the SKEW plant:
    # 131 is coprime to every domain-residue modulus so the base family
    # is domain-uniform (at r8 the graph was perfectly regular and every
    # mass sat exactly on the uniform share — no decision to gate), but
    # 5·(3k)+1 mod 20 only hits residues {1, 6, 11, 16}, so four hub
    # domains collect extra in-mass and the kept/dropped threshold
    # genuinely splits. Edges lift to (src_domain → dst_domain) with
    # multiplicity weights, and
    # operators/pagerank.integer_pagerank runs k=PR_K all-integer power
    # iterations (masses in micro-units, floor-per-edge distribution —
    # bit-identical cross-engine, see the operator docstring). The
    # corpus appears ONCE (edge derivation: a projection + one
    # self-join on the computed citation id); every iteration is
    # node-scale. Column meanings: doc_id ≡ hash64(domain), n_tokens ≡
    # out-weight, n_bpe_tokens ≡ in-edge count, n_chars ≡ final mass,
    # punct_ratio ≡ mass/scale, fp ≡ penultimate mass (gating the
    # convergence trajectory, not just the endpoint), and since r9
    # n_unique ≡ the PIPELINE DECISION (r8 verdict ask #7): kept=1 iff
    # mass ≥ the uniform share scale DIV N — the "drop the rank tail"
    # quality filter, all-integer (mass·N vs scale stays < 2^63: mass ≤
    # scale=1e12, and N is domain-count-sized), N riding the same
    # broadcast 1-row node count on both engines.
    # pinned module-level copies of PR_SCALE / integer_pagerank

    cnt_rel = docs.agg(F.count(F.lit(1)).cast("bigint").alias("_c"))
    link_a = urls_df.select("doc_id", F.col("reg_domain").alias("_sdom"))
    link_b = urls_df.select(
        F.col("doc_id").alias("_t"), F.col("reg_domain").alias("_ddom")
    )
    cites = link_a.join(F.broadcast(cnt_rel)).withColumn(
        "_t", F.expr("(doc_id * 131 + 7) % _c")
    )
    cites_skew = (
        link_a.where(F.col("doc_id") % 3 == 0)
        .join(F.broadcast(cnt_rel))
        .withColumn("_t", F.expr("(doc_id * 5 + 1) % _c"))
    )
    links = (
        cites.unionByName(cites_skew)
        .join(link_b, "_t")
        .where(F.col("_sdom") != F.col("_ddom"))
        .groupBy(F.col("_sdom").alias("src"), F.col("_ddom").alias("dst"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("w"))
        .transform(materialize)
    )
    pr = integer_pagerank(links, k=PR_K, node_col="node")
    pr_in = links.groupBy("dst").agg(F.count(F.lit(1)).cast("bigint").alias("_in"))
    pr_out = links.groupBy("src").agg(F.sum("w").cast("bigint").alias("_ow"))
    pr_n = pr.agg(F.count(F.lit(1)).cast("bigint").alias("_nn"))
    rank_arm = (
        pr.join(pr_out.withColumnRenamed("src", "node"), "node", "left")
        .join(pr_in.withColumnRenamed("dst", "node"), "node", "left")
        .join(F.broadcast(pr_n))
        .select(
            F.lit("rank").alias("which"),
            portable_hash64("node").alias("doc_id"),
            F.lit(None).cast("int").alias("chunk_id"),
            F.coalesce("_ow", F.lit(0)).cast("bigint").alias("n_tokens"),
            F.coalesce("_in", F.lit(0)).cast("bigint").alias("n_bpe_tokens"),
            F.col("mass").alias("n_chars"),
            F.when(F.col("mass") * F.col("_nn") >= F.lit(PR_SCALE), F.lit(1))
            .otherwise(F.lit(0))
            .cast("bigint")
            .alias("n_unique"),
            F.round(F.col("mass").cast("double") / F.lit(float(PR_SCALE)), 6).alias(
                "punct_ratio"
            ),
            F.col("prev_mass").alias("fp"),
        )
    )
    # 'merge' arm: BPE-training merge candidates (see the arm comment).
    # Pairs explode row-locally off the bound token column and compress
    # to 60-bit hashes before the ONE count shuffle; Σcounts comes from
    # the aggregated pair-vocab relation (materialized — it feeds the
    # top-k AND the total), not a second corpus pass; the global rank
    # window only ever sees MERGE_K rows (post-limit).
    # token-hash arrays feed BOTH merge iterations (the iter-1 explode
    # and the iter-2 apply+explode) — materialized so the regex split +
    # per-token md5 happens once
    thd = materialize(
        base.select(
            "doc_id",
            F.transform(
                F.filter("t", lambda x: x != F.lit("")),
                lambda x: portable_hash64(x),
            ).alias("th"),
        )
    )

    def _bigram_agg(src):
        pairs = (
            src.where(F.size("th") >= 2)
            .select(
                "doc_id",
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(th)-1),"
                        " i -> struct(element_at(th, i) AS ha, element_at(th, i+1) AS hb))"
                    )
                ).alias("p"),
            )
            .select(
                "doc_id",
                (
                    (F.col("p.ha") % _PAIR_PACK) * _PAIR_PACK
                    + F.col("p.hb") % _PAIR_PACK
                ).alias("h"),
                F.col("p.ha").bitwiseXOR(F.col("p.hb")).alias("mx"),
            )
        )
        # materialized: the pair-vocab relation feeds the top-k, Σcounts
        # and (for iteration 1) the winner selection
        return materialize(
            pairs.groupBy("h", "mx").agg(
                F.count(F.lit(1)).cast("bigint").alias("cnt"),
                F.count_distinct("doc_id").cast("bigint").alias("ndocs"),
            )
        )

    def _merge_rows(agg, tag):
        tot = agg.agg(F.sum("cnt").cast("bigint").alias("tot"))
        # rank WITHOUT a global window (the t01 plan guard bans
        # unpartitioned windows on this query, and rightly — a regex
        # guard can't see that the input is post-limit): a MERGE_K²
        # broadcast inequality self-join counts strict predecessors.
        top = (
            agg.orderBy(F.desc("cnt"), F.asc("h"), F.asc("mx"))
            .limit(MERGE_K)
            .transform(lambda df: materialize(df, eager=False))
        )
        rnk = (
            top.alias("x")
            .join(
                F.broadcast(top.alias("y")),
                F.expr(
                    "y.cnt > x.cnt OR (y.cnt = x.cnt AND y.h < x.h) "
                    "OR (y.cnt = x.cnt AND y.h = x.h AND y.mx < x.mx)"
                ),
                "left",
            )
            .groupBy("x.h", "x.mx", "x.cnt", "x.ndocs")
            .agg((F.count("y.h") + 1).cast("int").alias("rnk"))
        )
        return rnk.join(F.broadcast(tot)).select(
            F.lit(tag).alias("which"),
            F.col("h").alias("doc_id"),
            F.col("rnk").alias("chunk_id"),
            F.col("cnt").alias("n_tokens"),
            F.col("ndocs").alias("n_bpe_tokens"),
            F.col("mx").alias("n_chars"),
            F.lit(None).cast("bigint").alias("n_unique"),
            F.round(F.col("cnt").cast("double") / F.col("tot"), 6).alias(
                "punct_ratio"
            ),
            F.lit(None).cast("bigint").alias("fp"),
        )

    # The k-ITERATION BPE TRAINER (r6 verdict ask #6 — the iterative
    # shape, not unrolled copies). Per iteration: pick the winner (top
    # pair whose member residues differ — non-overlapping occurrences,
    # so the apply step is a pure positional transform), APPLY it (every
    # occurrence collapses to new token id h + i·2^60), recount bigrams.
    # All hard indexes stay in [1, size]; only the i+1 lookahead uses
    # try_element_at (NULL past the end, matching DuckDB's NULL-safe
    # list indexing) — ANSI mode throws on true out-of-range element_at.
    # Iteration hygiene: the merged array relation AND the winner row
    # are materialized each iteration (lineage truncated), so iteration
    # k's plan never re-embeds iterations 1..k-1 — and the per-iteration
    # cost stays ONE explode + one map-side-combined count shuffle over
    # bigint keys, the shape that holds at a 100 TB corpus. Winner
    # selection is a LIMIT 1 on the aggregated pair vocab (no collect —
    # the loop stays fully lazy; k is a static trainer parameter).
    apply_expr = f"""filter(transform(sequence(1, size(th)), i -> CASE
        WHEN i > 1 AND element_at(th, greatest(i - 1, 1)) % {_PAIR_PACK} = ar
             AND element_at(th, i) % {_PAIR_PACK} = br THEN CAST(NULL AS BIGINT)
        WHEN try_element_at(th, i + 1) % {_PAIR_PACK} = br
             AND element_at(th, i) % {_PAIR_PACK} = ar THEN nid
        ELSE element_at(th, i) END), x -> x IS NOT NULL)"""
    assert K_BPE >= 2, "the 'merge2' arm reads iteration 2's counts"
    aggs: dict[int, object] = {1: _bigram_agg(thd)}
    winners = []  # the accumulated vocab relation, one row per iteration
    ths_cur = thd
    for i in range(2, K_BPE + 1):
        w = i - 1
        # mx in the tiebreak mirrors the SQL twin: a (cnt, h) tie between
        # two (h, mx) groups (packed-residue collision) must pick the same
        # winner on both engines now that wmx/wndocs are gated output
        winner = materialize(
            aggs[w]
            .where(F.expr(f"h DIV {_PAIR_PACK} <> h % {_PAIR_PACK}"))
            .orderBy(F.desc("cnt"), F.asc("h"), F.asc("mx"))
            .limit(1)
            .select(
                F.expr(f"h DIV {_PAIR_PACK}").alias("ar"),
                (F.col("h") % _PAIR_PACK).alias("br"),
                (F.col("h") + F.lit(w * (1 << 60))).alias("nid"),
                F.col("h").alias("wh"),
                F.col("mx").alias("wmx"),
                F.col("cnt").alias("wcnt"),
                F.col("ndocs").alias("wndocs"),
            )
        )
        winners.append(winner)
        # materializing the merged-array relation wins over recomputing
        # the positional transform into each consumer (A/B at sf0.1:
        # 7.9-8.5 s materialized vs 8.7-9.3 s recomputed, frozen and
        # full both) — the array rewrite is the trainer's hot loop.
        # Short docs pass through unmerged (CASE, matching the SQL twin)
        # so the final relation is the COMPLETE encoded corpus.
        # LEFT join (not cross): on a degenerate corpus where an
        # iteration has no valid merge pair the winner relation is
        # EMPTY, and a cross join would silently empty the whole
        # encoded relation (r8 ADVICE). Left-join-on-true instead makes
        # the application a NO-OP there: ar/br/nid come back NULL, every
        # CASE predicate evaluates NULL → ELSE → identity, and the
        # filter keeps all positions — same broadcast-nested-loop plan,
        # winner present or not.
        ths_cur = materialize(
            ths_cur.join(
                F.broadcast(winner.select("ar", "br", "nid")), F.lit(True), "left"
            )
            .select(
                "doc_id",
                F.when(F.size("th") >= 2, F.expr(apply_expr))
                .otherwise(F.col("th"))
                .alias("th"),
            )
        )
        aggs[i] = _bigram_agg(ths_cur)

    merge_arm = _merge_rows(aggs[1], "merge")
    merge2_arm = _merge_rows(aggs[2], "merge2")
    # 'mergeK': iteration-K candidates + the accumulated vocab (one row
    # per applied winner: chunk_id = -iteration, fp = assigned token id)
    mergek_arm = _merge_rows(aggs[K_BPE], "mergeK")
    for w, winner in enumerate(winners, start=1):
        mergek_arm = mergek_arm.unionAll(
            winner.select(
                F.lit("mergeK").alias("which"),
                F.col("wh").alias("doc_id"),
                F.lit(-w).cast("int").alias("chunk_id"),
                F.col("wcnt").alias("n_tokens"),
                F.col("wndocs").alias("n_bpe_tokens"),
                F.col("wmx").alias("n_chars"),
                F.lit(None).cast("bigint").alias("n_unique"),
                F.lit(None).cast("double").alias("punct_ratio"),
                F.col("nid").alias("fp"),
            )
        )
    # 'encode' arm: the corpus-scale APPLICATION of the trained vocab —
    # the pass a pipeline runs nightly over new data. BPE encoding IS
    # the merge list applied in training order, which is exactly what
    # the trainer's per-iteration positional transform computed, and
    # since round 8 the relation carries short docs through unchanged —
    # so ths_cur after the k-1 winner applications is the COMPLETE
    # encoded corpus. Gate per-doc before/after token counts and the
    # full encoded-sequence fingerprint (comma-joined decimal render,
    # identical on both engines) against the oracle's ths{k}. One
    # doc-keyed join of two already-materialized doc-sized relations.
    encode_arm = (
        thd.select("doc_id", F.size("th").cast("bigint").alias("_n0"))
        .join(ths_cur, "doc_id")
        .select(
            F.lit("encode").alias("which"),
            "doc_id",
            F.lit(None).cast("int").alias("chunk_id"),
            F.col("_n0").alias("n_tokens"),
            F.size("th").cast("bigint").alias("n_bpe_tokens"),
            F.lit(None).cast("bigint").alias("n_chars"),
            F.lit(None).cast("bigint").alias("n_unique"),
            F.lit(None).cast("double").alias("punct_ratio"),
            portable_hash64(
                F.array_join(F.transform("th", lambda x: x.cast("string")), ",")
            ).alias("fp"),
        )
    )
    # 'mergeB' arm: the BATCHED-merge BPE trainer (see the arm comment
    # and operators/bpe_batch.py — the scale form of the sequential
    # trainer: one job per ROUND of up to BB_M pairwise-disjoint
    # merges, not one per merge). Runs its own BB_ROUNDS rounds off the
    # shared materialized token-hash relation; per round the cost is
    # ONE map-side-combined bigram-count shuffle over 60-bit keys, two
    # ≤16-row broadcast self-joins, a 1-row broadcast map relation, and
    # a row-local corpus rewrite (materialized — same lineage hygiene
    # as the sequential loop). In production you run EITHER this OR the
    # sequential trainer; the gate runs both to cross-check them, so
    # the round-0 bigram count intentionally duplicates aggs[1]'s work
    # at gate scale rather than complicating the operator's contract
    # with a precomputed-counts argument.
    bb_corpus, bb_vocab = batched_bpe_train(thd, rounds=BB_ROUNDS, m=BB_M)
    mergeb_arm = bb_vocab.select(
        F.lit("mergeB").alias("which"),
        (F.col("ar") * _PAIR_PACK + F.col("br")).alias("doc_id"),
        (-(F.col("round") * BB_M + F.col("rnk"))).cast("int").alias("chunk_id"),
        F.col("cnt").alias("n_tokens"),
        F.col("rnk").cast("bigint").alias("n_bpe_tokens"),
        F.col("ar").alias("n_chars"),
        F.col("br").alias("n_unique"),
        F.lit(None).cast("double").alias("punct_ratio"),
        F.col("nid").alias("fp"),
    ).unionAll(
        thd.select("doc_id", F.size("th").cast("bigint").alias("_n0"))
        .join(bb_corpus, "doc_id")
        .select(
            F.lit("mergeB").alias("which"),
            "doc_id",
            F.lit(None).cast("int").alias("chunk_id"),
            F.col("_n0").alias("n_tokens"),
            F.size("th").cast("bigint").alias("n_bpe_tokens"),
            F.lit(None).cast("bigint").alias("n_chars"),
            F.lit(None).cast("bigint").alias("n_unique"),
            F.lit(None).cast("double").alias("punct_ratio"),
            portable_hash64(
                F.array_join(F.transform("th", lambda x: x.cast("string")), ",")
            ).alias("fp"),
        )
    )
    # 'lm' arm: BIGRAM-LM PERPLEXITY quality score (the CCNet-style
    # signal; the 'score' arm is its linear-classifier counterpart).
    # Counts train on the doc_id % LM_TRAIN_MOD slice; every doc is
    # scored by add-one-smoothed log-probs in integer micro-units (see
    # _lm_ctes_sql for the cross-engine determinism argument). Shuffle
    # shape: the bigram relation moves as 3 bigints and is materialized
    # once for its three consumers; count relations are vocab-sized and
    # join on the hash keys (co-located at scale, broadcast at gate
    # scale — AQE's call); text never rides anything.
    lmbig = materialize(
        thd.where(F.size("th") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(th) - 1),"
                    " i -> struct(element_at(th, i) AS ha,"
                    " element_at(th, i + 1) AS hb))"
                )
            ).alias("p"),
        )
        .select("doc_id", "p.ha", "p.hb")
    )
    lm_train = lmbig.where(F.col("doc_id") % LM_TRAIN_MOD == 0)
    lmctx = lm_train.groupBy("ha").agg(F.count(F.lit(1)).cast("bigint").alias("c_ctx"))
    lmpc = lm_train.groupBy("ha", "hb").agg(
        F.count(F.lit(1)).cast("bigint").alias("c_ab")
    )
    lmv = (
        thd.where(F.col("doc_id") % LM_TRAIN_MOD == 0)
        .select(F.explode("th").alias("u"))
        .agg(F.count_distinct("u").cast("bigint").alias("v"))
    )
    lp = F.round(
        F.lit(1000000.0)
        * F.log(
            (F.coalesce("c_ab", F.lit(0)) + 1)
            / (F.coalesce("c_ctx", F.lit(0)) + F.col("v")).cast("double")
        ),
        0,
    ).cast("bigint")
    lmsc = (
        lmbig.join(lmpc, ["ha", "hb"], "left")
        .join(lmctx, "ha", "left")
        .join(F.broadcast(lmv))
        .groupBy("doc_id")
        .agg(
            F.sum(lp).cast("bigint").alias("score"),
            F.sum(F.when(F.col("c_ab").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_oov"),
        )
    )
    lm_doc = (
        thd.select(
            "doc_id",
            F.greatest(F.size("th") - 1, F.lit(0)).cast("bigint").alias("nb"),
        )
        .join(lmsc, "doc_id", "left")
        .select(
            "doc_id",
            "nb",
            F.coalesce("score", F.lit(0)).cast("bigint").alias("score"),
            F.coalesce("n_oov", F.lit(0)).cast("bigint").alias("n_oov"),
        )
    )
    lm_avg = F.col("score").cast("double") / F.col("nb")
    lm_arm = lm_doc.select(
        F.lit("lm").alias("which"),
        "doc_id",
        F.when(F.col("nb") == 0, F.lit(-1))
        .otherwise(
            F.least(
                F.lit(LM_BUCKETS - 1),
                F.greatest(
                    F.lit(0), F.floor((lm_avg + 15000000) / 1000000.0).cast("int")
                ),
            )
        )
        .cast("int")
        .alias("chunk_id"),
        F.col("nb").alias("n_tokens"),
        F.col("n_oov").alias("n_bpe_tokens"),
        F.lit(None).cast("bigint").alias("n_chars"),
        F.lit(None).cast("bigint").alias("n_unique"),
        F.when(F.col("nb") == 0, F.lit(0.0))
        .otherwise(F.round(lm_avg / 1000000.0, 6))
        .alias("punct_ratio"),
        F.col("score").alias("fp"),
    )
    return (
        doc_arm.unionAll(chunk_arm).unionAll(pack_arm)
        .unionAll(mix_arm).unionAll(score_arm).unionAll(sample_arm)
        .unionAll(funnel_arm).unionAll(cap_arm).unionAll(url_arm)
        .unionAll(rank_arm)
        .unionAll(merge_arm).unionAll(merge2_arm).unionAll(mergek_arm)
        .unionAll(mergeb_arm).unionAll(encode_arm).unionAll(lm_arm)
        .unionAll(dict_bpe_arms_r11(thd))
    )
