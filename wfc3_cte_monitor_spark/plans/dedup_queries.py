"""Deduplication queries over the documents table (additive surface,
BASELINE.json north star): exact, MinHash+LSH, SimHash, n-gram Jaccard —
all fully DuckDB-oracle-checked via the portable md5 hash."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..checkpointing import materialize
from ..functions.dedup import (
    duplicated_spans,
    fingerprint128,
    has_dup_groups,
    lsh_bands,
    lsh_bands_sql,
    minhash_signature,
    minhash_signature_sql,
    simhash16_sql,
)
from ..functions.text import (
    portable_hash64,
    portable_hash64_sql,
    shingles_sql_inline,
    tokens,
    tokens_sql,
)
from ..sources.catalog import load_table, spread
from .registry import register


# D1 — EXACT dedup, two arms in one tagged union:
#   which='exact' — whole-document: documents whose sorted distinct
#                   token sets coincide collapse to one cluster
#                   (hash-groupBy on the fingerprint; one shuffle).
#   which='spans' — span-level exact-substring dedup (the ExactSubstr
#                   removal shape of Lee et al., "Deduplicating Training
#                   Data Makes Language Models Better"): positional
#                   token K-gram windows → windows whose hash occurs in
#                   >= 2 distinct docs are duplicated → per doc,
#                   overlapping/adjacent duplicated windows merge
#                   gap-and-island into MAXIMAL duplicated spans; the
#                   output is what a span-removal pass consumes
#                   (span count, covered tokens, coverage fraction),
#                   not just a doc-level verdict. Only docs with >= 1
#                   duplicated span appear.
# Scale: the positional-window relation is corpus-token-sized but
# row-local to build (posexplode + lead, whole-stage codegen); the
# duplicate set is one map-side-combined groupBy on the 60-bit window
# hash; the hit probe is a semi-join co-located on that same hash; the
# island merge sorts WITHIN doc_id partitions only (bounded by doc
# length, never global). No all-pairs stage anywhere — at 100 TB the
# quadratic "which docs share text" question stays inside hash buckets.
# K=5 (vs the shingle k=3 used elsewhere): at k=3 the synthetic corpus's
# natural trigram overlap saturates the metric (500/500 docs, ~64% of
# windows duplicated at sf0.01); k=5 isolates genuinely shared runs
# (71/500 docs, ~9% of windows) — the long-run regime ExactSubstr targets.
K_SPAN = 5


def _d01_spans_ctes() -> str:
    h = portable_hash64_sql(
        " || ' ' || ".join(f"t[i+{j}]" if j else "t[i]" for j in range(K_SPAN))
    )
    return f"""
    toks AS (
        SELECT doc_id, {tokens_sql('text')} AS t FROM documents
    ),
    win AS (
        SELECT doc_id, len(t) AS nt, i AS pos, {h} AS h
        FROM toks, UNNEST(range(1, len(t) - {K_SPAN} + 2)) AS u(i)
        WHERE len(t) >= {K_SPAN}
    ),
    dup AS (
        SELECT h FROM win GROUP BY h HAVING count(DISTINCT doc_id) >= 2
    ),
    hits AS (
        SELECT doc_id, nt, pos FROM win WHERE h IN (SELECT h FROM dup)
    ),
    brk AS (
        SELECT doc_id, nt, pos,
               CASE WHEN pos - lag(pos) OVER w > {K_SPAN} THEN 1 ELSE 0 END AS brk
        FROM hits
        WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
    ),
    isl AS (
        SELECT doc_id, nt, pos,
               sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
        FROM brk
    ),
    sp AS (
        SELECT doc_id, any_value(nt) AS nt,
               max(pos) + {K_SPAN} - 1 - min(pos) + 1 AS span_len
        FROM isl GROUP BY doc_id, island
    ),
    pd AS (
        SELECT doc_id, any_value(nt) AS nt, count(*)::BIGINT AS n_spans,
               sum(span_len)::BIGINT AS covered
        FROM sp GROUP BY doc_id
    )
    """


@register(
    "d01_dedup_exact",
    oracle=f"""
    WITH {_d01_spans_ctes()}
    SELECT 'exact' AS which, doc_id, cluster_id AS k1, cluster_size AS k2,
           CAST(NULL AS VARCHAR) AS v
    FROM (
        SELECT doc_id,
               min(doc_id) OVER (PARTITION BY fp) AS cluster_id,
               count(*) OVER (PARTITION BY fp)::BIGINT AS cluster_size
        FROM (
            SELECT doc_id,
                   array_to_string(list_sort(list_distinct({tokens_sql('text')})), ' ') AS fp
            FROM documents
        )
    )
    UNION ALL
    SELECT 'spans' AS which, doc_id, n_spans AS k1, covered AS k2,
           printf('%.6f', round(CAST(covered AS DOUBLE) / nt, 6)) AS v
    FROM pd
    UNION ALL
    SELECT 'incr' AS which, doc_id, cluster_id AS k1, cluster_size AS k2, src AS v
    FROM (
        SELECT doc_id, is_delta,
               min(doc_id) OVER (PARTITION BY fp) AS cluster_id,
               count(*) OVER (PARTITION BY fp)::BIGINT AS cluster_size,
               CASE WHEN max(CASE WHEN is_delta THEN 0 ELSE 1 END)
                             OVER (PARTITION BY fp) = 1
                    THEN 'store' ELSE 'delta' END AS src
        FROM (
            SELECT doc_id, doc_id % 5 = 0 AS is_delta,
                   array_to_string(list_sort(list_distinct({tokens_sql('text')})), ' ') AS fp
            FROM documents
        )
    ) WHERE is_delta
    """,
    tags=("dedup", "exact", "spans", "incremental"),
)
def d01_dedup_exact(spark, sf_dir):
    """Exact dedup union: whole-document fingerprint clusters ('exact'),
    span-level exact-substring dedup ('spans'), and INCREMENTAL dedup
    against a persisted fingerprint store ('incr') — see the family
    comment above for semantics and the 100 TB shape.

    'incr' is the shape a production corpus actually runs: the existing
    corpus (doc_id % 5 != 0 here) is distilled ONCE into a store of
    (fingerprint → representative id, count); a new delta batch
    (doc_id % 5 == 0) dedups by joining the store and merging
    within-delta groups — work proportional to the DELTA, never a corpus
    re-shingle. The arm's output (per delta doc: global cluster id,
    global cluster size, 'store'/'delta' provenance of the match) is
    gated against a DuckDB FULL recompute restricted to delta docs, so
    incremental == full is what the hash proves — the same
    increment-equals-recompute contract as q01's 'incr_maint' arm."""
    from pyspark.sql import Window

    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")

    # ONE materialized fingerprint relation feeds all four consumers —
    # the exact-arm window, the incr store/delta groupBys and the incr
    # probe join — otherwise the tokenize+sort+join fingerprint pass
    # (this query's dominant compute) is embedded once per subtree
    # (same diamond hygiene as d02's bands/toks and t01's per_doc).
    fp = F.array_join(F.array_sort(F.array_distinct(tokens("text"))), " ")
    fps = docs.select(
        "doc_id", fp.alias("fp"), (F.col("doc_id") % 5 == 0).alias("is_delta")
    ).transform(materialize)
    w = Window.partitionBy("fp")
    exact_arm = (
        fps.select("doc_id", "fp")
        .withColumn("k1", F.min("doc_id").over(w))
        .withColumn("k2", F.count(F.lit(1)).over(w).cast("bigint"))
        .select(
            F.lit("exact").alias("which"), "doc_id", "k1", "k2",
            F.lit(None).cast("string").alias("v"),
        )
    )

    spans_arm = duplicated_spans(docs, "doc_id", "text", K_SPAN).select(
        F.lit("spans").alias("which"), "doc_id",
        F.col("n_spans").alias("k1"), F.col("covered").alias("k2"),
        # round-then-format, module tie policy
        F.format_string(
            "%.6f", F.round(F.col("covered") / F.col("nt"), 6)
        ).alias("v"),
    )

    # 'incr' — the store build scans only the base partition (in
    # production it is a persisted table, amortized across batches); the
    # delta path is two fingerprint-keyed groupBys and two equi-joins on
    # fp, all delta-sized except the one store probe. Reads the shared
    # materialized fps relation above.
    store = (
        fps.where(~F.col("is_delta"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("rep"), F.count(F.lit(1)).alias("cnt"))
    )
    dstats = (
        fps.where("is_delta")
        .groupBy("fp")
        .agg(F.min("doc_id").alias("dmin"), F.count(F.lit(1)).alias("dcnt"))
    )
    merged = dstats.join(store, "fp", "left").select(
        "fp",
        F.least(F.coalesce("rep", "dmin"), F.col("dmin")).alias("k1"),
        (F.coalesce("cnt", F.lit(0)) + F.col("dcnt")).cast("bigint").alias("k2"),
        F.when(F.col("rep").isNotNull(), F.lit("store")).otherwise(F.lit("delta")).alias("v"),
    )
    incr_arm = (
        fps.where("is_delta")
        .join(merged, "fp")
        .select(F.lit("incr").alias("which"), "doc_id", "k1", "k2", "v")
    )
    return exact_arm.unionByName(spans_arm).unionByName(incr_arm)


# D2 — the COMPOSED near-dup dedup pipeline a production run executes:
# MinHash/LSH band buckets → candidate pairs via equi-join on the band key
# (never all-pairs — this is the 100 TB shape) → exact token-set Jaccard
# >= 0.8 verification on candidates only → cluster assignment by
# CONNECTED COMPONENTS TO CONVERGENCE over the verified-pair graph
# (operators/connected_components.py, HashMin + pointer jumping; the
# oracle computes the same fixpoint via a recursive reachability CTE, so
# the gate now checks true components — a duplication CHAIN a–b–c
# collapses to one cluster even where a,c never met in a band).
JACCARD_THRESHOLD = 0.8
# Word-shingle width for every MinHash/LSH pipeline in this module.
# ONE constant (r13 ADVICE): the exact-collapse intra-group guards test
# "does this text produce at least one k-gram shingle" as
# size(tokens(text)) >= K_SHINGLE, and that predicate must track the
# width passed to exploded_shingles or the expansion silently diverges
# from band-candidate semantics. The ORACLE SQL keeps its literal 3s:
# its text is the pinned cross-engine contract and must not change.
K_SHINGLE = 3


def _d02_sql() -> str:
    from ..functions.dedup import lsh_bands_sql, minhash_signature_sql
    from ..functions.text import shingles_sql_inline

    sig = minhash_signature_sql("documents", "doc_id", shingles_sql_inline("text", 3))
    bands = lsh_bands_sql(f"({sig})", "doc_id")
    body = f"""
    WITH RECURSIVE bands AS ({bands}),
    cands AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bands a JOIN bands b
          ON a.band_id = b.band_id AND a.band_key = b.band_key
         AND a.doc_id < b.doc_id
    ),
    toks AS (
        SELECT doc_id, list_sort(list_distinct({tokens_sql('text')})) AS t
        FROM documents
    ),
    verified AS (
        SELECT id_a, id_b FROM (
            SELECT c.id_a, c.id_b,
                   len(list_intersect(ta.t, tb.t))::DOUBLE
                       / (len(ta.t) + len(tb.t) - len(list_intersect(ta.t, tb.t))) AS jac
            FROM cands c
            JOIN toks ta ON ta.doc_id = c.id_a
            JOIN toks tb ON tb.doc_id = c.id_b
        ) WHERE jac >= {JACCARD_THRESHOLD}
    ),
    edges AS (
        SELECT id_a AS src, id_b AS dst FROM verified
        UNION ALL
        SELECT id_b, id_a FROM verified
    ),
    reach(id, label) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT e.src, r.label FROM edges e JOIN reach r ON r.id = e.dst
    ),
    cc AS (SELECT id AS doc_id, min(label) AS label FROM reach GROUP BY id)
    """
    prev = "cc"
    body += f""",
    reps AS (
        SELECT label,
               -(max(struct_pack(nu := q.nu, nid := -l.doc_id))).nid AS rep_id
        FROM {prev} l
        JOIN (SELECT doc_id, CAST(len(t) AS BIGINT) AS nu FROM toks) q
          ON q.doc_id = l.doc_id
        GROUP BY label
    )
    SELECT 'full' AS which, l.doc_id, l.label AS cluster_id,
           (count(*) OVER (PARTITION BY l.label))::BIGINT AS cluster_size,
           r.rep_id,
           CAST(CASE WHEN l.doc_id = r.rep_id THEN 1 ELSE 0 END AS BIGINT) AS keep
    FROM {prev} l JOIN reps r ON r.label = l.label
    UNION ALL
    -- 'incr_cc' oracle: the TRUE component fixpoint over ALL edges (the
    -- same recursive CTE) WITH the full-recompute representative
    -- election — the Spark side reaches the identical labeling AND the
    -- identical (rep_id, keep) decision via base-CC + delta-batch
    -- maintenance (incremental_components_with_reps), so the hash
    -- proves increment == recompute for the whole persisted DECISION
    -- store, not just the labels.
    SELECT 'incr_cc' AS which, l.doc_id, l.label AS cluster_id,
           (count(*) OVER (PARTITION BY l.label))::BIGINT AS cluster_size,
           r.rep_id,
           CAST(CASE WHEN l.doc_id = r.rep_id THEN 1 ELSE 0 END AS BIGINT) AS keep
    FROM {prev} l JOIN reps r ON r.label = l.label
    """
    return body


@register(
    "d02_lsh_dedup_pipeline",
    oracle=_d02_sql(),
    tags=("dedup", "lsh", "jaccard", "pipeline"),
)
def d02_lsh_dedup_pipeline(spark, sf_dir):
    """End-to-end near-dup dedup, two arms in one tagged union:

    which='full'    — LSH candidates → exact-Jaccard verify → cluster
                      assignment by CONNECTED COMPONENTS to convergence
                      (operators/connected_components.py) → richest-doc
                      representative selection. Every join is an
                      equi-join on band key or doc_id — no all-pairs
                      stage, so the plan survives a 100 TB corpus
                      (bucket sizes, not corpus size, bound the pair
                      work).
    which='incr_cc' — INCREMENTAL maintenance of the dedup-cluster
                      DECISION store (operators/connected_components.py::
                      incremental_components_with_reps): the verified
                      edge set is split into a base partition (neither
                      endpoint a delta doc, doc_id % 7 == 0 marks
                      deltas) and a delta batch; base CC seeds the
                      (label, nu, rep_id) store, the delta batch merges
                      components via the CONTRACTED graph and re-elects
                      representatives from the merged OLD winners only
                      (work ∝ delta, never a corpus re-cluster or
                      member rescan), and the maintained (label,
                      rep_id, keep) rows are gated against the oracle's
                      full-recompute fixpoint + full re-election — the
                      graph-state member of the repo's
                      increment-equals-recompute family (d01 'incr',
                      q01 'incr_maint'). Mirrors the reference's
                      ``--pr 'last'`` incremental model
                      (wfc3_cte_monitor/database_update.py:214-255)
                      applied to cluster state."""
    from pyspark.sql import Window

    from ..functions.dedup import candidate_pairs, minhash_signature_pairs
    from ..functions.text import exploded_shingles
    from ..operators.connected_components import (
        connected_components,
        incremental_components_with_reps,
    )
    from .registry import active_arms

    arms = active_arms("d02_lsh_dedup_pipeline")

    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    # EXACT-COLLAPSE-FIRST (r13 sf10 ladder finding): byte-identical
    # texts get identical shingles → signatures → band keys → token
    # sets, so the band self-join inflates every k-clone group into
    # C(k,2)×n_bands candidate rows and the verify stage recomputes
    # Jaccard(t, t) = 1 for each of them. Group byte-identical texts
    # first, run shingle → minhash → band → verify at UNIQUE-CONTENT
    # granularity, and expand afterwards: doc-level verified edges =
    # expanded group pairs ∪ intra-group all-pairs (identical token
    # sets verify at exactly 1.0 ≥ 0.8 by construction —
    # size(t)/(2·size(t) − size(t)) — so no Jaccard is computed for
    # them). Everything downstream (CC, election, the incremental
    # decision store) is unchanged and stays doc-keyed; the output is
    # provably identical.
    #
    # RE-KEYED on a 128-bit content fingerprint (r13 verdict ask #1):
    # the r13 form (min(doc_id) OVER (PARTITION BY text)) shuffled the
    # full text with no map-side combine — a mega-clone group landed on
    # ONE reducer holding every clone's payload. groupBy(fingerprint)
    # partially aggregates map-side: the exchange moves one
    # (fp, gid, text) row per distinct content per map partition, and
    # the membership join-back moves bigints only. See
    # functions/dedup.fingerprint128 for the collision argument.
    #
    # DUPLICATION-ADAPTIVE (r13 verdict ask #3 — the driver measured
    # the unconditional collapse at −17% on the duplicate-free sf0.1
    # corpus): the collapse engages only when the corpus actually
    # contains exact-duplicate texts; otherwise the pre-collapse doc-
    # granularity plan runs (membership would be the identity). Both
    # branches compute identical results on any input — the probe
    # (functions/dedup.has_dup_groups, one bigint aggregate at plan
    # build) only picks the cheaper plan. It reads the RAW scan, not
    # the spread() relation: spread's repartition would put a full
    # text exchange inside the probe for nothing (the duplication
    # structure is partitioning-invariant).
    collapsed = has_dup_groups(
        load_table(spark, sf_dir, "documents").select("text"), "text"
    )
    if collapsed:
        f1, f2 = fingerprint128("text")
        dfp = docs.select("doc_id", "text", f1.alias("_f1"), f2.alias("_f2"))
        groups = (
            dfp.groupBy("_f1", "_f2")
            .agg(
                F.min("doc_id").alias("gid"),
                F.min_by("text", "doc_id").alias("text"),
            )
            .transform(materialize)
        )
        ureps = groups.select(F.col("gid").alias("doc_id"), "text")
        # membership (doc_id → gid) + the shingle-existence flag the
        # intra expansion needs (see the guard comment below), carried
        # from the group relation through this one narrow join: bigints
        # and a boolean ride the exchange, never the text. Materialized
        # — five downstream consumers (two inter-expansion sides, the
        # intra self-join's two sides, nu expansion).
        members = (
            dfp.select("doc_id", "_f1", "_f2")
            .join(
                groups.select(
                    "_f1", "_f2", "gid",
                    (F.size(tokens("text")) >= K_SHINGLE).alias("banded"),
                ),
                ["_f1", "_f2"],
            )
            .select("doc_id", "gid", "banded")
            .transform(materialize)
        )
    else:
        # duplicate-free corpus: every doc is its own group — run the
        # signature pipeline at doc granularity, no membership relation
        ureps = docs.select("doc_id", "text")
        members = None
    sh = exploded_shingles(ureps, "doc_id", "text", K_SHINGLE)
    sig = minhash_signature_pairs(sh, "doc_id")
    from ..functions.dedup import lsh_bands

    # The band table feeds BOTH sides of the candidate self-join; without
    # a materialization the whole shingle→minhash pipeline (the query's
    # most expensive compute) is embedded twice in the plan. Same for the
    # token-set table below, joined once per pair side. Both are
    # doc-dimension relations — lazy checkpoints (no blocking barrier),
    # standard diamond-reuse hygiene for an iterative pipeline.
    bands = lsh_bands(sig, "doc_id").transform(materialize)
    cands = candidate_pairs(bands, "doc_id")

    toks = ureps.select(
        "doc_id", F.array_sort(F.array_distinct(tokens("text"))).alias("t")
    ).transform(materialize)
    ta = toks.select(F.col("doc_id").alias("id_a"), F.col("t").alias("ta"))
    tb = toks.select(F.col("doc_id").alias("id_b"), F.col("t").alias("tb"))
    joined = cands.join(ta, "id_a").join(tb, "id_b").withColumn(
        "_inter", F.size(F.array_intersect("ta", "tb"))
    )
    jac = F.col("_inter").cast("double") / (F.size("ta") + F.size("tb") - F.col("_inter"))
    gverified = joined.where(jac >= JACCARD_THRESHOLD).select("id_a", "id_b")
    if collapsed:
        # Expansion back to doc granularity. Group id ranges interleave,
        # so least/greatest on the ORIGINAL ids restores id_a < id_b;
        # each doc belongs to exactly one group, so no pair is emitted
        # twice.
        inter = (
            gverified
            .join(members.select(F.col("gid").alias("id_a"),
                                 F.col("doc_id").alias("ia")), "id_a")
            .join(members.select(F.col("gid").alias("id_b"),
                                 F.col("doc_id").alias("ib")), "id_b")
            .select(F.least("ia", "ib").alias("id_a"),
                    F.greatest("ia", "ib").alias("id_b"))
        )
        # Intra pairs are candidates in the un-collapsed plan ONLY when
        # the group's text yields at least one shingle band (raw token
        # count >= K_SHINGLE: exploded_shingles emits a k-gram iff
        # lead(k-1) exists) — a <k-token clone group has no signature,
        # no bands, and therefore NO edge in the band-candidate
        # semantics the oracle mirrors. The guard predicate (raw
        # tokens(), not the distinct set in toks: 'a a a' has 3 raw
        # tokens -> one shingle, but |distinct| = 1) was computed
        # row-locally on the group relation and carried onto `members`
        # by the membership join above, so the restriction here is a
        # filter on a materialized column — no join at all (the r13
        # form paid a members⋈banded_gids semi-join).
        bmembers = members.where("banded")
        intra = (
            bmembers.select("gid", F.col("doc_id").alias("id_a"))
            .join(bmembers.select("gid", F.col("doc_id").alias("id_b")), "gid")
            .where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
        )
        verified = inter.unionByName(intra)
        # per-doc distinct-token count for representative election: nu
        # is a pure function of the text, so expand the group-level
        # size through the membership relation (a narrow bigint join)
        # instead of tokenizing every clone.
        nu_rel = (
            members.join(
                toks.select(F.col("doc_id").alias("gid"),
                            F.size("t").cast("bigint").alias("nu")), "gid")
            .select("doc_id", "nu")
        )
    else:
        # identity membership: verified edges ARE the rep-level edges
        # (already id_a < id_b from candidate_pairs), nu reads the
        # materialized token-set relation directly
        verified = gverified
        nu_rel = toks.select("doc_id", F.size("t").cast("bigint").alias("nu"))

    edges = verified.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst")).unionAll(
        verified.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
    )
    # Iterative-algorithm hygiene: materialize the edge list ONCE and
    # truncate its lineage before the label-propagation loop — otherwise
    # every round's plan re-embeds the whole shingle→minhash→band→verify
    # pipeline (k× recompute, straggler-prone at scale). LAZY checkpoint:
    # the blocking eager form put a serial materialization on the timed
    # path (same lesson as the trend queries' fileinfo analog — measured
    # here 5.2s → 2.9s warm at sf0.1). Repartitioning by dst FIRST means
    # every propagation round's edges⋈labels join reuses the cached
    # partitioning and only the (tiny) labels side shuffles per round.
    # Deterministic, so the oracle comparison is unaffected.
    # force=True: this relation feeds the ITERATIVE CC consumers (full,
    # base and contracted CC all probe convergence during construction);
    # introspection mode must not re-expand the shingle pipeline into
    # every round's probe (see checkpointing.materialize).
    edges = edges.repartition("dst").transform(lambda d: materialize(d, force=True))
    labels = connected_components(docs.select("doc_id"), edges)
    # REPRESENTATIVE SELECTION — the dedup DECISION a pipeline
    # materializes: keep the richest-vocabulary doc per cluster (distinct
    # token count, already computed in the verify stage's token-set
    # relation), ties to the smallest id. Deterministic argmax via
    # lexicographic max(struct(nu, -doc_id)) — max_by's tie choice is
    # undefined on both engines. One cluster-keyed agg + one join; the
    # token sets themselves never ride either shuffle (nu is a bigint).
    reps = (
        labels.join(nu_rel, "doc_id")
        .groupBy("label")
        .agg((-F.max(F.struct(F.col("nu"), (-F.col("doc_id")).alias("nid")))["nid"]).alias("rep_id"))
    )
    full_arm = labels.join(reps, "label").select(
        F.lit("full").alias("which"),
        "doc_id",
        F.col("label").alias("cluster_id"),
        F.count(F.lit(1)).over(Window.partitionBy("label")).cast("bigint").alias("cluster_size"),
        "rep_id",
        F.when(F.col("doc_id") == F.col("rep_id"), 1).otherwise(0).cast("bigint").alias("keep"),
    )
    from .registry import arms_requested

    if not arms_requested(arms, {"incr_cc"}):
        # frozen-arm bench pass: the incremental arm's construction is
        # EAGER (driver-side convergence probes), so a post-hoc Catalyst
        # union-branch prune can't skip its cost — skip building it.
        # arms_requested (r11 ADVICE) so a future second pseudo-arm's
        # __all_but__ complement run still builds this one.
        return full_arm

    # 'incr_cc' — incremental cluster-store maintenance OF THE DECISION,
    # not just the labels. The edge split reuses the SAME materialized
    # bidirectional edge relation (no re-shingle): delta edges touch a
    # delta doc (doc_id % 7 == 0), base edges touch none. The base CC
    # seeds the store over ALL vertices (delta docs enter self-labeled
    # with their own nu/rep — exactly the enforced
    # incremental_components_with_reps contract) and elects each base
    # component's representative ONCE (store-build cost, amortized
    # across batches in production, same posture as d01's fingerprint
    # store); the delta batch then merges components through the
    # contracted graph and re-elects winners from the merged OLD winners
    # only — delta-sized work, the store never exchanged. The gate below
    # hash-matches (label, rep_id, keep) against the oracle's full
    # recompute + full re-election.
    is_delta_edge = (F.col("src") % 7 == 0) | (F.col("dst") % 7 == 0)
    # base_labels feeds TWO consumers (the election agg and the store
    # projection) and base_store THREE more (remap lookup, winner
    # filter, final remap join) plus the eager construction probes —
    # materialize both or the base CC's final join re-executes once per
    # consumer. force=True: the downstream _component_remap collects
    # convergence sums during CONSTRUCTION (see checkpointing.py).
    base_labels = materialize(
        connected_components(docs.select("doc_id"), edges.where(~is_delta_edge)),
        force=True,
    )
    base_reps = (
        base_labels.join(nu_rel, "doc_id")
        .groupBy("label")
        .agg((-F.max(F.struct(F.col("nu"), (-F.col("doc_id")).alias("nid")))["nid"]).alias("rep_id"))
    )
    base_store = materialize(
        base_labels.join(nu_rel, "doc_id").join(base_reps, "label")
        .select("doc_id", "label", "nu", "rep_id"),
        force=True,
    )
    maintained = incremental_components_with_reps(
        base_store, edges.where(is_delta_edge)
    )
    incr_arm = maintained.select(
        F.lit("incr_cc").alias("which"),
        "doc_id",
        F.col("label").alias("cluster_id"),
        F.count(F.lit(1)).over(Window.partitionBy("label")).cast("bigint").alias("cluster_size"),
        "rep_id",
        "keep",
    )
    return full_arm.unionByName(incr_arm)


# D3 — tagged union of the three SIGNATURE-dedup surfaces:
#   which='band'   — MinHash(16) over 3-word shingles → 4 LSH band keys
#                    per doc (candidates share a band key; this corpus
#                    has no shingle-level near-dups, so the checked
#                    output is the signature/band table).
#   which='plant'  — MinHash/LSH near-dup DETECTION end-to-end on a
#                    corpus that provably CONTAINS near-dups: every
#                    50th doc gets a deterministic suffix-mutated copy
#                    (one appended token; both engines construct the
#                    planted corpus identically from `documents`), the
#                    SAME single shingle→minhash→band pass covers
#                    originals + plants, candidates come from the band
#                    equi-join restricted to pairs touching a plant,
#                    and exact token-set Jaccard >= 0.8 verifies — so
#                    the 'band' arm's signature table AND the detection
#                    path it exists for are both oracle-gated.
#   which='ngram'  — n-GRAM (3-word shingle) Jaccard near-dup over the
#                    same planted candidates: exact shingle-set Jaccard
#                    >= 0.8 on band-collision pairs — the n-gram-Jaccard
#                    dedup method as its own gated verify (token-set
#                    and shingle-set similarity rank pairs differently;
#                    shingle Jaccard is the stricter, order-sensitive
#                    measure MinHash actually approximates). Shingle
#                    sets are built ONLY for the candidate id set.
#   which='simdup' — SimHash near-dup DETECTION end-to-end: a 32-bit
#                    token SimHash, blocked into 2 halves of 16 bits —
#                    any pair within Hamming 1 shares at least one
#                    block by pigeonhole — candidates from the block
#                    equi-join, verified with bit_count(xor) <= 1.
#                    32 bits (not t02's 16-bit profile hash) because
#                    detection needs discrimination: on this shared-
#                    vocabulary corpus the 16-bit signature collapses
#                    (sf0.1: 218k Hamming≤1 pairs from 5k docs) while
#                    32 bits yields 4.7k — the near-dup mass, not the
#                    vocabulary's.
#                    The quadratic work is confined to 65536-way blocks —
#                    the same bucketed shape as every other dedup path.
#   which='dupfrac' — DUPLICATE-N-GRAM FRACTION: the per-document
#                    repetition/quality metric from the Gopher and
#                    RefinedWeb filtering rules — for each doc of the
#                    PLANTED corpus, the fraction of its distinct
#                    3-gram shingles that also occur in at least one
#                    OTHER doc. On the planted corpus the metric has a
#                    ground truth: planted originals gate exactly
#                    1.000000 (their shingles are a strict subset of
#                    their plant's) and plants k/(k+1) (their one
#                    suffix shingle is theirs alone); unplanted docs
#                    report their NATURAL overlap — nonzero for many
#                    (short docs share 3-grams), which is the metric
#                    doing its job, not noise. Shape: the
#                    same materialized shingle relation, shingles
#                    compressed to 60-bit portable hashes BEFORE the
#                    shuffles (both engines hash identically; a 2^-60
#                    collision merges a shingle pair deterministically
#                    on both sides) so the corpus-scale groupBy and the
#                    count join move (bigint, bigint) rows, never
#                    20-30-byte shingle strings. Three shingle-scale
#                    shuffles total (count-by-shingle, join back,
#                    count-by-doc with map-side partial agg) — the
#                    canonical two-pass shape this metric has at any
#                    scale.
#   which='contam' — DECONTAMINATION: training docs sharing >= 5
#                    distinct 3-gram shingles with the EVAL SET
#                    (doc_id % 97 == 0, ~1% of the corpus) are flagged
#                    with their overlap count — the train/eval n-gram
#                    contamination check every training pipeline runs
#                    before a data release. Shape: the eval side's
#                    distinct shingle set is tiny by nature (eval sets
#                    are small) → broadcast semi-join against the SAME
#                    exploded-shingle relation the MinHash pass reads;
#                    no all-pairs stage, corpus side touched once.
_SIMDUP_HAMMING = 1
_CONTAM_EVAL_MOD = 97
_CONTAM_MIN_SHARED = 5
# planted LEAKS give detection a ground truth (this corpus has no
# natural cross-doc 3-gram overlap, so an unplanted arm would gate an
# empty result): each eval doc's text reappears as a "training" doc at
# id + 2*(max+1) with one appended token — the contam join must flag
# every leak with n_shared = the eval doc's full shingle count
_LEAK_SUFFIX = "zzleakzz"

# planted-mutation corpus: every PLANT_MOD-th doc gets a copy with ONE
# appended token and id + (max(doc_id) + 1). One new token changes one
# shingle out of ~n-2, so shingle-Jaccard stays ~0.9+ (the band join
# finds the pair) while token-set Jaccard n/(n+1) clears the 0.8 verify
# for any doc with >= 4 distinct tokens (corpus min is ~10).
#
# The offset is COMPUTED from the corpus (one pruned max() aggregate on
# each engine), not a constant: a fixed 10M offset silently misclassified
# 90% of the synthesized-sf1 corpus (remapped ids reach 9e7) as plants,
# turning the plant verify's candidate set from O(plants) into the full
# duplicate-pair population — measured 46 s vs ~13 s at sf1. An id-space
# assumption is exactly the kind of at-scale failure the plant arm must
# not carry.
_PLANT_MOD = 50
_PLANT_SUFFIX = "zzplantdupzz"
_PLANT_JACCARD = 0.8
_PMAX_SQL = "(SELECT max(doc_id) + 1 FROM documents)"



# --- d03 document-arm builders (duplication-adaptive, see d03 body) ---------
#
# Both builders return the six document arms
# (band, plant, ngram, simdup, contam, dupfrac) over the planted corpus
# (originals + plants; plant ids >= poff). They compute IDENTICAL
# results on any input: _d03_doc_arms_direct is the pre-collapse plan
# (doc granularity; correct but C(k,2)-inflated over k-clone groups),
# _d03_doc_arms_collapsed runs the whole substrate at unique-content
# granularity and expands through the bigint membership relation.
# tests/test_exact_collapse.py gates the collapsed branch against the
# oracle on a clone corpus; tests/test_oracle_parity.py gates the
# direct branch on the shipped (duplicate-free) corpora; and the
# branch-equivalence test forces each branch on the other's data.

def _d03_doc_arms_collapsed(corpus, docs, poff):  # noqa: ARG001 - docs unused (group texts substitute)
    from ..functions.dedup import minhash_signature_pairs, simhash16
    from ..functions.text import exploded_shingles, tokens

    # EXACT-COLLAPSE-FIRST over the WHOLE document substrate (r13
    # verdict ask #2, extending the r13 fuzzy-arm collapse — the r13
    # sf10 ladder read this query at 16.66×/decade because the plant
    # arm's band self-join and simdup's half-block self-join inflate
    # C(k,2)-shaped over document clone groups, and every clone
    # re-paid tokenize+shingle+minhash). Byte-identical texts are
    # grouped by the 128-bit content fingerprint (map-side combinable,
    # payloads never ride a hot key — see functions/dedup.
    # fingerprint128); shingles, MinHash signatures, LSH bands, SimHash
    # signatures and the contam/dupfrac counts are all pure functions
    # of the text, so the ENTIRE substrate runs at unique-content
    # granularity and expands through the bigint membership relation:
    # pair arms as {expanded rep pairs} ∪ {intra-group pairs with
    # their by-construction metric}, per-doc arms as a gid equi-join,
    # and dupfrac's per-shingle doc count as the GROUP-SIZE-weighted
    # sum (Σ gsz, not a group count). Output provably identical;
    # oracle-gated on a clone corpus in tests/test_exact_collapse.py.
    cf1, cf2 = fingerprint128("text")
    cfp = corpus.select("doc_id", "text", cf1.alias("_f1"), cf2.alias("_f2"))
    cgroups = (
        cfp.groupBy("_f1", "_f2")
        .agg(
            F.min("doc_id").alias("gid"),
            F.min_by("text", "doc_id").alias("text"),
            F.count(F.lit(1)).alias("gsz"),
            # does the group contain a plant id? (a group can in
            # principle mix originals and plants if an original text
            # ends in the plant suffix — id-level facts stay id-level)
            (F.max("doc_id") >= F.lit(poff)).alias("has_plant"),
        )
        .transform(materialize)
    )
    greps = cgroups.select("gid", "text")
    # membership (doc_id → gid) + the two row-local text flags the
    # expansions need, carried through this one narrow join: banded =
    # "text yields ≥1 shingle" (the d02 guard — intra pairs of a
    # shingle-less group are NOT band candidates), hastok = "text
    # explodes to ≥1 token" (a SimHash signature row exists; NULL text
    # explodes to nothing on both engines). Bigints + two booleans ride
    # the exchange, never the text. Materialized: ~10 consumers.
    cmembers = (
        cfp.select("doc_id", "_f1", "_f2")
        .join(
            cgroups.select(
                "_f1", "_f2", "gid",
                (F.size(tokens("text")) >= K_SHINGLE).alias("banded"),
                (F.size(tokens("text")) >= 1).alias("hastok"),
            ),
            ["_f1", "_f2"],
        )
        .select("doc_id", "gid", "banded", "hastok")
        .transform(materialize)
    )

    # group-granularity shingle relation, materialized once WITH the
    # 60-bit shingle hash: minhash reuses it (hash_col= — one md5 pass
    # over (gid, shingle) removed) and dupfrac's dsh becomes a pure
    # projection of this checkpoint instead of its own materialization
    # site (r14 diet: one fewer build-time checkpoint job).
    sh = (
        exploded_shingles(greps, "gid", "text", K_SHINGLE)
        .withColumn("shid", portable_hash64("shingle"))
        .transform(materialize)
    )
    sig = minhash_signature_pairs(sh, "gid", hash_col="shid")
    # the band table feeds the 'band' arm expansion AND both sides of
    # the plant candidate self-join; has_plant rides along so the
    # candidate prefilter below needs no extra join
    bands = (
        lsh_bands(sig, "gid")
        .join(cgroups.select("gid", "has_plant"), "gid")
        .transform(materialize)
    )
    # 'band' arm is per-doc output: expand the group's bands through
    # membership (bands are a pure function of the text). Linear — each
    # doc gets its n_bands rows, exactly the pre-collapse relation.
    band_arm = (
        bands.join(cmembers.select("doc_id", "gid"), "gid")
        .where(F.col("doc_id") < poff)
        .select(
            F.lit("band").alias("which"),
            F.col("doc_id").cast("bigint").alias("k1"),
            F.col("band_id").cast("bigint").alias("k2"),
            F.col("band_key").alias("v"),
        )
    )

    # 'plant' arm: candidates = band-key collisions touching a plant;
    # verify = exact token-set Jaccard >= 0.8. All at GROUP granularity:
    # the candidate prefilter keeps group pairs where EITHER side
    # contains a plant member (necessary for the exact id-level
    # restriction id_b >= poff, which is re-applied after expansion);
    # tokenization is confined to the (tiny) candidate gid set via a
    # broadcast semi-join, so the verify cost is O(candidate groups).
    pa = bands.select(
        F.col("gid").alias("ga"), "band_id", "band_key",
        F.col("has_plant").alias("hpa"),
    )
    pb = bands.select(
        F.col("gid").alias("gb"), "band_id", "band_key",
        F.col("has_plant").alias("hpb"),
    )
    g_pcands = (
        pa.join(pb, ["band_id", "band_key"])
        .where((F.col("ga") < F.col("gb")) & (F.col("hpa") | F.col("hpb")))
        .select("ga", "gb")
        .dropDuplicates(["ga", "gb"])
    )
    g_cand_ids = g_pcands.select(
        F.explode(F.array("ga", "gb")).alias("gid")
    ).distinct()
    ptoks = (
        cgroups.join(F.broadcast(g_cand_ids), "gid", "leftsemi")
        .select("gid", F.array_sort(F.array_distinct(tokens("text"))).alias("t"))
    )
    pta = ptoks.select(F.col("gid").alias("ga"), F.col("t").alias("ta"))
    ptb = ptoks.select(F.col("gid").alias("gb"), F.col("t").alias("tb"))
    pjoined = g_pcands.join(pta, "ga").join(ptb, "gb").withColumn(
        "_inter", F.size(F.array_intersect("ta", "tb"))
    )
    pjac = F.col("_inter").cast("double") / (
        F.size("ta") + F.size("tb") - F.col("_inter")
    )
    g_plant = (
        pjoined.withColumn("jac", pjac)
        .where(F.col("jac") >= _PLANT_JACCARD)
        .select("ga", "gb", "jac")
    )

    # Membership expansion, shared by the three pair arms: group pairs
    # → member pairs on the ORIGINAL ids (group id ranges interleave,
    # so least/greatest — not the gid order — restores id_a < id_b);
    # each doc belongs to exactly one group, so no pair is emitted
    # twice. Only bigints and the verified metric ride these joins.
    ma = cmembers.select(F.col("gid").alias("ga"), F.col("doc_id").alias("ia"))
    mb = cmembers.select(F.col("gid").alias("gb"), F.col("doc_id").alias("ib"))

    def _expand_pairs(gpairs, vname):
        return (
            gpairs.join(ma, "ga").join(mb, "gb")
            .select(
                F.least("ia", "ib").alias("id_a"),
                F.greatest("ia", "ib").alias("id_b"),
                vname,
            )
        )

    # Intra-group pairs for plant/ngram: candidates in the un-collapsed
    # plan iff the group's text yields at least one band (banded — the
    # same K_SHINGLE guard as d02) and the pair touches a plant
    # (id_b >= poff, pushed to the b side before the self-join); both
    # Jaccard verifies equal exactly 1.0 for identical texts
    # (size(t)/(2·size(t) − size(t))), so no verify is computed.
    bm = cmembers.where("banded")
    intra_pn = (
        bm.select("gid", F.col("doc_id").alias("id_a"))
        .join(bm.select("gid", F.col("doc_id").alias("id_b")), "gid")
        .where((F.col("id_a") < F.col("id_b")) & (F.col("id_b") >= poff))
        .select("id_a", "id_b", F.lit(1.0).alias("jac"))
    )

    plant_pairs = (
        _expand_pairs(g_plant, "jac")
        .where(F.col("id_b") >= poff)
        .unionByName(intra_pn)
    )
    plant_arm = plant_pairs.select(
        F.lit("plant").alias("which"),
        F.col("id_a").cast("bigint").alias("k1"),
        F.col("id_b").cast("bigint").alias("k2"),
        # round BEFORE formatting (module policy): format_string is
        # Java HALF_UP while DuckDB printf is round-half-even, and
        # exact dyadic i/u ratios DO land on formatting ties; both
        # engines' round() are half-away-from-zero, so rounding first
        # makes the 6-decimal string identical.
        F.format_string("%.6f", F.round(F.col("jac"), 6)).alias("v"),
    )

    # 'ngram' arm: the same candidates verified on exact 3-gram SHINGLE
    # Jaccard — the order-sensitive n-gram similarity MinHash actually
    # approximates. The lambda-form shingles() is fine here: it runs on
    # the candidate gid set only, never the corpus. Intra pairs verify
    # at exactly 1.0 as well (identical shingle arrays, non-empty by
    # the banded guard), so intra_pn serves both arms.
    from ..functions.text import shingles

    psh = (
        cgroups.join(F.broadcast(g_cand_ids), "gid", "leftsemi")
        .select("gid", F.array_sort(shingles("text", K_SHINGLE)).alias("s"))
    )
    sha = psh.select(F.col("gid").alias("ga"), F.col("s").alias("sa_sh"))
    shb = psh.select(F.col("gid").alias("gb"), F.col("s").alias("sb_sh"))
    njoined = g_pcands.join(sha, "ga").join(shb, "gb").withColumn(
        "_ninter", F.size(F.array_intersect("sa_sh", "sb_sh"))
    )
    njac = F.col("_ninter").cast("double") / (
        F.size("sa_sh") + F.size("sb_sh") - F.col("_ninter")
    )
    g_ngram = (
        njoined.withColumn("jac", njac)
        .where(F.col("jac") >= _PLANT_JACCARD)
        .select("ga", "gb", "jac")
    )
    ngram_pairs = (
        _expand_pairs(g_ngram, "jac")
        .where(F.col("id_b") >= poff)
        .unionByName(intra_pn)
    )
    ngram_arm = ngram_pairs.select(
        F.lit("ngram").alias("which"),
        F.col("id_a").cast("bigint").alias("k1"),
        F.col("id_b").cast("bigint").alias("k2"),
        # round-then-format, same tie rationale as the plant arm
        F.format_string("%.6f", F.round(F.col("jac"), 6)).alias("v"),
    )

    # 'simdup' runs on ORIGINALS only. A group contains an original iff
    # gid < poff (gid = min member id; plants sit above poff), and the
    # SimHash signature is a pure function of the text — compute it per
    # original-bearing group, self-join blocks at group granularity,
    # expand through the ORIGINAL members.
    og = cgroups.where(F.col("gid") < poff)
    o_ssig = simhash16(
        og.select("gid", tokens("text").alias("t")), "gid", F.col("t"), nbits=32
    )
    blocks = o_ssig.select(
        "gid", "simhash",
        F.explode(
            F.array(
                F.struct(
                    F.lit(0).alias("part"),
                    F.shiftright("simhash", 16).bitwiseAND(F.lit(65535)).alias("bkey"),
                ),
                F.struct(
                    F.lit(1).alias("part"),
                    F.col("simhash").bitwiseAND(F.lit(65535)).alias("bkey"),
                ),
            )
        ).alias("_b"),
    ).select("gid", "simhash", F.col("_b.part").alias("part"), F.col("_b.bkey").alias("bkey"))
    # blocks feeds both sides of the half-block self-join — materialize
    # the group-dimension relation once (lazily) so the tokenize +
    # 32-sum SimHash aggregation isn't embedded twice in the plan (same
    # diamond hygiene as d02's band table)
    blocks = blocks.transform(materialize)
    a = blocks.select(
        F.col("gid").alias("ga"), F.col("simhash").alias("sa"), "part", "bkey"
    )
    b = blocks.select(
        F.col("gid").alias("gb"), F.col("simhash").alias("sb"), "part", "bkey"
    )
    # verify BEFORE deduping: the Hamming test is a map-side expression,
    # so filtering first shrinks the pair-dedup shuffle to the surviving
    # pairs; a Hamming-1 pair can share BOTH blocks, hence the dedup —
    # bare gids + 32-bit sigs ride the shuffle, nothing wider
    ham = F.bit_count(F.col("sa").bitwiseXOR(F.col("sb")))
    g_scands = (
        a.join(b, ["part", "bkey"])
        .where((F.col("ga") < F.col("gb")) & (ham <= _SIMDUP_HAMMING))
        .select("ga", "gb", ham.alias("hm"))
        .dropDuplicates(["ga", "gb"])
    )
    # Expansion over ORIGINAL members only. Intra pairs: clones have
    # identical signatures (Hamming 0, sharing both blocks), candidates
    # in the un-collapsed plan iff a signature row EXISTS — i.e. the
    # text explodes to ≥1 token (the hastok flag; NULL text aggregates
    # to no row on both engines).
    om = cmembers.where(F.col("doc_id") < poff)
    moa = om.select(F.col("gid").alias("ga"), F.col("doc_id").alias("ia"))
    mob = om.select(F.col("gid").alias("gb"), F.col("doc_id").alias("ib"))
    sim_inter = (
        g_scands.join(moa, "ga").join(mob, "gb")
        .select(
            F.least("ia", "ib").alias("id_a"),
            F.greatest("ia", "ib").alias("id_b"),
            "hm",
        )
    )
    tm = om.where("hastok")
    sim_intra = (
        tm.select("gid", F.col("doc_id").alias("id_a"))
        .join(tm.select("gid", F.col("doc_id").alias("id_b")), "gid")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.lit(0).alias("hm"))
    )
    simdup_arm = sim_inter.unionByName(sim_intra).select(
        F.lit("simdup").alias("which"),
        F.col("id_a").cast("bigint").alias("k1"),
        F.col("id_b").cast("bigint").alias("k2"),
        F.col("hm").cast("string").alias("v"),
    )

    # 'contam' arm: train/eval n-gram decontamination with PLANTED
    # leaks (each eval doc's text re-planted as a training doc at
    # id + 2*poff with one appended token — detection has a known
    # answer). n_shared is a pure function of the text (given the eval
    # shingle set), so it is computed ONCE per distinct text and
    # expanded to the id-filtered train docs through membership:
    # eval/train membership is an ID property (doc_id % mod), the
    # shared-shingle count is a TEXT property. The eval side's
    # distinct-shingle set is tiny by nature (eval sets are small) →
    # broadcast semi-joins, same as before the collapse; per-group
    # distinctness of exploded_shingles makes count(*) the
    # distinct-shared count.
    evm = om.where(F.col("doc_id") % _CONTAM_EVAL_MOD == 0).select("doc_id", "gid")
    egids = evm.select("gid").distinct()
    ev_sh = (
        sh.join(F.broadcast(egids), "gid", "leftsemi")
        .select("shingle").distinct()
    )
    g_nsh = (
        sh.join(F.broadcast(ev_sh), "shingle", "leftsemi")
        .groupBy("gid")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    orig_train = (
        om.where(F.col("doc_id") % _CONTAM_EVAL_MOD != 0)
        .select("doc_id", "gid")
        .join(g_nsh, "gid")
        .select("doc_id", "n_shared")
    )
    # Leaked docs' texts (eval text + the leak token) are their own
    # clone groups, keyed here by the SOURCE group: leaked docs of
    # clone eval docs are clones of each other, so one shingle pass
    # per distinct eval text covers every leaked row.
    l_texts = (
        cgroups.join(F.broadcast(egids), "gid", "leftsemi")
        .select("gid", F.concat(F.col("text"), F.lit(f" {_LEAK_SUFFIX}")).alias("ltext"))
    )
    l_nsh = (
        exploded_shingles(l_texts, "gid", "ltext", K_SHINGLE)
        .join(F.broadcast(ev_sh), "shingle", "leftsemi")
        .groupBy("gid")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    leak_train = (
        evm.select((F.col("doc_id") + F.lit(2 * poff)).alias("doc_id"), "gid")
        .join(l_nsh, "gid")
        .select("doc_id", "n_shared")
    )
    contam_arm = (
        orig_train.unionByName(leak_train)
        .where(F.col("n_shared") >= _CONTAM_MIN_SHARED)
        .select(
            F.lit("contam").alias("which"),
            F.col("doc_id").cast("bigint").alias("k1"),
            F.col("n_shared").cast("bigint").alias("k2"),
            F.lit(None).cast("string").alias("v"),
        )
    )
    # 'dupfrac' arm: per-doc duplicate-shingle fraction (see the arm
    # comment) over the PLANTED corpus, which gives the metric a ground
    # truth: a planted original's shingles are a strict subset of its
    # plant's (one appended token adds exactly one shingle), so every
    # planted original gates dupfrac == 1.0 exactly and its plant
    # k/(k+1); unplanted docs report their natural overlap. At group
    # granularity the per-shingle doc count is the GROUP-SIZE-WEIGHTED
    # sum (nd = Σ gsz over groups containing the shingle — each member
    # doc contains it once, shingles being per-doc distinct), and the
    # per-group (n_sh, n_dup) expand to every member. dsh reads the
    # precomputed 60-bit hash off the materialized shingle relation —
    # a projection of cached blocks, not a checkpoint of its own.
    g_dsh = sh.select("gid", "shid")
    shc = (
        g_dsh.join(cgroups.select("gid", "gsz"), "gid")
        .groupBy("shid")
        .agg(F.sum("gsz").alias("nd"))
    )
    g_df = (
        g_dsh.join(shc, "shid")
        .groupBy("gid")
        .agg(
            F.count(F.lit(1)).alias("n_sh"),
            F.sum(F.when(F.col("nd") >= 2, 1).otherwise(0)).alias("n_dup"),
        )
    )
    dupfrac_arm = (
        cmembers.select("doc_id", "gid")
        .join(g_df, "gid")
        .select(
            F.lit("dupfrac").alias("which"),
            F.col("doc_id").cast("bigint").alias("k1"),
            F.col("n_dup").cast("bigint").alias("k2"),
            # round-then-format, module tie policy
            F.format_string(
                "%.6f", F.round(F.col("n_dup") / F.col("n_sh"), 6)
            ).alias("v"),
        )
    )
    return band_arm, plant_arm, ngram_arm, simdup_arm, contam_arm, dupfrac_arm



def _d03_doc_arms_direct(corpus, docs, poff):
    from ..functions.dedup import minhash_signature_pairs, simhash16
    from ..functions.text import exploded_shingles, shingles, tokens

    # Pre-collapse plan shape (doc granularity): correct on ANY corpus,
    # chosen when the duplication probe found no exact-duplicate text
    # group — the membership expansion would be the identity and the
    # collapse machinery pure fixed overhead (measured +1.6 s at
    # sf0.1). Shingle relation materialized once WITH the 60-bit hash:
    # minhash reuses it (hash_col=) and dupfrac's dsh is a projection
    # of this checkpoint, not a second materialization site.
    sh = (
        exploded_shingles(corpus, "doc_id", "text", K_SHINGLE)
        .withColumn("shid", portable_hash64("shingle"))
        .transform(materialize)
    )
    sig = minhash_signature_pairs(sh, "doc_id", hash_col="shid")
    # the band table feeds the arm output AND both sides of the plant
    # candidate self-join — lazy checkpoint, same diamond hygiene as d02
    bands = lsh_bands(sig, "doc_id").transform(materialize)
    band_arm = bands.where(F.col("doc_id") < poff).select(
        F.lit("band").alias("which"),
        F.col("doc_id").cast("bigint").alias("k1"),
        F.col("band_id").cast("bigint").alias("k2"),
        F.col("band_key").alias("v"),
    )

    # 'plant' arm: candidates = band-key collisions touching a plant;
    # verify = exact token-set Jaccard >= 0.8 — tokenization is confined
    # to the (tiny) candidate id set via a broadcast semi-join, so the
    # verify cost is O(candidates), not another corpus pass.
    pa = bands.select(F.col("doc_id").alias("id_a"), "band_id", "band_key")
    pb = bands.select(F.col("doc_id").alias("id_b"), "band_id", "band_key")
    pcands = (
        pa.join(pb, ["band_id", "band_key"])
        .where((F.col("id_a") < F.col("id_b")) & (F.col("id_b") >= poff))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    cand_ids = pcands.select(
        F.explode(F.array("id_a", "id_b")).alias("doc_id")
    ).distinct()
    ptoks = (
        corpus.join(F.broadcast(cand_ids), "doc_id", "leftsemi")
        .select("doc_id", F.array_sort(F.array_distinct(tokens("text"))).alias("t"))
    )
    pta = ptoks.select(F.col("doc_id").alias("id_a"), F.col("t").alias("ta"))
    ptb = ptoks.select(F.col("doc_id").alias("id_b"), F.col("t").alias("tb"))
    pjoined = pcands.join(pta, "id_a").join(ptb, "id_b").withColumn(
        "_inter", F.size(F.array_intersect("ta", "tb"))
    )
    pjac = F.col("_inter").cast("double") / (
        F.size("ta") + F.size("tb") - F.col("_inter")
    )
    plant_arm = (
        pjoined.withColumn("jac", pjac)
        .where(F.col("jac") >= _PLANT_JACCARD)
        .select(
            F.lit("plant").alias("which"),
            F.col("id_a").cast("bigint").alias("k1"),
            F.col("id_b").cast("bigint").alias("k2"),
            # round BEFORE formatting (module tie policy)
            F.format_string("%.6f", F.round(F.col("jac"), 6)).alias("v"),
        )
    )

    # 'ngram' arm: the same candidates verified on exact 3-gram SHINGLE
    # Jaccard. The lambda-form shingles() runs on the candidate id set
    # only, never the corpus.
    psh = (
        corpus.join(F.broadcast(cand_ids), "doc_id", "leftsemi")
        .select("doc_id", F.array_sort(shingles("text", K_SHINGLE)).alias("s"))
    )
    sha = psh.select(F.col("doc_id").alias("id_a"), F.col("s").alias("sa_sh"))
    shb = psh.select(F.col("doc_id").alias("id_b"), F.col("s").alias("sb_sh"))
    njoined = pcands.join(sha, "id_a").join(shb, "id_b").withColumn(
        "_ninter", F.size(F.array_intersect("sa_sh", "sb_sh"))
    )
    njac = F.col("_ninter").cast("double") / (
        F.size("sa_sh") + F.size("sb_sh") - F.col("_ninter")
    )
    ngram_arm = (
        njoined.withColumn("jac", njac)
        .where(F.col("jac") >= _PLANT_JACCARD)
        .select(
            F.lit("ngram").alias("which"),
            F.col("id_a").cast("bigint").alias("k1"),
            F.col("id_b").cast("bigint").alias("k2"),
            F.format_string("%.6f", F.round(F.col("jac"), 6)).alias("v"),
        )
    )

    # 'simdup' (originals only): per-doc 32-bit SimHash, half-block
    # candidate generation, Hamming verify before the pair dedup
    ssig = simhash16(
        docs.select("doc_id", tokens("text").alias("t")), "doc_id", F.col("t"), nbits=32
    )
    blocks = ssig.select(
        "doc_id", "simhash",
        F.explode(
            F.array(
                F.struct(
                    F.lit(0).alias("part"),
                    F.shiftright("simhash", 16).bitwiseAND(F.lit(65535)).alias("bkey"),
                ),
                F.struct(
                    F.lit(1).alias("part"),
                    F.col("simhash").bitwiseAND(F.lit(65535)).alias("bkey"),
                ),
            )
        ).alias("_b"),
    ).select("doc_id", "simhash", F.col("_b.part").alias("part"), F.col("_b.bkey").alias("bkey"))
    blocks = blocks.transform(materialize)
    a = blocks.select(
        F.col("doc_id").alias("id_a"), F.col("simhash").alias("sa"), "part", "bkey"
    )
    b = blocks.select(
        F.col("doc_id").alias("id_b"), F.col("simhash").alias("sb"), "part", "bkey"
    )
    ham = F.bit_count(F.col("sa").bitwiseXOR(F.col("sb")))
    scands = (
        a.join(b, ["part", "bkey"])
        .where((F.col("id_a") < F.col("id_b")) & (ham <= _SIMDUP_HAMMING))
        .dropDuplicates(["id_a", "id_b"])
    )
    simdup_arm = scands.select(
        F.lit("simdup").alias("which"),
        F.col("id_a").cast("bigint").alias("k1"),
        F.col("id_b").cast("bigint").alias("k2"),
        ham.cast("string").alias("v"),
    )

    # 'contam': per-doc distinct-shared-shingle counts off the same
    # materialized shingle relation; eval set broadcast (tiny by nature)
    orig_sh = sh.where(F.col("doc_id") < poff)
    ev_sh = (
        orig_sh.where(F.col("doc_id") % _CONTAM_EVAL_MOD == 0)
        .select("shingle").distinct()
    )
    leaked = docs.where(F.col("doc_id") % _CONTAM_EVAL_MOD == 0).select(
        (F.col("doc_id") + F.lit(2 * poff)).alias("doc_id"),
        F.concat(F.col("text"), F.lit(f" {_LEAK_SUFFIX}")).alias("text"),
    )
    train_sh = (
        orig_sh.where(F.col("doc_id") % _CONTAM_EVAL_MOD != 0)
        .select("doc_id", "shingle")
        .unionByName(exploded_shingles(leaked, "doc_id", "text", K_SHINGLE))
    )
    contam_arm = (
        train_sh
        .join(F.broadcast(ev_sh), "shingle", "leftsemi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= _CONTAM_MIN_SHARED)
        .select(
            F.lit("contam").alias("which"),
            F.col("doc_id").cast("bigint").alias("k1"),
            F.col("n_shared").cast("bigint").alias("k2"),
            F.lit(None).cast("string").alias("v"),
        )
    )

    # 'dupfrac': per-doc duplicate-shingle fraction over the planted
    # corpus; dsh reads the precomputed hash off the shingle checkpoint
    dsh = sh.select("doc_id", "shid")
    shc = dsh.groupBy("shid").agg(F.count(F.lit(1)).alias("nd"))
    dupfrac_arm = (
        dsh.join(shc, "shid")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_sh"),
            F.sum(F.when(F.col("nd") >= 2, 1).otherwise(0)).alias("n_dup"),
        )
        .select(
            F.lit("dupfrac").alias("which"),
            F.col("doc_id").cast("bigint").alias("k1"),
            F.col("n_dup").cast("bigint").alias("k2"),
            # round-then-format, module tie policy
            F.format_string(
                "%.6f", F.round(F.col("n_dup") / F.col("n_sh"), 6)
            ).alias("v"),
        )
    )
    return band_arm, plant_arm, ngram_arm, simdup_arm, contam_arm, dupfrac_arm


@register(
    "d03_minhash_lsh",
    oracle=f"""
    WITH bands AS ({lsh_bands_sql(
        minhash_signature_sql("documents", "doc_id", shingles_sql_inline("text", 3)),
        "doc_id",
    )}),
    sim AS ({simhash16_sql('documents', 'doc_id', tokens_sql('text'), nbits=32)}),
    blocks AS (
        SELECT doc_id, simhash, 0 AS part, (simhash >> 16) & 65535 AS bkey FROM sim
        UNION ALL
        SELECT doc_id, simhash, 1, simhash & 65535 FROM sim
    ),
    sd_cands AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
               a.simhash AS sa, b.simhash AS sb
        FROM blocks a
        JOIN blocks b ON a.part = b.part AND a.bkey = b.bkey
                     AND a.doc_id < b.doc_id
    ),
    plantcorp AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + {_PMAX_SQL} AS doc_id,
               text || ' {_PLANT_SUFFIX}' AS text
        FROM documents WHERE doc_id % {_PLANT_MOD} = 0
    ),
    pbands AS ({lsh_bands_sql(
        minhash_signature_sql("plantcorp", "doc_id", shingles_sql_inline("text", 3)),
        "doc_id",
    )}),
    pcands AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM pbands a JOIN pbands b
          ON a.band_id = b.band_id AND a.band_key = b.band_key
         AND a.doc_id < b.doc_id
        WHERE b.doc_id >= {_PMAX_SQL}
    ),
    ptoks AS (
        SELECT doc_id, list_sort(list_distinct({tokens_sql('text')})) AS t
        FROM plantcorp
    ),
    pverified AS (
        SELECT id_a, id_b, jac FROM (
            SELECT c.id_a, c.id_b,
                   len(list_intersect(ta.t, tb.t))::DOUBLE
                       / (len(ta.t) + len(tb.t) - len(list_intersect(ta.t, tb.t))) AS jac
            FROM pcands c
            JOIN ptoks ta ON ta.doc_id = c.id_a
            JOIN ptoks tb ON tb.doc_id = c.id_b
        ) WHERE jac >= {_PLANT_JACCARD}
    ),
    pshingles AS (
        SELECT doc_id, list_sort({shingles_sql_inline('text', 3)}) AS s
        FROM plantcorp
    ),
    ngram AS (
        SELECT id_a, id_b, jac FROM (
            SELECT c.id_a, c.id_b,
                   len(list_intersect(sa.s, sb.s))::DOUBLE
                       / (len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s))) AS jac
            FROM pcands c
            JOIN pshingles sa ON sa.doc_id = c.id_a
            JOIN pshingles sb ON sb.doc_id = c.id_b
        ) WHERE jac >= {_PLANT_JACCARD}
    ),
    evsh AS (
        SELECT DISTINCT unnest({shingles_sql_inline('text', 3)}) AS shingle
        FROM documents WHERE doc_id % {_CONTAM_EVAL_MOD} = 0
    ),
    leaked AS (
        SELECT doc_id + 2 * {_PMAX_SQL} AS doc_id,
               text || ' {_LEAK_SUFFIX}' AS text
        FROM documents WHERE doc_id % {_CONTAM_EVAL_MOD} = 0
    ),
    trainsh AS (
        SELECT doc_id, unnest(list_distinct({shingles_sql_inline('text', 3)})) AS shingle
        FROM documents WHERE doc_id % {_CONTAM_EVAL_MOD} <> 0
        UNION ALL
        SELECT doc_id, unnest(list_distinct({shingles_sql_inline('text', 3)})) AS shingle
        FROM leaked
    ),
    contam AS (
        SELECT t.doc_id, count(DISTINCT t.shingle) AS n_shared
        FROM trainsh t JOIN evsh e ON t.shingle = e.shingle
        GROUP BY t.doc_id
        HAVING count(DISTINCT t.shingle) >= {_CONTAM_MIN_SHARED}
    ),
    dsh AS (
        SELECT doc_id, {portable_hash64_sql('shingle')} AS shid
        FROM (
            SELECT doc_id, unnest({shingles_sql_inline('text', 3)}) AS shingle
            FROM plantcorp
        )
    ),
    shc AS (SELECT shid, count(*) AS nd FROM dsh GROUP BY shid),
    dupfrac AS (
        SELECT d.doc_id, count(*) AS n_sh,
               sum(CASE WHEN c.nd >= 2 THEN 1 ELSE 0 END) AS n_dup
        FROM dsh d JOIN shc c ON d.shid = c.shid
        GROUP BY d.doc_id
    )
    SELECT 'band' AS which, doc_id AS k1, band_id::BIGINT AS k2, band_key AS v
    FROM bands
    UNION ALL
    SELECT 'simdup', id_a, id_b, CAST(bit_count(xor(sa, sb)) AS VARCHAR)
    FROM sd_cands
    WHERE bit_count(xor(sa, sb)) <= {_SIMDUP_HAMMING}
    UNION ALL
    SELECT 'plant', id_a, id_b, printf('%.6f', round(jac, 6))
    FROM pverified
    UNION ALL
    SELECT 'ngram', id_a, id_b, printf('%.6f', round(jac, 6))
    FROM ngram
    UNION ALL
    SELECT 'contam', doc_id, n_shared::BIGINT, CAST(NULL AS VARCHAR)
    FROM contam
    UNION ALL
    SELECT 'dupfrac', doc_id, CAST(n_dup AS BIGINT),
           printf('%.6f', round(CAST(n_dup AS DOUBLE) / n_sh, 6))
    FROM dupfrac
    UNION ALL
    SELECT 'fuzzy', id_a, id_b, CAST(dist AS VARCHAR) FROM (
        WITH fz_corpus AS (
            SELECT p_partkey AS id, p_name AS name FROM part
            UNION ALL
            SELECT p_partkey + (SELECT max(p_partkey) + 1 FROM part),
                   substr(p_name, 2)
            FROM part WHERE p_partkey % 20 = 0
        ),
        fz_sigs AS (
            SELECT id, substr(name, 1, i) || substr(name, i + 2) AS sig
            FROM fz_corpus, UNNEST(range(0, length(name) + 1)) AS u(i)
        ),
        fz_cands AS (
            SELECT DISTINCT a.id AS id_a, b.id AS id_b
            FROM fz_sigs a JOIN fz_sigs b ON a.sig = b.sig AND a.id < b.id
            WHERE b.id >= (SELECT max(p_partkey) + 1 FROM part)
        )
        SELECT c.id_a, c.id_b, levenshtein(ca.name, cb.name) AS dist
        FROM fz_cands c
        JOIN fz_corpus ca ON ca.id = c.id_a
        JOIN fz_corpus cb ON cb.id = c.id_b
    ) WHERE dist <= 1
    """,
    tags=("dedup", "minhash", "lsh", "simhash", "decontamination", "dupfrac", "fuzzy"),
)
def d03_minhash_lsh(spark, sf_dir):
    """Signature dedup surfaces, one tagged union: MinHash(16) over
    3-word shingles → 4 LSH band keys per doc ('band'; shingling via
    posexplode + window lead — codegen; the array-lambda form runs
    interpreted and costs ~50× more per row), MinHash/LSH near-dup
    DETECTION on a planted-mutation corpus ('plant': band candidates →
    exact token-Jaccard verify, end-to-end), and SimHash near-dup
    detection ('simdup'): 32-bit token SimHash, half-block candidate
    generation (an equi-join on the 16-bit block key — any Hamming-1
    pair shares a block by pigeonhole), bit_count(xor) verify on
    candidates only — plus 'contam': train/eval n-gram
    DECONTAMINATION (training docs sharing >= 5 distinct shingles with
    the ~1% eval slice, flagged with their overlap count; eval shingle
    set broadcast against the same materialized shingle relation) —
    plus 'dupfrac': the Gopher/RefinedWeb duplicate-n-gram fraction
    per doc, computed over 60-bit shingle hashes so the corpus-scale
    shuffles move bigints, not shingle strings.

    r14: the document substrate is DUPLICATION-ADAPTIVE — when the
    corpus contains exact-duplicate text groups, shingles, MinHash,
    bands, SimHash and the contam/dupfrac counts all run at
    unique-content granularity behind a fingerprint-keyed exact
    collapse and expand through the bigint membership relation (pair
    arms as rep pairs ∪ intra pairs, per-doc arms as a gid equi-join,
    dupfrac's per-shingle doc count group-size-weighted); on a
    duplicate-free corpus the pre-collapse doc-granularity plan runs
    instead. See functions.dedup.has_dup_groups and the two
    _d03_doc_arms_* builders
    above."""
    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    # plant-id offset = max(doc_id) + 1, computed (one pruned max scan,
    # mirrored by the oracle's scalar subquery) so the id-space test
    # below stays correct on ANY corpus — see the constant block above
    poff = int(docs.agg(F.max("doc_id")).collect()[0][0]) + 1
    # ONE shingle→minhash→band pass covers originals AND plants (+2% of
    # the corpus): the 'band' arm is the original-id slice of the same
    # table the 'plant' arm's candidate join probes.
    plants = docs.where(F.col("doc_id") % _PLANT_MOD == 0).select(
        (F.col("doc_id") + F.lit(poff)).alias("doc_id"),
        F.concat(F.col("text"), F.lit(f" {_PLANT_SUFFIX}")).alias("text"),
    )
    corpus = docs.select("doc_id", "text").unionByName(plants)

    # DUPLICATION-ADAPTIVE exact collapse (r13 verdict ask #2 + ask #3):
    # the document substrate runs at unique-content granularity when the
    # corpus actually CONTAINS exact-duplicate groups, and at plain doc
    # granularity (the pre-collapse plan shape) when it does not. Both
    # branches compute identical results on any input — the collapse is
    # purely a performance choice (guide §1.2), so the decision is a
    # stats-driven plan choice, the same move AQE makes one level down:
    # one bigint-only fingerprint aggregate (map-side combinable),
    # executed at plan-build time from the live parquet input, never
    # cached across runs. On a duplicate-free corpus the collapse
    # machinery is pure fixed overhead (measured +1.6 s at sf0.1 —
    # OPTIMIZATION_r14.md); on a clone-heavy corpus the direct plan is
    # super-linear (the r13 sf10 ladder read 16.66x/decade from the
    # band/half-block self-joins inflating over clone groups). The
    # probe reads the RAW document scan, not the spread()+plants
    # corpus: spread's repartition would put a full text exchange
    # inside the probe, and the plants' duplication structure mirrors
    # their sources' (a plant text duplicates iff its source text
    # does), so probing originals decides for the whole corpus.
    collapsed = has_dup_groups(
        load_table(spark, sf_dir, "documents").select("text"), "text"
    )
    (
        band_arm, plant_arm, ngram_arm, simdup_arm, contam_arm,
        dupfrac_arm,
    ) = (_d03_doc_arms_collapsed if collapsed else _d03_doc_arms_direct)(
        corpus, docs, poff
    )

    # 'fuzzy' arm: FUZZY STRING JOIN (entity resolution) — short-string
    # matching under edit distance via DELETION-NEIGHBORHOOD blocking:
    # each name emits its single-char-deletion variants plus itself as
    # signatures (len+1 per row, bounded), any pair within edit
    # distance 1 shares a signature by construction (substitution:
    # both-delete-position-i; indel: the shorter string IS one of the
    # longer's deletions), candidates come from the signature equi-join
    # and exact levenshtein <= 1 verifies. Planted ground truth: every
    # 20th part name re-enters with its first character dropped at
    # id + (max(p_partkey)+1) — both engines construct it identically —
    # and candidates are restricted to pairs TOUCHING a plant (the
    # detection task; unrestricted, the corpus's heavily-repeated names
    # would emit ~42k exact-duplicate pairs, which is d01's job). Same bucketed shape as every other dedup path:
    # the quadratic work is confined to signature groups.
    part_nm = load_table(spark, sf_dir, "part").select("p_partkey", "p_name")
    foff = int(part_nm.agg(F.max("p_partkey")).collect()[0][0]) + 1
    fz_corpus = (
        part_nm.select(F.col("p_partkey").alias("id"), F.col("p_name").alias("name"))
        .unionByName(
            part_nm.where(F.col("p_partkey") % 20 == 0).select(
                (F.col("p_partkey") + F.lit(foff)).alias("id"),
                F.expr("substring(p_name, 2)").alias("name"),
            )
        )
        # single consumer (the fingerprinted fz_fp relation below,
        # which is itself materialized) — no checkpoint needed
    )
    from ..functions.dedup import fuzzy_candidates

    # EXACT-COLLAPSE-FIRST for the fuzzy arm (r13): part names are
    # MASSIVELY repeated (sf0.1: 20,000 parts, 64 distinct names — mean
    # clone group ≈ 312), and byte-identical names emit identical
    # deletion signatures, so every signature block holds whole clone
    # groups and the block self-join + the per-pair levenshtein verify
    # pay C(k,2)-shaped work for pairs whose distance is 0 by
    # construction. Group names first, run signature-join + levenshtein
    # at UNIQUE-NAME granularity (~128 names incl. plants), and expand
    # membership afterwards; the plant restriction (id_b >= foff) is
    # applied AFTER expansion because a group may in principle mix
    # originals and plants (the filter is id-level, the group is
    # name-level). Provably output-identical: identical names ⇒
    # identical signatures ⇒ the doc-level candidate set is exactly
    # {expanded rep pairs} ∪ {intra-group pairs}, and levenshtein is a
    # function of the two names, which expansion preserves (intra
    # pairs: levenshtein(n, n) = 0 ≤ 1, v = '0').
    #
    # RE-KEYED on the 128-bit content fingerprint (r13 verdict ask #1,
    # same mechanism as d02): groupBy(fp) + min/min_by collapses the
    # ~312-clone name groups MAP-SIDE — the r13 window form shuffled
    # every (id, name) row to one reducer per distinct name with no
    # partial aggregation.
    ff1, ff2 = fingerprint128("name")
    # fz_fp embeds twice (the group agg + the members join) — left
    # unmaterialized on purpose: re-running a 20k-row scan + row-local
    # hash twice is far cheaper than another checkpoint site's
    # build-time stage materialization (r13 planning-tax finding).
    fz_fp = fz_corpus.select(
        "id", "name", ff1.alias("_f1"), ff2.alias("_f2")
    )
    fz_groups = (
        fz_fp.groupBy("_f1", "_f2")
        .agg(F.min("id").alias("gid"), F.min_by("name", "id").alias("name"))
        .transform(materialize)
    )
    fz_reps = fz_groups.select(F.col("gid").alias("id"), "name")
    # fz_members embeds four times (two inter-expansion sides, the
    # intra self-join's two sides) — left unmaterialized on purpose:
    # each embed is a broadcast join of the (tiny, checkpointed)
    # fz_groups against a 20k-row scan, far cheaper than another
    # checkpoint site's build-time stage materialization.
    fz_members = (
        fz_fp.select("id", "_f1", "_f2")
        .join(F.broadcast(fz_groups.select("_f1", "_f2", "gid")), ["_f1", "_f2"])
        .select("id", "gid")
    )
    g_cands = fuzzy_candidates(fz_reps, "id", "name")
    g_verified = (
        g_cands.join(
            fz_reps.select(F.col("id").alias("id_a"), F.col("name").alias("name_a")), "id_a"
        )
        .join(
            fz_reps.select(F.col("id").alias("id_b"), F.col("name").alias("name_b")), "id_b"
        )
        .withColumn("dist", F.levenshtein("name_a", "name_b"))
        .where(F.col("dist") <= 1)
        .select("id_a", "id_b", "dist")
    )
    fz_inter = (
        g_verified
        .join(fz_members.select(F.col("gid").alias("id_a"),
                                F.col("id").alias("ia")), "id_a")
        .join(fz_members.select(F.col("gid").alias("id_b"),
                                F.col("id").alias("ib")), "id_b")
        .select(F.least("ia", "ib").alias("id_a"),
                F.greatest("ia", "ib").alias("id_b"),
                "dist")
    )
    fz_intra = (
        fz_members.select("gid", F.col("id").alias("id_a"))
        .join(fz_members.select("gid", F.col("id").alias("id_b")), "gid")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.lit(0).alias("dist"))
    )
    fuzzy_arm = (
        fz_inter.unionByName(fz_intra)
        .where(F.col("id_b") >= F.lit(foff))
        .select(
            F.lit("fuzzy").alias("which"),
            F.col("id_a").cast("bigint").alias("k1"),
            F.col("id_b").cast("bigint").alias("k2"),
            F.col("dist").cast("string").alias("v"),
        )
    )
    return (
        band_arm.unionByName(simdup_arm)
        .unionByName(plant_arm).unionByName(ngram_arm)
        .unionByName(contam_arm).unionByName(dupfrac_arm)
        .unionByName(fuzzy_arm)
    )


# D5 — SKETCH ACCURACY audits, one tagged union:
#   which='mh'  — MinHash: estimated vs exact Jaccard on high-overlap
#                 pairs (unigram signatures so the estimate targets the
#                 same token-set Jaccard d02 computes exactly). Runs on
#                 a FIXED-COUNT deterministic sample (smallest
#                 D05_SAMPLE_K doc_ids — a bounded top-k scan, not a
#                 proportional slice), so the all-pairs stage is O(k²)
#                 CONSTANT work no matter how large the corpus grows.
#   which='hll' — HyperLogLog: per-domain distinct-token cardinality
#                 estimate vs the exact count. A PORTABLE HLL — both
#                 engines compute IDENTICAL registers from the 60-bit
#                 md5 hash (bucket = low HLL_P bits, rho = leading-zero
#                 rank of the remaining 50 bits via length(bin(w)),
#                 identical in Spark and DuckDB), and the harmonic sum
#                 Σ 2^-M_j is carried as the EXACT bigint
#                 Σ 2^(51-M_j) (plus 2^51 per empty register), so the
#                 estimate alpha·m²·2^51/Zint is the same double on
#                 both sides — no fp-order or libm divergence anywhere.
#                 The raw (uncorrected) HLL estimate is gated; the
#                 small/large-range corrections a production sketch
#                 adds are branch-selected from the SAME gated inputs
#                 (Zint, V), so gating these gates the whole sketch.
#                 Shape: one row-local hash pass over (lang, token)
#                 pairs, a 1024-ary per-domain register agg (map-side
#                 combined — the shuffle is ≤ m rows per domain per
#                 partition at any corpus size); the exact count rides
#                 the SAME aggregation chain (per-bucket distinct-token
#                 counts sum to the domain's cardinality), so the audit
#                 adds no extra corpus pass. At 100 TB the registers
#                 merge associatively across any partitioning — the
#                 property that makes HLL the distributed-distinct
#                 workhorse; only the audit's exact side needs the
#                 distinct shuffle.
#   which='cms' — Count-Min sketch: corpus token-frequency estimates
#                 for the exact top-CMS_TOP heavy hitters vs their true
#                 counts. The sketch is CMS_D rows × CMS_W counters;
#                 row j's bucket comes from an independent 12-bit slice
#                 of the same md5 both engines compute. Counters are
#                 built from the per-token count relation (counter =
#                 Σ n over tokens hashing into it — identical to
#                 counting occurrences, one corpus pass shared with
#                 the exact side), so the sketch shuffle moves at most
#                 CMS_D·CMS_W rows per partition; the tiny counter
#                 table broadcasts to the query probe. All-integer ⇒
#                 bit-exact cross-engine; est ≥ exact structurally.
#                 Counters merge by ADDITION across partitions — the
#                 mergeability that makes CMS the distributed
#                 heavy-hitter workhorse.
#   which='bloom' — Bloom filter "seen-before" membership: the filter
#                 is built from the even-doc_id half's canonical
#                 fingerprints (d01's dedup key) as 60-bit words
#                 (word = pos DIV 60, mask = 1<<pos%60; words merge by
#                 bit_or — associative, so the filter builds under any
#                 partitioning), then EVERY document probes it:
#                 BLOOM_K positions from independent 16-bit md5
#                 slices, hit iff all K bits set. The filter is SIZED
#                 FROM THE CORPUS — BLOOM_BPK bits per base key (FP ≈
#                 0.7% at k=4), the key count measured by one bounded
#                 count (the e02 plant-offset rule: never bake an
#                 assumption a bigger corpus violates — a fixed 7680
#                 bits saturates at sf1). The word relation broadcasts
#                 to the probe — the incremental-dedup shape where a
#                 new batch screens against a prior corpus snapshot
#                 without shuffling it (past broadcast size, ~100M+
#                 keys, the same relation word-partitions into an
#                 equi-join; bit_or merging is unchanged). Gates BOTH
#                 columns: exact membership (fp ∈ base half) and the
#                 bloom verdict — deterministic false positives
#                 included, since both engines compute identical bits.
#                 Members can never miss (est_v ≥ exact_v row-wise).
#                 NOTE: 16-bit position slices cap addressable bits at
#                 65536 (≈ 5.5k keys at BLOOM_BPK=12); guarded by an
#                 explicit raise — widen the slices to grow further.
D05_SAMPLE_K = 400
HLL_P = 10
HLL_M = 1 << HLL_P  # 1024 registers
# alpha_m * m^2 * 2^51 — the numerator of the estimate over the integer
# harmonic sum Zint; a decimal literal both engines parse to the same
# double (repr roundtrips exactly)
HLL_EST_NUM = (0.7213 / (1.0 + 1.079 / HLL_M)) * HLL_M * HLL_M * float(1 << 51)
CMS_D = 4  # sketch rows (independent hash functions)
CMS_W = 512  # counters per row
CMS_TOP = 20  # heavy hitters audited
BLOOM_MIN_WORDS = 128
BLOOM_WORD_BITS = 60  # 1<<bit stays positive in int64 on both engines
BLOOM_K = 4
BLOOM_BPK = 12  # bits per base key (k=4 ⇒ FP ≈ (1-e^(-1/3))^4 ≈ 0.7%)
# bit positions come from 4-hex-digit md5 slices ⇒ at most 2^16 bits
BLOOM_MAX_BITS = 1 << 16
_BLOOM_WORDS_SQL = (
    f"(SELECT greatest({BLOOM_MIN_WORDS}, CAST(ceil("
    f"count(*) * {BLOOM_BPK} / {BLOOM_WORD_BITS}.0) AS BIGINT)) FROM bbase)"
)
_JS = "(SELECT unnest([" + ",".join(str(j) for j in range(CMS_D)) + "]) AS j) js"


def _d05_sql() -> str:
    from ..functions.dedup import N_HASHES

    sample = f"(SELECT * FROM documents ORDER BY doc_id LIMIT {D05_SAMPLE_K})"
    sig = minhash_signature_sql(
        sample, "doc_id",
        f"list_distinct({tokens_sql('text')})",
    )
    agree = " + ".join(f"CASE WHEN a.mh_{i} = b.mh_{i} THEN 1 ELSE 0 END" for i in range(N_HASHES))
    return f"""
    WITH sig AS ({sig}),
    toks AS (
        SELECT doc_id, list_sort(list_distinct({tokens_sql('text')})) AS t
        FROM {sample} s
    ),
    pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               len(list_intersect(a.t, b.t))::DOUBLE
                   / (len(a.t) + len(b.t) - len(list_intersect(a.t, b.t))) AS jaccard
        FROM toks a JOIN toks b ON a.doc_id < b.doc_id
    ),
    hllh AS (
        SELECT lang, h % {HLL_M} AS bucket, h >> {HLL_P} AS w
        FROM (
            SELECT lang, {portable_hash64_sql('tok')} AS h
            FROM (
                SELECT DISTINCT lang, tok FROM (
                    SELECT lang, unnest({tokens_sql('text')}) AS tok
                    FROM documents
                ) WHERE tok <> ''
            )
        )
    ),
    hllregs AS (
        SELECT lang, bucket,
               max(CASE WHEN w = 0 THEN 51 ELSE 51 - length(bin(w)) END) AS mr,
               count(*) AS nt
        FROM hllh GROUP BY lang, bucket
    ),
    hll AS (
        SELECT lang, CAST(count(*) AS BIGINT) AS nb,
               CAST(sum(1::BIGINT << (51 - mr)) AS BIGINT) AS zhit,
               CAST(sum(nt) AS BIGINT) AS exact_n
        FROM hllregs GROUP BY lang
    ),
    cmstok AS (
        SELECT tok, count(*)::BIGINT AS n
        FROM (SELECT unnest({tokens_sql('text')}) AS tok FROM documents)
        WHERE tok <> '' GROUP BY tok
    ),
    cmsctr AS (
        SELECT j,
               CAST(CONCAT('0x', substr(md5(CAST(tok AS VARCHAR)), 1 + 3*j, 3)) AS BIGINT)
                   % {CMS_W} AS bucket,
               sum(n)::BIGINT AS cnt
        FROM cmstok CROSS JOIN {_JS}
        GROUP BY 1, 2
    ),
    cmstop AS (SELECT tok, n FROM cmstok ORDER BY n DESC, tok ASC LIMIT {CMS_TOP}),
    cmsest AS (
        SELECT t.tok, t.n, min(c.cnt) AS est
        FROM (
            SELECT tok, n, j,
                   CAST(CONCAT('0x', substr(md5(CAST(tok AS VARCHAR)), 1 + 3*j, 3)) AS BIGINT)
                       % {CMS_W} AS bucket
            FROM cmstop CROSS JOIN {_JS}
        ) t JOIN cmsctr c ON c.j = t.j AND c.bucket = t.bucket
        GROUP BY t.tok, t.n
    ),
    bfp AS (
        SELECT doc_id,
               array_to_string(list_sort(list_distinct({tokens_sql('text')})), ' ') AS fp
        FROM documents
    ),
    bbase AS (SELECT DISTINCT fp FROM bfp WHERE doc_id % 2 = 0),
    bbits AS (
        SELECT pos // {BLOOM_WORD_BITS} AS word,
               bit_or(1::BIGINT << CAST(pos % {BLOOM_WORD_BITS} AS INT)) AS bits
        FROM (
            SELECT CAST(CONCAT('0x', substr(md5(CAST(fp AS VARCHAR)), 1 + 4*j, 4)) AS BIGINT)
                       % ({_BLOOM_WORDS_SQL} * {BLOOM_WORD_BITS}) AS pos
            FROM bbase CROSS JOIN {_JS}
        ) GROUP BY 1
    ),
    bprobe AS (
        SELECT doc_id, fp,
               min(CASE WHEN bits IS NOT NULL AND (bits & mask) = mask
                        THEN 1 ELSE 0 END) AS bloom_hit
        FROM (
            SELECT doc_id, fp, pos // {BLOOM_WORD_BITS} AS word,
                   1::BIGINT << CAST(pos % {BLOOM_WORD_BITS} AS INT) AS mask
            FROM (
                SELECT doc_id, fp,
                       CAST(CONCAT('0x', substr(md5(CAST(fp AS VARCHAR)), 1 + 4*j, 4)) AS BIGINT)
                           % ({_BLOOM_WORDS_SQL} * {BLOOM_WORD_BITS}) AS pos
                FROM bfp CROSS JOIN {_JS}
            )
        ) p LEFT JOIN bbits b ON b.word = p.word
        GROUP BY doc_id, fp
    )
    SELECT 'mh' AS which, p.doc_a AS k1, p.doc_b AS k2,
           CAST(NULL AS BIGINT) AS k3,
           round(p.jaccard, 6) AS exact_v,
           round(({agree}) / {float(N_HASHES)}, 6) AS est_v
    FROM pairs p
    JOIN sig a ON a.doc_id = p.doc_a
    JOIN sig b ON b.doc_id = p.doc_b
    WHERE p.jaccard >= 0.8
    UNION ALL
    SELECT 'hll', {portable_hash64_sql('lang')},
           zhit + ({HLL_M} - nb) * (1::BIGINT << 51),
           {HLL_M} - nb,
           CAST(exact_n AS DOUBLE),
           round({HLL_EST_NUM!r}
                 / CAST(zhit + ({HLL_M} - nb) * (1::BIGINT << 51) AS DOUBLE), 6)
    FROM hll
    UNION ALL
    SELECT 'cms', {portable_hash64_sql('tok')}, n, est,
           CAST(n AS DOUBLE), CAST(est AS DOUBLE)
    FROM cmsest
    UNION ALL
    SELECT 'bloom', doc_id, {portable_hash64_sql('fp')}, bloom_hit::BIGINT,
           CASE WHEN fp IN (SELECT fp FROM bbase) THEN 1.0 ELSE 0.0 END,
           CAST(bloom_hit AS DOUBLE)
    FROM bprobe
    """


@register("d05_minhash_accuracy", oracle=_d05_sql(), tags=("dedup", "minhash", "hll"))
def d05_minhash_accuracy(spark, sf_dir):
    """Sketch-accuracy audits ('mh' arm: signature-agreement MinHash
    estimate vs exact Jaccard on high-overlap pairs of a bounded
    TakeOrdered sample — O(k²) at any corpus size; 'hll' arm: portable
    HyperLogLog per-domain distinct-token estimate vs the exact count,
    registers and the integer harmonic sum identical across engines —
    see the header comment)."""
    from ..functions.dedup import N_HASHES, minhash_signature
    from ..functions.text import portable_hash64

    docs = spread(
        load_table(spark, sf_dir, "documents").orderBy("doc_id").limit(D05_SAMPLE_K),
        "doc_id",
    )
    toks = docs.select("doc_id", F.array_sort(F.array_distinct(tokens("text"))).alias("t"))
    sig = minhash_signature(toks, "doc_id", F.col("t"))

    a = toks.select(F.col("doc_id").alias("doc_a"), F.col("t").alias("ta"))
    b = toks.select(F.col("doc_id").alias("doc_b"), F.col("t").alias("tb"))
    joined = a.join(b, F.col("doc_a") < F.col("doc_b")).withColumn(
        "_inter", F.size(F.array_intersect("ta", "tb"))
    )
    jac = F.col("_inter").cast("double") / (F.size("ta") + F.size("tb") - F.col("_inter"))
    pairs = (
        joined.withColumn("jaccard", jac)
        .where(F.col("jaccard") >= 0.8)
        .select("doc_a", "doc_b", "jaccard")
    )
    sa = sig.select(F.col("doc_id").alias("doc_a"), *[F.col(f"mh_{i}").alias(f"a_{i}") for i in range(N_HASHES)])
    sb = sig.select(F.col("doc_id").alias("doc_b"), *[F.col(f"mh_{i}").alias(f"b_{i}") for i in range(N_HASHES)])
    est = sum(
        F.when(F.col(f"a_{i}") == F.col(f"b_{i}"), 1).otherwise(0) for i in range(N_HASHES)
    ) / float(N_HASHES)
    mh_arm = (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            F.lit("mh").alias("which"),
            F.col("doc_a").alias("k1"),
            F.col("doc_b").alias("k2"),
            F.lit(None).cast("bigint").alias("k3"),
            F.round("jaccard", 6).alias("exact_v"),
            F.round(est, 6).alias("est_v"),
        )
    )

    # 'hll' arm (see the header comment): registers and the exact count
    # ride ONE aggregation chain — per (lang, bucket) the max rho AND
    # the distinct-token count, then per lang the register fold.
    full = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    td = (
        full.select("lang", F.explode(tokens("text")).alias("tok"))
        .where(F.col("tok") != "")
        .distinct()
    )
    hb = td.select("lang", portable_hash64("tok").alias("h")).select(
        "lang",
        (F.col("h") % HLL_M).alias("bucket"),
        F.shiftright("h", HLL_P).alias("w"),
    )
    rho = F.when(F.col("w") == 0, F.lit(51)).otherwise(
        F.lit(51) - F.length(F.bin("w"))
    )
    regs = hb.select("lang", "bucket", rho.alias("rho")).groupBy("lang", "bucket").agg(
        F.max("rho").alias("mr"), F.count(F.lit(1)).alias("nt")
    )
    per_lang = regs.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("nb"),
        F.sum(F.expr("shiftleft(cast(1 as bigint), 51 - mr)")).cast("bigint").alias("zhit"),
        F.sum("nt").cast("bigint").alias("exact_n"),
    )
    zint = F.col("zhit") + (F.lit(HLL_M) - F.col("nb")) * F.lit(1 << 51)
    hll_arm = per_lang.select(
        F.lit("hll").alias("which"),
        portable_hash64("lang").alias("k1"),
        zint.alias("k2"),
        (F.lit(HLL_M) - F.col("nb")).cast("bigint").alias("k3"),
        F.col("exact_n").cast("double").alias("exact_v"),
        F.round(F.lit(HLL_EST_NUM) / zint.cast("double"), 6).alias("est_v"),
    )

    # 'cms' arm (see the header comment): ONE corpus tokenize pass yields
    # the per-token count relation; both the sketch counters and the
    # exact heavy-hitter side derive from it (materialized — it feeds
    # two aggregations).
    tokcnt = materialize(
        full.select(F.explode(tokens("text")).alias("tok"))
        .where(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )

    def _cms_buckets() -> F.Column:
        h = F.md5(F.col("tok").cast("string"))
        return F.array(*[
            F.conv(F.substring(h, 1 + 3 * j, 3), 16, 10).cast("bigint") % CMS_W
            for j in range(CMS_D)
        ])

    counters = (
        tokcnt.select("n", F.posexplode(_cms_buckets()).alias("j", "bucket"))
        .groupBy("j", "bucket")
        .agg(F.sum("n").cast("bigint").alias("cnt"))
    )
    top = tokcnt.orderBy(F.desc("n"), F.asc("tok")).limit(CMS_TOP)
    qb = top.select("tok", "n", F.posexplode(_cms_buckets()).alias("j", "bucket"))
    cms_arm = (
        qb.join(F.broadcast(counters), ["j", "bucket"])
        .groupBy("tok", "n")
        .agg(F.min("cnt").alias("est"))
        .select(
            F.lit("cms").alias("which"),
            portable_hash64("tok").alias("k1"),
            F.col("n").alias("k2"),
            F.col("est").alias("k3"),
            F.col("n").cast("double").alias("exact_v"),
            F.col("est").cast("double").alias("est_v"),
        )
    )

    # 'bloom' arm (see the header comment): filter over the even-half's
    # canonical fingerprints, broadcast to a probe of every document.
    fp = F.array_join(F.array_sort(F.array_distinct(tokens("text"))), " ")
    dfp = materialize(full.select("doc_id", fp.alias("fp")))
    base_fps = materialize(
        dfp.where(F.col("doc_id") % 2 == 0).select("fp").distinct()
    )
    # size the filter from the measured key count (one bounded count over
    # the materialized base relation — the e02 plant-offset rule); the
    # SQL twin computes the identical number via a scalar subquery
    n_base = base_fps.count()
    bloom_words = max(
        BLOOM_MIN_WORDS, -(-n_base * BLOOM_BPK // BLOOM_WORD_BITS)
    )
    bloom_bits = bloom_words * BLOOM_WORD_BITS
    if bloom_bits > BLOOM_MAX_BITS:
        raise ValueError(
            f"bloom filter needs {bloom_bits} bits for {n_base} keys but the "
            f"16-bit md5 position slices address at most {BLOOM_MAX_BITS}; "
            "widen the slices (BLOOM_K × hex digits) to scale further"
        )

    def _bloom_wm(src):
        h = F.md5(F.col("fp").cast("string"))
        pos_arr = F.array(*[
            F.conv(F.substring(h, 1 + 4 * j, 4), 16, 10).cast("bigint") % bloom_bits
            for j in range(BLOOM_K)
        ])
        return src.select(
            *src.columns, F.explode(pos_arr).alias("pos")
        ).select(
            *src.columns,
            F.expr(f"pos DIV {BLOOM_WORD_BITS}").alias("word"),
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), CAST(pos % {BLOOM_WORD_BITS} AS INT))"
            ).alias("mask"),
        )

    bloom = (
        _bloom_wm(base_fps)
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
    )
    hit = F.when(
        F.col("bits").isNotNull()
        & (F.col("bits").bitwiseAND(F.col("mask")) == F.col("mask")),
        1,
    ).otherwise(0)
    bloom_arm = (
        _bloom_wm(dfp)
        .join(F.broadcast(bloom), "word", "left")
        .select("doc_id", "fp", hit.alias("hit"))
        .groupBy("doc_id", "fp")
        .agg(F.min("hit").alias("bloom_hit"))
        .join(base_fps.withColumn("is_member", F.lit(1)), "fp", "left")
        .select(
            F.lit("bloom").alias("which"),
            F.col("doc_id").alias("k1"),
            portable_hash64("fp").alias("k2"),
            F.col("bloom_hit").cast("bigint").alias("k3"),
            F.coalesce(F.col("is_member"), F.lit(0)).cast("double").alias("exact_v"),
            F.col("bloom_hit").cast("double").alias("est_v"),
        )
    )
    return (
        mh_arm.unionByName(hll_arm).unionByName(cms_arm).unionByName(bloom_arm)
    )


# SimHash (D4) is driver-gated twice: as the 16-bit `simhash` profile
# column of t02_text_profile (plans/text_queries.py) and as the 32-bit
# near-dup DETECTION pipeline in d03's 'simdup' arm above — the operator
# itself lives in functions/dedup.py:simhash16 (nbits param).
