"""Driver-contract queries + DuckDB oracles for the pipeline operators
(dedup / similarity / text / multimodal) over the `documents` and
`embeddings` tables. Shared constants drive both sides; float outputs are
rounded to 6 decimals on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.hashing import (
    MERSENNE_P, minhash_params, sql_affine_hash, sql_hash32, sql_hash64,
    sql_tokens, sql_word_shingles)
from ..sources.tables import load_table
from . import (bloom, corpus, dedup, ivf, joins, multimodal, pq, sampling,
               similarity, sketches, stats, text)

ROUND = 6

N_HASHES = 8
BANDS = 4
SHINGLE_K = 3
MINHASH_SEED = 42
LSH_MIN_EST = 0.5
JACCARD_TAU = 0.2
COSINE_TAU = 0.4  # synthetic embeddings are near-orthogonal; max pair ~0.51
TOPK_QUERY_IDS = list(range(10))
TOPK_K = 5
N_PLANES = 8
EMB_DIM = 64
# o15 multi-table+multi-probe ANN: b=3-bit buckets x L=10 tables, 2 probes
# per table — measured recall 1.0 vs o07's exact top-k on the gate data
# (tests/test_similarity_recall.py pins >= 0.9)
ANN_PLANES = 3
ANN_TABLES = 10
ANN_PROBES = 2
# o16 IVF ANN: 16 seed centroids (cell id = seed vec_id), 8-cell probe;
# recall floors measured in tests/test_ivf.py
IVF_CENTROID_IDS = list(range(0, 480, 30))
IVF_PROBES = 8
# o76 IVF-PQ: same coarse cells/probes as o16 so the two queries differ in
# exactly one stage (exact-cosine re-rank vs ADC ranking); 8 subspaces of
# 8 dims, 16 codes per subspace seeded from the same id list
PQ_M = 8
# o17/o18 hot-bucket skew guards — thresholds chosen so the guard path
# EXECUTES on the sf0.01 gate data (LSH band buckets reach size 3; ANN
# 3-plane buckets hold ~62 of 500 vectors), proving oracle parity of the
# guarded plans, not just of the no-op default.
GUARD_LSH_MAX_BUCKET = 2
GUARD_ANN_MAX_BUCKET = 32


# ---------------------------------------------------------------------------
# Registry retirement shortlist (round-10 verdict ask #8)
# ---------------------------------------------------------------------------
# The registry sits at the structural capacity of the 50-row/round driver
# window (100 queries = two full rotations). Adding a query therefore
# requires retiring one, per the o02 precedent: a STRICT INTERMEDIATE of a
# gated pipeline, whose oracle is embedded verbatim in a downstream gated
# query's oracle, documented at the retirement site. Pre-vetted candidates,
# with the embedding-oracle evidence:
#
# 1. o44_semdedup_pairs — _oracle_semdedup("apply") (o45, gated) contains
#    o44's ENTIRE oracle as its `pairs` CTE (_oracle_semdedup builds both
#    faces from one base); the apply gate exercises assignment + pair join
#    + tau filter end-to-end. Operator stays pytest-covered
#    (tests/test_ivf.py semdedup_* suite).
# 2. o56_semdedup_hier_pairs — same structure one level up:
#    _oracle_semdedup_hier("apply") (o57, gated) embeds o56's pairs CTE.
# 3. o09_token_counts — o32_doc_profile's oracle (sql_document_profile)
#    embeds sql_token_counts as its `tok` CTE (over the PII-augmented
#    view; the generator is shared, the gate covers the same expressions).
# 4. o11_quality — sql_quality_score is o32's `qual` CTE, same reasoning.
# 5. o12_fingerprint — sql_fingerprint is o32's `fp` CTE, same reasoning.
#
# NOT candidates despite surface similarity: o06/o07 (the documented
# O(n^2) exact verifiers — they are the RECALL ORACLES for the bucketed
# planes, not intermediates); o10_lang_id (o32 scores only the first
# LID_PROFILE_MAX_CHARS chars — o10 is the only full-text LID gate);
# o16_ivf_topk (o76 shares its probe stage but ranks by ADC — the
# exact-cosine ranking is only gated by o16).
#
# WINDOW-SLOT LAW (learned round 12): a donor must ALSO come from the
# current round's ROTATION-DEBT set (green only in r{N-2}), because a new
# query consumes a slot in the 50-row driver window, not just a registry
# slot — retiring a query green in r{N-1} leaves the debt set at 50 and
# strands one debt query outside the window. Round 12 therefore retired
# o61_semdedup_hier_gram_pairs (debt-set; oracle = o56's string VERBATIM,
# kernel parity pytest-pinned — see the retirement note at its site)
# rather than shortlist item #1 (o44, r11-green). The shortlist above
# stays valid as EVIDENCE of duplicate oracles; check the donor's window
# membership each round before using it.
#
# Round-13 note: the r13 rotation-debt set is the r11-green 50, which
# contained ALL FIVE shortlist entries — round 13 retired #1
# (o44_semdedup_pairs, window-legal; see the retirement note at its
# site) for o78_pq_hier_collisions.
#
# Round-14 note: NO shortlist entry sits in the r14 debt set (o56, o09,
# o11, o12 were all green in r13), so no retirement is window-legal this
# round. The r13 ask-#6 surface (o79_band_ingest_loop, the continuous
# band-ingest LOOP) is therefore BUILT AND QUEUED - query + DuckDB twin
# defined below, stream==batch parity pinned in
# tests/test_bucketed_and_stream_dedup.py - and registers in round 15,
# when o56's r13 green row ages into the debt set and shortlist entry #2
# becomes a legal donor (note at q_o56's site).
#
# Round-15 note: executed exactly as queued — o56's r13-green row aged
# into the r15 debt set (green(r13) - green(r14) contains it), so
# shortlist entry #2 became the legal donor: o56 RETIRED (note at its
# former site), o79_band_ingest_loop registered in its slot. Rotation
# invariant preserved: r14 ∩ r15 window = ∅, union = all 100 registered.
# ---------------------------------------------------------------------------

# ---------------------------------------------------------------------------
# Spark-side queries
# ---------------------------------------------------------------------------

def q_o01_exact_dedup(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return dedup.exact_dedup(docs, ["text"], "doc_id")


# o02_minhash_sigs RETIRED (round 10): it materialized
# dedup.minhash_signatures directly, but o03/o17/o50/o59 all run the same
# signature stage inside lsh_candidate_pairs and o03's DuckDB twin embeds
# o02's entire oracle CTE (_sql_minhash_sig_cte) — the query was a strict
# intermediate of an already-gated pipeline. With the registry at the
# structural capacity of the 50-row/round driver window (100 queries =
# two full rotations), its slot was donated to o76_pq_topk. The operator
# itself is unchanged and still pytest-covered (tests/test_operators.py).


def q_o03_lsh_pairs(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.lsh_candidate_pairs(docs, "text", "doc_id", N_HASHES,
                                      BANDS, SHINGLE_K, LSH_MIN_EST,
                                      MINHASH_SEED)
    return pairs.select("id_a", "id_b",
                        F.round("est_jaccard", ROUND).alias("est_jaccard"))


def q_o04_simhash(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return dedup.simhash(docs, "text", "doc_id", bits=32)


def q_o05_ngram_jaccard(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs(docs, "text", "doc_id", SHINGLE_K,
                                      JACCARD_TAU)
    return pairs.select("id_a", "id_b", F.round("jaccard", ROUND).alias("jaccard"))


def q_o06_cosine_pairs(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    pairs = dedup.embedding_cosine_pairs(emb, "embedding", "vec_id", COSINE_TAU)
    return pairs.select("id_a", "id_b", F.round("cosine", ROUND).alias("cosine"))


def q_o07_cosine_topk(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    out = similarity.cosine_topk(emb, "embedding", "vec_id", TOPK_QUERY_IDS, TOPK_K)
    return out.select("query_id", "neighbor_id",
                      F.round("cosine", ROUND).alias("cosine"),
                      F.col("rank").cast("bigint").alias("rank"))


def q_o08_lsh_topk(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    out = similarity.lsh_bucketed_topk(emb, "embedding", "vec_id",
                                       TOPK_QUERY_IDS, TOPK_K, N_PLANES, EMB_DIM)
    return out.select("query_id", "neighbor_id",
                      F.round("cosine", ROUND).alias("cosine"),
                      F.col("rank").cast("bigint").alias("rank"))


def q_o15_ann_topk(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    out = similarity.lsh_bucketed_topk(emb, "embedding", "vec_id",
                                       TOPK_QUERY_IDS, TOPK_K,
                                       n_planes=ANN_PLANES, dim=EMB_DIM,
                                       n_probes=ANN_PROBES, n_tables=ANN_TABLES)
    return out.select("query_id", "neighbor_id",
                      F.round("cosine", ROUND).alias("cosine"),
                      F.col("rank").cast("bigint").alias("rank"))


def q_o16_ivf_topk(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    out = ivf.ivf_topk(emb, "embedding", "vec_id", TOPK_QUERY_IDS, TOPK_K,
                       centroid_ids=IVF_CENTROID_IDS, n_probes=IVF_PROBES)
    return out.select("query_id", "neighbor_id",
                      F.round("cosine", ROUND).alias("cosine"),
                      F.col("rank").cast("bigint").alias("rank"))


def q_o76_pq_topk(spark, sf_dir):
    """IVF-PQ (IVFADC) top-k: o16's coarse probe stage with asymmetric
    product-quantization ranking in place of the exact-cosine re-rank —
    the scan-side payload drops from 64 floats to 8 codes per row (the
    100 TB IO face; operators/pq.py header). Seeds double as coarse cells
    and sub-codebook entries so the DuckDB twin replays every stage from
    the registered tables alone."""
    emb = load_table(spark, sf_dir, "embeddings")
    out = pq.pq_topk(emb, "embedding", "vec_id", TOPK_QUERY_IDS, TOPK_K,
                     m=PQ_M, code_ids=IVF_CENTROID_IDS,
                     coarse_centroid_ids=IVF_CENTROID_IDS,
                     n_probes=IVF_PROBES)
    return out.select("query_id", "neighbor_id",
                      F.round("adc", ROUND).alias("adc"),
                      F.col("rank").cast("bigint").alias("rank"))


def q_o17_lsh_pairs_guard(spark, sf_dir):
    """o03 with the hot-bucket split guard engaged (max_bucket=2 splits the
    size-3 gate buckets) — oracle-verifies the guarded plan end-to-end."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.lsh_candidate_pairs(docs, "text", "doc_id", N_HASHES,
                                      BANDS, SHINGLE_K, LSH_MIN_EST,
                                      MINHASH_SEED,
                                      max_bucket=GUARD_LSH_MAX_BUCKET,
                                      skew_mode="split")
    return pairs.select("id_a", "id_b",
                        F.round("est_jaccard", ROUND).alias("est_jaccard"))


def q_o18_ann_topk_guard(spark, sf_dir):
    """o15 with data-side buckets deterministically truncated to 32 rows —
    oracle-verifies the capped candidate generation end-to-end."""
    emb = load_table(spark, sf_dir, "embeddings")
    out = similarity.lsh_bucketed_topk(emb, "embedding", "vec_id",
                                       TOPK_QUERY_IDS, TOPK_K,
                                       n_planes=ANN_PLANES, dim=EMB_DIM,
                                       n_probes=ANN_PROBES, n_tables=ANN_TABLES,
                                       max_bucket=GUARD_ANN_MAX_BUCKET)
    return out.select("query_id", "neighbor_id",
                      F.round("cosine", ROUND).alias("cosine"),
                      F.col("rank").cast("bigint").alias("rank"))


def q_o23_cosine_lsh_pairs(spark, sf_dir):
    """o06's scale path: SRP-LSH candidate pairs (same plane literals as
    o15's tables) re-scored with the exact cosine — precision 1.0 by
    construction; the oracle mirrors bucket generation bit-for-bit, so
    whatever recall the buckets give is value-checked, not assumed."""
    emb = load_table(spark, sf_dir, "embeddings")
    pairs = similarity.srp_near_dup_pairs(emb, "embedding", "vec_id",
                                          COSINE_TAU, n_planes=ANN_PLANES,
                                          dim=EMB_DIM, n_tables=ANN_TABLES)
    return pairs.select("id_a", "id_b",
                        F.round("cosine", ROUND).alias("cosine"))


def _oracle_cosine_lsh_pairs() -> str:
    """SRP bucket twin of _oracle_cosine_pairs: per-table sign-bit buckets
    (same plane literals as the Spark side), distinct colliding pairs,
    exact-cosine filter at tau."""
    dot = _SQL_DOT.format(dim=EMB_DIM)
    na = _SQL_NORM.format(dim=EMB_DIM, t="a")
    nb = _SQL_NORM.format(dim=EMB_DIM, t="b")
    tables = similarity.table_planes(ANN_PLANES, EMB_DIM, 42, ANN_TABLES)
    bk_selects = []
    for t, planes in enumerate(tables):
        sig = " + ".join(
            f"(CASE WHEN {_sql_plane_dot(p)} > 0 THEN (1::BIGINT << {i}) "
            f"ELSE 0 END)" for i, p in enumerate(planes))
        bk_selects.append(f"SELECT vec_id, {t} AS tbl, {sig} AS bk "
                          f"FROM embeddings")
    return f"""
      WITH bkt AS ({' UNION ALL '.join(bk_selects)}),
      pairs AS (
        SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
        FROM bkt x JOIN bkt y
          ON x.tbl = y.tbl AND x.bk = y.bk AND x.vec_id < y.vec_id)
      SELECT id_a, id_b, round({dot} / ({na} * {nb}), {ROUND}) AS cosine
      FROM pairs JOIN embeddings a ON a.vec_id = id_a
                 JOIN embeddings b ON b.vec_id = id_b
      WHERE {dot} / ({na} * {nb}) >= {COSINE_TAU}"""


def q_o24_asof_join(spark, sf_dir):
    """As-of join over events: each purchase enriched with the latest click
    by the same user at-or-before it (left-outer; ties on click ts broken
    by greatest event_id). The oracle is DuckDB's native ASOF LEFT JOIN
    over the same tie-deduped click set — two independent as-of engines,
    value-compared."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase")
    clicks = ev.where(F.col("event_type") == "click")
    out = joins.asof_join(purchases, clicks, "user_id", "ts", "ts",
                          ["event_id", "value"], tiebreak="event_id",
                          payload_prefix="click_")
    # timestamps as formatted strings: value-identical across engines (the
    # column is TIMESTAMP_NTZ, so no zone math) without pandas datetime-
    # resolution (ns vs us) comparison artifacts
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    return out.select(
        F.col("event_id").cast("bigint").alias("purchase_id"),
        F.col("user_id").cast("bigint").alias("user_id"),
        F.date_format("ts", fmt).alias("purchase_ts_s"),
        F.col("click_event_id").cast("bigint").alias("click_event_id"),
        F.round("click_value", ROUND).alias("click_value"),
        F.date_format("click_asof_ts", fmt).alias("click_ts_s"))


def _oracle_asof_join() -> str:
    return f"""
      WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
      c AS (SELECT user_id, ts, event_id, value, row_number() OVER
                (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
            FROM events WHERE event_type = 'click'),
      cd AS (SELECT user_id, ts, event_id, value FROM c WHERE rn = 1)
      SELECT p.event_id::BIGINT AS purchase_id, p.user_id::BIGINT AS user_id,
             strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts_s,
             cd.event_id::BIGINT AS click_event_id,
             round(cd.value, {ROUND}) AS click_value,
             strftime(cd.ts, '%Y-%m-%d %H:%M:%S.%f') AS click_ts_s
      FROM p ASOF LEFT JOIN cd
        ON p.user_id = cd.user_id AND p.ts >= cd.ts"""


INTERVAL_WIN_MIN = 30        # purchase window half-width (minutes)
INTERVAL_BUCKET_S = 1800     # bucket width ~ interval length


def q_o33_interval_join(spark, sf_dir):
    """Bucketized interval join (operators/joins.py:interval_join): every
    click inside the +/-30 min window around a purchase by the same user —
    an equi-join on (user, time-bucket) + exact BETWEEN filter, never a
    broadcast-nested-loop range join. The oracle is DuckDB's native
    BETWEEN range join over the same windows."""
    ev = load_table(spark, sf_dir, "events")
    half = f"INTERVAL {INTERVAL_WIN_MIN} MINUTES"
    pur = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.expr(f"ts - {half}").alias("w_start"),
        F.expr(f"ts + {half}").alias("w_end"),
        F.col("value").alias("purchase_value"))
    clicks = ev.where(F.col("event_type") == "click") \
               .select("event_id", "user_id", "ts")
    out = joins.interval_join(clicks, pur, "user_id", "ts",
                              "w_start", "w_end",
                              ["purchase_id", "purchase_value"],
                              bucket_s=INTERVAL_BUCKET_S)
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    return out.select(
        F.col("event_id").cast("bigint").alias("click_id"),
        F.col("user_id").cast("bigint").alias("user_id"),
        F.date_format("ts", fmt).alias("click_ts_s"),
        F.col("purchase_id").cast("bigint").alias("purchase_id"),
        F.round("purchase_value", ROUND).alias("purchase_value"),
        F.date_format("start", fmt).alias("w_start_s"),
        F.date_format("end", fmt).alias("w_end_s"))


def _oracle_interval_join() -> str:
    return f"""
      WITH pur AS (
        SELECT user_id, event_id AS purchase_id,
               ts - INTERVAL {INTERVAL_WIN_MIN} MINUTE AS w_start,
               ts + INTERVAL {INTERVAL_WIN_MIN} MINUTE AS w_end,
               value AS purchase_value
        FROM events WHERE event_type = 'purchase'),
      cl AS (SELECT event_id, user_id, ts FROM events
             WHERE event_type = 'click')
      SELECT c.event_id::BIGINT AS click_id, c.user_id::BIGINT AS user_id,
             strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS click_ts_s,
             p.purchase_id::BIGINT AS purchase_id,
             round(p.purchase_value, {ROUND}) AS purchase_value,
             strftime(p.w_start, '%Y-%m-%d %H:%M:%S.%f') AS w_start_s,
             strftime(p.w_end, '%Y-%m-%d %H:%M:%S.%f') AS w_end_s
      FROM cl c JOIN pur p
        ON c.user_id = p.user_id AND c.ts BETWEEN p.w_start AND p.w_end"""


def q_o21_dedup_clusters(spark, sf_dir):
    """Near-dup pipeline tail: LSH candidate pairs (o03 config) clustered
    into connected components — (doc_id, cluster rep = min reachable id).
    The oracle recomputes the same components with a recursive CTE
    (transitive closure + min), so the distributed label-propagation loop
    is value-checked end-to-end."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.lsh_candidate_pairs(docs, "text", "doc_id", N_HASHES,
                                      BANDS, SHINGLE_K, LSH_MIN_EST,
                                      MINHASH_SEED)
    return dedup.connected_components(pairs).select(
        F.col("id").cast("bigint").alias("id"),
        F.col("rep").cast("bigint").alias("rep"))


def q_o40_cluster_sizes(spark, sf_dir):
    """Dedup-cluster size histogram: how many near-dup clusters exist at
    each size (the dedup-rate report a corpus owner reads before applying
    the survivors). Two keyed map-side-combining aggs over the o21
    components — (cluster_size, n_clusters)."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.lsh_candidate_pairs(docs, "text", "doc_id", N_HASHES,
                                      BANDS, SHINGLE_K, LSH_MIN_EST,
                                      MINHASH_SEED)
    comp = dedup.connected_components(pairs)
    per = comp.groupBy("rep").agg(F.count(F.lit(1)).alias("cluster_size"))
    return (per.groupBy("cluster_size")
               .agg(F.count(F.lit(1)).alias("n_clusters"))
               .select(F.col("cluster_size").cast("bigint")
                        .alias("cluster_size"),
                       F.col("n_clusters").cast("bigint")
                        .alias("n_clusters")))


def _oracle_cluster_sizes() -> str:
    return f"""
      WITH RECURSIVE comp AS ({_oracle_dedup_clusters()}),
      per AS (SELECT rep, count(*) AS cluster_size FROM comp GROUP BY rep)
      SELECT cluster_size::BIGINT AS cluster_size,
             count(*)::BIGINT AS n_clusters
      FROM per GROUP BY cluster_size"""


def _oracle_dedup_clusters() -> str:
    return f"""
      WITH RECURSIVE cand AS ({_oracle_lsh_pairs()}),
      edges AS (SELECT id_a AS a, id_b AS b FROM cand
                UNION SELECT id_b, id_a FROM cand),
      walk(id, r) AS (
        SELECT a, a FROM edges
        UNION
        SELECT w.id, e.b FROM walk w JOIN edges e ON w.r = e.a)
      SELECT id, min(r) AS rep FROM walk GROUP BY id"""


def q_o22_dedup_apply(spark, sf_dir):
    """End of the dedup pipeline: the surviving corpus after dropping
    non-canonical near-dup cluster members (LSH pairs -> components ->
    keep rep + never-paired docs). Returns ids + lengths so the oracle
    hash covers which rows survived, not just how many."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.lsh_candidate_pairs(docs, "text", "doc_id", N_HASHES,
                                      BANDS, SHINGLE_K, LSH_MIN_EST,
                                      MINHASH_SEED)
    clusters = dedup.connected_components(pairs)
    kept = dedup.apply_dedup(docs, clusters, "doc_id")
    return kept.select(F.col("doc_id").cast("bigint").alias("doc_id"),
                       F.length("text").cast("bigint").alias("n_chars"))


def _oracle_dedup_apply() -> str:
    return f"""
      WITH RECURSIVE comp AS ({_oracle_dedup_clusters()})
      SELECT doc_id::BIGINT AS doc_id, length(text)::BIGINT AS n_chars
      FROM documents
      WHERE doc_id NOT IN (SELECT id FROM comp WHERE rep != id)"""


def q_o09_token_counts(spark, sf_dir):
    return text.token_counts(load_table(spark, sf_dir, "documents"),
                             "text", "doc_id")


def q_o20_bpe_tokens(spark, sf_dir):
    """TRUE BPE subword counts (functions/bpe.py) via Arrow-batched pandas
    UDF. The DuckDB twin (_oracle_bpe_tokens) re-applies the SAME learned
    merge table — embedded as a 256-row VALUES literal — with a recursive
    CTE over the DISTINCT words, reproducing the greedy lowest-rank-
    leftmost merge loop exactly; tests/test_bpe.py additionally pins the
    encoder against an independent sequential-merge re-derivation."""
    return text.bpe_token_counts(load_table(spark, sf_dir, "documents"),
                                 "text", "doc_id")


def _oracle_bpe_tokens() -> str:
    """Greedy BPE inference as SQL: the iterative rank-order merge loop is a
    recursive CTE over (word, symbol-list) — each step merges the leftmost
    lowest-rank adjacent pair (argmin encoded as min(rank*1024 + pos), valid
    while symbol lists stay under 1024 entries — words here are bounded by
    document vocabulary, far below that) and recursion stops when no pair is
    in the rank table. Runs over DISTINCT words only, then joins back to the
    per-doc word multiset — the same memoize-per-word economics as the Spark
    side's per-executor lru_cache."""
    from ..functions.bpe import default_encoder

    enc = default_encoder()
    ordered = sorted(enc.ranks, key=enc.ranks.get)

    def q(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    vals = ", ".join(f"({q(l)},{q(r)},{i})"
                     for i, (l, r) in enumerate(ordered))
    return f"""
WITH RECURSIVE
ranks(lhs, rhs, rank) AS (VALUES {vals}),
doc_words AS (
  SELECT doc_id, unnest(regexp_extract_all(trim(lower(text)), '\\S+')) AS w
  FROM documents
),
words AS (SELECT DISTINCT w FROM doc_words),
enc(w, syms) AS (
  SELECT w, list_append(string_split(w, ''), '</w>') FROM words
  UNION ALL
  SELECT w, syms[1:best_i-1] || [syms[best_i] || syms[best_i+1]]
            || syms[best_i+2:]
  FROM (
    SELECT w, syms,
           (SELECT (min(r.rank * 1024 + p.i) % 1024)::INT
            FROM (SELECT unnest(range(1, len(syms))) AS i) p
            JOIN ranks r ON r.lhs = syms[p.i] AND r.rhs = syms[p.i+1]
           ) AS best_i
    FROM enc
  ) WHERE best_i IS NOT NULL
),
wcount AS (SELECT w, min(len(syms))::BIGINT AS n_tok FROM enc GROUP BY w),
per_doc AS (
  SELECT doc_id, sum(n_tok)::BIGINT AS bpe_tokens,
         count(*)::BIGINT AS ws_tokens
  FROM doc_words JOIN wcount USING (w) GROUP BY doc_id
)
SELECT d.doc_id::BIGINT AS doc_id,
       coalesce(p.bpe_tokens, 0)::BIGINT AS bpe_tokens,
       coalesce(p.ws_tokens, 0)::BIGINT AS ws_tokens
FROM documents d LEFT JOIN per_doc p USING (doc_id)"""


CHUNK_SIZE = 200
CHUNK_STRIDE = 160


def q_o25_doc_chunks(spark, sf_dir):
    """Overlapping character-window chunking of the documents table (LLM
    context preparation): 200-char chunks every 160 chars."""
    return text.chunk_documents(load_table(spark, sf_dir, "documents"),
                                "text", "doc_id", CHUNK_SIZE, CHUNK_STRIDE)


# o51 sequence packing: 256-token training bins over 16 parallel shards
PACK_TARGET = 256
PACK_SHARDS = 16


def q_o51_pack_sequences(spark, sf_dir):
    """Greedy sequence packing of documents into fixed-token-budget
    training bins (text.pack_sequences): per-shard windows, never a
    global sort."""
    return text.pack_sequences(load_table(spark, sf_dir, "documents"),
                               "text", "doc_id", PACK_TARGET, PACK_SHARDS)


# o52 mixture rebalance: skew three sources of the uniform 20-source corpus
# to a 50/30/20 mixture — cap is set by the 0.5-share source, so the other
# two are downsampled to 3/5 and 2/5 of their rows
MIXTURE_TARGETS = {"src0": 0.5, "src1": 0.3, "src2": 0.2}


def q_o52_rebalance_mixture(spark, sf_dir):
    """Rebalance document sources to a target mixture
    (sampling.rebalance_to_mixture): data-derived per-stratum hash
    thresholds, all arithmetic mirrored by the oracle."""
    from .sampling import rebalance_to_mixture

    docs = load_table(spark, sf_dir, "documents")
    out = rebalance_to_mixture(docs, "doc_id", "source", MIXTURE_TARGETS)
    return out.select(F.col("doc_id").cast("bigint").alias("doc_id"),
                      "source")


# o26: downweight the dominant language, keep the rare ones whole — the
# canonical corpus-rebalancing shape
STRAT_RATES = {"en": 0.25, "zh": 1.0, "fr": 1.0}
STRAT_DEFAULT = 0.5


def q_o26_stratified_sample(spark, sf_dir):
    """Per-stratum deterministic sampling of documents by language
    (operators/sampling.py): en kept at 25%, zh/fr at 100%, others at 50%.
    The oracle applies the bit-identical predicate, so stratum routing AND
    hash membership are both value-checked."""
    from .sampling import stratified_hash_sample

    docs = load_table(spark, sf_dir, "documents")
    out = stratified_hash_sample(docs, "doc_id", "lang", STRAT_RATES,
                                 STRAT_DEFAULT)
    return out.select(F.col("doc_id").cast("bigint").alias("doc_id"),
                      "lang", F.col("n_chars").cast("bigint").alias("n_chars"))


def _oracle_stratified_sample() -> str:
    from .sampling import sql_stratified_sample_where

    pred = sql_stratified_sample_where("doc_id", "lang", STRAT_RATES,
                                       STRAT_DEFAULT)
    return (f"SELECT doc_id::BIGINT AS doc_id, lang, n_chars::BIGINT "
            f"AS n_chars FROM documents WHERE {pred}")


# o27: benchmark = every 20th document starting at 7 (~5% of the corpus) —
# a deterministic stand-in for an eval set; both engines derive it from the
# same predicate so contamination is value-checked end-to-end.
DECON_BENCH_MOD, DECON_BENCH_REM = 20, 7


def q_o27_decontaminate(spark, sf_dir):
    """Benchmark n-gram decontamination (operators/corpus.py): per-document
    overlap fraction of distinct 3-word shingles against a broadcast
    benchmark shingle set."""
    docs = load_table(spark, sf_dir, "documents")
    bench = docs.where(F.col("doc_id") % DECON_BENCH_MOD == DECON_BENCH_REM)
    return corpus.decontaminate(docs, "text", "doc_id", bench)


def q_o28_pii_redact(spark, sf_dir):
    """PII scan + redaction over documents with deterministically injected
    emails/phones/IPv4s (the synthetic corpus has none; the oracle builds
    byte-identical augmented text, so detection AND the redacted string are
    both value-checked)."""
    docs = load_table(spark, sf_dir, "documents")
    aug = corpus.with_synthetic_pii(docs, "text", "doc_id")
    return corpus.pii_scan(aug, "text", "doc_id")


def q_o29_repetition(spark, sf_dir):
    """Gopher-style repetition quality metrics: duplicate-token fraction +
    top-bigram share per document."""
    return corpus.repetition_metrics(load_table(spark, sf_dir, "documents"),
                                     "text", "doc_id")


def q_o30_tfidf_topk(spark, sf_dir):
    """Top-3 TF-IDF keywords per document (rounded-score ranking so the
    k-boundary selection is engine-independent)."""
    return corpus.tfidf_topk(load_table(spark, sf_dir, "documents"),
                             "text", "doc_id")


def q_o32_doc_profile(spark, sf_dir):
    """Fused one-scan document profile (tokens + quality + fingerprint +
    PII counts + language) over PII-augmented documents — the single-pass
    ingest profile a 100 TB corpus gets instead of five separate reads."""
    docs = load_table(spark, sf_dir, "documents")
    aug = corpus.with_synthetic_pii(docs, "text", "doc_id")
    return corpus.document_profile(aug, "text", "doc_id")


def q_o41_corpus_report(spark, sf_dir):
    """Per-language rollup of the fused profile (corpus.corpus_report):
    the end-of-ingest summary — doc counts, token volume, decimal-exact
    mean quality, PII exposure — over PII-augmented documents."""
    docs = load_table(spark, sf_dir, "documents")
    aug = corpus.with_synthetic_pii(docs, "text", "doc_id")
    return corpus.corpus_report(aug, "text", "doc_id")


def _oracle_corpus_report() -> str:
    aug = corpus.sql_with_synthetic_pii("documents", "text", "doc_id")
    rep = corpus.sql_corpus_report("aug", "text", "doc_id")
    # prepend the augmentation CTE to the report's WITH chain (same
    # surgery as _oracle_doc_profile)
    return rep.replace("WITH prof AS",
                       f"WITH aug AS ({aug}),\n      prof AS", 1)


def _oracle_doc_profile() -> str:
    aug = corpus.sql_with_synthetic_pii("documents", "text", "doc_id")
    prof = corpus.sql_document_profile("aug", "text", "doc_id")
    # prepend the augmentation CTE to the profile's WITH chain
    return prof.replace("WITH tok AS", f"WITH aug AS ({aug}),\n      tok AS", 1)


def _oracle_pii_redact() -> str:
    aug = corpus.sql_with_synthetic_pii("documents", "text", "doc_id")
    return ("WITH aug AS (" + aug + ") "
            + corpus.sql_pii_scan("aug", "text", "doc_id"))


QUANTILE_QS = [0.25, 0.5, 0.9, 0.99]
PROFILE_KEYS = ["l_returnflag", "l_linestatus"]


def q_o35_group_quantiles(spark, sf_dir):
    """Exact per-group quantiles of lineitem prices (operators/stats.py):
    Spark percentile vs DuckDB quantile_cont — same interpolation, value-
    checked."""
    li = load_table(spark, sf_dir, "lineitem")
    return stats.group_quantiles(li, PROFILE_KEYS, "l_extendedprice",
                                 QUANTILE_QS)


def q_o36_numeric_profile(spark, sf_dir):
    """Per-group numeric column profile with a deterministic DECIMAL-sum
    mean (FP sums are partition-order-dependent; decimal sums are not)."""
    li = load_table(spark, sf_dir, "lineitem")
    return stats.profile_numeric(li, PROFILE_KEYS, "l_extendedprice")


def q_o39_vocabulary(spark, sf_dir):
    """Corpus vocabulary: top-100 tokens by term frequency with document
    frequencies (operators/corpus.py:vocabulary) — the tokenizer-training
    prepass; token-keyed map-side-combining aggs + TakeOrdered."""
    return corpus.vocabulary(load_table(spark, sf_dir, "documents"),
                             "text", "doc_id")


SKEW_TOP_N = 15


def q_o37_skew_report(spark, sf_dir):
    """Key-skew diagnosis over events' user_id (operators/stats.py): the
    top-15 heaviest keys with row counts and corpus share — the pre-join
    report that sizes salting factors."""
    ev = load_table(spark, sf_dir, "events")
    return stats.skew_report(ev, ["user_id"], SKEW_TOP_N)


def q_o38_snapshot_diff(spark, sf_dir):
    """Snapshot diff / CDC (operators/joins.py:snapshot_diff): OLD is a
    deterministic mutation of documents (doc_id%13==0 dropped -> 'added'
    in new, doc_id%7==0 text-suffixed -> 'changed', plus 25 synthetic
    ids -> 'removed'); NEW is documents as-is. The oracle rebuilds the
    same old snapshot and full-outer-diffs with IS DISTINCT FROM."""
    docs = load_table(spark, sf_dir, "documents")
    mutated = docs.where(F.col("doc_id") % 13 != 0).select(
        "doc_id",
        F.when(F.col("doc_id") % 7 == 0,
               F.concat(F.col("text"), F.lit(" [v1]")))
         .otherwise(F.col("text")).alias("text"),
        "lang")
    extra = docs.where(F.col("doc_id") < 25).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text", "lang")
    old = mutated.unionByName(extra)
    new = docs.select("doc_id", "text", "lang")
    return joins.snapshot_diff(old, new, ["doc_id"], ["text", "lang"])


def _oracle_snapshot_diff() -> str:
    return """
      WITH old AS (
        SELECT doc_id,
               CASE WHEN doc_id % 7 = 0 THEN text || ' [v1]' ELSE text END
                 AS text,
               lang
        FROM documents WHERE doc_id % 13 != 0
        UNION ALL
        SELECT doc_id + 1000000 AS doc_id, text, lang
        FROM documents WHERE doc_id < 25),
      j AS (
        SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
               CASE WHEN o.doc_id IS NULL THEN 'added'
                    WHEN n.doc_id IS NULL THEN 'removed'
                    WHEN (o.text IS DISTINCT FROM n.text)
                      OR (o.lang IS DISTINCT FROM n.lang) THEN 'changed'
               END AS change,
               o.text AS old_text, o.lang AS old_lang,
               n.text AS new_text, n.lang AS new_lang
        FROM old o FULL OUTER JOIN documents n ON o.doc_id = n.doc_id)
      SELECT doc_id::BIGINT AS doc_id, change, old_text, old_lang,
             new_text, new_lang
      FROM j WHERE change IS NOT NULL"""


WEIGHTED_K = 50


def q_o34_weighted_sample(spark, sf_dir):
    """Weighted top-k sample (Efraimidis-Spirakis with deterministic hash
    randomness): 50 documents drawn with probability proportional to
    n_chars — the size-weighted corpus-subsampling staple. TakeOrdered
    plan, never a single-partition sort."""
    from .sampling import weighted_sample_topk

    docs = load_table(spark, sf_dir, "documents")
    out = weighted_sample_topk(docs, "doc_id", "n_chars", WEIGHTED_K)
    return out.select(F.col("doc_id").cast("bigint").alias("doc_id"),
                      "n_chars", "samp_score")


def _oracle_weighted_sample() -> str:
    from .sampling import sql_weighted_sample_topk

    return sql_weighted_sample_topk("documents", "doc_id", "n_chars",
                                    WEIGHTED_K, weight_name="n_chars")


def q_o10_lang_id(spark, sf_dir):
    return text.lang_id(load_table(spark, sf_dir, "documents"), "text", "doc_id")


def q_o11_quality(spark, sf_dir):
    return text.quality_score(load_table(spark, sf_dir, "documents"),
                              "text", "doc_id")


def q_o12_fingerprint(spark, sf_dir):
    return text.fingerprint(load_table(spark, sf_dir, "documents"),
                            "text", "doc_id")


def q_o13_media_features(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    media = multimodal.documents_as_media(docs)
    return multimodal.extract_features(media, multimodal.FakeDecoder())


def q_o14_frame_sample(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    media = multimodal.documents_as_media(docs)
    return multimodal.frame_sample(media, every_n_bytes=64)


def q_o19_ppm_decode(spark, sf_dir):
    """REAL media decode: synthesize valid P6 PPM bytes per document, then
    parse true width/height/channels back out of the binary header with
    HeaderDecoder (pure-Python netpbm parser inside Arrow batches). The
    oracle constructs byte-identical content in SQL and string-parses the
    SAME header — both engines decode, neither trusts the construction."""
    docs = load_table(spark, sf_dir, "documents")
    media = multimodal.documents_as_ppm(docs)
    return multimodal.extract_features(media, multimodal.HeaderDecoder())


def q_o31_ppm_pixels(spark, sf_dir):
    """REAL pixel-level decode: P6 images whose sample bytes tile the
    document's ASCII text, then per-channel mean brightness computed from
    the actual payload bytes (numpy over Arrow batches). The oracle builds
    byte-identical images and re-derives the means by string-slicing the
    SAME payload — both engines decode pixels, neither echoes the
    construction."""
    docs = load_table(spark, sf_dir, "documents")
    media = multimodal.documents_as_ppm_textured(docs)
    return multimodal.extract_pixel_stats(media)


def _oracle_ppm_pixels(max_w: int = 64, max_h: int = 48) -> str:
    mb = max_w * max_h * 3
    return f"""
      WITH src AS (
        SELECT doc_id::BIGINT AS media_id,
               (doc_id % {max_w} + 1)::INT AS w,
               (doc_id % {max_h} + 1)::INT AS h,
               regexp_replace(text, '[^ -~]', '', 'g') || 'x' AS clean
        FROM documents),
      ppm AS (
        SELECT media_id,
               'P6' || chr(10) || w::VARCHAR || ' ' || h::VARCHAR || chr(10)
                 || '255' || chr(10)
                 || substr(repeat(clean, ({mb} // length(clean) + 1)::INT),
                           1, (w * h * 3)::INT) AS content
        FROM src),
      hdr AS (
        SELECT media_id,
               split_part(split_part(content, chr(10), 2), ' ', 1)::INT AS width,
               split_part(split_part(content, chr(10), 2), ' ', 2)::INT AS height,
               (CASE WHEN split_part(content, chr(10), 1) = 'P6'
                     THEN 3 END)::INT AS channels,
               split_part(content, chr(10), 4) AS payload
        FROM ppm),
      codes AS (
        SELECT media_id, width, height, channels,
               list_transform(range(1, length(payload) + 1),
                              i -> ascii(substr(payload, i::INT, 1))) AS cl
        FROM hdr)
      SELECT media_id, width, height, channels,
             round(list_aggregate(cl[1:len(cl):3], 'avg'), 6) AS mean_r,
             round(list_aggregate(cl[2:len(cl):3], 'avg'), 6) AS mean_g,
             round(list_aggregate(cl[3:len(cl):3], 'avg'), 6) AS mean_b
      FROM codes"""


def _oracle_ppm_decode() -> str:
    """Build the P6 content string exactly as documents_as_ppm does, then
    parse the header back with split_part — an honest decode, not an echo
    of the construction parameters."""
    return """
      WITH ppm AS (
        SELECT doc_id::BIGINT AS media_id,
               'P6' || chr(10)
                 || ((doc_id % 64) + 1)::VARCHAR || ' '
                 || ((doc_id % 48) + 1)::VARCHAR || chr(10) || '255' || chr(10)
                 || repeat('x', (((doc_id % 64) + 1)
                                 * ((doc_id % 48) + 1) * 3)::INT) AS content
        FROM documents)
      SELECT media_id,
             octet_length(encode(content))::BIGINT AS n_bytes,
             split_part(split_part(content, chr(10), 2), ' ', 1)::INT AS width,
             split_part(split_part(content, chr(10), 2), ' ', 2)::INT AS height,
             (CASE WHEN split_part(content, chr(10), 1) = 'P6'
                   THEN 3 END)::INT AS channels,
             (CASE WHEN split_part(content, chr(10), 1) = 'P6'
                   THEN 'ppm' END) AS format
      FROM ppm"""


# ---------------------------------------------------------------------------
# oracle SQL
# ---------------------------------------------------------------------------

def _sql_minhash_sig_cte(src: str = "documents", name: str = "sig") -> str:
    """CTE `name`: doc_id + mh_0..mh_{n-1} (sentinel P+i when no shingles).
    `src` is the (doc_id, text) source — a table or an earlier CTE."""
    params = minhash_params(N_HASHES, MINHASH_SEED)
    sh = sql_word_shingles("text", SHINGLE_K)
    mh_cols = []
    for i, (a, b) in enumerate(params):
        ah = sql_affine_hash(sql_hash32("s"), a, b)
        mh_cols.append(
            f"coalesce(list_min(list_transform(shl, s -> {ah})), "
            f"{MERSENNE_P + i}) AS mh_{i}")
    return (f"{name} AS (SELECT doc_id, {', '.join(mh_cols)} FROM "
            f"(SELECT doc_id, {sh} AS shl FROM {src}))")


# (_oracle_minhash removed with o02's retirement — _sql_minhash_sig_cte
# lives on inside every LSH-pair oracle below.)


def _oracle_lsh_pairs(max_bucket: int | None = None,
                      src: str = "documents",
                      min_est: float = LSH_MIN_EST) -> str:
    """LSH candidate pairs; with max_bucket set, mirrors the split-mode
    hot-bucket guard (dedup._bucket_guard): oversize buckets are split into
    ceil(n/max_bucket) sub-buckets by the portable id-hash and pairs only
    form within a sub-bucket. `src` is the (doc_id, text) source — a table
    or an earlier CTE (the curation-funnel twin runs it over the
    exact-dedup survivors)."""
    rows_per_band = N_HASHES // BANDS
    band_selects = []
    for b in range(BANDS):
        cols = ", ".join(f"mh_{b * rows_per_band + r}"
                         for r in range(rows_per_band))
        band_selects.append(
            f"SELECT doc_id, {b} AS band, concat_ws(',', {cols}) AS bsig "
            f"FROM sig WHERE mh_0 != {MERSENNE_P}")
    eq_sum = " + ".join(
        f"(CASE WHEN sa.mh_{i} = sb.mh_{i} THEN 1 ELSE 0 END)"
        for i in range(N_HASHES))
    guard_ctes, pair_src, sub_eq = "", "band", ""
    if max_bucket is not None:
        h = sql_hash32("CAST(b.doc_id AS VARCHAR)")
        guard_ctes = f""",
      bsz AS (SELECT band, bsig, count(*) AS n FROM band GROUP BY 1, 2),
      gband AS (
        SELECT b.doc_id, b.band, b.bsig,
               CASE WHEN z.n <= {max_bucket} THEN 0
                    ELSE {h} % CAST(floor((z.n + {max_bucket - 1})
                                          / {float(max_bucket)}) AS BIGINT)
               END AS sub
        FROM band b JOIN bsz z ON b.band = z.band AND b.bsig = z.bsig)"""
        pair_src, sub_eq = "gband", " AND a.sub = b.sub"
    return f"""
      WITH {_sql_minhash_sig_cte(src=src)},
      band AS ({' UNION ALL '.join(band_selects)}){guard_ctes},
      pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM {pair_src} a JOIN {pair_src} b
         ON a.band = b.band AND a.bsig = b.bsig{sub_eq}
         AND a.doc_id < b.doc_id
        GROUP BY 1, 2)
      SELECT id_a, id_b, round(({eq_sum}) / {float(N_HASHES)}, {ROUND}) AS est_jaccard
      FROM pairs JOIN sig sa ON sa.doc_id = id_a JOIN sig sb ON sb.doc_id = id_b
      WHERE ({eq_sum}) / {float(N_HASHES)} >= {min_est}"""


def _oracle_simhash() -> str:
    h = sql_hash64("tok")
    return f"""
      WITH tk AS (SELECT doc_id, unnest({sql_tokens('text')}) AS tok
                  FROM documents),
      bits AS (SELECT doc_id, b,
                      sum(CASE WHEN ({h} >> b) & 1 = 1 THEN 1 ELSE -1 END) AS s
               FROM tk, (SELECT unnest(range(0, 32)) AS b)
               GROUP BY doc_id, b),
      sig AS (SELECT doc_id,
                     sum(CASE WHEN s > 0 THEN (1::BIGINT << b) ELSE 0 END) AS sh
              FROM bits GROUP BY doc_id)
      SELECT d.doc_id, coalesce(sig.sh, 0)::BIGINT AS simhash
      FROM documents d LEFT JOIN sig ON d.doc_id = sig.doc_id"""


SIMHASH_MAX_HAMMING = 3   # pigeonhole blocks = max_hamming + 1
SPAN_K = 8                # duplicate-span shingle width (tokens)


def q_o65_simhash_pairs(spark, sf_dir):
    """SimHash near-dup pairs (dedup.simhash_pairs): pigeonhole block
    equi-join (4 blocks of the 32-bit signature; any pair within hamming
    3 agrees exactly on >= 1 block) + exact bit_count verify — 100%
    recall vs the all-pairs oracle, never an all-pairs plan."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.simhash_pairs(docs, "text", "doc_id", bits=32,
                               max_hamming=SIMHASH_MAX_HAMMING)


def _oracle_simhash_pairs() -> str:
    """Twin: the o04 signature CTE + the EXACT all-pairs hamming filter
    (the pigeonhole join is lossless, so the sets must match)."""
    h = sql_hash64("tok")
    return f"""
      WITH tk AS (SELECT doc_id, unnest({sql_tokens('text')}) AS tok
                  FROM documents),
      bits AS (SELECT doc_id, b,
                      sum(CASE WHEN ({h} >> b) & 1 = 1 THEN 1 ELSE -1 END) AS s
               FROM tk, (SELECT unnest(range(0, 32)) AS b)
               GROUP BY doc_id, b),
      sig AS (SELECT doc_id,
                     sum(CASE WHEN s > 0 THEN (1::BIGINT << b) ELSE 0 END) AS sh
              FROM bits GROUP BY doc_id),
      s AS (SELECT d.doc_id, coalesce(sig.sh, 0)::BIGINT AS sh
            FROM documents d LEFT JOIN sig ON d.doc_id = sig.doc_id)
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             bit_count(xor(a.sh, b.sh))::BIGINT AS hamming
      FROM s a JOIN s b ON a.doc_id < b.doc_id
      WHERE bit_count(xor(a.sh, b.sh)) <= {SIMHASH_MAX_HAMMING}"""


def q_o66_duplicate_spans(spark, sf_dir):
    """Per-document duplicated-span profile (dedup.duplicate_spans):
    exact-substring duplication at {SPAN_K}-token shingle resolution —
    the join-friendly form of Lee et al.'s suffix-array dedup. Two hash
    shuffles + one equi-join whose build side holds only repeated
    shingle hashes."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.duplicate_spans(docs, "text", "doc_id",
                                 shingle_k=SPAN_K)


def _oracle_duplicate_spans() -> str:
    sh = sql_word_shingles("text", SPAN_K)
    h = sql_hash64("s")
    return f"""
      WITH sh AS (SELECT doc_id, unnest({sh}) AS s FROM documents),
      occ AS (SELECT doc_id, {h} AS h FROM sh),
      hot AS (SELECT h FROM occ GROUP BY h HAVING count(*) >= 2),
      per AS (SELECT o.doc_id, count(*) AS n_spans,
                     sum(CASE WHEN hot.h IS NOT NULL THEN 1 ELSE 0 END)
                       AS n_dup
              FROM occ o LEFT JOIN hot ON o.h = hot.h
              GROUP BY o.doc_id)
      SELECT d.doc_id,
             coalesce(per.n_spans, 0)::BIGINT AS n_spans,
             coalesce(per.n_dup, 0)::BIGINT AS n_dup_spans,
             round(CASE WHEN coalesce(per.n_spans, 0) = 0 THEN 0.0
                   ELSE coalesce(per.n_dup, 0) / per.n_spans::DOUBLE
                   END, 6) AS dup_ratio
      FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id"""


def q_o70_remove_dup_spans(spark, sf_dir):
    """Duplicate-span REMOVAL (dedup.remove_duplicate_spans): the corpus
    rewritten with every corpus-wide duplicated {SPAN_K}-token span
    excised — the Lee ACL'22 §4 rewrite that o66 only locates. The gate
    hashes the full rewritten text, so reassembly order and span-merge
    semantics are value-checked document by document."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.remove_duplicate_spans(docs, "text", "doc_id",
                                        shingle_k=SPAN_K)


def _oracle_remove_dup_spans() -> str:
    """Twin: same boundary-event coverage (+1 at start, -1 at start+k,
    running sum with events ordered before the token at equal positions),
    same portable shingle hash, survivors string_agg'd in position
    order."""
    k = SPAN_K
    toks = sql_tokens("text")
    shingle = f"array_to_string(toks[p:p + {k - 1}], ' ')"
    h = sql_hash64(shingle)
    return f"""
      WITH base AS MATERIALIZED (
        SELECT doc_id, {toks} AS toks FROM documents),
      tok AS (SELECT doc_id, toks,
                     unnest(range(1, len(toks) + 1)) AS p
              FROM base),
      occ AS MATERIALIZED (
        SELECT doc_id, p, {h} AS h
        FROM (SELECT doc_id, toks, unnest(range(1, len(toks) - {k - 2}))
                AS p FROM base WHERE len(toks) >= {k})),
      hot AS (SELECT h FROM occ GROUP BY h HAVING count(*) >= 2),
      starts AS MATERIALIZED (
        SELECT o.doc_id, o.p FROM occ o JOIN hot USING (h)),
      ev AS (SELECT doc_id, p, 1 AS d, 0 AS r, NULL AS tok FROM starts
             UNION ALL
             SELECT doc_id, p + {k}, -1, 0, NULL FROM starts
             UNION ALL
             SELECT doc_id, p, 0, 1, toks[p] FROM tok),
      cum AS (SELECT doc_id, p, d, r, tok,
                     sum(d) OVER (PARTITION BY doc_id ORDER BY p, r
                                  ROWS UNBOUNDED PRECEDING) AS cov
              FROM ev),
      per AS (SELECT doc_id,
                     count(*) FILTER (r = 1) AS n_tokens,
                     count(*) FILTER (r = 1 AND cov != 0) AS n_removed,
                     string_agg(tok, ' ' ORDER BY p)
                       FILTER (r = 1 AND cov = 0) AS text
              FROM cum GROUP BY doc_id)
      SELECT d.doc_id, coalesce(per.text, '') AS text,
             coalesce(per.n_tokens, 0)::BIGINT AS n_tokens,
             coalesce(per.n_removed, 0)::BIGINT AS n_removed_tokens
      FROM documents d LEFT JOIN per USING (doc_id)"""


TEMP_MIX_ALPHA = 0.5


def q_o71_temperature_mix(spark, sf_dir):
    """Temperature-based mixture resampling
    (sampling.temperature_mixture): downsample languages so surviving
    shares follow p_i ∝ n_i^alpha — the multilingual-corpus
    exponentiated-smoothing reweighting, with the targets derived from
    the data and the whole plan declarative (counts agg -> rounded
    pow weights -> cap -> broadcast hash thresholds)."""
    docs = load_table(spark, sf_dir, "documents")
    out = sampling.temperature_mixture(docs, "doc_id", "lang",
                                       TEMP_MIX_ALPHA)
    return out.select(F.col("doc_id").cast("bigint").alias("doc_id"),
                      "lang")


def _oracle_temperature_mix() -> str:
    from .sampling import sql_temperature_mixture

    return sql_temperature_mixture("documents", "doc_id", "lang",
                                   TEMP_MIX_ALPHA,
                                   "d.doc_id::BIGINT AS doc_id, d.lang")


XENT_BUCKETS = 3


def q_o67_xent_buckets(spark, sf_dir):
    """CCNet-style per-language perplexity bucketing
    (corpus.xent_quality_buckets): head/middle/tail tiers from the
    (lang, xent) histogram CDF — no per-language document sort, integer
    ceil arithmetic shared bit-exactly with the twin."""
    from . import corpus as C

    docs = load_table(spark, sf_dir, "documents")
    return C.xent_quality_buckets(docs, "text", "doc_id", "lang",
                                  XENT_BUCKETS)


def _oracle_xent_buckets() -> str:
    from .corpus import sql_xent_quality_buckets

    return sql_xent_quality_buckets("documents", "text", "doc_id",
                                    "lang", XENT_BUCKETS)


# o68 curation funnel config — every stage of pipeline.curate_corpus
# engaged with deterministic parameters so the DuckDB twin composes the
# stage twins 1:1. xent_max sits at the sf0.01 corpus's ~p90 (values
# cluster at 4.89-5.10), so the cross-entropy gate drops real rows.
FUNNEL_QUALITY_MIN = 0.25
FUNNEL_XENT_MAX = 4.94
FUNNEL_LSH_MIN_EST = 0.7


def q_o68_curation_funnel(spark, sf_dir):
    """The corpus-curation pipeline END-TO-END under the hard gate
    (pipeline.curate_corpus with every optional stage on): exact dedup →
    MinHash-LSH near-dedup (connected components) → quality + Gopher
    repetition + unigram-xent gates → benchmark decontamination →
    mixture rebalance. Returns the funnel report (stage, n_docs) — the
    deliverable a corpus owner actually reads. The oracle recomputes
    every stage in DuckDB from the same parquet (recursive-CTE
    transitive closure for the components), so the COMPOSITION — stage
    order, survivor flow between stages, each gate's semantics — is
    value-checked end-to-end, not just per stage."""
    from ..pipeline import curate_corpus

    docs = load_table(spark, sf_dir, "documents")
    bench = docs.where(
        F.col("doc_id") % DECON_BENCH_MOD == DECON_BENCH_REM)
    held: list = []
    _, funnel = curate_corpus(
        docs, "text", "doc_id",
        source_col="source", mixture=MIXTURE_TARGETS,
        benchmark=bench,
        quality_min=FUNNEL_QUALITY_MIN,
        xent_max=FUNNEL_XENT_MAX,
        lsh_min_est=FUNNEL_LSH_MIN_EST,
        persist_stages=True, persisted_out=held)
    # evaluate the funnel ONCE against the persisted stages, then release
    # them — the lazy default would re-derive each stage's prefix (incl.
    # the CC loop) once per funnel row AND once per downstream stage
    rows = [(r["stage"], int(r["n_docs"])) for r in funnel.collect()]
    for f in held:
        f.unpersist()
    return spark.createDataFrame(rows, "stage string, n_docs bigint")


def _oracle_curation_funnel() -> str:
    """Stage-twin composition for q_o68_curation_funnel. Each CTE is the
    published DuckDB twin of its stage (nested WITHs are legal CTE
    bodies), re-pointed at the previous stage's survivor CTE — exactly
    how curate_corpus chains the Spark faces."""
    from .corpus import (DECON_SHINGLE_K, DECON_TAU, sql_repetition_metrics,
                         sql_unigram_xent)
    from .sampling import sql_rebalance_to_mixture
    from .text import sql_quality_score

    lshp = _oracle_lsh_pairs(src="s1", min_est=FUNNEL_LSH_MIN_EST)
    q_sql = sql_quality_score("s2", "text", "doc_id")
    r_sql = sql_repetition_metrics("s2", "text", "doc_id")
    x_sql = sql_unigram_xent("s3a", "text", "doc_id")
    reb_sql = sql_rebalance_to_mixture("s4", "doc_id", "source",
                                       MIXTURE_TARGETS, "d.doc_id")
    dsh = sql_word_shingles("text", DECON_SHINGLE_K)
    dh = sql_hash32("s")
    dfrac = ("CASE WHEN a.n_shingles > 0 THEN a.n_hits "
             "/ CAST(a.n_shingles AS DOUBLE) ELSE 0.0 END")
    return f"""
      WITH RECURSIVE
      s1 AS MATERIALIZED (
        SELECT d.* FROM documents d
        JOIN (SELECT min(doc_id) AS doc_id FROM documents
              GROUP BY {sql_hash64('text')}) k USING (doc_id)),
      cand AS MATERIALIZED ({lshp}),
      edges AS (SELECT id_a AS a, id_b AS b FROM cand
                UNION SELECT id_b, id_a FROM cand),
      walk(id, r) AS (
        SELECT a, a FROM edges
        UNION
        SELECT w.id, e.b FROM walk w JOIN edges e ON w.r = e.a),
      comp AS MATERIALIZED (SELECT id, min(r) AS rep FROM walk GROUP BY id),
      s2 AS MATERIALIZED (SELECT * FROM s1 WHERE doc_id NOT IN
               (SELECT id FROM comp WHERE rep != id)),
      q AS MATERIALIZED ({q_sql}),
      r AS MATERIALIZED ({r_sql}),
      s3a AS MATERIALIZED (SELECT s2.* FROM s2 JOIN q USING (doc_id)
              JOIN r USING (doc_id)
              WHERE q.quality >= {FUNNEL_QUALITY_MIN}
                AND r.repetitive = 0),
      x AS MATERIALIZED ({x_sql}),
      s3 AS MATERIALIZED (SELECT s3a.* FROM s3a JOIN x USING (doc_id)
             WHERE x.xent IS NULL OR x.xent <= {FUNNEL_XENT_MAX}),
      dex AS (SELECT doc_id,
                     unnest(list_transform(list_distinct({dsh}),
                                           s -> {dh})) AS h
              FROM s3),
      dbench AS (SELECT DISTINCT
                     unnest(list_transform(list_distinct({dsh}),
                                           s -> {dh})) AS h
                 FROM documents
                 WHERE doc_id % {DECON_BENCH_MOD} = {DECON_BENCH_REM}),
      dagg AS MATERIALIZED (SELECT e.doc_id, count(*) AS n_shingles,
                      count(b.h) AS n_hits
               FROM dex e LEFT JOIN dbench b ON e.h = b.h
               GROUP BY e.doc_id),
      s4 AS MATERIALIZED (SELECT s3.* FROM s3 LEFT JOIN dagg a USING (doc_id)
             WHERE coalesce({dfrac}, 0.0) < {DECON_TAU}),
      s5 AS MATERIALIZED ({reb_sql})
      SELECT 'input' AS stage,
             (SELECT count(*) FROM documents)::BIGINT AS n_docs
      UNION ALL SELECT 'exact_dedup', (SELECT count(*) FROM s1)::BIGINT
      UNION ALL SELECT 'near_dedup', (SELECT count(*) FROM s2)::BIGINT
      UNION ALL SELECT 'quality', (SELECT count(*) FROM s3)::BIGINT
      UNION ALL SELECT 'decontaminated', (SELECT count(*) FROM s4)::BIGINT
      UNION ALL SELECT 'rebalanced', (SELECT count(*) FROM s5)::BIGINT"""


def _oracle_ngram_jaccard() -> str:
    sh = sql_word_shingles("text", SHINGLE_K)
    return f"""
      WITH sh AS (SELECT doc_id, unnest(list_distinct({sh})) AS s FROM documents),
      sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
      inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
        FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2)
      SELECT id_a, id_b,
             round(i / (sa.sz + sb.sz - i), {ROUND}) AS jaccard
      FROM inter JOIN sizes sa ON sa.doc_id = id_a
                 JOIN sizes sb ON sb.doc_id = id_b
      WHERE i / (sa.sz + sb.sz - i) >= {JACCARD_TAU}"""


_SQL_DOT = ("list_sum(list_transform(range(1, {dim} + 1), "
            "i -> (CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))))")
_SQL_NORM = ("sqrt(list_sum(list_transform(range(1, {dim} + 1), "
             "i -> (CAST({t}.embedding[i] AS DOUBLE) * CAST({t}.embedding[i] AS DOUBLE)))))")


def _oracle_cosine_pairs() -> str:
    dot = _SQL_DOT.format(dim=EMB_DIM)
    na = _SQL_NORM.format(dim=EMB_DIM, t="a")
    nb = _SQL_NORM.format(dim=EMB_DIM, t="b")
    return f"""
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             round({dot} / ({na} * {nb}), {ROUND}) AS cosine
      FROM embeddings a, embeddings b
      WHERE a.vec_id < b.vec_id AND {dot} / ({na} * {nb}) >= {COSINE_TAU}"""


def _oracle_cosine_topk() -> str:
    dot = _SQL_DOT.format(dim=EMB_DIM)
    na = _SQL_NORM.format(dim=EMB_DIM, t="a")
    nb = _SQL_NORM.format(dim=EMB_DIM, t="b")
    qids = ", ".join(map(str, TOPK_QUERY_IDS))
    return f"""
      WITH scored AS (
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
               {dot} / ({na} * {nb}) AS cos
        FROM embeddings a, embeddings b
        WHERE a.vec_id IN ({qids}) AND b.vec_id != a.vec_id)
      SELECT query_id, neighbor_id, round(cos, {ROUND}) AS cosine, rank
      FROM (SELECT *, row_number() OVER
                  (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
            FROM scored)
      WHERE rank <= {TOPK_K}"""


def _oracle_lsh_topk() -> str:
    dot = _SQL_DOT.format(dim=EMB_DIM)
    na = _SQL_NORM.format(dim=EMB_DIM, t="a")
    nb = _SQL_NORM.format(dim=EMB_DIM, t="b")
    qids = ", ".join(map(str, TOPK_QUERY_IDS))
    planes = similarity.random_hyperplanes(N_PLANES, EMB_DIM)
    sig_terms = []
    for i, plane in enumerate(planes):
        lits = ", ".join(f"{x:.1f}" for x in plane)
        dotp = (f"list_sum(list_transform(range(1, {EMB_DIM} + 1), "
                f"i -> (CAST(embedding[i] AS DOUBLE) * ([{lits}])[i])))")
        sig_terms.append(f"(CASE WHEN {dotp} > 0 THEN (1::BIGINT << {i}) ELSE 0 END)")
    return f"""
      WITH bk AS (SELECT vec_id, ({' + '.join(sig_terms)}) AS bucket FROM embeddings),
      scored AS (
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
               {dot} / ({na} * {nb}) AS cos
        FROM embeddings a JOIN bk ba ON ba.vec_id = a.vec_id,
             embeddings b JOIN bk bb ON bb.vec_id = b.vec_id
        WHERE a.vec_id IN ({qids}) AND b.vec_id != a.vec_id
          AND ba.bucket = bb.bucket)
      SELECT query_id, neighbor_id, round(cos, {ROUND}) AS cosine, rank
      FROM (SELECT *, row_number() OVER
                  (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
            FROM scored)
      WHERE rank <= {TOPK_K}"""


def _sql_plane_dot(plane: list[float]) -> str:
    lits = ", ".join(f"{x:.1f}" for x in plane)
    return (f"list_sum(list_transform(range(1, {EMB_DIM} + 1), "
            f"i -> (CAST(embedding[i] AS DOUBLE) * ([{lits}])[i])))")


def _oracle_ann_topk(max_bucket: int | None = None) -> str:
    """Multi-table multi-probe SRP-LSH top-k. Per table t: bucket =
    sign-bit vector over its planes; probe p (p >= 2) flips the bit with
    the p-th lowest |margin| (ties by plane index — matching Spark's
    array_sort over (m, i) structs), one probe row per p so any ANN_PROBES
    stays in lockstep with lsh_bucketed_topk's loop. Candidates = distinct
    (query, neighbor) pairs colliding in any probed (table, bucket); exact
    cosine re-rank. With max_bucket set, data-side buckets are truncated to
    the max_bucket rows with the lowest (id-hash, id) — mirroring
    similarity.cap_buckets."""
    dot = _SQL_DOT.format(dim=EMB_DIM)
    na = _SQL_NORM.format(dim=EMB_DIM, t="a")
    nb = _SQL_NORM.format(dim=EMB_DIM, t="b")
    qids = ", ".join(map(str, TOPK_QUERY_IDS))
    tables = similarity.table_planes(ANN_PLANES, EMB_DIM, 42, ANN_TABLES)
    bk_selects, qd_ctes, probe_selects = [], [], []
    for t, planes in enumerate(tables):
        dots = [_sql_plane_dot(p) for p in planes]
        sig = " + ".join(
            f"(CASE WHEN d{i} > 0 THEN (1::BIGINT << {i}) ELSE 0 END)"
            for i in range(ANN_PLANES))
        dcols = ", ".join(f"{d} AS d{i}" for i, d in enumerate(dots))
        bk_selects.append(
            f"SELECT vec_id, {t} AS tbl, {sig} AS bk FROM "
            f"(SELECT vec_id, {dcols} FROM embeddings)")
        qd_ctes.append(
            f"qd{t} AS (SELECT vec_id AS query_id, {dcols} "
            f"FROM embeddings WHERE vec_id IN ({qids})), "
            f"qb{t} AS (SELECT query_id, {sig} AS bk, "
            + ", ".join(f"abs(d{i}) AS a{i}" for i in range(ANN_PLANES))
            + f" FROM qd{t})")
        probe_selects.append(f"SELECT query_id, {t} AS tbl, bk FROM qb{t}")
        if ANN_PROBES > 1:
            # rank planes by |margin| asc, index asc; flip ranks 1..P-1
            unions = " UNION ALL ".join(
                f"SELECT query_id, bk, {i} AS i, a{i} AS ad FROM qb{t}"
                for i in range(ANN_PLANES))
            qd_ctes.append(
                f"qm{t} AS (SELECT query_id, bk, i, row_number() OVER "
                f"(PARTITION BY query_id ORDER BY ad ASC, i ASC) AS mr "
                f"FROM ({unions}))")
            probe_selects.append(
                f"SELECT query_id, {t} AS tbl, xor(bk, 1::BIGINT << i) "
                f"AS bk FROM qm{t} WHERE mr <= {ANN_PROBES - 1}")
    data_src = "bkt"
    guard_ctes = ""
    if max_bucket is not None:
        h = sql_hash32("CAST(vec_id AS VARCHAR)")
        guard_ctes = f""",
      bkr AS (SELECT vec_id, tbl, bk, row_number() OVER
                  (PARTITION BY tbl, bk ORDER BY {h} ASC, vec_id ASC) AS rn
              FROM bkt),
      bktg AS (SELECT vec_id, tbl, bk FROM bkr WHERE rn <= {max_bucket})"""
        data_src = "bktg"
    return f"""
      WITH bkt AS ({' UNION ALL '.join(bk_selects)}){guard_ctes},
      {', '.join(qd_ctes)},
      probes AS ({' UNION ALL '.join(probe_selects)}),
      cand AS (
        SELECT DISTINCT p.query_id, d.vec_id AS neighbor_id
        FROM {data_src} d JOIN probes p ON d.tbl = p.tbl AND d.bk = p.bk
         AND d.vec_id != p.query_id),
      scored AS (
        SELECT c.query_id, c.neighbor_id, {dot} / ({na} * {nb}) AS cos
        FROM cand c JOIN embeddings a ON a.vec_id = c.query_id
                    JOIN embeddings b ON b.vec_id = c.neighbor_id)
      SELECT query_id, neighbor_id, round(cos, {ROUND}) AS cosine, rank
      FROM (SELECT *, row_number() OVER
                  (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
            FROM scored)
      WHERE rank <= {TOPK_K}"""


def _oracle_ivf_topk() -> str:
    """IVF top-k twin: same seed codebook (cell id = seed vec_id), same
    squared-L2 argmin with (distance, cell-id) tie-break, same n_probes
    nearest cells per query, same exact-cosine re-rank. Distance summation
    is sequential in both engines (F.aggregate / list_sum)."""
    dot = _SQL_DOT.format(dim=EMB_DIM)
    na = _SQL_NORM.format(dim=EMB_DIM, t="a")
    nb = _SQL_NORM.format(dim=EMB_DIM, t="b")
    qids = ", ".join(map(str, TOPK_QUERY_IDS))
    cids = ", ".join(map(str, IVF_CENTROID_IDS))
    diff = "(CAST(e.embedding[i] AS DOUBLE) - CAST(c.cv[i] AS DOUBLE))"
    sqd = (f"list_sum(list_transform(range(1, {EMB_DIM} + 1), "
           f"i -> {diff} * {diff}))")
    return f"""
      WITH cent AS (SELECT vec_id AS cid, embedding AS cv
                    FROM embeddings WHERE vec_id IN ({cids})),
      d AS (SELECT e.vec_id, c.cid, {sqd} AS sd FROM embeddings e, cent c),
      ranked AS (SELECT vec_id, cid, row_number() OVER
                     (PARTITION BY vec_id ORDER BY sd ASC, cid ASC) AS rn
                 FROM d),
      assign AS (SELECT vec_id, cid AS cell FROM ranked WHERE rn = 1),
      qprobe AS (SELECT vec_id AS query_id, cid AS cell FROM ranked
                 WHERE vec_id IN ({qids}) AND rn <= {IVF_PROBES}),
      cand AS (SELECT q.query_id, a.vec_id AS neighbor_id
               FROM qprobe q JOIN assign a ON a.cell = q.cell
                AND a.vec_id != q.query_id),
      scored AS (
        SELECT c.query_id, c.neighbor_id, {dot} / ({na} * {nb}) AS cos
        FROM cand c JOIN embeddings a ON a.vec_id = c.query_id
                    JOIN embeddings b ON b.vec_id = c.neighbor_id)
      SELECT query_id, neighbor_id, round(cos, {ROUND}) AS cosine, rank
      FROM (SELECT *, row_number() OVER
                  (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
            FROM scored)
      WHERE rank <= {TOPK_K}"""


def _oracle_pq_topk() -> str:
    """IVF-PQ twin: coarse probe = o16's CTEs verbatim; then PQ encode
    (per-(vector, subspace) argmin over the 16 seed-slice codes, tie-break
    (distance, code)), per-query ADC lookup table, and the asymmetric
    distance as `list_sum(list(ld ORDER BY s))` — the s-ascending
    left-to-right sum matching the Spark face's F.aggregate over
    zip_with(codes, luts). Code id = POSITION in the seed id list (the
    VALUES map), exactly pq_seed_codebooks' contract."""
    sub = EMB_DIM // PQ_M
    qids = ", ".join(map(str, TOPK_QUERY_IDS))
    cid_vals = ", ".join(f"({j}, {c})"
                         for j, c in enumerate(IVF_CENTROID_IDS))
    dfull = ("(CAST(e.embedding[i] AS DOUBLE) - CAST(c.sv[i] AS DOUBLE))")
    sqd_full = (f"list_sum(list_transform(range(1, {EMB_DIM} + 1), "
                f"i -> {dfull} * {dfull}))")
    dsub = (f"(CAST(e.embedding[s.s * {sub} + i] AS DOUBLE) "
            f"- CAST(cs.cv[i] AS DOUBLE))")
    sqd_sub = (f"list_sum(list_transform(range(1, {sub} + 1), "
               f"i -> {dsub} * {dsub}))")
    dq = (f"(CAST(q.embedding[s.s * {sub} + i] AS DOUBLE) "
          f"- CAST(cs.cv[i] AS DOUBLE))")
    sqd_q = (f"list_sum(list_transform(range(1, {sub} + 1), "
             f"i -> {dq} * {dq}))")
    return f"""
      WITH ords(j, cid) AS (VALUES {cid_vals}),
      seeds AS (SELECT o.j, o.cid, e.embedding AS sv
                FROM embeddings e JOIN ords o ON e.vec_id = o.cid),
      subs AS (SELECT CAST(s AS INT) AS s FROM range({PQ_M}) t(s)),
      centsub AS (SELECT s.s, d.j,
                         list_slice(d.sv, s.s * {sub} + 1,
                                    (s.s + 1) * {sub}) AS cv
                  FROM seeds d, subs s),
      dfull AS (SELECT e.vec_id, c.cid, {sqd_full} AS sd
                FROM embeddings e, seeds c),
      ranked AS (SELECT vec_id, cid, row_number() OVER
                     (PARTITION BY vec_id ORDER BY sd ASC, cid ASC) AS rn
                 FROM dfull),
      assign AS (SELECT vec_id, cid AS cell FROM ranked WHERE rn = 1),
      qprobe AS (SELECT vec_id AS query_id, cid AS cell FROM ranked
                 WHERE vec_id IN ({qids}) AND rn <= {IVF_PROBES}),
      dsubt AS (SELECT e.vec_id, cs.s, cs.j, {sqd_sub} AS sd
                FROM embeddings e, centsub cs, subs s WHERE s.s = cs.s),
      enc AS (SELECT vec_id, s, j AS code FROM
                (SELECT vec_id, s, j, row_number() OVER
                   (PARTITION BY vec_id, s ORDER BY sd ASC, j ASC) AS rn
                 FROM dsubt)
              WHERE rn = 1),
      lut AS (SELECT q.vec_id AS query_id, cs.s, cs.j, {sqd_q} AS ld
              FROM embeddings q, centsub cs, subs s
              WHERE s.s = cs.s AND q.vec_id IN ({qids})),
      cand AS (SELECT p.query_id, a.vec_id AS neighbor_id
               FROM qprobe p JOIN assign a ON a.cell = p.cell
                AND a.vec_id != p.query_id),
      adc AS (SELECT c.query_id, c.neighbor_id,
                     list_sum(list(l.ld ORDER BY en.s)) AS adc
              FROM cand c
              JOIN enc en ON en.vec_id = c.neighbor_id
              JOIN lut l ON l.query_id = c.query_id AND l.s = en.s
                        AND l.j = en.code
              GROUP BY c.query_id, c.neighbor_id)
      SELECT query_id, neighbor_id, round(adc, {ROUND}) AS adc, rank
      FROM (SELECT *, row_number() OVER
                (PARTITION BY query_id ORDER BY adc ASC, neighbor_id ASC)
                AS rank
            FROM adc)
      WHERE rank <= {TOPK_K}"""


# o42/o43 cardinality sketches: estimate distinct l_orderkey per
# l_returnflag. k/p sized so the ESTIMATE branch executes on the gate data
# (each flag holds ~11k distinct orders at sf0.01 — far above k=256
# retained hashes / within HLL p=8's estimation regime), proving the
# non-trivial path cross-engine, not the small-group exact fallback.
SKETCH_GROUP = ["l_returnflag"]
SKETCH_VALUE = "l_orderkey"
KMV_K = 256
HLL_P = 8

# o46 line dedup: the synthetic documents are single-line, so the query
# deterministically wraps them at 4 tokens per line before deduplicating —
# the shared vocabulary then makes 341 lines corpus-frequent at sf0.01,
# engaging the removal path (not a no-op pass-through)
LINE_WRAP_RE = r"((?:\S+\s+){3}\S+)\s+"


def q_o46_line_dedup(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    wrapped = docs.select(
        "doc_id",
        F.regexp_replace(F.col("text"), LINE_WRAP_RE, "$1\n").alias("text"))
    return corpus.line_dedup(wrapped, "text", "doc_id")


def _oracle_line_dedup() -> str:
    wrapped = (f"(SELECT doc_id, regexp_replace(text, '{LINE_WRAP_RE}', "
               r"'\1' || chr(10), 'g') AS text FROM documents)")
    return corpus.sql_line_dedup(wrapped, "text", "doc_id")


# o47 Bloom semi-join: lineitem pre-filtered by a Bloom bitmap of the
# urgent orders' keys. m/k sized so false positives EXIST on the gate data
# (~7.6% of non-matching keys pass at sf0.01) — the oracle must reproduce
# the exact FP set, not just the true matches, proving bitmap parity.
BLOOM_M_BITS = 16384
BLOOM_K = 5
BLOOM_PRED_SQL = "o_orderpriority = '1-URGENT'"  # valid in both dialects

# o48: the sampled twin of o35 — exact quantiles over the deterministic
# 25% hash sample keyed on l_orderkey
APPROXQ_RATE = 0.25
APPROXQ_KEY = "l_orderkey"


# o49 fuzzy decontamination: same benchmark subset as o27 (doc_id % 20 ==
# 7), matched by MinHash-LSH near-duplicate collision instead of exact
# shingle overlap. Benchmark docs ARE corpus members here, so every bench
# doc's corpus copy must flag at est 1.0 — plus the genuine near-dup pairs
# that straddle the boundary.
def q_o49_fuzzy_decon(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    bench = docs.where(
        F.col("doc_id") % DECON_BENCH_MOD == DECON_BENCH_REM)
    return corpus.fuzzy_decontaminate(docs, "text", "doc_id", bench,
                                      min_est=LSH_MIN_EST)


# o50 incremental corpus-index dedup: even doc_ids form the "already
# ingested" corpus whose MinHash band index is pre-built; odd doc_ids are
# the new ingest batch, deduped against that index and within themselves
# by the bucket-min-id rule — the continuous-ingestion pattern where the
# corpus is never re-shingled, only its index probed.
def q_o50_incremental_dedup(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    corpus_half = docs.where(F.col("doc_id") % 2 == 0)
    new_batch = docs.where(F.col("doc_id") % 2 == 1)
    idx = dedup.minhash_band_index(corpus_half, "text", "doc_id", N_HASHES,
                                   BANDS, SHINGLE_K, MINHASH_SEED)
    return dedup.incremental_dedup(new_batch, idx, "text", "doc_id",
                                   N_HASHES, BANDS, SHINGLE_K, MINHASH_SEED)


def q_o58_bigram_pmi(spark, sf_dir):
    """Top-k bigram collocations by PMI (corpus.bigram_pmi) — the phrase-
    discovery pass."""
    return corpus.bigram_pmi(load_table(spark, sf_dir, "documents"),
                             "text", "doc_id")


def q_o59_band_index_merge(spark, sf_dir):
    """Write-back half of continuous-ingestion dedup
    (dedup.band_index_merge): the o50 configuration's corpus index plus
    the surviving batch docs' buckets."""
    docs = load_table(spark, sf_dir, "documents")
    corpus_half = docs.where(F.col("doc_id") % 2 == 0)
    new_batch = docs.where(F.col("doc_id") % 2 == 1)
    idx = dedup.minhash_band_index(corpus_half, "text", "doc_id", N_HASHES,
                                   BANDS, SHINGLE_K, MINHASH_SEED)
    out = dedup.band_index_merge(idx, new_batch, "text", "doc_id",
                                 N_HASHES, BANDS, SHINGLE_K, MINHASH_SEED)
    return out.select(F.col("band").cast("int").alias("band"), "sig",
                      F.col("doc_id").cast("bigint").alias("doc_id"))


def _oracle_band_index_merge() -> str:
    """Twin of band_index_merge at the o50 configuration: the corpus
    half's band rows plus the band rows of batch survivors (the o50
    survivors predicate inlined)."""
    return f"""
      WITH corpus_h AS (SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0),
      newb AS (SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1),
      {_sql_minhash_sig_cte(src="corpus_h", name="sig_c")},
      {_sql_minhash_sig_cte(src="newb", name="sig_n")},
      {_sql_band_cte("sig_c", "band_c")},
      {_sql_band_cte("sig_n", "band_n")},
      ibk AS (SELECT DISTINCT band, bsig FROM band_c),
      ih AS (SELECT n.doc_id, count(*) AS n_index_hits
             FROM band_n n JOIN ibk USING (band, bsig) GROUP BY 1),
      bmin AS (SELECT band, bsig, min(doc_id) AS m FROM band_n GROUP BY 1, 2),
      bh AS (SELECT n.doc_id, count(*) AS n_batch_hits
             FROM band_n n JOIN bmin USING (band, bsig)
             WHERE n.doc_id > bmin.m GROUP BY 1),
      surv AS (SELECT d.doc_id FROM newb d
               LEFT JOIN ih ON d.doc_id = ih.doc_id
               LEFT JOIN bh ON d.doc_id = bh.doc_id
               WHERE coalesce(ih.n_index_hits, 0) = 0
                 AND coalesce(bh.n_batch_hits, 0) = 0)
      SELECT band::INT AS band, bsig AS sig, doc_id::BIGINT AS doc_id
      FROM band_c
      UNION ALL
      SELECT band::INT AS band, bsig AS sig, doc_id::BIGINT AS doc_id
      FROM band_n WHERE doc_id IN (SELECT doc_id FROM surv)"""


def _sql_band_cte(signame: str, name: str) -> str:
    """CTE `name`: (doc_id, band, bsig) — the LSH banding of `signame`'s
    mh_* rows, shingle-less (sentinel) docs excluded. Mirrors
    dedup._band_structs."""
    rows_per_band = N_HASHES // BANDS
    selects = []
    for b in range(BANDS):
        cols = ", ".join(f"mh_{b * rows_per_band + r}"
                         for r in range(rows_per_band))
        selects.append(
            f"SELECT doc_id, {b} AS band, concat_ws(',', {cols}) AS bsig "
            f"FROM {signame} WHERE mh_0 != {MERSENNE_P}")
    return f"{name} AS ({' UNION ALL '.join(selects)})"


def q_o79_band_ingest_loop(spark, sf_dir):
    """The continuous-ingestion LOOP under the hard gate (r13 verdict ask
    #6): batch twin of streaming.dedup.band_ingest_stream — TWO
    sequential micro-batches against a persisted band-index store, where
    batch 2 probes the index AS UPDATED by batch 1's survivors (the loop
    property the flag-only o50/o59 single-step gates cannot see). Each
    step is exactly the plan one foreachBatch invocation runs
    (ingest_one_batch: read store -> dedup.ingest_batch -> idempotent
    partition append; stream == batch pinned in
    tests/test_bucketed_and_stream_dedup.py). Returns
    (batch, doc_id, n_index_hits, n_batch_hits, survives) for both
    batches; the DuckDB twin replays the two-step loop from the same
    three-way split."""
    from .materialize import local_materialize

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.where(F.col("doc_id") % 3 == 0)
    b1 = docs.where(F.col("doc_id") % 3 == 1)
    b2 = docs.where(F.col("doc_id") % 3 == 2)
    idx0 = dedup.minhash_band_index(corpus, "text", "doc_id", N_HASHES,
                                    BANDS, SHINGLE_K, MINHASH_SEED)
    stats1, rows1 = dedup.ingest_batch(b1, idx0, "text", "doc_id",
                                       N_HASHES, BANDS, SHINGLE_K,
                                       MINHASH_SEED)
    # The real loop WRITES between steps (ingest_one_batch's idempotent
    # partition append), so step 2 probes a MATERIALIZED store, never
    # step 1's live plan. Mirror that store boundary with slim lazy
    # checkpoints — stats1 is (id, 2 longs, bool), rows1 is
    # (band, sig, id), both codes-sized — otherwise the composed gate
    # plan re-evaluates the whole step-1 probe pyramid inside step 2
    # AND again in the final union (r15 subtree auditor: x2-x4 dups).
    stats1 = local_materialize(stats1, eager=False)
    rows1 = local_materialize(rows1, eager=False)
    idx1 = idx0.unionByName(rows1)
    stats2 = dedup.incremental_dedup(b2, idx1, "text", "doc_id", N_HASHES,
                                     BANDS, SHINGLE_K, MINHASH_SEED)
    one, two = F.lit(1).cast("int"), F.lit(2).cast("int")
    return (stats1.withColumn("batch", one)
            .unionByName(stats2.withColumn("batch", two))
            .select("batch", F.col("doc_id").cast("bigint").alias("doc_id"),
                    "n_index_hits", "n_batch_hits", "survives"))


def _oracle_band_ingest_loop() -> str:
    """Twin of the two-step ingest loop: step 1 = the o50 contract over
    the %3 split; the step-2 index = corpus buckets UNION batch-1
    survivors' buckets."""
    return f"""
      WITH c0 AS (SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0),
      nb1 AS (SELECT doc_id, text FROM documents WHERE doc_id % 3 = 1),
      nb2 AS (SELECT doc_id, text FROM documents WHERE doc_id % 3 = 2),
      {_sql_minhash_sig_cte(src="c0", name="sig_c0")},
      {_sql_minhash_sig_cte(src="nb1", name="sig_b1")},
      {_sql_minhash_sig_cte(src="nb2", name="sig_b2")},
      {_sql_band_cte("sig_c0", "band_c0")},
      {_sql_band_cte("sig_b1", "band_b1")},
      {_sql_band_cte("sig_b2", "band_b2")},
      ibk0 AS (SELECT DISTINCT band, bsig FROM band_c0),
      ih1 AS (SELECT n.doc_id, count(*) AS n_index_hits
              FROM band_b1 n JOIN ibk0 USING (band, bsig) GROUP BY 1),
      bmin1 AS (SELECT band, bsig, min(doc_id) AS m
                FROM band_b1 GROUP BY 1, 2),
      bh1 AS (SELECT n.doc_id, count(*) AS n_batch_hits
              FROM band_b1 n JOIN bmin1 USING (band, bsig)
              WHERE n.doc_id > bmin1.m GROUP BY 1),
      st1 AS (SELECT d.doc_id,
                     coalesce(ih1.n_index_hits, 0)::BIGINT AS n_index_hits,
                     coalesce(bh1.n_batch_hits, 0)::BIGINT AS n_batch_hits,
                     (coalesce(ih1.n_index_hits, 0) = 0
                      AND coalesce(bh1.n_batch_hits, 0) = 0) AS survives
              FROM nb1 d
              LEFT JOIN ih1 ON d.doc_id = ih1.doc_id
              LEFT JOIN bh1 ON d.doc_id = bh1.doc_id),
      ibk1 AS (SELECT band, bsig FROM ibk0
               UNION
               SELECT band, bsig FROM band_b1
               WHERE doc_id IN (SELECT doc_id FROM st1 WHERE survives)),
      ih2 AS (SELECT n.doc_id, count(*) AS n_index_hits
              FROM band_b2 n JOIN ibk1 USING (band, bsig) GROUP BY 1),
      bmin2 AS (SELECT band, bsig, min(doc_id) AS m
                FROM band_b2 GROUP BY 1, 2),
      bh2 AS (SELECT n.doc_id, count(*) AS n_batch_hits
              FROM band_b2 n JOIN bmin2 USING (band, bsig)
              WHERE n.doc_id > bmin2.m GROUP BY 1),
      st2 AS (SELECT d.doc_id,
                     coalesce(ih2.n_index_hits, 0)::BIGINT AS n_index_hits,
                     coalesce(bh2.n_batch_hits, 0)::BIGINT AS n_batch_hits,
                     (coalesce(ih2.n_index_hits, 0) = 0
                      AND coalesce(bh2.n_batch_hits, 0) = 0) AS survives
              FROM nb2 d
              LEFT JOIN ih2 ON d.doc_id = ih2.doc_id
              LEFT JOIN bh2 ON d.doc_id = bh2.doc_id)
      SELECT 1::INT AS batch, doc_id::BIGINT AS doc_id,
             n_index_hits, n_batch_hits, survives FROM st1
      UNION ALL
      SELECT 2::INT AS batch, doc_id::BIGINT AS doc_id,
             n_index_hits, n_batch_hits, survives FROM st2"""


def _oracle_incremental_dedup() -> str:
    return f"""
      WITH corpus_h AS (SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0),
      newb AS (SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1),
      {_sql_minhash_sig_cte(src="corpus_h", name="sig_c")},
      {_sql_minhash_sig_cte(src="newb", name="sig_n")},
      {_sql_band_cte("sig_c", "band_c")},
      {_sql_band_cte("sig_n", "band_n")},
      ibk AS (SELECT DISTINCT band, bsig FROM band_c),
      ih AS (SELECT n.doc_id, count(*) AS n_index_hits
             FROM band_n n JOIN ibk USING (band, bsig) GROUP BY 1),
      bmin AS (SELECT band, bsig, min(doc_id) AS m FROM band_n GROUP BY 1, 2),
      bh AS (SELECT n.doc_id, count(*) AS n_batch_hits
             FROM band_n n JOIN bmin USING (band, bsig)
             WHERE n.doc_id > bmin.m GROUP BY 1)
      SELECT d.doc_id,
             coalesce(ih.n_index_hits, 0)::BIGINT AS n_index_hits,
             coalesce(bh.n_batch_hits, 0)::BIGINT AS n_batch_hits,
             (coalesce(ih.n_index_hits, 0) = 0
              AND coalesce(bh.n_batch_hits, 0) = 0) AS survives
      FROM newb d
      LEFT JOIN ih ON d.doc_id = ih.doc_id
      LEFT JOIN bh ON d.doc_id = bh.doc_id"""


def _oracle_fuzzy_decon() -> str:
    rows_per_band = N_HASHES // BANDS
    band_selects = []
    for b in range(BANDS):
        cols = ", ".join(f"mh_{b * rows_per_band + r}"
                         for r in range(rows_per_band))
        band_selects.append(
            f"SELECT doc_id, {b} AS band, concat_ws(',', {cols}) AS bsig "
            f"FROM sig WHERE mh_0 != {MERSENNE_P}")
    eq_sum = " + ".join(
        f"(CASE WHEN sa.mh_{i} = sb.mh_{i} THEN 1 ELSE 0 END)"
        for i in range(N_HASHES))
    return f"""
      WITH u AS (
        SELECT doc_id * 2 AS doc_id, text FROM documents
        UNION ALL
        SELECT doc_id * 2 + 1, text FROM documents
        WHERE doc_id % {DECON_BENCH_MOD} = {DECON_BENCH_REM}),
      {_sql_minhash_sig_cte(src="u")},
      band AS ({' UNION ALL '.join(band_selects)}),
      pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM band a JOIN band b
         ON a.band = b.band AND a.bsig = b.bsig AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
      scored AS (
        SELECT id_a, id_b, ({eq_sum}) / {float(N_HASHES)} AS est
        FROM pairs JOIN sig sa ON sa.doc_id = id_a
                   JOIN sig sb ON sb.doc_id = id_b
        WHERE ({eq_sum}) / {float(N_HASHES)} >= {LSH_MIN_EST}
          AND (id_a % 2) != (id_b % 2)),
      hits AS (
        SELECT (CASE WHEN id_a % 2 = 0 THEN id_a ELSE id_b END) // 2
                 AS doc_id,
               count(*) AS n, max(est) AS m
        FROM scored GROUP BY 1)
      SELECT d.doc_id,
             coalesce(h.n, 0)::BIGINT AS n_bench_matches,
             round(coalesce(h.m, 0.0), 6) AS max_est_jaccard,
             (CASE WHEN coalesce(h.m, 0.0) >= {LSH_MIN_EST}
                   THEN 1 ELSE 0 END)::INT AS contaminated
      FROM documents d LEFT JOIN hits h ON h.doc_id = d.doc_id"""


def q_o48_approx_quantiles(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return stats.approx_group_quantiles(li, PROFILE_KEYS, "l_extendedprice",
                                        QUANTILE_QS, APPROXQ_KEY,
                                        APPROXQ_RATE)


# o53 grouped heavy hitters: top-5 most frequent quantities per return
# flag — 3 groups x 5 exact ranked values with within-group shares
TOPVAL_K = 5

# o54 unigram-LM cross-entropy (CCNet-style quality signal, self-trained)
XENT_SMOOTH_K = 0.5

# o55 JL random projection: 64 -> 16 dims, Achlioptas sign matrix
RP_OUT_DIM = 16
RP_SEED = 7


def q_o55_random_projection(spark, sf_dir):
    """Projected embeddings exploded to (vec_id, dim, val) scalar rows so
    the driver's value hash covers every coordinate."""
    emb = load_table(spark, sf_dir, "embeddings")
    rp = similarity.random_projection(emb, "embedding", "vec_id",
                                      RP_OUT_DIM, EMB_DIM, RP_SEED)
    return (rp.select(F.col("vec_id"),
                      F.posexplode("y").alias("dim", "val"))
              .select(F.col("vec_id").cast("bigint").alias("vec_id"),
                      F.col("dim").cast("bigint").alias("dim"),
                      F.col("val")))


def q_o54_unigram_xent(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return corpus.unigram_xent_score(docs, "text", "doc_id", XENT_SMOOTH_K)


def q_o53_group_top_values(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return stats.group_top_values(li, ["l_returnflag"], "l_quantity",
                                  TOPVAL_K)


def q_o47_bloom_semi_join(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    od = load_table(spark, sf_dir, "orders")
    small = od.where(BLOOM_PRED_SQL).select("o_orderkey")
    out = bloom.bloom_semi_join(li, "l_orderkey", small, "o_orderkey",
                                BLOOM_M_BITS, BLOOM_K)
    return (out.groupBy("l_returnflag")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                 F.countDistinct("l_orderkey").cast("bigint")
                  .alias("n_keys")))


def _oracle_bloom_semi_join() -> str:
    inner = bloom.sql_bloom_semi_join(
        "lineitem", "l_orderkey",
        f"(SELECT o_orderkey FROM orders WHERE {BLOOM_PRED_SQL})",
        "o_orderkey", BLOOM_M_BITS, BLOOM_K)
    return (f"SELECT l_returnflag, count(*)::BIGINT AS n_rows, "
            f"count(DISTINCT l_orderkey)::BIGINT AS n_keys "
            f"FROM ({inner}) GROUP BY l_returnflag")


# o45 SemDeDup: same seed codebook as o16; tau below o06's 0.4 so the
# within-cell pair set is non-trivial on the near-orthogonal gate vectors
# (57 pairs at sf0.01; tau=0.4 would leave 11)
SEMDEDUP_TAU = 0.35

# o44_semdedup_pairs RETIRED (round 13): shortlist entry #1 (round-10
# verdict ask #8) — a STRICT INTERMEDIATE of the gated o45 pipeline whose
# oracle is embedded VERBATIM in o45's (_oracle_semdedup builds both
# faces from one base; o44's entire query was o45's `pairs` CTE), so the
# driver was value-checking the pair set twice. Window-slot law
# satisfied: o44 is in the round-13 ROTATION-DEBT set (green only in
# r11), so retiring it frees both a registry slot and a window slot. The
# operator stays covered: the pairs face is exercised by o45's gate and
# the tests/test_ivf.py semdedup_* suite. Its slot went to
# o78_pq_hier_collisions (the r12 verdict's ask #5 surface, driver-gated).


def q_o45_semdedup_apply(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    cents = ivf.seed_centroids(emb, "embedding", "vec_id", IVF_CENTROID_IDS)
    out = ivf.semdedup_apply(emb, "embedding", "vec_id", cents, SEMDEDUP_TAU)
    return out.select("vec_id", F.col("cell").cast("bigint").alias("cell"),
                      "kept")


def _oracle_semdedup(which: str) -> str:
    """Shared SemDeDup twin: the o16 assignment CTE + a within-cell pair
    join. `which` selects the pairs face (o44) or the survivor face (o45)."""
    cids = ", ".join(map(str, IVF_CENTROID_IDS))
    diff = "(CAST(e.embedding[i] AS DOUBLE) - CAST(c.cv[i] AS DOUBLE))"
    sqd = (f"list_sum(list_transform(range(1, {EMB_DIM} + 1), "
           f"i -> {diff} * {diff}))")
    dot = _SQL_DOT.format(dim=EMB_DIM)
    na = _SQL_NORM.format(dim=EMB_DIM, t="a")
    nb = _SQL_NORM.format(dim=EMB_DIM, t="b")
    base = f"""
      WITH cent AS (SELECT vec_id AS cid, embedding AS cv
                    FROM embeddings WHERE vec_id IN ({cids})),
      d AS (SELECT e.vec_id, c.cid, {sqd} AS sd FROM embeddings e, cent c),
      assign AS (SELECT vec_id, cid::BIGINT AS cell
                 FROM (SELECT vec_id, cid, row_number() OVER
                         (PARTITION BY vec_id ORDER BY sd ASC, cid ASC) AS rn
                       FROM d) WHERE rn = 1),
      pairs AS (
        SELECT la.cell, a.vec_id AS id_a, b.vec_id AS id_b,
               {dot} / ({na} * {nb}) AS cos
        FROM embeddings a JOIN assign la ON la.vec_id = a.vec_id
             JOIN assign lb ON lb.cell = la.cell
             JOIN embeddings b ON b.vec_id = lb.vec_id
        WHERE a.vec_id < b.vec_id
          AND {dot} / ({na} * {nb}) >= {SEMDEDUP_TAU})"""
    if which == "pairs":
        return base + f"""
      SELECT cell, id_a, id_b, round(cos, {ROUND}) AS cosine FROM pairs"""
    return base + """
      SELECT v.vec_id, v.cell,
             (v.vec_id NOT IN (SELECT id_b FROM pairs)) AS kept
      FROM assign v"""


HIER_COARSE_IDS = list(range(0, 480, 120))  # K1 = 4 coarse routes
HIER_SUB_K = 4             # k2 = 4 data-derived sub-cells per route


# o56_semdedup_hier_pairs RETIRED (round 15): shortlist entry #2
# (round-10 verdict ask #8) — a STRICT INTERMEDIATE of the gated o57
# pipeline whose oracle is embedded VERBATIM in o57's
# (_oracle_semdedup_hier builds both faces from one base; o56's entire
# query was o57's `pairs` CTE), so the driver was value-checking the
# hier pair set twice. Window-slot law satisfied: o56 is in the
# round-15 ROTATION-DEBT set (green only in r13), so retiring it frees
# both a registry slot and a window slot — the r14 round explicitly
# deferred this swap until the debt aging made it legal (r14 note
# above). The operator stays covered: the hier pairs face is exercised
# by o57's gate, o75's multiprobe gate, and the tests/test_ivf.py
# semdedup_pairs_hier suite. Its slot went to o79_band_ingest_loop
# (the r13 verdict ask-#6 surface: the two-step continuous band-ingest
# LOOP, built + stream-parity-pinned in r14, registered here).


def q_o75_semdedup_multiprobe(spark, sf_dir):
    """The round-10 multi-probe recall fix ITSELF under the hard gate:
    hierarchical SemDeDup pairs with route_probes=2 — every vector
    enters pair generation under its two nearest coarse routes, pairs
    form in every probed cell, each (id_a, id_b) emitted once with the
    smallest shared cell. Expression kernel (bit-stable vs the twin).
    The pair set is a measured ~2x-recall superset of o56's single-probe
    set at identical cells (SCALING.json hier_multiprobe_r10)."""
    emb = load_table(spark, sf_dir, "embeddings")
    coarse = ivf.seed_centroids(emb, "embedding", "vec_id", HIER_COARSE_IDS)
    out = ivf.semdedup_pairs_hier(emb, "embedding", "vec_id", coarse,
                                  HIER_SUB_K, SEMDEDUP_TAU,
                                  route_probes=2)
    return out.select(F.col("cell").cast("bigint").alias("cell"),
                      "id_a", "id_b",
                      F.round("cosine", ROUND).alias("cosine"))


def _oracle_semdedup_multiprobe() -> str:
    """Twin of q_o75: the o56 two-level CTE with the assignment widened
    to the TOP-2 routes per vector (rn <= 2; sub-seeds still derive from
    the PRIMARY routing — the codebook is single-probe, only pair
    generation multi-probes), pairs over any shared cell, deduped to
    (id_a, id_b, min(cell))."""
    cids = ", ".join(map(str, HIER_COARSE_IDS))
    diffc = "(CAST(e.embedding[i] AS DOUBLE) - CAST(c.cv[i] AS DOUBLE))"
    sqdc = (f"list_sum(list_transform(range(1, {EMB_DIM} + 1), "
            f"i -> {diffc} * {diffc}))")
    diffs = "(CAST(e.embedding[i] AS DOUBLE) - CAST(cs.embedding[i] AS DOUBLE))"
    sqds = (f"list_sum(list_transform(range(1, {EMB_DIM} + 1), "
            f"i -> {diffs} * {diffs}))")
    dot = _SQL_DOT.format(dim=EMB_DIM)
    na = _SQL_NORM.format(dim=EMB_DIM, t="a")
    nb = _SQL_NORM.format(dim=EMB_DIM, t="b")
    return f"""
      WITH cent AS (SELECT vec_id AS cid, embedding AS cv
                    FROM embeddings WHERE vec_id IN ({cids})),
      dr AS (SELECT e.vec_id, c.cid, {sqdc} AS sd FROM embeddings e, cent c),
      ranked AS (SELECT vec_id, cid, row_number() OVER
                   (PARTITION BY vec_id ORDER BY sd ASC, cid ASC) AS rn
                 FROM dr),
      route AS (SELECT vec_id, cid AS route FROM ranked WHERE rn = 1),
      probe AS (SELECT vec_id, cid AS route FROM ranked WHERE rn <= 2),
      sub_seed AS (SELECT route, vec_id AS scid
                   FROM (SELECT route, vec_id, row_number() OVER
                           (PARTITION BY route ORDER BY vec_id ASC) AS rn
                         FROM route) WHERE rn <= {HIER_SUB_K}),
      d2 AS (SELECT p.vec_id, p.route, s.scid, {sqds} AS sd
             FROM probe p
             JOIN embeddings e ON e.vec_id = p.vec_id
             JOIN sub_seed s ON s.route = p.route
             JOIN embeddings cs ON cs.vec_id = s.scid),
      assign AS (SELECT vec_id, scid::BIGINT AS cell
                 FROM (SELECT vec_id, route, scid, row_number() OVER
                         (PARTITION BY vec_id, route
                          ORDER BY sd ASC, scid ASC) AS rn
                       FROM d2) WHERE rn = 1),
      shared AS (SELECT la.vec_id AS id_a, lb.vec_id AS id_b,
                        min(la.cell)::BIGINT AS cell
                 FROM assign la JOIN assign lb ON lb.cell = la.cell
                 WHERE la.vec_id < lb.vec_id
                 GROUP BY la.vec_id, lb.vec_id)
      SELECT s.cell, s.id_a, s.id_b,
             round({dot} / ({na} * {nb}), {ROUND}) AS cosine
      FROM shared s JOIN embeddings a ON a.vec_id = s.id_a
           JOIN embeddings b ON b.vec_id = s.id_b
      WHERE {dot} / ({na} * {nb}) >= {SEMDEDUP_TAU}"""


def q_o60_semdedup_gram_pairs(spark, sf_dir):
    """Flat SemDeDup pairs on the round-6 GRAM kernel (BLAS argmin
    assignment + one gram matmul per cell, operators/gram.py) — the
    production scale face of o44 (sf10: 656 s expr → 11 s gram, identical
    pair set). Shares o44's oracle: ROUND-digit rounding absorbs the
    BLAS-vs-left-to-right last-ulp difference, and kernel pair-set
    equality is additionally pinned in tests/test_gram.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    cents = ivf.seed_centroids(emb, "embedding", "vec_id", IVF_CENTROID_IDS)
    out = ivf.semdedup_pairs(emb, "embedding", "vec_id", cents,
                             SEMDEDUP_TAU, kernel="gram")
    return out.select(F.col("cell").cast("bigint").alias("cell"),
                      "id_a", "id_b",
                      F.round("cosine", ROUND).alias("cosine"))


# o61_semdedup_hier_gram_pairs RETIRED (round 12): it ran
# ivf.semdedup_pairs_hier(..., kernel="gram") against o56's oracle string
# VERBATIM (both registered _oracle_semdedup_hier("pairs")) — the same
# LOGICAL query as o56 under a different physical kernel, i.e. the driver
# was hashing one logical query twice. Kernel coverage is not lost: the
# hier face stays gated by o56, the gram kernel by o60, and gram==expr
# pair-set equality for the combined hier+gram path is pinned in
# tests/test_gram.py. Its slot went to o77_pq_hier_topk (the round-11
# verdict's ask #2). The verdict pre-vetted o44 as the donor, but a donor
# must come from the ROTATION-DEBT set (a new query needs a window slot,
# not just a registry slot — retiring r11-green o44 would strand one debt
# query outside the 50-row window with no green row in r11∪r12); o61 is
# the debt-set member with the same strict-duplicate evidence.


SHARD_SHUFFLE_N = 8


def _sql_shard_shuffle_oracle() -> str:
    from .sampling import sql_shard_shuffle

    return sql_shard_shuffle("documents", "doc_id", SHARD_SHUFFLE_N)


def q_o62_shard_shuffle(spark, sf_dir):
    """Deterministic global corpus shuffle + sharding (the training-data
    writer prepass): seeded hash-permutation rank, shard = rank mod N,
    dense position within shard. One exchange (per-shard window)."""
    from .sampling import shard_shuffle

    docs = load_table(spark, sf_dir, "documents")
    return shard_shuffle(docs, "doc_id", SHARD_SHUFFLE_N)


def q_o63_semdedup_incremental(spark, sf_dir):
    """Probe-only incremental SemDeDup (ivf.semdedup_incremental): even
    vec_ids are the persisted cell index, odd vec_ids the ingest batch.
    Cross gram kernel — new×index and new×new only, never index×index."""
    emb = load_table(spark, sf_dir, "embeddings")
    cents = ivf.seed_centroids(emb, "embedding", "vec_id", IVF_CENTROID_IDS)
    idx = ivf.ivf_cell_index(emb.where(F.col("vec_id") % 2 == 0),
                             "embedding", "vec_id", cents)
    return ivf.semdedup_incremental(emb.where(F.col("vec_id") % 2 == 1),
                                    idx, "embedding", "vec_id", cents,
                                    SEMDEDUP_TAU)


def _oracle_semdedup_incremental() -> str:
    """Twin: the o44 assignment CTE over ALL rows, then per odd (batch) id
    count within-cell within-tau even partners (index hits) and smaller
    odd partners (batch hits)."""
    cids = ", ".join(map(str, IVF_CENTROID_IDS))
    diff = "(CAST(e.embedding[i] AS DOUBLE) - CAST(c.cv[i] AS DOUBLE))"
    sqd = (f"list_sum(list_transform(range(1, {EMB_DIM} + 1), "
           f"i -> {diff} * {diff}))")
    dot = _SQL_DOT.format(dim=EMB_DIM)
    na = _SQL_NORM.format(dim=EMB_DIM, t="a")
    nb = _SQL_NORM.format(dim=EMB_DIM, t="b")
    return f"""
      WITH cent AS (SELECT vec_id AS cid, embedding AS cv
                    FROM embeddings WHERE vec_id IN ({cids})),
      d AS (SELECT e.vec_id, c.cid, {sqd} AS sd FROM embeddings e, cent c),
      assign AS (SELECT vec_id, cid::BIGINT AS cell
                 FROM (SELECT vec_id, cid, row_number() OVER
                         (PARTITION BY vec_id ORDER BY sd ASC, cid ASC) AS rn
                       FROM d) WHERE rn = 1),
      hits AS (
        SELECT a.vec_id AS vec_id,
               SUM(CASE WHEN b.vec_id % 2 = 0 THEN 1 ELSE 0 END)::BIGINT
                 AS n_index_hits,
               SUM(CASE WHEN b.vec_id % 2 = 1 AND b.vec_id < a.vec_id
                        THEN 1 ELSE 0 END)::BIGINT AS n_batch_hits
        FROM embeddings a JOIN assign la ON la.vec_id = a.vec_id
             JOIN assign lb ON lb.cell = la.cell
             JOIN embeddings b ON b.vec_id = lb.vec_id
        WHERE a.vec_id % 2 = 1 AND b.vec_id <> a.vec_id
          AND {dot} / ({na} * {nb}) >= {SEMDEDUP_TAU}
        GROUP BY a.vec_id)
      SELECT e.vec_id,
             coalesce(h.n_index_hits, 0) AS n_index_hits,
             coalesce(h.n_batch_hits, 0) AS n_batch_hits,
             (coalesce(h.n_index_hits, 0) = 0
              AND coalesce(h.n_batch_hits, 0) = 0) AS survives
      FROM embeddings e LEFT JOIN hits h ON h.vec_id = e.vec_id
      WHERE e.vec_id % 2 = 1"""


def q_o64_semdedup_incr_hier(spark, sf_dir):
    """Probe-only incremental SemDeDup against a HIERARCHICAL cell index
    (ivf.ivf_cell_index_hier + semdedup_incremental(subs=...)): even
    vec_ids are the persisted corpus — their hier_codebook (coarse seed
    routes, k2 smallest even ids per route as sub-centroids) is the
    persisted codebook — and odd vec_ids the ingest batch, assigned with
    the SAME codebook via the two-level route (O(K1 + k2) per row, the
    past-broadcast-regime fix for the flat O(cells) driver-list argmin).
    Same hits/survives contract as o63."""
    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.where(F.col("vec_id") % 2 == 0)
    coarse = ivf.seed_centroids(corpus, "embedding", "vec_id",
                                HIER_COARSE_IDS)
    # production lifecycle, materialized: codebook and index are
    # persisted at build time; the batch is assigned ONCE with the
    # pruned two-level route and handed to the probe via ``assigned=``
    # (the operator's own advice for large codebooks — the lazy ``subs=``
    # form re-runs the cogrouped assignment per plan consumer; its
    # equality with this form is pinned in tests/test_gram.py).
    subs = ivf.hier_codebook(corpus, "embedding", "vec_id", coarse,
                             HIER_SUB_K).localCheckpoint(eager=True)
    idx = ivf.ivf_cell_index_hier(corpus, "embedding", "vec_id", coarse,
                                  subs).localCheckpoint(eager=True)
    batch = emb.where(F.col("vec_id") % 2 == 1)
    assigned = (ivf._np_assign_with_subs(batch, "embedding", "vec_id",
                                         coarse, subs, prune_subs=True)
                .select(F.col("vec_id"), "v", "cell")
                .localCheckpoint(eager=True))
    return ivf.semdedup_incremental(batch, idx, "embedding", "vec_id",
                                    coarse, SEMDEDUP_TAU,
                                    assigned=assigned)


def _oracle_semdedup_incr_hier() -> str:
    """Twin: the o56 two-level assignment CTE with sub-seeds drawn from
    EVEN (corpus) rows only — the persisted-codebook semantics: a batch
    row is assigned against the codebook the index was built with, never
    one re-derived from the batch — then the o63 hits contract (within-
    cell within-tau even partners = index hits, smaller odd partners =
    batch hits). Odd rows whose route has no even member have no cell and
    trivially survive (both faces agree: the engine's inner join on route
    drops them from the pair stage, the left join restores 0/0)."""
    cids = ", ".join(map(str, HIER_COARSE_IDS))
    diffc = "(CAST(e.embedding[i] AS DOUBLE) - CAST(c.cv[i] AS DOUBLE))"
    sqdc = (f"list_sum(list_transform(range(1, {EMB_DIM} + 1), "
            f"i -> {diffc} * {diffc}))")
    diffs = "(CAST(e.embedding[i] AS DOUBLE) - CAST(cs.embedding[i] AS DOUBLE))"
    sqds = (f"list_sum(list_transform(range(1, {EMB_DIM} + 1), "
            f"i -> {diffs} * {diffs}))")
    dot = _SQL_DOT.format(dim=EMB_DIM)
    na = _SQL_NORM.format(dim=EMB_DIM, t="a")
    nb = _SQL_NORM.format(dim=EMB_DIM, t="b")
    return f"""
      WITH cent AS (SELECT vec_id AS cid, embedding AS cv
                    FROM embeddings WHERE vec_id IN ({cids})),
      dr AS (SELECT e.vec_id, c.cid, {sqdc} AS sd FROM embeddings e, cent c),
      route AS (SELECT vec_id, cid AS route
                FROM (SELECT vec_id, cid, row_number() OVER
                        (PARTITION BY vec_id ORDER BY sd ASC, cid ASC) AS rn
                      FROM dr) WHERE rn = 1),
      sub_seed AS (SELECT route, vec_id AS scid
                   FROM (SELECT route, vec_id, row_number() OVER
                           (PARTITION BY route ORDER BY vec_id ASC) AS rn
                         FROM route WHERE vec_id % 2 = 0)
                   WHERE rn <= {HIER_SUB_K}),
      d2 AS (SELECT r.vec_id, s.scid, {sqds} AS sd
             FROM route r
             JOIN embeddings e ON e.vec_id = r.vec_id
             JOIN sub_seed s ON s.route = r.route
             JOIN embeddings cs ON cs.vec_id = s.scid),
      assign AS (SELECT vec_id, scid::BIGINT AS cell
                 FROM (SELECT vec_id, scid, row_number() OVER
                         (PARTITION BY vec_id ORDER BY sd ASC, scid ASC) AS rn
                       FROM d2) WHERE rn = 1),
      hits AS (
        SELECT a.vec_id AS vec_id,
               SUM(CASE WHEN b.vec_id % 2 = 0 THEN 1 ELSE 0 END)::BIGINT
                 AS n_index_hits,
               SUM(CASE WHEN b.vec_id % 2 = 1 AND b.vec_id < a.vec_id
                        THEN 1 ELSE 0 END)::BIGINT AS n_batch_hits
        FROM embeddings a JOIN assign la ON la.vec_id = a.vec_id
             JOIN assign lb ON lb.cell = la.cell
             JOIN embeddings b ON b.vec_id = lb.vec_id
        WHERE a.vec_id % 2 = 1 AND b.vec_id <> a.vec_id
          AND {dot} / ({na} * {nb}) >= {SEMDEDUP_TAU}
        GROUP BY a.vec_id)
      SELECT e.vec_id,
             coalesce(h.n_index_hits, 0) AS n_index_hits,
             coalesce(h.n_batch_hits, 0) AS n_batch_hits,
             (coalesce(h.n_index_hits, 0) = 0
              AND coalesce(h.n_batch_hits, 0) = 0) AS survives
      FROM embeddings e LEFT JOIN hits h ON h.vec_id = e.vec_id
      WHERE e.vec_id % 2 = 1"""


def q_o57_semdedup_hier_apply(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    coarse = ivf.seed_centroids(emb, "embedding", "vec_id", HIER_COARSE_IDS)
    out = ivf.semdedup_apply_hier(emb, "embedding", "vec_id", coarse,
                                  HIER_SUB_K, SEMDEDUP_TAU)
    return out.select("vec_id", F.col("cell").cast("bigint").alias("cell"),
                      "kept")


def _oracle_semdedup_hier(which: str) -> str:
    """Twin of the two-level assignment: coarse route by nearest seed
    centroid, sub-seeds = each route's HIER_SUB_K smallest-id members,
    final cell by nearest sub-seed (ties (distance, id) ascending, both
    levels) — then the same within-cell pair join as _oracle_semdedup."""
    cids = ", ".join(map(str, HIER_COARSE_IDS))
    diffc = "(CAST(e.embedding[i] AS DOUBLE) - CAST(c.cv[i] AS DOUBLE))"
    sqdc = (f"list_sum(list_transform(range(1, {EMB_DIM} + 1), "
            f"i -> {diffc} * {diffc}))")
    diffs = "(CAST(e.embedding[i] AS DOUBLE) - CAST(cs.embedding[i] AS DOUBLE))"
    sqds = (f"list_sum(list_transform(range(1, {EMB_DIM} + 1), "
            f"i -> {diffs} * {diffs}))")
    dot = _SQL_DOT.format(dim=EMB_DIM)
    na = _SQL_NORM.format(dim=EMB_DIM, t="a")
    nb = _SQL_NORM.format(dim=EMB_DIM, t="b")
    base = f"""
      WITH cent AS (SELECT vec_id AS cid, embedding AS cv
                    FROM embeddings WHERE vec_id IN ({cids})),
      dr AS (SELECT e.vec_id, c.cid, {sqdc} AS sd FROM embeddings e, cent c),
      route AS (SELECT vec_id, cid AS route
                FROM (SELECT vec_id, cid, row_number() OVER
                        (PARTITION BY vec_id ORDER BY sd ASC, cid ASC) AS rn
                      FROM dr) WHERE rn = 1),
      sub_seed AS (SELECT route, vec_id AS scid
                   FROM (SELECT route, vec_id, row_number() OVER
                           (PARTITION BY route ORDER BY vec_id ASC) AS rn
                         FROM route) WHERE rn <= {HIER_SUB_K}),
      d2 AS (SELECT r.vec_id, s.scid, {sqds} AS sd
             FROM route r
             JOIN embeddings e ON e.vec_id = r.vec_id
             JOIN sub_seed s ON s.route = r.route
             JOIN embeddings cs ON cs.vec_id = s.scid),
      assign AS (SELECT vec_id, scid::BIGINT AS cell
                 FROM (SELECT vec_id, scid, row_number() OVER
                         (PARTITION BY vec_id ORDER BY sd ASC, scid ASC) AS rn
                       FROM d2) WHERE rn = 1),
      pairs AS (
        SELECT la.cell, a.vec_id AS id_a, b.vec_id AS id_b,
               {dot} / ({na} * {nb}) AS cos
        FROM embeddings a JOIN assign la ON la.vec_id = a.vec_id
             JOIN assign lb ON lb.cell = la.cell
             JOIN embeddings b ON b.vec_id = lb.vec_id
        WHERE a.vec_id < b.vec_id
          AND {dot} / ({na} * {nb}) >= {SEMDEDUP_TAU})"""
    if which == "pairs":
        return base + f"""
      SELECT cell, id_a, id_b, round(cos, {ROUND}) AS cosine FROM pairs"""
    return base + """
      SELECT v.vec_id, v.cell,
             (v.vec_id NOT IN (SELECT id_b FROM pairs)) AS kept
      FROM assign v"""


def q_o42_kmv_distinct(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return sketches.kmv_distinct(li, SKETCH_GROUP, SKETCH_VALUE, KMV_K)


def q_o72_kmv_threshold(spark, sf_dir):
    """The KMV THRESHOLD kernel under the hard gate (o42 with
    method="threshold"): per-group hash cutoff + declarative refill
    (sketches.kmv_distinct round-9 scale face — auto picks it past
    256 MiB, so without this pin the gate would only ever check the
    partial face). Shares o42's oracle — both kernels return the exact
    k smallest distinct hashes, so the SQL twin is identical."""
    li = load_table(spark, sf_dir, "lineitem")
    return sketches.kmv_distinct(li, SKETCH_GROUP, SKETCH_VALUE, KMV_K,
                                 method="threshold")


def q_o43_hll_distinct(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return sketches.hll_distinct(li, SKETCH_GROUP, SKETCH_VALUE, HLL_P)


PHASH_W, PHASH_H = 32, 24      # fixed canvas: hashes must align across images
PHASH_MAX_HAMMING = 16


def q_o73_image_phash_pairs(spark, sf_dir):
    """Perceptual-hash image near-dup (round-10 ask #4): every document
    rendered as a FIXED-SIZE textured P6 PPM (same-size canvases are what
    make perceptual hashes comparable), dHashed from the REAL pixel bytes
    (multimodal.image_phash: 9x8 grayscale grid, integer-exact adjacent-
    cell comparisons), then paired with the pigeonhole hamming block join
    (dedup.hamming_pairs — simhash_pairs' join factored over any fixed-
    width signature). The standard pre-embedding image-dedup pass of a
    multimodal training pipeline. The oracle re-derives the hash per
    image from the same payload bytes in SQL (grid sums + cross-
    multiplied comparisons + bit_or packing) and verifies pairs with an
    exact all-pairs xor/bit_count — no pigeonhole, so the block join's
    100%-recall claim is itself under test."""
    docs = load_table(spark, sf_dir, "documents")
    media = multimodal.documents_as_ppm_textured(docs, fixed_w=PHASH_W,
                                                 fixed_h=PHASH_H)
    ph = multimodal.image_phash(media, method="dhash")
    return dedup.hamming_pairs(ph, "media_id", "phash", bits=64,
                               max_hamming=PHASH_MAX_HAMMING)


def q_o74_cell_store_probe(spark, sf_dir):
    """The on-disk cell-store LIFECYCLE end-to-end (round-10 ask #8):
    build an IVF cell index over a third of the corpus and
    ``write_cell_index`` it partitioned by cell; APPEND a second third as
    an ingest batch (the continuous-ingest write — one more file per
    touched cell); ``compact_cell_index`` the over-cap partitions back to
    one file per cell (dynamic partition overwrite, untouched cells keep
    their files); ``read_cell_index`` the store and probe the final third
    with ``semdedup_incremental(prune_index=True)`` — whose touched-cell
    semi-join compiles to DYNAMIC PARTITION PRUNING against the store
    (plan pinned in tests/test_gram.py). Same hits/survives contract as
    o63 with the index = two thirds of the corpus. The store lives under
    the system temp dir (rebuilt per run, content-addressed by sf_dir);
    every write/compact/read round-trip is therefore INSIDE the gated
    comparison — a wrong partition value, lost row, or dropped file
    surfaces as a hits mismatch."""
    import hashlib
    import os
    import tempfile

    emb = load_table(spark, sf_dir, "embeddings")
    cents = ivf.seed_centroids(emb, "embedding", "vec_id",
                               IVF_CENTROID_IDS)
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    path = os.path.join(tempfile.gettempdir(),
                        f"rd_spark_cell_store_{tag}")
    ivf.write_cell_index(
        ivf.ivf_cell_index(emb.where(F.col("vec_id") % 3 == 0),
                           "embedding", "vec_id", cents), path)
    ivf.write_cell_index(
        ivf.ivf_cell_index(emb.where(F.col("vec_id") % 3 == 1),
                           "embedding", "vec_id", cents),
        path, mode="append")
    ivf.compact_cell_index(spark, path, max_files_per_cell=1)
    stored = ivf.read_cell_index(spark, path)
    return ivf.semdedup_incremental(emb.where(F.col("vec_id") % 3 == 2),
                                    stored, "embedding", "vec_id", cents,
                                    SEMDEDUP_TAU, prune_index=True)


def _oracle_cell_store_probe() -> str:
    """Twin of o74: o63's assignment + hits contract with the index =
    vec_id %% 3 in (0, 1) and the batch = %% 3 == 2. The store write /
    append / compact / read lifecycle has no SQL counterpart — its
    correctness IS what the value comparison checks (the oracle computes
    the hits from the tables directly; any row the store loses or
    mangles diverges the Spark side)."""
    cids = ", ".join(map(str, IVF_CENTROID_IDS))
    diff = "(CAST(e.embedding[i] AS DOUBLE) - CAST(c.cv[i] AS DOUBLE))"
    sqd = (f"list_sum(list_transform(range(1, {EMB_DIM} + 1), "
           f"i -> {diff} * {diff}))")
    dot = _SQL_DOT.format(dim=EMB_DIM)
    na = _SQL_NORM.format(dim=EMB_DIM, t="a")
    nb = _SQL_NORM.format(dim=EMB_DIM, t="b")
    return f"""
      WITH cent AS (SELECT vec_id AS cid, embedding AS cv
                    FROM embeddings WHERE vec_id IN ({cids})),
      d AS (SELECT e.vec_id, c.cid, {sqd} AS sd FROM embeddings e, cent c),
      assign AS (SELECT vec_id, cid::BIGINT AS cell
                 FROM (SELECT vec_id, cid, row_number() OVER
                         (PARTITION BY vec_id ORDER BY sd ASC, cid ASC) AS rn
                       FROM d) WHERE rn = 1),
      hits AS (
        SELECT a.vec_id AS vec_id,
               SUM(CASE WHEN b.vec_id % 3 IN (0, 1) THEN 1 ELSE 0 END)::BIGINT
                 AS n_index_hits,
               SUM(CASE WHEN b.vec_id % 3 = 2 AND b.vec_id < a.vec_id
                        THEN 1 ELSE 0 END)::BIGINT AS n_batch_hits
        FROM embeddings a JOIN assign la ON la.vec_id = a.vec_id
             JOIN assign lb ON lb.cell = la.cell
             JOIN embeddings b ON b.vec_id = lb.vec_id
        WHERE a.vec_id % 3 = 2 AND b.vec_id <> a.vec_id
          AND {dot} / ({na} * {nb}) >= {SEMDEDUP_TAU}
        GROUP BY a.vec_id)
      SELECT e.vec_id,
             coalesce(h.n_index_hits, 0) AS n_index_hits,
             coalesce(h.n_batch_hits, 0) AS n_batch_hits,
             (coalesce(h.n_index_hits, 0) = 0
              AND coalesce(h.n_batch_hits, 0) = 0) AS survives
      FROM embeddings e LEFT JOIN hits h ON h.vec_id = e.vec_id
      WHERE e.vec_id % 3 = 2"""


# o77: the ROUTE-partitioned million-cell PQ store (round-11 flagship,
# driver-gated per the round-11 verdict ask #2). 4 probed cells out of
# K1*k2 = 16 under 2 coarse routes exercises PARTIAL probing (route
# pruning + global sub-cell selection both non-trivial on the gate data).
PQ_HIER_N_PROBES = 4
PQ_HIER_ROUTE_PROBES = 2


def q_o77_pq_hier_topk(spark, sf_dir):
    """The million-cell on-disk IVFADC regime END-TO-END under the hard
    gate: two-level codebook (``ivf.hier_codebook``) -> PQ codes under
    (route, cell) routing (``pq.pq_cell_index_hier``) -> ROUTE-partitioned,
    cell-sorted store (``ivf.write_cell_index(sort_within=("cell",))`` —
    the row-group-pruning layout) -> read back -> ``pq.pq_topk_index_hier``
    probe, whose driver-computed probe set lands on the scan as STATIC
    `route IN` (directory pruning) + `cell IN` (parquet min/max) predicates
    (plan pinned in tests/test_pq.py::test_hier_route_partitioned_store).
    The store round-trip sits INSIDE the gated comparison, o74-style: a
    lost row, wrong partition value, or mis-sorted layout diverges the
    ADC ranking. Same PQ sub-codebook seeds as o76, so the two queries
    differ in exactly the routing/store regime (flat DPP vs hier static
    pruning)."""
    import hashlib
    import os
    import tempfile

    emb = load_table(spark, sf_dir, "embeddings")
    coarse = ivf.seed_centroids(emb, "embedding", "vec_id", HIER_COARSE_IDS)
    # production lifecycle, materialized: the (route, cb) codebook is a
    # persisted build-time artifact (same reasoning as o64)
    subs = ivf.hier_codebook(emb, "embedding", "vec_id", coarse,
                             HIER_SUB_K).localCheckpoint(eager=True)
    codebooks = pq.pq_seed_codebooks(emb, "embedding", "vec_id", PQ_M,
                                     IVF_CENTROID_IDS)
    # per-RUN store path: keyed by (sf_dir, Spark applicationId) so two
    # concurrent gate/bench runs over the same sf_dir never race each
    # other's overwrite-vs-read (ADVICE r12); app-scoped reruns within one
    # session reuse (and overwrite) their own directory, which is the
    # bench.py median-of-3 shape.
    tag = hashlib.md5(
        f"{sf_dir}|{spark.sparkContext.applicationId}".encode()
    ).hexdigest()[:10]
    path = os.path.join(tempfile.gettempdir(),
                        f"rd_spark_pq_hier_store_{tag}")
    ivf.write_cell_index(
        pq.pq_cell_index_hier(emb, "embedding", "vec_id", codebooks,
                              coarse, subs),
        path, partition_col="route", sort_within=("cell",))
    stored = ivf.read_cell_index(spark, path, partition_col="route")
    queries = emb.where(F.col("vec_id").isin(TOPK_QUERY_IDS))
    out = pq.pq_topk_index_hier(stored, queries, "embedding", "vec_id",
                                TOPK_K, codebooks, coarse, subs,
                                n_probes=PQ_HIER_N_PROBES,
                                route_probes=PQ_HIER_ROUTE_PROBES)
    return out.select("query_id", "neighbor_id",
                      F.round("adc", ROUND).alias("adc"),
                      F.col("rank").cast("bigint").alias("rank"))


# o78: the streamed slice (batch face of pq_collision_stream_hier's
# global_n_probes mode) and its ADC collision threshold — sits between
# the sf0.01 gate slice's nearest-neighbor ADCs (~1.0) and the bulk
# (tau sweep at sf0.01: 0.9 -> 0, 1.0 -> 4, 1.1 -> 13 of 100 flagged).
PQ_HIER_STREAM_PRED = "vec_id % 5 = 3"
PQ_HIER_COLLISION_TAU = 1.1


def q_o78_pq_hier_collisions(spark, sf_dir):
    """The streaming PQ service face under the hard gate: batch twin of
    `pq.pq_collision_stream_hier(global_n_probes=...)` — the r13
    stream-legal `_hier_probe_frame` (row-local GLOBAL top-n probe
    selection over route_probes coarse routes, zero query-side
    exchanges), candidates by a (route, cell) equi-join against the
    two-level PQ code index, an unrounded ADC <= tau gate, and the
    one-flag-per-id batch tail (groupBy min ts). Exactly the plan the
    streaming face runs (stream == batch pinned in
    tests/test_streaming.py); the DuckDB twin replays routing, encode,
    LUT, GLOBAL probe selection and the threshold from the registered
    tables. Returns (vec_id, ts_sec)."""
    emb = load_table(spark, sf_dir, "embeddings")
    coarse = ivf.seed_centroids(emb, "embedding", "vec_id", HIER_COARSE_IDS)
    subs = ivf.hier_codebook(emb, "embedding", "vec_id", coarse,
                             HIER_SUB_K).localCheckpoint(eager=True)
    codebooks = pq.pq_seed_codebooks(emb, "embedding", "vec_id", PQ_M,
                                     IVF_CENTROID_IDS)
    index = pq.pq_cell_index_hier(emb, "embedding", "vec_id", codebooks,
                                  coarse, subs)
    stream_batch = (emb.where(F.expr(PQ_HIER_STREAM_PRED))
                    .select("vec_id", "embedding",
                            F.timestamp_seconds(F.col("vec_id"))
                            .alias("ts")))
    out = pq.pq_collision_stream_hier(
        stream_batch, index, "embedding", "vec_id", codebooks, coarse,
        subs, tau_adc=PQ_HIER_COLLISION_TAU,
        route_probes=PQ_HIER_ROUTE_PROBES,
        global_n_probes=PQ_HIER_N_PROBES)
    return out.select("vec_id", F.col("ts").cast("long").alias("ts_sec"))


def _pq_hier_adc_ctes(qpred: str) -> str:
    """Shared WITH-body of the o77/o78 twins, through the `adc` CTE:
    o76's PQ encode/LUT CTEs (seed-slice sub-codebooks, per-(vector,
    subspace) argmin with (distance, code) tie-break, s-ascending ADC
    sum) under the o56/o64 two-level routing CTEs (coarse route by
    (distance, cid), per-route sub-seeds = the HIER_SUB_K smallest
    vec_ids, cell assignment by (distance, scid)); the probe set is the
    two-level GLOBAL selection — per query the PQ_HIER_ROUTE_PROBES
    nearest routes by (distance, cid), then the PQ_HIER_N_PROBES globally
    nearest sub-cells among them, tie-broken (distance, route, cell).
    ``qpred`` is the query-row predicate over the `vec_id` column (o77:
    the top-k query ids; o78: the streamed slice)."""
    sub = EMB_DIM // PQ_M
    cid_vals = ", ".join(f"({j}, {c})"
                         for j, c in enumerate(IVF_CENTROID_IDS))
    rids = ", ".join(map(str, HIER_COARSE_IDS))
    # coarse routing distance (full-dim, vs route centroid)
    diffr = "(CAST(e.embedding[i] AS DOUBLE) - CAST(c.cv[i] AS DOUBLE))"
    sqd_r = (f"list_sum(list_transform(range(1, {EMB_DIM} + 1), "
             f"i -> {diffr} * {diffr}))")
    # sub-cell assignment distance (full-dim, vs sub-seed row)
    diffs = ("(CAST(e.embedding[i] AS DOUBLE) "
             "- CAST(cs.embedding[i] AS DOUBLE))")
    sqd_s = (f"list_sum(list_transform(range(1, {EMB_DIM} + 1), "
             f"i -> {diffs} * {diffs}))")
    # query -> sub-seed distance (full-dim), for probe selection
    diffq = ("(CAST(q.embedding[i] AS DOUBLE) "
             "- CAST(cs.embedding[i] AS DOUBLE))")
    sqd_qs = (f"list_sum(list_transform(range(1, {EMB_DIM} + 1), "
              f"i -> {diffq} * {diffq}))")
    # PQ encode distance (subvector, vs seed slice)
    dsub = (f"(CAST(e.embedding[s.s * {sub} + i] AS DOUBLE) "
            f"- CAST(cp.cv[i] AS DOUBLE))")
    sqd_sub = (f"list_sum(list_transform(range(1, {sub} + 1), "
               f"i -> {dsub} * {dsub}))")
    # query LUT distance (subvector, vs seed slice)
    dq = (f"(CAST(q.embedding[s.s * {sub} + i] AS DOUBLE) "
          f"- CAST(cp.cv[i] AS DOUBLE))")
    sqd_q = (f"list_sum(list_transform(range(1, {sub} + 1), "
             f"i -> {dq} * {dq}))")
    return f"""
      WITH ords(j, cid) AS (VALUES {cid_vals}),
      seeds AS (SELECT o.j, o.cid, e.embedding AS sv
                FROM embeddings e JOIN ords o ON e.vec_id = o.cid),
      subsp AS (SELECT CAST(s AS INT) AS s FROM range({PQ_M}) t(s)),
      centsub AS (SELECT s.s, d.j,
                         list_slice(d.sv, s.s * {sub} + 1,
                                    (s.s + 1) * {sub}) AS cv
                  FROM seeds d, subsp s),
      cent AS (SELECT vec_id AS cid, embedding AS cv
               FROM embeddings WHERE vec_id IN ({rids})),
      dr AS (SELECT e.vec_id, c.cid, {sqd_r} AS sd
             FROM embeddings e, cent c),
      rrank AS (SELECT vec_id, cid, row_number() OVER
                    (PARTITION BY vec_id ORDER BY sd ASC, cid ASC) AS rn
                FROM dr),
      route AS (SELECT vec_id, cid AS route FROM rrank WHERE rn = 1),
      sub_seed AS (SELECT route, vec_id AS scid
                   FROM (SELECT route, vec_id, row_number() OVER
                           (PARTITION BY route ORDER BY vec_id ASC) AS rn
                         FROM route) WHERE rn <= {HIER_SUB_K}),
      d2 AS (SELECT r.vec_id, r.route, s.scid, {sqd_s} AS sd
             FROM route r
             JOIN embeddings e ON e.vec_id = r.vec_id
             JOIN sub_seed s ON s.route = r.route
             JOIN embeddings cs ON cs.vec_id = s.scid),
      assign AS (SELECT vec_id, route, scid::BIGINT AS cell
                 FROM (SELECT vec_id, route, scid, row_number() OVER
                         (PARTITION BY vec_id ORDER BY sd ASC, scid ASC)
                         AS rn
                       FROM d2) WHERE rn = 1),
      qroute AS (SELECT vec_id AS query_id, cid AS route FROM rrank
                 WHERE ({qpred})
                   AND rn <= {PQ_HIER_ROUTE_PROBES}),
      qcells AS (SELECT qr.query_id, qr.route, s.scid::BIGINT AS cell,
                        {sqd_qs} AS dd
                 FROM qroute qr
                 JOIN embeddings q ON q.vec_id = qr.query_id
                 JOIN sub_seed s ON s.route = qr.route
                 JOIN embeddings cs ON cs.vec_id = s.scid),
      qprobe AS (SELECT query_id, route, cell
                 FROM (SELECT query_id, route, cell, row_number() OVER
                         (PARTITION BY query_id
                          ORDER BY dd ASC, route ASC, cell ASC) AS rn
                       FROM qcells) WHERE rn <= {PQ_HIER_N_PROBES}),
      dsubt AS (SELECT e.vec_id, cp.s, cp.j, {sqd_sub} AS sd
                FROM embeddings e, centsub cp, subsp s WHERE s.s = cp.s),
      enc AS (SELECT vec_id, s, j AS code FROM
                (SELECT vec_id, s, j, row_number() OVER
                   (PARTITION BY vec_id, s ORDER BY sd ASC, j ASC) AS rn
                 FROM dsubt)
              WHERE rn = 1),
      lut AS (SELECT q.vec_id AS query_id, cp.s, cp.j, {sqd_q} AS ld
              FROM embeddings q, centsub cp, subsp s
              WHERE s.s = cp.s
                AND ({qpred.replace("vec_id", "q.vec_id")})),
      cand AS (SELECT p.query_id, a.vec_id AS neighbor_id
               FROM qprobe p JOIN assign a
                 ON a.route = p.route AND a.cell = p.cell
                AND a.vec_id <> p.query_id),
      adc AS (SELECT c.query_id, c.neighbor_id,
                     list_sum(list(l.ld ORDER BY en.s)) AS adc
              FROM cand c
              JOIN enc en ON en.vec_id = c.neighbor_id
              JOIN lut l ON l.query_id = c.query_id AND l.s = en.s
                        AND l.j = en.code
              GROUP BY c.query_id, c.neighbor_id)"""


def _oracle_pq_hier_topk() -> str:
    """Twin of o77 (`_pq_hier_adc_ctes` + the top-k tail). The store
    write/sort/read lifecycle has no SQL counterpart — its correctness IS
    what the value comparison checks."""
    qids = ", ".join(map(str, TOPK_QUERY_IDS))
    return _pq_hier_adc_ctes(f"vec_id IN ({qids})") + f"""
      SELECT query_id, neighbor_id, round(adc, {ROUND}) AS adc, rank
      FROM (SELECT *, row_number() OVER
                (PARTITION BY query_id ORDER BY adc ASC, neighbor_id ASC)
                AS rank
            FROM adc)
      WHERE rank <= {TOPK_K}"""


def _oracle_pq_hier_collisions() -> str:
    """Twin of o78 (`_pq_hier_adc_ctes` + the threshold tail): a streamed
    id is flagged iff some probed neighbor's UNROUNDED ADC is within
    PQ_HIER_COLLISION_TAU — the same unrounded compare the Spark face
    makes (LUT entries are bit-identical across engines per the o77
    parity, and both sum them s-ascending). ts_sec replays the batch
    face's min(ts): the gate stream carries one row per id with
    ts = timestamp_seconds(vec_id), so min(ts) as seconds IS vec_id."""
    return _pq_hier_adc_ctes(PQ_HIER_STREAM_PRED) + f"""
      SELECT query_id AS vec_id, query_id AS ts_sec
      FROM adc WHERE adc <= {PQ_HIER_COLLISION_TAU}
      GROUP BY query_id"""


def _oracle_image_phash_pairs(w: int = PHASH_W, h: int = PHASH_H,
                              gw: int = 9, gh: int = 8,
                              max_hamming: int = PHASH_MAX_HAMMING) -> str:
    """DuckDB twin of q_o73: build the identical fixed-size textured PPM
    payload, re-derive the 64-bit dHash from the sample bytes (per-pixel
    grayscale -> grid sums -> integer cross-multiplied comparisons ->
    bit_or packing; bit 63 via the min-long literal — 1<<63 overflows
    DuckDB's BIGINT), then exact all-pairs xor/bit_count."""
    nb = w * h * 3
    return f"""
      WITH src AS (
        SELECT doc_id::BIGINT AS media_id,
               regexp_replace(text, '[^ -~]', '', 'g') || 'x' AS clean
        FROM documents),
      hdr AS (
        SELECT media_id,
               substr(repeat(clean, ({nb} // length(clean) + 1)::INT),
                      1, {nb}) AS payload
        FROM src),
      px AS (
        SELECT media_id, i,
               (ascii(substr(payload, (3*i+1)::INT, 1))
                + ascii(substr(payload, (3*i+2)::INT, 1))
                + ascii(substr(payload, (3*i+3)::INT, 1)))::BIGINT AS gray
        FROM hdr, (SELECT unnest(range(0, {w * h})) AS i)),
      cells AS (
        SELECT media_id,
               (((i // {w}) * {gh}) // {h}) AS gy,
               (((i % {w}) * {gw}) // {w}) AS gx,
               sum(gray) AS s, count(*)::BIGINT AS c
        FROM px GROUP BY 1, 2, 3),
      bits AS (
        SELECT a.media_id, (a.gy * {gw - 1} + a.gx)::INT AS idx
        FROM cells a JOIN cells b
          ON a.media_id = b.media_id AND a.gy = b.gy AND b.gx = a.gx + 1
        WHERE a.s * b.c > b.s * a.c),
      ph AS (
        SELECT h.media_id,
               coalesce(bit_or(CASE WHEN idx = 63
                                    THEN (-9223372036854775807 - 1)::BIGINT
                                    ELSE (1::BIGINT << idx) END),
                        0) AS phash
        FROM hdr h LEFT JOIN bits USING (media_id)
        GROUP BY h.media_id)
      SELECT a.media_id AS id_a, b.media_id AS id_b,
             bit_count(xor(a.phash, b.phash))::BIGINT AS hamming
      FROM ph a JOIN ph b ON a.media_id < b.media_id
      WHERE bit_count(xor(a.phash, b.phash)) <= {max_hamming}"""


OPERATOR_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "o01_exact_dedup": q_o01_exact_dedup,
    "o03_lsh_pairs": q_o03_lsh_pairs,
    "o04_simhash": q_o04_simhash,
    "o05_ngram_jaccard": q_o05_ngram_jaccard,
    "o06_cosine_pairs": q_o06_cosine_pairs,
    "o07_cosine_topk": q_o07_cosine_topk,
    "o08_lsh_topk": q_o08_lsh_topk,
    "o15_ann_topk": q_o15_ann_topk,
    "o16_ivf_topk": q_o16_ivf_topk,
    "o17_lsh_pairs_guard": q_o17_lsh_pairs_guard,
    "o18_ann_topk_guard": q_o18_ann_topk_guard,
    "o21_dedup_clusters": q_o21_dedup_clusters,
    "o40_cluster_sizes": q_o40_cluster_sizes,
    "o23_cosine_lsh_pairs": q_o23_cosine_lsh_pairs,
    "o24_asof_join": q_o24_asof_join,
    "o33_interval_join": q_o33_interval_join,
    "o25_doc_chunks": q_o25_doc_chunks,
    "o26_stratified_sample": q_o26_stratified_sample,
    "o51_pack_sequences": q_o51_pack_sequences,
    "o52_rebalance_mixture": q_o52_rebalance_mixture,
    "o34_weighted_sample": q_o34_weighted_sample,
    "o35_group_quantiles": q_o35_group_quantiles,
    "o36_numeric_profile": q_o36_numeric_profile,
    "o37_skew_report": q_o37_skew_report,
    "o39_vocabulary": q_o39_vocabulary,
    "o38_snapshot_diff": q_o38_snapshot_diff,
    "o22_dedup_apply": q_o22_dedup_apply,
    "o27_decontaminate": q_o27_decontaminate,
    "o28_pii_redact": q_o28_pii_redact,
    "o29_repetition": q_o29_repetition,
    "o30_tfidf_topk": q_o30_tfidf_topk,
    "o32_doc_profile": q_o32_doc_profile,
    "o41_corpus_report": q_o41_corpus_report,
    "o09_token_counts": q_o09_token_counts,
    "o20_bpe_tokens": q_o20_bpe_tokens,
    "o10_lang_id": q_o10_lang_id,
    "o11_quality": q_o11_quality,
    "o12_fingerprint": q_o12_fingerprint,
    "o13_media_features": q_o13_media_features,
    "o14_frame_sample": q_o14_frame_sample,
    "o19_ppm_decode": q_o19_ppm_decode,
    "o31_ppm_pixels": q_o31_ppm_pixels,
    "o42_kmv_distinct": q_o42_kmv_distinct,
    "o43_hll_distinct": q_o43_hll_distinct,
    "o45_semdedup_apply": q_o45_semdedup_apply,
    "o57_semdedup_hier_apply": q_o57_semdedup_hier_apply,
    "o46_line_dedup": q_o46_line_dedup,
    "o47_bloom_semi_join": q_o47_bloom_semi_join,
    "o48_approx_quantiles": q_o48_approx_quantiles,
    "o53_group_top_values": q_o53_group_top_values,
    "o54_unigram_xent": q_o54_unigram_xent,
    "o55_random_projection": q_o55_random_projection,
    "o49_fuzzy_decon": q_o49_fuzzy_decon,
    "o50_incremental_dedup": q_o50_incremental_dedup,
    "o58_bigram_pmi": q_o58_bigram_pmi,
    "o59_band_index_merge": q_o59_band_index_merge,
    "o60_semdedup_gram_pairs": q_o60_semdedup_gram_pairs,
    "o62_shard_shuffle": q_o62_shard_shuffle,
    "o63_semdedup_incremental": q_o63_semdedup_incremental,
    "o64_semdedup_incr_hier": q_o64_semdedup_incr_hier,
    "o65_simhash_pairs": q_o65_simhash_pairs,
    "o66_duplicate_spans": q_o66_duplicate_spans,
    "o67_xent_buckets": q_o67_xent_buckets,
    "o68_curation_funnel": q_o68_curation_funnel,
    "o70_remove_dup_spans": q_o70_remove_dup_spans,
    "o71_temperature_mix": q_o71_temperature_mix,
    "o72_kmv_threshold": q_o72_kmv_threshold,
    "o73_image_phash_pairs": q_o73_image_phash_pairs,
    "o74_cell_store_probe": q_o74_cell_store_probe,
    "o75_semdedup_multiprobe": q_o75_semdedup_multiprobe,
    "o76_pq_topk": q_o76_pq_topk,
    "o77_pq_hier_topk": q_o77_pq_hier_topk,
    "o78_pq_hier_collisions": q_o78_pq_hier_collisions,
    # round-15 addition (slot from the o56 retirement — see the RETIRED
    # note at its former site)
    "o79_band_ingest_loop": q_o79_band_ingest_loop,
}

OPERATOR_ORACLES: dict[str, str] = {
    "o01_exact_dedup": (
        f"SELECT {sql_hash64('text')} AS content_hash, "
        f"min(doc_id)::BIGINT AS keep_id, count(*)::BIGINT AS n_copies "
        f"FROM documents GROUP BY 1"),
    "o03_lsh_pairs": _oracle_lsh_pairs(),
    "o04_simhash": _oracle_simhash(),
    "o05_ngram_jaccard": _oracle_ngram_jaccard(),
    "o06_cosine_pairs": _oracle_cosine_pairs(),
    "o07_cosine_topk": _oracle_cosine_topk(),
    "o08_lsh_topk": _oracle_lsh_topk(),
    "o15_ann_topk": _oracle_ann_topk(),
    "o16_ivf_topk": _oracle_ivf_topk(),
    "o17_lsh_pairs_guard": _oracle_lsh_pairs(max_bucket=GUARD_LSH_MAX_BUCKET),
    "o18_ann_topk_guard": _oracle_ann_topk(max_bucket=GUARD_ANN_MAX_BUCKET),
    "o21_dedup_clusters": _oracle_dedup_clusters(),
    "o40_cluster_sizes": _oracle_cluster_sizes(),
    "o23_cosine_lsh_pairs": _oracle_cosine_lsh_pairs(),
    "o24_asof_join": _oracle_asof_join(),
    "o33_interval_join": _oracle_interval_join(),
    "o25_doc_chunks": text.sql_chunk_documents("documents", "text", "doc_id",
                                               CHUNK_SIZE, CHUNK_STRIDE),
    "o26_stratified_sample": _oracle_stratified_sample(),
    "o51_pack_sequences": text.sql_pack_sequences(
        "documents", "text", "doc_id", PACK_TARGET, PACK_SHARDS),
    "o52_rebalance_mixture": sampling.sql_rebalance_to_mixture(
        "documents", "doc_id", "source", MIXTURE_TARGETS,
        "d.doc_id::BIGINT AS doc_id, d.source AS source"),
    "o34_weighted_sample": _oracle_weighted_sample(),
    "o35_group_quantiles": stats.sql_group_quantiles(
        "lineitem", PROFILE_KEYS, "l_extendedprice", QUANTILE_QS),
    "o36_numeric_profile": stats.sql_profile_numeric(
        "lineitem", PROFILE_KEYS, "l_extendedprice"),
    "o37_skew_report": stats.sql_skew_report("events", ["user_id"],
                                             SKEW_TOP_N),
    "o38_snapshot_diff": _oracle_snapshot_diff(),
    "o39_vocabulary": corpus.sql_vocabulary("documents", "text", "doc_id"),
    "o22_dedup_apply": _oracle_dedup_apply(),
    "o27_decontaminate": corpus.sql_decontaminate(
        "documents", "text", "doc_id",
        f"doc_id % {DECON_BENCH_MOD} = {DECON_BENCH_REM}"),
    "o28_pii_redact": _oracle_pii_redact(),
    "o29_repetition": corpus.sql_repetition_metrics(
        "documents", "text", "doc_id"),
    "o30_tfidf_topk": corpus.sql_tfidf_topk("documents", "text", "doc_id"),
    "o32_doc_profile": _oracle_doc_profile(),
    "o41_corpus_report": _oracle_corpus_report(),
    "o09_token_counts": text.sql_token_counts("documents", "text", "doc_id"),
    "o10_lang_id": text.sql_lang_id("documents", "text", "doc_id"),
    "o11_quality": text.sql_quality_score("documents", "text", "doc_id"),
    "o12_fingerprint": text.sql_fingerprint("documents", "text", "doc_id"),
    "o13_media_features": (
        "SELECT doc_id::BIGINT AS media_id, "
        "octet_length(encode(text))::BIGINT AS n_bytes, "
        "(octet_length(encode(text)) % 640)::INT AS width, "
        "((octet_length(encode(text)) * 7) % 480)::INT AS height, "
        "(octet_length(encode(text)) % 4 + 1)::INT AS channels, "
        "'fake' AS format "
        "FROM documents"),
    "o19_ppm_decode": _oracle_ppm_decode(),
    "o20_bpe_tokens": _oracle_bpe_tokens(),
    "o31_ppm_pixels": _oracle_ppm_pixels(),
    "o14_frame_sample": (
        "SELECT doc_id::BIGINT AS media_id, "
        "unnest(range(0, greatest(octet_length(encode(text)) - 1, 0) + 1, 64))::BIGINT "
        "AS frame_offset, substr(hex(encode(text)), 1, 16) AS frame_preview "
        "FROM documents"),
    "o42_kmv_distinct": sketches.sql_kmv_distinct(
        "lineitem", SKETCH_GROUP, SKETCH_VALUE, KMV_K),
    # o72 shares o42's twin: both KMV kernels return the exact k
    # smallest distinct hashes
    "o72_kmv_threshold": sketches.sql_kmv_distinct(
        "lineitem", SKETCH_GROUP, SKETCH_VALUE, KMV_K),
    "o43_hll_distinct": sketches.sql_hll_distinct(
        "lineitem", SKETCH_GROUP, SKETCH_VALUE, HLL_P),
    "o45_semdedup_apply": _oracle_semdedup("apply"),
    "o57_semdedup_hier_apply": _oracle_semdedup_hier("apply"),
    "o46_line_dedup": _oracle_line_dedup(),
    "o47_bloom_semi_join": _oracle_bloom_semi_join(),
    "o48_approx_quantiles": stats.sql_approx_group_quantiles(
        "lineitem", PROFILE_KEYS, "l_extendedprice", QUANTILE_QS,
        APPROXQ_KEY, APPROXQ_RATE),
    "o53_group_top_values": stats.sql_group_top_values(
        "lineitem", ["l_returnflag"], "l_quantity", TOPVAL_K),
    "o54_unigram_xent": corpus.sql_unigram_xent(
        "documents", "text", "doc_id", XENT_SMOOTH_K),
    "o55_random_projection": f"""
      WITH {similarity.sql_random_projection_cte(
          "embeddings", "embedding", "vec_id", RP_OUT_DIM, EMB_DIM,
          RP_SEED)}
      SELECT vec_id::BIGINT AS vec_id, (i - 1)::BIGINT AS dim,
             y[i] AS val
      FROM rp, (SELECT unnest(range(1, {RP_OUT_DIM + 1})) AS i)""",
    "o49_fuzzy_decon": _oracle_fuzzy_decon(),
    "o50_incremental_dedup": _oracle_incremental_dedup(),
    "o58_bigram_pmi": corpus.sql_bigram_pmi("documents", "text", "doc_id"),
    "o59_band_index_merge": _oracle_band_index_merge(),
    # the gram-kernel faces share the expression faces' oracles: the
    # ROUND-digit rounding absorbs the BLAS last-ulp difference
    "o60_semdedup_gram_pairs": _oracle_semdedup("pairs"),
    "o62_shard_shuffle": _sql_shard_shuffle_oracle(),
    "o63_semdedup_incremental": _oracle_semdedup_incremental(),
    "o64_semdedup_incr_hier": _oracle_semdedup_incr_hier(),
    "o65_simhash_pairs": _oracle_simhash_pairs(),
    "o66_duplicate_spans": _oracle_duplicate_spans(),
    "o67_xent_buckets": _oracle_xent_buckets(),
    "o68_curation_funnel": _oracle_curation_funnel(),
    "o70_remove_dup_spans": _oracle_remove_dup_spans(),
    "o71_temperature_mix": _oracle_temperature_mix(),
    "o73_image_phash_pairs": _oracle_image_phash_pairs(),
    "o74_cell_store_probe": _oracle_cell_store_probe(),
    "o75_semdedup_multiprobe": _oracle_semdedup_multiprobe(),
    "o76_pq_topk": _oracle_pq_topk(),
    "o77_pq_hier_topk": _oracle_pq_hier_topk(),
    "o78_pq_hier_collisions": _oracle_pq_hier_collisions(),
    "o79_band_ingest_loop": _oracle_band_ingest_loop(),
}
