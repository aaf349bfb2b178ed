"""Seeded-RNG property tests for the round-4 additions (the repo's
bounded alternative to hypothesis — one Spark round-trip per property,
many random cases inside it)."""

import random

from pyspark.sql import Row, functions as F

from relationaldecomposition_spark.operators import bloom, corpus, sketches

SEED = 20260814


def test_sketches_depend_only_on_distinct_values(spark):
    """Duplicating rows must not move either estimator: KMV and HLL are
    functions of the distinct value set alone."""
    rng = random.Random(SEED)
    base = [Row(g=f"g{i % 3}", v=rng.randrange(10_000))
            for i in range(300)]
    dup = base + [Row(g=r.g, v=r.v) for r in base for _ in range(2)]
    a, b = spark.createDataFrame(base), spark.createDataFrame(dup)
    for fn, arg in ((sketches.kmv_distinct, 32), (sketches.hll_distinct, 6)):
        ra = sorted(map(tuple, fn(a, ["g"], "v", arg).collect()))
        rb = sorted(map(tuple, fn(b, ["g"], "v", arg).collect()))
        assert ra == rb, fn.__name__


def test_kmv_exact_below_k_many_cases(spark):
    """Any group with < k distinct values reports the exact count."""
    rng = random.Random(SEED + 1)
    rows, want = [], {}
    for g in range(20):
        nd = rng.randrange(1, 40)  # < k = 64
        want[f"g{g}"] = nd
        vals = rng.sample(range(100_000), nd)
        rows += [Row(g=f"g{g}", v=v) for v in vals
                 for _ in range(rng.randrange(1, 4))]
    out = {r["g"]: r["est_distinct"] for r in
           sketches.kmv_distinct(spark.createDataFrame(rows), ["g"], "v",
                                 k=64).collect()}
    assert out == {g: float(n) for g, n in want.items()}


def test_bloom_no_false_negatives_random_keysets(spark):
    rng = random.Random(SEED + 2)
    keys = rng.sample(range(1_000_000), 400)
    members = keys[:150]
    small = spark.createDataFrame([Row(k=x) for x in members])
    big = spark.createDataFrame([Row(k=x) for x in keys])
    surv = {r[0] for r in
            bloom.bloom_semi_join(big, "k", small, "k",
                                  m_bits=2048, k=4).collect()}
    assert set(members) <= surv


def test_line_dedup_structural_invariants(spark):
    """For random documents: n_lines always equals the split length,
    n_removed counts exactly the removed lines, and clean_text is the
    in-order subsequence of surviving lines."""
    rng = random.Random(SEED + 3)
    vocab = ["aa", "bb", "cc", "dd"]
    docs = []
    for i in range(40):
        lines = [" ".join(rng.choices(vocab, k=rng.randrange(1, 3)))
                 for _ in range(rng.randrange(1, 6))]
        docs.append(Row(doc_id=i, text="\n".join(lines)))
    df = spark.createDataFrame(docs)
    freq = {}
    for d in docs:
        for ln in set(d.text.split("\n")):
            if ln.strip():
                freq[ln] = freq.get(ln, 0) + 1
    boil = {ln for ln, c in freq.items() if c >= 2}
    out = {r["doc_id"]: r for r in
           corpus.line_dedup(df, "text", "doc_id", min_doc_freq=2).collect()}
    for d in docs:
        lines = d.text.split("\n")
        keep = [ln for ln in lines if not (ln.strip() and ln in boil)]
        r = out[d.doc_id]
        assert r["n_lines"] == len(lines)
        assert r["n_removed"] == len(lines) - len(keep)
        assert r["clean_text"] == "\n".join(keep)


def test_fuzzy_decon_subset_of_union_lsh(spark):
    """Every flagged doc must have a band-collision witness: fuzzy_decon
    over (corpus, bench) can never flag a doc that the raw union LSH has
    no cross-parity pair for."""
    from relationaldecomposition_spark.operators.dedup import (
        lsh_candidate_pairs)

    rng = random.Random(SEED + 4)
    vocab = [f"w{i}" for i in range(30)]
    mk = lambda: " ".join(rng.choices(vocab, k=12))  # noqa: E731
    texts = [mk() for _ in range(30)]
    corpus_rows = [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    bench_rows = [Row(doc_id=i, text=texts[i]) for i in range(0, 30, 5)]
    cdf, bdf = (spark.createDataFrame(corpus_rows),
                spark.createDataFrame(bench_rows))
    out = corpus.fuzzy_decontaminate(cdf, "text", "doc_id", bdf,
                                     min_est=0.5)
    flagged = {r["doc_id"] for r in out.collect() if r["contaminated"]}
    u = cdf.select((F.col("doc_id") * 2).alias("_uid"),
                   F.col("text").alias("_t")).unionByName(
        bdf.select((F.col("doc_id") * 2 + 1).alias("_uid"),
                   F.col("text").alias("_t")))
    raw = lsh_candidate_pairs(u, "_t", "_uid", min_est=0.5)
    witness = {int(c // 2)
               for a, b in ((r["id_a"], r["id_b"]) for r in raw.collect())
               if a % 2 != b % 2
               for c in [a if a % 2 == 0 else b]}
    assert flagged <= witness
    # the exact benchmark copies must all be flagged
    assert {0, 5, 10, 15, 20, 25} <= flagged


def test_pack_sequences_randomized_parity(spark):
    """Random token-length corpora, several (target, shards) configs: the
    operator must equal the Python greedy recompute exactly, and every
    bin prefix must respect the budget (a bin's docs beyond the first
    start strictly inside the target)."""
    from relationaldecomposition_spark.operators.text import pack_sequences

    rng = random.Random(SEED + 10)
    rows = [(i, " ".join("w" for _ in range(rng.randrange(0, 40))))
            for i in range(300)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    for target, shards in ((32, 1), (64, 8), (17, 5)):
        got = {r["doc_id"]: r for r in pack_sequences(
            df, "text", "doc_id", target, shards).collect()}
        per_shard = {}
        for i, t in rows:
            per_shard.setdefault(i % shards, []).append((i, len(t.split())))
        for sh, docs in per_shard.items():
            cum = 0
            for did, ntok in sorted(docs):
                r = got[did]
                assert (r["shard"], r["tokens"]) == (sh, ntok)
                assert r["bin_id"] == cum // target
                assert r["bin_offset"] == cum % target
                cum += ntok
        assert all(0 <= r["bin_offset"] < target for r in got.values())


def test_rebalance_mixture_converges_to_targets(spark):
    """On a large skewed corpus the surviving mixture must be within a few
    percent of the requested proportions (hash-threshold quantization is
    the only slack), and re-running is deterministic."""
    rng = random.Random(SEED + 11)
    sizes = {"web": 4000, "code": 900, "books": 400, "junk": 500}
    rows, nid = [], 0
    for src, n in sizes.items():
        for _ in range(n):
            rows.append((nid, src)); nid += 1
    rng.shuffle(rows)
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    targets = {"web": 0.6, "code": 0.25, "books": 0.15}
    from relationaldecomposition_spark.operators.sampling import (
        rebalance_to_mixture)
    out = rebalance_to_mixture(df, "doc_id", "source", targets)
    got = {r["source"]: r["n"] for r in
           out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    total = sum(got.values())
    # books binds the cap: 400/0.15 = 2667 target total
    assert "junk" not in got
    for s, p in targets.items():
        assert abs(got[s] / total - p) < 0.05, (s, got, total)
    again = {r["source"]: r["n"] for r in
             rebalance_to_mixture(df, "doc_id", "source", targets)
             .groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert got == again


def test_simhash_pairs_pigeonhole_exact_random_corpora(spark):
    """Round-8: on random word-salad corpora (dense near-dup structure
    from a small vocab), the pigeonhole join equals the exact all-pairs
    hamming filter for every (max_hamming, n_blocks) shape tried —
    including n_blocks > max_hamming + 1 (extra blocks stay lossless,
    only candidate counts change)."""
    from relationaldecomposition_spark.operators import dedup

    rng = random.Random(SEED + 8)
    vocab = [f"w{i}" for i in range(12)]
    rows = [Row(doc_id=i,
                text=" ".join(rng.choice(vocab)
                              for _ in range(rng.randrange(0, 14))))
            for i in range(60)]
    df = spark.createDataFrame(rows)
    sigs = {r["doc_id"]: r["simhash"]
            for r in dedup.simhash(df, "text", "doc_id").collect()}
    ids = sorted(sigs)

    def ham(a, b):
        return bin(a ^ b).count("1")

    for max_h, nb in ((2, None), (4, None), (4, 8), (1, 16)):
        expected = {(a, b) for i, a in enumerate(ids) for b in ids[i + 1:]
                    if ham(sigs[a], sigs[b]) <= max_h}
        got = {(r["id_a"], r["id_b"]) for r in
               dedup.simhash_pairs(df, "text", "doc_id", max_hamming=max_h,
                                   n_blocks=nb).collect()}
        assert got == expected, (max_h, nb)


def test_duplicate_spans_structural_invariants(spark):
    """Round-8: for random token documents, 0 <= n_dup_spans <= n_spans,
    n_spans = max(0, n_tokens - k + 1), dup_ratio = n_dup/n_spans, and
    duplicating a DOCUMENT wholesale flags every span of both copies."""
    from relationaldecomposition_spark.operators import dedup

    rng = random.Random(SEED + 9)
    k = 5
    rows = [(i, " ".join(f"t{rng.randrange(200)}"
                         for _ in range(rng.randrange(0, 30))))
            for i in range(40)]
    rows += [(100 + i, rows[i][1]) for i in range(5)]  # exact doc copies
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r["doc_id"]: r for r in
           dedup.duplicate_spans(df, "text", "doc_id",
                                 shingle_k=k).collect()}
    for did, txt in rows:
        n_tok = len(txt.split())
        r = out[did]
        assert r["n_spans"] == max(0, n_tok - k + 1), did
        assert 0 <= r["n_dup_spans"] <= r["n_spans"], did
        if r["n_spans"]:
            assert r["dup_ratio"] == round(
                r["n_dup_spans"] / r["n_spans"], 6), did
        else:
            assert r["dup_ratio"] == 0.0
    for i in range(5):
        if out[i]["n_spans"]:
            assert out[i]["n_dup_spans"] == out[i]["n_spans"], i
            assert out[100 + i]["n_dup_spans"] == out[100 + i]["n_spans"]


def test_xent_buckets_partition_properties(spark):
    """Round-8: buckets partition each language's scored docs; bucket is
    monotone in xent within a language; sizes are within one histogram
    bin of n/k; languages never mix."""
    from relationaldecomposition_spark.operators.corpus import (
        xent_quality_buckets)

    rng = random.Random(SEED + 10)
    rows = []
    for i in range(120):
        lang = rng.choice(["aa", "bb", "cc"])
        toks = [f"{lang}{rng.randrange(30)}"
                for _ in range(rng.randrange(1, 12))]
        rows.append((i, " ".join(toks), lang))
    df = spark.createDataFrame(rows, "doc_id bigint, text string, lang string")
    k = 4
    out = [r for r in xent_quality_buckets(df, "text", "doc_id", "lang",
                                           k).collect()]
    assert len(out) == len(rows)
    by_lang: dict[str, list] = {}
    for r in out:
        assert r["bucket"] is not None and 1 <= r["bucket"] <= k
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, rs in by_lang.items():
        rs.sort(key=lambda r: (r["xent"], r["doc_id"]))
        buckets = [r["bucket"] for r in rs]
        assert buckets == sorted(buckets), lang  # monotone in xent
