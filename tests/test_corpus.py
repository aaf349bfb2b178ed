"""Corpus-hygiene operators (operators/corpus.py): brute-force Python
oracles on hand-built fixtures + plan shape checks. The driver's DuckDB
oracle gate covers the same operators at sf0.01 (o27-o30)."""

import math

import pytest

from pyspark.sql import Row, functions as F

from relationaldecomposition_spark.operators import corpus


def _docs(spark, rows):
    return spark.createDataFrame([Row(doc_id=i, text=t)
                                  for i, t in enumerate(rows)])


FIX = [
    "the quick brown fox jumps over the lazy dog",          # 0
    "the quick brown fox sat on the mat",                   # 1: shares 3-grams with 0
    "completely different words here entirely",             # 2
    "",                                                     # 3: empty
    "one two",                                              # 4: < k tokens, no shingles
    "spam spam spam spam spam spam spam spam",              # 5: repetitive
]


def _shingles(text, k=3):
    toks = text.split()
    return {" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)}


class TestDecontaminate:
    def test_matches_python_oracle(self, spark):
        docs = _docs(spark, FIX)
        bench = docs.where(F.col("doc_id") == 0)
        out = {r["doc_id"]: r for r in
               corpus.decontaminate(docs, "text", "doc_id", bench).collect()}
        bench_sh = _shingles(FIX[0])
        assert len(out) == len(FIX)
        for i, t in enumerate(FIX):
            sh = _shingles(t)
            hits = len(sh & bench_sh)
            assert out[i]["n_shingles"] == len(sh)
            assert out[i]["n_hits"] == hits
            exp_frac = hits / len(sh) if sh else 0.0
            assert out[i]["overlap_frac"] == pytest.approx(exp_frac, abs=1e-6)
            assert out[i]["contaminated"] == int(exp_frac >= corpus.DECON_TAU)
        # doc 0 is the benchmark itself -> fully contaminated
        assert out[0]["overlap_frac"] == 1.0 and out[0]["contaminated"] == 1
        # doc 1 shares 'the quick brown'/'quick brown fox' with the benchmark
        assert out[1]["n_hits"] == 2
        # shingle-less docs report zeros, not missing rows
        assert out[3]["n_shingles"] == 0 and out[4]["n_shingles"] == 0

    def test_benchmark_side_is_broadcast(self, spark):
        docs = _docs(spark, FIX)
        bench = docs.where(F.col("doc_id") == 0)
        plan = corpus.decontaminate(docs, "text", "doc_id", bench) \
                     ._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan


class TestPii:
    def test_counts_and_redaction(self, spark):
        rows = [
            "mail me at alice.smith+x@corp.example.org today",
            "call 555-123-4567 or 555-999-0000",
            "server at 192.168.0.1 and 10.0.255.7",
            "clean text with no pii at all",
            "mixed bob@x.io 111-222-3333 127.0.0.1",
        ]
        out = {r["doc_id"]: r for r in
               corpus.pii_scan(_docs(spark, rows), "text", "doc_id").collect()}
        assert (out[0]["n_email"], out[0]["n_phone"], out[0]["n_ipv4"]) == (1, 0, 0)
        assert (out[1]["n_email"], out[1]["n_phone"]) == (0, 2)
        assert out[2]["n_ipv4"] == 2
        assert (out[3]["n_email"], out[3]["n_phone"], out[3]["n_ipv4"]) == (0, 0, 0)
        assert out[3]["redacted"] == rows[3]
        assert out[4]["redacted"] == "mixed [EMAIL] [PHONE] [IPV4]"
        assert "[EMAIL]" in out[0]["redacted"]
        assert "alice" not in out[0]["redacted"]

    def test_map_only_plan(self, spark):
        df = _docs(spark, ["a@b.co"])
        plan = corpus.pii_scan(df, "text", "doc_id") \
                     ._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan

    def test_synthetic_injection_is_detected(self, spark):
        docs = _docs(spark, ["base text"] * 40) \
            .withColumn("doc_id", F.col("doc_id").cast("long"))
        aug = corpus.with_synthetic_pii(docs, "text", "doc_id")
        out = {r["doc_id"]: r for r in
               corpus.pii_scan(aug, "text", "doc_id").collect()}
        for i in range(40):
            assert out[i]["n_email"] == (1 if i % 3 == 0 else 0)
            assert out[i]["n_phone"] == (1 if i % 5 == 0 else 0)
            assert out[i]["n_ipv4"] == (1 if i % 7 == 0 else 0)


class TestRepetition:
    def test_matches_python_oracle(self, spark):
        out = {r["doc_id"]: r for r in
               corpus.repetition_metrics(_docs(spark, FIX), "text",
                                         "doc_id").collect()}
        from collections import Counter
        for i, t in enumerate(FIX):
            toks = t.split()
            grams = [" ".join(toks[j:j + 2]) for j in range(len(toks) - 1)]
            exp_dup = 1 - len(set(toks)) / len(toks) if toks else 0.0
            exp_top = (max(Counter(grams).values()) / len(grams)
                       if grams else 0.0)
            assert out[i]["n_tokens"] == len(toks)
            assert out[i]["dup_token_frac"] == pytest.approx(exp_dup, abs=1e-6)
            assert out[i]["top_ngram_frac"] == pytest.approx(exp_top, abs=1e-6)
            assert out[i]["repetitive"] == int(exp_top > corpus.REP_TOP_FRAC_MAX)
        assert out[5]["repetitive"] == 1       # 'spam spam' dominates
        # long-enough all-distinct text stays under the threshold (short
        # docs trip it by construction: few bigrams -> high mode share,
        # the documented caveat of the Gopher rule without a length floor)
        assert out[0]["repetitive"] == 0


class TestTfidf:
    def test_matches_python_oracle(self, spark):
        rows = ["apple banana apple cherry",
                "banana cherry cherry date",
                "apple date elderberry elderberry elderberry"]
        out = corpus.tfidf_topk(_docs(spark, rows), "text", "doc_id",
                                k=2).collect()
        from collections import Counter
        n = len(rows)
        tf = [Counter(r.split()) for r in rows]
        dfreq = Counter(t for c in tf for t in c)
        exp = {}
        for i, c in enumerate(tf):
            scored = sorted(((round(cnt * math.log(n / dfreq[t]), 6), t)
                             for t, cnt in c.items()),
                            key=lambda s: (-s[0], s[1]))
            exp[i] = [(t, s) for s, t in scored[:2]]
        got = {}
        for r in sorted(out, key=lambda r: (r["doc_id"], r["rank"])):
            got.setdefault(r["doc_id"], []).append((r["token"], r["tfidf"]))
        assert got == {i: [(t, pytest.approx(s, abs=1e-6)) for t, s in v]
                       for i, v in exp.items()}

    def test_ubiquitous_token_scores_zero(self, spark):
        rows = ["common alpha", "common beta", "common gamma"]
        out = corpus.tfidf_topk(_docs(spark, rows), "text", "doc_id", k=2) \
                    .collect()
        by_doc = {}
        for r in out:
            by_doc.setdefault(r["doc_id"], {})[r["token"]] = r["tfidf"]
        for i in range(3):
            assert by_doc[i]["common"] == 0.0
        # the distinctive token outranks the ubiquitous one in every doc
        assert all(r["rank"] == 1 and r["token"] != "common"
                   for r in out if r["rank"] == 1)

    def test_empty_docs_produce_no_rows(self, spark):
        out = corpus.tfidf_topk(_docs(spark, ["", "word"]), "text",
                                "doc_id").collect()
        assert {r["doc_id"] for r in out} == {1}


class TestStreamingParity:
    def test_pii_scan_batch_equals_stream(self, spark, tmp_path):
        """pii_scan is map-only, so the SAME call runs unmodified on a
        streaming frame (the 'streams are the same plan' invariant) — a
        streaming corpus can be redacted on ingest with zero extra code."""
        rows = ["write to a@b.co", "dial 555-123-4567", "plain text",
                "at 10.0.0.1 now"]
        batch = _docs(spark, rows)
        src = str(tmp_path / "pii_src")
        batch.write.parquet(src)
        stream = spark.readStream.schema(batch.schema).parquet(src)
        out = corpus.pii_scan(stream, "text", "doc_id")
        assert out.isStreaming
        q = (out.writeStream.format("memory").queryName("pii_stream")
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(120)
        got = {r["doc_id"]: r for r in
               spark.sql("SELECT * FROM pii_stream").collect()}
        exp = {r["doc_id"]: r for r in
               corpus.pii_scan(batch, "text", "doc_id").collect()}
        assert len(got) == len(exp)
        for i in exp:
            assert got[i] == exp[i]



    def test_doc_profile_batch_equals_stream(self, spark, tmp_path):
        """The fused one-scan profile is map-only, so the SAME call runs
        unmodified on a streaming source — profile-on-ingest with zero
        extra code (the 'streams are the same plan' invariant for the
        flagship fused operator)."""
        batch = _docs(spark, FIX)
        src = str(tmp_path / "profile_src")
        batch.write.parquet(src)
        stream = spark.readStream.schema(batch.schema).parquet(src)
        out = corpus.document_profile(stream, "text", "doc_id")
        assert out.isStreaming
        q = (out.writeStream.format("memory").queryName("profile_stream")
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(120)
        got = {r["doc_id"]: r for r in
               spark.sql("SELECT * FROM profile_stream").collect()}
        exp = {r["doc_id"]: r for r in
               corpus.document_profile(batch, "text", "doc_id").collect()}
        assert got == exp


class TestDocumentProfile:
    def test_equals_individual_operators(self, spark):
        from relationaldecomposition_spark.operators import text as t
        docs = _docs(spark, FIX)
        prof = {r["doc_id"]: r for r in
                corpus.document_profile(docs, "text", "doc_id").collect()}
        tok = {r["doc_id"]: r for r in
               t.token_counts(docs, "text", "doc_id").collect()}
        qual = {r["doc_id"]: r for r in
                t.quality_score(docs, "text", "doc_id").collect()}
        fp = {r["doc_id"]: r for r in
              t.fingerprint(docs, "text", "doc_id").collect()}
        lang = {r["doc_id"]: r for r in
                t.lang_id(docs, "text", "doc_id").collect()}
        pii = {r["doc_id"]: r for r in
               corpus.pii_scan(docs, "text", "doc_id").collect()}
        for i in prof:
            p = prof[i]
            assert p["ws_tokens"] == tok[i]["ws_tokens"]
            assert p["bpe_tokens"] == tok[i]["bpe_tokens"]
            assert p["n_chars"] == tok[i]["n_chars"]
            assert p["quality"] == qual[i]["quality"]
            assert p["fingerprint"] == fp[i]["fingerprint"]
            assert p["pred_lang"] == lang[i]["pred_lang"]
            for c in ("n_email", "n_phone", "n_ipv4"):
                assert p[c] == pii[i][c]

    def test_null_text_row_tolerated(self, spark):
        """ADVICE r11: a NULL text row must not crash the fused Arrow
        kernel (len(pat.findall(None)) raised TypeError) and bpe_tokens
        must keep NULL parity with the JVM regexp_count face it replaced
        — on BOTH the batch fused UDF and the stream-face fp_bpe kernel."""
        from relationaldecomposition_spark.operators import text as t
        docs = spark.createDataFrame(
            [Row(doc_id=1, text="hello world, test!"),
             Row(doc_id=2, text=None)])
        prof = {r["doc_id"]: r for r in
                corpus.document_profile(docs, "text", "doc_id").collect()}
        tok = {r["doc_id"]: r for r in
               t.token_counts(docs, "text", "doc_id").collect()}
        assert prof[2]["bpe_tokens"] is None
        assert tok[2]["bpe_tokens"] is None
        assert prof[1]["bpe_tokens"] == tok[1]["bpe_tokens"] > 0
        fb = {r["doc_id"]: r["fb"] for r in docs.select(
            "doc_id", t.fp_bpe_arrow_col(F.col("text")).alias("fb"))
            .collect()}
        assert fb[2]["bpe_tokens"] is None
        assert fb[1]["bpe_tokens"] == tok[1]["bpe_tokens"]

    def test_fused_plan_never_shuffles_text(self, spark):
        """Fusion invariant (round-6 form): with both vectorized kernels
        (Arrow fingerprint + np lang scoring) the entire fused profile is
        ONE map-only stage — NO Exchange of any kind in the plan (the
        round-5 form allowed thin-row exchanges for the declarative lang
        join; the np kernel removed them). The input is pre-spread to
        cluster parallelism so the small-input repartition guard (which
        legitimately moves text once) stays out of the plan — mirroring a
        real many-split scan."""
        docs = _docs(spark, FIX).repartition(
            spark.sparkContext.defaultParallelism).localCheckpoint()
        jplan = corpus.document_profile(docs, "text", "doc_id") \
                      ._jdf.queryExecution().executedPlan()
        if "Adaptive" in jplan.getClass().getSimpleName():
            jplan = jplan.initialPlan()
        stack = [jplan]
        while stack:
            node = stack.pop()
            cls = node.getClass().getSimpleName()
            assert "Exchange" not in cls, cls
            kids = node.children()
            for i in range(kids.size()):
                stack.append(kids.apply(i))


class TestRandomizedOracle:
    def test_random_corpus_matches_python(self, spark):
        """Seeded random word-soup corpus (the suite's randomized-oracle
        pattern — bounded Spark round-trips, deterministic seed): one
        collect per operator, every row checked against an independent
        Python re-derivation."""
        import random
        from collections import Counter

        rng = random.Random(20260814)
        vocab = [f"w{j}" for j in range(30)]
        rows = [" ".join(rng.choice(vocab)
                         for _ in range(rng.randrange(0, 25)))
                for _ in range(60)]
        docs = _docs(spark, rows)
        bench_ids = {i for i in range(60) if i % 9 == 2}
        bench = docs.where((F.col("doc_id") % 9) == 2)

        out = {r["doc_id"]: r for r in
               corpus.decontaminate(docs, "text", "doc_id", bench).collect()}
        bench_sh = set().union(*(_shingles(rows[i]) for i in bench_ids))
        for i, t in enumerate(rows):
            sh = _shingles(t)
            assert out[i]["n_shingles"] == len(sh), i
            assert out[i]["n_hits"] == len(sh & bench_sh), i

        rep = {r["doc_id"]: r for r in
               corpus.repetition_metrics(docs, "text", "doc_id").collect()}
        for i, t in enumerate(rows):
            toks = t.split()
            grams = [" ".join(toks[j:j + 2]) for j in range(len(toks) - 1)]
            exp_top = (max(Counter(grams).values()) / len(grams)
                       if grams else 0.0)
            assert rep[i]["top_ngram_frac"] == pytest.approx(exp_top,
                                                             abs=1e-6), i

        k = 4
        tf = [Counter(r.split()) for r in rows]
        dfreq = Counter(t for c in tf for t in c)
        n = len(rows)
        got = {}
        for r in corpus.tfidf_topk(docs, "text", "doc_id", k=k).collect():
            got.setdefault(r["doc_id"], []).append(
                (r["rank"], r["token"], r["tfidf"]))
        for i, c in enumerate(tf):
            if not c:
                assert i not in got
                continue
            exp = sorted(
                ((math.floor(cnt * math.log(n / dfreq[t]) * 1e6 + 0.5) / 1e6,
                  t) for t, cnt in c.items()),
                key=lambda s: (-s[0], s[1]))[:k]
            assert sorted(got[i]) == [
                (j + 1, t, pytest.approx(s, abs=1e-9))
                for j, (s, t) in enumerate(exp)], i


class TestVocabulary:
    def test_tf_df_and_order(self, spark):
        rows = ["b a a", "a c", "c c c c"]
        out = corpus.vocabulary(_docs(spark, rows), "text", "doc_id",
                                top_n=2).collect()
        # c: tf 5 df 2; a: tf 3 df 2; b cut by top_n
        assert [(r["token"], r["tf"], r["df"]) for r in out] == \
            [("c", 5, 2), ("a", 3, 2)]

    def test_take_ordered_plan(self, spark):
        plan = corpus.vocabulary(_docs(spark, ["x"]), "text", "doc_id") \
            ._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan


class TestSingleEvaluationPins:
    """Round-12 double-evaluation law: dfreq/LM counts come from a count
    window over ONE evaluation of the exploded-token subtree, never a
    groupBy + join-back that pays the explode twice. Pin the plan shape:
    exactly one Generate (explode) node feeds the scoring path."""

    @staticmethod
    def _n_generate(df):
        plan = df._jdf.queryExecution().executedPlan().toString()
        return plan.count("Generate ")

    def test_tfidf_single_explode(self, spark):
        assert self._n_generate(
            corpus.tfidf_topk(_docs(spark, FIX), "text", "doc_id")) == 1

    def test_xent_two_explodes_scoring_plus_stats(self, spark):
        # the single-row (T, V) stats aggregate is a separate legitimate
        # pass; the SCORING path itself holds one explode (was three
        # total under the vocab join-back shape)
        assert self._n_generate(
            corpus.unigram_xent_score(_docs(spark, FIX), "text",
                                      "doc_id")) == 2



class TestCorpusReport:
    def test_rollup_matches_profile(self, spark):
        prof = corpus.document_profile(_docs(spark, FIX), "text",
                                       "doc_id").collect()
        rep = {r["pred_lang"]: r for r in
               corpus.corpus_report(_docs(spark, FIX), "text",
                                    "doc_id").collect()}
        langs = {}
        for p in prof:
            langs.setdefault(p["pred_lang"], []).append(p)
        assert set(rep) == set(langs)
        for lang, ps in langs.items():
            r = rep[lang]
            assert r["n_docs"] == len(ps)
            assert r["total_tokens"] == sum(p["ws_tokens"] for p in ps)
            assert r["total_chars"] == sum(p["n_chars"] for p in ps)
            exp_q = sum(p["quality"] for p in ps) / len(ps)
            assert r["mean_quality"] == pytest.approx(exp_q, abs=1e-6)
            assert r["docs_with_pii"] == sum(
                1 for p in ps if p["n_email"] + p["n_phone"] + p["n_ipv4"] > 0)


# -- line-level exact dedup --------------------------------------------------

LD_FIX = [
    "COOKIE BANNER\nreal content alpha\nCOOKIE BANNER\nmore alpha text",
    "COOKIE BANNER\nreal content beta",
    "unique document\n\nwith a blank line",
    "",
    "   \nonly whitespace lines\n   ",
]


def test_line_dedup_removes_corpus_frequent_lines(spark):
    out = {r["doc_id"]: r for r in
           corpus.line_dedup(_docs(spark, LD_FIX), "text", "doc_id",
                             min_doc_freq=2).collect()}
    # COOKIE BANNER appears in docs 0 and 1 -> removed everywhere,
    # including BOTH copies inside doc 0; order of survivors preserved
    assert out[0]["clean_text"] == "real content alpha\nmore alpha text"
    assert out[0]["n_lines"] == 4 and out[0]["n_removed"] == 2
    assert out[1]["clean_text"] == "real content beta"
    assert out[1]["n_removed"] == 1


def test_line_dedup_blank_lines_are_structure(spark):
    out = {r["doc_id"]: r for r in
           corpus.line_dedup(_docs(spark, LD_FIX), "text", "doc_id",
                             min_doc_freq=2).collect()}
    # blank/whitespace lines repeat across docs but are never counted or
    # removed; empty documents survive as one empty line
    assert out[2]["clean_text"] == LD_FIX[2]
    assert out[2]["n_removed"] == 0
    assert out[3]["clean_text"] == "" and out[3]["n_lines"] == 1
    assert out[4]["clean_text"] == LD_FIX[4]


def test_line_dedup_high_threshold_is_identity(spark):
    out = corpus.line_dedup(_docs(spark, LD_FIX), "text", "doc_id",
                            min_doc_freq=99)
    got = {r["doc_id"]: r["clean_text"] for r in out.collect()}
    assert got == {i: t for i, t in enumerate(LD_FIX)}
    assert out.where(F.col("n_removed") > 0).count() == 0


def test_line_dedup_duckdb_twin(spark):
    import duckdb

    df = _docs(spark, LD_FIX)
    got = sorted(tuple(r) for r in
                 corpus.line_dedup(df, "text", "doc_id", 2).collect())
    con = duckdb.connect()
    con.register("docs_py", df.toPandas())
    exp = sorted(tuple(r) for r in con.sql(
        corpus.sql_line_dedup("docs_py", "text", "doc_id", 2)).fetchall())
    assert got == exp


def test_line_dedup_plan_shape(spark):
    plan = corpus.line_dedup(_docs(spark, LD_FIX), "text", "doc_id", 2) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# -- fuzzy decontamination ---------------------------------------------------

def test_fuzzy_decon_flags_exact_and_near_copies(spark):
    from pyspark.sql import Row

    corpus_rows = [
        Row(doc_id=0, text="alpha beta gamma delta epsilon zeta eta theta"),
        # near-copy of bench item 100 (one token changed out of 8)
        Row(doc_id=1, text="alpha beta gamma delta epsilon zeta eta IOTA"),
        Row(doc_id=2, text="totally unrelated content nothing shared here"),
    ]
    bench_rows = [
        Row(doc_id=100, text="alpha beta gamma delta epsilon zeta eta theta"),
    ]
    out = {r["doc_id"]: r for r in corpus.fuzzy_decontaminate(
        spark.createDataFrame(corpus_rows), "text", "doc_id",
        spark.createDataFrame(bench_rows), min_est=0.5).collect()}
    assert out[0]["contaminated"] == 1          # exact copy
    assert out[0]["max_est_jaccard"] == 1.0
    assert out[2]["contaminated"] == 0          # unrelated
    assert out[2]["n_bench_matches"] == 0
    # the near-copy must at least collide in some band (it may or may not
    # clear min_est depending on which minhashes the changed token moved)
    assert len(out) == 3                        # one row per corpus doc


def test_fuzzy_decon_never_pairs_corpus_with_corpus(spark):
    from pyspark.sql import Row

    # two identical CORPUS docs and an unrelated benchmark: corpus-corpus
    # duplication must NOT count as contamination
    corpus_rows = [
        Row(doc_id=0, text="one two three four five six seven eight"),
        Row(doc_id=1, text="one two three four five six seven eight"),
    ]
    bench_rows = [Row(doc_id=9, text="nine ten eleven twelve etc etc etc")]
    out = corpus.fuzzy_decontaminate(
        spark.createDataFrame(corpus_rows), "text", "doc_id",
        spark.createDataFrame(bench_rows), min_est=0.5)
    assert out.where(F.col("contaminated") == 1).count() == 0


def test_unigram_xent_orders_rarity(spark):
    """Docs made of corpus-common tokens must score lower cross-entropy
    than docs of corpus-rare tokens; values match a Python recompute of
    the same smoothed model."""
    import math

    from relationaldecomposition_spark.operators.corpus import (
        unigram_xent_score)

    rows = [(1, "common common common common"),
            (2, "common common rare1"),
            (3, "rare2 rare3"),
            (4, "")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in
           unigram_xent_score(df, "text", "doc_id").collect()}
    assert out[1]["xent"] < out[2]["xent"] < out[3]["xent"]
    assert out[4]["n_tokens"] == 0 and out[4]["xent"] is None
    # Python recompute (k = 0.5)
    toks = [t for _, x in rows for t in x.split()]
    from collections import Counter
    c = Counter(toks); T = len(toks); V = len(c)
    def r6(x): return math.floor(x * 1e6 + 0.5) / 1e6
    for did, x in rows[:3]:
        ts = x.split()
        lps = [r6(-math.log2((c[t] + 0.5) / (T + 0.5 * V))) for t in ts]
        assert out[did]["xent"] == pytest.approx(r6(sum(lps) / len(ts)),
                                                 abs=1e-9)
        assert out[did]["n_tokens"] == len(ts)


def test_xent_quality_buckets_contract(spark):
    """Value-based CCNet bucketing: per language, bucket =
    ceil(k * cum / tot) over the xent CDF — verified against a Python
    re-derivation; ties share a bucket; token-less docs bucket NULL;
    languages are bucketed independently."""
    import math
    from collections import Counter

    from relationaldecomposition_spark.operators.corpus import (
        unigram_xent_score, xent_quality_buckets)

    rows = [(i, f"w{i} w{i} common common", "en") for i in range(9)]
    rows += [(100, "common common common common", "en")]  # lowest xent
    rows += [(200 + i, "uno dos tres", "es") for i in range(4)]
    rows += [(300, "", "es")]                             # no tokens
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    k = 3
    out = {r["doc_id"]: (r["lang"], r["xent"], r["bucket"])
           for r in xent_quality_buckets(df, "text", "doc_id", "lang",
                                         k).collect()}
    xs = {r["doc_id"]: r["xent"]
          for r in unigram_xent_score(df, "text", "doc_id").collect()}
    by_lang: dict[str, list[float]] = {}
    for did, _, lang in rows:
        if xs[did] is not None:
            by_lang.setdefault(lang, []).append(xs[did])
    for did, _, lang in rows:
        x = xs[did]
        if x is None:
            assert out[did] == (lang, None, None)
            continue
        vals = by_lang[lang]
        cum = sum(1 for v in vals if v <= x)
        exp = min(k, (cum * k - 1) // len(vals) + 1)
        assert out[did] == (lang, x, exp), did
    # the es docs are four identical ties -> cum = tot -> all bucket k
    assert {out[200 + i][2] for i in range(4)} == {k}
    # the en head doc (all-common tokens) sits in bucket 1
    assert out[100][2] == 1
    with pytest.raises(ValueError, match="n_buckets"):
        xent_quality_buckets(df, "text", "doc_id", "lang", 1)
    # non-default smooth_k reaches the scorer (advisor, round 8: it was
    # silently dropped) — xent must equal the scorer's at the same k and
    # differ from the default-k values
    out2 = {r["doc_id"]: r["xent"]
            for r in xent_quality_buckets(df, "text", "doc_id", "lang",
                                          k, smooth_k=2.0).collect()}
    xs2 = {r["doc_id"]: r["xent"]
           for r in unigram_xent_score(df, "text", "doc_id",
                                       smooth_k=2.0).collect()}
    assert out2 == xs2
    assert any(out2[d] != xs[d] for d in out2 if out2[d] is not None)


class TestBigramPMI:
    def test_matches_python_rederivation(self, spark):
        import math
        from collections import Counter

        texts = ["new york is big", "new york new jersey",
                 "big data is big", "york new york"]
        docs = _docs(spark, texts)
        out = corpus.bigram_pmi(docs, "text", "doc_id", k=10,
                                min_count=2).collect()
        toks = [t for s in texts for t in s.split()]
        uni = Counter(toks)
        bi = Counter(" ".join(p) for s in texts
                     for p in zip(s.split(), s.split()[1:]))
        tu, tb = sum(uni.values()), sum(bi.values())
        exp = {}
        for g, cab in bi.items():
            if cab >= 2:
                w1, w2 = g.split(" ")
                pmi = math.log2((cab / tb)
                                / ((uni[w1] / tu) * (uni[w2] / tu)))
                exp[g] = (cab, math.floor(pmi * 1e6 + 0.5) / 1e6)
        got = {r["bigram"]: (r["n_ab"], r["pmi"]) for r in out}
        assert got == dict(sorted(exp.items(),
                                  key=lambda kv: (-kv[1][1], kv[0]))[:10])
        # ordering: rounded pmi desc, bigram asc
        vals = [(r["pmi"], r["bigram"]) for r in out]
        assert vals == sorted(vals, key=lambda v: (-v[0], v[1]))

    def test_validates_args(self, spark):
        import pytest as _pt
        docs = _docs(spark, ["a b"])
        with _pt.raises(ValueError):
            corpus.bigram_pmi(docs, "text", "doc_id", k=0)


class TestBandIndexMerge:
    def test_index_grows_by_survivors_only(self, spark):
        from relationaldecomposition_spark.operators import dedup as D

        base = ("the quick brown fox jumps over the lazy dog and then "
                "runs far away into the deep dark forest tonight")
        corpus_docs = _docs(spark, [base + f" tail{i}" for i in range(3)])
        # batch: doc 0 near-dups the corpus, doc 1 is novel
        batch = spark.createDataFrame(
            [(100, base + " tail0 extra"),
             (101, "completely different content about spark catalyst "
                   "optimizer rules and adaptive query execution planning "
                   "with shuffle partitions tuned for large clusters")],
            ["doc_id", "text"])
        idx = D.minhash_band_index(corpus_docs, "text", "doc_id")
        inc = {r["doc_id"]: r["survives"] for r in
               D.incremental_dedup(batch, idx, "text", "doc_id").collect()}
        merged = D.band_index_merge(idx, batch, "text", "doc_id")
        idx_rows = {tuple(r) for r in idx.collect()}
        merged_rows = {tuple(r) for r in merged.collect()}
        assert idx_rows <= merged_rows
        new_ids = {r[2] for r in merged_rows - idx_rows}
        assert new_ids == {i for i, s in inc.items() if s}
        # a second identical batch now collides with the merged index
        inc2 = {r["doc_id"]: r["survives"] for r in
                D.incremental_dedup(
                    batch.withColumn("doc_id", F.col("doc_id") + 100),
                    merged, "text", "doc_id").collect()}
        assert not any(inc2.values())


def test_repetition_arrow_kernel_matches_expr(spark):
    """r7: the map-only Arrow repetition kernel must equal the expression
    face EXACTLY on gate data plus tokenizer edge cases (SPACE-only trim,
    ASCII-\\s split, null/empty/NBSP/short docs, threshold boundaries)."""
    from relationaldecomposition_spark.operators.corpus import (
        repetition_metrics)
    from tests.conftest import load

    docs = load(spark, "documents")
    e = {r["doc_id"]: tuple(r)[1:] for r in
         repetition_metrics(docs, "text", "doc_id").collect()}
    g = {r["doc_id"]: tuple(r)[1:] for r in
         repetition_metrics(docs, "text", "doc_id",
                            kernel="arrow").collect()}
    assert e == g and len(e) == docs.count()

    nasty = spark.createDataFrame(
        [(1, None), (2, ""), (3, "   "), (4, "one"),
         (5, "a b a b a b a b a b"),          # dominant bigram
         (6, "x y z"),                   # NBSP is NOT a Java \s split
         (7, " lead\ttab\nnl trail "),
         (8, "w " * 300)],                    # all-identical bigrams
        "doc_id bigint, text string")
    e = {r["doc_id"]: tuple(r)[1:] for r in
         repetition_metrics(nasty, "text", "doc_id").collect()}
    g = {r["doc_id"]: tuple(r)[1:] for r in
         repetition_metrics(nasty, "text", "doc_id",
                            kernel="arrow").collect()}
    assert e == g
    assert e[5][3] == 1 and e[8][3] == 1      # repetitive flags fire
