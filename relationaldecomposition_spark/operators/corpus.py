"""Corpus-hygiene operators for training-data pipelines: benchmark
decontamination, PII detection/redaction, repetition-based quality
(Gopher-style), and TF-IDF keyword extraction.

All four are pure DataFrame pipelines (no Python UDFs) over the portable
hash/tokenize primitives in functions/hashing.py, each with a DuckDB SQL
twin generated from the same constants so the driver's oracle gate
value-checks them.

Scale notes (100 TB):
- decontaminate: the benchmark n-gram set is eval-corpus-sized (MBs, not
  TBs) regardless of training-corpus size, so the membership probe is a
  BROADCAST semi-join — the corpus is never shuffled on content; the only
  wide exchange is the per-document hit count, keyed by the uniform doc id.
- pii_scan/redact: map-only column expressions (regexp_count /
  regexp_replace inside whole-stage codegen); zero shuffles.
- repetition_metrics: per-document n-gram mode via explode + two keyed
  aggregations (both map-side combining) — never a per-row O(len^2)
  higher-order-function loop, so a single pathological 1 GB document
  costs O(len) per stage, not O(len^2) on one core.
- tfidf_topk: document frequency is a COUNT WINDOW over the token key on
  the distinct (doc, token) tf frame — one evaluation of the tokenize
  subtree and one shuffle (the round-12 shared-subtree law; the former
  groupBy + token-keyed tf<->df join-back evaluated and shuffled it
  twice); the top-k window partitions by document — no global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..functions.hashing import (
    exploded_shingles, portable_hash32, sql_hash32, sql_tokens,
    sql_word_shingles, tokens, word_shingles)
from .text import round6, sql_round6
from .materialize import local_materialize

# -- decontamination ---------------------------------------------------------

DECON_SHINGLE_K = 3     # n-gram width matched against the benchmark
DECON_TAU = 0.2         # overlap fraction above which a doc is contaminated


def decontaminate(df: DataFrame, text_col: str, id_col: str,
                  benchmark: DataFrame, k: int = DECON_SHINGLE_K,
                  tau: float = DECON_TAU,
                  broadcast_bench: bool = True) -> DataFrame:
    """Benchmark decontamination: per document, the fraction of its distinct
    k-word shingles that appear anywhere in the benchmark corpus (the
    standard n-gram-overlap decontamination rule used for public LLM
    training sets). `benchmark` is any frame with the same text column.

    Returns (id, n_shingles, n_hits, overlap_frac, contaminated) — one row
    per input document, shingle-less documents included with zeros.

    The benchmark's distinct shingle hashes are broadcast (an eval set is
    small by construction); the corpus side is exploded once and never
    re-shuffled except for the final doc-keyed count. Pass
    broadcast_bench=False for a pathologically large benchmark — the
    probe degrades to a shuffle join on the shingle hash, still never
    quadratic."""
    # exploded_shingles (posexplode + lead) instead of exploding a lambda-
    # built array: 8x cheaper generator (see functions/hashing.py); the
    # per-doc distinct moves from map-side array_distinct to a
    # dropDuplicates whose partial aggregation still combines map-side.
    # Distinct is on the shingle STRING (then hashed) so a 2^-32 hash
    # collision between two distinct shingles still counts twice, exactly
    # like the oracle's list_distinct-then-hash.
    sh = exploded_shingles(df, text_col, id_col, k) \
        .dropDuplicates([id_col, "shingle"])
    ex = sh.select(F.col(id_col),
                   F.when(F.col("shingle").isNotNull(),
                          portable_hash32(F.col("shingle"))).alias("h"))
    bench = (benchmark
             .select(F.explode(F.array_distinct(
                 word_shingles(F.col(text_col), k))).alias("shingle"))
             .select(portable_hash32(F.col("shingle")).alias("h"))
             .distinct()
             .withColumn("_hit", F.lit(1)))
    joined = ex.join(F.broadcast(bench) if broadcast_bench else bench,
                     "h", "left")
    agg = joined.groupBy(id_col).agg(
        F.count("h").alias("n_shingles"),
        F.count("_hit").alias("n_hits"))
    frac = F.when(F.col("n_shingles") > 0,
                  F.col("n_hits") / F.col("n_shingles").cast("double")) \
            .otherwise(F.lit(0.0))
    return agg.select(
        F.col(id_col),
        F.col("n_shingles").cast("bigint").alias("n_shingles"),
        F.col("n_hits").cast("bigint").alias("n_hits"),
        round6(frac).alias("overlap_frac"),
        (frac >= F.lit(tau)).cast("int").alias("contaminated"))


def sql_decontaminate(table: str, text_col: str, id_col: str,
                      bench_where: str, k: int = DECON_SHINGLE_K,
                      tau: float = DECON_TAU) -> str:
    """DuckDB twin; `bench_where` is the predicate selecting benchmark rows
    from the same table (the gate pins the benchmark as a table subset so
    both engines derive it identically)."""
    sh = sql_word_shingles(text_col, k)
    h = sql_hash32("s")
    frac = ("CASE WHEN n_shingles > 0 "
            "THEN n_hits / CAST(n_shingles AS DOUBLE) ELSE 0.0 END")
    return f"""
      WITH ex AS (
        SELECT {id_col}, unnest(list_transform(list_distinct({sh}),
                                               s -> {h})) AS h
        FROM {table}),
      bench AS (
        SELECT DISTINCT unnest(list_transform(list_distinct({sh}),
                                              s -> {h})) AS h
        FROM {table} WHERE {bench_where}),
      agg AS (
        SELECT e.{id_col}, count(*) AS n_shingles, count(b.h) AS n_hits
        FROM ex e LEFT JOIN bench b ON e.h = b.h
        GROUP BY e.{id_col})
      SELECT d.{id_col},
             coalesce(a.n_shingles, 0)::BIGINT AS n_shingles,
             coalesce(a.n_hits, 0)::BIGINT AS n_hits,
             {sql_round6(f"coalesce({frac}, 0.0)")} AS overlap_frac,
             (CASE WHEN coalesce({frac}, 0.0) >= {tau}
                   THEN 1 ELSE 0 END)::INT AS contaminated
      FROM {table} d LEFT JOIN agg a ON d.{id_col} = a.{id_col}"""


# -- PII detection / redaction ----------------------------------------------

# Patterns restricted to syntax Java regex and RE2 read identically
# (no backrefs, no lookaround).
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"
PII_IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_RULES: list[tuple[str, str, str]] = [
    ("email", PII_EMAIL_RE, "[EMAIL]"),
    ("phone", PII_PHONE_RE, "[PHONE]"),
    ("ipv4", PII_IPV4_RE, "[IPV4]"),
]


def pii_count_cols(c) -> list:
    """One n_<rule> count expression per PII rule (fusion-reusable)."""
    return [F.regexp_count(c, F.lit(pat)).cast("bigint").alias(f"n_{name}")
            for name, pat, _ in PII_RULES]


def pii_scan(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Count + redact PII spans (emails, NNN-NNN-NNNN phones, IPv4
    addresses). Map-only: one regexp_count per rule + chained
    regexp_replace, all inside whole-stage codegen. Redaction order is
    rule-list order (emails first, so user@host never half-matches as a
    host-only token after replacing).

    Returns (id, n_email, n_phone, n_ipv4, redacted)."""
    c = F.col(text_col)
    red = c
    for _, pat, repl in PII_RULES:
        red = F.regexp_replace(red, pat, repl)
    return df.select(F.col(id_col), *pii_count_cols(c), red.alias("redacted"))


def sql_pii_scan(table: str, text_col: str, id_col: str) -> str:
    # DuckDB single-quoted literals are escape-free (standard SQL): '\d'
    # IS backslash-d, so only quotes need doubling.
    def q(p: str) -> str:
        return p.replace("'", "''")

    counts = [f"len(regexp_extract_all({text_col}, '{q(pat)}'))::BIGINT "
              f"AS n_{name}" for name, pat, _ in PII_RULES]
    red = text_col
    for _, pat, repl in PII_RULES:
        red = f"regexp_replace({red}, '{q(pat)}', '{repl}', 'g')"
    return (f"SELECT {id_col}, {', '.join(counts)}, {red} AS redacted "
            f"FROM {table}")


def with_synthetic_pii(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Deterministically inject PII spans into a text column (the synthetic
    corpus has none): emails on id%3==0, phones on id%5==0, IPv4 on id%7==0
    — so zero-, one- and multi-hit rows all occur. The SQL twin
    (sql_with_synthetic_pii) builds byte-identical strings."""
    i = F.col(id_col)
    c = F.col(text_col)
    email = F.when(i % 3 == 0, F.concat(
        F.lit(" contact user"), i.cast("string"), F.lit("@example.com")))
    phone = F.when(i % 5 == 0, F.concat(
        F.lit(" call 555-123-"), F.lpad((i % 10000).cast("string"), 4, "0")))
    ip = F.when(i % 7 == 0, F.concat(
        F.lit(" host 10.0."), (i % 256).cast("string"), F.lit("."),
        ((i * 7) % 256).cast("string")))
    aug = F.concat(c, F.coalesce(email, F.lit("")),
                   F.coalesce(phone, F.lit("")), F.coalesce(ip, F.lit("")))
    return df.withColumn(text_col, aug)


def sql_with_synthetic_pii(table: str, text_col: str, id_col: str) -> str:
    """CTE body producing the same augmented rows as with_synthetic_pii."""
    i = id_col
    email = (f"CASE WHEN {i} % 3 = 0 THEN ' contact user' || {i}::VARCHAR "
             f"|| '@example.com' ELSE '' END")
    phone = (f"CASE WHEN {i} % 5 = 0 THEN ' call 555-123-' || "
             f"lpad(({i} % 10000)::VARCHAR, 4, '0') ELSE '' END")
    ip = (f"CASE WHEN {i} % 7 = 0 THEN ' host 10.0.' || ({i} % 256)::VARCHAR "
          f"|| '.' || (({i} * 7) % 256)::VARCHAR ELSE '' END")
    return (f"SELECT * REPLACE ({text_col} || {email} || {phone} || {ip} "
            f"AS {text_col}) FROM {table}")


# -- repetition metrics (Gopher-style quality rules) -------------------------

REP_NGRAM_N = 2         # n-gram whose mode share is measured
REP_TOP_FRAC_MAX = 0.18  # Gopher's top-2-gram threshold family


def repetition_metrics(df: DataFrame, text_col: str, id_col: str,
                       n: int = REP_NGRAM_N,
                       top_frac_max: float = REP_TOP_FRAC_MAX,
                       kernel: str = "expr") -> DataFrame:
    """Per-document repetition signals (the Gopher / MassiveText quality
    rule family): duplicate-token fraction (1 - distinct/total) and the
    fraction of all n-grams taken by the single most frequent n-gram.
    `repetitive` flags documents whose top-n-gram share exceeds the
    threshold — the standard boilerplate/template detector.

    Returns (id, n_tokens, dup_token_frac, top_ngram_frac, repetitive),
    one row per document (token-less documents report zeros).

    Two kernels, identical values (pinned in tests/test_corpus.py):

    - ``kernel="expr"`` (default): shingle explode -> groupBy(id, gram)
      -> groupBy(id) — the DuckDB-twin oracle form. Shuffles ~one row
      per TOKEN of the corpus, twice (42M rows at sf10).
    - ``kernel="arrow"``: every signal is a function of ONE document, so
      one Arrow batch pass computes them with zero shuffles (the same
      ASCII-\\s tokenizer parity recipe as py_fingerprint_batch) — the
      production scale path, used by curate_corpus's quality gate."""
    if kernel == "arrow":
        return _repetition_arrow(df, text_col, id_col, n, top_frac_max)
    if kernel != "expr":
        raise ValueError(f"unknown repetition kernel: {kernel!r}")
    toks = tokens(F.col(text_col))
    base = df.select(F.col(id_col),
                     F.size(toks).cast("bigint").alias("n_tokens"),
                     F.size(F.array_distinct(toks)).cast("bigint")
                      .alias("n_distinct"))
    grams = df.select(F.col(id_col),
                      F.explode(word_shingles(F.col(text_col), n))
                       .alias("gram"))
    per_gram = grams.groupBy(id_col, "gram").agg(F.count(F.lit(1)).alias("c"))
    per_doc = per_gram.groupBy(id_col).agg(F.max("c").alias("top_c"),
                                           F.sum("c").alias("n_grams"))
    j = base.join(per_doc, id_col, "left")
    dup = F.when(F.col("n_tokens") > 0,
                 1.0 - F.col("n_distinct") / F.col("n_tokens").cast("double")) \
           .otherwise(F.lit(0.0))
    top = F.coalesce(F.col("top_c") / F.col("n_grams").cast("double"),
                     F.lit(0.0))
    return j.select(F.col(id_col), F.col("n_tokens"),
                    round6(dup).alias("dup_token_frac"),
                    round6(top).alias("top_ngram_frac"),
                    (top > F.lit(top_frac_max)).cast("int").alias("repetitive"))


def _rep_udf(n: int, top_frac_max: float):
    """The repetition Arrow kernel as a reusable pandas UDF (text ->
    struct<n_tokens, dup_token_frac, top_ngram_frac, repetitive>), shared
    by `_repetition_arrow` and the fused `quality_repetition_profile`.

    Parity notes: tokens follow the Spark expression exactly — trim
    strips SPACE only, the split regex \\s is ASCII (same recipe
    py_fingerprint_batch proved bit-identical); a null text yields NULL
    n_tokens (size(null) is null) with zero fractions, matching the
    expression face's when/otherwise fallthrough."""
    from collections import Counter

    from pyspark.sql.functions import pandas_udf

    import math

    from .text import _NP_WS

    def _round6(x: float) -> float:
        # the repo-wide portable rounding (text.round6): floor(x*1e6+0.5)
        # — same double ops as the Spark/DuckDB faces, NOT Python round()
        return math.floor(x * 1e6 + 0.5) / 1e6

    @pandas_udf("struct<n_tokens:bigint,dup_token_frac:double,"
                "top_ngram_frac:double,repetitive:int>")
    def _rep(texts):
        import pandas as pd
        nt_out, dup_out, top_out, rep_out = [], [], [], []
        for text in texts:
            if text is None:
                nt_out.append(None)
                dup_out.append(0.0)
                top_out.append(0.0)
                rep_out.append(0)
                continue
            toks = [t for t in _NP_WS.split(text.strip(" ")) if t]
            nt = len(toks)
            dup = 1.0 - len(set(toks)) / nt if nt > 0 else 0.0
            if nt >= n:
                counts = Counter(
                    " ".join(toks[i:i + n]) for i in range(nt - n + 1))
                top = max(counts.values()) / (nt - n + 1)
            else:
                top = 0.0
            nt_out.append(nt)
            dup_out.append(_round6(dup))
            top_out.append(_round6(top))
            # the expression face compares the UNROUNDED share
            rep_out.append(int(top > top_frac_max))
        return pd.DataFrame({
            "n_tokens": pd.Series(nt_out, dtype="Int64"),
            "dup_token_frac": dup_out, "top_ngram_frac": top_out,
            "repetitive": pd.Series(rep_out, dtype="int32")})

    return _rep


def _repetition_arrow(df: DataFrame, text_col: str, id_col: str,
                      n: int, top_frac_max: float) -> DataFrame:
    """Map-only Arrow twin of repetition_metrics (kernel in `_rep_udf`)."""
    rep = _rep_udf(n, top_frac_max)
    return (df.select(F.col(id_col), rep(F.col(text_col)).alias("_r"))
            .select(F.col(id_col), F.col("_r.n_tokens").alias("n_tokens"),
                    F.col("_r.dup_token_frac").alias("dup_token_frac"),
                    F.col("_r.top_ngram_frac").alias("top_ngram_frac"),
                    F.col("_r.repetitive").alias("repetitive")))


def quality_repetition_profile(df: DataFrame, text_col: str, id_col: str,
                               n: int = REP_NGRAM_N,
                               top_frac_max: float = REP_TOP_FRAC_MAX
                               ) -> DataFrame:
    """ONE scan computing both per-document curation gates (r12 verdict
    ask #4): the quality expression (text.quality_col — whole-stage
    codegen) and the repetition Arrow kernel (`_rep_udf`) in a single
    projection, so the gate pass reads the survivor text once instead of
    twice and downstream joins against one (id, quality, repetitive)
    frame instead of two. Values are EXACTLY the separate operators'
    faces (same column builders; pinned in tests/test_pipeline.py).

    Returns (id, quality, n_tokens, dup_token_frac, top_ngram_frac,
    repetitive)."""
    from .text import quality_col

    c = F.col(text_col)
    rep = _rep_udf(n, top_frac_max)
    return (df.select(F.col(id_col), quality_col(c), rep(c).alias("_r"))
            .select(F.col(id_col), "quality",
                    F.col("_r.n_tokens").alias("n_tokens"),
                    F.col("_r.dup_token_frac").alias("dup_token_frac"),
                    F.col("_r.top_ngram_frac").alias("top_ngram_frac"),
                    F.col("_r.repetitive").alias("repetitive")))


def sql_repetition_metrics(table: str, text_col: str, id_col: str,
                           n: int = REP_NGRAM_N,
                           top_frac_max: float = REP_TOP_FRAC_MAX) -> str:
    toks = sql_tokens(text_col)
    sh = sql_word_shingles(text_col, n)
    return f"""
      WITH base AS (
        SELECT {id_col}, len({toks})::BIGINT AS n_tokens,
               len(list_distinct({toks}))::BIGINT AS n_distinct
        FROM {table}),
      grams AS (SELECT {id_col}, unnest({sh}) AS gram FROM {table}),
      per_gram AS (SELECT {id_col}, gram, count(*) AS c
                   FROM grams GROUP BY {id_col}, gram),
      per_doc AS (SELECT {id_col}, max(c) AS top_c, sum(c) AS n_grams
                  FROM per_gram GROUP BY {id_col})
      SELECT b.{id_col}, b.n_tokens,
             {sql_round6('''CASE WHEN b.n_tokens > 0
                        THEN 1.0 - b.n_distinct / CAST(b.n_tokens AS DOUBLE)
                        ELSE 0.0 END''')} AS dup_token_frac,
             {sql_round6("coalesce(p.top_c / CAST(p.n_grams AS DOUBLE), 0.0)")}
               AS top_ngram_frac,
             (CASE WHEN coalesce(p.top_c / CAST(p.n_grams AS DOUBLE), 0.0)
                        > {top_frac_max}
                   THEN 1 ELSE 0 END)::INT AS repetitive
      FROM base b LEFT JOIN per_doc p ON b.{id_col} = p.{id_col}"""


# -- fused per-document profile ---------------------------------------------


LID_PROFILE_MAX_CHARS = 256


def document_profile(df: DataFrame, text_col: str, id_col: str,
                     lid_max_chars: int | None = LID_PROFILE_MAX_CHARS
                     ) -> DataFrame:
    """ONE fused scan computing every per-row corpus signal at once:
    token/char counts, quality score, content fingerprint, PII counts, and
    language ID — operator fusion for the 100 TB ingest pass, where five
    separate operators would mean five full reads of the corpus. The
    token/quality/fingerprint/PII signals collapse into a single
    WholeStageCodegen projection over the scan; language scoring (round-5
    single-scan rewrite) adds one broadcast-profile window join whose
    map-side-combined aggregation and final doc-keyed join move only THIN
    rows — the text column itself is never shuffled (pinned in
    tests/test_corpus.py). On a STREAMING input the whole profile stays
    map-only (lang_id dispatches to its Arrow-batched scorer), so
    profile-on-ingest still runs append-mode with zero extra code.

    Returns (id, ws_tokens, bpe_tokens, n_chars, quality, fingerprint,
    n_email, n_phone, n_ipv4, pred_lang).

    ``lid_max_chars`` (default 256): language ID scores only the first N
    characters of the normalized text — the LID kernel is memory-
    bandwidth-bound under executor concurrency and was the largest slice
    of the fused scan at sf10 (68 s of 141 s); 256 normalized chars
    decide 25-language trigram LID with held-out accuracy unchanged
    (pinned in tests/test_langid.py). Pass None for full-text scoring.
    The DuckDB twin (sql_document_profile) is generated with the same
    value, so the faces stay value-identical."""
    from .text import (fp_bpe_arrow_col, lang_id, quality_col,
                       token_count_cols)
    if not df.isStreaming:
        # single-split small inputs would run every fused signal on one
        # core; spread before the signal expressions (no-op at real scale
        # where the scan already offers >= cores splits)
        par = df.sparkSession.sparkContext.defaultParallelism
        if df.rdd.getNumPartitions() < par:
            df = df.repartition(par)
    c = F.col(text_col)
    if df.isStreaming:
        # the BPE-ish count rides the fingerprint's Arrow kernel
        # (fp_bpe_arrow_col) for regex-engine isolation — same finding as
        # the batch face below
        ws_tokens, _, n_chars = token_count_cols(c)
        sigs = (df.select(F.col(id_col), c, ws_tokens, n_chars,
                          quality_col(c), fp_bpe_arrow_col(c).alias("_fb"),
                          *pii_count_cols(c))
                .select(F.col(id_col), c, "ws_tokens",
                        F.col("_fb.bpe_tokens").alias("bpe_tokens"),
                        "n_chars", "quality",
                        F.col("_fb.fingerprint").alias("fingerprint"),
                        *[F.col(f"n_{name}") for name, _, _ in PII_RULES]))
        keep = ["ws_tokens", "bpe_tokens", "n_chars", "quality",
                "fingerprint"] + [f"n_{name}" for name, _, _ in PII_RULES]
        return lang_id(sigs, text_col, id_col, keep=keep,
                       max_chars=lid_max_chars)
    # Batch: fingerprint, lang scoring AND the BPE-ish token count ride
    # one fused pandas UDF (bit-identical values — py_fingerprint_batch /
    # np_lang_pred / Python re over BPE_ISH_RE, pinned against the JVM
    # regexp face in tests/test_corpus.py), so the text column crosses
    # the JVM->Arrow->Python boundary once; the whole profile is a single
    # map-only stage — zero Exchanges (pinned in tests/test_corpus.py).
    #
    # Why bpe_tokens is Python here while token_counts' standalone face
    # stays a JVM regexp_count (round-11 profiling,
    # SCALING.json:doc_profile_components_r11): interleaving the BPE-ish
    # regex with the PII EMAIL regex per row in ONE interpreted
    # projection deoptimizes java.util.regex's shared hot paths (two
    # heavyweight patterns with different Pattern-node graphs make the
    # matcher's call sites megamorphic) — bpe+email measured 26.4 s at
    # sf10 vs 7.6+2.0 s separately, with heap size, codegen flags and
    # pattern count all ruled out (bpe+bpe, bpe+phone, bpe+ipv4 are
    # additive). Moving the BPE count across the Arrow boundary isolates
    # the regex engines and took the fused profile 33.4 -> 11.2 s.
    from pyspark.sql.functions import pandas_udf

    from .text import BPE_ISH_RE, np_lang_pred, py_fingerprint_batch

    # no type hints: the Series -> DataFrame struct-return signature is
    # not hint-inferable in PySpark 4.1; the returnType drives inference
    @pandas_udf("struct<fingerprint:bigint,pred_lang:string,"
                "bpe_tokens:bigint>")
    def _fp_lang_bpe(texts):
        import re

        import pandas as pd
        # re.ASCII: Java regex and DuckDB RE2 read \s as ASCII whitespace;
        # Python's default unicode \s would mis-class e.g. \xa0 in the
        # [^A-Za-z0-9\s] arm
        pat = re.compile(BPE_ISH_RE, re.ASCII)
        # None/NaN text -> NULL bpe_tokens (nullable Int64), matching the
        # JVM regexp_count face this kernel replaced (ADVICE r11); the
        # sibling kernels already tolerate None (-1 / empty-profile)
        return pd.DataFrame({
            "fingerprint": pd.Series(py_fingerprint_batch(texts),
                                     dtype="int64"),
            "pred_lang": pd.Series(np_lang_pred(texts.tolist(),
                                                lid_max_chars),
                                   dtype="object"),
            "bpe_tokens": pd.Series(
                [None if pd.isna(t) else len(pat.findall(t))
                 for t in texts], dtype="Int64"),
        })

    ws_tokens, _, n_chars = token_count_cols(c)
    return df.select(F.col(id_col),
                     ws_tokens, n_chars, quality_col(c),
                     _fp_lang_bpe(c).alias("_fl"), *pii_count_cols(c)) \
             .select(F.col(id_col), "ws_tokens",
                     F.col("_fl.bpe_tokens").alias("bpe_tokens"), "n_chars",
                     "quality", F.col("_fl.fingerprint").alias("fingerprint"),
                     *[F.col(f"n_{name}") for name, _, _ in PII_RULES],
                     F.col("_fl.pred_lang").alias("pred_lang"))


def sql_document_profile(table: str, text_col: str, id_col: str,
                         lid_max_chars: int | None = LID_PROFILE_MAX_CHARS
                         ) -> str:
    """DuckDB twin: the individual operator twins joined on the id — the
    values are identical to the fused scan's, only the oracle pays the
    joins. ``lid_max_chars`` must match the Spark face's."""
    from .text import (sql_fingerprint, sql_lang_id, sql_quality_score,
                       sql_token_counts)
    pii = sql_pii_scan(table, text_col, id_col)
    return f"""
      WITH tok AS ({sql_token_counts(table, text_col, id_col)}),
      qual AS ({sql_quality_score(table, text_col, id_col)}),
      fp AS ({sql_fingerprint(table, text_col, id_col)}),
      pii AS ({pii}),
      lang AS ({sql_lang_id(table, text_col, id_col,
                            max_chars=lid_max_chars)})
      SELECT t.{id_col}, t.ws_tokens, t.bpe_tokens, t.n_chars, q.quality,
             f.fingerprint, p.n_email, p.n_phone, p.n_ipv4, l.pred_lang
      FROM tok t
      JOIN qual q ON t.{id_col} = q.{id_col}
      JOIN fp f ON t.{id_col} = f.{id_col}
      JOIN pii p ON t.{id_col} = p.{id_col}
      JOIN lang l ON t.{id_col} = l.{id_col}"""


# -- TF-IDF keyword extraction ----------------------------------------------

TFIDF_TOPK = 3


def tfidf_topk(df: DataFrame, text_col: str, id_col: str,
               k: int = TFIDF_TOPK) -> DataFrame:
    """Top-k keywords per document by tf * ln(N/df) with raw term counts
    (the textbook smoothing-free variant, so the SQL twin is exact).

    Ranking orders by the 6-decimal-ROUNDED score (then token) in BOTH
    engines: two mathematically equal scores reached by different
    (tf, df) pairs — e.g. 2*ln(10) vs ln(100) — can differ by 1 ulp
    between JVM and C libm log, and rounding before ordering keeps the
    rank (and the k-boundary selection) engine-independent.

    N is the total document count — a bounded scalar read, same as the
    entropy engine's num_distinct."""
    n_docs = df.count()
    tf = (df.select(F.col(id_col),
                    F.explode(tokens(F.col(text_col))).alias("token"))
            .groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("tf")))
    # document frequency via a COUNT WINDOW over the token, not a
    # groupBy + join-back: the join shape evaluates the whole tf subtree
    # (explode + corpus-token aggregation) twice — once as the dfreq
    # build, once as the probe — and shuffles both sides on token (the
    # same double-evaluation remove_duplicate_spans had; round-12
    # profiling law). dfreq = rows per token in tf, identical values.
    wt = Window.partitionBy("token")
    score = round6(F.col("tf") * F.log(F.lit(float(n_docs))
                                       / F.col("dfreq").cast("double"))) \
        .alias("tfidf")
    scored = (tf.withColumn("dfreq", F.count(F.lit(1)).over(wt))
                .select(F.col(id_col), "token", score))
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("token"))
    return (scored.withColumn("rank", F.row_number().over(w))
                  .where(F.col("rank") <= k)
                  .select(F.col(id_col), "token", "tfidf",
                          F.col("rank").cast("bigint").alias("rank")))


def sql_tfidf_topk(table: str, text_col: str, id_col: str,
                   k: int = TFIDF_TOPK) -> str:
    toks = sql_tokens(text_col)
    score = sql_round6(f"t.tf * ln((SELECT count(*) FROM {table})::DOUBLE"
                       f" / d.dfreq)")
    return f"""
      WITH tf AS (
        SELECT {id_col}, unnest({toks}) AS token FROM {table}),
      tfc AS (SELECT {id_col}, token, count(*) AS tf
              FROM tf GROUP BY {id_col}, token),
      dfc AS (SELECT token, count(*) AS dfreq FROM tfc GROUP BY token),
      scored AS (
        SELECT t.{id_col}, t.token, {score} AS tfidf
        FROM tfc t JOIN dfc d ON t.token = d.token)
      SELECT {id_col}, token, tfidf, rank FROM (
        SELECT *, row_number() OVER (PARTITION BY {id_col}
                    ORDER BY tfidf DESC, token ASC)::BIGINT AS rank
        FROM scored)
      WHERE rank <= {k}"""


# -- vocabulary building -----------------------------------------------------

VOCAB_TOP_N = 100


def vocabulary(df: DataFrame, text_col: str, id_col: str,
               top_n: int = VOCAB_TOP_N) -> DataFrame:
    """Corpus vocabulary: the top_n most frequent tokens with term and
    document frequencies — the tokenizer-training / stopword-discovery
    pass. One explode + one token-keyed aggregation (map-side combining;
    a token's count collapses to one row per map partition, so hot tokens
    — 'the' at 100 TB — cost no more than rare ones), then a TakeOrdered
    merge of partition heads. Ties at the boundary break token-asc in
    both engines.

    Returns (token, tf, df) ordered tf desc, token asc."""
    if top_n <= 0:
        raise ValueError("top_n must be positive")
    ex = df.select(F.col(id_col),
                   F.explode(tokens(F.col(text_col))).alias("token"))
    per_doc = ex.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("c"))
    agg = per_doc.groupBy("token").agg(
        F.sum("c").alias("tf"),
        F.count(F.lit(1)).alias("df"))
    return (agg.select("token", F.col("tf").cast("bigint").alias("tf"),
                       F.col("df").cast("bigint").alias("df"))
               .orderBy(F.desc("tf"), F.asc("token")).limit(top_n))


def sql_vocabulary(table: str, text_col: str, id_col: str,
                   top_n: int = VOCAB_TOP_N) -> str:
    toks = sql_tokens(text_col)
    return f"""
      WITH ex AS (SELECT {id_col}, unnest({toks}) AS token FROM {table}),
      per_doc AS (SELECT {id_col}, token, count(*) AS c
                  FROM ex GROUP BY {id_col}, token)
      SELECT token, sum(c)::BIGINT AS tf, count(*)::BIGINT AS df
      FROM per_doc GROUP BY token
      ORDER BY tf DESC, token ASC
      LIMIT {top_n}"""


PMI_TOP_K = 20
PMI_MIN_COUNT = 5


def bigram_pmi(df: DataFrame, text_col: str, id_col: str,
               k: int = PMI_TOP_K,
               min_count: int = PMI_MIN_COUNT) -> DataFrame:
    """Top-k bigram collocations by pointwise mutual information —
    PMI(a,b) = log2(p(ab) / (p(a) p(b))) with unigram probabilities over
    all tokens and bigram probability over all adjacent pairs (Church &
    Hanks 1990). The phrase-discovery pass of a tokenizer/quality
    pipeline: high-PMI pairs are multiword units ("new york"), low-PMI
    frequent pairs are boilerplate.

    Plan shape: one token explode + one shingle explode, each collapsing
    via map-side-combined counts to vocabulary-sized tables; bigram rows
    join unigram counts on each word (vocabulary-sized sides); the two
    corpus totals ride single-row broadcasts (the documented o37/o52/o54
    idiom). Output ordered by ROUNDED pmi desc then bigram asc and
    truncated TakeOrdered-style, so the k-boundary is engine-independent
    (log2 parity with DuckDB is already load-bearing for the entropy
    oracles). Returns (bigram, n_ab, pmi)."""
    if k <= 0 or min_count <= 0:
        raise ValueError("k and min_count must be positive")
    c = F.col(text_col)
    uni = (df.select(F.explode(tokens(c)).alias("w"))
           .groupBy("w").agg(F.count(F.lit(1)).alias("cw")))
    bi = (df.select(F.explode(word_shingles(c, 2)).alias("bigram"))
          .groupBy("bigram").agg(F.count(F.lit(1)).alias("cab")))
    if not df.isStreaming:
        # uni feeds three consumers (w1/w2 joins + the unigram total) and
        # bi two (the bigram total + the PMI rows); each consumption
        # re-ran the corpus explode + aggregate (shared-subtree law).
        # Both frames are VOCABULARY-sized after their aggregates, so the
        # lazy checkpoint is the 100 TB-legal materialization.
        # Fault-tolerance knob: operators/materialize.py (ADVICE r13).
        uni = local_materialize(uni, eager=False)
        bi = local_materialize(bi, eager=False)
    tot_u = uni.agg(F.sum("cw").alias("tu"))
    tot_b = bi.agg(F.sum("cab").alias("tb"))
    parts = (bi.where(F.col("cab") >= min_count)
             .withColumn("w1", F.element_at(F.split("bigram", " "), 1))
             .withColumn("w2", F.element_at(F.split("bigram", " "), 2)))
    j = (parts
         .join(uni.select(F.col("w").alias("w1"),
                          F.col("cw").alias("c1")), "w1")
         .join(uni.select(F.col("w").alias("w2"),
                          F.col("cw").alias("c2")), "w2")
         .crossJoin(F.broadcast(tot_u)).crossJoin(F.broadcast(tot_b)))
    pmi = F.log2((F.col("cab") / F.col("tb"))
                 / ((F.col("c1") / F.col("tu"))
                    * (F.col("c2") / F.col("tu"))))
    return (j.select("bigram", F.col("cab").cast("bigint").alias("n_ab"),
                     round6(pmi).alias("pmi"))
            .orderBy(F.desc("pmi"), F.asc("bigram")).limit(k))


def sql_bigram_pmi(table: str, text_col: str, id_col: str,
                   k: int = PMI_TOP_K,
                   min_count: int = PMI_MIN_COUNT) -> str:
    toks = sql_tokens(text_col)
    sh2 = sql_word_shingles(text_col, 2)
    return f"""
      WITH pmi_uni AS (
        SELECT w, count(*) AS cw
        FROM (SELECT unnest({toks}) AS w FROM {table}) GROUP BY 1),
      pmi_bi AS (
        SELECT bigram, count(*) AS cab
        FROM (SELECT unnest({sh2}) AS bigram FROM {table}) GROUP BY 1),
      pmi_tu AS (SELECT sum(cw) AS tu FROM pmi_uni),
      pmi_tb AS (SELECT sum(cab) AS tb FROM pmi_bi)
      SELECT bigram, cab::BIGINT AS n_ab,
             {sql_round6("log2((cab / tb) / "
                         "((c1.cw / tu) * (c2.cw / tu)))")} AS pmi
      FROM pmi_bi, pmi_tu, pmi_tb
      JOIN pmi_uni c1 ON c1.w = split_part(bigram, ' ', 1)
      JOIN pmi_uni c2 ON c2.w = split_part(bigram, ' ', 2)
      WHERE cab >= {min_count}
      ORDER BY pmi DESC, bigram ASC
      LIMIT {k}"""


def corpus_report(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Per-language corpus report: the fused document_profile rolled up by
    predicted language — document counts, token/char volume, mean quality,
    and PII exposure. The end-of-ingest summary a corpus owner reads.
    One scan (the fused profile) + one language-keyed aggregation; the
    mean sums through DECIMAL for cross-engine determinism (FP sums are
    partition-order-dependent).

    Returns (pred_lang, n_docs, total_tokens, total_chars, mean_quality,
    docs_with_pii)."""
    prof = document_profile(df, text_col, id_col)
    has_pii = ((F.col("n_email") + F.col("n_phone") + F.col("n_ipv4")) > 0) \
        .cast("int")
    mean_q = round6(F.sum(F.col("quality").cast("decimal(28,6)"))
                    .cast("double") / F.count(F.lit(1)).cast("double"))
    return (prof.groupBy("pred_lang").agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("ws_tokens").alias("total_tokens"),
                F.sum("n_chars").alias("total_chars"),
                mean_q.alias("mean_quality"),
                F.sum(has_pii).alias("docs_with_pii"))
            .select("pred_lang",
                    F.col("n_docs").cast("bigint").alias("n_docs"),
                    F.col("total_tokens").cast("bigint").alias("total_tokens"),
                    F.col("total_chars").cast("bigint").alias("total_chars"),
                    "mean_quality",
                    F.col("docs_with_pii").cast("bigint")
                     .alias("docs_with_pii")))


def sql_corpus_report(table: str, text_col: str, id_col: str) -> str:
    prof = sql_document_profile(table, text_col, id_col)
    mean_q = sql_round6("(sum(quality::DECIMAL(28,6))::DOUBLE"
                        " / count(*)::DOUBLE)")
    return f"""
      WITH prof AS ({prof})
      SELECT pred_lang, count(*)::BIGINT AS n_docs,
             sum(ws_tokens)::BIGINT AS total_tokens,
             sum(n_chars)::BIGINT AS total_chars,
             {mean_q} AS mean_quality,
             sum(CASE WHEN n_email + n_phone + n_ipv4 > 0
                      THEN 1 ELSE 0 END)::BIGINT AS docs_with_pii
      FROM prof GROUP BY pred_lang"""


# -- line-level exact dedup --------------------------------------------------

LINE_MIN_DOC_FREQ = 2   # a line present in this many distinct docs is
                        # boilerplate (RefinedWeb §G.2 removes exact
                        # duplicated lines by corpus frequency)


def line_dedup(df: DataFrame, text_col: str, id_col: str,
               min_doc_freq: int = LINE_MIN_DOC_FREQ,
               delim: str = "\n") -> DataFrame:
    """Corpus-frequency line deduplication (Penedo et al., "The RefinedWeb
    dataset for Falcon LLM", arXiv:2306.01116, §G.2): a line that appears
    in >= min_doc_freq DISTINCT documents is boilerplate (headers, nav
    bars, cookie banners) and is removed from every document; the cleaned
    text preserves the original order of the surviving lines.

    Lines are compared exactly as split (no normalization); lines that are
    empty after trim are never counted or removed — they are document
    structure, not repeatable content. Every input document yields exactly
    one output row: (id, clean_text, n_lines, n_removed).

    100 TB shape: posexplode is map-side; line frequency is one hash
    aggregation keyed by line text (map-side combining collapses each
    partition's copies first); the boilerplate probe is a line-keyed join
    (AQE broadcasts it when the frequent set is small — the common case,
    since |{lines with freq >= N}| <= total_lines / N); reassembly is one
    groupBy on the uniform doc id. No collects, no windows, no UDFs.
    """
    import re as _re

    esc = _re.escape(delim)
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), esc)).alias("pos", "line"))
    counted = F.trim(F.col("line")) != ""
    frequent = (lines.where(counted)
                .groupBy("line")
                .agg(F.countDistinct(id_col).alias("docfreq"))
                .where(F.col("docfreq") >= min_doc_freq)
                .select("line", F.lit(True).alias("_boil")))
    marked = (lines.join(frequent, "line", "left")
              .withColumn("_rm", F.coalesce(F.col("_boil"), F.lit(False))
                          & counted))
    packed = F.array_sort(
        F.collect_list(F.struct("pos", "line", "_rm")))
    return (marked.groupBy(id_col)
            .agg(packed.alias("_ls"),
                 F.count(F.lit(1)).cast("bigint").alias("n_lines"),
                 F.sum(F.col("_rm").cast("int")).cast("bigint")
                  .alias("n_removed"))
            .select(F.col(id_col),
                    F.concat_ws(delim, F.transform(
                        F.filter("_ls", lambda s: ~s["_rm"]),
                        lambda s: s["line"])).alias("clean_text"),
                    "n_lines", "n_removed"))


def sql_line_dedup(table: str, text_col: str, id_col: str,
                   min_doc_freq: int = LINE_MIN_DOC_FREQ,
                   sql_delim: str = "chr(10)") -> str:
    """DuckDB twin of line_dedup. `table` may be a named view or a
    parenthesized subquery; `sql_delim` is a SQL expression for the
    delimiter."""
    return f"""
      WITH lines AS (
        SELECT {id_col}, u.pos, u.line FROM (
          SELECT {id_col}, unnest(list_transform(range(1, len(ls) + 1),
              i -> struct_pack(pos := i, line := ls[i]))) AS u
          FROM (SELECT {id_col}, string_split({text_col}, {sql_delim}) AS ls
                FROM {table}))),
      freq AS (
        SELECT line FROM lines WHERE trim(line) <> ''
        GROUP BY line HAVING count(DISTINCT {id_col}) >= {min_doc_freq}),
      marked AS (
        SELECT l.{id_col}, l.pos, l.line,
               (f.line IS NOT NULL AND trim(l.line) <> '') AS rm
        FROM lines l LEFT JOIN freq f ON l.line = f.line)
      SELECT {id_col},
             coalesce(array_to_string(list_transform(
               list_filter(list_sort(list(struct_pack(pos := pos,
                                                      line := line,
                                                      rm := rm))),
                           s -> NOT s.rm),
               s -> s.line), {sql_delim}), '') AS clean_text,
             count(*)::BIGINT AS n_lines,
             sum(CASE WHEN rm THEN 1 ELSE 0 END)::BIGINT AS n_removed
      FROM marked GROUP BY {id_col}"""


# -- fuzzy (near-duplicate) decontamination ----------------------------------

FUZZY_DECON_MIN_EST = 0.5


def fuzzy_decontaminate(df: DataFrame, text_col: str, id_col: str,
                        benchmark: DataFrame, bench_id_col: str | None = None,
                        min_est: float = FUZZY_DECON_MIN_EST,
                        **lsh_kwargs) -> DataFrame:
    """NEAR-duplicate benchmark decontamination: flag corpus documents
    whose MinHash-LSH estimated Jaccard against ANY benchmark document
    reaches min_est. Complements `decontaminate` (exact n-gram overlap):
    a lightly paraphrased or whitespace-perturbed eval item defeats exact
    shingle matching but still collides in MinHash bands — the standard
    fuzzy-dedup leakage check run on public LLM training sets.

    Implementation composes the tested LSH self-join rather than a second
    cross-LSH codepath: corpus ids map to 2*id and benchmark ids to
    2*id+1, both sides union into ONE lsh_candidate_pairs call (hot-bucket
    guard and slim-payload behavior inherited via **lsh_kwargs), and only
    parity-straddling pairs count as contamination evidence. Scale shape
    is therefore identical to o03's, plus one doc-keyed join to restore
    zero-match documents.

    Returns (id, n_bench_matches, max_est_jaccard, contaminated) — one row
    per corpus document.
    """
    from .dedup import lsh_candidate_pairs

    bench_id_col = bench_id_col or id_col
    a = df.select((F.col(id_col).cast("long") * 2).alias("_uid"),
                  F.col(text_col).alias("_t"))
    b = benchmark.select((F.col(bench_id_col).cast("long") * 2 + 1)
                         .alias("_uid"), F.col(text_col).alias("_t"))
    pairs = lsh_candidate_pairs(a.unionByName(b), "_t", "_uid",
                                min_est=min_est, **lsh_kwargs)
    cross = pairs.where((F.col("id_a") % 2) != (F.col("id_b") % 2))
    doc_uid = F.when(F.col("id_a") % 2 == 0,
                     F.col("id_a")).otherwise(F.col("id_b"))
    hits = (cross.select(doc_uid.alias("_uid"), "est_jaccard")
            .groupBy("_uid")
            .agg(F.count(F.lit(1)).alias("n_bench_matches"),
                 F.max("est_jaccard").alias("max_est_jaccard")))
    base = df.select(F.col(id_col),
                     (F.col(id_col).cast("long") * 2).alias("_uid"))
    return (base.join(hits, "_uid", "left")
            .select(F.col(id_col),
                    F.coalesce("n_bench_matches", F.lit(0)).cast("bigint")
                     .alias("n_bench_matches"),
                    round6(F.coalesce("max_est_jaccard", F.lit(0.0)))
                     .alias("max_est_jaccard"),
                    (F.coalesce("max_est_jaccard", F.lit(0.0))
                     >= F.lit(min_est)).cast("int").alias("contaminated")))


def unigram_xent_score(df: DataFrame, text_col: str, id_col: str,
                       smooth_k: float = 0.5) -> DataFrame:
    """Self-trained unigram LM cross-entropy per document — the CCNet-style
    perplexity quality filter reduced to a unigram model learned from the
    corpus itself (no external LM ships in this environment; the ranking
    behavior — boilerplate-typical docs score low, rare-token noise scores
    high — is the same signal).

    p(tok) = (c_tok + k) / (T + k*V) with add-k smoothing over the
    observed vocab; xent(doc) = mean over the doc's tokens of -log2
    p(tok); perplexity = 2^xent (monotone, so not emitted). Docs with no
    tokens get NULL xent.

    Cross-engine determinism: per-token scores round to 6 decimals and sum
    through DECIMAL (FP sums are partition-order-dependent); corpus totals
    (T, V) ride ONE single-row broadcast cross join — count aggregates,
    not collects. Scale: explode -> one token-keyed count WINDOW (the
    per-token LM count, replacing round-11's vocab groupBy + join-back
    which evaluated the explode subtree twice and shuffled both join
    sides — the round-12 double-evaluation law, sf10 measured ~8.1 ->
    ~6.1 s), one stats aggregate (T + distinct V in one pass), one
    groupBy doc.

    Returns (id, n_tokens, xent)."""
    tk = df.select(F.col(id_col),
                   F.explode(tokens(F.col(text_col))).alias("tok"))
    stats = tk.agg(F.count(F.lit(1)).cast("double").alias("_t"),
                   F.countDistinct("tok").cast("double").alias("_v"))
    wt = Window.partitionBy("tok")
    lp = round6(-F.log2((F.col("c") + F.lit(float(smooth_k)))
                        / (F.col("_t") + F.lit(float(smooth_k))
                           * F.col("_v"))))
    per = (tk.withColumn("c", F.count(F.lit(1)).over(wt))
             .crossJoin(F.broadcast(stats))
             .groupBy(id_col)
             .agg(F.count(F.lit(1)).alias("n_tokens"),
                  F.sum(lp.cast("decimal(28,6)")).alias("_s")))
    return (df.select(id_col).join(per, id_col, "left")
              .select(F.col(id_col),
                      F.coalesce("n_tokens", F.lit(0).cast("long"))
                       .alias("n_tokens"),
                      round6(F.col("_s").cast("double")
                             / F.col("n_tokens").cast("double"))
                       .alias("xent")))


def xent_quality_buckets(df: DataFrame, text_col: str, id_col: str,
                         lang_col: str, n_buckets: int = 3,
                         smooth_k: float = 0.5) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al., "CCNet:
    Extracting high quality monolingual datasets from web crawl data",
    LREC 2020): score every document with the self-trained unigram LM
    cross-entropy (unigram_xent_score) and split each LANGUAGE into
    n_buckets quality tiers (1 = head/lowest xent ... n = tail). Returns
    (id, lang, xent, bucket); token-less documents (xent NULL) get
    bucket NULL.

    Bucket contract — VALUE-based, not row-ntile: a document's bucket is
    ceil(n_buckets * cum / tot) where cum counts the language's documents
    with xent <= this document's xent and tot the language's scored
    documents. Ties therefore share a bucket (sizes are ~equal rather
    than exactly equal) — that is what makes the operator scale: the
    cumulative sums run over the (lang, xent) HISTOGRAM (one hash
    shuffle, rows = distinct rounded xent values per language), never a
    per-language total sort of the documents themselves, and documents
    get their bucket back through a hash join on (lang, xent). The
    arithmetic is integer-exact on both engines (ceil(a/b) =
    (a-1) div b + 1), so the DuckDB twin is bit-identical."""
    if n_buckets < 2:
        raise ValueError("n_buckets must be >= 2")
    xs = unigram_xent_score(df, text_col, id_col, smooth_k)
    base = (df.select(F.col(id_col), F.col(lang_col).alias("lang"))
            .join(xs.select(id_col, "xent"), id_col))
    # base feeds the histogram AND the final join-back (shared-subtree
    # law), but deliberately NOT checkpointed (r13 A/B): the full-output
    # gain is only ~10% (2.24 -> 2.00 s at sf1 — the xent count window
    # re-evaluates cheaply against its own shuffle), while a checkpoint
    # here blocks Catalyst from pruning/pushing the caller's projections
    # and filters through this operator into the text scan (a count-style
    # consumer measured 0.8 -> 15.7 s WITH the checkpoint). The
    # lsh/hamming/pmi checkpoints don't pay this: their materialized
    # frames are internal to self-join pyramids where pushdown was
    # already impossible and the re-evaluated subtrees are 4-40x dearer.
    hist = (base.where(F.col("xent").isNotNull())
            .groupBy("lang", "xent").agg(F.count(F.lit(1)).alias("_c")))
    w = Window.partitionBy("lang").orderBy(F.col("xent").asc())
    cum = F.sum("_c").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    tot = F.sum("_c").over(Window.partitionBy("lang"))
    kb = F.lit(n_buckets).cast("bigint")
    bucket = F.least(kb, F.expr(f"(cum * {n_buckets} - 1) div tot") + 1)
    vals = (hist.select("lang", "xent", cum.alias("cum"),
                        tot.alias("tot"))
            .select("lang", "xent", bucket.cast("bigint").alias("bucket")))
    return (base.join(vals, ["lang", "xent"], "left")
            .select(F.col(id_col), "lang", "xent", "bucket"))


def sql_xent_quality_buckets(table: str, text_col: str, id_col: str,
                             lang_col: str, n_buckets: int = 3,
                             smooth_k: float = 0.5) -> str:
    """DuckDB twin of xent_quality_buckets — same histogram CDF, same
    integer ceil arithmetic."""
    k = n_buckets
    xent_sql = sql_unigram_xent(table, text_col, id_col, smooth_k)
    return f"""
      WITH xs AS ({xent_sql}),
      base AS (SELECT d.{id_col}, d.{lang_col} AS lang, xs.xent
               FROM {table} d JOIN xs ON d.{id_col} = xs.{id_col}),
      hist AS (SELECT lang, xent, count(*)::BIGINT AS c
               FROM base WHERE xent IS NOT NULL GROUP BY 1, 2),
      cdf AS (SELECT lang, xent,
                     sum(c) OVER (PARTITION BY lang ORDER BY xent
                                  ROWS UNBOUNDED PRECEDING) AS cum,
                     sum(c) OVER (PARTITION BY lang) AS tot
              FROM hist),
      b AS (SELECT lang, xent,
                   least({k}, ((cum * {k} - 1) // tot) + 1)::BIGINT
                     AS bucket
            FROM cdf)
      SELECT base.{id_col}, base.lang, base.xent, b.bucket
      FROM base LEFT JOIN b USING (lang, xent)"""


def sql_unigram_xent(table: str, text_col: str, id_col: str,
                     smooth_k: float = 0.5) -> str:
    """DuckDB twin: identical smoothing arithmetic (same operation order),
    identical per-token round6 -> DECIMAL sum."""
    k = float(smooth_k)
    lp = sql_round6(f"(-log2((c + {k!r}) / (t + {k!r} * v)))")
    xent = sql_round6("(s::DOUBLE / n_tokens::DOUBLE)")
    return f"""
      WITH tk AS (SELECT {id_col}, unnest({sql_tokens(text_col)}) AS tok
                  FROM {table}),
      voc AS (SELECT tok, count(*)::BIGINT AS c FROM tk GROUP BY 1),
      tot AS (SELECT count(*)::DOUBLE AS t FROM tk),
      vsz AS (SELECT count(*)::DOUBLE AS v FROM voc),
      per AS (SELECT {id_col}, count(*)::BIGINT AS n_tokens,
                     sum(({lp})::DECIMAL(28,6)) AS s
              FROM tk JOIN voc USING (tok) CROSS JOIN tot CROSS JOIN vsz
              GROUP BY 1)
      SELECT d.{id_col}, coalesce(per.n_tokens, 0)::BIGINT AS n_tokens,
             {xent} AS xent
      FROM {table} d LEFT JOIN per ON d.{id_col} = per.{id_col}"""
