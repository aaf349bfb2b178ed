"""Text-analysis operators: language ID, quality scoring, token counting,
document fingerprinting. All pure column expressions (JVM codegen, no UDFs)
with exact DuckDB-SQL twins driven by the same constants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.hashing import (
    affine_hash, minhash_params, portable_hash32, sql_affine_hash,
    sql_hash32, sql_tokens, sql_word_shingles, tokens, word_shingles)

# marker stopwords per language, fixed order = deterministic argmax tiebreak
LANG_MARKERS: list[tuple[str, list[str]]] = [
    ("en", ["the", "a", "of", "and", "to"]),
    ("de", ["der", "die", "das", "und", "ist"]),
    ("fr", ["le", "la", "les", "et", "est"]),
    ("es", ["el", "los", "las", "es", "y"]),
]

STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it"]

BPE_ISH_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def _marker_re(words: list[str]) -> str:
    return r"\b(" + "|".join(words) + r")\b"


def token_counts(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Whitespace token count + BPE-ish regex token count + char count."""
    c = F.col(text_col)
    return df.select(
        F.col(id_col),
        F.size(tokens(c)).cast("bigint").alias("ws_tokens"),
        F.regexp_count(c, F.lit(BPE_ISH_RE)).cast("bigint").alias("bpe_tokens"),
        F.length(c).cast("bigint").alias("n_chars"),
    )


def sql_token_counts(table: str, text_col: str, id_col: str) -> str:
    return (
        f"SELECT {id_col}, len({sql_tokens(text_col)})::BIGINT AS ws_tokens, "
        f"len(regexp_extract_all({text_col}, '{BPE_ISH_RE}'))::BIGINT AS bpe_tokens, "
        f"length({text_col})::BIGINT AS n_chars FROM {table}"
    )


def lang_id(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Marker-word language ID: argmax of per-language marker hits; 'und'
    when nothing matches. Deterministic tiebreak by LANG_MARKERS order."""
    c = F.lower(F.col(text_col))
    hits = [F.regexp_count(c, F.lit(_marker_re(w))).alias(f"hits_{lang}")
            for lang, w in LANG_MARKERS]
    scored = df.select(F.col(id_col), *hits)
    # first language (in LANG_MARKERS order) reaching the max count wins
    max_hits = F.greatest(*[F.col(f"hits_{lang}") for lang, _ in LANG_MARKERS])
    pred = F.lit("und")
    for lang, _ in reversed(LANG_MARKERS):
        pred = F.when((F.col(f"hits_{lang}") == max_hits) & (max_hits > 0),
                      F.lit(lang)).otherwise(pred)
    return scored.select(F.col(id_col), pred.alias("pred_lang"))


def sql_lang_id(table: str, text_col: str, id_col: str) -> str:
    hit_cols = ", ".join(
        f"len(regexp_extract_all(lower({text_col}), '{_marker_re(w)}')) AS hits_{lang}"
        for lang, w in LANG_MARKERS)
    langs = [lang for lang, _ in LANG_MARKERS]
    max_expr = "greatest(" + ", ".join(f"hits_{lang}" for lang in langs) + ")"
    case = "CASE "
    for lang in langs:  # forward order: first max wins, matching the Spark expr
        case += f"WHEN hits_{lang} = {max_expr} AND {max_expr} > 0 THEN '{lang}' "
    case += "ELSE 'und' END"
    return (f"SELECT {id_col}, {case} AS pred_lang FROM "
            f"(SELECT {id_col}, {hit_cols} FROM {table})")


def quality_score(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Heuristic quality in [0,1]: length saturation, alpha ratio, stopword
    presence, moderate punctuation. Deterministic weighted sum."""
    c = F.col(text_col)
    n_tok = F.size(tokens(c)).cast("double")
    n_chars = F.length(c).cast("double")
    alpha = F.regexp_count(c, F.lit(r"[A-Za-z]")).cast("double")
    punct = F.regexp_count(c, F.lit(r"[^A-Za-z0-9\s]")).cast("double")
    stop = F.regexp_count(F.lower(c), F.lit(_marker_re(STOPWORDS))).cast("double")
    len_score = F.least(n_tok / F.lit(50.0), F.lit(1.0))
    alpha_ratio = F.when(n_chars > 0, alpha / n_chars).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tok > 0, F.least(stop / n_tok * 5.0, F.lit(1.0))) \
                  .otherwise(F.lit(0.0))
    punct_penalty = F.when(n_chars > 0, F.least(punct / n_chars * 10.0, F.lit(1.0))) \
                     .otherwise(F.lit(0.0))
    score = (0.35 * len_score + 0.3 * alpha_ratio + 0.25 * stop_ratio
             + 0.1 * (1.0 - punct_penalty))
    return df.select(F.col(id_col), F.round(score, 6).alias("quality"))


def sql_quality_score(table: str, text_col: str, id_col: str) -> str:
    toks = f"len({sql_tokens(text_col)})::DOUBLE"
    n_chars = f"length({text_col})::DOUBLE"
    alpha = f"len(regexp_extract_all({text_col}, '[A-Za-z]'))::DOUBLE"
    punct = f"len(regexp_extract_all({text_col}, '[^A-Za-z0-9\\s]'))::DOUBLE"
    stop = (f"len(regexp_extract_all(lower({text_col}), "
            f"'{_marker_re(STOPWORDS)}'))::DOUBLE")
    return f"""
      SELECT {id_col}, round(
        0.35 * least({toks} / 50.0, 1.0)
        + 0.3 * (CASE WHEN {n_chars} > 0 THEN {alpha} / {n_chars} ELSE 0.0 END)
        + 0.25 * (CASE WHEN {toks} > 0
                  THEN least({stop} / {toks} * 5.0, 1.0) ELSE 0.0 END)
        + 0.1 * (1.0 - (CASE WHEN {n_chars} > 0
                        THEN least({punct} / {n_chars} * 10.0, 1.0)
                        ELSE 0.0 END)), 6) AS quality
      FROM {table}"""


def fingerprint(df: DataFrame, text_col: str, id_col: str,
                shingle_k: int = 3, seed: int = 7) -> DataFrame:
    """Rolling-hash document fingerprint: min affine hash over k-word
    shingles (a 1-function minhash); -1 sentinel for shingle-less docs."""
    (a, b) = minhash_params(1, seed)[0]
    sh = word_shingles(F.col(text_col), shingle_k)
    fp = F.array_min(F.transform(
        sh, lambda s: affine_hash(portable_hash32(s), a, b)))
    return df.select(F.col(id_col),
                     F.coalesce(fp, F.lit(-1)).cast("bigint").alias("fingerprint"))


def sql_fingerprint(table: str, text_col: str, id_col: str,
                    shingle_k: int = 3, seed: int = 7) -> str:
    (a, b) = minhash_params(1, seed)[0]
    sh = sql_word_shingles(text_col, shingle_k)
    ah = sql_affine_hash(sql_hash32("s"), a, b)
    return (f"SELECT {id_col}, coalesce(list_min(list_transform({sh}, "
            f"s -> {ah})), -1)::BIGINT AS fingerprint FROM {table}")
