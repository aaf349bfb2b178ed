"""BPE (functions/bpe.py): training on the paper's classic corpus, encoder
vs an independent sequential-merge oracle, determinism, and the Spark
pandas-UDF operator end-to-end."""

import pytest

from relationaldecomposition_spark.functions.bpe import (
    END, BPEncoder, default_encoder, train_bpe)
from relationaldecomposition_spark.operators import text as T


def seq_encode(word: str, merges) -> list[str]:
    """Independent oracle: apply merges in training order (the definition);
    the production encoder uses greedy lowest-rank-first, which is
    equivalent for BPE."""
    symbols = list(word) + [END]
    for a, b in merges:
        out, i = [], 0
        while i < len(symbols):
            if i < len(symbols) - 1 and symbols[i] == a and symbols[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(symbols[i])
                i += 1
        symbols = out
    return symbols


def test_classic_corpus_merges():
    # Sennrich et al. running example: {low x5, lower x2, newest x6, widest x3}
    corpus = " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6
                      + ["widest"] * 3)
    merges = train_bpe(corpus, 10)
    # 'es' (9), 'est' (9), 'est</w>' (9) dominate, then 'lo' (7), 'low' (7)
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    assert merges[2] == ("est", END)
    assert merges[3] == ("l", "o")
    assert merges[4] == ("lo", "w")
    enc = BPEncoder(merges)
    # 'newest' is in-vocab (6 occurrences): merges all the way to one token
    assert enc.encode("newest") == ("newest</w>",)
    # 'lowest' is out-of-vocab: composes the learned 'low' + 'est</w>' units
    assert enc.encode("lowest") == ("low", "est</w>")


def test_training_deterministic():
    corpus = " ".join(seed for _, seed in T.LATIN_SEEDS)
    assert train_bpe(corpus, 64) == train_bpe(corpus, 64)


def test_greedy_equals_sequential_oracle():
    enc = default_encoder()
    merges = sorted(enc.ranks, key=enc.ranks.get)
    words = ("the weather children because beautiful qwertyuiop "
             "zusammenarbeit understanding x internationalization "
             "déjeuner förut").split()
    for w in words:
        assert list(enc.encode(w)) == seq_encode(w, merges), w


def test_count_properties():
    enc = default_encoder()
    assert enc.count_tokens(None) == 0
    assert enc.count_tokens("") == 0
    # per word: at least 1 token, at most chars+1 (nothing merged)
    for w in ["the", "a", "extraordinary", "zzzzqqqq"]:
        n = len(enc.encode(w))
        assert 1 <= n <= len(w) + 1
    # common seed words compress to a single token; rare junk stays split
    assert len(enc.encode("the")) < len(enc.encode("xqz"))


def test_spark_operator_matches_driver_side(spark):
    rows = [(1, "the quick brown fox jumps over the lazy dog"),
            (2, "children playing in the beautiful garden"),
            (3, ""), (4, None), (5, "zzz qqq xxyyzz")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["bpe_tokens"], r["ws_tokens"])
           for r in T.bpe_token_counts(df, "text", "doc_id").collect()}
    enc = default_encoder()
    for i, txt in rows:
        expect_bpe = enc.count_tokens(txt)
        assert got[i][0] == expect_bpe, (i, txt)
    assert got[3] == (0, 0)
    assert got[4][0] == 0
