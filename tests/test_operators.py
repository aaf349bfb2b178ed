"""Pipeline operators on hand-built fixtures with known answers."""

import math

import pytest
from pyspark.sql import functions as F

from conftest import load
from relationaldecomposition_spark.operators import (
    dedup, multimodal, similarity, text)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),        # exact dup of 1
        (3, "the quick brown fox jumps over the lazy cat"),        # near dup of 1
        (4, "completely different words here entirely unrelated"),
        (5, ""),                                                    # empty
        (6, "tiny"),                                                # < shingle size
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_dedup(docs):
    out = {r["keep_id"]: r["n_copies"]
           for r in dedup.exact_dedup(docs, ["text"], "doc_id").collect()}
    assert out[1] == 2          # docs 1,2 collapse, min id survives
    assert out[3] == 1
    assert sum(out.values()) == 6


def test_minhash_near_dup_similarity(docs):
    sigs = {r["doc_id"]: [r[f"mh_{i}"] for i in range(8)]
            for r in dedup.minhash_signatures(docs, "text", "doc_id").collect()}
    assert sigs[1] == sigs[2]   # identical docs -> identical signatures
    agree_13 = sum(a == b for a, b in zip(sigs[1], sigs[3]))
    agree_14 = sum(a == b for a, b in zip(sigs[1], sigs[4]))
    assert agree_13 > agree_14  # near-dup agrees more than unrelated
    # empty/tiny docs get sentinel signatures, never colliding with real docs
    assert sigs[5] == sigs[6]
    assert sigs[5] != sigs[1]


def test_minhash_kernel_parity(spark, docs, sf_dir):
    """The r14 Arrow minhash kernel must be BIT-identical to the JVM expr
    path — signatures reach oracle-pinned outputs (o03/o05/o17/o50/o59),
    so this is a correctness pin, not a tolerance check. Covers the
    planted fixture, adversarial token shapes (unicode whitespace that
    Java \\s does NOT split, NBSP inside tokens, empty/whitespace-only/
    NULL text, duplicate shingles, exactly-k tokens), both hash-bank
    widths (8 and 33 — the >16 width exercises the chunked bank), and
    the real documents table."""
    from pyspark.sql import Row

    def both(df, **kw):
        a = {r[0]: tuple(r[1:]) for r in dedup.minhash_signatures(
            df, "text", "doc_id", kernel="arrow", **kw).collect()}
        e = {r[0]: tuple(r[1:]) for r in dedup.minhash_signatures(
            df, "text", "doc_id", kernel="expr", **kw).collect()}
        return a, e

    a, e = both(docs)
    assert a == e

    tricky = spark.createDataFrame([
        Row(doc_id=1, text="plain three token shingle case"),
        Row(doc_id=2, text="  leading and trailing   runs  "),
        Row(doc_id=3, text="tab\tand\nnewline\rseparated tokens here"),
        Row(doc_id=4, text="nbsp inside one token pair here"),
        Row(doc_id=5, text="dup dup dup dup dup dup"),
        Row(doc_id=6, text="exactly three tokens"),
        Row(doc_id=7, text="two tokens"),
        Row(doc_id=8, text=""),
        Row(doc_id=9, text="   \t  "),
        Row(doc_id=10, text=None),
        Row(doc_id=11, text="ünïcødé tökens ärè hàshéd as utf8 bytes"),
    ])
    a, e = both(tricky)
    assert a == e
    a, e = both(tricky, n_hashes=33, shingle_k=2, seed=7)
    assert a == e

    real = load(spark, "documents", sf_dir).limit(200)
    a, e = both(real)
    assert a == e


def test_lsh_pairs_find_exact_dup(docs):
    pairs = {(r["id_a"], r["id_b"]): r["est_jaccard"]
             for r in dedup.lsh_candidate_pairs(docs, "text", "doc_id").collect()}
    assert pairs.get((1, 2)) == 1.0
    assert (1, 4) not in pairs and (2, 4) not in pairs
    # sentinel signatures must not pair empty docs together
    assert (5, 6) not in pairs


def test_simhash_properties(docs):
    out = {r["doc_id"]: r["simhash"]
           for r in dedup.simhash(docs, "text", "doc_id").collect()}
    assert out[1] == out[2]
    assert out[5] == 0  # no tokens -> zero signature
    # near-dup hamming distance < unrelated hamming distance
    def ham(a, b):
        return bin(a ^ b).count("1")
    assert ham(out[1], out[3]) < ham(out[1], out[4])


def test_simhash_pairs_matches_all_pairs_oracle(spark, docs):
    """Pigeonhole block join must return EXACTLY the all-pairs hamming
    filter (lossless by the pigeonhole bound), across several
    max_hamming/n_blocks shapes, including uneven block widths."""
    sigs = {r["doc_id"]: r["simhash"]
            for r in dedup.simhash(docs, "text", "doc_id").collect()}

    def ham(a, b):
        return bin(a ^ b).count("1")

    ids = sorted(sigs)
    for max_h, n_blocks in ((3, None), (3, 5), (6, 7), (0, None)):
        expected = {(a, b, ham(sigs[a], sigs[b]))
                    for i, a in enumerate(ids) for b in ids[i + 1:]
                    if ham(sigs[a], sigs[b]) <= max_h}
        got = {(r["id_a"], r["id_b"], r["hamming"])
               for r in dedup.simhash_pairs(
                   docs, "text", "doc_id", max_hamming=max_h,
                   n_blocks=n_blocks).collect()}
        assert got == expected, (max_h, n_blocks)
    # identical docs pair at hamming 0
    got3 = {(r["id_a"], r["id_b"]): r["hamming"]
            for r in dedup.simhash_pairs(docs, "text", "doc_id").collect()}
    assert got3[(1, 2)] == 0


def test_simhash_pairs_validation_guard_and_plan(spark, docs):
    import re

    with pytest.raises(ValueError, match="pigeonhole"):
        dedup.simhash_pairs(docs, "text", "doc_id", max_hamming=3,
                            n_blocks=3)
    with pytest.raises(ValueError, match="n_blocks"):
        dedup.simhash_pairs(docs, "text", "doc_id", bits=4,
                            max_hamming=5)
    # hot-bucket guard: cap 1 drops every shared bucket -> no pairs
    assert dedup.simhash_pairs(docs, "text", "doc_id",
                               max_bucket=1).count() == 0
    # plan: equi-join on (block, value), no cartesian product, and the
    # signature aggregate appears ONCE per join side (the literal-param
    # explode keeps CollapseProject from cloning the 32 bit-sums)
    plan = (dedup.simhash_pairs(docs, "text", "doc_id")
            ._jdf.queryExecution().executedPlan().toString())
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_duplicate_spans_single_evaluation_plan(spark):
    """Plan-shape pin for the span operators (r12 count-window law + r14
    Arrow-kernel rework): occurrences come from the zero-exchange
    exploded_shingle_hashes kernel (NO Generate/posexplode, no lead
    window), duplicated starts from ONE count window over the hash, and
    remove_duplicate_spans' excision/reassembly is a second map-side
    kernel (no boundary-event union, no coverage window, no collect_list
    reassembly shuffle)."""
    docs = spark.createDataFrame([(1, "a b c d e f g h i j")],
                                 "doc_id long, text string")
    plan = lambda df: df._jdf.queryExecution().executedPlan().toString()
    p1 = plan(dedup.duplicate_spans(docs, "text", "doc_id"))
    assert p1.count("Generate ") == 0, p1
    assert p1.count("MapInPandas") == 1, p1
    p2 = plan(dedup.remove_duplicate_spans(docs, "text", "doc_id"))
    assert p2.count("Generate ") == 0, p2
    assert p2.count("MapInPandas") == 2, p2  # occurrences + excision
    # exactly one window remains in each: the corpus-wide count over _h
    assert p1.count("Window ") == 1 and p2.count("Window ") == 1, (p1, p2)


def test_duplicate_spans_brute_force(spark):
    """duplicate_spans equals a per-doc python re-derivation, including
    within-doc repeats, short docs, and null text."""
    rows = [
        (1, "a b c d a b c d"),       # shingle "a b c d" occurs twice IN-DOC
        (2, "a b c d x y z w"),       # shares "a b c d" with doc 1
        (3, "p q r s t u v"),         # unique spans
        (4, "one two three"),         # < k tokens -> 0 spans
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    k = 4
    import collections
    occ = collections.Counter()
    per_doc: dict[int, list[str]] = {}
    for did, txt in rows:
        toks = (txt or "").split()
        spans = [" ".join(toks[i:i + k])
                 for i in range(len(toks) - k + 1)]
        per_doc[did] = spans
        occ.update(spans)
    got = {r["doc_id"]: (r["n_spans"], r["n_dup_spans"], r["dup_ratio"])
           for r in dedup.duplicate_spans(df, "text", "doc_id",
                                          shingle_k=k).collect()}
    for did, spans in per_doc.items():
        n_dup = sum(1 for s in spans if occ[s] >= 2)
        exp_ratio = round(n_dup / len(spans), 6) if spans else 0.0
        assert got[did] == (len(spans), n_dup, exp_ratio), did
    with pytest.raises(ValueError, match="min_count"):
        dedup.duplicate_spans(df, "text", "doc_id", min_count=1)


def test_remove_duplicate_spans_brute_force(spark):
    """remove_duplicate_spans equals a per-doc python re-derivation:
    token i is removed iff some corpus-duplicated k-shingle occurrence
    covers it. Covers in-doc repeats, overlapping spans merging, short
    docs, null text."""
    rows = [
        (1, "a b c d a b c d"),       # in-doc repeat: everything covered
        (2, "a b c d x y z w"),       # cross-doc head dup, unique tail
        (3, "q q a b c d e f"),       # overlapping dups merge: a..f cut
        (4, "e f g h a b c d"),       # only "a b c d"? (e f g h unique)
        (5, "one two three"),         # < k tokens -> untouched
        (6, None),
        (7, "b c d e f g h i"),       # shares "b c d e".."c d e f" w/ 3?
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    k = 4
    import collections
    occ = collections.Counter()
    for _, txt in rows:
        toks = (txt or "").split()
        occ.update(" ".join(toks[i:i + k])
                   for i in range(len(toks) - k + 1))
    got = {r["doc_id"]: (r["text"], r["n_tokens"], r["n_removed_tokens"])
           for r in dedup.remove_duplicate_spans(
               df, "text", "doc_id", shingle_k=k).collect()}
    for did, txt in rows:
        toks = (txt or "").split()
        covered = set()
        for i in range(len(toks) - k + 1):
            if occ[" ".join(toks[i:i + k])] >= 2:
                covered.update(range(i, i + k))
        survivors = [t for i, t in enumerate(toks) if i not in covered]
        assert got[did] == (" ".join(survivors), len(toks),
                            len(covered)), did
        # property: every removed region really was duplicated (covered
        # only grows from >=2-count shingles by construction of the
        # expectation — assert the OPERATOR's removal count matches it)
        assert got[did][2] == len(covered)
        # property: survivors tokenize to the original minus the spans
        assert got[did][0].split() == survivors
    with pytest.raises(ValueError, match="min_count"):
        dedup.remove_duplicate_spans(df, "text", "doc_id", min_count=1)


def test_remove_duplicate_spans_randomized(spark):
    """Property sweep on a seeded random corpus over a tiny alphabet
    (guarantees collisions): operator == python oracle for every doc."""
    import random

    rng = random.Random(99)
    rows = [(i, " ".join(rng.choice("abcde")
                         for _ in range(rng.randrange(0, 20))))
            for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    k = 3
    import collections
    occ = collections.Counter()
    for _, txt in rows:
        toks = txt.split()
        occ.update(" ".join(toks[i:i + k])
                   for i in range(len(toks) - k + 1))
    got = {r["doc_id"]: (r["text"], r["n_removed_tokens"])
           for r in dedup.remove_duplicate_spans(
               df, "text", "doc_id", shingle_k=k).collect()}
    for did, txt in rows:
        toks = txt.split()
        covered = set()
        for i in range(len(toks) - k + 1):
            if occ[" ".join(toks[i:i + k])] >= 2:
                covered.update(range(i, i + k))
        exp = " ".join(t for i, t in enumerate(toks) if i not in covered)
        assert got[did] == (exp, len(covered)), did


def _remove_spans_oracle(rows, k, min_count=2, min_span=1):
    """Python re-derivation of remove_duplicate_spans incl. the
    min_span_tokens merge-then-filter rule."""
    import collections
    occ = collections.Counter()
    for _, txt in rows:
        toks = (txt or "").split()
        occ.update(" ".join(toks[i:i + k])
                   for i in range(len(toks) - k + 1))
    out = {}
    for did, txt in rows:
        toks = (txt or "").split()
        covered = set()
        for i in range(len(toks) - k + 1):
            if occ[" ".join(toks[i:i + k])] >= min_count:
                covered.update(range(i, i + k))
        # merge into maximal runs, drop runs shorter than min_span
        excised = set()
        run: list[int] = []
        for i in range(len(toks) + 1):
            if i in covered:
                run.append(i)
            else:
                if len(run) >= min_span:
                    excised.update(run)
                run = []
        out[did] = (" ".join(t for i, t in enumerate(toks)
                             if i not in excised),
                    len(toks), len(excised))
    return out


def test_remove_duplicate_spans_min_span_tokens(spark):
    """min_span_tokens keeps maximal covered runs shorter than the
    threshold: operator == python oracle on a seeded random corpus for
    several thresholds (1 = unchanged ExactSubstr semantics)."""
    import random

    rng = random.Random(7)
    rows = [(i, " ".join(rng.choice("abcd")
                         for _ in range(rng.randrange(0, 24))))
            for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    k = 3
    for min_span in (1, 4, 6, 10):
        exp = _remove_spans_oracle(rows, k, min_span=min_span)
        got = {r["doc_id"]: (r["text"], r["n_tokens"],
                             r["n_removed_tokens"])
               for r in dedup.remove_duplicate_spans(
                   df, "text", "doc_id", shingle_k=k,
                   min_span_tokens=min_span).collect()}
        assert got == exp, min_span
    with pytest.raises(ValueError, match="shingle_k"):
        dedup.remove_duplicate_spans(df, "text", "doc_id", shingle_k=0)
    with pytest.raises(ValueError, match="min_span_tokens"):
        dedup.remove_duplicate_spans(df, "text", "doc_id",
                                     min_span_tokens=0)


def test_remove_duplicate_spans_precision_on_idioms(spark):
    """Natural-corpus regime (Lee ACL'22 excises ~50-token substrings):
    docs share ONE long boilerplate block (true duplication) and short
    8-token idioms (incidental). At defaults every idiom occurrence is
    cut; min_span_tokens=25 removes the boilerplate with perfect
    precision and keeps the idioms."""
    k = 8
    boiler = " ".join(f"boiler{i}" for i in range(50))
    idiom = "as a matter of fact it turns out"  # exactly 8 tokens
    rows = []
    for d in range(6):
        body = " ".join(f"d{d}w{j}" for j in range(30))
        tail = " ".join(f"d{d}t{j}" for j in range(20))
        rows.append((d, f"{body} {idiom} {tail} {boiler}"))
    df = spark.createDataFrame(rows, "doc_id bigint, text string")

    strict = {r["doc_id"]: r for r in dedup.remove_duplicate_spans(
        df, "text", "doc_id", shingle_k=k).collect()}
    tuned = {r["doc_id"]: r for r in dedup.remove_duplicate_spans(
        df, "text", "doc_id", shingle_k=k, min_span_tokens=25).collect()}
    for d in range(6):
        # defaults cut the idiom too (8-token covered run)
        assert idiom not in strict[d]["text"]
        assert "boiler0" not in strict[d]["text"]
        # tuned: boilerplate gone, idiom kept -> removal is exactly the
        # 50 boilerplate tokens (precision 1.0 on the planted dup)
        assert idiom in tuned[d]["text"]
        assert "boiler0" not in tuned[d]["text"]
        assert tuned[d]["n_removed_tokens"] == 50


def test_ngram_jaccard_exact_value(docs):
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"]
             for r in dedup.ngram_jaccard_pairs(docs, "text", "doc_id",
                                                shingle_k=3, tau=0.1).collect()}
    assert pairs[(1, 2)] == 1.0
    # doc1 vs doc3: 9 tokens -> 7 shingles each; 6 shared ("lazy dog" vs
    # "lazy cat" breaks the last shingle... compute: differs in final token,
    # affecting shingles containing it: positions 5,6,7 -> 3 changed? tokens:
    # the quick brown fox jumps over the lazy dog|cat; shingles 7, those
    # including token9: shingles starting at 7 (the lazy X) only -> 1 of 7
    # changed from each set: inter=6, union=8 -> 0.75
    assert pairs[(1, 3)] == pytest.approx(6 / 8)


@pytest.fixture(scope="module")
def vecs(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0, 0.0]),   # close to 0
        (2, [0.0, 1.0, 0.0, 0.0]),   # orthogonal to 0
        (3, [-1.0, 0.0, 0.0, 0.0]),  # opposite of 0
        (4, [0.5, 0.5, 0.0, 0.0]),
    ]
    return spark.createDataFrame(rows, ["vec_id", "embedding"]) \
        .select("vec_id", F.col("embedding").cast("array<float>").alias("embedding"))


def test_cosine_pairs_values(vecs):
    pairs = {(r["id_a"], r["id_b"]): r["cosine"]
             for r in dedup.embedding_cosine_pairs(vecs, "embedding", "vec_id",
                                                   tau=-2.0).collect()}
    assert pairs[(0, 2)] == pytest.approx(0.0, abs=1e-6)
    assert pairs[(0, 3)] == pytest.approx(-1.0, abs=1e-6)
    assert pairs[(0, 1)] == pytest.approx(0.9 / math.sqrt(0.82), abs=1e-6)


def test_cosine_topk_ordering(vecs):
    out = similarity.cosine_topk(vecs, "embedding", "vec_id",
                                 query_ids=[0], k=4).collect()
    order = [r["neighbor_id"] for r in sorted(out, key=lambda r: r["rank"])]
    assert order == [1, 4, 2, 3]  # by descending cosine to vec 0


def test_lsh_topk_subset_of_exact(vecs):
    # bucketed results are a subset of brute-force for the same query,
    # with identical cosines where present
    exact = {(r["query_id"], r["neighbor_id"]): r["cosine"]
             for r in similarity.cosine_topk(vecs, "embedding", "vec_id",
                                             [0], 4).collect()}
    lsh = similarity.lsh_bucketed_topk(vecs, "embedding", "vec_id", [0], 4,
                                       n_planes=4, dim=4).collect()
    for r in lsh:
        key = (r["query_id"], r["neighbor_id"])
        assert key in exact
        assert r["cosine"] == pytest.approx(exact[key], abs=1e-9)


def test_token_counts(docs):
    out = {r["doc_id"]: r for r in text.token_counts(docs, "text", "doc_id").collect()}
    assert out[1]["ws_tokens"] == 9
    assert out[5]["ws_tokens"] == 0
    assert out[6]["ws_tokens"] == 1
    assert out[1]["n_chars"] == len("the quick brown fox jumps over the lazy dog")


def test_lang_id(spark):
    rows = [(1, "the cat and the dog of a house"),
            (2, "der Hund und die Katze ist gut"),
            (3, "le chat et la maison est grande"),
            (4, "xyzzy plugh qwerty")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r["pred_lang"] for r in text.lang_id(df, "text", "doc_id").collect()}
    assert out[1] == "en" and out[2] == "de" and out[3] == "fr" and out[4] == "und"


def test_quality_monotone(spark):
    rows = [(1, "the cat and the dog of a house with many words " * 5),
            (2, "!!! ??? ### $$$ %%%")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r["quality"] for r in text.quality_score(df, "text", "doc_id").collect()}
    assert out[1] > out[2]
    assert 0.0 <= out[2] <= out[1] <= 1.0


def test_fingerprint_stability(docs):
    out1 = {r["doc_id"]: r["fingerprint"] for r in text.fingerprint(docs, "text", "doc_id").collect()}
    out2 = {r["doc_id"]: r["fingerprint"] for r in text.fingerprint(docs, "text", "doc_id").collect()}
    assert out1 == out2
    assert out1[1] == out1[2]       # identical docs -> identical fingerprint
    assert out1[5] == -1            # sentinel for shingle-less docs


def test_multimodal_plumbing(docs):
    media = multimodal.documents_as_media(docs, "text", "doc_id")
    assert dict(media.dtypes)["content"] == "binary"
    feats = multimodal.extract_features(media, multimodal.FakeDecoder(),
                                        batch_size=2).collect()
    by_id = {r["media_id"]: r for r in feats}
    assert len(by_id) == 6
    n = len("the quick brown fox jumps over the lazy dog")
    assert by_id[1]["n_bytes"] == n
    assert by_id[1]["width"] == n % 640
    assert by_id[1]["height"] == (n * 7) % 480
    assert by_id[5]["n_bytes"] == 0


def test_pillow_decoder_is_stubbed(docs):
    media = multimodal.documents_as_media(docs, "text", "doc_id")
    with pytest.raises(Exception):  # NotImplementedError surfaces via Spark
        multimodal.extract_features(media, multimodal.PillowDecoder()).collect()


def test_frame_sample_offsets(docs):
    media = multimodal.documents_as_media(docs, "text", "doc_id")
    out = multimodal.frame_sample(media, every_n_bytes=16).collect()
    doc1 = sorted(r["frame_offset"] for r in out if r["media_id"] == 1)
    n = len("the quick brown fox jumps over the lazy dog")
    assert doc1 == list(range(0, n, 16))


def test_chunk_documents_reconstruction(docs):
    """Chunks with size == stride partition the text exactly; overlapping
    chunks start every `stride` chars and carry `size` chars (short tail)."""
    out = text.chunk_documents(docs, "text", "doc_id", size=10, stride=10) \
              .collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert 5 not in by_doc                      # empty doc -> zero chunks
    for did, rows in by_doc.items():
        rows.sort(key=lambda r: r["chunk_id"])
        assert [r["chunk_id"] for r in rows] == list(range(len(rows)))
        assert [r["char_offset"] for r in rows] == \
            [i * 10 for i in range(len(rows))]
        assert "".join(r["chunk"] for r in rows) == texts[did]
        assert all(r["n_chars"] == len(r["chunk"]) for r in rows)


def test_chunk_documents_overlap(docs):
    out = text.chunk_documents(docs, "text", "doc_id", size=20, stride=10)
    rows = sorted((r for r in out.collect() if r["doc_id"] == 1),
                  key=lambda r: r["chunk_id"])
    full = "the quick brown fox jumps over the lazy dog"
    for r in rows:
        assert r["chunk"] == full[r["char_offset"]:r["char_offset"] + 20]
    # consecutive chunks share size - stride = 10 chars
    for a, b in zip(rows, rows[1:]):
        assert a["chunk"][10:] == b["chunk"][:len(a["chunk"][10:])]


def test_chunk_documents_validates_params(docs):
    with pytest.raises(ValueError):
        text.chunk_documents(docs, "text", "doc_id", size=0)
    with pytest.raises(ValueError):
        text.chunk_documents(docs, "text", "doc_id", stride=-1)


def test_exploded_shingles_match_array_shingles(spark):
    """The codegen shingle path (posexplode+lead) must produce exactly the
    word_shingles multiset per document, with >= 1 row per document and
    NULL shingles only where no complete k-shingle exists."""
    from relationaldecomposition_spark.functions.hashing import (
        exploded_shingles, tokens, word_shingles)

    rows = [(0, "a b c d e"), (1, "a b"), (2, ""), (3, "x y z"),
            (4, "dup dup dup dup"), (5, "   spaced   out   words  here ")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for k in (1, 2, 3):
        arr = {r["doc_id"]: sorted(r["sh"]) for r in df.select(
            "doc_id", word_shingles(F.col("text"), k).alias("sh")).collect()}
        ex = {}
        for r in exploded_shingles(df, "text", "doc_id", k).collect():
            ex.setdefault(r["doc_id"], []).append(r["shingle"])
        for i, _ in rows:
            got = sorted(s for s in ex[i] if s is not None)
            assert got == arr[i], (i, k)
            # every doc is represented even when it has no shingles
            assert len(ex[i]) >= 1


def test_incremental_dedup_against_index(spark, docs):
    """Corpus index = docs 1 and 4; new batch = 2 (exact dup of 1), 3 (near
    dup of 1), 5/6 (shingle-less), 7 (fresh). Survivors must match a
    Python recomputation of the bucket-min-id rule from the band index."""
    corpus = docs.where("doc_id IN (1, 4)")
    fresh = spark.createDataFrame(
        [(7, "seven brand new words matching nothing else whatsoever")],
        ["doc_id", "text"])
    new = docs.where("doc_id IN (2, 3, 5, 6)").unionByName(fresh)

    idx = dedup.minhash_band_index(corpus, "text", "doc_id")
    out = {r["doc_id"]: r
           for r in dedup.incremental_dedup(new, idx, "text", "doc_id").collect()}
    assert set(out) == {2, 3, 5, 6, 7}
    # exact dup of an indexed doc: every band bucket hits the index
    assert out[2]["n_index_hits"] == 4 and not out[2]["survives"]
    # shingle-less docs occupy no buckets -> trivially survive
    assert out[5]["survives"] and out[6]["survives"]
    assert out[5]["n_index_hits"] == 0 and out[5]["n_batch_hits"] == 0
    assert out[7]["survives"]

    # brute-force parity: recompute both hit counts from the band indexes
    idx_buckets = {(r["band"], r["sig"]) for r in idx.collect()}
    new_bk = {}
    for r in dedup.minhash_band_index(new, "text", "doc_id").collect():
        new_bk.setdefault(r["doc_id"], []).append((r["band"], r["sig"]))
    for did, row in out.items():
        bks = new_bk.get(did, [])
        exp_idx = sum(bk in idx_buckets for bk in bks)
        exp_batch = sum(
            any(o < did for o, obks in new_bk.items() if bk in obks)
            for bk in bks)
        assert row["n_index_hits"] == exp_idx, did
        assert row["n_batch_hits"] == exp_batch, did
        assert row["survives"] == (exp_idx == 0 and exp_batch == 0), did


def test_incremental_dedup_empty_index_is_batch_dedup(spark, docs):
    """With an empty index, incremental dedup reduces to the batch-internal
    bucket-min-id rule: the smallest id of each duplicate group survives."""
    empty_idx = dedup.minhash_band_index(
        docs.where("doc_id < 0"), "text", "doc_id")
    out = {r["doc_id"]: r
           for r in dedup.incremental_dedup(docs, empty_idx, "text",
                                            "doc_id").collect()}
    assert all(r["n_index_hits"] == 0 for r in out.values())
    assert out[1]["survives"]          # min id of the 1/2 dup group
    assert not out[2]["survives"]      # exact dup of 1, larger id
    assert out[4]["survives"] and out[5]["survives"] and out[6]["survives"]


def test_pack_sequences_greedy_fill(spark):
    """Per-shard greedy packing: recompute the expected bins in Python
    (id order within shard, running token cumsum) and check exact parity,
    plus the structural invariants (offsets < target, dense bins)."""
    # doc i has (i*7)%23+1 tokens
    rows = [(i, " ".join(f"t{j}" for j in range((i * 7) % 23 + 1)))
            for i in range(40)]
    rows.append((40, ""))                     # empty doc: 0 tokens
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    target, shards = 16, 4
    out = {r["doc_id"]: r for r in text.pack_sequences(
        df, "text", "doc_id", target_tokens=target, n_shards=shards).collect()}
    assert set(out) == set(range(41))
    # Python recompute
    per_shard = {}
    for i, t in sorted(rows):
        per_shard.setdefault(i % shards, []).append((i, len(t.split())))
    for sh, docs in per_shard.items():
        cum = 0
        for did, ntok in docs:
            r = out[did]
            assert r["shard"] == sh and r["tokens"] == ntok
            assert r["bin_id"] == cum // target, did
            assert r["bin_offset"] == cum % target, did
            cum += ntok
    assert all(0 <= r["bin_offset"] < target for r in out.values())


def test_pack_sequences_validates(spark, docs):
    with pytest.raises(ValueError):
        text.pack_sequences(docs, "text", "doc_id", target_tokens=0)
    with pytest.raises(ValueError):
        text.pack_sequences(docs, "text", "doc_id", n_shards=0)


def test_ingest_batch_roundtrip(spark, docs):
    """ingest_batch returns appendable index rows: after appending, a
    later batch containing a copy of a survivor is dropped."""
    corpus = docs.where("doc_id IN (1, 4)")
    idx = dedup.minhash_band_index(corpus, "text", "doc_id")
    batch1 = docs.where("doc_id = 3")        # near dup of 1 — may survive
    stats1, new_rows = dedup.ingest_batch(batch1, idx, "text", "doc_id")
    surv1 = {r["doc_id"] for r in stats1.collect() if r["survives"]}
    # index rows cover exactly the surviving, shingle-bearing docs
    assert {r["doc_id"] for r in new_rows.collect()} == surv1
    idx2 = idx.unionByName(new_rows)
    # batch 2 re-submits doc 3's text under a new id: if 3 survived it is
    # now indexed and the copy must be dropped; if 3 was itself a dup of
    # an indexed doc, the copy collides with that same index entry
    copy = docs.where("doc_id = 3").select(
        (F.col("doc_id") + 100).alias("doc_id"), "text")
    stats2 = {r["doc_id"]: r
              for r in dedup.incremental_dedup(copy, idx2, "text",
                                               "doc_id").collect()}
    assert not stats2[103]["survives"]
    if 3 in surv1:
        # exact copy of an indexed survivor: all 4 bands hit
        assert stats2[103]["n_index_hits"] == 4
    else:
        # doc 3 was itself dropped (near-dup of indexed doc 1): the copy
        # collides on exactly the bands doc 3 shared with doc 1
        assert 1 <= stats2[103]["n_index_hits"] < 4


def test_new_ops_empty_inputs(spark):
    """Empty frames must produce empty results, not analysis errors."""
    from relationaldecomposition_spark.operators.sampling import (
        rebalance_to_mixture)

    empty_docs = spark.createDataFrame([], "doc_id long, text string")
    empty_src = spark.createDataFrame([], "doc_id long, source string")
    assert text.pack_sequences(empty_docs, "text", "doc_id").count() == 0
    assert rebalance_to_mixture(empty_src, "doc_id", "source",
                                {"a": 0.5, "b": 0.5}).count() == 0
    idx = dedup.minhash_band_index(empty_docs, "text", "doc_id")
    assert idx.count() == 0
    assert dedup.incremental_dedup(empty_docs, idx, "text",
                                   "doc_id").count() == 0


def test_pack_sequences_custom_token_column(spark):
    """tokens_col packs by a precomputed (e.g. BPE) count instead of the
    whitespace default."""
    rows = [(i, "ignored text", 10 * (i + 1)) for i in range(6)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "bpe"])
    out = {r["doc_id"]: r for r in text.pack_sequences(
        df, "text", "doc_id", target_tokens=25, n_shards=1,
        tokens_col="bpe").collect()}
    cum = 0
    for i in range(6):
        assert out[i]["tokens"] == 10 * (i + 1)
        assert out[i]["bin_id"] == cum // 25
        assert out[i]["bin_offset"] == cum % 25
        cum += 10 * (i + 1)
