"""Deterministic hash sampling: rate accuracy, determinism, scan-stage
predicate, and the sampled-entropy profiling property."""

import pytest

from pyspark.sql import functions as F

from relationaldecomposition_spark.engine.entropy import SparkEntropyEngine
from relationaldecomposition_spark.operators.sampling import (
    SAMPLE_MOD, hash_sample, hash_sample_pred)
from tests.conftest import load


@pytest.fixture(scope="module")
def ids(spark):
    return spark.range(0, 20000).withColumnRenamed("id", "k")


def test_rate_accuracy_on_dense_keys(ids):
    """Odd multiplier mod 2^16 is a bijection on the low 16 bits, so dense
    key ranges sample at the exact configured rate (±1/65536 rounding)."""
    for rate in (0.1, 0.25, 0.5):
        n = hash_sample(ids, "k", rate).count()
        assert abs(n / 20000 - rate) < 0.01, (rate, n)


def test_rate_bounds(ids):
    assert hash_sample(ids, "k", 0.0).count() == 0
    assert hash_sample(ids, "k", 1.0).count() == 20000
    with pytest.raises(ValueError):
        hash_sample_pred(F.col("k"), 1.5)


def test_deterministic_and_not_systematic(ids):
    a = {r["k"] for r in hash_sample(ids, "k", 0.25).collect()}
    b = {r["k"] for r in hash_sample(ids, "k", 0.25).collect()}
    assert a == b
    # nested samples: lower rate is a subset of higher rate (threshold cut)
    c = {r["k"] for r in hash_sample(ids, "k", 0.1).collect()}
    assert c < a
    # not periodic in the key: systematic sampling (k % m == 0) has exactly
    # one gap; the multiplicative sequence realizes the three-distance-
    # theorem maximum of 3 distinct gaps
    gaps = {y - x for x, y in zip(sorted(a), sorted(a)[1:])}
    assert len(gaps) >= 2


def test_negative_keys_supported(spark):
    df = spark.range(-1000, 1000).withColumnRenamed("id", "k")
    n = hash_sample(df, "k", 0.25).count()
    assert abs(n / 2000 - 0.25) < 0.05


def test_predicate_reaches_the_scan(spark):
    """The sample must be a pushable filter evaluated before any exchange —
    no shuffle, no sample materialization."""
    ev = load(spark, "events")
    plan = (hash_sample(ev, "event_id", 0.25)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan
    assert "Filter" in plan


def test_sampled_entropy_tracks_full(spark):
    """Profiling property: on a low-cardinality subset the plug-in entropy
    of a 25% sample lands near the full-relation entropy, and rate=1.0
    reproduces it exactly."""
    ev = load(spark, "events").select("event_id", "event_type", "user_id")
    full_eng = SparkEntropyEngine(ev, cache_input=False)
    h_full = full_eng.entropy(["event_type"])
    h2_full = full_eng.entropy(["event_type", "user_id"])
    full_eng.unpersist()

    same = SparkEntropyEngine(hash_sample(ev, "event_id", 1.0),
                              cache_input=False)
    assert same.entropy(["event_type"]) == pytest.approx(h_full, abs=1e-12)
    same.unpersist()

    smp = SparkEntropyEngine(hash_sample(ev, "event_id", 0.25),
                             cache_input=False)
    assert smp.entropy(["event_type"]) == pytest.approx(h_full, abs=0.05)
    # higher-cardinality subset: still close on this fixture, bias is low
    assert smp.entropy(["event_type", "user_id"]) == pytest.approx(
        h2_full, abs=0.2)
    smp.unpersist()


def test_stratified_rates_and_consistency(spark):
    from relationaldecomposition_spark.operators.sampling import (
        hash_sample, stratified_hash_sample)
    docs = load(spark, "documents")
    out = stratified_hash_sample(docs, "doc_id", "lang",
                                 {"en": 0.25, "zh": 1.0}, 0.5)
    by_lang = {r["lang"]: r["n"] for r in
               out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    tot = {r["lang"]: r["n"] for r in
           docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert by_lang["zh"] == tot["zh"]                  # rate 1.0 keeps all
    assert 0.1 < by_lang["en"] / tot["en"] < 0.4       # ~25%
    for lang in tot:
        if lang not in ("en", "zh"):
            assert 0.3 < by_lang.get(lang, 0) / tot[lang] < 0.7  # ~50%
    # stratum membership uses the SAME hash: a stratum sampled at rate r
    # contains exactly the global hash_sample(r) rows of that stratum
    ens = {r["doc_id"] for r in out.where(F.col("lang") == "en").collect()}
    glob = {r["doc_id"] for r in
            hash_sample(docs, "doc_id", 0.25)
            .where(F.col("lang") == "en").collect()}
    assert ens == glob


def test_stratified_validates_rates(spark):
    from relationaldecomposition_spark.operators.sampling import (
        stratified_hash_sample)
    docs = load(spark, "documents")
    with pytest.raises(ValueError):
        stratified_hash_sample(docs, "doc_id", "lang", {"en": 2.0})
    with pytest.raises(ValueError):
        stratified_hash_sample(docs, "doc_id", "lang", {}, default_rate=-0.1)


def test_mm_entropy_corrects_upward(spark, sf_dir):
    """Miller-Madow = plug-in + (m-1)/(2N ln2): strictly above the plug-in
    for m > 1, and the correction recomputes exactly from the returned
    (m, n_sample)."""
    import math

    from relationaldecomposition_spark.queries import q_a23_mm_entropy

    out = q_a23_mm_entropy(spark, sf_dir).collect()
    assert len(out) > 0
    for r in out:
        if r["m"] > 1:
            assert r["h_mm"] > r["h"]
        exp = r["h"] + round((r["m"] - 1) / (2.0 * r["n_sample"]
                                             * math.log(2.0)), 6)
        assert r["h_mm"] == pytest.approx(exp, abs=2e-6)


def test_rebalance_to_mixture(spark):
    from relationaldecomposition_spark.operators.sampling import (
        SAMPLE_MOD, SAMPLE_MULT, rebalance_to_mixture)

    # 400 web / 100 code / 50 books; target 50/30/20 -> cap is books-bound:
    # min(400/.5, 100/.3, 50/.2) = 250 -> expect ~125 / ~75 / ~50
    rows = [(i, "web") for i in range(400)]
    rows += [(1000 + i, "code") for i in range(100)]
    rows += [(2000 + i, "books") for i in range(50)]
    rows += [(3000 + i, "junk") for i in range(30)]   # untargeted: dropped
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    targets = {"web": 0.5, "code": 0.3, "books": 0.2}
    out = rebalance_to_mixture(df, "doc_id", "source", targets)
    got = {r["source"]: r["n"] for r in
           out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert "junk" not in got
    # hash-threshold sampling: exact counts are binomial around the target;
    # allow +-25% per stratum but require the mixture ordering to hold
    assert 90 <= got["web"] <= 160, got
    assert 50 <= got["code"] <= 100, got
    assert got["books"] >= 45, got                     # rate 1.0 keeps ~all
    # Python recompute of the exact thresholds -> exact row parity
    import math
    counts = {"web": 400, "code": 100, "books": 50}
    cap = min(counts[s] / p for s, p in targets.items())
    kept = set()
    for did, src in rows:
        if src not in targets:
            continue
        th = math.floor(cap * targets[src] / counts[src] * SAMPLE_MOD)
        if (did * SAMPLE_MULT) % SAMPLE_MOD < th:
            kept.add(did)
    assert {r["doc_id"] for r in out.collect()} == kept


def test_rebalance_to_mixture_validates(spark):
    from relationaldecomposition_spark.operators.sampling import (
        rebalance_to_mixture)

    df = spark.createDataFrame([(1, "a")], ["doc_id", "source"])
    with pytest.raises(ValueError):
        rebalance_to_mixture(df, "doc_id", "source", {})
    with pytest.raises(ValueError):
        rebalance_to_mixture(df, "doc_id", "source", {"a": 0.4, "b": 0.4})
    with pytest.raises(ValueError):
        rebalance_to_mixture(df, "doc_id", "source", {"a": 1.5, "b": -0.5})


# ---------------------------------------------------------------------------
# shard_shuffle (deterministic global shuffle + sharding, o62)
# ---------------------------------------------------------------------------

def test_shard_shuffle_is_a_partition_with_dense_positions(spark):
    from relationaldecomposition_spark.operators.sampling import shard_shuffle
    from tests.conftest import load

    docs = load(spark, "documents")
    out = shard_shuffle(docs, "doc_id", 8).toPandas()
    assert len(out) == docs.count()
    assert set(out.doc_id) == {r["doc_id"] for r in
                               docs.select("doc_id").collect()}
    assert out.shard.between(0, 7).all()
    # positions dense 0..size-1 per shard
    for s, grp in out.groupby("shard"):
        assert sorted(grp.pos) == list(range(len(grp)))


def test_shard_shuffle_deterministic_and_seed_sensitive(spark):
    from relationaldecomposition_spark.operators.sampling import shard_shuffle
    from tests.conftest import load

    docs = load(spark, "documents")
    a = sorted(map(tuple, shard_shuffle(docs, "doc_id", 8).collect()))
    b = sorted(map(tuple, shard_shuffle(
        docs.repartition(7), "doc_id", 8).collect()))
    assert a == b
    c = sorted(map(tuple, shard_shuffle(docs, "doc_id", 8,
                                        seed=7).collect()))
    assert a != c  # different seed -> different permutation


def test_shard_shuffle_actually_shuffles(spark):
    """The within-shard order must decorrelate from the input key order:
    positions are rank-ordered by hash, so consecutive doc_ids should not
    be consecutive in any shard (a sorted pass-through would fail this)."""
    from relationaldecomposition_spark.operators.sampling import shard_shuffle
    from tests.conftest import load

    docs = load(spark, "documents")
    out = shard_shuffle(docs, "doc_id", 1).toPandas().sort_values("pos")
    ids = list(out.doc_id)
    monotone_adjacent = sum(1 for x, y in zip(ids, ids[1:]) if y == x + 1)
    assert monotone_adjacent < len(ids) * 0.05


def test_shard_shuffle_validates(spark):
    from relationaldecomposition_spark.operators.sampling import shard_shuffle
    from tests.conftest import load

    with pytest.raises(ValueError):
        shard_shuffle(load(spark, "documents"), "doc_id", 0)


def test_temperature_mixture_shares_and_python_rederivation(spark):
    """Surviving rows equal a python re-derivation of the cap/threshold
    arithmetic; alpha=1 keeps the largest-upweight stratum whole (cap
    binds somewhere, and with alpha=1 every stratum is that stratum);
    alpha<1 upweights rare strata relative to their natural share."""
    import math

    from relationaldecomposition_spark.operators.sampling import (
        SAMPLE_MOD, SAMPLE_MULT, temperature_mixture)

    rows = [(i, "big") for i in range(900)]
    rows += [(10000 + i, "mid") for i in range(90)]
    rows += [(20000 + i, "rare") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id bigint, src string")

    def r6(x):
        return math.floor(x * 1e6 + 0.5) / 1e6

    for alpha in (1.0, 0.5, 0.0):
        got = {r["doc_id"] for r in
               temperature_mixture(df, "doc_id", "src", alpha).collect()}
        n = {"big": 900, "mid": 90, "rare": 10}
        w = {s: r6(c ** alpha) for s, c in n.items()}
        tw = sum(w.values())
        cap = min(n[s] * tw / w[s] for s in n)
        th = {s: math.floor(cap * (w[s] / tw) / n[s] * SAMPLE_MOD)
              for s in n}
        exp = {i for i, s in rows
               if (i * SAMPLE_MULT) % SAMPLE_MOD < th[s]}
        assert got == exp, alpha
        if alpha == 1.0:
            # identity temperature: every stratum kept ~whole
            assert len(got) == len(rows)
        if alpha == 0.0:
            # equalizing: surviving shares ~uniform at the rarest
            # stratum's size (hash sampling is exact-to-threshold, not
            # exact-n: the 90x natural skew must collapse to ~1x)
            per = {s: sum(1 for i, t in rows if t == s and i in got)
                   for s in n}
            assert max(per.values()) <= 2 * min(per.values())
    with pytest.raises(ValueError):
        temperature_mixture(df, "doc_id", "src", -0.1)
