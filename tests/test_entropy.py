"""Entropy engine vs. pure-Python oracle (the dual-implementation test
pattern from SURVEY.md §5: CompressedDB.compareTest vs ExternalFileDataSet)."""

import itertools
import math

import pytest

from relationaldecomposition_spark.engine.entropy import (
    SparkEntropyEngine, entropy_from_counts)
from tests.conftest import load


def oracle_entropy(rows, idxs):
    """Naive histogram entropy over tuple projections (duplicates = mass)."""
    from collections import Counter
    n = len(rows)
    if n == 0 or not idxs:
        return 0.0
    counts = Counter(tuple(r[i] for i in idxs) for r in rows)
    return -sum((c / n) * math.log2(c / n) for c in counts.values())


@pytest.fixture(scope="module")
def tiny(spark):
    # duplicates on purpose: entropy path must count them as mass
    data = [
        ("a", 1, "x"), ("a", 1, "x"), ("a", 2, "y"),
        ("b", 1, "x"), ("b", 2, "y"), ("b", 2, "z"),
        ("c", 3, "z"), ("c", 3, "z"),
    ]
    df = spark.createDataFrame(data, ["u", "v", "w"])
    return df, data


def test_single_subsets_match_oracle(tiny):
    df, data = tiny
    eng = SparkEntropyEngine(df)
    cols = df.columns
    for r in range(1, len(cols) + 1):
        for combo in itertools.combinations(range(len(cols)), r):
            subset = [cols[i] for i in combo]
            expected = oracle_entropy(data, combo)
            assert eng.entropy(subset) == pytest.approx(expected, abs=1e-9), subset
    eng.unpersist()


def test_degenerate_and_cache(tiny):
    df, data = tiny
    eng = SparkEntropyEngine(df)
    assert eng.entropy([]) == 0.0
    h1 = eng.entropy(["u"])
    jobs = eng.jobs_run
    assert eng.entropy(["u"]) == h1  # cache hit
    assert eng.jobs_run == jobs
    assert eng.num_rows == 8
    assert eng.num_distinct == 6  # two injected duplicates
    eng.unpersist()


def test_batched_grouping_sets_match_singles(tiny):
    df, data = tiny
    cols = df.columns
    all_subsets = [
        [cols[i] for i in combo]
        for r in range(1, len(cols) + 1)
        for combo in itertools.combinations(range(len(cols)), r)
    ]
    eng_batch = SparkEntropyEngine(df, max_grouping_sets=4)
    got = eng_batch.entropies(all_subsets)
    for combo_cols, h in got.items():
        idxs = [cols.index(c) for c in combo_cols]
        assert h == pytest.approx(oracle_entropy(data, idxs), abs=1e-9), combo_cols
    # the 7 subsets should have used ceil(7/4)=2 grouping-set jobs
    assert eng_batch.jobs_run <= 3
    eng_batch.unpersist()


def test_batched_appearance_order_differs_from_schema(tiny):
    # regression: grouping_id bit order follows first appearance in the
    # GROUPING SETS clause, not schema order — put 'w' first to force a
    # mismatch between the two orders
    df, data = tiny
    cols = df.columns  # [u, v, w]
    eng = SparkEntropyEngine(df)
    subsets = [["w"], ["v"], ["u", "v"], ["u", "w"], ["u"]]
    got = eng.entropies(subsets)
    for s, h in got.items():
        idxs = [cols.index(c) for c in s]
        assert h == pytest.approx(oracle_entropy(data, idxs), abs=1e-9), s
    eng.unpersist()


def test_concurrent_strategy(tiny):
    df, data = tiny
    eng = SparkEntropyEngine(df)
    got = eng.entropies([["u"], ["v"], ["u", "w"]], strategy="concurrent")
    for s, h in got.items():
        idxs = [df.columns.index(c) for c in s]
        assert h == pytest.approx(oracle_entropy(data, idxs), abs=1e-9)
    eng.unpersist()


def test_all_entropies_cube_matches_singles(tiny):
    df, data = tiny
    cols = df.columns
    eng = SparkEntropyEngine(df)
    got = eng.all_entropies()
    assert len(got) == 2 ** len(cols)
    for subset, h in got.items():
        idxs = [cols.index(c) for c in subset]
        assert h == pytest.approx(oracle_entropy(data, idxs), abs=1e-9), subset
    assert got[frozenset()] == 0.0
    # everything landed in the cache: no further jobs for any subset
    jobs = eng.jobs_run
    eng.entropy(["u", "w"])
    assert eng.jobs_run == jobs
    eng.unpersist()


def test_all_entropies_key_shortcut(spark):
    """Key-column shortcut: with unique-key columns present, all_entropies
    must (a) still match the brute-force oracle on EVERY subset — key
    subsets exactly, the rest to float tolerance — and (b) run its CUBE only
    over the key-free columns (visible as fewer tuples_processed)."""
    data = [(i, f"name{i}", i % 3, i % 2) for i in range(12)]
    cols = ["pk", "pname", "grp", "flag"]
    df = spark.createDataFrame(data, cols)
    eng = SparkEntropyEngine(df)
    try:
        assert eng.key_columns(cols) == frozenset({"pk", "pname"})
        got = eng.all_entropies()
        assert len(got) == 2 ** len(cols)
        logn = math.log2(len(data))
        for subset, h in got.items():
            idxs = [cols.index(c) for c in subset]
            assert h == pytest.approx(oracle_entropy(data, idxs), abs=1e-9), subset
            if subset & {"pk", "pname"}:
                assert h == logn  # exact, by the algebraic fill
        # CUBE ran over the 2 key-free columns only: the cube job fed
        # n * 2^2 tuples, not n * 2^4 (singles job adds n * 4)
        assert eng.tuples_processed == 12 * 4 + 12 * (1 << 2)
    finally:
        eng.unpersist()


def test_all_entropies_no_keys_when_duplicates(tiny):
    """Duplicate rows mean no column can be a key — the shortcut must
    self-disable (detection is on computed entropy, not schema claims)."""
    df, _ = tiny
    eng = SparkEntropyEngine(df, cache_input=False)
    try:
        assert eng.key_columns(df.columns) == frozenset()
    finally:
        eng.unpersist()


def test_all_entropies_width_guard(tiny):
    df, _ = tiny
    eng = SparkEntropyEngine(df, cache_input=False)
    with pytest.raises(ValueError, match="cube over"):
        eng.all_entropies([f"c{i}" for i in range(21)])


def test_cost_aware_chunking(tiny):
    """Chunk planner (VERDICT r2 'what's wrong' #3): cold cache keeps the
    full fixed width; once singleton entropies are cached, near-key subsets
    are split across chunks so one job's shuffle output stays within the
    group budget."""
    df, data = tiny
    eng = SparkEntropyEngine(df, max_grouping_sets=4, group_budget_rows=1.0)
    try:
        subs = [frozenset(c) for r in (1, 2, 3)
                for c in itertools.combinations(df.columns, r)]
        # cold cache, uniform width: fixed-width chunking (lazy planner
        # returns one chunk at a time)
        pairs = subs[3:9]   # six size-2 subsets, no estimates yet
        first = eng._next_chunk(pairs)
        assert len(first) == 4 and eng._next_chunk(pairs[4:]) == pairs[4:6]
        # warm the singletons; (u,v,w) is near-key (7 groups of 8 rows)
        eng.entropies([frozenset((c,)) for c in df.columns])
        wide = [frozenset(df.columns)] * 3  # each ~n groups
        assert eng._next_chunk(wide) == wide[:1]  # budget 1.0x rows: one each
        # values are unaffected by chunking (full sweep matches the oracle)
        got = eng.entropies(subs)
        for s in subs:
            idxs = [df.columns.index(c) for c in sorted(s)]
            assert got[s] == pytest.approx(oracle_entropy(data, idxs), abs=1e-9)
    finally:
        eng.unpersist()


def test_cold_wide_chunk_clamped_to_16(spark):
    """ADVICE r14: a COLD chunk headed by a wide (non-singleton) set has
    no cached estimates, so the group budget can't bound it — the r14
    width raise (16 -> 32) must not double that blind chunk's working
    set. The planner clamps cold wide-headed chunks to the old width 16;
    once estimates exist (singles cached) chunks keep the full width,
    bounded by the group budget instead."""
    cols = [f"c{i}" for i in range(7)]
    # every column = the same 8-valued cycle: singleton H = 3 bits, so a
    # pair estimates min(6, log2 64) = 6 bits — never union-compact
    # (thresh = log2(64/8) = 3), which keeps the compactness skip out of
    # this test's way; the budget is raised so it doesn't bind either
    df = spark.createDataFrame(
        [tuple(f"v{i % 8}" for _ in cols) for i in range(64)], cols)
    eng = SparkEntropyEngine(df, max_grouping_sets=32,
                             group_budget_rows=32.0)
    try:
        wide = [frozenset(c) for c in itertools.combinations(cols, 2)]
        assert len(wide) == 21 > 16
        # cold, wide-headed: clamped to the pre-r14 width
        assert len(eng._next_chunk(wide)) == 16
        # warm the singleton estimates
        eng.entropies([frozenset((c,)) for c in cols])
        # warm chunk keeps the FULL raised width (21 sets fit under both
        # the 32 cap and the 32x budget: 21 x 2^6 = 1344 <= 2048)
        assert len(eng._next_chunk(wide)) == 21
    finally:
        eng.unpersist()


def test_entropy_from_counts_helper():
    assert entropy_from_counts([2, 2], 4) == pytest.approx(1.0)
    assert entropy_from_counts([1, 1, 1, 1], 4) == pytest.approx(2.0)
    assert entropy_from_counts([4], 4) == pytest.approx(0.0)
    assert entropy_from_counts([], 0) == 0.0


def test_on_sf0001_lineitem(spark):
    df = load(spark, "lineitem").select(
        "l_returnflag", "l_linestatus", "l_quantity")
    eng = SparkEntropyEngine(df)
    rows = [tuple(r) for r in df.collect()]
    for subset in [["l_returnflag"], ["l_returnflag", "l_linestatus"],
                   ["l_returnflag", "l_linestatus", "l_quantity"]]:
        idxs = [df.columns.index(c) for c in subset]
        assert eng.entropy(subset) == pytest.approx(
            oracle_entropy(rows, idxs), abs=1e-9)
    eng.unpersist()


def test_entropy_random_frames_property():
    """Property check over random relations: batched grouping-sets
    entropies must equal the definition H(X) = log2(N) - sum(c*log2(c))/N
    computed driver-side, for every subset of a random 4-column frame.
    Seeded RNG (not hypothesis) keeps Spark round-trips bounded and
    failures reproducible."""
    import itertools as it
    import math
    import random
    from collections import Counter

    from tests.conftest import SF_DIR  # noqa: F401  (spark fixture import side)
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    cols = ["w", "x", "y", "z"]
    for seed in (3, 17, 41):
        rng = random.Random(seed)
        rows = [tuple(rng.randint(0, rng.choice((1, 3, 9)))
                      for _ in cols) for _ in range(rng.randint(20, 80))]
        df = spark.createDataFrame(rows, cols)
        eng = SparkEntropyEngine(df)
        try:
            subsets = [frozenset(c) for r in (1, 2, 3, 4)
                       for c in it.combinations(cols, r)]
            got = eng.entropies(subsets)
            n = len(rows)
            for s in subsets:
                idx = [cols.index(c) for c in sorted(s)]
                counts = Counter(tuple(row[i] for i in idx) for row in rows)
                expect = math.log2(n) - sum(
                    c * math.log2(c) for c in counts.values()) / n
                assert abs(got[s] - expect) < 1e-9, (seed, sorted(s))
        finally:
            eng.unpersist()


def test_preaggregated_grouping_sets_values(spark):
    """When singleton entropies say the union compresses (est G <= N/8),
    _batch_grouping_sets pre-aggregates on the union before the grouping
    sets. Values must be identical to the brute-force oracle either way —
    this fixture makes the gate provably engage (4 columns x 3 values,
    N=810 -> est G ~ 2^6.3 << N/8)."""
    import itertools as it
    import random
    rng = random.Random(4242)
    data = [tuple(rng.choice("abc") for _ in range(4)) for _ in range(810)]
    df = spark.createDataFrame(data, "u string, v string, w string, x string")
    eng = SparkEntropyEngine(df)
    try:
        cols = df.columns
        eng.entropies([frozenset((c,)) for c in cols])   # warm singles
        pairs = [frozenset(p) for p in it.combinations(cols, 2)]
        union_est = eng._est_log2_groups(frozenset(cols))
        assert union_est is not None
        assert (2.0 ** union_est) * 8.0 <= eng.num_rows   # gate engages
        got = eng.entropies(pairs)
        for s in pairs:
            idxs = [cols.index(c) for c in sorted(s)]
            assert got[s] == pytest.approx(oracle_entropy(data, idxs),
                                           abs=1e-9), s
    finally:
        eng.unpersist()


def test_subsequence_chunking_skips_union_wideners(spark):
    """r7 chunker rework: once the chunk-so-far qualifies for the pre-agg
    gate (union perplexity <= N/8), a subset that would blow the union
    past the threshold is SKIPPED (lands in a later chunk), not
    chunk-terminating — so compact chunks pre-aggregate and wide subsets
    congregate. Values must be oracle-identical either way."""
    import math

    rows = [(i % 2, (i // 2) % 2, (i // 4) % 2, i % 512)
            for i in range(1024)]
    df = spark.createDataFrame(rows, ["u", "v", "t", "w"])
    eng = SparkEntropyEngine(df)
    try:
        # seed the singleton estimates (the cold chunk — always direct)
        eng.entropies([frozenset((c,)) for c in df.columns])
        uv, ut, vt = (frozenset(("u", "v")), frozenset(("u", "t")),
                      frozenset(("v", "t")))
        uw, vw = frozenset(("u", "w")), frozenset(("v", "w"))
        # head {u,v} is compact (union {u,v,t} est ~3 bits <=
        # log2(1024/8)=7); the interleaved w-subsets would push the union
        # past the threshold and must be SKIPPED, not chunk-terminating
        assert eng._next_chunk([uv, uw, ut, vw, vt]) == [uv, ut, vt]
        # the wide subsets then chunk together (head already past the
        # threshold -> the compactness rule is inactive, mass budget rules)
        assert eng._next_chunk([uw, vw]) == [uw, vw]
        before_pre, before_dir = eng.pre_agg_chunks, eng.direct_chunks
        got = eng.entropies([uv, uw, ut, vw, vt])
        assert eng.pre_agg_chunks == before_pre + 1   # the compact chunk
        assert eng.direct_chunks == before_dir + 1    # the wide pair chunk
        # values identical to the brute-force oracle
        for s in (uv, uw, ut, vw, vt):
            idxs = [df.columns.index(c) for c in sorted(s)]
            assert got[s] == pytest.approx(oracle_entropy(rows, idxs),
                                           abs=1e-9)
    finally:
        eng.unpersist()
