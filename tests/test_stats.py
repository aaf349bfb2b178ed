"""Statistical profiling operators (operators/stats.py) and weighted
sampling (operators/sampling.py): Python brute-force oracles on seeded
random data. The driver gate value-checks the same ops vs DuckDB
(o34-o36)."""

import math
import random

import pytest

from pyspark.sql import Row, functions as F

from relationaldecomposition_spark.operators import sampling, stats


@pytest.fixture(scope="module")
def num_df(spark):
    rng = random.Random(99)
    rows = [Row(g="ab"[i % 2], v=(None if i % 11 == 7
                                  else round(rng.uniform(0, 100), 3)))
            for i in range(200)]
    return spark.createDataFrame(rows), rows


class TestGroupQuantiles:
    def test_matches_python_interpolation(self, spark, num_df):
        df, rows = num_df
        qs = [0.0, 0.25, 0.5, 0.75, 1.0]
        out = {(r["g"], r["q"]): r["quantile"] for r in
               stats.group_quantiles(df, ["g"], "v", qs).collect()}
        for g in "ab":
            vals = sorted(r.v for r in rows if r.g == g and r.v is not None)
            for q in qs:
                p = q * (len(vals) - 1)
                lo, frac = int(math.floor(p)), p - math.floor(p)
                exp = (vals[lo] if frac == 0
                       else vals[lo] + frac * (vals[lo + 1] - vals[lo]))
                assert out[(g, q)] == pytest.approx(exp, abs=1e-6), (g, q)

    def test_rejects_bad_fraction(self, spark, num_df):
        with pytest.raises(ValueError):
            stats.group_quantiles(num_df[0], ["g"], "v", [1.5])


class TestProfileNumeric:
    def test_matches_python_oracle(self, spark, num_df):
        df, rows = num_df
        out = {r["g"]: r for r in
               stats.profile_numeric(df, ["g"], "v").collect()}
        for g in "ab":
            sub = [r.v for r in rows if r.g == g]
            vals = [v for v in sub if v is not None]
            r = out[g]
            assert r["n_rows"] == len(sub)
            assert r["n_null"] == len(sub) - len(vals)
            assert r["n_distinct"] == len(set(vals))
            assert r["v_min"] == min(vals) and r["v_max"] == max(vals)
            assert r["v_mean"] == pytest.approx(sum(vals) / len(vals),
                                                abs=1e-6)

    def test_all_null_group_mean_is_null(self, spark):
        df = spark.createDataFrame([Row(g="x", v=None), Row(g="x", v=None)],
                                   "g string, v double")
        r = stats.profile_numeric(df, ["g"], "v").collect()[0]
        assert r["v_mean"] is None and r["n_null"] == 2
        assert r["v_min"] is None and r["n_distinct"] == 0


class TestWeightedSample:
    def test_matches_python_oracle(self, spark):
        rows = [Row(k=i, w=float(1 + (i * 13) % 50)) for i in range(150)]
        df = spark.createDataFrame(rows)
        out = sampling.weighted_sample_topk(df, "k", "w", 20).collect()
        exp = []
        for r in rows:
            u = (((r.k * sampling.WS_MULT) % sampling.WS_MOD) + 0.5) \
                / sampling.WS_MOD
            exp.append((math.log(u) / r.w, r.k))
        exp_ids = [k for _, k in sorted(exp, key=lambda t: (-t[0], t[1]))][:20]
        assert [r["k"] for r in out] == exp_ids

    def test_weight_bias(self, spark):
        """A row with overwhelming weight is (near-)always selected; zero
        and null weights never are."""
        rows = [Row(k=i, w=1e-6) for i in range(100)]
        rows += [Row(k=1000, w=1e9), Row(k=1001, w=0.0), Row(k=1002, w=None)]
        df = spark.createDataFrame(rows, "k long, w double")
        got = {r["k"] for r in
               sampling.weighted_sample_topk(df, "k", "w", 5).collect()}
        assert 1000 in got
        assert 1001 not in got and 1002 not in got

    def test_take_ordered_plan(self, spark):
        """Scale invariant: orderBy+limit plans as TakeOrderedAndProject
        (per-partition top-k + merge), not a global sort exchange."""
        df = spark.createDataFrame([Row(k=i, w=1.0) for i in range(10)])
        plan = sampling.weighted_sample_topk(df, "k", "w", 3) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan


class TestSkewReport:
    def test_counts_and_shares(self, spark):
        rows = [Row(k="hot")] * 60 + [Row(k="warm")] * 30 + \
               [Row(k="a")] * 5 + [Row(k="b")] * 5
        df = spark.createDataFrame(rows)
        out = stats.skew_report(df, ["k"], top_n=3).collect()
        assert [(r["k"], r["n_rows"]) for r in out] == \
            [("hot", 60), ("warm", 30), ("a", 5)]   # tie a/b -> key asc
        assert out[0]["share"] == pytest.approx(0.6, abs=1e-6)

    def test_take_ordered_plan(self, spark):
        df = spark.createDataFrame([Row(k="x")])
        plan = stats.skew_report(df, ["k"], 5) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan


class TestSnapshotDiff:
    def test_all_change_kinds(self, spark):
        from relationaldecomposition_spark.operators.joins import snapshot_diff
        old = spark.createDataFrame(
            [(1, "same", "en"), (2, "will change", "en"),
             (3, "gone", "de"), (5, "null change", None)],
            "id long, t string, g string")
        new = spark.createDataFrame(
            [(1, "same", "en"), (2, "did change", "en"),
             (4, "fresh", "fr"), (5, "null change", "xx")],
            "id long, t string, g string")
        out = {r["id"]: r for r in
               snapshot_diff(old, new, ["id"], ["t", "g"]).collect()}
        assert set(out) == {2, 3, 4, 5}            # id 1 unchanged: absent
        assert out[2]["change"] == "changed"
        assert (out[2]["old_t"], out[2]["new_t"]) == ("will change",
                                                      "did change")
        assert out[3]["change"] == "removed" and out[3]["new_t"] is None
        assert out[4]["change"] == "added" and out[4]["old_t"] is None
        # null -> value counts as changed (null-safe comparison)
        assert out[5]["change"] == "changed"

    def test_identical_snapshots_empty(self, spark):
        from relationaldecomposition_spark.operators.joins import snapshot_diff
        df = spark.createDataFrame([(1, "a"), (2, None)], "id long, t string")
        assert snapshot_diff(df, df, ["id"], ["t"]).count() == 0


def test_approx_group_quantiles_rank_error_bound(spark):
    import math

    from relationaldecomposition_spark.operators.stats import (
        approx_group_quantiles, group_quantiles)
    from tests.conftest import load

    li = load(spark, "lineitem")
    keys = ["l_returnflag"]
    qs = [0.25, 0.5, 0.9]
    rate = 0.25
    exact_all = {}  # (flag) -> sorted values, for rank-space comparison
    for r in li.select("l_returnflag", "l_extendedprice").collect():
        exact_all.setdefault(r[0], []).append(float(r[1]))
    for v in exact_all.values():
        v.sort()
    approx = approx_group_quantiles(li, keys, "l_extendedprice", qs,
                                    "l_orderkey", rate).collect()
    for row in approx:
        vals = exact_all[row["l_returnflag"]]
        n, m = len(vals), int(len(vals) * rate)
        # DKW: rank error of a sampled quantile concentrated at
        # O(1/sqrt(m)); allow 4/sqrt(m) in rank space
        import bisect
        rank = bisect.bisect_left(vals, row["quantile"]) / n
        assert abs(rank - row["q"]) <= 4.0 / math.sqrt(m), row


def test_approx_group_quantiles_matches_duckdb(spark):
    import duckdb

    from relationaldecomposition_spark.operators.stats import (
        approx_group_quantiles, sql_approx_group_quantiles)
    from tests.conftest import SF_DIR, load

    li = load(spark, "lineitem")
    got = sorted(tuple(r) for r in approx_group_quantiles(
        li, ["l_returnflag"], "l_extendedprice", [0.5, 0.9],
        "l_orderkey", 0.25).collect())
    con = duckdb.connect()
    con.sql(f"CREATE VIEW lineitem AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/lineitem.parquet')")
    exp = sorted((r[0], float(r[1]), float(r[2]))
                 for r in con.sql(sql_approx_group_quantiles(
                     "lineitem", ["l_returnflag"], "l_extendedprice",
                     [0.5, 0.9], "l_orderkey", 0.25)).fetchall())
    assert got == exp


def test_group_top_values_exact(spark):
    from relationaldecomposition_spark.operators.stats import (
        group_top_values)

    rows = ([("a", "x")] * 5 + [("a", "y")] * 3 + [("a", "z")] * 3 +
            [("a", "w")] * 1 + [("b", "q")] * 2)
    df = spark.createDataFrame(rows, ["g", "v"])
    out = [(r["g"], r["value"], r["n"], r["rank"], r["share"])
           for r in group_top_values(df, ["g"], "v", k=3)
           .orderBy("g", "rank").collect()]
    # tie between y and z broken by value asc; w cut by k=3
    assert out == [("a", "x", 5, 1, round(5 / 12, 6)),
                   ("a", "y", 3, 2, round(3 / 12, 6)),
                   ("a", "z", 3, 3, round(3 / 12, 6)),
                   ("b", "q", 2, 1, 1.0)]
    with pytest.raises(ValueError):
        group_top_values(df, ["g"], "v", k=0)
