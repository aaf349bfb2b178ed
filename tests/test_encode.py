"""Distributed dictionary encoding (A3 library path): dense 1-based codes
in value order, computed with no single-partition stage, matching a
driver-side sorted enumeration oracle."""

from pyspark.sql import functions as F

from relationaldecomposition_spark.operators.encode import (
    dict_encode_column, encode_columns)
from tests.conftest import load


def test_codes_match_sorted_enumeration_low_card(spark):
    cust = load(spark, "customer")
    codes = dict_encode_column(cust, "c_mktsegment")
    try:
        got = {r["value"]: r["code"] for r in codes.collect()}
    finally:
        codes.unpersist()
    vals = sorted(r[0] for r in
                  cust.select("c_mktsegment").distinct().collect())
    assert got == {v: i + 1 for i, v in enumerate(vals)}


def test_codes_match_sorted_enumeration_high_card(spark):
    # c_custkey is unique per row: the dictionary is as large as the table,
    # the exact case a driver-side map or single-partition window can't do
    cust = load(spark, "customer")
    codes = dict_encode_column(cust, "c_custkey", num_partitions=8)
    try:
        got = sorted((r["value"], r["code"]) for r in codes.collect())
    finally:
        codes.unpersist()
    vals = sorted(r[0] for r in cust.select("c_custkey").distinct().collect())
    assert got == [(v, i + 1) for i, v in enumerate(vals)]
    # codes are dense: 1..n with no gaps
    assert [c for _, c in got] != [] and max(c for _, c in got) == len(vals)


def test_encode_plan_has_no_single_partition_stage(spark):
    cust = load(spark, "customer")
    codes = dict_encode_column(cust, "c_custkey", num_partitions=8)
    try:
        plan = codes._jdf.queryExecution().executedPlan().toString()
        assert "SinglePartition" not in plan, plan
    finally:
        codes.unpersist()


def test_encode_columns_join_back(spark):
    nat = load(spark, "nation")
    encoded, dicts = encode_columns(nat, ["n_name", "n_regionkey"])
    try:
        rows = encoded.select("n_name", "n_name_code",
                              "n_regionkey", "n_regionkey_code").collect()
        name_codes = {r["value"]: r["code"] for r in dicts["n_name"].collect()}
        reg_codes = {r["value"]: r["code"]
                     for r in dicts["n_regionkey"].collect()}
        for r in rows:
            assert r["n_name_code"] == name_codes[r["n_name"]]
            assert r["n_regionkey_code"] == reg_codes[r["n_regionkey"]]
        # every row got a code (no nulls in these columns)
        assert encoded.where(F.col("n_name_code").isNull()).count() == 0
    finally:
        for d in dicts.values():
            d.unpersist()


def test_all_null_column_yields_empty_dictionary(spark):
    df = spark.createDataFrame(
        [(1, None), (2, None)], "id bigint, v string")
    codes = dict_encode_column(df, "v")
    assert codes.columns == ["value", "code"]
    assert codes.count() == 0
    codes.unpersist()


def test_a03_query_result_is_executor_resident(spark):
    """r3 'what's wrong' #1: the a03 driver query must not round-trip the
    dictionary through the driver. The returned frame has to scan an
    executor-side checkpoint (Scan ExistingRDD), never a driver-collected
    LocalTableScan."""
    from relationaldecomposition_spark.queries import q_a03_dict_encode
    out = q_a03_dict_encode(spark, "/root/testdata/sf0.001")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "LocalTableScan" not in plan, plan
    assert "ExistingRDD" in plan or "Scan" in plan
    assert out.count() == 5
