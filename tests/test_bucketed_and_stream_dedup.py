"""Bucketed decomposition output (shuffle-free rejoin) + streaming dedup."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import load


def test_bucketed_rejoin_has_no_exchange(spark, tmp_path):
    from relationaldecomposition_spark.engine.decompose import (
        write_decomposition_bucketed)

    # warehouse dir is a static conf; tables land in the session default
    # (./spark-warehouse) and are dropped below
    c = load(spark, "customer")
    n = load(spark, "nation")
    denorm = c.join(n, c.c_nationkey == n.n_nationkey).drop("n_nationkey")
    clusters = [["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"],
                ["c_nationkey", "n_name", "n_regionkey"]]
    names = write_decomposition_bucketed(denorm, clusters, "c_nationkey",
                                         "t_bkt", num_buckets=8)
    t0, t1 = (spark.table(x) for x in names)
    # force sort-merge join so bucket co-location (not broadcast) is tested
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = t0.join(t1, "c_nationkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        # bucketed-on-join-key tables join WITHOUT a shuffle on either side
        assert "Exchange hashpartitioning" not in plan, plan[:600]
        # and the rejoin reconstructs the base
        assert joined.distinct().count() == denorm.distinct().count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        for x in names:
            spark.sql(f"DROP TABLE IF EXISTS {x}")


def test_stream_dedup_within_watermark(spark, tmp_path):
    import datetime

    from relationaldecomposition_spark.streaming.dedup import (
        dedup_stream, fingerprint_dedup_stream)

    t0 = datetime.datetime(2024, 1, 1)
    rows = [(1, t0, 1, "a", 1.0, "x"),
            (1, t0 + datetime.timedelta(minutes=1), 1, "a", 1.0, "x"),  # dup id
            (2, t0 + datetime.timedelta(minutes=2), 1, "b", 2.0, "x"),
            (3, t0 + datetime.timedelta(minutes=3), 2, "b", 2.0, "x")]
    schema = ("event_id long, ts timestamp, user_id long, event_type string, "
              "value double, props string")
    df = spark.createDataFrame(rows, schema)
    src = tmp_path / "dd_src"
    df.coalesce(1).write.mode("overwrite").parquet(str(src))
    stream = spark.readStream.schema(df.schema).parquet(str(src))

    out = dedup_stream(stream, ["event_id"], watermark="10 minutes")
    q = (out.writeStream.format("memory").queryName("dd1")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "chk_dd1"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = sorted(r["event_id"] for r in spark.table("dd1").collect())
    assert got == [1, 2, 3]  # duplicate event_id=1 collapsed

    # fingerprint dedup: events 2 and 3 share content (event_type, value)
    fp = fingerprint_dedup_stream(
        stream.withColumn("content", F.concat_ws("|", "event_type", "value")),
        "content", watermark="10 minutes")
    q2 = (fp.writeStream.format("memory").queryName("dd2")
          .outputMode("append")
          .option("checkpointLocation", str(tmp_path / "chk_dd2"))
          .trigger(availableNow=True).start())
    q2.awaitTermination(120)
    got2 = sorted(r["event_id"] for r in spark.table("dd2").collect())
    assert got2 == [1, 2]  # one per distinct content: {a,1.0} and {b,2.0}
