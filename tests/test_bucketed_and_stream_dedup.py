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


def test_band_ingest_stream_matches_batch_loop(spark, tmp_path):
    """r14 ask #6: the foreachBatch continuous-ingest loop over a
    persisted band store must equal the sequential batch replay
    (seed index -> ingest_batch(b1) -> append -> ingest_batch(b2)), and
    a replayed micro-batch must leave the store unchanged (dynamic
    partition overwrite keyed on the batch id)."""
    from relationaldecomposition_spark.operators import dedup as ddp
    from relationaldecomposition_spark.streaming.dedup import (
        band_ingest_stream, ingest_one_batch, read_band_store,
        seed_band_store)

    base = "the quick brown fox jumps over the lazy dog token"
    rows = [(i, f"{base} {'shared suffix run' if i % 4 == 0 else i}")
            for i in range(30)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    corpus = docs.where("doc_id % 3 = 0")
    b1 = docs.where("doc_id % 3 = 1")
    b2 = docs.where("doc_id % 3 = 2")

    store = str(tmp_path / "band_store")
    stats_p = str(tmp_path / "band_stats")
    seed_band_store(
        ddp.minhash_band_index(corpus, "text", "doc_id"), store)

    # streaming loop: one parquet file per micro-batch, two availableNow
    # runs sharing a checkpoint -> batch 0 = b1, batch 1 = b2
    src = tmp_path / "ingest_src"
    b1.coalesce(1).write.mode("append").parquet(str(src))

    def run_once():
        q = (band_ingest_stream(
                spark.readStream.schema(docs.schema).parquet(str(src)),
                store, "text", "doc_id", stats_path=stats_p)
             .option("checkpointLocation", str(tmp_path / "chk"))
             .option("maxFilesPerTrigger", "1")
             .trigger(availableNow=True).start())
        q.awaitTermination(180)

    run_once()
    b2.coalesce(1).write.mode("append").parquet(str(src))
    run_once()

    # batch replay of the same loop
    idx0 = ddp.minhash_band_index(corpus, "text", "doc_id")
    stats1, rows1 = ddp.ingest_batch(b1, idx0, "text", "doc_id")
    idx1 = idx0.unionByName(rows1)
    stats2, rows2 = ddp.ingest_batch(b2, idx1, "text", "doc_id")

    def as_set(df, cols):
        return {tuple(r) for r in df.select(*cols).collect()}

    want_store = as_set(idx0.unionByName(rows1).unionByName(rows2),
                        ["band", "sig", "doc_id"])
    got_store = as_set(read_band_store(spark, store),
                       ["band", "sig", "doc_id"])
    assert got_store == want_store

    stat_cols = ["doc_id", "n_index_hits", "n_batch_hits", "survives"]
    want_stats = as_set(stats1, stat_cols) | as_set(stats2, stat_cols)
    got_stats = as_set(
        spark.read.parquet(stats_p).drop("_ingest_batch"), stat_cols)
    assert got_stats == want_stats
    # the loop actually deduped something across batches (sanity: the
    # planted shared-suffix docs collide with the seeded corpus index)
    assert any(not r[3] for r in got_stats)

    # replay idempotence: re-running micro-batch 1 (b2) changes nothing
    ingest_one_batch(b2, 1, store, "text", "doc_id", stats_path=stats_p)
    assert as_set(read_band_store(spark, store),
                  ["band", "sig", "doc_id"]) == want_store
    assert as_set(spark.read.parquet(stats_p).drop("_ingest_batch"),
                  stat_cols) == want_stats
