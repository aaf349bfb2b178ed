"""Structured Streaming: the SAME transformations run batch and streamed
(file source -> memory sink) must agree; stateful op maintains state across
micro-batches."""

import shutil

import pytest
from pyspark.sql import functions as F

from relationaldecomposition_spark.streaming import events as ev
from tests.conftest import load


@pytest.fixture(scope="module")
def events_df(spark):
    from relationaldecomposition_spark.sources.tables import load_table
    from tests.conftest import SF_DIR
    return load_table(spark, SF_DIR, "events")


def _run_stream(spark, stream_df, name, tmp_path, mode="complete"):
    q = (stream_df.writeStream.format("memory").queryName(name)
         .outputMode(mode)
         .option("checkpointLocation", str(tmp_path / f"chk_{name}"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    return spark.table(name)


def _stream_source(spark, events_df, tmp_path):
    src_dir = tmp_path / "events_src"
    events_df.write.mode("overwrite").parquet(str(src_dir))
    return (spark.readStream.schema(events_df.schema)
            .parquet(str(src_dir)))


def test_windowed_counts_batch_equals_stream(spark, events_df, tmp_path):
    batch = ev.windowed_counts(events_df).collect()
    stream = _run_stream(
        spark, ev.windowed_counts(_stream_source(spark, events_df, tmp_path),
                                  watermark="10 minutes"),
        "win_counts", tmp_path)
    got = stream.collect()
    key = lambda r: (r["window_start"], r["event_type"])
    assert {key(r): (r["n_events"], r["sum_value"]) for r in batch} == \
           {key(r): (r["n_events"], r["sum_value"]) for r in got}


def test_sessionize_batch_equals_stream(spark, events_df, tmp_path):
    batch = ev.sessionize(events_df).collect()
    stream = _run_stream(
        spark, ev.sessionize(_stream_source(spark, events_df, tmp_path),
                             watermark="10 minutes"),
        "sessions", tmp_path)
    got = stream.collect()
    key = lambda r: (r["user_id"], r["session_start"])
    assert {key(r): (r["n_events"], r["sum_value"]) for r in batch} == \
           {key(r): (r["n_events"], r["sum_value"]) for r in got}


def test_running_user_stats_state_across_batches(spark, events_df, tmp_path):
    """Feed the same source twice (two files -> two or more micro-batches
    with maxFilesPerTrigger=1) and check totals accumulate."""
    src_dir = tmp_path / "stateful_src"
    half1 = events_df.where(F.col("event_id") % 2 == 0)
    half2 = events_df.where(F.col("event_id") % 2 == 1)
    half1.coalesce(1).write.mode("overwrite").parquet(str(src_dir / "p1"))
    half2.coalesce(1).write.mode("overwrite").parquet(str(src_dir / "p2"))
    stream = (spark.readStream.schema(events_df.schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(str(src_dir / "*")))
    out = ev.running_user_stats(stream)
    q = (out.writeStream.format("memory").queryName("running_stats")
         .outputMode("update")
         .option("checkpointLocation", str(tmp_path / "chk_run"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    res = spark.table("running_stats").collect()
    # last emitted row per user must equal the batch twin (the s03 driver
    # query / oracle face of this stateful operator)
    expected = {r["user_id"]: (r["n_events"], round(r["total_value"], 6))
                for r in ev.batch_user_stats(events_df).collect()}
    latest = {}
    for r in res:  # memory sink appends update rows in batch order
        latest[r["user_id"]] = (r["n_events"], round(r["total_value"], 6))
    assert latest == expected


def test_exact_gap_boundary(spark):
    """Events exactly gap-distance apart MERGE into one session in Spark's
    session_window (verified empirically); the SQL oracle's strict '>' must
    match. Guards against 'fixing' the oracle to >=."""
    import datetime

    t0 = datetime.datetime(2024, 1, 1)
    rows = [(1, t0, 1, "a", 1.0, ""),
            (2, t0 + datetime.timedelta(minutes=30), 1, "a", 2.0, ""),
            (3, t0 + datetime.timedelta(minutes=61), 1, "a", 3.0, "")]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    sessions = sorted((r["session_start"], r["n_events"])
                      for r in ev.sessionize(df).collect())
    # events 1+2 merge (exactly 30 min apart); event 3 is 31 min after 2
    assert sessions == [(t0, 2), (t0 + datetime.timedelta(minutes=61), 1)]
    # and the duckdb oracle twin agrees
    import duckdb
    con = duckdb.connect()
    con.register("events_pd", df.toPandas())
    con.sql("CREATE VIEW events AS SELECT * FROM events_pd")
    oracle = sorted((r[1], r[2]) for r in
                    con.sql(ev.sql_sessionize("events")).fetchall())
    assert oracle == sessions


def test_windowed_counts_drops_late_data_with_watermark(spark, events_df, tmp_path):
    # sanity: watermark path executes on a stream without error and produces
    # a subset (or equal set) of batch windows
    stream = ev.windowed_counts(_stream_source(spark, events_df, tmp_path),
                                watermark="1 minute")
    got = _run_stream(spark, stream, "win_late", tmp_path).collect()
    batch_keys = {(r["window_start"], r["event_type"])
                  for r in ev.windowed_counts(events_df).collect()}
    assert {(r["window_start"], r["event_type"]) for r in got} <= batch_keys


def test_windowed_counts_append_mode_closes_windows(spark, events_df, tmp_path):
    """APPEND mode (the at-scale config): only windows the advancing
    watermark has CLOSED are emitted. Split the source into two files
    processed as separate micro-batches; after the stream drains, every
    emitted window must match the batch twin exactly, and the emitted set
    must be the windows whose end <= max(ts) - watermark horizon."""
    src_dir = tmp_path / "append_src"
    early = events_df.orderBy("ts").limit(2000)
    late = events_df.orderBy(F.col("ts").desc()).limit(2000)
    early.coalesce(1).write.mode("overwrite").parquet(str(src_dir / "p1"))
    late.coalesce(1).write.mode("overwrite").parquet(str(src_dir / "p2"))
    stream = (spark.readStream.schema(events_df.schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(str(src_dir / "*")))
    q = (ev.windowed_counts(stream, watermark="10 minutes")
         .writeStream.format("memory").queryName("win_append")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "chk_append"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
           for r in spark.table("win_append").collect()}
    assert got, "append mode emitted nothing — watermark never closed windows"
    both = early.unionByName(late)
    batch = {(r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
             for r in ev.windowed_counts(both).collect()}
    # every emitted (closed) window agrees exactly with the batch twin over
    # the same data — no partial/duplicate emissions
    for k, v in got.items():
        assert batch[k] == v, k
    # and emission is watermark-correct: a window only emits once its END
    # falls behind the watermark, which never exceeds max(ts) - horizon
    import datetime
    max_ts = both.agg(F.max("ts")).first()[0]
    horizon = max_ts - datetime.timedelta(minutes=10)
    for (ws, _et) in got:
        assert ws + datetime.timedelta(hours=1) <= horizon, ws


def test_stream_static_enrichment_batch_equals_stream(spark, events_df, tmp_path):
    """Stream-static broadcast join + rollup: the streamed pipeline must
    converge to the batch twin's totals (stateless join, complete-mode
    aggregate)."""
    batch = ev.enriched_category_totals(events_df,
                                        ev.event_type_dim(spark)).collect()
    stream = _run_stream(
        spark,
        ev.enriched_category_totals(_stream_source(spark, events_df, tmp_path),
                                    ev.event_type_dim(spark)),
        "enrich", tmp_path)
    got = stream.collect()
    key = lambda r: (r["event_type"], r["category"])
    assert {key(r): (r["n_events"], r["sum_weighted"]) for r in batch} == \
           {key(r): (r["n_events"], r["sum_weighted"]) for r in got}


def test_enrich_events_left_join_keeps_unknown_types(spark):
    rows = [(1, "click", 2.0), (2, "mystery", 3.0)]
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    out = {r["event_id"]: r for r in
           ev.enrich_events(df, ev.event_type_dim(spark)).collect()}
    assert out[1]["category"] == "engagement"
    assert out[1]["weighted_value"] == 2.0
    assert out[2]["category"] is None and out[2]["weighted_value"] is None


def test_bloom_probe_composes_with_streams(spark, events_df, tmp_path):
    """The Bloom probe is a stateless plan-literal predicate, so the same
    expression filters a stream without state stores or stream-static
    joins — batch and streamed survivor sets must be identical."""
    from relationaldecomposition_spark.operators import bloom

    small = events_df.where(F.col("event_type") == "purchase") \
        .select("user_id").limit(50)
    words = bloom.bloom_build(small, "user_id", m_bits=4096, k=5)
    pred = bloom.bloom_probe_expr("user_id", words, k=5)
    batch = sorted(r[0] for r in
                   events_df.where(pred).select("event_id").collect())
    out = _run_stream(spark,
                      _stream_source(spark, events_df, tmp_path).where(pred),
                      "bloom_stream", tmp_path, mode="append")
    streamed = sorted(r[0] for r in out.select("event_id").collect())
    assert batch == streamed and len(batch) > 0


def test_maponly_minhash_matches_exploded(spark):
    """The shuffle-free signature path must be bit-identical to the
    windowed codegen path (same hashes, same sentinel)."""
    from relationaldecomposition_spark.operators import dedup
    from tests.conftest import SF_DIR

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    a = sorted(tuple(r) for r in
               dedup.minhash_signatures(docs, "text", "doc_id").collect())
    b = sorted(tuple(r) for r in
               dedup.maponly_minhash_signatures(docs, "text",
                                                "doc_id").collect())
    assert a == b


def test_index_collision_stream_batch_parity(spark, tmp_path):
    """The stream-static index probe must flag exactly the docs the batch
    twin flags (same ids, same event times)."""
    import datetime

    from pyspark.sql import functions as F

    from relationaldecomposition_spark.operators import dedup

    t0 = datetime.datetime(2026, 1, 1)
    corpus_rows = [(i, f"alpha beta gamma delta epsilon zeta {i}")
                   for i in range(10)]
    corpus = spark.createDataFrame(corpus_rows, ["doc_id", "text"])
    idx = dedup.minhash_band_index(corpus, "text", "doc_id")

    new_rows = (
        [(100 + i, corpus_rows[i][1], t0 + datetime.timedelta(minutes=i))
         for i in range(5)] +                      # exact dups of corpus
        [(200 + i, f"totally different content number {i} with words",
          t0 + datetime.timedelta(minutes=i)) for i in range(5)] +
        [(300, "", t0)])                           # shingle-less
    new = spark.createDataFrame(new_rows, ["doc_id", "text", "ts"])

    batch = {(r["doc_id"], r["ts"]) for r in dedup.index_collision_stream(
        new, idx, "text", "doc_id").collect()}
    assert {d for d, _ in batch} == {100, 101, 102, 103, 104}

    src = tmp_path / "docs_src"
    new.write.mode("overwrite").parquet(str(src))
    stream = spark.readStream.schema(new.schema).parquet(str(src))
    out = _run_stream(
        spark, dedup.index_collision_stream(stream, idx, "text", "doc_id"),
        "idx_collisions", tmp_path, mode="append")
    got = {(r["doc_id"], r["ts"]) for r in out.collect()}
    assert got == batch


def test_semdedup_collision_stream_batch_parity(spark, tmp_path):
    """The stream-static SemDeDup cell-index probe must flag exactly the
    embeddings the batch twin flags (same ids, same event times) — the
    embedding-plane twin of test_index_collision_stream_batch_parity."""
    import datetime

    from relationaldecomposition_spark.operators import ivf

    t0 = datetime.datetime(2026, 1, 1)
    dim = 8

    def vec(seed, bump=0.0):
        import random
        rng = random.Random(seed)
        v = [rng.uniform(-1, 1) for _ in range(dim)]
        v[0] += bump
        return v

    corpus_rows = [(i, vec(i)) for i in range(20)]
    corpus = spark.createDataFrame(corpus_rows,
                                   "vec_id bigint, v array<double>")
    cents = ivf.seed_centroids(corpus, "v", "vec_id", [0, 5, 10, 15])
    idx = ivf.ivf_cell_index(corpus, "v", "vec_id", cents)

    new_rows = (
        # near-clones of corpus rows (same cell, cosine ~1)
        [(100 + i, [x * 1.01 for x in corpus_rows[i][1]],
          t0 + datetime.timedelta(minutes=i)) for i in range(5)] +
        # far vectors: negated corpus rows (cosine -1, same-ish cells
        # not guaranteed — either way they must NOT be flagged)
        [(200 + i, [-x for x in corpus_rows[i][1]],
          t0 + datetime.timedelta(minutes=i)) for i in range(5)])
    new = spark.createDataFrame(
        new_rows, "vec_id bigint, v array<double>, ts timestamp")

    batch = {(r["vec_id"], r["ts"])
             for r in ivf.semdedup_collision_stream(
                 new, idx, "v", "vec_id", cents, tau=0.9).collect()}
    assert {i for i, _ in batch} == {100, 101, 102, 103, 104}

    src = tmp_path / "emb_src"
    new.write.mode("overwrite").parquet(str(src))
    stream = spark.readStream.schema(new.schema).parquet(str(src))
    out = _run_stream(
        spark,
        ivf.semdedup_collision_stream(stream, idx, "v", "vec_id", cents,
                                      tau=0.9),
        "semdedup_collisions", tmp_path, mode="append")
    got = {(r["vec_id"], r["ts"]) for r in out.collect()}
    assert got == batch


def test_semdedup_collision_stream_repeated_ids_id_set_parity(
        spark, tmp_path):
    """Documented divergence (ADVICE r9): when the SAME id streams more
    than once with different timestamps, the streaming face keeps the
    first-arriving ts (dropDuplicatesWithinWatermark) while the batch
    face returns min(ts) — so the parity guarantee is over the flagged
    ID SET, and each stream ts must be one of that id's event times."""
    import datetime

    from relationaldecomposition_spark.operators import ivf

    t0 = datetime.datetime(2026, 1, 1)
    dim = 8

    def vec(seed, scale=1.0):
        import random
        rng = random.Random(seed)
        return [rng.uniform(-1, 1) * scale for _ in range(dim)]

    corpus = spark.createDataFrame([(i, vec(i)) for i in range(10)],
                                   "vec_id bigint, v array<double>")
    cents = ivf.seed_centroids(corpus, "v", "vec_id", [0, 5])
    idx = ivf.ivf_cell_index(corpus, "v", "vec_id", cents)

    # id 100 appears TWICE (both near-clones of corpus row 0, different ts)
    new_rows = [
        (100, vec(0, 1.01), t0 + datetime.timedelta(minutes=9)),
        (100, vec(0, 1.02), t0 + datetime.timedelta(minutes=1)),
        (101, vec(1, 1.01), t0 + datetime.timedelta(minutes=2)),
    ]
    new = spark.createDataFrame(
        new_rows, "vec_id bigint, v array<double>, ts timestamp")

    batch = ivf.semdedup_collision_stream(
        new, idx, "v", "vec_id", cents, tau=0.9).collect()
    batch_by_id = {r["vec_id"]: r["ts"] for r in batch}
    assert batch_by_id[100] == t0 + datetime.timedelta(minutes=1)  # min(ts)

    src = tmp_path / "emb_rep_src"
    new.write.mode("overwrite").parquet(str(src))
    stream = spark.readStream.schema(new.schema).parquet(str(src))
    out = _run_stream(
        spark,
        ivf.semdedup_collision_stream(stream, idx, "v", "vec_id", cents,
                                      tau=0.9),
        "semdedup_collisions_rep", tmp_path, mode="append")
    got = out.collect()
    assert {r["vec_id"] for r in got} == set(batch_by_id)  # id-set parity
    assert len(got) == len(batch_by_id)  # one flag per id either way
    valid_ts = {(r[0], r[2]) for r in new_rows}
    assert all((r["vec_id"], r["ts"]) in valid_ts for r in got)


def test_pq_collision_stream_batch_parity(spark, tmp_path):
    """The stream-static PQ code-store probe must flag exactly the rows the
    batch twin flags — the CODE-sized static side's twin of
    test_semdedup_collision_stream_batch_parity. Planted geometry: clones
    of SEED rows have ~zero ADC (seed slices reconstruct the seed
    exactly), everything else sits at O(1) quantization error."""
    import datetime

    from relationaldecomposition_spark.operators import ivf, pq

    t0 = datetime.datetime(2026, 1, 1)
    dim = 8

    def vec(seed):
        import random
        rng = random.Random(seed)
        return [rng.uniform(-1, 1) for _ in range(dim)]

    corpus_rows = [(i, vec(i)) for i in range(20)]
    corpus = spark.createDataFrame(corpus_rows,
                                   "vec_id bigint, v array<double>")
    seed_ids = [0, 5, 10, 15]
    coarse = ivf.seed_centroids(corpus, "v", "vec_id", seed_ids)
    cbs = pq.pq_seed_codebooks(corpus, "v", "vec_id", 2, seed_ids)
    idx = pq.pq_cell_index(corpus, "v", "vec_id", cbs, coarse)

    new_rows = (
        # near-clones of the SEED rows: ADC vs the seed's own codes is
        # ~||clone - seed||^2 ~ 1e-4 * |v|^2 — far under tau
        [(100 + k, [x * 1.01 for x in corpus_rows[s][1]],
          t0 + datetime.timedelta(minutes=k))
         for k, s in enumerate(seed_ids)] +
        # negated seeds: squared distance ~4|v|^2 — far over tau
        [(200 + k, [-x for x in corpus_rows[s][1]],
          t0 + datetime.timedelta(minutes=k))
         for k, s in enumerate(seed_ids)])
    new = spark.createDataFrame(
        new_rows, "vec_id bigint, v array<double>, ts timestamp")

    batch = {(r["vec_id"], r["ts"])
             for r in pq.pq_collision_stream(
                 new, idx, "v", "vec_id", cbs, coarse,
                 tau_adc=0.05).collect()}
    assert {i for i, _ in batch} == {100, 101, 102, 103}

    src = tmp_path / "pq_src"
    new.write.mode("overwrite").parquet(str(src))
    stream = spark.readStream.schema(new.schema).parquet(str(src))
    out = _run_stream(
        spark,
        pq.pq_collision_stream(stream, idx, "v", "vec_id", cbs, coarse,
                               tau_adc=0.05),
        "pq_collisions", tmp_path, mode="append")
    got = {(r["vec_id"], r["ts"]) for r in out.collect()}
    assert got == batch


def test_pq_collision_stream_hier_batch_parity(spark, tmp_path):
    """The hier twin: stream-static probe of the ROUTE-PARTITIONED PQ
    code store (pq_cell_index_hier) — row-local route + per-route cell
    probes, ADC gate, one flag per id. Same planted geometry as the flat
    test; stream must equal the batch face exactly."""
    import datetime

    from relationaldecomposition_spark.operators import ivf, pq

    t0 = datetime.datetime(2026, 1, 1)
    dim = 8

    def vec(seed):
        import random
        rng = random.Random(seed)
        return [rng.uniform(-1, 1) for _ in range(dim)]

    corpus_rows = [(i, vec(i)) for i in range(20)]
    corpus = spark.createDataFrame(corpus_rows,
                                   "vec_id bigint, v array<double>")
    seed_ids = [0, 5, 10, 15]
    coarse = ivf.seed_centroids(corpus, "v", "vec_id", seed_ids)
    cbs = pq.pq_seed_codebooks(corpus, "v", "vec_id", 2, seed_ids)
    subs = ivf.hier_codebook(corpus, "v", "vec_id", coarse, 2,
                             kernel="gram")
    idx = pq.pq_cell_index_hier(corpus, "v", "vec_id", cbs, coarse, subs)

    new_rows = (
        [(100 + k, [x * 1.01 for x in corpus_rows[s][1]],
          t0 + datetime.timedelta(minutes=k))
         for k, s in enumerate(seed_ids)] +
        [(200 + k, [-x for x in corpus_rows[s][1]],
          t0 + datetime.timedelta(minutes=k))
         for k, s in enumerate(seed_ids)])
    new = spark.createDataFrame(
        new_rows, "vec_id bigint, v array<double>, ts timestamp")

    kw = dict(tau_adc=0.05, route_probes=2, cells_per_route=2)
    batch = {(r["vec_id"], r["ts"])
             for r in pq.pq_collision_stream_hier(
                 new, idx, "v", "vec_id", cbs, coarse, subs,
                 **kw).collect()}
    # clones of seeds collide (a seed's own route/cell holds its exact
    # codes -> ADC ~ 0); negated seeds sit ~4|v|^2 away
    assert {i for i, _ in batch} == {100, 101, 102, 103}

    src = tmp_path / "pq_hier_src"
    new.write.mode("overwrite").parquet(str(src))
    stream = spark.readStream.schema(new.schema).parquet(str(src))
    out = _run_stream(
        spark,
        pq.pq_collision_stream_hier(stream, idx, "v", "vec_id", cbs,
                                    coarse, subs, **kw),
        "pq_hier_collisions", tmp_path, mode="append")
    got = {(r["vec_id"], r["ts"]) for r in out.collect()}
    assert got == batch

    with pytest.raises(ValueError, match="route_probes"):
        pq.pq_collision_stream_hier(new, idx, "v", "vec_id", cbs, coarse,
                                    subs, tau_adc=0.05, route_probes=99)
    with pytest.raises(ValueError, match="cells_per_route"):
        pq.pq_collision_stream_hier(new, idx, "v", "vec_id", cbs, coarse,
                                    subs, tau_adc=0.05, cells_per_route=0)

    # --- global_n_probes mode (r12 verdict ask #5): probe selection is
    # the BATCH probe's global top-n semantics via the stream-legal
    # _hier_probe_frame; stream must equal the batch face exactly, and
    # the clones must still collide (their own cell is always among the
    # globally nearest).
    gkw = dict(tau_adc=0.05, route_probes=2, global_n_probes=3)
    gbatch = {(r["vec_id"], r["ts"])
              for r in pq.pq_collision_stream_hier(
                  new, idx, "v", "vec_id", cbs, coarse, subs,
                  **gkw).collect()}
    assert {i for i, _ in gbatch} == {100, 101, 102, 103}
    gout = _run_stream(
        spark,
        pq.pq_collision_stream_hier(stream, idx, "v", "vec_id", cbs,
                                    coarse, subs, **gkw),
        "pq_hier_collisions_global", tmp_path, mode="append")
    assert {(r["vec_id"], r["ts"]) for r in gout.collect()} == gbatch
    with pytest.raises(ValueError, match="global_n_probes"):
        pq.pq_collision_stream_hier(new, idx, "v", "vec_id", cbs, coarse,
                                    subs, tau_adc=0.05, global_n_probes=0)
