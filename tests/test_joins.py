"""asof_join semantics on hand fixtures: inclusive backward match, ties,
left-outer nulls, forward direction, tolerance, and the one-shuffle plan
shape (union+window, no join operator at all)."""

from datetime import datetime

import pytest

from pyspark.sql import functions as F

from relationaldecomposition_spark.operators.joins import asof_join


def ts(s):
    return datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [(1, 10, ts("2024-01-01T10:00:00"), "p1"),
         (2, 10, ts("2024-01-01T12:00:00"), "p2"),
         (3, 10, ts("2024-01-01T09:00:00"), "p3"),   # before any right row
         (4, 20, ts("2024-01-01T11:00:00"), "p4"),   # key with no right rows
         (5, 30, ts("2024-01-01T11:00:00"), "p5")],  # equal-ts (inclusive)
        "lid long, k long, lts timestamp, tag string")
    right = spark.createDataFrame(
        [(100, 10, ts("2024-01-01T09:30:00"), 1.0),
         (101, 10, ts("2024-01-01T11:00:00"), 2.0),
         (102, 10, ts("2024-01-01T11:30:00"), 3.0),
         (103, 30, ts("2024-01-01T11:00:00"), 7.0),   # equal-ts tie pair:
         (104, 30, ts("2024-01-01T11:00:00"), 8.0)],  # greatest rid wins
        "rid long, k long, rts timestamp, val double")
    return left, right


def _rows(df):
    return {r["lid"]: r.asDict() for r in df.collect()}


def test_backward_inclusive_and_outer(frames):
    left, right = frames
    out = asof_join(left, right, "k", "lts", "rts", ["rid", "val"],
                    tiebreak="rid")
    assert set(out.columns) == {"lid", "k", "lts", "tag", "rid", "val",
                                "asof_ts"}
    got = _rows(out)
    assert len(got) == 5                       # every left row survives
    assert got[1]["rid"] == 100                # latest at-or-before 10:00
    assert got[2]["rid"] == 102                # 11:30 < 12:00
    assert got[3]["rid"] is None               # no right row before 09:00
    assert got[4]["rid"] is None               # key 20 has no right rows
    assert got[5]["rid"] == 104                # equal ts matches; max rid wins
    assert got[5]["val"] == 8.0                # payload comes from the SAME row
    assert got[5]["asof_ts"] == ts("2024-01-01T11:00:00")


def test_forward_direction(frames):
    left, right = frames
    out = asof_join(left, right, "k", "lts", "rts", ["rid"],
                    direction="forward", tiebreak="rid")
    got = _rows(out)
    assert got[1]["rid"] == 101                # earliest at-or-after 10:00
    assert got[2]["rid"] is None               # nothing after 12:00
    assert got[3]["rid"] == 100                # 09:30 >= 09:00
    assert got[5]["rid"] == 104                # equal ts inclusive, max rid


def test_tolerance_nulls_stale_matches(frames):
    left, right = frames
    out = asof_join(left, right, "k", "lts", "rts", ["rid", "val"],
                    tiebreak="rid", tolerance_s=15 * 60)
    got = _rows(out)
    assert got[1]["rid"] is None               # 30 min gap > 15 min: nulled
    assert got[2]["rid"] is None               # 30 min gap > 15 min: nulled
    assert got[5]["rid"] == 104                # 0 gap: kept
    assert len(got) == 5                       # left rows never dropped


def test_tolerance_exact_cutoff(spark):
    left = spark.createDataFrame([(1, 1, ts("2024-01-01T01:00:00"))],
                                 "lid long, k long, lts timestamp")
    right = spark.createDataFrame([(9, 1, ts("2024-01-01T00:00:00"), 5.0)],
                                  "rid long, k long, rts timestamp, val double")
    keep = asof_join(left, right, "k", "lts", "rts", ["val"],
                     tolerance_s=3600).collect()[0]
    drop = asof_join(left, right, "k", "lts", "rts", ["val"],
                     tolerance_s=3599).collect()[0]
    assert keep["val"] == 5.0 and keep["asof_ts"] is not None
    assert drop["val"] is None and drop["asof_ts"] is None


def test_payload_prefix_avoids_collisions(frames):
    left, right = frames
    out = asof_join(left.withColumnRenamed("lid", "rid"), right, "k",
                    "lts", "rts", ["rid", "val"], tiebreak="rid",
                    payload_prefix="r_")
    assert {"rid", "r_rid", "r_val", "r_asof_ts"} <= set(out.columns)


def test_plan_is_one_window_no_join(frames):
    left, right = frames
    out = asof_join(left, right, "k", "lts", "rts", ["rid"], tiebreak="rid")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, "asof must be union+window, not a join"
    assert plan.count("Window") >= 1


def test_matches_naive_inequality_join(spark, frames):
    """Property check vs the quadratic formulation on the fixture."""
    left, right = frames
    out = asof_join(left, right, "k", "lts", "rts", ["rid"], tiebreak="rid")
    naive = (left.join(right, (left.k == right.k) & (right.rts <= left.lts))
             .groupBy("lid")
             .agg(F.max(F.struct("rts", "rid")).alias("m"))
             .select("lid", F.col("m.rid").alias("rid")))
    nv = {r["lid"]: r["rid"] for r in naive.collect()}
    for lid, row in _rows(out).items():
        assert row["rid"] == nv.get(lid)


def test_randomized_against_python_reference(spark):
    """Seeded random instance (duplicate timestamps, sparse keys, both
    directions) vs a brute-force Python as-of."""
    import random
    rng = random.Random(20240814)
    base = ts("2024-01-01T00:00:00").timestamp()
    lrows = [(i, rng.randrange(8),
              datetime.fromtimestamp(base + rng.randrange(0, 3600)))
             for i in range(200)]
    rrows = [(1000 + i, rng.randrange(8),
              datetime.fromtimestamp(base + rng.randrange(0, 3600)),
              float(rng.randrange(100)))
             for i in range(200)]
    left = spark.createDataFrame(lrows, "lid long, k long, lts timestamp")
    right = spark.createDataFrame(rrows, "rid long, k long, rts timestamp, val double")

    def ref(direction):
        out = {}
        for lid, lk, lt in lrows:
            cands = [(rt, rid, v) for rid, rk, rt, v in rrows
                     if rk == lk and (rt <= lt if direction == "backward"
                                      else rt >= lt)]
            if not cands:
                out[lid] = (None, None)
                continue
            if direction == "backward":
                rt, rid, v = max(cands, key=lambda c: (c[0], c[1]))
            else:
                # nearest future ts; greatest rid among ties on that ts
                best_ts = min(c[0] for c in cands)
                rt, rid, v = max((c for c in cands if c[0] == best_ts),
                                 key=lambda c: c[1])
            out[lid] = (rid, v)
        return out

    for direction in ("backward", "forward"):
        got = {r["lid"]: (r["rid"], r["val"]) for r in
               asof_join(left, right, "k", "lts", "rts", ["rid", "val"],
                         direction=direction, tiebreak="rid").collect()}
        assert got == ref(direction), f"direction={direction}"


# -- interval_join -----------------------------------------------------------

from relationaldecomposition_spark.operators.joins import interval_join


@pytest.fixture(scope="module")
def iv_frames(spark):
    pts = spark.createDataFrame(
        [(1, 10, ts("2024-01-01T10:00:00")),
         (2, 10, ts("2024-01-01T10:30:00")),   # inside two intervals
         (3, 10, ts("2024-01-01T23:00:00")),   # inside none
         (4, 20, ts("2024-01-01T10:00:00")),   # other key, same instant
         (5, 10, ts("2024-01-01T11:00:00"))],  # exactly on an end bound
        "pid long, k long, pts timestamp")
    ivs = spark.createDataFrame(
        [(100, 10, ts("2024-01-01T09:45:00"), ts("2024-01-01T11:00:00"), "a"),
         (101, 10, ts("2024-01-01T10:15:00"), ts("2024-01-01T10:45:00"), "b"),
         (102, 20, ts("2024-01-01T09:00:00"), ts("2024-01-01T10:00:00"), "c"),
         (103, 30, ts("2024-01-01T00:00:00"), ts("2024-01-02T00:00:00"), "d")],
        "iid long, k long, s timestamp, e timestamp, tag string")
    return pts, ivs


def test_interval_join_semantics(iv_frames):
    pts, ivs = iv_frames
    out = interval_join(pts, ivs, "k", "pts", "s", "e",
                        ["iid", "tag"], bucket_s=600).collect()
    got = sorted((r["pid"], r["iid"]) for r in out)
    # point 1 in 100 only; 2 in both 100+101; 3 nowhere; 4 on 102's
    # inclusive end; 5 on 100's inclusive end
    assert got == [(1, 100), (2, 100), (2, 101), (4, 102), (5, 100)]
    by = {(r["pid"], r["iid"]): r for r in out}
    assert by[(2, 101)]["tag"] == "b"
    # point columns survive untouched
    assert by[(1, 100)]["k"] == 10 and by[(1, 100)]["pts"] is not None


def test_interval_join_no_nested_loop(iv_frames):
    """The scale invariant: bucketized equi-join — never a broadcast
    nested loop or cartesian product, regardless of the range predicate."""
    pts, ivs = iv_frames
    plan = interval_join(pts, ivs, "k", "pts", "s", "e", ["iid"],
                         bucket_s=600) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_interval_join_bucket_width_invariance(iv_frames):
    """Results are independent of the bucket width (only the plan's
    amplification changes)."""
    pts, ivs = iv_frames
    ref = None
    for width in (60, 3600, 86400 * 400):
        got = sorted((r["pid"], r["iid"]) for r in
                     interval_join(pts, ivs, "k", "pts", "s", "e",
                                   ["iid"], bucket_s=width).collect())
        if ref is None:
            ref = got
        assert got == ref, width


def test_interval_join_randomized_against_python(spark):
    import random
    rng = random.Random(33)
    base = datetime(2024, 1, 1).timestamp()
    pts_rows = [(i, rng.randrange(3),
                 datetime.fromtimestamp(base + rng.randrange(0, 86400)))
                for i in range(120)]
    iv_rows = []
    for j in range(40):
        s = base + rng.randrange(0, 86400)
        iv_rows.append((1000 + j, rng.randrange(3),
                        datetime.fromtimestamp(s),
                        datetime.fromtimestamp(s + rng.randrange(0, 7200))))
    pts = spark.createDataFrame(pts_rows, "pid long, k long, pts timestamp")
    ivs = spark.createDataFrame(iv_rows, "iid long, k long, s timestamp, e timestamp")
    got = sorted((r["pid"], r["iid"]) for r in
                 interval_join(pts, ivs, "k", "pts", "s", "e", ["iid"],
                               bucket_s=900).collect())
    exp = sorted((pid, iid)
                 for pid, pk, pt in pts_rows
                 for iid, ik, s, e in iv_rows
                 if pk == ik and s <= pt <= e)
    assert got == exp
