"""Generate larger-scale testdata by replicating a driver-provided SF with
key-space offsets and content perturbation — the scale-proof input for
bench/scaling runs (never committed; .data/ is gitignored).

Scaling rules per table (k replicas, replica 0 = the original rows):
- fact/dimension keys shift by replica * (max_key) so key spaces stay
  disjoint and FK joins keep working against the replicated dimensions;
  low-cardinality measure/domain columns are left alone (their domains do
  NOT grow with SF, matching TPC-H semantics — group-by counts grow 10x,
  distinct groups stay).
- planted FDs survive: any column functionally determined by a shifted key
  is suffixed per replica (c_name, s_name, p_name) so key -> name holds at
  every scale.
- documents: replica > 0 texts get every token suffixed with the replica
  tag — within-replica near-dup structure is preserved verbatim while
  cross-replica Jaccard drops to ~0, so dedup workloads scale by data size,
  not by artificial 10-way duplicate cliques.
- embeddings: vectors rotate by `replica` positions — norms and pairwise
  geometry within a replica are preserved, cross-replica cosines decorrelate
  (no artificial cosine-1.0 cliques).
- events: user key space shifts (10x users, same time range) — windows get
  10x rows, sessionization gets 10x sessions.

Usage: python tools/gen_scale_data.py [--src /root/testdata/sf0.1]
           [--dest /root/repo/.data/sf1] [--factor 10]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from relationaldecomposition_spark.session import get_spark  # noqa: E402

COPY_TABLES = ["nation", "region"]
KEY_SHIFTS = {
    # table -> [(key col, suffixed name col or None)]
    "lineitem": [("l_orderkey", None)],
    "orders": [("o_orderkey", None), ("o_custkey", None)],
    "customer": [("c_custkey", "c_name")],
    "supplier": [("s_suppkey", "s_name")],
    "part": [("p_partkey", "p_name")],
    "events": [("event_id", None), ("user_id", None)],
}


def _replicate(df: DataFrame, factor: int) -> DataFrame:
    """Cross-join with a replica index column (0..factor-1)."""
    reps = df.sparkSession.range(factor).select(
        F.col("id").cast("int").alias("_rep"))
    return df.crossJoin(F.broadcast(reps))


def _shift_keys(df: DataFrame, specs, factor: int) -> DataFrame:
    out = _replicate(df, factor)
    for key, name_col in specs:
        hi = df.agg(F.max(key)).first()[0] or 0
        out = out.withColumn(key, (F.col(key) + F.col("_rep") * F.lit(hi + 1))
                             .cast(dict(df.dtypes)[key]))
        if name_col:
            out = out.withColumn(
                name_col,
                F.when(F.col("_rep") == 0, F.col(name_col))
                 .otherwise(F.concat(F.col(name_col), F.lit("_r"),
                                     F.col("_rep").cast("string"))))
    return out.drop("_rep")


def scale_documents(df: DataFrame, factor: int) -> DataFrame:
    hi = df.agg(F.max("doc_id")).first()[0] or 0
    out = _replicate(df, factor)
    out = out.withColumn("doc_id", F.col("doc_id") + F.col("_rep") * F.lit(hi + 1))
    tagged = F.regexp_replace(
        F.col("text"), r"(\S+)",
        F.concat(F.lit("$1_x"), F.col("_rep").cast("string")))
    out = out.withColumn("text", F.when(F.col("_rep") == 0, F.col("text"))
                         .otherwise(tagged))
    return out.withColumn("n_chars", F.length("text").cast("bigint")) \
              .drop("_rep")


def scale_embeddings(df: DataFrame, factor: int) -> DataFrame:
    hi = df.agg(F.max("vec_id")).first()[0] or 0
    dim = len(df.first()["embedding"])
    out = _replicate(df, factor)
    out = out.withColumn("vec_id", F.col("vec_id") + F.col("_rep") * F.lit(hi + 1))
    # rotation amount mod dim: factor may exceed the dimensionality
    # (replicas dim, 2*dim, ... land on rotation 0 again — still
    # key-disjoint, and sign flips below keep them decorrelated)
    rot = F.when(F.col("_rep") == 0, F.col("embedding"))
    for r in range(1, factor):
        k = r % dim
        rolled = (F.col("embedding") if k == 0 else
                  F.concat(F.slice("embedding", k + 1, dim - k),
                           F.slice("embedding", 1, k)))
        if k == 0 and r > 0:
            # same rotation as replica 0: negate to decorrelate
            rolled = F.transform(rolled, lambda x: -x)
        rot = rot.when(F.col("_rep") == r, rolled)
    return out.withColumn("embedding", rot).drop("_rep")


def apply_skew(name: str, df: DataFrame) -> DataFrame:
    """Adversarial (Zipf-ish) distributions, applied AFTER scaling so every
    replica contributes to the hot keys. All transforms are deterministic
    id-modulo selections — no RNG, reruns are byte-stable.

    - documents: every 4th doc collapses to ONE boilerplate template — a
      single LSH band bucket holds 25% of the corpus (the templated-corpus
      hazard the hot-bucket guard exists for).
    - embeddings: every 4th vector becomes one fixed direction — one hot
      SRP/IVF bucket with 25% of the vectors.
    - lineitem: half the rows take the mode value in two measure columns —
      hot group-by keys for the entropy/mining pipelines.
    - events: every 3rd event reassigns to one hot user — one sessionize /
      stateful-agg group carries a third of the stream.
    """
    if name == "documents":
        hot = F.col("doc_id") % 4 == 0
        template = F.lit(
            "terms of service apply to all content provided by the site "
            "operator all rights reserved worldwide without limitation")
        return (df.withColumn("text",
                              F.when(hot, template).otherwise(F.col("text")))
                  .withColumn("n_chars", F.length("text").cast("bigint")))
    if name == "embeddings":
        hot = F.col("vec_id") % 4 == 0
        fixed = F.transform(F.col("embedding"),
                            lambda x: F.lit(0.5).cast("float"))
        return df.withColumn(
            "embedding", F.when(hot, fixed).otherwise(F.col("embedding")))
    if name == "lineitem":
        hot = F.col("l_orderkey") % 2 == 0
        df = df.withColumn(
            "l_quantity",
            F.when(hot, F.lit(25.0)).otherwise(F.col("l_quantity")))
        return df.withColumn(
            "l_discount",
            F.when(hot, F.lit(0.05)).otherwise(F.col("l_discount")))
    if name == "events":
        hot = F.col("event_id") % 3 == 0
        min_user = df.agg(F.min("user_id")).first()[0] or 0
        return df.withColumn(
            "user_id",
            F.when(hot, F.lit(min_user)).otherwise(F.col("user_id")))
    return df


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dest", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".data", "sf1"))
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--skew", action="store_true",
                    help="apply adversarial hot-key/hot-bucket skew "
                         "(apply_skew) after scaling")
    args = ap.parse_args(argv)
    spark = get_spark("gen-scale-data")
    os.makedirs(args.dest, exist_ok=True)
    from relationaldecomposition_spark.sources.tables import load_table
    for name in COPY_TABLES + list(KEY_SHIFTS) + ["documents", "embeddings"]:
        # load_table handles events' TIMESTAMP(NANOS) physical type; the
        # regenerated copy is written as standard micros
        df = load_table(spark, args.src, name)
        if name in COPY_TABLES:
            out = df
        elif name == "documents":
            out = scale_documents(df, args.factor)
        elif name == "embeddings":
            out = scale_embeddings(df, args.factor)
        else:
            out = _shift_keys(df, KEY_SHIFTS[name], args.factor)
        if args.skew:
            out = apply_skew(name, out)
        dest = f"{args.dest}/{name}.parquet"
        # PIN the file count: the replica expansion inherits the source's
        # 1-3 input partitions, and coalesce can only shrink — round-9/10
        # regenerations landed 60M-row tables in 3 files, capping scan
        # parallelism at ~3 tasks and silently skewing cross-round sf10
        # comparisons (entropy_batch32 "regressed" 64->77 s on identical
        # code purely from layout luck). Deterministic layout = comparable
        # rows: many small files is the realistic big-table shape (scan
        # parallelism comes from file count at 100 TB too).
        n_files = 1 if name in COPY_TABLES else max(32, min(256, args.factor))
        out.repartition(n_files).write.mode("overwrite").parquet(dest)
        print(f"{name}: {spark.read.parquet(dest).count()} rows -> {dest}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
