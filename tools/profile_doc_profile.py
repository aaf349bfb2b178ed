"""Per-component accounting for the doc_profile sf10 row (round-10 verdict
ask #5): it is the last near-linear exponent (0.87 on the pinned layout)
and the old "bandwidth floor" verdict predates the layout fix that melted
the other floors. Decompose the fused one-scan profile into its signal
groups, each timed as scan+signal (warmed-solo: one sf0.1 in-process
warm-up, then median-of-3 at the target sf):

- scan_text: read id+text, checksum (the floor every signal pays)
- pii_augment: + with_synthetic_pii string surgery (o32's input shape)
- tokens: + token_count_cols (split + BPE_ISH regexp_count + length)
- quality: + quality_col (regex ratios)
- pii_counts: + pii_count_cols (3 regexp_counts)
- fp_lang_udf: + the fused fingerprint/lang pandas UDF (the one
  Arrow crossing)
- full: document_profile(with_synthetic_pii(docs)) == the o32 plan

Usage: SPARK_GRAFT_CPUS=32 python tools/profile_doc_profile.py [sf_dir]
Prints one JSON line.
"""
from __future__ import annotations

import json
import statistics
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")
from bench import _force  # noqa: E402
from relationaldecomposition_spark.operators import corpus  # noqa: E402
from relationaldecomposition_spark.operators.corpus import (  # noqa: E402
    PII_RULES, pii_count_cols, with_synthetic_pii)
from relationaldecomposition_spark.operators.text import (  # noqa: E402
    quality_col, token_count_cols)
from relationaldecomposition_spark.session import get_spark  # noqa: E402
from relationaldecomposition_spark.sources.tables import load_table  # noqa: E402


def timed(fn, repeats=3):
    samples = []
    for _ in range(repeats):
        t0 = time.time()
        fn()
        samples.append(time.time() - t0)
    return round(statistics.median(samples), 3)


def components(spark, sf_dir, repeats=3):
    docs = load_table(spark, sf_dir, "documents")
    aug = with_synthetic_pii(docs, "text", "doc_id")
    c = F.col("text")
    out = {}
    out["scan_text"] = timed(
        lambda: _force(docs.select("doc_id", "text")), repeats)
    out["pii_augment"] = timed(
        lambda: _force(aug.select("doc_id", "text")), repeats)
    out["tokens"] = timed(
        lambda: _force(aug.select("doc_id", *token_count_cols(c))), repeats)
    out["quality"] = timed(
        lambda: _force(aug.select("doc_id", quality_col(c))), repeats)
    out["pii_counts"] = timed(
        lambda: _force(aug.select("doc_id", *pii_count_cols(c))), repeats)

    from pyspark.sql.functions import pandas_udf

    from relationaldecomposition_spark.operators.text import (
        np_lang_pred, py_fingerprint_batch)

    @pandas_udf("struct<fingerprint:bigint,pred_lang:string>")
    def _fp_lang(texts):
        import pandas as pd
        return pd.DataFrame({
            "fingerprint": pd.Series(py_fingerprint_batch(texts),
                                     dtype="int64"),
            "pred_lang": pd.Series(
                np_lang_pred(texts.tolist(),
                             corpus.LID_PROFILE_MAX_CHARS),
                dtype="object")})

    out["fp_lang_udf"] = timed(
        lambda: _force(aug.select("doc_id", _fp_lang(c).alias("_fl"))
                       .select("doc_id", "_fl.fingerprint",
                               "_fl.pred_lang")), repeats)

    # fingerprint vs language split inside the UDF (driver-side numpy
    # over a collected sample would not see executor concurrency; instead
    # time single-signal UDF variants)
    @pandas_udf("bigint")
    def _fp_only(texts):
        import pandas as pd
        return pd.Series(py_fingerprint_batch(texts), dtype="int64")

    @pandas_udf("string")
    def _lang_only(texts):
        import pandas as pd
        return pd.Series(np_lang_pred(texts.tolist(),
                                      corpus.LID_PROFILE_MAX_CHARS),
                         dtype="object")

    out["fp_only_udf"] = timed(
        lambda: _force(aug.select("doc_id", _fp_only(c))), repeats)
    out["lang_only_udf"] = timed(
        lambda: _force(aug.select("doc_id", _lang_only(c))), repeats)
    out["full_profile"] = timed(
        lambda: _force(corpus.document_profile(aug, "text", "doc_id")),
        repeats)
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".data/sf10"
    spark = get_spark("profile-docprofile")
    spark.sparkContext.setLogLevel("ERROR")
    components(spark, "/root/testdata/sf0.1", repeats=1)   # JVM/UDF warm-up
    out = components(spark, sf_dir)
    print(json.dumps({"sf_dir": sf_dir, "components": out}))


if __name__ == "__main__":
    main()
