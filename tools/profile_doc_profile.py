"""Fused-vs-component-sum accounting for fused profile operators — the
regex co-residency CANARY (COVERAGE.md operator-authoring notes; round-11
headline, made generic per the round-11 verdict ask #8).

Round-10 shape: decompose the fused one-scan document profile into signal
groups, each timed as scan+signal (warmed-solo: one sf0.1 in-process
warm-up, then median-of-3 at the target sf). Round-12 shape: the
component set is a CLI argument, and the tool prints `component_sum`
and `fused_over_sum` so any new fused signal gets the co-residency A/B
by habit — a ratio well above ~1.1 on a quiet host means two co-resident
heavyweight expressions are deoptimizing each other (the round-11 find:
BPE+email java.util.regex patterns in one projection, 26.4 s fused vs
9.6 s component sum at sf10; fixed by moving BPE across the Arrow
boundary).

Components:

- scan_text: read id+text, checksum (the floor every signal pays)
- pii_augment: + with_synthetic_pii string surgery (o32's input shape)
- tokens: + token_count_cols (split + length; BPE now rides the UDF)
- quality: + quality_col (regex ratios)
- pii_counts: + pii_count_cols (3 regexp_counts)
- fp_lang_udf: the fused fingerprint/lang pandas UDF (the Arrow crossing)
- fp_only_udf / lang_only_udf: single-signal UDF variants (the intra-UDF
  split; driver-side numpy would not see executor concurrency)

Usage:
  SPARK_GRAFT_CPUS=32 python tools/profile_doc_profile.py [sf_dir] \
      [--components tokens,quality,pii_counts,fp_lang_udf] [--repeats N]

`--components` picks which groups to time (default: all); `full_profile`
(the o32 plan) always runs, and `component_sum` sums the chosen
SCAN-EXCLUSIVE costs (each component minus the shared pii_augment floor,
plus one floor) so the ratio compares like with like. Prints one JSON
line.
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
    pii_count_cols, with_synthetic_pii)
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


def _udfs():
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

    return _fp_lang, _fp_only, _lang_only


def component_registry(aug):
    """{name: thunk}: each thunk forces scan + that signal group over the
    PII-augmented frame. Extend here when document_profile grows a
    signal; the CLI picks any subset."""
    c = F.col("text")
    _fp_lang, _fp_only, _lang_only = _udfs()
    return {
        "tokens": lambda: _force(
            aug.select("doc_id", *token_count_cols(c))),
        "quality": lambda: _force(aug.select("doc_id", quality_col(c))),
        "pii_counts": lambda: _force(
            aug.select("doc_id", *pii_count_cols(c))),
        "fp_lang_udf": lambda: _force(
            aug.select("doc_id", _fp_lang(c).alias("_fl"))
               .select("doc_id", "_fl.fingerprint", "_fl.pred_lang")),
        "fp_only_udf": lambda: _force(aug.select("doc_id", _fp_only(c))),
        "lang_only_udf": lambda: _force(
            aug.select("doc_id", _lang_only(c))),
    }


# components that SUM to the fused plan (fp/lang single-signal variants
# are intra-UDF diagnostics, not additive parts)
SUM_SET = ("tokens", "quality", "pii_counts", "fp_lang_udf")


def components(spark, sf_dir, names, repeats=3):
    docs = load_table(spark, sf_dir, "documents")
    aug = with_synthetic_pii(docs, "text", "doc_id")
    reg = component_registry(aug)
    out = {}
    out["scan_text"] = timed(
        lambda: _force(docs.select("doc_id", "text")), repeats)
    out["pii_augment"] = timed(
        lambda: _force(aug.select("doc_id", "text")), repeats)
    for name in names:
        out[name] = timed(reg[name], repeats)
    out["full_profile"] = timed(
        lambda: _force(corpus.document_profile(aug, "text", "doc_id")),
        repeats)
    summed = [n for n in SUM_SET if n in out]
    if summed:
        floor = out["pii_augment"]
        out["component_sum"] = round(
            sum(out[n] - floor for n in summed) + floor, 3)
        if out["component_sum"] > 0:
            out["fused_over_sum"] = round(
                out["full_profile"] / out["component_sum"], 3)
    return out


def main():
    args = [a for a in sys.argv[1:]]
    sf_dir, names, repeats = ".data/sf10", None, 3
    i = 0
    while i < len(args):
        if args[i] == "--components":
            names = args[i + 1].split(",")
            i += 2
        elif args[i] == "--repeats":
            repeats = int(args[i + 1])
            i += 2
        else:
            sf_dir = args[i]
            i += 1
    spark = get_spark("profile-docprofile")
    spark.sparkContext.setLogLevel("ERROR")
    reg_names = list(component_registry(
        load_table(spark, "/root/testdata/sf0.1", "documents")))
    if names is None:
        names = reg_names
    unknown = set(names) - set(reg_names)
    if unknown:
        raise SystemExit(f"unknown components {sorted(unknown)}; "
                         f"available: {reg_names}")
    components(spark, "/root/testdata/sf0.1", names, repeats=1)  # warm-up
    out = components(spark, sf_dir, names, repeats=repeats)
    print(json.dumps({"sf_dir": sf_dir, "components": out}))


if __name__ == "__main__":
    main()
