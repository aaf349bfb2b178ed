"""Experiment-harness parity: the three reference result-CSV schemas are
written, parse back, and carry sane counter values; the sweep CLI runs a
small directory end-to-end (VERDICT r2 item #4)."""

import csv
import os
import shutil

import pytest

from relationaldecomposition_spark.experiments import (
    ENUM_HEADER, MINSEP_HEADER, MVD_SWEEP_HEADER, run_minsep_experiment,
    run_mvd_sweep, run_schema_enumeration)
from tests.conftest import SF_DIR, load


def _read(path):
    with open(path, newline="") as f:
        return list(csv.reader(f))


@pytest.fixture(scope="module")
def denorm4(spark):
    c = load(spark, "customer")
    n = load(spark, "nation")
    return (c.join(n, c.c_nationkey == n.n_nationkey)
             .select("c_custkey", "c_nationkey", "c_mktsegment", "n_name"))


def test_mvd_sweep_csv(tmp_path, denorm4):
    out = str(tmp_path / "denorm4.out.csv")
    results = run_mvd_sweep(denorm4, out, thresholds=(0.0, 0.5),
                            timeout_sec=600)
    rows = _read(out)
    assert rows[0] == MVD_SWEEP_HEADER
    assert len(rows) == 3
    for res, row in zip(results, rows[1:]):
        assert res.completed
        assert int(row[0]) == 4                 # #Attribtues
        assert int(row[1]) > 0                  # #Rows
        assert int(row[3]) >= 1                 # #MVDs mined
        assert int(row[4]) >= 1                 # jobs run
        assert float(row[6]) >= float(row[5])   # total time >= scan time
        assert 0.0 <= float(row[7]) <= 100.0    # %scanning


def test_mvd_sweep_timeout_row(tmp_path, denorm4):
    out = str(tmp_path / "t.out.csv")
    results = run_mvd_sweep(denorm4, out, thresholds=(0.0,),
                            timeout_sec=0.001)
    rows = _read(out)
    assert not results[0].completed
    assert rows[1][1] == "NaN" and rows[1][6].startswith(">")


def test_minsep_csv_and_sep_file(tmp_path, denorm4):
    out = str(tmp_path / "denorm4.csv")
    sep_dir = str(tmp_path / "seps")
    results = run_minsep_experiment(denorm4, out, sep_dir, "denorm4",
                                    thresholds=(0.0,), timeout_sec=600)
    rows = _read(out)
    assert rows[0] == MINSEP_HEADER
    assert len(rows) == 2
    row = rows[1]
    assert results[0].completed and row[5] == "True"
    assert int(row[6]) >= 1                     # minimal separators
    assert int(row[10]) >= 1                    # queries issued
    assert float(row[12]) >= float(row[11])     # total >= query time
    assert int(row[14]) >= 1                    # cached entropies
    assert int(row[15]) > 0                     # tuples processed
    seps = [f for f in os.listdir(sep_dir) if f.endswith(".sep")]
    # the RANGE component is the engine's grouping-sets cap (the reference's
    # "Range Size" parameter) — derive it so the test pins the filename
    # STRUCTURE, not one tuning value
    from relationaldecomposition_spark.engine.entropy import (
        DEFAULT_MAX_GROUPING_SETS)
    expected = f"denorm4.TO.600.RANGE.{DEFAULT_MAX_GROUPING_SETS}.THRESH.0.0.sep"
    assert seps == [expected]
    # the .sep parses back into at least one JD over this schema
    from relationaldecomposition_spark.sources.jd_io import read_jds
    jds = read_jds(os.path.join(sep_dir, seps[0]), denorm4.columns)
    assert jds


def test_schema_enum_csv(tmp_path, denorm4):
    sep_dir = str(tmp_path / "seps")
    run_minsep_experiment(denorm4, str(tmp_path / "m.csv"), sep_dir,
                          "denorm4", thresholds=(0.0,), timeout_sec=600)
    from relationaldecomposition_spark.engine.entropy import (
        DEFAULT_MAX_GROUPING_SETS)
    sep = os.path.join(
        sep_dir,
        f"denorm4.TO.600.RANGE.{DEFAULT_MAX_GROUPING_SETS}.THRESH.0.0.sep")
    out = str(tmp_path / "denorm4.enum.out.csv")
    rows_out = run_schema_enumeration(denorm4, sep, out, max_schemas=3)
    rows = _read(out)
    assert rows[0] == ENUM_HEADER
    assert 1 <= len(rows_out) <= 3
    for row in rows[1:]:
        assert int(row[7]) >= 2                 # #Relations
        assert int(row[8]) >= 0                 # spurious
        assert int(row[9]) > 0 and int(row[10]) > 0


def test_cli_end_to_end(tmp_path, spark):
    """CLI smoke over a directory of two small relations (region, nation):
    sweep two thresholds, enumerate, check all outputs exist. Reuses the
    session via get_spark's getOrCreate (same JVM)."""
    from relationaldecomposition_spark.cli import main
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    os.makedirs(in_dir)
    for t in ["region", "nation"]:
        shutil.copy(f"{SF_DIR}/{t}.parquet", f"{in_dir}/{t}.parquet")
    rc = main(["--input-dir", in_dir, "--out-dir", out_dir,
               "--mode", "minsep", "--thresholds", "0.0,0.1",
               "--timeout", "600", "--enumerate"])
    assert rc == 0
    got = sorted(os.listdir(out_dir))
    for t in ["region", "nation"]:
        assert f"{t}.csv" in got
        assert f"{t}.enum.out.csv" in got
        assert any(f.startswith(f"{t}.TO.") and f.endswith(".sep")
                   for f in got)
        assert len(_read(os.path.join(out_dir, f"{t}.csv"))) == 3
