"""Local replica of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() twin on DuckDB at the given sf dir, compare
row-count, schema (column names), and order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from relationaldecomposition_spark.sources.tables import TABLES


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Order-insensitive canonical form: columns sorted by name, rows sorted
    by all values (stringified, like a value hash would see them)."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from relationaldecomposition_spark.session import get_spark

    spark = get_spark("check_oracle")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(got)} rows ({time.time()-t0:.1f}s)")
            continue
        try:
            exp = con.sql(oracles[name]).df()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        g, x = canon(got), canon(exp)
        status = []
        if len(g) != len(x):
            status.append(f"rowcount {len(g)} != {len(x)}")
        if list(g.columns) != list(x.columns):
            status.append(f"schema {list(g.columns)} != {list(x.columns)}")
        if not status:
            try:
                pd.testing.assert_frame_equal(g, x, check_dtype=False,
                                              check_exact=False, rtol=0, atol=1e-9)
            except AssertionError as e:
                status.append("values differ: " + str(e).split("\n")[0])
                # show first differing rows for debugging
                neq = (g.astype(str) != x.astype(str)).any(axis=1)
                if neq.any():
                    i = neq.idxmax()
                    status.append(f"first diff row {i}: got={g.iloc[i].to_dict()} "
                                  f"exp={x.iloc[i].to_dict()}")
        if status:
            failures.append(name)
            print(f"FAIL {name}: {'; '.join(status)}")
        else:
            print(f"OK   {name}: {len(g)} rows ({time.time()-t0:.1f}s)")

    spark.stop()
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
