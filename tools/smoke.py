"""Driver-style smoke: run every queries() entry and compare with
oracle_sql() via DuckDB (sorted columns, sorted rows, rounded floats).

Usage: python tools/smoke.py [query ...]   # default: all queries
       SMOKE_SF=/root/testdata/sf0.1 python tools/smoke.py   # other scale
"""
import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd
import ray

sys.path.insert(0, "/root/repo")

SF = os.environ.get("SMOKE_SF", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == np.float64 or df[c].dtype == np.float32:
            df[c] = df[c].astype(np.float64).round(6)
        elif str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
        else:
            try:
                df[c] = df[c].astype(np.int64)
            except (TypeError, ValueError):
                df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def main():
    ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import __ray_entry__ as e

    e.SF01 = SF  # rebuild path-parameterized oracles against this scale
    qs, oracles = e.queries(), e.oracle_sql()
    only = set(sys.argv[1:])
    unknown = only - set(qs)
    if unknown:
        # a typo'd name would otherwise skip everything and print a
        # false 'FAILS: none'
        print(f"unknown query names: {sorted(unknown)}", file=sys.stderr)
        sys.exit(2)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    fails = []
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = fn(SF)
            got = got.to_pandas() if hasattr(got, "to_pandas") else got
        except Exception as ex:
            print(f"FAIL {name}: raised {type(ex).__name__}: {ex}")
            fails.append(name)
            continue
        dt = time.time() - t0
        sql = oracles.get(name)
        if sql is None:
            print(f"ok   {name}: {len(got)} rows (no oracle) [{dt:.1f}s]")
            continue
        want = con.execute(sql).df()
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != oracle {len(want)} [{dt:.1f}s]")
            fails.append(name)
            continue
        g, w = norm(got), norm(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: cols {list(g.columns)} != {list(w.columns)}")
            fails.append(name)
            continue
        if not g.equals(w):
            neq = (g != w).any(axis=0)
            print(f"FAIL {name}: value mismatch in {list(g.columns[neq])}")
            fails.append(name)
            continue
        print(f"ok   {name}: {len(got)} rows == oracle [{dt:.1f}s]")
    ray.shutdown()
    print("FAILS:", fails if fails else "none")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
