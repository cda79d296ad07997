"""Oracle parity at 6M turns (VERDICT r4 item 8).

BASELINE.md pins sf0.1 (606k-turn) oracle parity; this script re-proves the
direct bucket exchange's correctness in the multi-wave regime it was built
for by running the two headline transcript queries (q_conv_checks,
q_row_modes) over the 6,000,000-turn planted table and hash-comparing
against the same DuckDB SQL the driver uses, with the driver's
sorted-columns/sorted-rows/rounded-floats normalization.

Usage: python tools/parity_6m.py [n_turns]   # default 6_000_000
"""
import sys
import time

import duckdb
import numpy as np
import pandas as pd
import ray

sys.path.insert(0, "/root/repo")

N = int(sys.argv[1]) if len(sys.argv) > 1 else 6_000_000


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype in (np.float64, np.float32):
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


def main() -> int:
    ray.init(address="local", num_cpus=32, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from jsonschema_ray.sources.transcripts import generate_transcripts
    from jsonschema_ray.pipelines import queries as q

    path = generate_transcripts(
        f"/tmp/graft_transcripts/big-{N}", n_turns=N, seed=42
    )
    # Route the sf_dir-keyed helpers at the big table.
    q.transcripts_path = lambda sf_dir, variant="planted": path

    con = duckdb.connect()
    fails = 0
    for name, fn, sql in [
        ("q_conv_checks", q.q_conv_checks, q.conv_checks_sql(path)),
        ("q_row_modes", q.q_row_modes, q.row_modes_sql(path)),
    ]:
        t0 = time.time()
        got = fn("ignored")
        got = got.to_pandas() if hasattr(got, "to_pandas") else got
        ray_dt = time.time() - t0
        t0 = time.time()
        want = con.execute(sql).df()
        duck_dt = time.time() - t0
        g, w = norm(got), norm(want)
        rows_ok = len(g) == len(w)
        cols_ok = list(g.columns) == list(w.columns)
        hash_ok = rows_ok and cols_ok and g.equals(w)
        status = "ok  " if hash_ok else "FAIL"
        print(
            f"{status} {name}: ray {len(got)} rows [{ray_dt:.1f}s] vs duckdb "
            f"{len(want)} rows [{duck_dt:.1f}s] — rows={rows_ok} "
            f"cols={cols_ok} hash={hash_ok}"
        )
        if not hash_ok:
            fails += 1
            if rows_ok and cols_ok:
                diff = (g != w).any(axis=1)
                print(g[diff].head(), "\nvs\n", w[diff].head())
    ray.shutdown()
    return fails


if __name__ == "__main__":
    sys.exit(main())
