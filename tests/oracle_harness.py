"""Local replica of the driver's correctness gate: run each queries() entry
and its oracle_sql() side by side, compare row-count + sorted-column values."""

from __future__ import annotations

import numpy as np
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def to_df(res) -> pd.DataFrame:
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    if isinstance(res, pd.DataFrame):
        return res
    return res.to_pandas() if hasattr(res, "to_pandas") else pd.DataFrame(res)


def duckdb_con(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].round(6)
        elif str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def compare(name: str, got: pd.DataFrame, want: pd.DataFrame):
    got, want = canonicalize(got), canonicalize(want)
    issues = []
    if len(got) != len(want):
        issues.append(f"row count {len(got)} vs {len(want)}")
    elif list(got.columns) != list(want.columns):
        issues.append(f"columns {list(got.columns)} vs {list(want.columns)}")
    else:
        # dtype-tolerant value compare
        for c in got.columns:
            a, b = got[c], want[c]
            try:
                if np.issubdtype(a.dtype, np.number) or np.issubdtype(
                    b.dtype, np.number
                ):
                    eq = np.allclose(
                        a.astype(float), b.astype(float), rtol=0, atol=1e-9, equal_nan=True
                    )
                else:
                    eq = a.equals(b)
            except (TypeError, ValueError):
                eq = a.astype(str).equals(b.astype(str))
            if not eq:
                bad = (a.astype(str) != b.astype(str)).to_numpy().nonzero()[0][:3]
                issues.append(
                    f"column {c!r} differs, e.g. rows {bad.tolist()}: "
                    + "; ".join(
                        f"{a.iloc[i]!r} vs {b.iloc[i]!r}" for i in bad[:3]
                    )
                )
    return issues


def run_all(sf_dir: str, names=None) -> dict:
    import __ray_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    con = duckdb_con(sf_dir)
    results = {}
    for name, fn in qs.items():
        if names is not None and name not in names:
            continue
        got = to_df(fn(sf_dir))
        if name in oracles:
            want = con.execute(oracles[name]).df()
            issues = compare(name, got, want)
            results[name] = {"rows": len(got), "issues": issues}
        else:
            results[name] = {"rows": len(got), "issues": ["(rows-only)"]}
    return results
