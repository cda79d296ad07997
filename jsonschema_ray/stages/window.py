"""Grouped window/analytic operators Ray Data lacks natively.

Both follow the engine's shuffle discipline — ONE hash exchange on the
group key, then vectorized pandas kernels across every group in the
bucket (stages/bucketing.py):

* :func:`grouped_running_sum` — ``SUM(value) OVER (PARTITION BY key ORDER
  BY order)``: per-group prefix sums, the building block for cumulative
  metrics and budget caps.
* :func:`grouped_quantile` — exact per-group quantile (linear
  interpolation, matching ``quantile_cont``).  Exact quantiles need each
  group's values co-located — that is the partitioning assumption; for
  quantiles over giant groups use the mergeable t-digest in
  stages/sketches.py instead.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["grouped_running_sum", "grouped_quantile"]


def grouped_running_sum(
    ds, key_cols, order_cols, value_col: str, out_col: str = "running_sum"
):
    """→ Dataset: input columns + ``out_col`` prefix sum per group.

    ``order_cols`` should end in a unique column so the running order (and
    float accumulation order) is total — deterministic and equal to the
    SQL window frame's."""
    from .bucketing import bucketed_map_groups

    keys, orders = list(key_cols), list(order_cols)

    def run(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(keys + orders, kind="stable")
        v = df[value_col]
        if pd.api.types.is_integer_dtype(v):
            # pandas cumsum PRESERVES narrow int widths (an int32 prefix
            # sum silently wraps past 2^31) — widen before accumulating,
            # matching SQL's SUM OVER promotion to BIGINT
            df["_v64"] = v.astype(np.int64)
            # dropna=False: a NULL-key partition still gets its running sum
            # (SQL PARTITION BY keeps NULLs as one partition; the default
            # would NaN-poison the int64 column through a float upcast)
            df[out_col] = df.groupby(keys, sort=False, dropna=False)["_v64"].cumsum()
            df = df.drop(columns=["_v64"])
        else:
            df[out_col] = (
                df.groupby(keys, sort=False, dropna=False)[value_col]
                .cumsum()
                .round(6)
            )
        return df

    from .sampling import _input_schema

    in_sch = _input_schema(ds)
    out_schema = None
    if in_sch is not None:
        vt = in_sch.field(value_col).type
        out_t = pa.int64() if pa.types.is_integer(vt) else pa.float64()
        out_schema = in_sch.append(pa.field(out_col, out_t))
    return bucketed_map_groups(ds, keys, run, out_schema=out_schema)


def grouped_quantile(ds, key_cols, value_col: str, q: float = 0.5):
    """→ Dataset (key_cols…, q{pct}) exact per-group quantile."""
    from .bucketing import bucketed_map_groups

    keys = list(key_cols)
    out_col = f"q{int(round(q * 100))}"

    def quant(df: pd.DataFrame) -> pd.DataFrame:
        g = (
            df.groupby(keys, sort=False, dropna=False)[value_col]  # NULL key = a group
            .quantile(q, interpolation="linear")
            .round(6)
            .reset_index(name=out_col)
        )
        return g

    from .sampling import _input_schema

    in_sch = _input_schema(ds)
    out_schema = (
        pa.schema(
            [(c, in_sch.field(c).type) for c in keys] + [(out_col, pa.float64())]
        )
        if in_sch is not None
        else None
    )
    return bucketed_map_groups(ds, keys, quant, out_schema=out_schema)
