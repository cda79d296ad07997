"""Event-stream operators: tumbling windows + gap sessionization.

Batch implementations of the two classic "streaming" shapes (Ray Data's
streaming executor is the runtime; the semantics are deterministic batch):

* :func:`windowed_agg` — tumbling time windows per key.  Combiner
  discipline: each batch pre-aggregates to one partial row per
  (window, key) before the shuffle, so the exchange moves one row per
  (batch, window, key) — never raw events.
* :func:`sessionize` — gap-based sessions per user: a new session starts
  when the inter-event gap exceeds ``gap``.  Users are hash-bucketed
  (bucketing.py) and whole buckets processed with vectorized pandas
  kernels; skew is bounded by the hottest single user, which for
  session semantics is the minimal co-location unit.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .bucketing import bucketed_map_groups

__all__ = ["windowed_agg", "sliding_window_agg", "sessionize"]


def windowed_agg(ds, window: str = "hour", key_col: str = "event_type", ts_col: str = "ts", value_col: str = "value"):
    """→ Dataset (window_start, <key_col>, n_events, sum_value)."""

    def partials(t: pa.Table) -> pa.Table:
        win = pc.floor_temporal(t[ts_col], unit=window)
        df = pd.DataFrame(
            {
                "window_start": win.to_pandas(),
                key_col: t[key_col].to_pandas(),
                "_v": t[value_col].to_pandas(),
            }
        )
        # dropna=False: SQL GROUP BY emits a NULL key group; the pandas
        # default would silently drop every null-keyed event
        g = (
            df.groupby(["window_start", key_col], sort=False, dropna=False)["_v"]
            .agg(["size", "sum"])
            .reset_index()
        )
        return pa.table(
            {
                "window_start": pa.array(g["window_start"], pa.timestamp("us")),
                key_col: pa.array(g[key_col], pa.string()),
                "_n": pa.array(g["size"].to_numpy(np.int64)),
                "_s": pa.array(g["sum"].to_numpy(np.float64)),
            }
        )

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        g = (
            df.groupby(["window_start", key_col], sort=False, dropna=False)
            .agg(n_events=("_n", "sum"), sum_value=("_s", "sum"))
            .reset_index()
        )
        g["n_events"] = g["n_events"].astype(np.int64)
        g["sum_value"] = g["sum_value"].round(6)
        return g

    return bucketed_map_groups(
        ds.map_batches(partials, batch_format="pyarrow"),
        ["window_start", key_col],
        combine,
        out_schema=pa.schema(
            [
                ("window_start", pa.timestamp("us")),
                (key_col, pa.string()),
                ("n_events", pa.int64()),
                ("sum_value", pa.float64()),
            ]
        ),
    )


def sessionize(ds, gap_minutes: int = 30, user_col: str = "user_id", ts_col: str = "ts", value_col: str = "value"):
    """→ Dataset (user_id, session_start, n_events, sum_value): sessions
    split where the gap between consecutive events exceeds ``gap_minutes``."""
    gap = np.timedelta64(gap_minutes * 60, "s")

    def sessions_in_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([user_col, ts_col], kind="stable")
        user = df[user_col].to_numpy()
        ts = df[ts_col].to_numpy()
        n = len(df)
        if n == 0:
            return pd.DataFrame(
                {
                    "user_id": pd.Series([], dtype=np.int64),
                    "session_start": pd.Series([], dtype="datetime64[us]"),
                    "n_events": pd.Series([], dtype=np.int64),
                    "sum_value": pd.Series([], dtype=np.float64),
                }
            )
        new_sess = np.ones(n, dtype=bool)
        # NULL users form ONE partition (SQL PARTITION BY semantics):
        # NaN != NaN (and None is not None elementwise), so a raw
        # equality would split every null-user event into its own session
        isna = pd.isna(user)
        same_user = (user[1:] == user[:-1]) | (isna[1:] & isna[:-1])
        new_sess[1:] = ~same_user | ((ts[1:] - ts[:-1]) > gap)
        sess_id = np.cumsum(new_sess)
        g = (
            pd.DataFrame(
                {
                    "user_id": user,
                    "_sid": sess_id,
                    "session_start": ts,
                    "_v": df[value_col].to_numpy(),
                }
            )
            .groupby("_sid", sort=False)
            .agg(
                user_id=("user_id", "first"),
                session_start=("session_start", "min"),
                n_events=("user_id", "size"),
                sum_value=("_v", "sum"),
            )
            .reset_index(drop=True)
        )
        g["n_events"] = g["n_events"].astype(np.int64)
        g["sum_value"] = g["sum_value"].round(6)
        return g[["user_id", "session_start", "n_events", "sum_value"]]

    from .sampling import _input_schema

    in_sch = _input_schema(ds)
    # user_id keeps the INPUT column's type (string user keys worked
    # before typed stamping and must keep working)
    user_t = in_sch.field(user_col).type if in_sch is not None else None
    return bucketed_map_groups(
        ds.select_columns([user_col, ts_col, value_col]),
        [user_col],
        sessions_in_bucket,
        out_schema=pa.schema(
            [
                ("user_id", user_t),
                ("session_start", pa.timestamp("us")),
                ("n_events", pa.int64()),
                ("sum_value", pa.float64()),
            ]
        )
        if user_t is not None
        else None,
    )


def sliding_window_agg(
    ds,
    size_hours: int = 6,
    hop_hours: int = 3,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    epoch: str = "2024-01-01",
):
    """Sliding (hopping) windows: each event belongs to size/hop windows
    aligned to ``epoch``; the explode happens inside the per-batch combiner
    so the shuffle still moves one partial row per (batch, window, key)."""
    assert size_hours % hop_hours == 0, "hop must divide size"
    k = size_hours // hop_hours
    ep = pd.Timestamp(epoch)
    size = pd.Timedelta(hours=size_hours)
    hop = pd.Timedelta(hours=hop_hours)

    def partials(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "_ts": t[ts_col].to_pandas(),
                key_col: t[key_col].to_pandas(),
                "_v": t[value_col].to_pandas(),
            }
        )
        frames = []
        for j in range(k):
            off = ep + j * hop
            start = ((df["_ts"] - off) // size) * size + off
            frames.append(
                pd.DataFrame({"window_start": start, key_col: df[key_col], "_v": df["_v"]})
            )
        all_rows = pd.concat(frames, ignore_index=True)
        g = (
            all_rows.groupby(["window_start", key_col], sort=False, dropna=False)["_v"]
            .agg(["size", "sum"])
            .reset_index()
        )
        return pa.table(
            {
                "window_start": pa.array(g["window_start"], pa.timestamp("us")),
                key_col: pa.array(g[key_col], pa.string()),
                "_n": pa.array(g["size"].to_numpy(np.int64)),
                "_s": pa.array(g["sum"].to_numpy(np.float64)),
            }
        )

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        g = (
            df.groupby(["window_start", key_col], sort=False, dropna=False)
            .agg(n_events=("_n", "sum"), sum_value=("_s", "sum"))
            .reset_index()
        )
        g["n_events"] = g["n_events"].astype(np.int64)
        g["sum_value"] = g["sum_value"].round(6)
        return g

    return bucketed_map_groups(
        ds.map_batches(partials, batch_format="pyarrow"),
        ["window_start", key_col],
        combine,
        out_schema=pa.schema(
            [
                ("window_start", pa.timestamp("us")),
                (key_col, pa.string()),
                ("n_events", pa.int64()),
                ("sum_value", pa.float64()),
            ]
        ),
    )
