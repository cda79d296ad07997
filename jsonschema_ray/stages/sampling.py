"""Sampling and per-group limiting operators.

Training-data pipelines constantly carve reproducible subsets: "10% of the
corpus", "first k turns per conversation", "3 exemplar events per type".
Both operators here are deterministic (stable across reruns, partitionings
and resume boundaries — no RNG state to checkpoint):

* :func:`deterministic_sample` — keep rows whose integer id falls in a
  fixed residue window.  Pure ``map_batches`` filter: no shuffle, and the
  SQL oracle is a one-line ``WHERE id % m < p``.
* :func:`grouped_head` — first ``k`` rows per group under a total order.
  Combiner discipline: every batch locally prunes to its own first-k per
  group BEFORE the exchange (the global first-k is a subset of the union
  of local first-ks), so the shuffle moves at most k rows per (group,
  batch) regardless of group size — skew-proof for giant groups.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = [
    "deterministic_sample",
    "grouped_head",
    "stratified_sample",
    "temperature_sample",
]


def deterministic_sample(ds, id_col: str, modulus: int = 100, keep_below: int = 10):
    """Keep rows where ``id % modulus < keep_below`` (≈ keep_below/modulus
    of the data), reproducibly and without any shuffle."""

    def keep(t: pa.Table) -> pa.Table:
        ids = t[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        return t.filter(pa.array((ids % modulus) < keep_below))

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


def grouped_head(ds, key_cols, order_cols, k: int):
    """First ``k`` rows per ``key_cols`` group ordered by ``order_cols``.

    ``order_cols`` should end in a unique column (total order) so results
    are deterministic and match a SQL ``ROW_NUMBER() OVER (PARTITION BY
    … ORDER BY …) <= k`` oracle exactly.
    """
    from .bucketing import bucketed_map_groups, pandas_map

    keys, orders = list(key_cols), list(order_cols)

    def head(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(keys + orders, kind="stable")
        return df[df.groupby(keys, sort=False).cumcount() < k]

    # combiner: a batch's global-first-k rows are necessarily inside its
    # local-first-k rows, so pre-pruning is lossless and bounds the
    # exchange at k rows per (group, batch)
    pruned = ds.map_batches(pandas_map(head), batch_format="pandas")
    return bucketed_map_groups(pruned, keys, head, out_schema=_input_schema(ds))


def _input_schema(ds) -> pa.Schema | None:
    """The dataset's Arrow schema for typed-empty stamping (metadata only —
    fetch_if_missing=False guarantees no plan execution; derived plans
    without known metadata just skip the stamp)."""
    try:
        s = ds.schema(fetch_if_missing=False)
        if s is None:
            return None
        return pa.schema(list(zip(s.names, s.types)))
    except Exception:
        return None


# Knuth's multiplicative constant: the per-row rank is (id·K) mod 2^64 —
# a fixed bijection on uint64, so ranking by it is a deterministic
# pseudo-random order that DuckDB can replicate exactly with HUGEINT
# arithmetic (no RNG state anywhere).
_STRAT_K = np.uint64(2654435761)


def stratified_sample(ds, group_col: str, frac: float, id_col: str):
    """Proportional per-group sample: keep ``ceil(frac · n_g)`` rows of
    every group, chosen as the group's first rows under the deterministic
    hash order ``(id·K mod 2^64, id)``.

    Two stages, both skew-proof:

    1. exact group sizes via per-batch combiner partials — the collected
       table is bounded by (#groups × #blocks), tiny for stratification
       keys (language, event type, source), and the resulting quota map is
       broadcast in the stage-2 closure;
    2. per-batch local pruning to each group's quota (lossless: the global
       first-k of a group is a subset of every batch's local first-k),
       then one group-keyed exchange takes the exact per-group head.

    Reproducible across reruns, partitionings and resume boundaries, and
    exactly replicable as a SQL ``ROW_NUMBER() OVER (PARTITION BY g ORDER
    BY (id·K) % 2^64, id) <= CEIL(frac·n)`` oracle."""
    counts = _group_counts(ds, group_col)
    quota = {g: int(math.ceil(frac * int(c))) for g, c in counts.items()}
    return _quota_head(ds, group_col, quota, id_col)


def temperature_sample(ds, group_col: str, alpha: float, frac: float, id_col: str):
    """Temperature-reweighted source mixing: downsample each group to

        ``quota_g = min(n_g, ceil(frac · N · n_g^α / Σ n^α))``

    — the standard multi-source/multilingual mixing rule (α = 1 is
    proportional, α < 1 flattens toward uniform, boosting rare sources'
    SHARE while never upsampling past a group's actual rows).  Rows are
    chosen by the same deterministic hash order as
    :func:`stratified_sample`, so the output is reproducible and exactly
    SQL-replicable (``POWER`` weights + the ``ROW_NUMBER`` rank)."""
    counts = _group_counts(ds, group_col).to_dict()
    total = float(sum(int(c) for c in counts.values()))
    wsum = float(sum(float(c) ** alpha for c in counts.values()))
    quota = {
        g: min(int(c), int(math.ceil(frac * total * (float(c) ** alpha) / wsum)))
        for g, c in counts.items()
    }
    return _quota_head(ds, group_col, quota, id_col)


def _group_counts(ds, group_col: str) -> pd.Series:
    """Exact group sizes via per-batch combiner partials — the collected
    table is bounded by (#groups × #blocks), tiny for mixing keys."""

    def partial_counts(t: pa.Table) -> pa.Table:
        v = t[group_col].combine_chunks()
        vc = v.value_counts()
        return pa.table(
            {
                group_col: vc.field("values"),
                "_c": vc.field("counts").cast(pa.int64()),
            }
        )

    return (
        ds.select_columns([group_col])
        .map_batches(partial_counts, batch_format="pyarrow")
        .to_pandas()
        # dropna=False: a null group is still a group (SQL PARTITION BY
        # puts NULLs in one partition) — the default would silently drop
        # every null-group row from the sample with no quota accounting
        .groupby(group_col, dropna=False)["_c"]
        .sum()
    )


def _quota_head(ds, group_col: str, quota: dict, id_col: str):
    """Keep each group's first ``quota[g]`` rows under the deterministic
    hash order (local prune → one group-keyed exchange)."""
    from .bucketing import bucketed_map_groups, pandas_map

    # a NaN quota key (the null group) cannot be looked up via .map —
    # NaN != NaN — so split it out and apply it through a notna mask
    null_quota = 0
    qmap: dict = {}
    for g, q in quota.items():
        if pd.isna(g):
            null_quota = q
        else:
            qmap[g] = q

    def head(df: pd.DataFrame) -> pd.DataFrame:
        ids = df[id_col].to_numpy(np.int64).view(np.uint64)
        rank = ids * _STRAT_K  # uint64 wraparound IS mod 2^64
        df = df.assign(_rank=rank)
        df = df.sort_values([group_col, "_rank", id_col], kind="stable")
        k = df[group_col].map(qmap)
        if null_quota:
            k = k.where(df[group_col].notna(), null_quota)
        k = k.fillna(0).to_numpy()
        keep = (
            df.groupby(group_col, sort=False, dropna=False).cumcount().to_numpy() < k
        )
        return df[keep].drop(columns=["_rank"])

    pruned = ds.map_batches(pandas_map(head), batch_format="pandas")
    return bucketed_map_groups(
        pruned, [group_col], head, out_schema=_input_schema(ds)
    )
