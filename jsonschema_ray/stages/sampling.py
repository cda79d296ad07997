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

import pandas as pd
import pyarrow as pa

__all__ = ["deterministic_sample", "grouped_head"]


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
    from .bucketing import bucketed_map_groups

    keys, orders = list(key_cols), list(order_cols)

    def head(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(keys + orders, kind="stable")
        return df[df.groupby(keys, sort=False).cumcount() < k]

    # combiner: a batch's global-first-k rows are necessarily inside its
    # local-first-k rows, so pre-pruning is lossless and bounds the
    # exchange at k rows per (group, batch)
    pruned = ds.map_batches(head, batch_format="pandas")
    return bucketed_map_groups(pruned, keys, head)
