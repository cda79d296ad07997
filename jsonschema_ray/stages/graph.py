"""Distributed graph operators for dedup clustering.

Near-duplicate pairs (MinHash/SimHash/embedding) form a similarity graph;
keeping one representative per *cluster* — not per pair — needs connected
components.  :func:`connected_components` is iterative min-label
propagation expressed in Dataset exchanges:

* labels start as each node's own id;
* each round, every node takes the min of its label and its neighbors'
  labels (one equi-join edges×labels + one node-keyed min-group), then a
  pointer-jumping shortcut replaces each label by ITS label
  (``L(v) ← L(L(v))``, one more join) so long chains collapse in
  O(log diameter) rounds instead of O(diameter);
* labels only ever decrease, so the global label sum is a monotone
  convergence witness — the driver loop stops when one round leaves it
  unchanged (no join needed to detect fixpoint).

Every structure stays distributed; the driver holds one number per round.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["connected_components", "components_keep_first"]


def _driver_union_find(edges_df: pd.DataFrame):
    """Exact min-label components on the driver (path-halving union-find)."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(edges_df["src"].to_numpy(), edges_df["dst"].to_numpy()):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    nodes = np.fromiter(parent.keys(), dtype=np.int64, count=len(parent))
    comps = np.fromiter((find(int(n)) for n in nodes), dtype=np.int64, count=len(nodes))
    order = np.argsort(nodes)
    return pa.table(
        {"node": pa.array(nodes[order]), "component": pa.array(comps[order])}
    )


def connected_components(
    pairs_ds,
    a_col: str = "a",
    b_col: str = "b",
    max_iters: int = 50,
    driver_threshold: int = 5_000_000,
):
    """→ Dataset (node, component): component = min node id reachable.

    ``pairs_ds`` holds undirected edges as (a, b) rows (any orientation,
    duplicates fine).  Below ``driver_threshold`` edge rows the exact
    union-find runs on the driver (an 8-byte-per-edge frame; the iterative
    exchanges' fixed cost dwarfs it) — the distributed label-propagation
    loop is the path past that.
    """
    from .bucketing import bucketed_map_groups
    from .joins import hash_join

    def to_edges(t: pa.Table) -> pa.Table:
        a = t[a_col].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        b = t[b_col].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "src": pa.array(np.concatenate([a, b])),
                "dst": pa.array(np.concatenate([b, a])),
            }
        )

    edges = pairs_ds.map_batches(to_edges, batch_format="pyarrow").materialize()

    n_edges = edges.count()
    if n_edges == 0:
        import ray.data as rd

        # typed empty: an all-empty dataset loses its schema through
        # to_pandas, and downstream unions/sorts stall on schemaless blocks
        return rd.from_arrow(
            pa.table({"node": pa.array([], pa.int64()), "component": pa.array([], pa.int64())})
        )
    if n_edges <= driver_threshold:
        import ray.data as rd

        return rd.from_arrow(_driver_union_find(edges.to_pandas()))

    def init_labels(df: pd.DataFrame) -> pa.Table:
        # arrow blocks: these datasets feed unions with arrow-producing
        # stages, and mixed pandas/arrow bundles stall the sort exchange
        u = np.unique(df["src"].to_numpy())
        return pa.table({"node": pa.array(u), "component": pa.array(u)})

    labels = bucketed_map_groups(edges, ["src"], init_labels).materialize()
    prev_sum = labels.sum("component")
    if prev_sum is None:  # no edges at all
        return labels

    def min_label(df: pd.DataFrame) -> pa.Table:
        g = df.groupby("node", sort=False)["component"].min().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    for _ in range(max_iters):
        # neighbor candidates: each edge ships its source's label to dst
        neigh = hash_join(
            labels.map_batches(
                lambda t: t.rename_columns(["src", "component"]),
                batch_format="pyarrow",
            ),
            edges,
            on="src",
            left_cols=["component"],
            right_cols=["dst"],
            how="inner",
        ).map_batches(
            lambda t: pa.table({"node": t["dst"], "component": t["component"]}),
            batch_format="pyarrow",
        )
        # materialized: consumed twice below (lookup side + keyed side).
        # repartition bounds the block count — each round's union+sort
        # otherwise multiplies blocks, and sort planning cost grows with
        # block count until the executor crawls
        merged = (
            bucketed_map_groups(labels.union(neigh), ["node"], min_label)
            .repartition(32)
            .materialize()
        )
        # pointer jumping: L(v) ← L(L(v)).  L(x) ≤ x always, so the
        # looked-up root can only improve the label.
        lookup = merged.map_batches(
            lambda t: pa.table({"ckey": t["node"], "root": t["component"]}),
            batch_format="pyarrow",
        )
        keyed = merged.map_batches(
            lambda t: pa.table({"node": t["node"], "ckey": t["component"]}),
            batch_format="pyarrow",
        )
        labels = (
            hash_join(
                keyed, lookup, on="ckey", left_cols=["node"], right_cols=["root"],
                how="inner",
            )
            .map_batches(
                lambda t: pa.table({"node": t["node"], "component": t["root"]}),
                batch_format="pyarrow",
            )
            .repartition(32)
            .materialize()
        )
        s = labels.sum("component")
        if s == prev_sum:  # labels only decrease: equal sum ⇒ fixpoint
            break
        prev_sum = s
    return labels


def components_keep_first(ds, pairs_ds, id_col: str = "doc_id"):
    """Cluster-level dedup: drop every row whose id belongs to a
    similarity component but is not its min-id representative.  Rows in no
    component (no near-dup) always survive; the anti-join ships only ids."""
    from .joins import hash_join

    losers = connected_components(pairs_ds).map_batches(
        lambda t: pa.table(
            {id_col: t["node"].take(
                pa.compute.indices_nonzero(
                    pa.compute.not_equal(t["node"], t["component"])
                )
            )}
        ),
        batch_format="pyarrow",
    )
    cols = list(ds.schema().names)
    return hash_join(
        ds, losers, on=id_col, left_cols=[c for c in cols if c != id_col],
        right_cols=[], how="anti",
    )
