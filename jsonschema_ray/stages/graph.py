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

_SCH_LABELS = pa.schema([("node", pa.int64()), ("component", pa.int64())])


def _minlabel_core(src: np.ndarray, dst: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Exact min-label components over a SYMMETRIC (doubled) edge list,
    fully vectorized: edges are compressed to dense node ids once, then
    each round takes the per-node min over neighbor labels with ONE
    ``minimum.reduceat`` on the pre-sorted edge list and collapses label
    chains with pointer jumps (``L ← L[L]``) — O(E) numpy work per round,
    O(log n) rounds, no per-edge Python.  → (nodes, component node ids)."""
    from .bucketing import group_bounds

    nodes, inv = np.unique(np.concatenate([src, dst]), return_inverse=True)
    ea, eb = inv[: len(src)], inv[len(src) :]

    order = np.argsort(ea, kind="stable")
    ea_s, eb_s = ea[order], eb[order]
    starts, _ends = group_bounds(ea_s)
    targets = ea_s[starts]

    label = np.arange(len(nodes), dtype=np.int64)
    while True:
        l2 = label.copy()
        neigh_min = np.minimum.reduceat(label[eb_s], starts)
        l2[targets] = np.minimum(l2[targets], neigh_min)
        while True:  # collapse pointer chains
            l3 = l2[l2]
            if np.array_equal(l3, l2):
                break
            l2 = l3
        if np.array_equal(l2, label):
            break
        label = l2
    return nodes.astype(np.int64), nodes[label].astype(np.int64)


def _driver_union_find(edges_df: pd.DataFrame):
    """Driver-side wrapper of :func:`_minlabel_core` over a doubled
    (src, dst) frame (the old dict-based loop took ~70 s at 5M edges;
    this takes ~2 s)."""
    nodes, comp = _minlabel_core(
        edges_df["src"].to_numpy(), edges_df["dst"].to_numpy()
    )
    return pa.table({"node": pa.array(nodes), "component": pa.array(comp)})


def connected_components(
    pairs_ds,
    a_col: str = "a",
    b_col: str = "b",
    max_iters: int = 50,
    driver_threshold: int = 24_000_000,
    contract: bool = True,
):
    """→ Dataset (node, component): component = min node id reachable.

    ``pairs_ds`` holds undirected edges as (a, b) rows (any orientation,
    duplicates fine).

    ``contract`` (default on) first runs exact components over each edge
    BLOCK and replaces the block's edges by its spanning forest
    (node → local root, roots kept as self-edges) — one ``map_batches``
    pass, no exchange, components provably preserved (a spanning forest
    of any edge subset keeps that subset's connectivity).  Dedup
    similarity graphs are clique-heavy, so this collapses m·(m-1)/2
    clique edges to m rows before anything shuffles.

    Below ``driver_threshold`` doubled-edge rows the exact union-find
    runs on the driver (16 bytes per edge; the vectorized kernel does
    12M doubled edges in ~15 s, far under one round of the iterative
    exchanges at that size) — the distributed label-propagation loop is
    the path past that.
    """
    from .bucketing import bucketed_map_groups, col_np
    from .joins import hash_join

    if contract:

        def contract_batch(t: pa.Table) -> pa.Table:
            a = col_np(t, a_col).astype(np.int64)
            b = col_np(t, b_col).astype(np.int64)
            if len(a) == 0:
                return pa.table(
                    {a_col: pa.array([], pa.int64()), b_col: pa.array([], pa.int64())}
                )
            nodes, roots = _minlabel_core(
                np.concatenate([a, b]), np.concatenate([b, a])
            )
            return pa.table({a_col: pa.array(nodes), b_col: pa.array(roots)})

        pairs_ds = pairs_ds.map_batches(contract_batch, batch_format="pyarrow")

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

    def init_labels(t: pa.Table) -> pa.Table:
        # arrow blocks: these datasets feed unions with arrow-producing
        # stages, and mixed pandas/arrow bundles stall the sort exchange
        u = np.unique(t["src"].combine_chunks().to_numpy(zero_copy_only=False))
        return pa.table({"node": pa.array(u), "component": pa.array(u)})

    labels = bucketed_map_groups(
        edges, ["src"], init_labels, out_schema=_SCH_LABELS, batch_format="pyarrow"
    ).materialize()
    prev_sum = labels.sum("component")
    if prev_sum is None:  # no edges at all
        return labels

    from .bucketing import col_np, group_bounds

    def min_label(t: pa.Table) -> pa.Table:
        node = col_np(t, "node")
        comp = col_np(t, "component")
        order = np.argsort(node, kind="stable")
        node_s, comp_s = node[order], comp[order]
        starts, _ends = group_bounds(node_s)
        return pa.table(
            {
                "node": pa.array(node_s[starts].astype(np.int64)),
                "component": pa.array(
                    np.minimum.reduceat(comp_s, starts).astype(np.int64)
                ),
            }
        )

    # block count scales with the cluster (2 blocks/core keeps every core
    # busy through stragglers), not a hardcoded single-node constant
    try:
        import ray

        nparts = max(32, 2 * int(ray.cluster_resources().get("CPU", 16)))
    except Exception:
        nparts = 32

    for it in range(max_iters):
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
        # repartition bounds the block count — each round's union+sort
        # otherwise multiplies blocks, and sort planning cost grows with
        # block count until the executor crawls
        merged = (
            bucketed_map_groups(
                labels.union(neigh), ["node"], min_label,
                out_schema=_SCH_LABELS, batch_format="pyarrow",
            )
            .repartition(nparts)
            .materialize()
        )
        # pointer jumping (L(v) ← L(L(v)), one extra exchange) every OTHER
        # round: min-label alone already contracts dense cliques in one
        # round, so paying the shortcut exchange each round buys little —
        # alternating keeps the O(log diameter) contraction on long chains
        # at ~2.5 exchanges/round instead of 3
        if it % 2 == 0:
            labels = merged
        else:
            lookup = merged.map_batches(
                lambda t: pa.table({"ckey": t["node"], "root": t["component"]}),
                batch_format="pyarrow",
            )
            keyed = merged.map_batches(
                lambda t: pa.table({"node": t["node"], "ckey": t["component"]}),
                batch_format="pyarrow",
            )
            # L(x) ≤ x always, so the looked-up root can only improve
            labels = (
                hash_join(
                    keyed, lookup, on="ckey", left_cols=["node"], right_cols=["root"],
                    how="inner",
                )
                .map_batches(
                    lambda t: pa.table({"node": t["node"], "component": t["root"]}),
                    batch_format="pyarrow",
                )
                .repartition(nparts)
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
