"""Sequence packing: group documents into fixed token-budget bins.

The step between curation and training: a loader wants ~budget-token
concatenated sequences, so documents are packed greedily (next-fit in
document order) into bins.  Global greedy packing is inherently
sequential; the scalable form packs WITHIN fixed document partitions
(``doc_id // part_size``) — partitions are independent, deterministic
across runs and resume boundaries, and each is small enough that its
packing is exact.  At 100 TB the fill loss vs a global pack is bounded by
one partial bin per partition.

Execution shape:

* one ``map_batches`` pass computes (doc_id, part, n_tokens) from the
  byte-buffer token kernel — the TEXT never shuffles, only 24-byte rows;
* one part-keyed exchange (bucketed_map_groups) co-locates each
  partition; the bucket kernel packs ALL its partitions simultaneously
  with a rank-major numpy loop (iteration j assigns the j-th document of
  every partition at once) — no per-partition Python.

Next-fit rule (replicable as a SQL recursive CTE, one recursion step per
rank, NOT per row): the first doc of a partition opens bin 0; a doc whose
tokens would push the running fill over ``budget`` opens a new bin,
otherwise it joins the current one.  A single doc larger than ``budget``
occupies its own bin.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["pack_sequences"]

_SCH_PACK = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("part", pa.int64()),
        ("bin_idx", pa.int64()),
        ("n_tokens", pa.int64()),
    ]
)


def pack_sequences(
    ds,
    budget: int,
    part_size: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """→ Dataset (doc_id, part, bin_idx, n_tokens): next-fit bin
    assignment of every document within its ``doc_id // part_size``
    partition under a per-bin token ``budget``."""
    from .bucketing import bucketed_map_groups, col_np, group_bounds
    from .tokhash import batch_token_hashes

    def tokens(t: pa.Table) -> pa.Table:
        ids = col_np(t, id_col).astype(np.int64)
        _h, _s, ntok = batch_token_hashes(t[text_col])
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "part": pa.array(ids // np.int64(part_size)),
                "n_tokens": pa.array(ntok.astype(np.int64)),
            }
        )

    rows = ds.map_batches(tokens, batch_format="pyarrow", zero_copy_batch=True)

    def pack_bucket(t: pa.Table) -> pa.Table:
        doc = col_np(t, "doc_id")
        part = col_np(t, "part")
        ntok = col_np(t, "n_tokens")
        order = np.lexsort((doc, part))
        doc, part, ntok = doc[order], part[order], ntok[order]
        starts, ends = group_bounds(part)
        sizes = ends - starts
        nparts = len(starts)
        bins = np.empty(len(doc), dtype=np.int64)
        fill = np.zeros(nparts, dtype=np.int64)
        cur = np.zeros(nparts, dtype=np.int64)
        # rank-major: step j places the j-th doc of every partition
        for j in range(int(sizes.max()) if nparts else 0):
            active = np.flatnonzero(sizes > j)
            rows_j = starts[active] + j
            nt = ntok[rows_j]
            if j == 0:
                fill[active] = nt
                bins[rows_j] = 0
            else:
                over = fill[active] + nt > budget
                cur[active] += over
                fill[active] = np.where(over, nt, fill[active] + nt)
                bins[rows_j] = cur[active]
        return pa.table(
            {
                "doc_id": pa.array(doc),
                "part": pa.array(part),
                "bin_idx": pa.array(bins),
                "n_tokens": pa.array(ntok.astype(np.int64)),
            }
        )

    return bucketed_map_groups(
        rows,
        ["part"],
        pack_bucket,
        out_schema=_SCH_PACK,
        batch_format="pyarrow",
    )
