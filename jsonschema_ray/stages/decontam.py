"""Train/benchmark decontamination: n-gram containment scoring.

The standard pre-training hygiene step (the reference has no analogue —
this is part of the training-data layer): a training document is
*contaminated* when a large fraction of its word n-grams also appear in a
held-out benchmark set.  Shipping whole texts to compare is the naive
O(train × bench) plan; here both sides explode into (shingle_hash,
doc_id) rows — the same deduped-shingle kernel the Jaccard operators use
(stages/dedup.py) — and ONE shingle-keyed exchange co-locates every
train/bench shingle collision:

* inside a bucket, a shingle group containing any benchmark row marks all
  its training rows as hits — vectorized with one ``maximum.reduceat``
  over the side flag and one run-length expansion, no per-group Python;
* per-bucket (doc_id, hits) partials are exact because the shingle space
  is partitioned by the bucket hash (a doc's shingles in different
  buckets are distinct), so a second tiny doc-keyed exchange just sums
  them;
* only 17-byte derived rows ever shuffle — the text never moves, and the
  benchmark side is typically ≪ the training side, so the exchange is
  dominated by the training shingles exactly once.

Containment = |train-doc shingles ∩ benchmark shingles| / |train-doc
shingles| — the asymmetric overlap used for decontamination (a tiny
benchmark passage inside a huge training doc still scores low Jaccard
but high containment on the benchmark side; scoring the train side's
coverage is the conventional "remove if ≥ τ of the doc is benchmark
text" rule).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["contamination_scores"]

_SCH_PARTIAL = pa.schema(
    [("doc_id", pa.int64()), ("n_sh", pa.int64()), ("hits", pa.int64())]
)
_SCH_OUT = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("n_ngrams", pa.int64()),
        ("n_hit", pa.int64()),
        ("containment", pa.float64()),
    ]
)


def contamination_scores(
    train_ds,
    bench_ds=None,
    n: int = 3,
    threshold: float = 0.0,
    text_col: str = "text",
    id_col: str = "doc_id",
    side_col: str | None = None,
):
    """→ Dataset (doc_id, n_ngrams, n_hit, containment): every training
    doc with at least one word-``n``-gram shared with the benchmark set
    and containment ≥ ``threshold``.

    Two input shapes:

    * ``(train_ds, bench_ds)`` — separate tables (the 100 TB norm: a huge
      training corpus vs a small benchmark table), each scanned once;
    * ``(ds, side_col=...)`` — ONE table carrying a 0/1 side column
      (benchmark split lives inside the corpus): a single scan shingles
      both sides together instead of reading the input twice.

    Callers are responsible for the two sides being disjoint (a doc on
    both sides trivially scores containment 1.0)."""
    if (bench_ds is None) == (side_col is None):
        raise ValueError("pass exactly one of bench_ds or side_col")
    from .bucketing import (
        bucketed_map_groups,
        col_np,
        group_bounds,
    )
    from .dedup import _batch_shingles, shingle_rows

    if side_col is not None:

        def explode_with_side(t: pa.Table) -> pa.Table:
            ids = col_np(t, id_col).astype(np.int64)
            sides = col_np(t, side_col).astype(np.int8)
            h, seg = _batch_shingles(t[text_col], n)
            counts = (
                np.bincount(seg, minlength=t.num_rows)
                if len(seg)
                else np.zeros(t.num_rows, np.int64)
            )
            return pa.table(
                {
                    "shingle": pa.array(h.astype(np.int64)),
                    "doc_id": pa.array(ids[seg]),
                    "n_sh": pa.array(counts[seg].astype(np.int64)),
                    "side": pa.array(sides[seg]),
                }
            )

        both = train_ds.map_batches(
            explode_with_side, batch_format="pyarrow", zero_copy_batch=True
        )
        return _score(both, threshold, bucketed_map_groups, col_np, group_bounds)

    def tag(side: int):
        def add(t: pa.Table) -> pa.Table:
            return t.append_column(
                "side", pa.array(np.full(t.num_rows, side, dtype=np.int8))
            )

        return add

    tr = shingle_rows(train_ds, text_col, id_col, n).map_batches(
        tag(0), batch_format="pyarrow"
    )
    be = shingle_rows(bench_ds, text_col, id_col, n).map_batches(
        tag(1), batch_format="pyarrow"
    )
    return _score(tr.union(be), threshold, bucketed_map_groups, col_np, group_bounds)


def _score(tagged_shingles, threshold, bucketed_map_groups, col_np, group_bounds):
    """(shingle, doc_id, n_sh, side) rows → scored containment output:
    one shingle-keyed exchange marks train rows colliding with any
    benchmark shingle, one doc-keyed exchange sums the per-bucket
    partials."""

    def hits_in_bucket(t: pa.Table) -> pa.Table:
        sh = col_np(t, "shingle")
        doc = col_np(t, "doc_id")
        nsh = col_np(t, "n_sh")
        side = col_np(t, "side")
        order = np.argsort(sh, kind="stable")
        sh, doc, nsh, side = sh[order], doc[order], nsh[order], side[order]
        starts, ends = group_bounds(sh)
        # groups containing any benchmark row, expanded back to rows
        bench_any = np.maximum.reduceat(side, starts) > 0
        row_hit = np.repeat(bench_any, ends - starts) & (side == 0)
        if not row_hit.any():
            return _SCH_PARTIAL.empty_table()
        doc, nsh = doc[row_hit], nsh[row_hit]
        dorder = np.argsort(doc, kind="stable")
        doc, nsh = doc[dorder], nsh[dorder]
        dstarts, dends = group_bounds(doc)
        return pa.table(
            {
                "doc_id": pa.array(doc[dstarts].astype(np.int64)),
                "n_sh": pa.array(nsh[dstarts].astype(np.int64)),
                "hits": pa.array((dends - dstarts).astype(np.int64)),
            }
        )

    partials = bucketed_map_groups(
        tagged_shingles,
        ["shingle"],
        hits_in_bucket,
        out_schema=_SCH_PARTIAL,
        batch_format="pyarrow",
    )

    def combine(t: pa.Table) -> pa.Table:
        doc = col_np(t, "doc_id")
        nsh = col_np(t, "n_sh")
        hits = col_np(t, "hits")
        order = np.argsort(doc, kind="stable")
        doc, nsh, hits = doc[order], nsh[order], hits[order]
        starts, _ends = group_bounds(doc)
        tot = np.add.reduceat(hits, starts)
        n_sh = nsh[starts].astype(np.float64)
        ratio = tot / n_sh
        keep = ratio >= threshold
        if not keep.any():
            return _SCH_OUT.empty_table()
        s = starts[keep]
        return pa.table(
            {
                "doc_id": pa.array(doc[s].astype(np.int64)),
                "n_ngrams": pa.array(nsh[s].astype(np.int64)),
                "n_hit": pa.array(tot[keep].astype(np.int64)),
                "containment": pa.array(np.round(ratio[keep], 6)),
            }
        )

    return bucketed_map_groups(
        partials,
        ["doc_id"],
        combine,
        out_schema=_SCH_OUT,
        batch_format="pyarrow",
    )
