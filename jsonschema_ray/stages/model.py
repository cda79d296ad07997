"""Batched model-inference stage shape (actor pool, model in __init__).

The container ships no ML runtime, so the "model" is a deterministic
hash-projection embedder — the Ray-side pattern is the real deliverable:

* weights built/loaded ONCE per actor in ``__init__`` (at scale: read a
  checkpoint from storage; here: seeded random projection);
* ``__call__`` embeds a whole Arrow batch with one matmul (batched
  inference, never per-row);
* ``batch_size`` sized to the model's memory, ``concurrency`` to the pool.

Output: ``embedding list<float32>`` — the same schema the ann/dedup
embedding operators consume, so ``embed_texts → embedding_dup_pairs`` or
``→ cosine_topk`` compose into an end-to-end embed-then-dedup pipeline.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["EmbedStage", "embed_texts"]


class EmbedStage:
    """Deterministic stand-in embedder: token hashes → mean of projected
    token vectors, L2-normalized.  Swap ``__init__`` for a real model load
    (sentence-transformers etc.) without touching the pipeline."""

    def __init__(self, dim: int = 64, seed: int = 17, text_col="text", id_col="doc_id"):
        rng = np.random.default_rng(seed)
        self.dim = dim
        self.proj = rng.standard_normal((256, dim)).astype(np.float32)
        self.text_col, self.id_col = text_col, id_col

    def __call__(self, t: pa.Table) -> pa.Table:
        from .tokhash import batch_token_hashes

        n = t.num_rows
        th, _sg, ntok = batch_token_hashes(t[self.text_col])
        out = np.zeros((n, self.dim), dtype=np.float32)
        if len(th):
            vecs = self.proj[(th % np.uint64(256)).astype(np.int64)]  # (T, dim)
            nonempty = ntok > 0
            starts = np.concatenate([[0], np.cumsum(ntok)])[:-1][nonempty]
            # tokens are segment-sorted → one reduceat sums each doc's rows
            out[nonempty] = np.add.reduceat(vecs, starts, axis=0)
            out[nonempty] /= ntok[nonempty][:, None].astype(np.float32)
            norm = np.linalg.norm(out, axis=1, keepdims=True)
            norm[norm == 0] = 1.0
            out /= norm
        return pa.table(
            {
                self.id_col: t[self.id_col],
                "embedding": pa.array(
                    [row for row in out], pa.list_(pa.float32(), self.dim)
                ),
            }
        )


def embed_texts(ds, dim: int = 64, batch_size: int = 4096, concurrency=(1, 8), **kwargs):
    return ds.map_batches(
        EmbedStage,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs=dict(dim=dim, **kwargs),
    )
