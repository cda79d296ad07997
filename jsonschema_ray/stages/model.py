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

import os

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["EmbedStage", "embed_texts", "projection_table_path"]


def _projection(dim: int = 64, seed: int = 17) -> np.ndarray:
    """The stub model's (256, dim) float64 projection matrix — ONE source
    for the actor-pool stage and the DuckDB-oracle parquet export."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((256, dim))


def projection_table_path(dim: int = 64, seed: int = 17) -> str:
    """Write-once parquet export of the projection matrix in long form
    ``(tok_mod BIGINT, dim BIGINT, w DOUBLE)`` so a SQL oracle can
    recompute the embedding exactly (float64 values round-trip parquet
    bit-for-bit)."""
    root = "/tmp/graft_embed_proj"
    path = f"{root}/proj_d{dim}_s{seed}.parquet"
    if not os.path.exists(path):
        os.makedirs(root, exist_ok=True)
        proj = _projection(dim, seed)
        t = pa.table(
            {
                "tok_mod": pa.array(np.repeat(np.arange(256, dtype=np.int64), dim)),
                "dim": pa.array(np.tile(np.arange(dim, dtype=np.int64), 256)),
                "w": pa.array(proj.reshape(-1)),
            }
        )
        import pyarrow.parquet as pq

        tmp = f"{path}.tmp-{os.getpid()}"
        pq.write_table(t, tmp)
        os.replace(tmp, path)
    return path


class EmbedStage:
    """Deterministic stand-in embedder: token hashes → mean of projected
    token vectors, L2-normalized.  Swap ``__init__`` for a real model load
    (sentence-transformers etc.) without touching the pipeline.

    Accumulation runs in float64 regardless of the output ``dtype`` so the
    values are oracle-replicable: DuckDB arithmetic is double, so a SQL
    twin (token hash → projection-row lookup → per-dim SUM → cosine) lands
    within ~1e-15 of the engine's numbers (see EMBED_DEDUP_SQL)."""

    def __init__(
        self,
        dim: int = 64,
        seed: int = 17,
        text_col="text",
        id_col="doc_id",
        dtype="float32",
    ):
        self.dim = dim
        self.proj = _projection(dim, seed)
        self.text_col, self.id_col = text_col, id_col
        self.dtype = np.dtype(dtype)

    def __call__(self, t: pa.Table) -> pa.Table:
        from .tokhash import batch_token_hashes

        n = t.num_rows
        th, _sg, ntok = batch_token_hashes(t[self.text_col])
        out = np.zeros((n, self.dim), dtype=np.float64)
        if len(th):
            vecs = self.proj[(th % np.uint64(256)).astype(np.int64)]  # (T, dim)
            nonempty = ntok > 0
            starts = np.concatenate([[0], np.cumsum(ntok)])[:-1][nonempty]
            # tokens are segment-sorted → one reduceat sums each doc's rows
            out[nonempty] = np.add.reduceat(vecs, starts, axis=0)
            out[nonempty] /= ntok[nonempty][:, None]
            norm = np.linalg.norm(out, axis=1, keepdims=True)
            norm[norm == 0] = 1.0
            out /= norm
        out = out.astype(self.dtype, copy=False)
        emb = pa.FixedSizeListArray.from_arrays(pa.array(out.reshape(-1)), self.dim)
        return pa.table({self.id_col: t[self.id_col], "embedding": emb})


def embed_texts(ds, dim: int = 64, batch_size: int = 4096, concurrency=(1, 8), **kwargs):
    return ds.map_batches(
        EmbedStage,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs=dict(dim=dim, **kwargs),
    )
