"""Similarity search over an embedding column (``list<float>``).

* :func:`cosine_topk` — exact brute-force top-k: the query matrix is
  broadcast once (``ray.put``), each batch does one numpy matmul and emits
  only its local top-k candidates, a final tiny ``groupby(query_id)``
  reduces to the global top-k.  Shuffled payload = k rows per query per
  batch, never the embeddings.
* :func:`lsh_topk` — the scale path: random-hyperplane signatures bucket
  vectors (signed projections, b-bit codes); only same-bucket (multi-probe)
  candidates are scored.  Recall < 1 by design; the exact variant is the
  ground truth in tests.

Ties are broken deterministically on (rounded −sim, vec_id) so results are
reproducible across partitionings and match the SQL oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["cosine_topk", "lsh_topk", "ivf_topk"]


def _normalize(m: np.ndarray) -> np.ndarray:
    norm = np.linalg.norm(m, axis=1, keepdims=True)
    norm[norm == 0] = 1.0
    return m / norm


def _batch_matrix(t: pa.Table, col: str) -> np.ndarray:
    arr = t[col].combine_chunks()
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(arr)
    return flat.reshape(n, -1) if n else flat.reshape(0, 0)


def _topk_batch(
    t: pa.Table, queries_ref, k: int, vec_col: str, id_col: str
) -> pa.Table:
    """Stateless per-batch scorer: the broadcast query matrix is a local
    plasma read (``ray.get`` of an already-fetched object is zero-copy), so
    plain tasks on warm workers beat an actor pool — no per-call pool
    spin-up, which dominates wall time for second-scale pipelines."""
    import ray

    q = ray.get(queries_ref)
    qids, qm = q["ids"], q["matrix"]  # matrix pre-normalized at put time
    ids = t[id_col].to_numpy()
    m = _batch_matrix(t, vec_col)
    if m.size == 0:
        return pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                "vec_id": pa.array([], pa.int64()),
                "sim": pa.array([], pa.float64()),
            }
        )
    # round BEFORE the per-block cut: the global merge orders by
    # (rounded sim desc, vec_id asc), so the block-level top-(k+1) must
    # use the SAME composite order — selecting on raw sims could drop a
    # rounded-tied candidate with a smaller vec_id at the cut, making the
    # result depend on which block the tied vectors landed in
    sims = np.round(qm @ _normalize(m).T, 6)  # (nq, nb)
    kk = min(k + 1, sims.shape[1])  # +1 to survive self-match removal
    out_q, out_v, out_s = [], [], []
    for qi in range(sims.shape[0]):
        s = sims[qi]
        if kk < len(s):
            cut = np.partition(s, -kk)[-kk]  # kk-th largest rounded sim
            sel = np.flatnonzero(s > cut)
            need = kk - len(sel)
            if need > 0:  # fill the cut ties by ascending vec_id
                ties = np.flatnonzero(s == cut)
                ties = ties[np.argsort(ids[ties], kind="stable")[:need]]
                sel = np.concatenate([sel, ties])
        else:
            sel = np.arange(len(s))
        out_q.append(np.full(len(sel), qids[qi], dtype=np.int64))
        out_v.append(ids[sel])
        out_s.append(s[sel])
    return pa.table(
        {
            "query_id": pa.array(np.concatenate(out_q)),
            "vec_id": pa.array(np.concatenate(out_v)),
            "sim": pa.array(np.concatenate(out_s)),
        }
    )


def _grouped_topk_merge(cands, k: int):
    """Merge per-block top-k candidates into the global per-query top-k:
    one keyed grouped stage on query_id (direct exchange under the size
    gate).  A bucket holds MANY query groups, so every step reduces per
    key group inside the bucket, never per bucket."""
    from .bucketing import bucketed_map_groups

    def bucket_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g[g["query_id"] != g["vec_id"]]
        g = g.sort_values(["sim", "vec_id"], ascending=[False, True], kind="stable")
        out = g.groupby("query_id", sort=False).head(k).copy()
        out["rank"] = out.groupby("query_id", sort=False).cumcount() + 1
        return out[["query_id", "vec_id", "rank", "sim"]]

    # the candidate stream is tiny ((k+1) rows per query per block) but
    # derives from the full embedding table, so pick_num_buckets' input
    # SIZE estimate wildly over-partitions it — pin a small bucket count
    return bucketed_map_groups(
        cands,
        ["query_id"],
        bucket_topk,
        num_buckets=32,
        out_schema=pa.schema(
            [
                ("query_id", pa.int64()),
                ("vec_id", pa.int64()),
                ("rank", pa.int64()),
                ("sim", pa.float64()),
            ]
        ),
    )


def cosine_topk(ds, query_ids, k: int = 5, vec_col="embedding", id_col="vec_id"):
    """Exact top-k cosine neighbors for the given query ids (self excluded)."""
    import ray

    qdf = (
        ds.map_batches(
            lambda t: t.filter(
                pa.compute.is_in(t[id_col], value_set=pa.array(query_ids, pa.int64()))
            ),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    order = np.argsort(qdf[id_col].to_numpy())
    qmat = _normalize(np.vstack(qdf[vec_col].to_numpy()[order]).astype(np.float64))
    ref = ray.put({"ids": qdf[id_col].to_numpy()[order], "matrix": qmat})

    cands = ds.map_batches(
        _topk_batch,
        batch_format="pyarrow",
        zero_copy_batch=True,
        fn_kwargs=dict(queries_ref=ref, k=k, vec_col=vec_col, id_col=id_col),
    )
    # the candidate stream is (k+1) rows per query per BLOCK — small, but
    # it grows with the block count, so the merge stays a keyed grouped
    # stage rather than a driver collect
    return _grouped_topk_merge(cands, k)


def lsh_topk(
    ds,
    query_ids,
    k: int = 5,
    bits: int = 12,
    vec_col="embedding",
    id_col="vec_id",
    dim: int | None = None,
    seed: int = 23,
):
    """Approximate top-k: score only vectors whose b-bit hyperplane code is
    within Hamming distance ≤ 2 of the query's code (multi-probe)."""
    import ray

    sample = ds.take(1)[0]
    d = dim or len(sample[vec_col])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((d, bits))

    def code_of(m: np.ndarray) -> np.ndarray:
        return ((_normalize(m) @ planes) > 0) @ (1 << np.arange(bits))

    qdf = (
        ds.map_batches(
            lambda t: t.filter(
                pa.compute.is_in(t[id_col], value_set=pa.array(query_ids, pa.int64()))
            ),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    qmat = np.vstack(qdf[vec_col].to_numpy()).astype(np.float64)
    qcodes = code_of(qmat)
    # multi-probe: all codes within hamming ≤ 2 (pigeonhole over bit flips)
    probe: set[int] = set()
    for c in qcodes:
        c = int(c)
        probe.add(c)
        for i in range(bits):
            probe.add(c ^ (1 << i))
            for j in range(i + 1, bits):
                probe.add(c ^ (1 << i) ^ (1 << j))
    probe_arr = np.asarray(sorted(probe), dtype=np.int64)
    qref = ray.put({"ids": qdf[id_col].to_numpy(), "matrix": _normalize(qmat)})

    def bucket_score(t: pa.Table, queries_ref, k, vec_col, id_col) -> pa.Table:
        m = _batch_matrix(t, vec_col)
        if m.size:
            keep = np.isin(code_of(m), probe_arr)
            t = t.filter(pa.array(keep))
        return _topk_batch(t, queries_ref, k, vec_col, id_col)

    cands = ds.map_batches(
        bucket_score,
        batch_format="pyarrow",
        zero_copy_batch=True,
        fn_kwargs=dict(queries_ref=qref, k=k, vec_col=vec_col, id_col=id_col),
    )
    return _grouped_topk_merge(cands, k)


def _kmeans_fit(ds, nlist: int, vec_col: str, iters: int = 4, seed: int = 5):
    """Distributed mini k-means: centroids refined with per-batch partial
    sums (map_batches) merged on the driver — the training set never leaves
    the workers and the shuffled payload is nlist × dim floats per batch."""
    import ray

    seed_rows = ds.limit(nlist).take_all()
    cent = _normalize(
        np.vstack([r[vec_col] for r in seed_rows]).astype(np.float64)
    )
    for _ in range(iters):
        cref = ray.put(cent)

        def partial(t: pa.Table, _cref=cref) -> pa.Table:
            c = ray.get(_cref)
            m = _batch_matrix(t, vec_col)
            if m.size == 0:
                return pa.table(
                    {
                        "cid": pa.array([], pa.int64()),
                        "vsum": pa.array([], pa.list_(pa.float64())),
                        "cnt": pa.array([], pa.int64()),
                    }
                )
            m = _normalize(m)
            assign = np.argmax(m @ c.T, axis=1)
            sums = np.zeros_like(c)
            np.add.at(sums, assign, m)
            cnt = np.bincount(assign, minlength=len(c))
            nz = np.flatnonzero(cnt)
            return pa.table(
                {
                    "cid": pa.array(nz.astype(np.int64)),
                    "vsum": pa.array([sums[i].tolist() for i in nz], pa.list_(pa.float64())),
                    "cnt": pa.array(cnt[nz].astype(np.int64)),
                }
            )

        parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
        sums = np.zeros_like(cent)
        cnts = np.zeros(len(cent))
        for cid, vsum, cnt in zip(parts["cid"], parts["vsum"], parts["cnt"]):
            sums[int(cid)] += np.asarray(vsum)
            cnts[int(cid)] += cnt
        nz = cnts > 0
        cent[nz] = _normalize(sums[nz] / cnts[nz, None])
    return cent


def ivf_topk(
    ds,
    query_ids,
    k: int = 5,
    nlist: int = 16,
    nprobe: int = 4,
    vec_col="embedding",
    id_col="vec_id",
):
    """IVF approximate top-k: coarse k-means centroids partition the
    vectors into inverted lists; only vectors whose nearest centroid is
    among the query's ``nprobe`` closest centroids are scored.

    The scale path to :func:`cosine_topk`'s brute force: compare work drops
    by ~nlist/nprobe; recall < 1 when a true neighbor's list is unprobed
    (the exact variant is the test oracle)."""
    import ray

    cent = _kmeans_fit(ds, nlist, vec_col)

    qdf = (
        ds.map_batches(
            lambda t: t.filter(
                pa.compute.is_in(t[id_col], value_set=pa.array(query_ids, pa.int64()))
            ),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    qmat = np.vstack(qdf[vec_col].to_numpy()).astype(np.float64)
    probe_lists = np.argsort(-(_normalize(qmat) @ cent.T), axis=1)[:, :nprobe]
    probed = np.unique(probe_lists)
    qref = ray.put({"ids": qdf[id_col].to_numpy(), "matrix": _normalize(qmat)})
    cref = ray.put(cent)

    def ivf_score(t: pa.Table, queries_ref, k, vec_col, id_col) -> pa.Table:
        m = _batch_matrix(t, vec_col)
        if m.size:
            c = ray.get(cref)
            assign = np.argmax(_normalize(m) @ c.T, axis=1)
            t = t.filter(pa.array(np.isin(assign, probed)))
        return _topk_batch(t, queries_ref, k, vec_col, id_col)

    cands = ds.map_batches(
        ivf_score,
        batch_format="pyarrow",
        zero_copy_batch=True,
        fn_kwargs=dict(queries_ref=qref, k=k, vec_col=vec_col, id_col=id_col),
    )
    return _grouped_topk_merge(cands, k)
