"""Deduplication operators over a document table (training-data pipeline ops).

Each is a composition of ``map_batches`` + hash-bucketed groupby (per the
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
* :func:`dedup_keep_first` — materialized dedup: keeper discovery +
  semi-join filter, one representative per distinct content.

Hashes come from ``pandas.util.hash_array`` (deterministic across
processes) so partials computed on different workers agree.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .bucketing import from_pandas_clean
from .tokhash import wraparound_ok

__all__ = [
    "exact_dedup",
    "shingle_rows",
    "jaccard_pairs_exact",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "simhash64",
    "simhash_pairs",
    "embedding_dup_pairs",
    "dedup_keep_first",
]

_MERSENNE = np.uint64((1 << 61) - 1)

# declared Arrow output schemas for the bucketed exchanges (typed empties
# + dtype-drift casts; see bucketing.bucketed_map_groups out_schema)
_SCH_KEEPERS = pa.schema([("doc_id_kept", pa.int64()), ("n_copies", pa.int64())])
_SCH_PAIRS_RAW = pa.schema(
    [("a", pa.int64()), ("b", pa.int64()), ("na", pa.int64()), ("nb", pa.int64())]
)
_SCH_PAIRS_J = pa.schema(
    [("a", pa.int64()), ("b", pa.int64()), ("jaccard", pa.float64())]
)
_SCH_PAIRS_NB = pa.schema([("a", pa.int64()), ("b", pa.int64()), ("_nb", pa.int64())])
_SCH_PAIRS = pa.schema([("a", pa.int64()), ("b", pa.int64())])
_SCH_PAIRS_HAM = pa.schema(
    [("a", pa.int64()), ("b", pa.int64()), ("hamming", pa.int64())]
)
_SCH_PAIRS_SIM = pa.schema(
    [("a", pa.int64()), ("b", pa.int64()), ("sim", pa.float64())]
)


def _hash_str_array(arr) -> np.ndarray:
    return pd.util.hash_array(np.asarray(arr, dtype=object))


def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id", key: str = "hash"):
    """→ Dataset (doc_id_kept, n_copies) one row per distinct content.

    Combiner discipline: each batch pre-aggregates to one (key, min_id,
    count) partial per distinct content BEFORE the shuffle, so a content
    value duplicated 10^9 times contributes one row per batch — the
    exchange is skew-proof and moves at most (distinct-per-batch × batches)
    rows, never the raw duplicates."""

    def partials(t: pa.Table) -> pa.Table:
        if key == "hash":
            # byte-buffer content hash (stages/tokhash.py) — no Python str
            # per document in the hot curation path
            from .tokhash import hash_strings

            k = hash_strings(t[text_col]).view(np.int64)
            df = pd.DataFrame(
                {"content_key": k, id_col: t[id_col].to_numpy(zero_copy_only=False)}
            )
            group_col_ = "content_key"
        else:
            df = t.select([id_col, text_col]).to_pandas()
            group_col_ = text_col
        # dropna=False: a null text must still produce a keeper row (SQL
        # GROUP BY keeps NULL as a group; the default pandas groupby would
        # silently drop every null-text document from the output)
        g = (
            df.groupby(group_col_, sort=False, dropna=False)[id_col]
            .agg(["min", "size"])
            .reset_index()
        )
        return from_pandas_clean(
            g.rename(columns={"min": "_min_id", "size": "_cnt"}), preserve_index=False
        )

    group_col = "content_key" if key == "hash" else text_col

    from .bucketing import bucketed_map_groups

    def combine_bucket(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(group_col, sort=False, dropna=False).agg(
            doc_id_kept=("_min_id", "min"), n_copies=("_cnt", "sum")
        )
        return pd.DataFrame(
            {
                "doc_id_kept": g["doc_id_kept"].to_numpy(np.int64),
                "n_copies": g["n_copies"].to_numpy(np.int64),
            }
        )

    keyed = ds.map_batches(partials, batch_format="pyarrow")
    return bucketed_map_groups(keyed, [group_col], combine_bucket, out_schema=_SCH_KEEPERS)


# -- shingles / exact Jaccard ------------------------------------------------


_SHINGLE_P = np.uint64(1099511628211)


@wraparound_ok
def _batch_shingles(col, n: int) -> tuple[np.ndarray, np.ndarray]:
    """All docs' deduped shingle hashes in one pass over the Arrow string
    column's byte buffer (stages/tokhash.py — zero per-row Python): n-gram
    hashes formed by a vectorized polynomial combine of consecutive token
    hashes (no shingle strings are ever built).  → (hashes, seg_ids),
    segment-sorted (all of doc i's shingles contiguous)."""
    from .tokhash import batch_token_hashes

    th, sg, _ntok = batch_token_hashes(col)
    if len(th) == 0:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    m = len(th)
    parts_h: list[np.ndarray] = []
    parts_s: list[np.ndarray] = []
    if m >= n:
        # windows entirely inside one document: seg equal at both ends
        comb = np.zeros(m - n + 1, dtype=np.uint64)
        for j in range(n):
            comb = comb * _SHINGLE_P + th[j : m - n + 1 + j]
        valid = sg[: m - n + 1] == sg[n - 1 :]
        parts_h.append(comb[valid])
        parts_s.append(sg[: m - n + 1][valid])
    # docs with fewer than n tokens hash their whole token run
    counts = _ntok
    short_docs = np.flatnonzero((counts > 0) & (counts < n))
    if len(short_docs):
        starts = np.concatenate([[0], np.cumsum(counts)])[:-1]
        for d in short_docs:
            h = np.uint64(0)
            for j in range(starts[d], starts[d] + counts[d]):
                h = h * _SHINGLE_P + th[j]
            parts_h.append(np.array([h], dtype=np.uint64))
            parts_s.append(np.array([d], dtype=np.int64))
    if not parts_h:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    hh = np.concatenate(parts_h)
    ss = np.concatenate(parts_s)
    # per-segment dedup without a 2-key lexsort: mix the segment id into
    # the hash (a cross-collision is as unlikely as a shingle-hash
    # collision, which the scheme already tolerates), single-key argsort
    # to find duplicates, then one stable argsort of the nearly-sorted
    # segment ids to restore segment-contiguity (timsort ≈ O(n) there)
    key = hh ^ (ss.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
    korder = np.argsort(key)
    ks = key[korder]
    uniq = np.ones(len(ks), dtype=bool)
    uniq[1:] = ks[1:] != ks[:-1]
    keep = np.zeros(len(key), dtype=bool)
    keep[korder[uniq]] = True
    hh, ss = hh[keep], ss[keep]
    sorder = np.argsort(ss, kind="stable")
    return hh[sorder], ss[sorder]


def shingle_rows(ds, text_col="text", id_col="doc_id", n: int = 3):
    """Explode docs → (shingle, doc_id, n_shingles) rows (the only shuffled
    payload: 16 bytes per shingle)."""

    def explode(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        h, seg = _batch_shingles(t[text_col], n)
        counts = np.bincount(seg, minlength=t.num_rows) if len(seg) else np.zeros(t.num_rows, np.int64)
        return pa.table(
            {
                "shingle": pa.array(h.astype(np.int64)),
                "doc_id": pa.array(ids[seg].astype(np.int64)),
                "n_sh": pa.array(counts[seg].astype(np.int64)),
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

    from .bucketing import (
        bucketed_map_groups,
        col_np,
        group_bounds,
        group_bounds_multi,
    )

    def pairs_in_bucket(t: pa.Table) -> pa.Table:
        # Every doc-pair co-occurring on any shingle hashed into this
        # bucket — Arrow in, numpy throughout, no pandas frame of the
        # bucket is ever built.
        sh_arr = col_np(t, "shingle")
        ids = col_np(t, "doc_id")
        nsh = col_np(t, "n_sh")
        order = np.lexsort((ids, sh_arr))
        sh_arr, ids, nsh = sh_arr[order], ids[order], nsh[order]
        starts, ends = group_bounds(sh_arr)
        out_a, out_b, out_na, out_nb = [], [], [], []
        for s, e in zip(starts, ends):
            cnt = e - s
            if cnt < 2 or (hot_shingle_cap is not None and cnt > hot_shingle_cap):
                continue
            ai, bi = np.triu_indices(cnt, k=1)
            out_a.append(ids[s:e][ai])
            out_b.append(ids[s:e][bi])
            out_na.append(nsh[s:e][ai])
            out_nb.append(nsh[s:e][bi])
        if not out_a:
            return _SCH_PAIRS_RAW.empty_table()
        return pa.table(
            {
                "a": pa.array(np.concatenate(out_a)),
                "b": pa.array(np.concatenate(out_b)),
                "na": pa.array(np.concatenate(out_na)),
                "nb": pa.array(np.concatenate(out_nb)),
            }
        )

    def jaccard_in_bucket(t: pa.Table) -> pa.Table:
        # intersection size = number of shared shingles = rows per (a, b)
        a = col_np(t, "a")
        b = col_np(t, "b")
        na = col_np(t, "na")
        nb = col_np(t, "nb")
        order = np.lexsort((b, a))
        a, b, na, nb = a[order], b[order], na[order], nb[order]
        starts, ends = group_bounds_multi(a, b)
        inter = (ends - starts).astype(np.float64)
        na0 = na[starts].astype(np.float64)
        nb0 = nb[starts].astype(np.float64)
        jac = inter / (na0 + nb0 - inter)
        keep = jac >= threshold
        if not keep.any():
            return _SCH_PAIRS_J.empty_table()
        s = starts[keep]
        return pa.table(
            {
                "a": pa.array(a[s].astype(np.int64)),
                "b": pa.array(b[s].astype(np.int64)),
                "jaccard": pa.array(np.round(jac[keep], 6)),
            }
        )

    sh = shingle_rows(ds, text_col, id_col, n)
    cand = bucketed_map_groups(
        sh, ["shingle"], pairs_in_bucket,
        out_schema=_SCH_PAIRS_RAW, batch_format="pyarrow",
    )
    return bucketed_map_groups(
        cand, ["a", "b"], jaccard_in_bucket,
        out_schema=_SCH_PAIRS_J, batch_format="pyarrow",
    )


# -- MinHash + LSH ----------------------------------------------------------


def _minhash_params(k: int, seed: int = 7):
    # Multiply-shift permutation family: x → a·x + b (mod 2^64) with ODD a
    # is a bijection on uint64, which is all MinHash needs for unbiased
    # min-sampling — and it costs 2 numpy passes per chunk instead of the 7
    # a Mersenne-prime reduction takes (the signature pass is memory-bound,
    # so passes ≈ wall time).
    rng = np.random.default_rng(seed)
    a = rng.integers(1, np.iinfo(np.uint64).max, size=k, dtype=np.uint64) | np.uint64(1)
    b = rng.integers(0, np.iinfo(np.uint64).max, size=k, dtype=np.uint64)
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
        # a·x + b mod 2^64 (wraparound IS the modulus), vectorized
        prod = sh[:, None] * self.a[None, :] + self.b[None, :]
        return prod.min(axis=0)

    _CHUNK = 16  # perms per pass: work matrix stays ~32MB at 250k shingles

    def _bufs(self, n: int):
        # First-touch page faults on fresh large buffers are pathologically
        # slow on some hosts; an actor reuses these across batches so only
        # the very first batch pays.
        b = getattr(self, "_buf", None)
        if b is None or b[0].shape[0] < n:
            self._buf = b = (np.empty((n, self._CHUNK), np.uint64),)
        return b[0][:n]

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t[self.id_col].to_numpy(zero_copy_only=False)
        n_docs = t.num_rows
        h, seg = _batch_shingles(t[self.text_col], self.n)
        sig = np.full((n_docs, self.k), np.iinfo(np.uint64).max, dtype=np.uint64)
        if len(h):
            counts = np.bincount(seg, minlength=n_docs)
            starts_all = np.concatenate([[0], np.cumsum(counts)])[:-1]
            nonempty = counts > 0
            starts = starts_all[nonempty]
            hcol = h[:, None]
            for c0 in range(0, self.k, self._CHUNK):
                a = self.a[c0 : c0 + self._CHUNK]
                b = self.b[c0 : c0 + self._CHUNK]
                prod = self._bufs(len(h))[:, : len(a)]
                np.multiply(hcol, a[None, :], out=prod)
                np.add(prod, b[None, :], out=prod)
                sig[nonempty, c0 : c0 + self._CHUNK] = np.minimum.reduceat(
                    prod, starts, axis=0
                )
        # one flat buffer + FixedSizeList wrapper — no per-row Python list
        flat = pa.array(sig.astype(np.int64).reshape(-1))
        return pa.table(
            {
                "doc_id": pa.array(ids.astype(np.int64)),
                "sig": pa.FixedSizeListArray.from_arrays(flat, self.k),
            }
        )


_MINHASHER_CACHE: dict = {}


def _minhash_batch(t: pa.Table, k: int, n: int, text_col: str, id_col: str) -> pa.Table:
    # per-WORKER MinHasher cache: same compile-once amortization as an
    # actor pool (permutation params + reusable fault-warm buffers) with
    # none of the per-run pool spin-up, which dominated second-scale runs
    key = (k, n, text_col, id_col)
    mh = _MINHASHER_CACHE.get(key)
    if mh is None:
        mh = _MINHASHER_CACHE[key] = MinHasher(k, n, text_col=text_col, id_col=id_col)
    return mh(t)


def minhash_signatures(
    ds, k: int = 128, n: int = 3, concurrency=None, text_col="text", id_col="doc_id"
):
    """→ Dataset (doc_id, sig list<int64>[k]).  Stateless tasks + worker
    cache by default; pass ``concurrency`` for an explicit actor pool
    (useful when the permutation state should pin to a fixed pool).
    The output id column is always named ``doc_id`` whatever ``id_col``
    names the input (downstream band/verify stages key on that)."""
    if concurrency is not None:
        return ds.map_batches(
            MinHasher,
            batch_format="pyarrow",
            concurrency=concurrency,
            fn_constructor_kwargs=dict(k=k, n=n, text_col=text_col, id_col=id_col),
        )
    return ds.map_batches(
        _minhash_batch,
        batch_format="pyarrow",
        zero_copy_batch=True,
        fn_kwargs=dict(k=k, n=n, text_col=text_col, id_col=id_col),
    )


def minhash_lsh_pairs(
    ds,
    threshold: float = 0.5,
    k: int = 128,
    bands: int = 32,
    n: int = 3,
    text_col="text",
    id_col="doc_id",
    verify: bool = True,
    hot_bucket_cap: int | None = None,
    min_band_matches: int = 1,
):
    """→ Dataset (a, b, jaccard): banded-LSH candidates verified with exact
    Jaccard, end to end distributed.

    Precision 1.0 (every reported pair is verified); recall follows the LSH
    S-curve 1-(1-t^r)^b with r = k/bands.

    ``verify=False`` returns the deduped candidate (a, b) pairs WITHOUT the
    exact-Jaccard pass.  At high duplicate density the verification join
    ships each candidate pair's shingles — inherently quadratic in clique
    size — while clustering workloads only need edges: unverified
    candidates cost one 16-byte row per pair.  Because a downstream
    union-find is transitive, a single false-positive edge merges two whole
    clusters (and cluster dedup then deletes every unique doc of the
    absorbed cluster) — ``min_band_matches`` is the guard: require a pair
    to collide in at least that many of the ``bands`` bands before it
    becomes an edge.  At 2, the FP probability for a pair of true
    similarity j drops from ~b·j^r to ~(b·j^r)²/2 (j^r ≪ 1 for
    non-duplicates) while true near-dups above the S-curve knee still match
    many bands.  Default 1 = classic LSH (oracle parity).

    ``hot_bucket_cap`` (default None = lossless) bounds the quadratic
    pair blowup of band buckets larger than the cap: instead of the
    all-pairs enumeration (m·(m-1)/2 edges), an over-cap bucket emits a
    CHAIN over its id-sorted members (m-1 edges) — for clustering, a chain
    connects the bucket exactly as well as the clique, at linear cost.  A
    bucket that large agreeing on a full band (r = k/bands minhashes) is
    statistical proof of true similarity, so chain edges bypass the
    ``min_band_matches`` floor (which guards against the one-off random
    band collisions that only ever produce small buckets).  The pair LIST
    is no longer exhaustive above the cap — use the default for
    ``verify=True`` / oracle runs.
    """
    r = k // bands
    sigs = minhash_signatures(ds, k=k, n=n, text_col=text_col, id_col=id_col)

    def band_rows(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        if t.num_rows:
            # flat-buffer reshape (works for fixed-size and variable lists)
            arr = t["sig"].combine_chunks()
            m = (
                arr.flatten()
                .to_numpy(zero_copy_only=False)
                .astype(np.uint64)
                .reshape(t.num_rows, k)
            )
        else:
            m = np.empty((0, k), np.uint64)
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

    from .bucketing import (
        bucketed_map_groups,
        col_np,
        group_bounds,
        group_bounds_multi,
    )

    def _group_count_pairs(a: np.ndarray, b: np.ndarray):
        """(a, b, count) per distinct pair — lexsort + run-length, no pandas."""
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        starts, ends = group_bounds_multi(a, b)
        return a[starts], b[starts], (ends - starts).astype(np.int64)

    def bucket_pairs(t: pa.Table) -> pa.Table:
        # Pairs sharing an LSH band bucket, vectorized across all (band,
        # bhash) groups hashed into this shuffle bucket.  Emits the number
        # of band-collisions seen locally (``_nb``) so the pair-keyed
        # exchange can enforce ``min_band_matches`` globally.
        key = (
            col_np(t, "band").astype(np.uint64) << np.uint64(48)
        ) ^ col_np(t, "bhash").astype(np.uint64)
        ids = col_np(t, "doc_id")
        order = np.lexsort((ids, key))
        key, ids = key[order], ids[order]
        # drop duplicate (band, bhash, doc_id) rows: adjacent after the sort
        dup = np.zeros(len(key), dtype=bool)
        dup[1:] = (key[1:] == key[:-1]) & (ids[1:] == ids[:-1])
        key, ids = key[~dup], ids[~dup]
        starts, ends = group_bounds(key)
        out_a, out_b = [], []
        chain_a, chain_b = [], []
        for s, e in zip(starts, ends):
            cnt = e - s
            if cnt < 2:
                continue
            if hot_bucket_cap is not None and cnt > hot_bucket_cap:
                # chain instead of clique: m-1 edges keep the bucket
                # connected for downstream components at linear cost
                chain_a.append(ids[s : e - 1])
                chain_b.append(ids[s + 1 : e])
                continue
            ai, bi = np.triu_indices(cnt, k=1)
            out_a.append(ids[s:e][ai])
            out_b.append(ids[s:e][bi])
        if not out_a and not chain_a:
            return _SCH_PAIRS_NB.empty_table()
        parts_a, parts_b, parts_n = [], [], []
        if out_a:
            ga, gb, gn = _group_count_pairs(
                np.concatenate(out_a), np.concatenate(out_b)
            )
            parts_a.append(ga)
            parts_b.append(gb)
            parts_n.append(gn)
        if chain_a:
            # a giant full-band agreement is already high-confidence:
            # _nb = bands makes chain edges pass any min_band_matches
            ca, cb, _ = _group_count_pairs(
                np.concatenate(chain_a), np.concatenate(chain_b)
            )
            parts_a.append(ca)
            parts_b.append(cb)
            parts_n.append(np.full(len(ca), bands, dtype=np.int64))
        return pa.table(
            {
                "a": pa.array(np.concatenate(parts_a).astype(np.int64)),
                "b": pa.array(np.concatenate(parts_b).astype(np.int64)),
                "_nb": pa.array(np.concatenate(parts_n)),
            }
        )

    cand = bucketed_map_groups(
        sigs.map_batches(band_rows, batch_format="pyarrow"),
        ["bhash"],
        bucket_pairs,
        out_schema=_SCH_PAIRS_NB,
        batch_format="pyarrow",
    )

    # Verify with exact Jaccard, fully distributed — candidates and doc
    # shingles never land on the driver (a near-dup-heavy 100 TB corpus can
    # produce far more candidate pairs than a driver heap holds):
    #  1. one pair-keyed exchange collapses cross-band duplicate pairs
    #     (a true near-dup matches in many of the ``bands`` bands) and
    #     enforces the global ``min_band_matches`` floor;
    #  2. each pair explodes into two (doc_id, a, b) side rows, equi-joined
    #     to the docs' shingle rows (one aligned hash exchange on doc_id);
    #  3. one pair-keyed exchange co-locates both docs' shingles per pair —
    #     shingle sets are deduped per doc, so intersection = shingles seen
    #     from both sides, the same counting kernel jaccard_pairs_exact uses.
    from .joins import hash_join

    def dedup_pairs(t: pa.Table) -> pa.Table:
        a = col_np(t, "a")
        b = col_np(t, "b")
        nbm = col_np(t, "_nb")
        order = np.lexsort((b, a))
        a, b, nbm = a[order], b[order], nbm[order]
        starts, ends = group_bounds_multi(a, b)
        tot = np.add.reduceat(nbm, starts)
        keep = tot >= min_band_matches
        if not keep.any():
            return _SCH_PAIRS.empty_table()
        s = starts[keep]
        return pa.table(
            {
                "a": pa.array(a[s].astype(np.int64)),
                "b": pa.array(b[s].astype(np.int64)),
            }
        )

    cand = bucketed_map_groups(
        cand, ["a", "b"], dedup_pairs,
        out_schema=_SCH_PAIRS, batch_format="pyarrow",
    )
    if not verify:
        return cand

    def explode_sides(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate([a, b])),
                "a": pa.array(np.concatenate([a, a])),
                "b": pa.array(np.concatenate([b, b])),
            }
        )

    sides = cand.map_batches(explode_sides, batch_format="pyarrow")
    sh = shingle_rows(ds, text_col, id_col, n)
    joined = hash_join(
        sides,
        sh,
        on="doc_id",
        left_cols=["a", "b"],
        right_cols=["shingle", "n_sh"],
        how="inner",
    )

    def verify_bucket(t: pa.Table) -> pa.Table:
        # Exact Jaccard per pair without any per-pair loop: rows are
        # (doc_id, a, b, shingle, n_sh) — both sides' deduped shingle sets.
        # After a (a, b, shingle) lexsort a shared shingle sits in two
        # ADJACENT rows, so the per-pair intersection size is one
        # ``add.reduceat`` over the adjacent-equality mask; each side's set
        # size is a ``maximum.reduceat`` over the side-masked n_sh.
        if t.num_rows == 0:
            return _SCH_PAIRS_J.empty_table()
        a = col_np(t, "a")
        b = col_np(t, "b")
        doc = col_np(t, "doc_id")
        sh = col_np(t, "shingle")
        nsh = col_np(t, "n_sh")
        order = np.lexsort((sh, b, a))
        a, b, doc, sh, nsh = a[order], b[order], doc[order], sh[order], nsh[order]
        starts, ends = group_bounds_multi(a, b)
        n = len(a)
        eq = np.zeros(n, dtype=np.int64)
        eq[: n - 1] = (
            (sh[1:] == sh[:-1]) & (a[1:] == a[:-1]) & (b[1:] == b[:-1])
        ).astype(np.int64)
        inter = np.add.reduceat(eq, starts).astype(np.float64)
        na = np.maximum.reduceat(np.where(doc == a, nsh, -1), starts).astype(np.float64)
        nb = np.maximum.reduceat(np.where(doc == b, nsh, -1), starts).astype(np.float64)
        both_sides = (na > 0) & (nb > 0)  # an empty-text side drops here
        with np.errstate(divide="ignore", invalid="ignore"):
            jac = np.where(both_sides, inter / (na + nb - inter), -1.0)
        keep = jac >= threshold
        if not keep.any():
            return _SCH_PAIRS_J.empty_table()
        s = starts[keep]
        return pa.table(
            {
                "a": pa.array(a[s].astype(np.int64)),
                "b": pa.array(b[s].astype(np.int64)),
                "jaccard": pa.array(np.round(jac[keep], 6)),
            }
        )

    return bucketed_map_groups(
        joined, ["a", "b"], verify_bucket,
        out_schema=_SCH_PAIRS_J, batch_format="pyarrow",
    )


# -- SimHash ----------------------------------------------------------------

_SIMHASH_CHUNK_TOKENS = 2_000_000  # tokens → ≤128 MB of uint8 bits per chunk


def _simhash_kernel(
    th: np.ndarray, ntok: np.ndarray, chunk_tokens: int | None = None
) -> np.ndarray:
    """→ uint64[n_docs] simhash from segment-sorted token hashes.

    Token-chunked bit count: the (chunk × 64) uint8 bit matrix stays
    bounded however long the documents are (a single full-batch int32
    matrix would be ~260 B/token — >1 GB at 5M tokens, the round-4 ADVICE
    memory finding); ``reduceat`` accumulates straight into int64 via its
    dtype arg.  Chunks split ON document starts so no group straddles
    one; a single over-chunk document degrades to one doc per chunk."""
    n = len(ntok)
    out = np.zeros(n, dtype=np.uint64)
    if not len(th):
        return out
    chunk = chunk_tokens or _SIMHASH_CHUNK_TOKENS
    nonempty = ntok > 0
    starts = np.concatenate([[0], np.cumsum(ntok)])[:-1][nonempty]
    nd = int(nonempty.sum())
    ones = np.empty((nd, 64), dtype=np.int64)
    lo_doc = 0
    while lo_doc < nd:
        hi_doc = int(np.searchsorted(starts, starts[lo_doc] + chunk, side="left"))
        hi_doc = max(hi_doc, lo_doc + 1)
        lo_tok = int(starts[lo_doc])
        hi_tok = int(starts[hi_doc]) if hi_doc < nd else len(th)
        bits = np.unpackbits(
            th[lo_tok:hi_tok, None].view(np.uint8), axis=1, bitorder="little"
        )
        ones[lo_doc:hi_doc] = np.add.reduceat(
            bits, starts[lo_doc:hi_doc] - lo_tok, axis=0, dtype=np.int64
        )
        lo_doc = hi_doc
    cnt = ntok[nonempty][:, None].astype(np.int64)
    bitvals = (2 * ones - cnt) > 0  # (+1 per set bit, -1 per clear)
    packed = np.packbits(bitvals, axis=1, bitorder="little")
    out[nonempty] = packed.reshape(-1, 8).copy().view(np.uint64).ravel()
    return out


def simhash64(ds, text_col="text", id_col="doc_id"):
    """→ Dataset (doc_id, simhash int64): 64-bit sign-sum over word hashes.

    Tokens come from the zero-copy byte-buffer kernel (stages/tokhash.py);
    the bit-count is ``unpackbits`` + segment ``add.reduceat`` over a
    (tokens × 64) uint8 bit matrix, processed in document-aligned token
    chunks so the matrix stays ≤128 MB regardless of batch token count.
    The token hash (byte polynomial + splitmix64 mix) is SQL-replicable,
    so simhash values carry a full DuckDB value oracle
    (queries.SIMHASH_SQL)."""
    from .tokhash import batch_token_hashes

    def compute(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        th, _sg, ntok = batch_token_hashes(t[text_col])
        out = _simhash_kernel(th, ntok)
        return pa.table(
            {
                "doc_id": pa.array(ids.astype(np.int64)),
                "simhash": pa.array(out.astype(np.int64)),
            }
        )

    return ds.map_batches(compute, batch_format="pyarrow")


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount (numpy<2 has no bitwise_count)."""
    return (
        np.unpackbits(np.ascontiguousarray(x).view(np.uint8))
        .reshape(-1, 64)
        .sum(axis=1)
        .astype(np.int64)
    )


def simhash_pairs(
    ds,
    max_hamming: int = 3,
    text_col="text",
    id_col="doc_id",
    hot_bucket_cap: int | None = None,
):
    """→ Dataset (a, b, hamming): doc pairs with SimHash Hamming distance
    ≤ ``max_hamming``, end to end distributed.

    Pigeonhole candidate generation: with 4 disjoint 16-bit sub-keys,
    Hamming ≤ 3 guarantees at least one sub-key is untouched, so bucketing
    on each of the four sub-keys finds every qualifying pair — **no false
    negatives while ``hot_bucket_cap`` is None** (the default).  With a cap
    set, an over-cap bucket verifies only the CHAIN of its id-sorted
    members (m-1 popcounts instead of m·(m-1)/2): every emitted pair is
    still exactly verified (precision stays 1.0), and a genuinely
    near-identical clique stays connected for downstream clustering, but
    the pair list is no longer exhaustive inside giant buckets — a
    documented, opt-in recall trade, never silent default behavior.
    Candidates verify with an exact popcount of the XOR; cross-quarter
    duplicate pairs collapse in a final pair-keyed exchange.
    """
    from .bucketing import (
        bucketed_map_groups,
        col_np,
        group_bounds,
        group_bounds_multi,
    )

    sigs = simhash64(ds, text_col=text_col, id_col=id_col)

    def explode(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        sh = t["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        keys, out_ids, out_sh = [], [], []
        for qi in range(4):
            sub = (sh >> np.uint64(16 * qi)) & np.uint64(0xFFFF)
            keys.append((sub.astype(np.int64)) | (qi << 16))
            out_ids.append(ids)
            out_sh.append(sh.astype(np.int64))
        return pa.table(
            {
                "skey": pa.array(np.concatenate(keys)),
                "doc_id": pa.array(np.concatenate(out_ids)),
                "simhash": pa.array(np.concatenate(out_sh)),
            }
        )

    def pairs_in_bucket(t: pa.Table) -> pa.Table:
        keys = col_np(t, "skey")
        ids = col_np(t, "doc_id")
        sh = col_np(t, "simhash").astype(np.uint64)
        order = np.lexsort((ids, keys))
        keys, ids, sh = keys[order], ids[order], sh[order]
        # drop duplicate (skey, doc_id) rows: adjacent after the sort
        dup = np.zeros(len(keys), dtype=bool)
        dup[1:] = (keys[1:] == keys[:-1]) & (ids[1:] == ids[:-1])
        keys, ids, sh = keys[~dup], ids[~dup], sh[~dup]
        starts, ends = group_bounds(keys)
        out_a, out_b, out_h = [], [], []
        for s, e in zip(starts, ends):
            cnt = e - s
            if cnt < 2:
                continue
            if hot_bucket_cap is not None and cnt > hot_bucket_cap:
                # chain mode: verify consecutive id-sorted members only
                ai = np.arange(cnt - 1)
                bi = ai + 1
            else:
                ai, bi = np.triu_indices(cnt, k=1)
            ham = _popcount64(sh[s:e][ai] ^ sh[s:e][bi])
            keep = ham <= max_hamming
            out_a.append(ids[s:e][ai[keep]])
            out_b.append(ids[s:e][bi[keep]])
            out_h.append(ham[keep])
        if not out_a:
            return _SCH_PAIRS_HAM.empty_table()
        return pa.table(
            {
                "a": pa.array(np.concatenate(out_a).astype(np.int64)),
                "b": pa.array(np.concatenate(out_b).astype(np.int64)),
                "hamming": pa.array(np.concatenate(out_h).astype(np.int64)),
            }
        )

    def dedup_cross_quarter(t: pa.Table) -> pa.Table:
        a = col_np(t, "a")
        b = col_np(t, "b")
        h = col_np(t, "hamming")
        order = np.lexsort((b, a))
        a, b, h = a[order], b[order], h[order]
        starts, _ends = group_bounds_multi(a, b)
        return pa.table(
            {
                "a": pa.array(a[starts].astype(np.int64)),
                "b": pa.array(b[starts].astype(np.int64)),
                "hamming": pa.array(h[starts].astype(np.int64)),
            }
        )

    cand = bucketed_map_groups(
        sigs.map_batches(explode, batch_format="pyarrow"),
        ["skey"],
        pairs_in_bucket,
        out_schema=_SCH_PAIRS_HAM,
        batch_format="pyarrow",
    )
    return bucketed_map_groups(
        cand,
        ["a", "b"],
        dedup_cross_quarter,
        out_schema=_SCH_PAIRS_HAM,
        batch_format="pyarrow",
    )


# -- embedding-cosine near-duplicates ---------------------------------------


def _broadcast_budget_bytes(fraction: float = 0.2) -> int:
    """Bytes a single broadcast side may occupy: a fraction of the object
    store (one ``ray.put`` copy is shared by every actor)."""
    try:
        import ray

        store = int(ray.cluster_resources().get("object_store_memory", 0))
    except Exception:
        store = 0
    return int(store * fraction) if store else 2 << 30


def _route_embedding_method(ds, budget_bytes: int | None = None) -> str:
    """``exact`` while the embedding matrix fits the broadcast budget, else
    ``lsh`` — decided from plan metadata, never by executing the plan."""
    from .bucketing import _plan_size_estimate

    sz = _plan_size_estimate(ds)
    budget = budget_bytes if budget_bytes is not None else _broadcast_budget_bytes()
    return "exact" if sz is not None and sz <= budget else "lsh"


def embedding_dup_pairs(
    ds,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    method: str = "auto",
    bits: int = 12,
    tables: int = 3,
    seed: int = 23,
):
    """All (a < b) pairs with cosine similarity ≥ threshold.

    ``method="exact"`` broadcasts the normalized matrix once (``ray.put``)
    and each batch does one matmul against it — O(n²) compare work spread
    over the cluster, zero shuffle.  Right whenever the matrix fits the
    object store (n·d·8 bytes; ~30 GB at n=10M, d=384).

    ``method="lsh"`` is the 100 TB path: ``tables`` independent
    random-hyperplane code tables bucket the vectors; a pair is scored when
    its codes agree in ANY table, so recall is 1-(1-p^bits)^tables (≈0.996
    at sim 0.999 with 12 bits × 3 tables, p = 1-θ/π per hyperplane).  Sims
    are computed exactly inside buckets (precision 1.0); cross-table
    duplicate pairs collapse in a final pair-keyed exchange.

    ``method="auto"`` (default) routes on the dataset's metadata size
    estimate vs the object-store broadcast budget — exact while the matrix
    fits, LSH beyond (mirrors joins.auto_hash_join's measured routing).
    """
    import ray

    from .ann import _batch_matrix, _normalize

    if method == "auto":
        method = _route_embedding_method(ds)

    if method == "lsh":
        sample_rows = ds.take(1)
        if not sample_rows:  # empty dataset: no pairs (exact path parity)
            import ray.data as _rd

            return _rd.from_arrow(_SCH_PAIRS_SIM.empty_table())
        d = len(sample_rows[0][vec_col])
        rng = np.random.default_rng(seed)
        planes = rng.standard_normal((d, tables * bits))
        pows = 1 << np.arange(bits)

        def add_code(t: pa.Table) -> pa.Table:
            # one row per (vector, table); the table id rides in the code's
            # high bits so buckets never mix tables
            m = _batch_matrix(t, vec_col)
            nr = t.num_rows
            if m.size:
                proj = (_normalize(m) @ planes) > 0  # (n, tables*bits)
                codes = np.empty((nr, tables), np.int64)
                for ti in range(tables):
                    codes[:, ti] = (
                        proj[:, ti * bits : (ti + 1) * bits] @ pows
                    ) | (ti << bits)
            else:
                codes = np.empty((0, tables), np.int64)
            rep = np.repeat(np.arange(nr, dtype=np.int64), tables)
            t2 = t.select([id_col, vec_col]).take(pa.array(rep))
            return t2.append_column("code", pa.array(codes.reshape(-1)))

        from .bucketing import (
            bucketed_map_groups,
            col_np,
            group_bounds,
            group_bounds_multi,
        )

        def pairs_in_bucket(t: pa.Table) -> pa.Table:
            # Arrow in: the vector column stays a flat float buffer
            # (_batch_matrix reshape) instead of a pandas object array
            # of per-row lists.
            codes = col_np(t, "code")
            ids = col_np(t, id_col)
            order = np.lexsort((ids, codes))
            codes, ids = codes[order], ids[order]
            mat = _normalize(_batch_matrix(t, vec_col)[order])
            starts, ends = group_bounds(codes)
            out_a, out_b, out_s = [], [], []
            for s, e in zip(starts, ends):
                if e - s < 2:
                    continue
                sims = mat[s:e] @ mat[s:e].T
                ai, bi = np.triu_indices(e - s, k=1)
                keep = sims[ai, bi] >= threshold
                out_a.append(ids[s:e][ai[keep]])
                out_b.append(ids[s:e][bi[keep]])
                out_s.append(np.round(sims[ai, bi][keep], 6))
            if not out_a:
                return _SCH_PAIRS_SIM.empty_table()
            return pa.table(
                {
                    "a": pa.array(np.concatenate(out_a).astype(np.int64)),
                    "b": pa.array(np.concatenate(out_b).astype(np.int64)),
                    "sim": pa.array(np.concatenate(out_s)),
                }
            )

        def dedup_cross_table(t: pa.Table) -> pa.Table:
            a = col_np(t, "a")
            b = col_np(t, "b")
            sim = col_np(t, "sim")
            order = np.lexsort((b, a))
            a, b, sim = a[order], b[order], sim[order]
            starts, _ends = group_bounds_multi(a, b)
            return pa.table(
                {
                    "a": pa.array(a[starts].astype(np.int64)),
                    "b": pa.array(b[starts].astype(np.int64)),
                    "sim": pa.array(sim[starts]),
                }
            )

        coded = ds.select_columns([id_col, vec_col]).map_batches(
            add_code, batch_format="pyarrow"
        )
        pairs = bucketed_map_groups(
            coded, ["code"], pairs_in_bucket,
            out_schema=_SCH_PAIRS_SIM, batch_format="pyarrow",
        )
        return bucketed_map_groups(
            pairs,
            ["a", "b"],
            dedup_cross_table,
            out_schema=_SCH_PAIRS_SIM,
            batch_format="pyarrow",
        )

    # exact: broadcast the full normalized matrix, one matmul per batch.
    # The matrix is assembled from streamed Arrow batches — flat float
    # buffers reshaped per batch, no pandas object-array detour — so the
    # only full-size allocations are the matrix itself and its sort copy.
    ids_parts: list[np.ndarray] = []
    mat_parts: list[np.ndarray] = []
    for t in ds.select_columns([id_col, vec_col]).iter_batches(
        batch_format="pyarrow", batch_size=32768
    ):
        if t.num_rows:
            ids_parts.append(t[id_col].to_numpy(zero_copy_only=False))
            mat_parts.append(_batch_matrix(t, vec_col))
    if not ids_parts:
        # empty input → an (empty) Dataset like every other branch, so
        # callers can keep chaining .map_batches()/.to_pandas()
        import ray.data as _rd

        return _rd.from_arrow(_SCH_PAIRS_SIM.empty_table())
    ids_all = np.concatenate(ids_parts)
    order = np.argsort(ids_all)
    ids_all = ids_all[order]
    mat_all = _normalize(np.vstack(mat_parts)[order])
    ref = ray.put({"ids": ids_all, "matrix": mat_all})

    # stateless tasks: ray.get of the broadcast matrix is a zero-copy local
    # plasma read on warm workers — no per-call actor-pool spin-up
    def pair_score(t: pa.Table, side_ref=ref) -> pa.Table:
        side = ray.get(side_ref)
        all_ids, mat = side["ids"], side["matrix"]
        m = _batch_matrix(t, vec_col)
        if m.size == 0:
            return pa.table(
                {
                    "a": pa.array([], pa.int64()),
                    "b": pa.array([], pa.int64()),
                    "sim": pa.array([], pa.float64()),
                }
            )
        ids = t[id_col].to_numpy()
        sims = _normalize(m) @ mat.T  # (batch, n)
        bi, aj = np.nonzero(sims >= threshold)
        keep = ids[bi] < all_ids[aj]  # a < b, self-pairs excluded
        return pa.table(
            {
                "a": pa.array(ids[bi][keep].astype(np.int64)),
                "b": pa.array(all_ids[aj][keep].astype(np.int64)),
                "sim": pa.array(np.round(sims[bi, aj][keep], 6)),
            }
        )

    return ds.select_columns([id_col, vec_col]).map_batches(
        pair_score, batch_format="pyarrow", zero_copy_batch=True
    )


def dedup_keep_first(ds, text_col: str = "text", id_col: str = "doc_id"):
    """→ Dataset of surviving rows: one representative (min id) per
    distinct content.  Composition: exact_dedup's combiner finds the
    keeper ids (that stage shuffles only 8-byte hashes), then a semi-join
    on the id filters the corpus.  The semi-join's left side carries the
    text THROUGH its exchange — one text shuffle, the documented cost of
    returning surviving rows (curate.py's chain accounts it the same
    way); use :func:`exact_dedup` directly when only keeper ids are
    needed."""
    from .joins import hash_join

    keepers = exact_dedup(ds, text_col=text_col, id_col=id_col).map_batches(
        lambda t: pa.table({id_col: t["doc_id_kept"]}), batch_format="pyarrow"
    )
    return hash_join(
        ds.select_columns([id_col, text_col]),
        keepers,
        on=id_col,
        left_cols=[text_col],
        right_cols=[],
        how="semi",
    )
