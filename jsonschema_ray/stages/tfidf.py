"""Per-document TF-IDF top terms.

The classic relevance scoring over a distributed corpus, shaped for
scale the same way the dedup operators are:

* stage 1 (``map_batches``, no shuffle): each document's DISTINCT terms
  with counts, grouped in 64-bit hash space over the byte-buffer token
  kernel; only the per-(doc, term) representative strings materialize,
  via one vectorized span gather (no per-token Python);
* stage 2 (term-keyed exchange): document frequency per term — rows for
  a term are co-located, so ``df`` is a C-level groupby transform and
  rides each row out of the bucket (no broadcast of a vocabulary-sized
  df table);
* stage 3 (doc-keyed exchange): top-``k`` terms per document by
  ``tfidf = tf · ln(N/df)``, pre-pruned per batch (a document's global
  top-k is a subset of every batch's local top-k) so the final exchange
  carries at most k rows per (doc, batch).

Ranking uses ``round(tfidf, 6)`` with an ascending term tie-break so a
SQL oracle (``ORDER BY ROUND(tf * ln(N/df), 6) DESC, term``) reproduces
the exact row set — raw-float ordering would be ULP-sensitive across
engines.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["tfidf_top_terms", "bm25_topk", "bm25_topk_multi"]

_SCH_OUT = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("term", pa.string()),
        ("tf", pa.int64()),
        ("df", pa.int64()),
        ("tfidf", pa.float64()),
    ]
)

_SEG_MIX = np.uint64(0x9E3779B97F4A7C15)


def tfidf_top_terms(ds, k: int = 5, n_docs: int | None = None, text_col="text", id_col="doc_id"):
    """→ Dataset (doc_id, term, tf, df, tfidf): each document's top-``k``
    terms by TF-IDF (ties broken by term, ranking on the 6-decimal
    rounded score).  ``n_docs`` is the corpus size for the idf
    denominator; pass it when known (a parquet count is metadata-only),
    else it is taken from ``ds.count()``."""
    from .bucketing import bucketed_map_groups, col_np, group_bounds, pandas_map
    from .tokhash import batch_token_hashes, spans_to_strings, wraparound_ok

    if n_docs is None:
        n_docs = ds.count()
    n_docs = float(n_docs)

    _SCH_TF = pa.schema(
        [("term", pa.string()), ("doc_id", pa.int64()), ("tf", pa.int64())]
    )

    @wraparound_ok
    def tf_rows(t: pa.Table) -> pa.Table:
        ids = col_np(t, id_col).astype(np.int64)
        th, sg, _ntok, lens, (starts, buf) = batch_token_hashes(
            t[text_col], include_lens=True, include_spans=True
        )
        if len(th) == 0:
            return _SCH_TF.empty_table()
        key = th ^ (sg.astype(np.uint64) * _SEG_MIX)
        order = np.argsort(key)
        gstarts, gends = group_bounds(key[order])
        rep = order[gstarts]  # one occurrence index per (doc, term)
        return pa.table(
            {
                # >2 GiB of distinct-term bytes in ONE batch would return
                # large_string and fail the downstream string-typed
                # schema cast loudly — a pathological batch size, bounded
                # by choosing batch_size long before that point
                "term": spans_to_strings(buf, starts[rep], lens[rep]),
                "doc_id": pa.array(ids[sg[rep]]),
                "tf": pa.array((gends - gstarts).astype(np.int64)),
            }
        )

    rows = ds.map_batches(tf_rows, batch_format="pyarrow", zero_copy_batch=True)

    def df_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # exact string grouping (C hash table) — rows for a term are all
        # in this bucket, so the transform IS the global df
        out = df.copy()
        out["df"] = (
            out.groupby("term", sort=False)["term"].transform("size").astype(np.int64)
        )
        return out

    # out_schema: empty sort partitions pass through schemaless without it,
    # and the downstream pandas topk would KeyError on a column-less frame
    _SCH_DF = pa.schema(
        [
            ("term", pa.string()),
            ("doc_id", pa.int64()),
            ("tf", pa.int64()),
            ("df", pa.int64()),
        ]
    )
    with_df = bucketed_map_groups(rows, ["term"], df_bucket, out_schema=_SCH_DF)

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        score = np.round(
            df["tf"].to_numpy(np.float64)
            * np.log(n_docs / df["df"].to_numpy(np.float64)),
            6,
        )
        df = df.assign(tfidf=score)
        df = df.sort_values(
            ["doc_id", "tfidf", "term"],
            ascending=[True, False, True],
            kind="stable",
        )
        keep = df.groupby("doc_id", sort=False).cumcount().to_numpy() < k
        df = df[keep]
        return df[["doc_id", "term", "tf", "df", "tfidf"]]

    pruned = with_df.map_batches(pandas_map(topk), batch_format="pandas")
    return bucketed_map_groups(pruned, ["doc_id"], topk, out_schema=_SCH_OUT)


def _query_terms(query: str) -> list[str]:
    """Split a query on EXACTLY the document tokenizer's whitespace class
    (tokhash's RE2 ``[\\t\\n\\f\\r ]`` — NOT Python ``str.split``, whose
    all-Unicode-whitespace rule would split on e.g. ``\\x0b`` and NBSP
    where the corpus kernel does not)."""
    import re

    return sorted({w for w in re.split(r"[\t\n\f\r ]+", query) if w})


_SCH_BM25 = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("score", pa.float64()),
        ("n_hit_terms", pa.int64()),
    ]
)


def bm25_topk(
    ds,
    query: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    n_docs: int | None = None,
    text_col="text",
    id_col="doc_id",
):
    """→ Dataset (doc_id, score, n_hit_terms): top-``k`` documents for a
    query string under Okapi BM25 (idf = ln(1 + (N − df + ½)/(df + ½))).

    Scale shape: per-batch (doc, term) rows are filtered to the QUERY's
    term hashes immediately — only matching rows (a few per doc) ever
    leave the scan, so both exchanges are tiny regardless of corpus
    size.  Document length and corpus stats come from the same token
    kernel; ranking uses ``round(score, 6)`` with a doc_id tie-break so
    the SQL oracle reproduces the row set exactly.

    ``n_docs`` overrides the COUNT ``N`` in the idf only (a caller that
    knows the corpus size skips nothing else); ``avgdl`` always comes
    from the corpus scan, since no caller can supply a token total
    without scanning."""
    from .bucketing import bucketed_map_groups, col_np, group_bounds
    from .tokhash import batch_token_hashes, hash_words, wraparound_ok

    q_terms = _query_terms(query)
    if not q_terms:
        raise ValueError("empty query")
    q_hashes = np.sort(hash_words(q_terms))

    # corpus stats: N and average doc length (one cheap numeric pass)
    def len_partial(t: pa.Table) -> pa.Table:
        _h, _s, ntok = batch_token_hashes(t[text_col])
        return pa.table(
            {
                "_n": pa.array([t.num_rows], pa.int64()),
                "_tok": pa.array([int(ntok.sum())], pa.int64()),
            }
        )

    totals = (
        ds.map_batches(len_partial, batch_format="pyarrow")
        .to_pandas()
        .sum()
    )
    N = int(totals["_n"]) if n_docs is None else int(n_docs)
    # avgdl always comes from the scan (scanned tokens / SCANNED docs) —
    # dividing by a caller-overridden N would corrupt the length
    # normalization, contradicting the contract above
    avgdl = float(totals["_tok"]) / max(int(totals["_n"]), 1)

    _SCH_TF = pa.schema(
        [
            ("qh", pa.int64()),
            ("doc_id", pa.int64()),
            ("tf", pa.int64()),
            ("dl", pa.int64()),
        ]
    )

    @wraparound_ok
    def tf_rows(t: pa.Table) -> pa.Table:
        ids = col_np(t, id_col).astype(np.int64)
        th, sg, ntok = batch_token_hashes(t[text_col])
        if len(th) == 0:
            return _SCH_TF.empty_table()
        hit = np.isin(th, q_hashes)  # query-term filter BEFORE anything moves
        if not hit.any():
            return _SCH_TF.empty_table()
        th, sg = th[hit], sg[hit]
        key = th ^ (sg.astype(np.uint64) * _SEG_MIX)
        order = np.argsort(key)
        gs, ge = group_bounds(key[order])
        rep = order[gs]
        return pa.table(
            {
                "qh": pa.array(th[rep].astype(np.int64)),
                "doc_id": pa.array(ids[sg[rep]]),
                "tf": pa.array((ge - gs).astype(np.int64)),
                "dl": pa.array(ntok[sg[rep]].astype(np.int64)),
            }
        )

    rows = ds.map_batches(tf_rows, batch_format="pyarrow", zero_copy_batch=True)

    def score_bucket(t: pa.Table) -> pa.Table:
        qh = col_np(t, "qh")
        doc = col_np(t, "doc_id")
        tf = col_np(t, "tf").astype(np.float64)
        dl = col_np(t, "dl").astype(np.float64)
        order = np.argsort(qh, kind="stable")
        qh, doc, tf, dl = qh[order], doc[order], tf[order], dl[order]
        starts, ends = group_bounds(qh)
        df = (ends - starts).astype(np.float64)
        idf = np.log1p((N - df + 0.5) / (df + 0.5))
        idf_row = np.repeat(idf, (ends - starts).astype(np.int64))
        s = idf_row * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
        return pa.table(
            {
                "doc_id": pa.array(doc.astype(np.int64)),
                "_s": pa.array(s),
                "_c": pa.array(np.ones(len(doc), dtype=np.int64)),
            }
        )

    scored = bucketed_map_groups(
        rows,
        ["qh"],
        score_bucket,
        out_schema=pa.schema(
            [("doc_id", pa.int64()), ("_s", pa.float64()), ("_c", pa.int64())]
        ),
        batch_format="pyarrow",
    )

    def topk(t: pa.Table) -> pa.Table:
        doc = col_np(t, "doc_id")
        s = col_np(t, "_s")
        c = col_np(t, "_c")
        order = np.argsort(doc, kind="stable")
        doc, s, c = doc[order], s[order], c[order]
        starts, _e = group_bounds(doc)
        tot = np.round(np.add.reduceat(s, starts), 6)
        cnt = np.add.reduceat(c, starts)
        docs = doc[starts]
        sel = np.lexsort((docs, -tot))[:k]
        return pa.table(
            {
                "doc_id": pa.array(docs[sel].astype(np.int64)),
                "score": pa.array(tot[sel]),
                "n_hit_terms": pa.array(cnt[sel].astype(np.int64)),
            }
        )

    # per-batch lossless prune (global top-k ⊆ per-batch top-k per doc set
    # only after per-doc sums are complete — so sum in ONE doc-keyed
    # exchange, then a driver-free global head via sort+limit
    summed = bucketed_map_groups(
        scored, ["doc_id"], topk, out_schema=_SCH_BM25, batch_format="pyarrow"
    )
    return summed.sort(["score", "doc_id"], descending=[True, False]).limit(k)


_SCH_BM25_MULTI = pa.schema(
    [
        ("query_id", pa.string()),
        ("doc_id", pa.int64()),
        ("score", pa.float64()),
        ("n_hit_terms", pa.int64()),
    ]
)


def bm25_topk_multi(
    ds,
    queries: dict[str, str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col="text",
    id_col="doc_id",
):
    """→ Dataset (query_id, doc_id, score, n_hit_terms): per-query top-``k``
    documents for a whole query TABLE, scored in ONE corpus pass.

    Scale shape = :func:`bm25_topk` with the scan-side filter keyed by the
    UNION of all query-term hashes: each (doc, term) row still leaves the
    scan at most once regardless of how many queries share the term.  The
    term-keyed exchange computes the (query-independent) global ``df`` and
    each row's BM25 contribution, then fans the row out to its owning
    query ids via a broadcast-small sorted (term-hash → query_id) map; a
    final query-keyed exchange co-locates each query's candidates for the
    per-query top-``k``.  Per-query cost is the posting lists of ITS
    terms, never the corpus."""
    from .bucketing import bucketed_map_groups, col_np, group_bounds
    from .tokhash import batch_token_hashes, hash_words, wraparound_ok

    q_ids = sorted(queries)
    if not q_ids:
        raise ValueError("empty query table")
    pair_h_l, pair_q_l = [], []
    for qid in q_ids:
        terms = _query_terms(queries[qid])
        if not terms:
            raise ValueError(f"empty query {qid!r}")
        h = hash_words(terms)
        pair_h_l.append(h)
        pair_q_l.append(np.full(len(h), qid, dtype=object))
    pair_h = np.concatenate(pair_h_l)
    pair_q = np.concatenate(pair_q_l)
    order = np.argsort(pair_h, kind="stable")
    pair_h, pair_q = pair_h[order], pair_q[order]
    all_h = np.unique(pair_h)

    def len_partial(t: pa.Table) -> pa.Table:
        _h, _s, ntok = batch_token_hashes(t[text_col])
        return pa.table(
            {
                "_n": pa.array([t.num_rows], pa.int64()),
                "_tok": pa.array([int(ntok.sum())], pa.int64()),
            }
        )

    totals = ds.map_batches(len_partial, batch_format="pyarrow").to_pandas().sum()
    N = int(totals["_n"])
    avgdl = float(totals["_tok"]) / max(N, 1)

    _SCH_TF = pa.schema(
        [
            ("qh", pa.int64()),
            ("doc_id", pa.int64()),
            ("tf", pa.int64()),
            ("dl", pa.int64()),
        ]
    )

    @wraparound_ok
    def tf_rows(t: pa.Table) -> pa.Table:
        ids = col_np(t, id_col).astype(np.int64)
        th, sg, ntok = batch_token_hashes(t[text_col])
        if len(th) == 0:
            return _SCH_TF.empty_table()
        hit = np.isin(th, all_h)
        if not hit.any():
            return _SCH_TF.empty_table()
        th, sg = th[hit], sg[hit]
        key = th ^ (sg.astype(np.uint64) * _SEG_MIX)
        order = np.argsort(key)
        gs, ge = group_bounds(key[order])
        rep = order[gs]
        return pa.table(
            {
                "qh": pa.array(th[rep].astype(np.int64)),
                "doc_id": pa.array(ids[sg[rep]]),
                "tf": pa.array((ge - gs).astype(np.int64)),
                "dl": pa.array(ntok[sg[rep]].astype(np.int64)),
            }
        )

    rows = ds.map_batches(tf_rows, batch_format="pyarrow", zero_copy_batch=True)

    def score_bucket(t: pa.Table) -> pa.Table:
        qh = col_np(t, "qh")
        doc = col_np(t, "doc_id")
        tf = col_np(t, "tf").astype(np.float64)
        dl = col_np(t, "dl").astype(np.float64)
        order = np.argsort(qh, kind="stable")
        qh, doc, tf, dl = qh[order], doc[order], tf[order], dl[order]
        starts, ends = group_bounds(qh)
        df = (ends - starts).astype(np.float64)
        idf = np.log1p((N - df + 0.5) / (df + 0.5))
        idf_row = np.repeat(idf, (ends - starts).astype(np.int64))
        s = idf_row * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
        # fan each (term, doc) row out to the query ids owning the term:
        # contiguous runs of the sorted broadcast (hash → query_id) map
        uh = qh.astype(np.uint64)
        lo = np.searchsorted(pair_h, uh, side="left")
        hi = np.searchsorted(pair_h, uh, side="right")
        cnt = hi - lo
        rep_row = np.repeat(np.arange(len(qh)), cnt)
        # index into pair_q: lo[row] + offset-within-run, fully vectorized
        off = np.arange(cnt.sum()) - np.repeat(np.cumsum(cnt) - cnt, cnt)
        qidx = np.repeat(lo, cnt) + off
        return pa.table(
            {
                "query_id": pa.array(pair_q[qidx], pa.string()),
                "doc_id": pa.array(doc[rep_row].astype(np.int64)),
                "_s": pa.array(s[rep_row]),
                "_c": pa.array(np.ones(len(rep_row), dtype=np.int64)),
            }
        )

    _SCH_SCORED = pa.schema(
        [
            ("query_id", pa.string()),
            ("doc_id", pa.int64()),
            ("_s", pa.float64()),
            ("_c", pa.int64()),
        ]
    )
    scored = bucketed_map_groups(
        rows, ["qh"], score_bucket, out_schema=_SCH_SCORED, batch_format="pyarrow"
    )

    def topk_per_query(df: pd.DataFrame) -> pd.DataFrame:
        # all rows of a query_id land in one bucket (keyed exchange), so
        # per-(query, doc) sums and the per-query head are both local
        agg = (
            df.groupby(["query_id", "doc_id"], sort=False)
            .agg(score=("_s", "sum"), n_hit_terms=("_c", "sum"))
            .reset_index()
        )
        agg["score"] = np.round(agg["score"].to_numpy(np.float64), 6)
        agg = agg.sort_values(
            ["query_id", "score", "doc_id"],
            ascending=[True, False, True],
            kind="stable",
        )
        keep = agg.groupby("query_id", sort=False).cumcount().to_numpy() < k
        return agg[keep]

    out = bucketed_map_groups(
        scored, ["query_id"], topk_per_query, out_schema=_SCH_BM25_MULTI
    )
    return out.sort(["query_id", "score", "doc_id"], descending=[False, True, False])
