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

__all__ = ["tfidf_top_terms"]

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
    from .bucketing import bucketed_map_groups, col_np, group_bounds
    from .tokhash import batch_token_hashes, spans_to_strings

    if n_docs is None:
        n_docs = ds.count()
    n_docs = float(n_docs)

    _SCH_TF = pa.schema(
        [("term", pa.string()), ("doc_id", pa.int64()), ("tf", pa.int64())]
    )

    def tf_rows(t: pa.Table) -> pa.Table:
        np.seterr(over="ignore")  # uint64 wraparound IS the mixing
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

    with_df = bucketed_map_groups(rows, ["term"], df_bucket)

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

    pruned = with_df.map_batches(topk, batch_format="pandas")
    return bucketed_map_groups(pruned, ["doc_id"], topk, out_schema=_SCH_OUT)
