"""Text-analysis operators over a document table.

All are single-pass vectorized/batched ``map_batches`` stages (no shuffle):

* :func:`token_stats` — whitespace token counts + codepoint counts;
* :func:`quality_scores` — heuristic quality signals (stopword ratio,
  punctuation ratio, mean token length) in the C4/Gopher style;
* :class:`LangId` — n-gram/marker-word language ID (actor pool: marker
  tables built once per actor), deterministic argmax with alphabetical
  tie-break;
* :func:`fingerprints` — 64-bit Rabin–Karp rolling hash of the whole text
  plus the minimum window hash (winnowing-style document fingerprint).

Formulas are chosen to be replicable in ANSI SQL where possible so the
driver's DuckDB oracle can check them exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["token_stats", "quality_scores", "quality_filter", "LangId", "lang_id", "fingerprints", "content_flags", "redact", "repetition_scores", "text_metrics", "PII_PATTERNS", "STOPWORDS"]

STOPWORDS = ("the", "and", "of", "a", "to", "in", "is", "it")

# Two marker words per language; scores are marker-hit counts.  (The
# synthetic corpus has random text — the point is deterministic, oracle-
# checkable computation, not linguistic accuracy.)
LANG_MARKERS = {
    "de": ("der", "und"),
    "en": ("the", "and"),
    "es": ("el", "y"),
    "fr": ("le", "et"),
    "zh": ("的", "是"),
}


# BPE-ish pre-tokenization: letter runs, digit runs, punctuation runs —
# the usual byte-level-BPE split classes, ASCII-scoped so the RE2 pattern
# means the same thing in pyarrow and DuckDB.
BPE_SPLIT_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"


def token_stats(ds, text_col="text", id_col="doc_id"):
    def stats(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_col: t[id_col],
                "n_chars": pc.utf8_length(t[text_col]).cast(pa.int64()),
                "n_tokens": pc.count_substring_regex(t[text_col], pattern=r"\S+").cast(
                    pa.int64()
                ),
                "n_subtokens": pc.count_substring_regex(
                    t[text_col], pattern=BPE_SPLIT_RE
                ).cast(pa.int64()),
            }
        )

    return ds.map_batches(stats, batch_format="pyarrow")


def quality_scores(ds, text_col="text", id_col="doc_id", stopwords=STOPWORDS):
    """Token counts, stopword ratio, mean token length — all computed from
    the zero-copy byte-buffer token kernel (stages/tokhash.py): stopword
    membership is an ``np.isin`` against the hashed stopword set, token
    length is the byte length (== codepoint length for ASCII corpora, the
    unit the SQL oracle uses)."""
    from .tokhash import batch_token_hashes, hash_words

    stop_h = np.sort(hash_words(sorted(set(stopwords))))

    def score(t: pa.Table) -> pa.Table:
        th, sg, n_tok, lens = batch_token_hashes(t[text_col], include_lens=True)
        n = t.num_rows
        sum_stop = np.bincount(sg, weights=np.isin(th, stop_h), minlength=n)
        sum_len = np.bincount(sg, weights=lens.astype(np.float64), minlength=n)
        denom = np.maximum(n_tok, 1).astype(np.float64)
        has = n_tok > 0
        return pa.table(
            {
                id_col: t[id_col],
                "n_tokens": pa.array(n_tok),
                "stop_ratio": pa.array(np.round(np.where(has, sum_stop / denom, 0.0), 6)),
                "mean_token_len": pa.array(np.round(np.where(has, sum_len / denom, 0.0), 6)),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


def quality_filter(
    ds,
    text_col="text",
    id_col="doc_id",
    min_tokens: int = 1,
    max_stop_ratio: float = 1.0,
    stopwords=STOPWORDS,
):
    """Drop rows failing the quality gate, in-place per batch — the same
    metrics as :func:`quality_scores`, but no separate dataset and no
    join back (a curation pipeline wants surviving ROWS, not scores)."""
    from .tokhash import batch_token_hashes, hash_words

    stop_h = np.sort(hash_words(sorted(set(stopwords))))

    def keep(t: pa.Table) -> pa.Table:
        th, sg, n_tok = batch_token_hashes(t[text_col])
        n = t.num_rows
        sum_stop = np.bincount(sg, weights=np.isin(th, stop_h), minlength=n)
        denom = np.maximum(n_tok, 1).astype(np.float64)
        ratio = np.where(n_tok > 0, sum_stop / denom, 0.0)
        ok = (n_tok >= min_tokens) & (np.round(ratio, 6) <= max_stop_ratio)
        return t.filter(pa.array(ok))

    return ds.map_batches(keep, batch_format="pyarrow")


class LangId:
    """Marker-word language ID; tables compiled once per actor."""

    def __init__(self, text_col="text", id_col="doc_id", markers=None) -> None:
        from .tokhash import hash_words

        self.text_col, self.id_col = text_col, id_col
        markers = markers or LANG_MARKERS
        self.langs = sorted(markers)
        # marker hash tables compiled once per actor
        self.marker_h = {
            lang: np.sort(hash_words(sorted(set(markers[lang])))) for lang in self.langs
        }

    def __call__(self, t: pa.Table) -> pa.Table:
        from .tokhash import batch_token_hashes

        th, sg, _ntok = batch_token_hashes(t[self.text_col])
        n = t.num_rows
        # (rows × langs) marker-hit matrix via one isin + bincount per lang
        scores = np.zeros((n, len(self.langs)), dtype=np.int64)
        for j, lang in enumerate(self.langs):
            hits = np.isin(th, self.marker_h[lang])
            scores[:, j] = np.bincount(sg, weights=hits, minlength=n)
        # deterministic argmax: highest score, alphabetical tie-break
        # (langs sorted ⇒ np.argmax's first-max IS the alphabetical winner)
        best = np.argmax(scores, axis=1)
        top = scores[np.arange(n), best]
        langs = np.asarray(self.langs, dtype=object)
        out = np.where(top > 0, langs[best], "und")
        return pa.table(
            {
                self.id_col: t[self.id_col],
                "lang_pred": pa.array(out.astype(object), pa.string()),
            }
        )


def lang_id(ds, concurrency=(1, 4), **kwargs):
    return ds.map_batches(
        LangId, batch_format="pyarrow", concurrency=concurrency,
        fn_constructor_kwargs=kwargs,
    )


_RK_BASE = np.uint64(1099511628211)


def fingerprints(ds, text_col="text", id_col="doc_id", window: int = 16):
    """64-bit rolling-hash document fingerprints (full-doc + min-window)."""

    # B is odd, hence invertible mod 2^64: window hashes become a fully
    # vectorized prefix-sum difference instead of a per-character loop —
    # H(j) = (pref[j+w] - pref[j]) * B^(j+w-1) where pref[j] = Σ cps[k]·B^(-k)
    binv = np.uint64(pow(int(_RK_BASE), -1, 1 << 64))
    from .tokhash import wraparound_ok

    @wraparound_ok
    def fp(t: pa.Table) -> pa.Table:
        # Whole-batch kernel (no per-row numpy allocations): all docs'
        # codepoints concatenate into ONE flat array, and the per-doc
        # power factors cancel algebraically — with global tables
        # POW[k]=B^k, PINV[k]=B^-k and S = prefix sum of cps·PINV,
        #   pref_local[j] = (S[start+j] - S[start])·B^start
        # so full = (S[end]-S[start])·POW[end-1] and the window at global
        # position g is (S[g+w]-S[g])·POW[g+w-1]: one set of global
        # tables serves every document, identical values to the per-doc
        # formulation (differential-tested).
        texts = t[text_col].combine_chunks().fill_null("").to_pylist()
        n_docs = len(texts)
        full = np.zeros(n_docs, dtype=np.uint64)
        minw = np.zeros(n_docs, dtype=np.uint64)
        if n_docs:
            joined = "".join(texts)
            cps = np.frombuffer(
                joined.encode("utf-32-le"), dtype=np.uint32
            ).astype(np.uint64)
            lens = np.fromiter(map(len, texts), dtype=np.int64, count=n_docs)
            N = len(cps)
            if N:
                ends = np.cumsum(lens)
                starts = ends - lens
                POW = np.ones(N, dtype=np.uint64)
                PINV = np.ones(N, dtype=np.uint64)
                if N > 1:
                    np.multiply.accumulate(
                        np.full(N - 1, _RK_BASE, dtype=np.uint64), out=POW[1:]
                    )
                    np.multiply.accumulate(
                        np.full(N - 1, binv, dtype=np.uint64), out=PINV[1:]
                    )
                S = np.empty(N + 1, dtype=np.uint64)
                S[0] = 0
                np.cumsum(cps * PINV, out=S[1:])
                ne = lens > 0
                full[ne] = (S[ends[ne]] - S[starts[ne]]) * POW[ends[ne] - 1]
                minw = full.copy()
                el = lens >= window
                if el.any():
                    wc = (lens[el] - window + 1).astype(np.int64)
                    woff = np.concatenate([[0], np.cumsum(wc)[:-1]])
                    pos = (
                        np.arange(int(wc.sum()), dtype=np.int64)
                        - np.repeat(woff, wc)
                        + np.repeat(starts[el], wc)
                    )
                    wins = (S[pos + window] - S[pos]) * POW[pos + window - 1]
                    minw[el] = np.minimum.reduceat(wins, woff)
        return pa.table(
            {
                id_col: t[id_col],
                "fp_full": pa.array(full.astype(np.int64)),
                "fp_min_window": pa.array(minw.astype(np.int64)),
            }
        )

    return ds.map_batches(fp, batch_format="pyarrow")


# Default content-filter patterns: the PII-ish block-list a curation
# pipeline screens for.  RE2 syntax, ASCII-scoped, so pyarrow's
# count_substring_regex and DuckDB's regexp_extract_all (both RE2) count
# the same non-overlapping matches.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "long_digits": r"[0-9]{6,}",
    "url": r"https?://[^\s]+",
}


def content_flags(ds, patterns=None, text_col="text", id_col="doc_id"):
    """Rule-based content screening: per-document NON-OVERLAPPING match
    counts for a named regex block-list (PII, URLs, boilerplate markers),
    plus a ``flagged`` disjunction — the regex pre-filter stage of a
    curation pipeline.

    One vectorized ``map_batches`` pass, no shuffle: each pattern is one
    RE2 ``count_substring_regex`` kernel over the Arrow string column.
    Counts use RE2 leftmost, non-overlapping semantics in both pyarrow and
    DuckDB, so an oracle of ``len(regexp_extract_all(text, pat))`` matches
    exactly."""
    pats = dict(patterns) if patterns is not None else dict(PII_PATTERNS)

    def scan(t: pa.Table) -> pa.Table:
        cols: dict = {id_col: t[id_col]}
        flagged = None
        for name, pat in pats.items():
            c = pc.count_substring_regex(t[text_col], pattern=pat).cast(pa.int64())
            cols[f"n_{name}"] = c
            hit = pc.greater(c, 0)
            flagged = hit if flagged is None else pc.or_(flagged, hit)
        cols["flagged"] = flagged
        return pa.table(cols)

    return ds.map_batches(scan, batch_format="pyarrow", zero_copy_batch=True)


_SCH_REP = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("n_tokens", pa.int64()),
        ("top_token_frac", pa.float64()),
        ("dup_ngram_frac", pa.float64()),
    ]
)

_REP_SEG_MIX = np.uint64(0x9E3779B97F4A7C15)


def repetition_scores(ds, n: int = 3, text_col="text", id_col="doc_id"):
    """Intra-document repetition signals (the Gopher/MassiveText repetition
    filters): per doc, the fraction of tokens taken by the single most
    frequent token and the fraction of duplicate word-``n``-grams
    (``1 − distinct/total``).  Repetitive machine-generated text scores
    high on both; the downstream quality gate thresholds them.

    One vectorized ``map_batches`` pass over the byte-buffer token kernel
    (stages/tokhash.py) — token/ngram multiplicities are counted entirely
    in 64-bit hash space (no token strings), grouped with argsort +
    ``reduceat``.  No shuffle; collisions are as unlikely as in the
    shingle operators the engine already trusts.  Docs with fewer than
    ``n`` tokens hash their whole token run (one n-gram, dup fraction 0),
    matching the shingle convention in stages/dedup.py."""
    from .bucketing import group_bounds
    from .dedup import _batch_shingles
    from .tokhash import batch_token_hashes, wraparound_ok

    @wraparound_ok
    def score(t: pa.Table) -> pa.Table:
        n_docs = t.num_rows
        th, sg, ntok = batch_token_hashes(t[text_col])
        top = np.zeros(n_docs, dtype=np.float64)
        if len(th):
            # (doc, token) multiplicities: one argsort of the seg-mixed key
            key = th ^ (sg.astype(np.uint64) * _REP_SEG_MIX)
            order = np.argsort(key)
            starts, ends = group_bounds(key[order])
            cnt = (ends - starts).astype(np.int64)
            gdoc = sg[order[starts]]
            dorder = np.argsort(gdoc, kind="stable")
            gdoc_s, cnt_s = gdoc[dorder], cnt[dorder]
            dstarts, _ = group_bounds(gdoc_s)
            present = gdoc_s[dstarts]
            top[present] = np.maximum.reduceat(cnt_s, dstarts) / ntok[present]
        # distinct n-grams from the deduped shingle kernel; totals are
        # arithmetic (len-n+1, with the short-doc whole-run fallback)
        _hh, ss = _batch_shingles(t[text_col], n)
        distinct = np.bincount(ss, minlength=n_docs).astype(np.int64)
        total = np.where(ntok >= n, ntok - n + 1, np.where(ntok > 0, 1, 0))
        dup = np.zeros(n_docs, dtype=np.float64)
        nz = total > 0
        dup[nz] = 1.0 - distinct[nz] / total[nz]
        return pa.table(
            {
                id_col: t[id_col],
                "n_tokens": pa.array(ntok),
                "top_token_frac": pa.array(np.round(top, 6)),
                "dup_ngram_frac": pa.array(np.round(dup, 6)),
            },
            schema=pa.schema(
                [
                    (id_col, t.schema.field(id_col).type),
                    ("n_tokens", pa.int64()),
                    ("top_token_frac", pa.float64()),
                    ("dup_ngram_frac", pa.float64()),
                ]
            ),
        )

    return ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


_SCH_METRICS = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("n_chars", pa.int64()),
        ("n_tokens", pa.int64()),
        ("n_subtokens", pa.int64()),
        ("stop_ratio", pa.float64()),
        ("mean_token_len", pa.float64()),
        ("lang_pred", pa.string()),
        ("top_token_frac", pa.float64()),
        ("dup_ngram_frac", pa.float64()),
    ]
)


def text_metrics(ds, n: int = 3, stopwords=STOPWORDS, markers=None, text_col="text", id_col="doc_id"):
    """All per-document text-analysis signals in ONE scan: token/char/
    subtoken counts, stopword ratio, mean token length, language id,
    top-token fraction and duplicate-``n``-gram fraction.

    Semantics are column-for-column identical to running
    :func:`token_stats` + :func:`quality_scores` + :func:`lang_id` +
    :func:`repetition_scores` separately (differential-tested) — but the
    corpus is read once and tokenized once instead of four times, which
    is what a real curation pipeline wants at 100 TB.  Single
    ``map_batches`` pass over the byte-buffer token kernel, no shuffle."""
    from .bucketing import group_bounds
    from .dedup import _batch_shingles
    from .tokhash import batch_token_hashes, hash_words, wraparound_ok

    stop_h = np.sort(hash_words(sorted(set(stopwords))))
    markers = markers or LANG_MARKERS
    langs = sorted(markers)
    marker_h = {lang: np.sort(hash_words(sorted(set(markers[lang])))) for lang in langs}
    lang_arr = np.asarray(langs, dtype=object)

    @wraparound_ok
    def metrics(t: pa.Table) -> pa.Table:
        n_docs = t.num_rows
        th, sg, ntok, lens = batch_token_hashes(t[text_col], include_lens=True)
        denom = np.maximum(ntok, 1).astype(np.float64)
        has = ntok > 0
        # quality: stopword ratio + mean token byte length
        sum_stop = np.bincount(sg, weights=np.isin(th, stop_h), minlength=n_docs)
        sum_len = np.bincount(sg, weights=lens.astype(np.float64), minlength=n_docs)
        # lang id: marker-hit argmax, alphabetical tie-break
        scores = np.zeros((n_docs, len(langs)), dtype=np.int64)
        for j, lang in enumerate(langs):
            scores[:, j] = np.bincount(
                sg, weights=np.isin(th, marker_h[lang]), minlength=n_docs
            )
        best = np.argmax(scores, axis=1)
        top_score = scores[np.arange(n_docs), best]
        lang_pred = np.where(top_score > 0, lang_arr[best], "und")
        # repetition: top-token fraction via (doc, token) multiplicities
        top = np.zeros(n_docs, dtype=np.float64)
        if len(th):
            key = th ^ (sg.astype(np.uint64) * _REP_SEG_MIX)
            order = np.argsort(key)
            starts, ends = group_bounds(key[order])
            cnt = (ends - starts).astype(np.int64)
            gdoc = sg[order[starts]]
            dorder = np.argsort(gdoc, kind="stable")
            gdoc_s, cnt_s = gdoc[dorder], cnt[dorder]
            dstarts, _ = group_bounds(gdoc_s)
            present = gdoc_s[dstarts]
            top[present] = np.maximum.reduceat(cnt_s, dstarts) / ntok[present]
        # repetition: duplicate n-gram fraction from the deduped shingles
        _hh, ss = _batch_shingles(t[text_col], n)
        distinct = np.bincount(ss, minlength=n_docs).astype(np.int64)
        total = np.where(ntok >= n, ntok - n + 1, np.where(ntok > 0, 1, 0))
        dup = np.zeros(n_docs, dtype=np.float64)
        nz = total > 0
        dup[nz] = 1.0 - distinct[nz] / total[nz]
        return pa.table(
            {
                id_col: t[id_col].cast(pa.int64()),
                "n_chars": pc.utf8_length(t[text_col]).cast(pa.int64()),
                "n_tokens": pa.array(ntok),
                "n_subtokens": pc.count_substring_regex(
                    t[text_col], pattern=BPE_SPLIT_RE
                ).cast(pa.int64()),
                "stop_ratio": pa.array(np.round(np.where(has, sum_stop / denom, 0.0), 6)),
                "mean_token_len": pa.array(np.round(np.where(has, sum_len / denom, 0.0), 6)),
                "lang_pred": pa.array(lang_pred.astype(object), pa.string()),
                "top_token_frac": pa.array(np.round(top, 6)),
                "dup_ngram_frac": pa.array(np.round(dup, 6)),
            },
            schema=_SCH_METRICS,
        )

    return ds.map_batches(metrics, batch_format="pyarrow", zero_copy_batch=True)


def redact(ds, patterns=None, replacement="[PII]", text_col="text", id_col="doc_id"):
    """PII/block-list redaction: replace every match of each pattern with
    ``replacement`` — the transform counterpart of :func:`content_flags`
    (screening flags, this rewrites).  Patterns apply in dict order, each
    over the previous pattern's output, matching a nested SQL
    ``regexp_replace(..., 'g')`` chain exactly (both sides are RE2 with
    leftmost non-overlapping semantics).

    One vectorized ``map_batches`` pass, no shuffle: each pattern is one
    ``replace_substring_regex`` kernel over the Arrow string column.  The
    text column is rewritten IN PLACE — every other column of the input
    passes through untouched (an in-pipeline transform must not project
    away its neighbors)."""
    pats = dict(patterns) if patterns is not None else dict(PII_PATTERNS)

    def rewrite(t: pa.Table) -> pa.Table:
        col = t[text_col]
        for pat in pats.values():
            col = pc.replace_substring_regex(
                col, pattern=pat, replacement=replacement
            )
        i = t.schema.get_field_index(text_col)
        return t.set_column(i, text_col, col)

    return ds.map_batches(rewrite, batch_format="pyarrow", zero_copy_batch=True)
