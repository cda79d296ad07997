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

__all__ = ["token_stats", "quality_scores", "LangId", "lang_id", "fingerprints", "STOPWORDS"]

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
    stop = set(stopwords)

    def score(t: pa.Table) -> pa.Table:
        ids = t[id_col]
        texts = t[text_col].to_pylist()
        n_tok = np.zeros(len(texts), dtype=np.int64)
        stop_ratio = np.zeros(len(texts))
        mean_len = np.zeros(len(texts))
        for i, s in enumerate(texts):
            toks = (s or "").split()
            n_tok[i] = len(toks)
            if toks:
                stop_ratio[i] = sum(w in stop for w in toks) / len(toks)
                mean_len[i] = sum(len(w) for w in toks) / len(toks)
        return pa.table(
            {
                id_col: ids,
                "n_tokens": pa.array(n_tok),
                "stop_ratio": pa.array(np.round(stop_ratio, 6)),
                "mean_token_len": pa.array(np.round(mean_len, 6)),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


class LangId:
    """Marker-word language ID; tables compiled once per actor."""

    def __init__(self, text_col="text", id_col="doc_id", markers=None) -> None:
        self.text_col, self.id_col = text_col, id_col
        self.markers = {
            lang: frozenset(words) for lang, words in (markers or LANG_MARKERS).items()
        }
        self.langs = sorted(self.markers)

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = t[self.text_col].to_pylist()
        out = []
        for s in texts:
            toks = (s or "").split()
            scores = {
                lang: sum(w in words for w in toks)
                for lang, words in self.markers.items()
            }
            # deterministic argmax: highest score, alphabetical tie-break
            best = max(self.langs, key=lambda lg: (scores[lg], ), default="und")
            best = sorted(self.langs, key=lambda lg: (-scores[lg], lg))[0]
            out.append(best if scores[best] > 0 else "und")
        return pa.table(
            {
                self.id_col: t[self.id_col],
                "lang_pred": pa.array(out, pa.string()),
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

    def fp(t: pa.Table) -> pa.Table:
        np.seterr(over="ignore")  # uint64 wraparound IS the mod-2^64 hash
        texts = t[text_col].to_pylist()
        full = np.zeros(len(texts), dtype=np.uint64)
        minw = np.zeros(len(texts), dtype=np.uint64)
        for i, s in enumerate(texts):
            cps = np.frombuffer((s or "").encode("utf-32-le"), dtype=np.uint32).astype(
                np.uint64
            )
            if len(cps) == 0:
                continue
            h = np.uint64(0)
            # full-document Rabin–Karp (mod 2^64 by overflow)
            powers = np.ones(len(cps), dtype=np.uint64)
            np.multiply.accumulate(
                np.full(len(cps) - 1, _RK_BASE, dtype=np.uint64),
                out=powers[1:],
            ) if len(cps) > 1 else None
            full[i] = np.sum(cps[::-1] * powers, dtype=np.uint64)
            if len(cps) >= window:
                # window hashes via prefix trick
                w_hashes = np.zeros(len(cps) - window + 1, dtype=np.uint64)
                cur = np.uint64(0)
                top = powers[window - 1]
                for j in range(window):
                    cur = cur * _RK_BASE + cps[j]
                w_hashes[0] = cur
                for j in range(1, len(w_hashes)):
                    cur = (cur - cps[j - 1] * top) * _RK_BASE + cps[j + window - 1]
                    w_hashes[j] = cur
                minw[i] = w_hashes.min()
            else:
                minw[i] = full[i]
        return pa.table(
            {
                id_col: t[id_col],
                "fp_full": pa.array(full.astype(np.int64)),
                "fp_min_window": pa.array(minw.astype(np.int64)),
            }
        )

    return ds.map_batches(fp, batch_format="pyarrow")
