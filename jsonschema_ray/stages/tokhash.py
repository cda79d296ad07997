"""Vectorized byte-level tokenizer + token hashing — THE text kernel.

Replaces the per-row Python tokenize loops that fed the engine's slowest
stages (shingles, simhash, quality scores, lang-id: VERDICT r2 item 2).
Everything operates directly on the Arrow string column's UTF-8 data
buffer — zero-copy, no per-document Python, no token string objects:

* tokens are maximal runs of non-whitespace BYTES, whitespace being the
  RE2 ``\\s`` class ``[\\t\\n\\f\\r ]`` — ASCII bytes never occur inside
  multi-byte UTF-8 sequences, so byte-level splitting is codepoint-safe;
* token hashes are a base-``B`` polynomial over the token's bytes
  (mod 2^64) finished with the splitmix64 mixer.  Computed with a
  position-loop over length-sorted tokens: pass ``j`` extends every token
  longer than ``j`` by one byte, so total work is O(total bytes) with
  O(max token length) numpy passes and no per-token Python.

The hash is deliberately SQL-replicable (DuckDB HUGEINT arithmetic mod
2^64 + ``unicode(tok[i])`` per char — identical to the byte value for
ASCII corpora), so simhash/shingle queries can carry full value-checking
DuckDB oracles; see :data:`TOKHASH_SQL_MACROS`.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = [
    "batch_token_hashes",
    "hash_words",
    "hash_strings",
    "spans_to_strings",
    "mix64",
    "wraparound_ok",
    "TOKHASH_SQL_MACROS",
    "POLY_B",
]


def wraparound_ok(fn):
    """Run ``fn`` with numpy overflow warnings suppressed — uint64
    wraparound IS the mod-2^64 hash arithmetic throughout this package.
    Scoped via ``np.errstate`` (saved/restored around the call) so the
    process-global numpy error state is never mutated and genuine
    overflow warnings in unrelated code stay visible."""
    import functools

    @functools.wraps(fn)
    def inner(*args, **kwargs):
        with np.errstate(over="ignore"):
            return fn(*args, **kwargs)

    return inner

POLY_B = np.uint64(1099511628211)  # odd → invertible mod 2^64
_MIX1 = np.uint64(0xBF58476D1CE4E5B9)
_MIX2 = np.uint64(0x94D049BB133111EB)

# RE2 \s (Go regexp, reference's pattern engine): tab, newline, formfeed,
# carriage return, space.  DuckDB regexps are RE2 too, so '\S+' means the
# same token class on both sides.
_WS_BYTES = (9, 10, 12, 13, 32)


def mix64(h: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer (uint64 wraparound), vectorized."""
    h = h.astype(np.uint64, copy=True)
    h ^= h >> np.uint64(30)
    h *= _MIX1
    h ^= h >> np.uint64(27)
    h *= _MIX2
    h ^= h >> np.uint64(31)
    return h


def _poly_hash_spans(data: np.ndarray, starts: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Polynomial hash of each (start, len) span of ``data`` — length-
    sorted position loop, O(total bytes) work, no per-span Python."""
    n = len(starts)
    if n == 0:
        return np.empty(0, np.uint64)
    order = np.argsort(-lens, kind="stable")
    s_starts = starts[order]
    s_lens = lens[order]
    h = np.zeros(n, dtype=np.uint64)
    max_len = int(s_lens[0])
    # number of spans still active at offset j: s_lens sorted descending
    actives = np.searchsorted(-s_lens, -np.arange(1, max_len + 1), side="right")
    for j in range(max_len):
        m = actives[j]
        if m == 0:
            break
        hj = h[:m]
        hj *= POLY_B
        hj += data[s_starts[:m] + j].astype(np.uint64)
    out = np.empty(n, dtype=np.uint64)
    out[order] = h
    return mix64(out)


def _string_bytes_view(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(byte buffer view, per-row [start, end) offsets) for an Arrow
    string array — zero-copy from the Arrow buffers."""
    if pa.types.is_large_string(arr.type):
        off_dtype = np.int64
    else:
        off_dtype = np.int32
    bufs = arr.buffers()
    offsets = np.frombuffer(bufs[1], dtype=off_dtype, count=len(arr) + 1, offset=arr.offset * np.dtype(off_dtype).itemsize).astype(np.int64)
    data = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None else np.empty(0, np.uint8)
    return data, offsets


def batch_token_hashes(col, include_lens: bool = False, include_spans: bool = False):
    """→ (tok_hash uint64[n_tok], tok_doc int64[n_tok], n_tokens int64[n_docs]
    [, tok_len int64[n_tok]][, (starts int64[n_tok], bytes uint8[])]) for
    an Arrow string column/array.

    Null rows count as empty.  ``tok_doc`` is segment-sorted (all of doc
    i's tokens contiguous, in document order).  ``include_spans`` also
    returns each token's byte span so a caller can reconstruct the few
    token STRINGS it actually needs (e.g. top-k output rows) without any
    per-row Python."""
    if isinstance(col, pa.ChunkedArray):
        arr = col.combine_chunks()
    else:
        arr = col
    n_docs = len(arr)
    if arr.null_count:
        arr = arr.fill_null("")
    data, offsets = _string_bytes_view(arr)
    total = int(offsets[-1] - offsets[0])
    if total == 0:
        out = [np.empty(0, np.uint64), np.empty(0, np.int64), np.zeros(n_docs, np.int64)]
        if include_lens:
            out.append(np.empty(0, np.int64))
        if include_spans:
            out.append((np.empty(0, np.int64), np.empty(0, np.uint8)))
        return tuple(out)

    base = offsets[0]
    b = data[base : offsets[-1]]
    nonws = np.ones(len(b), dtype=bool)
    for w in _WS_BYTES:
        nonws &= b != w

    # a token starts at a non-ws byte preceded by ws / buffer start / a
    # document boundary (documents are contiguous — no separator bytes)
    prev_ws = np.empty(len(b), dtype=bool)
    prev_ws[0] = True
    np.logical_not(nonws[:-1], out=prev_ws[1:])
    doc_starts = (offsets[:-1] - base)[: n_docs]
    is_doc_start = np.zeros(len(b) + 1, dtype=bool)
    is_doc_start[doc_starts] = True
    tok_start_mask = nonws & (prev_ws | is_doc_start[: len(b)])
    starts = np.flatnonzero(tok_start_mask).astype(np.int64)
    if len(starts) == 0:
        out = [np.empty(0, np.uint64), np.empty(0, np.int64), np.zeros(n_docs, np.int64)]
        if include_lens:
            out.append(np.empty(0, np.int64))
        if include_spans:
            out.append((np.empty(0, np.int64), b))
        return tuple(out)

    # token ends: next ws byte or document boundary at/after the start
    breaks = np.flatnonzero(~nonws | is_doc_start[: len(b)])
    breaks = np.concatenate([breaks, [len(b)]])
    ends = breaks[np.searchsorted(breaks, starts, side="right")]
    lens = ends - starts

    tok_doc = np.searchsorted(offsets[1:] - base, starts, side="right").astype(np.int64)
    n_tokens = np.bincount(tok_doc, minlength=n_docs).astype(np.int64)
    hashes = _poly_hash_spans(b, starts, lens)
    out = [hashes, tok_doc, n_tokens]
    if include_lens:
        out.append(lens)
    if include_spans:
        out.append((starts, b))
    return tuple(out)


def _poly_hash_spans_blocked(
    data: np.ndarray, starts: np.ndarray, lens: np.ndarray, stride: int = 64
) -> np.ndarray:
    """Polynomial span hash for LONG spans (whole documents): folds
    ``stride`` bytes per numpy pass — one 2-D gather + one wrapped
    multiply-sum — so a span of L bytes costs O(L/stride) passes instead
    of the per-byte loop's O(L).  Byte-identical to
    :func:`_poly_hash_spans` (same polynomial, same mixer)."""
    n = len(starts)
    if n == 0:
        return np.empty(0, np.uint64)
    order = np.argsort(-lens, kind="stable")
    s_starts = starts[order].astype(np.int64)
    s_lens = lens[order].astype(np.int64)
    h = np.zeros(n, dtype=np.uint64)

    pows = np.ones(stride, dtype=np.uint64)
    for k in range(1, stride):
        pows[k] = pows[k - 1] * POLY_B
    pow_rev = pows[::-1].copy()  # B^(stride-1) … B^0
    BS = pows[-1] * POLY_B  # B^stride

    nfull = s_lens // stride  # sorted descending (lens are)
    max_blocks = int(nfull[0])
    offs = np.arange(stride, dtype=np.int64)
    for k in range(max_blocks):
        m = int(np.searchsorted(-nfull, -(k + 1), side="right"))
        if m == 0:
            break
        mat = data[s_starts[:m, None] + (k * stride + offs)[None, :]].astype(
            np.uint64
        )
        h[:m] = h[:m] * BS + (mat * pow_rev[None, :]).sum(axis=1, dtype=np.uint64)

    # tail bytes (< stride per span): per-byte loop, re-sorted by tail len
    r = s_lens - nfull * stride
    t_order = np.argsort(-r, kind="stable")
    r_s = r[t_order]
    if len(r_s) and r_s[0] > 0:
        t_starts = (s_starts + nfull * stride)[t_order]
        ht = h[t_order]
        for j in range(int(r_s[0])):
            m = int(np.searchsorted(-r_s, -(j + 1), side="right"))
            if m == 0:
                break
            ht[:m] = ht[:m] * POLY_B + data[t_starts[:m] + j].astype(np.uint64)
        h[t_order] = ht

    out = np.empty(n, dtype=np.uint64)
    out[order] = h
    return mix64(out)


@wraparound_ok
def hash_strings(col) -> np.ndarray:
    """→ uint64[n]: content hash of each row's FULL string bytes, straight
    off the Arrow data buffer (each row is one span for the polynomial
    span kernel — the whole-string analogue of token hashing).  No Python
    string ever materializes; nulls hash as empty.  Used by exact dedup
    and the streaming index, where the hash only needs to be
    deterministic, not SQL-replicable (their oracles group by the text
    itself)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if arr.null_count:
        arr = arr.fill_null("")
    data, offsets = _string_bytes_view(arr)
    return _poly_hash_spans_blocked(data, offsets[:-1], np.diff(offsets))


@wraparound_ok
def hash_words(words) -> np.ndarray:
    """Token hashes of a small Python word list (stopword / marker sets)
    — byte-identical to :func:`batch_token_hashes` on the same words."""
    out = np.empty(len(words), dtype=np.uint64)
    for i, w in enumerate(words):
        h = np.uint64(0)
        for byte in w.encode("utf-8"):
            h = h * POLY_B + np.uint64(byte)
        out[i] = h
    return mix64(out)


# DuckDB macros computing the SAME token hash (HUGEINT arithmetic mod
# 2^64; ``unicode(tok[i])`` == byte value for ASCII text).  Prepend to any
# oracle SQL that recomputes engine token hashes.
TOKHASH_SQL_MACROS = """
CREATE OR REPLACE MACRO u64(x) AS ((x % 18446744073709551616) + 18446744073709551616) % 18446744073709551616;
CREATE OR REPLACE MACRO mulmod(a, b) AS u64(u64(CAST(a AS HUGEINT) * (CAST(b AS HUGEINT) >> 32)) * 4294967296 + CAST(a AS HUGEINT) * (CAST(b AS HUGEINT) % 4294967296));
CREATE OR REPLACE MACRO mixa(h) AS mulmod(xor(CAST(h AS HUGEINT), CAST(h AS HUGEINT) >> 30), 13787848793156543929);
CREATE OR REPLACE MACRO mixb(h) AS mulmod(xor(CAST(h AS HUGEINT), CAST(h AS HUGEINT) >> 27), 10723151780598845931);
CREATE OR REPLACE MACRO mix64(h) AS xor(mixb(mixa(h)), mixb(mixa(h)) >> 31);
CREATE OR REPLACE MACRO tokpoly(tok) AS list_reduce(
    list_transform(range(1, length(tok) + 1), i -> CAST(unicode(tok[i]) AS HUGEINT)),
    (a, b) -> u64(a * 1099511628211 + b));
CREATE OR REPLACE MACRO tokhash(tok) AS mix64(tokpoly(tok));
"""


def spans_to_strings(buf: np.ndarray, starts: np.ndarray, lens: np.ndarray) -> pa.Array:
    """Arrow string array built from (start, len) byte spans of ``buf`` —
    one vectorized gather (repeat + arange), no per-span Python.  The
    counterpart of ``include_spans``: callers keep hashes for the hot
    path and materialize only the few strings they actually output."""
    n = len(starts)
    if n == 0:
        return pa.array([], pa.string())
    lens = lens.astype(np.int64)
    total = int(lens.sum())
    off64 = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=off64[1:])
    if total == 0:
        data = np.empty(0, np.uint8)
    else:
        reps = np.repeat(starts.astype(np.int64), lens)
        intra = np.arange(total, dtype=np.int64) - np.repeat(off64[:-1], lens)
        data = buf[reps + intra]
    if total > np.iinfo(np.int32).max:
        # string offsets are int32 — past 2 GiB of span bytes an int32
        # cumsum would silently wrap into negative offsets (corrupt
        # array); emit a large_string (int64 offsets) instead
        return pa.LargeStringArray.from_buffers(
            n, pa.py_buffer(off64.tobytes()), pa.py_buffer(data.tobytes())
        )
    return pa.StringArray.from_buffers(
        n,
        pa.py_buffer(off64.astype(np.int32).tobytes()),
        pa.py_buffer(data.tobytes()),
    )
