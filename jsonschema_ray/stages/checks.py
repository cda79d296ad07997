"""Table-level checks: uniqueness, referential, ordering (SURVEY.md §2.5).

These generalize reference keywords beyond a single document:

* **key uniqueness** — ``uniqueItems``'s exact semantics
  (validate.go:294-370) lifted to ``(conv_id, turn_idx)`` across the whole
  table via a hash-partitioned ``groupby``.  Only the key columns are
  shuffled (projection before the groupby), so at 100 TB the exchange moves
  ~2% of the bytes.  The composite key already spreads long-conversation
  skew; the groupby hashes both columns.
* **referential** — the ``dependencies`` idea (validate.go:415-447) made
  value-conditional: ``role == "tool"`` ⇔ ``tool`` set.  Pure vectorized
  ``map_batches``; no shuffle.
* **contiguity / ts order** — per-conversation invariants: ``turn_idx`` is
  0..n-1 and ``ts`` is non-decreasing across turns.  Two strategies:
  ``conv_checks_violations`` hash-buckets whole conversations (skew bounded
  by the longest conversation); ``conv_checks_salted`` implements the
  north-star's salted repartition — the shuffle key is
  ``(conv_id, turn_idx // R)`` so no group exceeds R rows even for a
  degenerate 10^10-turn conversation, and ranges are stitched with tiny
  per-range summaries (min/max turn, min/max ts) plus a sparse second scan
  for cross-range ts violations.  Both produce identical violation
  multisets (tested at range_size=4).

All emit the violation-row schema (conv_id, turn_idx, keyword, message)
(FIXTURES.md §4) so they union with the row-level stage.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..core.jsontypes import go_quote
from .bucketing import from_pandas_clean

__all__ = [
    "duplicate_key_violations",
    "referential_violations",
    "contiguity_violations",
    "ts_order_violations",
    "conv_checks_violations",
    "conv_checks_salted",
    "conv_checks_auto",
    "max_conversation_size",
    "EMPTY_VIOLATIONS",
]

VIOLATION_PA_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("keyword", pa.string()),
        ("message", pa.string()),
    ]
)

EMPTY_VIOLATIONS = pa.Table.from_pylist([], schema=VIOLATION_PA_SCHEMA)

# conv_checks_salted: max (conv, range) summary rows stitched on the driver
# (~100 MB); above this the stitch runs as a conv-keyed distributed
# exchange.  Module-level so tests can force the distributed branch.
DRIVER_STITCH_MAX_PARTIALS = 2_000_000


def _drop_null_keyed(t: pa.Table, cols=("conv_id", "turn_idx")) -> pa.Table:
    """Rows with a null key column are 'required' ROW violations upstream —
    every conversation-level check excludes them (the shared contract of
    _run_bucket/_run_bucket_table; applied here for the standalone and
    salted entry points so all paths agree on null-keyed inputs)."""
    keep = None
    for c in cols:
        v = pc.is_valid(t[c])
        keep = v if keep is None else pc.and_(keep, v)
    if keep is None or pc.all(keep).as_py():
        return t
    return t.filter(keep)


def duplicate_key_violations(ds, keys=("conv_id", "turn_idx")):
    """One violation row per duplicated key, with its multiplicity.
    Null-keyed rows are excluded (same contract as conv_checks_*)."""
    keys = list(keys)

    def emit(batch: pa.Table) -> pa.Table:
        dup = batch.filter(pc.greater(batch["count()"], 1))
        n = dup.num_rows
        counts = dup["count()"].to_pylist()
        return pa.table(
            {
                "conv_id": dup["conv_id"].cast(pa.string()),
                "turn_idx": dup["turn_idx"].cast(pa.int32()),
                "keyword": pa.array(["uniqueItems"] * n, pa.string()),
                "message": pa.array(
                    [f"(conv_id, turn_idx) appears {c} times" for c in counts],
                    pa.string(),
                ),
            }
        )

    return (
        ds.select_columns(keys)  # shuffle only the key bytes
        .map_batches(
            lambda t: _drop_null_keyed(t, keys), batch_format="pyarrow"
        )
        .groupby(keys)
        .count()
        .map_batches(emit, batch_format="pyarrow")
    )


def referential_violations(ds, role_col="role", tool_col="tool"):
    def emit(batch: pa.Table) -> pa.Table:
        return referential_batch(batch, role_col, tool_col)

    return ds.map_batches(emit, batch_format="pyarrow")


def referential_batch(batch: pa.Table, role_col="role", tool_col="tool") -> pa.Table:
    role = batch[role_col]
    is_tool_role = pc.equal(role, "tool")
    tool_set = pc.is_valid(batch[tool_col])
    missing = pc.and_kleene(is_tool_role, pc.invert(tool_set))
    missing = pc.fill_null(missing, False).combine_chunks().to_numpy(
        zero_copy_only=False
    )
    spurious = pc.and_kleene(pc.fill_null(pc.invert(is_tool_role), True), tool_set)
    spurious = pc.fill_null(spurious, False).combine_chunks().to_numpy(
        zero_copy_only=False
    )
    idx = np.concatenate([np.flatnonzero(missing), np.flatnonzero(spurious)])
    msgs = ['tool must be set when role is "tool"'] * int(missing.sum())
    roles = batch[role_col].take(pa.array(np.flatnonzero(spurious))).to_pylist()
    msgs += [
        f"tool must be null when role is {go_quote(r) if r is not None else 'null'}"
        for r in roles
    ]
    order = np.argsort(idx, kind="stable")
    take = pa.array(idx[order], type=pa.int64())
    return pa.table(
        {
            "conv_id": batch["conv_id"].take(take),
            "turn_idx": batch["turn_idx"].take(take),
            "keyword": pa.array(["referential"] * len(idx), pa.string()),
            "message": pa.array([msgs[i] for i in order], pa.string()),
        }
    )


def _violations_table(sub: pd.DataFrame, keyword: str, messages) -> pa.Table:
    return pa.table(
        {
            "conv_id": pa.array(sub["conv_id"].astype(str), pa.string()),
            "turn_idx": pa.array(sub["turn_idx"].to_numpy(), pa.int32()),
            "keyword": pa.array([keyword] * len(sub), pa.string()),
            "message": pa.array(messages, pa.string()),
        }
    )


# ---------------------------------------------------------------------------
# Conversation-level checks, hash-bucketed and vectorized.
#
# groupby(conv_id).map_groups costs one Python call + one pandas frame per
# conversation — at 10^12 turns that is ~10^11 UDF calls.  Instead we bucket
# conversations by hash(conv_id) % P (P sized so one bucket's key columns fit
# a worker's heap), shuffle ONCE on the bucket id, and run every check
# vectorized across all conversations in the bucket with pandas groupby
# kernels.  Same co-location guarantee (a conversation never straddles
# buckets), P UDF calls total instead of one per conversation.


def _dups_in_bucket(df: pd.DataFrame) -> pa.Table:
    """uniqueItems (validate.go:359-370 lifted to the table key): one
    violation per duplicated (conv_id, turn_idx) with its multiplicity."""
    sizes = df.groupby(["conv_id", "turn_idx"], sort=False).size()
    dup = sizes[sizes > 1]
    if len(dup) == 0:
        return EMPTY_VIOLATIONS
    dd = dup.rename("c").reset_index().sort_values(["conv_id", "turn_idx"])
    msgs = [f"(conv_id, turn_idx) appears {int(c)} times" for c in dd["c"]]
    return _violations_table(dd, "uniqueItems", msgs)


def _contiguity_in_bucket(df: pd.DataFrame) -> pa.Table:
    """Gap detection: per conversation, sorted turn_idx must start at 0 and
    each turn must follow its predecessor by exactly 1 (equal = duplicate,
    flagged by the uniqueness check, not here).  df must be sorted by
    (conv_id, turn_idx)."""
    conv = df["conv_id"].to_numpy()
    got = df["turn_idx"].to_numpy()
    n = len(got)
    if n == 0:
        return EMPTY_VIOLATIONS
    first = np.ones(n, dtype=bool)
    first[1:] = conv[1:] != conv[:-1]
    prv = np.empty_like(got)
    prv[0] = 0
    prv[1:] = got[:-1]
    bad_first = first & (got != 0)
    bad_follow = (~first) & (got != prv + 1) & (got != prv)
    bad = bad_first | bad_follow
    if not bad.any():
        return EMPTY_VIOLATIONS
    pos = np.flatnonzero(bad)
    msgs = [
        f"turn_idx {got[p]} at conversation start: expected 0"
        if first[p]
        else f"turn_idx {got[p]} does not follow {prv[p]}"
        for p in pos
    ]
    return _violations_table(df.iloc[pos], "contiguity", msgs)


def _ts_order_in_bucket(df: pd.DataFrame) -> pa.Table:
    """Per conversation: ts must be non-decreasing across turn_idx — a row
    violates if its ts precedes the max ts of any strictly smaller turn_idx.
    df must be sorted by (conv_id, turn_idx).

    The ffill carries the running max PAST an all-NaT turn group (pandas
    cummax reports NaN at NaN positions), matching the SQL window oracle:
    ``MAX(ts) OVER (... 1 PRECEDING)`` skips NULLs, so the group after an
    all-NaT group is checked against the prior real max, not exempted."""
    per_turn_max = df.groupby(["conv_id", "turn_idx"], sort=False)["ts"].max()
    bound = (
        per_turn_max.groupby(level="conv_id")
        .cummax()
        .groupby(level="conv_id")
        .ffill()
        .groupby(level="conv_id")
        .shift(1)
    ).rename("_bound").reset_index()
    m = df.merge(bound, on=["conv_id", "turn_idx"], how="left", sort=False)
    bad = (m["ts"] < m["_bound"]).to_numpy()
    if not bad.any():
        return EMPTY_VIOLATIONS
    return _violations_table(
        m.loc[bad], "order", ["ts decreases within conversation"] * int(bad.sum())
    )


def _run_bucket(df: pd.DataFrame, which: tuple[str, ...]) -> pa.Table:
    # Rows with null conv_id/turn_idx are 'required' ROW violations — the
    # conversation checks exclude them (same contract as the Arrow twin
    # _run_bucket_table; without this, the contiguity kernel would emit
    # rows with conv_id stringified to 'None').
    keyed = df["conv_id"].notna() & df["turn_idx"].notna()
    if not keyed.all():
        # nullable ints float-promote through pandas; restore integer
        # turn_idx after the filter so messages render "14", not "14.0"
        df = df[keyed].assign(turn_idx=lambda d: d["turn_idx"].astype(np.int64))
    df = df.sort_values(["conv_id", "turn_idx"], kind="stable")
    parts = []
    if "unique" in which:
        parts.append(_dups_in_bucket(df))
    if "contiguity" in which:
        parts.append(_contiguity_in_bucket(df))
    if "order" in which:
        parts.append(_ts_order_in_bucket(df))
    parts = [p for p in parts if p.num_rows > 0]
    if not parts:
        return EMPTY_VIOLATIONS
    return pa.concat_tables(parts)


_I64MIN = np.iinfo(np.int64).min


def _i32_turns(a: np.ndarray) -> np.ndarray:
    """turn_idx values destined for the int32 violation schema — fail loud
    on overflow instead of silently wrapping (the pandas kernel's
    ``pa.array(..., pa.int32())`` raises on the same input; this keeps the
    numpy kernel from emitting corrupted turn indices instead)."""
    if len(a) and (int(a.max()) > 2**31 - 1 or int(a.min()) < -(2**31)):
        raise OverflowError(
            f"violation turn_idx {int(a.max())} exceeds the int32 "
            "violation-row schema; turn indices past 2^31-1 are not "
            "representable in the violation format"
        )
    return a.astype(np.int32)


def _conv_order_codes(conv: pa.Array) -> np.ndarray:
    """Order-preserving int64 codes for a string array: C++ dictionary
    encode, rank the (small) dictionary, gather — no Python string ever
    compares.  Nulls get the largest code (they sort last, matching
    pandas ``na_position='last'`` / Arrow ``at_end``)."""
    darr = conv.dictionary_encode()
    d = darr.dictionary
    nd = len(d)
    rank = np.empty(nd, dtype=np.int64)
    rank[pc.array_sort_indices(d).to_numpy()] = np.arange(nd)
    idx = darr.indices.fill_null(nd).to_numpy(zero_copy_only=False).astype(np.int64)
    rank_ext = np.concatenate([rank, [nd]])  # slot nd = null sentinel
    return rank_ext[idx]


def _const_col(n: int, value: str) -> pa.Array:
    """n copies of one string, built as a dictionary gather (no n Python
    strings — the 'order' check can emit millions of identical messages)."""
    return pa.DictionaryArray.from_arrays(
        pa.array(np.zeros(n, dtype=np.int32)), pa.array([value], pa.string())
    ).cast(pa.string())


def _run_bucket_table(t: pa.Table, which: tuple[str, ...]) -> pa.Table:
    """Arrow/numpy twin of :func:`_run_bucket` — the per-bucket hot path
    of the fused headline plan.  One dictionary-rank + one lexsort serve
    all three conversation checks; per-violation Python exists only for
    the (few) gap/duplicate message strings.  Rows with null conv_id or
    turn_idx are excluded from the conversation checks (they are already
    'required' row violations; :func:`_run_bucket` applies the same
    filter so both kernels agree on null-keyed inputs)."""
    if t.num_rows == 0:
        return EMPTY_VIOLATIONS
    conv = t["conv_id"].combine_chunks()
    turn_a = t["turn_idx"].combine_chunks()
    keep = pc.and_(pc.is_valid(conv), pc.is_valid(turn_a))
    if not pc.all(keep).as_py():
        t = t.filter(keep)
        if t.num_rows == 0:
            return EMPTY_VIOLATIONS
        conv = t["conv_id"].combine_chunks()
        turn_a = t["turn_idx"].combine_chunks()
    codes = _conv_order_codes(conv)
    turn = turn_a.to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((turn, codes))
    c_s, t_s = codes[order], turn[order]

    from .bucketing import group_bounds_multi

    gs, ge = group_bounds_multi(c_s, t_s)  # (conv, turn) runs
    gsz = ge - gs
    parts: list[pa.Table] = []

    def take_conv(row_idx: np.ndarray) -> pa.Array:
        return conv.take(pa.array(row_idx, pa.int64()))

    if "unique" in which:
        dup = gsz > 1
        if dup.any():
            rows = order[gs[dup]]
            counts = gsz[dup]
            parts.append(
                pa.table(
                    {
                        "conv_id": take_conv(rows).cast(pa.string()),
                        "turn_idx": pa.array(_i32_turns(t_s[gs[dup]])),
                        "keyword": _const_col(len(rows), "uniqueItems"),
                        "message": pa.array(
                            [
                                f"(conv_id, turn_idx) appears {int(c)} times"
                                for c in counts
                            ],
                            pa.string(),
                        ),
                    },
                    schema=VIOLATION_PA_SCHEMA,
                )
            )
    if "contiguity" in which:
        first = np.ones(len(c_s), dtype=bool)
        first[1:] = c_s[1:] != c_s[:-1]
        prv = np.empty_like(t_s)
        prv[0] = 0
        prv[1:] = t_s[:-1]
        bad = (first & (t_s != 0)) | (
            (~first) & (t_s != prv + 1) & (t_s != prv)
        )
        pos = np.flatnonzero(bad)
        if len(pos):
            msgs = [
                f"turn_idx {t_s[p]} at conversation start: expected 0"
                if first[p]
                else f"turn_idx {t_s[p]} does not follow {prv[p]}"
                for p in pos
            ]
            parts.append(
                pa.table(
                    {
                        "conv_id": take_conv(order[pos]).cast(pa.string()),
                        "turn_idx": pa.array(_i32_turns(t_s[pos])),
                        "keyword": _const_col(len(pos), "contiguity"),
                        "message": pa.array(msgs, pa.string()),
                    },
                    schema=VIOLATION_PA_SCHEMA,
                )
            )
    if "order" in which:
        ts_np = t["ts"].combine_chunks().to_numpy(zero_copy_only=False)
        ts_i = ts_np.view(np.int64)[order]  # NaT → int64 min (never raises a bound)
        gmax = np.maximum.reduceat(ts_i, gs)
        gconv = c_s[gs]
        # bound[g] = max ts over SMALLER turns of the same conv: shift the
        # per-(conv,turn) maxes by one group, then a doubling prefix-max
        # within each conv segment (log2(#groups) vectorized passes)
        bound = np.empty_like(gmax)
        bound[0] = _I64MIN
        bound[1:] = gmax[:-1]
        gfirst = np.ones(len(gconv), dtype=bool)
        gfirst[1:] = gconv[1:] != gconv[:-1]
        bound[gfirst] = _I64MIN
        k = 1
        m = len(bound)
        while k < m:
            same = np.zeros(m, dtype=bool)
            same[k:] = gconv[k:] == gconv[:-k]
            shifted = np.full(m, _I64MIN)
            shifted[k:] = bound[:-k]
            np.maximum(bound, np.where(same, shifted, _I64MIN), out=bound)
            k *= 2
        # the INT64_MIN sentinel of an all-NaT group never raises the
        # prefix max, so the group after it is checked against the prior
        # real max — exactly the SQL window semantics (MAX OVER skips
        # NULLs); the pandas kernel ffills its cummax to match
        row_bound = np.repeat(bound, gsz)
        bad = (ts_i < row_bound) & (ts_i != _I64MIN) & (row_bound != _I64MIN)
        pos = np.flatnonzero(bad)
        if len(pos):
            parts.append(
                pa.table(
                    {
                        "conv_id": take_conv(order[pos]).cast(pa.string()),
                        "turn_idx": pa.array(_i32_turns(t_s[pos])),
                        "keyword": _const_col(len(pos), "order"),
                        "message": _const_col(
                            len(pos), "ts decreases within conversation"
                        ),
                    },
                    schema=VIOLATION_PA_SCHEMA,
                )
            )
    if not parts:
        return EMPTY_VIOLATIONS
    return pa.concat_tables(parts)


def _bucketed_conv_checks(ds, which: tuple[str, ...], num_buckets: int | None, cols):
    # bucketed_map_groups stamps empty exchange blocks with the violation
    # schema (the schema-less empties from a raw groupby/map_groups are
    # the documented union+sort stall hazard) and routes through the
    # direct exchange when the input fits the gate
    from .bucketing import bucketed_map_groups

    return bucketed_map_groups(
        ds.select_columns(list(cols)),  # shuffle only the key bytes
        ["conv_id"],
        lambda g: _run_bucket(g, which),
        num_buckets=num_buckets,
        out_schema=VIOLATION_PA_SCHEMA,
    )


def contiguity_violations(ds, num_buckets: int | None = None):
    return _bucketed_conv_checks(
        ds, ("contiguity",), num_buckets, ("conv_id", "turn_idx")
    )


def ts_order_violations(ds, num_buckets: int | None = None):
    return _bucketed_conv_checks(
        ds, ("order",), num_buckets, ("conv_id", "turn_idx", "ts")
    )


def conv_checks_violations(ds, num_buckets: int | None = None):
    """uniqueItems + contiguity + order via a single hash-bucketed shuffle."""
    return _bucketed_conv_checks(
        ds, ("unique", "contiguity", "order"), num_buckets, ("conv_id", "turn_idx", "ts")
    )


# ---------------------------------------------------------------------------
# Salted (range-split) conversation checks — the skew-proof variant.
#
# Hash-bucketing by conv_id bounds a bucket by the LONGEST conversation: one
# degenerate 10^10-turn conversation lands whole in one worker.  The salted
# variant keys the shuffle by (conv_id, turn_idx // R), so no group ever
# exceeds R rows (+ duplicates), and stitches ranges with per-range
# summaries — one row per R turns:
#
# * uniqueness never straddles ranges (turn t maps to exactly one salt);
# * contiguity boundary pairs come from adjacent summaries (max_turn[k] vs
#   min_turn[k+1]) — computed on the tiny summary table;
# * ts ordering is local except rows whose ts precedes the max ts of an
#   EARLIER range (all earlier ranges hold strictly smaller turn_idx).  The
#   incoming bound per range is a cummax over summaries; only ranges with
#   bound > local min_ts need a per-row fixup pass — sparse in real data —
#   and those bounds are broadcast for a filtered second scan of the rows.


_INT64_MIN = np.iinfo(np.int64).min


def _ts_order_bounded(df: pd.DataFrame, bmap: dict) -> pa.Table:
    """:func:`_ts_order_in_bucket` with a per-range incoming bound — the max
    ts of all earlier ranges of the conversation, from the stitch pass —
    folded into the prefix max.  Flags exactly the union the separate
    local-pass + fixup-pass pair used to produce."""
    per_turn_max = df.groupby(["conv_id", "turn_idx"], sort=False)["ts"].max()
    bound = (
        per_turn_max.groupby(level="conv_id")
        .cummax()
        .groupby(level="conv_id")
        .ffill()  # carry the max past all-NaT groups (SQL MAX skips NULLs)
        .groupby(level="conv_id")
        .shift(1)
    ).rename("_bound").reset_index()
    m = df.merge(bound, on=["conv_id", "turn_idx"], how="left", sort=False)
    eff = m["_bound"].to_numpy("datetime64[ns]").view("int64")  # NaT → int64 min
    if bmap:
        # exact int64 bounds via a nullable-Int64 merge (a float map column
        # would lose ns precision above 2^53)
        bdf = pd.DataFrame(
            {
                "conv_id": list(bmap.keys()),
                "_inc": pd.array(list(bmap.values()), dtype="Int64"),
            }
        )
        m2 = m.merge(bdf, on="conv_id", how="left", sort=False)
        inc = m2["_inc"].fillna(_INT64_MIN).to_numpy(np.int64)
        eff = np.maximum(eff, inc)
    ts = m["ts"].to_numpy("datetime64[ns]").view("int64")
    bad = (ts < eff) & (ts != _INT64_MIN)  # NaT ts never violates ordering
    if not bad.any():
        return EMPTY_VIOLATIONS
    return _violations_table(
        m.loc[bad], "order", ["ts decreases within conversation"] * int(bad.sum())
    )


def _salted_local_checks(df: pd.DataFrame, bmap: dict) -> pa.Table:
    """Per-range checks with incoming ts bounds already known: uniqueItems,
    within-range contiguity (range starts belong to the stitch pass), and
    ts ordering against max(local prefix, incoming bound).  ``df.conv_id``
    is the composite ``<conv>\\x1f<salt>`` range key; the output carries
    the base conversation id."""
    df = df.sort_values(["conv_id", "turn_idx"], kind="stable")
    parts = [_dups_in_bucket(df), _ts_order_bounded(df, bmap)]
    conv = df["conv_id"].to_numpy()
    got = df["turn_idx"].to_numpy()
    n = len(got)
    if n:
        first = np.ones(n, dtype=bool)
        first[1:] = conv[1:] != conv[:-1]
        prv = np.empty_like(got)
        prv[0] = 0
        prv[1:] = got[:-1]
        bad = (~first) & (got != prv + 1) & (got != prv)
        pos = np.flatnonzero(bad)
        if len(pos):
            msgs = [f"turn_idx {got[p]} does not follow {prv[p]}" for p in pos]
            parts.append(_violations_table(df.iloc[pos], "contiguity", msgs))
    parts = [p for p in parts if p.num_rows > 0]
    if not parts:
        return EMPTY_VIOLATIONS
    out = pa.concat_tables(parts)
    base = pc.list_element(pc.split_pattern(out["conv_id"], "\x1f"), 0)
    return out.set_column(0, "conv_id", base)


def conv_checks_salted(ds, range_size: int = 4096, num_buckets: int | None = None):
    """Skew-proof uniqueItems + contiguity + order: shuffle keyed by
    (conv_id, turn_idx // range_size), stitched with per-range summaries.

    Returns the same violation-row schema/multiset as
    :func:`conv_checks_violations` (modulo row order).

    Bounds-first, two passes over the input:

    1. a combiner pass reduces each batch to per-(conv, range) min/max
       turn + ts partials (tiny rows — no full exchange), and one
       conv-keyed exchange stitches them into boundary-contiguity
       violations plus the incoming ts bound of each AFFECTED range
       (sparse by assumption);
    2. the one full exchange, keyed (conv_id, turn_idx // R), runs every
       local check with those bounds already broadcast — no summary rows,
       no post-hoc fixup scan, and the only barrier is the tiny stitched
       output.
    """
    import ray

    from .bucketing import bucketed_map_groups

    # -- pass 1: combiner partials → conv-keyed stitch → bounds --
    def partials(t: pa.Table) -> pa.Table:
        # null-keyed rows are 'required' row violations — excluded here
        # exactly like the bucketed kernels (a null turn_idx would
        # otherwise float-promote and astype to int64 garbage)
        t = _drop_null_keyed(t)
        conv = t["conv_id"].combine_chunks().to_numpy(zero_copy_only=False)
        turn = (
            t["turn_idx"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        )
        df = pd.DataFrame(
            {
                "conv": conv,
                "salt": turn // range_size,
                "turn": turn,
                "ts": t["ts"].combine_chunks().to_pandas(),
            }
        )
        g = (
            df.groupby(["conv", "salt"], sort=False)
            .agg(
                min_turn=("turn", "min"),
                max_turn=("turn", "max"),
                min_ts=("ts", "min"),
                max_ts=("ts", "max"),
            )
            .reset_index()
        )
        # int64 ns epoch; an all-NaT range gets the int64-min sentinel,
        # which can only over-mark a range as affected (pass 2 is exact)
        g["min_ts"] = g["min_ts"].to_numpy("datetime64[ns]").view("int64")
        g["max_ts"] = g["max_ts"].to_numpy("datetime64[ns]").view("int64")
        return from_pandas_clean(g)

    def stitch_bucket(df: pd.DataFrame) -> pa.Table:
        merged = (
            df.groupby(["conv", "salt"], sort=False)
            .agg(
                min_turn=("min_turn", "min"),
                max_turn=("max_turn", "max"),
                min_ts=("min_ts", "min"),
                max_ts=("max_ts", "max"),
            )
            .reset_index()
        )
        return stitch(merged)

    # summary stitching: per conversation, ordered by salt
    def stitch(df: pd.DataFrame) -> pa.Table:
        df = df.sort_values(["conv", "salt"], kind="stable")
        conv = df["conv"].to_numpy()
        n = len(df)
        first = np.ones(n, dtype=bool)
        first[1:] = conv[1:] != conv[:-1]
        min_turn = df["min_turn"].to_numpy()
        max_turn = df["max_turn"].to_numpy()
        prev_max_turn = np.empty_like(max_turn)
        prev_max_turn[0] = 0
        prev_max_turn[1:] = max_turn[:-1]
        parts = []
        # conversation start + cross-range contiguity
        bad_first = first & (min_turn != 0)
        bad_cross = (~first) & (min_turn != prev_max_turn + 1) & (min_turn != prev_max_turn)
        bad = bad_first | bad_cross
        pos = np.flatnonzero(bad)
        if len(pos):
            msgs = [
                f"turn_idx {min_turn[p]} at conversation start: expected 0"
                if first[p]
                else f"turn_idx {min_turn[p]} does not follow {prev_max_turn[p]}"
                for p in pos
            ]
            sub = pd.DataFrame(
                {"conv_id": conv[pos], "turn_idx": min_turn[pos]}
            )
            parts.append(_violations_table(sub, "contiguity", msgs))
        # ts bound per range: cummax of max_ts over earlier ranges of the conv
        max_ts = df["max_ts"].to_numpy()
        reset = np.flatnonzero(first)
        bound = np.empty_like(max_ts)
        for i, s in enumerate(reset):  # few resets per bucket: loop over convs
            e = reset[i + 1] if i + 1 < len(reset) else n
            seg = max_ts[s:e]
            b = np.empty_like(seg)
            b[0] = np.iinfo(np.int64).min
            if len(seg) > 1:
                b[1:] = np.maximum.accumulate(seg[:-1])
            bound[s:e] = b
        affected = bound > df["min_ts"].to_numpy()
        ap = np.flatnonzero(affected)
        fixups = pa.table(
            {
                "conv_id": pa.array(conv[ap], pa.string()),
                "salt": pa.array(df["salt"].to_numpy()[ap], pa.int64()),
                "bound": pa.array(bound[ap], pa.int64()),
            }
        )
        out = parts[0] if parts else EMPTY_VIOLATIONS
        if len(parts) > 1:
            out = pa.concat_tables(parts)
        # tag fixup rows so one return value carries both streams
        fx = pa.table(
            {
                "conv_id": fixups["conv_id"],
                "turn_idx": fixups["salt"].cast(pa.int32()),
                "keyword": pa.array(["__fixup"] * fixups.num_rows, pa.string()),
                "message": pa.array(
                    [str(b) for b in fixups["bound"].to_pylist()], pa.string()
                ),
            }
        )
        return pa.concat_tables([out, fx]) if fx.num_rows else out

    summ = ds.select_columns(["conv_id", "turn_idx", "ts"]).map_batches(
        partials, batch_format="pyarrow"
    ).materialize()  # tiny: one partial row per (conv, range) per batch
    if summ.count() <= DRIVER_STITCH_MAX_PARTIALS:
        # small partial set (~100 MB ceiling): stitch on the driver and
        # skip a whole exchange's fixed cost
        import ray.data as _rd

        stitched_tbl = stitch_bucket(summ.to_pandas())
        is_fix = pc.equal(stitched_tbl["keyword"], "__fixup")
        fixups = stitched_tbl.filter(is_fix).to_pandas()
        boundary = _rd.from_arrow(stitched_tbl.filter(pc.invert(is_fix)))
    else:
        # conv-keyed distributed stitch — the 100 TB path
        stitched = bucketed_map_groups(
            summ, ["conv"], stitch_bucket, out_schema=VIOLATION_PA_SCHEMA
        ).materialize()
        fixups = stitched.filter(expr="keyword == '__fixup'").to_pandas()
        boundary = stitched.filter(expr="keyword != '__fixup'")
    bmap = {
        f"{c}\x1f{int(s)}": int(m)
        for c, s, m in zip(fixups["conv_id"], fixups["turn_idx"], fixups["message"])
    }
    bref = ray.put(bmap)

    # -- pass 2: the one full exchange, bounds already broadcast --
    # keyed (conv_id, _salt) through bucketed_map_groups: typed empty
    # blocks (the schema-less raw map_groups empties are the union+sort
    # stall hazard) and the direct exchange under the size gate
    def add_salt(t: pa.Table) -> pa.Table:
        t = _drop_null_keyed(t)  # same null-key contract as pass 1
        salt = (
            t["turn_idx"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
            // range_size
        )
        return t.append_column("_salt", pa.array(salt, pa.int64()))

    def local_bucket(g: pd.DataFrame) -> pa.Table:
        return _salted_local_checks(
            g.drop(columns=["_salt"]).assign(
                conv_id=g["conv_id"].astype(str) + "\x1f" + g["_salt"].astype(str)
            ),
            ray.get(bref),
        )

    local = bucketed_map_groups(
        ds.select_columns(["conv_id", "turn_idx", "ts"]).map_batches(
            add_salt, batch_format="pyarrow"
        ),
        ["conv_id", "_salt"],
        local_bucket,
        num_buckets=num_buckets,
        out_schema=VIOLATION_PA_SCHEMA,
    )
    return boundary.union(local)


def max_conversation_size(ds) -> int:
    """Largest per-conversation row count, via per-batch combiner partials
    merged in hash buckets — only (conv_id, partial count) rows shuffle."""
    import pandas as pd

    from .bucketing import bucketed_map_groups, pandas_map

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("conv_id", sort=False).size().reset_index(name="_n")

    partials = ds.select_columns(["conv_id"]).map_batches(
        pandas_map(partial), batch_format="pandas"
    )
    totals = bucketed_map_groups(
        partials,
        ["conv_id"],
        lambda df: df.groupby("conv_id", sort=False)["_n"].sum().reset_index(),
        out_schema=pa.schema([("conv_id", pa.string()), ("_n", pa.int64())]),
    )
    out = totals.max("_n")
    return int(out) if out is not None else 0


def conv_checks_auto(ds, hot_threshold: int = 1_000_000, range_size: int = 4096):
    """Pick the conversation-check strategy from the data: the co-located
    bucket variant unless some conversation exceeds ``hot_threshold`` rows,
    in which case the salted range-split variant bounds every shuffle
    group (cf. joins.auto_hash_join)."""
    if max_conversation_size(ds) > hot_threshold:
        return conv_checks_salted(ds, range_size=range_size)
    return conv_checks_violations(ds)
