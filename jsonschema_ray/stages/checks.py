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
  0..n-1 and ``ts`` is non-decreasing across turns.  ``groupby(conv_id)
  .map_groups`` over just the 3 needed columns; a conversation is the
  minimal co-location unit, so skew is bounded by the longest conversation,
  not the hottest key's total bytes.

All emit the violation-row schema (conv_id, turn_idx, keyword, message)
(FIXTURES.md §4) so they union with the row-level stage.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..core.jsontypes import go_quote

__all__ = [
    "duplicate_key_violations",
    "referential_violations",
    "contiguity_violations",
    "ts_order_violations",
    "conv_checks_violations",
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


def duplicate_key_violations(ds, keys=("conv_id", "turn_idx")):
    """One violation row per duplicated key, with its multiplicity."""
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
    df must be sorted by (conv_id, turn_idx)."""
    per_turn_max = df.groupby(["conv_id", "turn_idx"], sort=False)["ts"].max()
    bound = (
        per_turn_max.groupby(level="conv_id").cummax().groupby(level="conv_id").shift(1)
    ).rename("_bound").reset_index()
    m = df.merge(bound, on=["conv_id", "turn_idx"], how="left", sort=False)
    bad = (m["ts"] < m["_bound"]).to_numpy()
    if not bad.any():
        return EMPTY_VIOLATIONS
    return _violations_table(
        m.loc[bad], "order", ["ts decreases within conversation"] * int(bad.sum())
    )


def _run_bucket(df: pd.DataFrame, which: tuple[str, ...]) -> pa.Table:
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


def _pick_buckets(ds, num_buckets: int | None) -> int:
    if num_buckets is not None:
        return num_buckets
    # Size P so one bucket's key columns (~25% of row bytes here) stay well
    # under a worker's heap; metadata-only for parquet reads.
    try:
        sz = ds.size_bytes() or 0
    except Exception:
        sz = 0
    return max(32, int(sz // (512 << 20)) + 1)


def _bucketed_conv_checks(ds, which: tuple[str, ...], num_buckets: int | None, cols):
    nb = _pick_buckets(ds, num_buckets)

    def add_bucket(t: pa.Table) -> pa.Table:
        conv = t["conv_id"].combine_chunks().to_numpy(zero_copy_only=False)
        b = (pd.util.hash_array(conv.astype(object)) % nb).astype(np.int32)
        return t.append_column("_b", pa.array(b, pa.int32()))

    return (
        ds.select_columns(list(cols))  # shuffle only the key bytes
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(
            lambda g: _run_bucket(g, which),
            batch_format="pandas",
        )
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
