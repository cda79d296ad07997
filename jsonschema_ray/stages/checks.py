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


def _contiguity_group(g: pd.DataFrame) -> pa.Table:
    """Local gap detection: sorted turn_idx must start at 0 and each turn
    must follow its predecessor by exactly 1 (duplicates are flagged by the
    uniqueness check, not here)."""
    g = g.sort_values("turn_idx", kind="stable")
    got = g["turn_idx"].to_numpy()
    bad = np.zeros(len(got), dtype=bool)
    bad[0] = got[0] != 0
    if len(got) > 1:
        nxt, prv = got[1:], got[:-1]
        bad[1:] = (nxt != prv + 1) & (nxt != prv)  # equal = duplicate, not a gap
    if not bad.any():
        return EMPTY_VIOLATIONS
    pos = np.flatnonzero(bad)
    msgs = [
        f"turn_idx {got[0]} at conversation start: expected 0"
        if p == 0
        else f"turn_idx {got[p]} does not follow {got[p - 1]}"
        for p in pos
    ]
    return _violations_table(g.iloc[pos], "contiguity", msgs)


def contiguity_violations(ds):
    return (
        ds.select_columns(["conv_id", "turn_idx"])
        .groupby("conv_id")
        .map_groups(_contiguity_group, batch_format="pandas")
    )


def _ts_order_group(g: pd.DataFrame) -> pa.Table:
    g = g.sort_values(["turn_idx", "ts"], kind="stable")
    # max ts among rows with strictly smaller turn_idx
    per_turn_max = g.groupby("turn_idx")["ts"].max()
    prev_max = per_turn_max.cummax().shift(1)
    bound = g["turn_idx"].map(prev_max)
    bad = (g["ts"] < bound).to_numpy()
    if not bad.any():
        return EMPTY_VIOLATIONS
    return _violations_table(
        g.loc[bad], "order", ["ts decreases within conversation"] * int(bad.sum())
    )


def ts_order_violations(ds):
    return (
        ds.select_columns(["conv_id", "turn_idx", "ts"])
        .groupby("conv_id")
        .map_groups(_ts_order_group, batch_format="pandas")
    )


def _dup_in_group(g: pd.DataFrame) -> pa.Table:
    counts = g["turn_idx"].value_counts()
    dup = counts[counts > 1]
    if len(dup) == 0:
        return EMPTY_VIOLATIONS
    sub = pd.DataFrame(
        {"conv_id": g["conv_id"].iloc[0], "turn_idx": dup.index.to_numpy()}
    ).sort_values("turn_idx")
    msgs = [
        f"(conv_id, turn_idx) appears {int(c)} times"
        for c in dup.sort_index().to_numpy()
    ]
    return _violations_table(sub, "uniqueItems", msgs)


def _conv_checks_group(g: pd.DataFrame) -> pa.Table:
    """All three conversation-level checks in one grouped pass.

    (conv_id, turn_idx) uniqueness nests inside the conv_id partition, so a
    single hash shuffle on conv_id serves uniqueness + contiguity + ts
    order — one exchange instead of three at 100 TB.
    """
    parts = [
        _dup_in_group(g),
        _contiguity_group(g),
        _ts_order_group(g),
    ]
    parts = [p for p in parts if p.num_rows > 0]
    if not parts:
        return EMPTY_VIOLATIONS
    return pa.concat_tables(parts)


def conv_checks_violations(ds):
    """uniqueItems + contiguity + order via a single groupby(conv_id)."""
    return (
        ds.select_columns(["conv_id", "turn_idx", "ts"])
        .groupby("conv_id")
        .map_groups(_conv_checks_group, batch_format="pandas")
    )
