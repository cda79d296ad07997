"""Per-column statistics profiling: partial-per-batch → associative merge.

Generalizes the reference's per-keyword counters (``required`` presence,
validate.go:513-515; min/max bounds, validate.go:237-248) into a table-wide
profile (SURVEY.md §2.5): per column → row count, null count, min/max,
HyperLogLog distinct, t-digest quantiles, plus categorical frequencies for
low-cardinality string columns and an exact integer histogram for bounded
ints (used by the drift tests, stages/drift.py).

Scale shape: ``map_batches`` emits one serialized partial per batch (a few
KB); a second ``map_batches`` with a large ``batch_size`` tree-merges; the
driver folds the handful of survivors.  No all-to-all shuffle.
"""

from __future__ import annotations

import pickle

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .bucketing import from_pandas_clean
from .sketches import HLL, TDigest

__all__ = [
    "ColumnProfiler",
    "profile_dataset",
    "merge_partials",
    "grouped_distinct_exact",
]


def grouped_distinct_exact(ds, key_col: str, value_col: str):
    """→ Dataset (key_col, n_distinct): exact COUNT(DISTINCT value) per key.

    Two-stage combiner discipline: each batch emits its distinct (key,
    value) pairs, ONE pair-keyed exchange dedupes across batches and
    counts per key per bucket, and a tiny key-keyed exchange sums the
    partials — the raw duplicates never shuffle, and a skewed key's
    distinct values spread across buckets (pair hashing), so no single
    worker ever holds a hot key's full value set."""

    from .bucketing import bucketed_map_groups

    def batch_uniques(t: pa.Table) -> pa.Table:
        df = t.select([key_col, value_col]).to_pandas()
        return from_pandas_clean(
            df.dropna().drop_duplicates([key_col, value_col]), preserve_index=False
        )

    def count_bucket(df):
        return (
            df.drop_duplicates([key_col, value_col])
            .groupby(key_col, sort=False)
            .size()
            .reset_index(name="_partial")
        )

    from .sampling import _input_schema

    in_sch = _input_schema(ds)
    key_t = in_sch.field(key_col).type if in_sch is not None else None

    partials = bucketed_map_groups(
        ds.map_batches(batch_uniques, batch_format="pyarrow"),
        [key_col, value_col],
        count_bucket,
        out_schema=pa.schema([(key_col, key_t), ("_partial", pa.int64())])
        if key_t is not None
        else None,
    )

    def sum_bucket(df):
        g = df.groupby(key_col, sort=False)["_partial"].sum().reset_index(name="n_distinct")
        g["n_distinct"] = g["n_distinct"].astype("int64")
        return g

    return bucketed_map_groups(
        partials,
        [key_col],
        sum_bucket,
        out_schema=pa.schema([(key_col, key_t), ("n_distinct", pa.int64())])
        if key_t is not None
        else None,
    )


def _col_partial(col: pa.ChunkedArray, name: str, spec: dict) -> dict:
    t = col.type
    n = len(col)
    nulls = col.null_count
    out: dict = {"count": n, "nulls": nulls}
    valid = col.drop_null()
    if len(valid) == 0:
        return out
    is_num = pa.types.is_integer(t) or pa.types.is_floating(t)
    is_ts = pa.types.is_timestamp(t)
    is_str = pa.types.is_string(t) or pa.types.is_large_string(t)
    if is_num or is_ts or is_str:
        mm = pc.min_max(col)
        out["min"], out["max"] = mm["min"].as_py(), mm["max"].as_py()
    if is_num:
        out["sum"] = pc.sum(col).as_py()
        td = TDigest(spec.get("tdigest_delta", 200))
        td.update(valid.to_numpy(zero_copy_only=False).astype(np.float64))
        out["tdigest"] = td.to_bytes()
    if is_str or is_num:
        hll = HLL(spec.get("hll_p", 12))
        if is_str:
            # Hash straight off the Arrow data buffer (tokhash span
            # kernel) — no Python str / object array per value.  HLL only
            # needs a deterministic uniform hash; the 5% accuracy bound
            # is asserted in-pipeline by q_hll_distinct.
            from .tokhash import hash_strings

            hll.update_hashes(hash_strings(valid))
        else:
            hll.update_values(valid.to_numpy(zero_copy_only=False))
        out["hll"] = hll.to_bytes()
    if is_str and spec.get("categories", True):
        max_cats = spec.get("max_categories", 64)
        out["cat_cap"] = max_cats  # merge re-applies the cap (see _merge_col)
        # High-cardinality bail: if a 4K-value prefix already exceeds the
        # category cap, the full column can only be wider — skip the
        # full-column hash table (free-text columns pay it otherwise).
        probe = valid.slice(0, 4096)
        if len(probe) < len(valid) and len(pc.unique(probe)) > max_cats:
            out["categories"] = None
        else:
            vc = valid.value_counts()
            if len(vc) <= max_cats:
                out["categories"] = {
                    d["values"]: d["counts"] for d in vc.to_pylist()
                }
            else:
                out["categories"] = None  # too wide → not categorical
    return out


def _merge_col(a: dict, b: dict) -> dict:
    out = {"count": a["count"] + b["count"], "nulls": a["nulls"] + b["nulls"]}
    for k, fn in (("min", min), ("max", max)):
        if k in a and k in b:
            out[k] = fn(a[k], b[k])
        elif k in a or k in b:
            out[k] = a.get(k, b.get(k))
    if "sum" in a or "sum" in b:
        out["sum"] = a.get("sum", 0) + b.get("sum", 0)
    if "tdigest" in a and "tdigest" in b:
        out["tdigest"] = (
            TDigest.from_bytes(a["tdigest"]).merge(TDigest.from_bytes(b["tdigest"]))
        ).to_bytes()
    elif "tdigest" in a or "tdigest" in b:
        out["tdigest"] = a.get("tdigest", b.get("tdigest"))
    if "hll" in a and "hll" in b:
        out["hll"] = (
            HLL.from_bytes(a["hll"]).merge(HLL.from_bytes(b["hll"]))
        ).to_bytes()
    elif "hll" in a or "hll" in b:
        out["hll"] = a.get("hll", b.get("hll"))
    if "categories" in a or "categories" in b:
        cap = a.get("cat_cap", b.get("cat_cap", 64))
        out["cat_cap"] = cap
        ca, cb = a.get("categories"), b.get("categories")
        if ("categories" in a and ca is None) or (
            "categories" in b and cb is None
        ):
            # a high-cardinality bail in ANY partial is authoritative —
            # absorbing the other side's dict would report membership and
            # counts that depend on batch partitioning
            out["categories"] = None
        else:
            m = dict(ca or {})
            for k, v in (cb or {}).items():
                m[k] = m.get(k, 0) + v
            # re-apply the cap: two ≤cap partials can merge past it, and
            # the verdict must match what a single-batch run would say
            out["categories"] = m if len(m) <= cap else None
    return out


class ColumnProfiler:
    """map_batches callable: batch → one row holding a pickled partial."""

    def __init__(self, columns=None, **spec) -> None:
        self.columns = columns
        self.spec = spec

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols = self.columns or batch.column_names
        partial = {c: _col_partial(batch[c], c, self.spec) for c in cols}
        return pa.table({"partial": pa.array([pickle.dumps(partial)], pa.binary())})


def _merge_partial_dicts(parts: list[dict]) -> dict:
    acc = parts[0]
    for p in parts[1:]:
        acc = {
            c: _merge_col(acc[c], p[c]) if c in acc else p[c]
            for c in set(acc) | set(p)
        }
    return acc


def merge_partials(batch: pa.Table) -> pa.Table:
    parts = [pickle.loads(b) for b in batch["partial"].to_pylist()]
    return pa.table({"partial": pa.array([pickle.dumps(_merge_partial_dicts(parts))], pa.binary())})


def profile_dataset(ds, columns=None, quantiles=(0.5, 0.9, 0.99), **spec) -> dict:
    """Full profile of a Dataset; returns {column: stats dict}.

    Two-level reduce: per-batch partials → in-batch merges (batch_size=256)
    → driver fold of the few survivors.
    """
    partials = ds.map_batches(
        ColumnProfiler(columns, **spec), batch_format="pyarrow"
    ).map_batches(merge_partials, batch_format="pyarrow", batch_size=256)
    rows = partials.take_all()
    merged = _merge_partial_dicts([pickle.loads(r["partial"]) for r in rows])
    out: dict = {}
    for c, st in merged.items():
        entry = {
            "count": st["count"],
            "nulls": st["nulls"],
            "null_rate": st["nulls"] / max(1, st["count"]),
        }
        for k in ("min", "max", "sum"):
            if k in st:
                entry[k] = st[k]
        if "hll" in st:
            entry["distinct_hll"] = HLL.from_bytes(st["hll"]).estimate()
        if "tdigest" in st:
            td = TDigest.from_bytes(st["tdigest"])
            entry["quantiles"] = {str(q): td.quantile(q) for q in quantiles}
        if st.get("categories") is not None:
            entry["categories"] = dict(
                sorted(st["categories"].items(), key=lambda kv: (-kv[1], kv[0]))
            )
        out[c] = entry
    return out
