"""Hash-bucketed grouped execution.

``Dataset.groupby(key).map_groups(fn)`` costs one Python call + one pandas
frame per distinct key.  For high-cardinality keys (shingles, candidate
pairs, conversation ids) that is the dominant cost at any scale.  The
pattern here buckets rows by ``hash(key) % P`` and shuffles ONCE on the
small bucket id; the caller's function then processes a whole bucket —
thousands of key-groups — with vectorized pandas/numpy kernels.  Keys never
straddle buckets, so any per-key computation stays correct.

P defaults from the dataset's input size (metadata-only for parquet) so one
bucket's rows fit comfortably in a worker's heap at any input scale.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = [
    "pick_num_buckets",
    "bucketed_map_groups",
    "group_bounds",
    "group_bounds_multi",
    "col_np",
    "hash_normalized",
]

_BUCKET_COL = "__bucket"


def hash_normalized(arr: np.ndarray) -> np.ndarray:
    """``pd.util.hash_array`` with dtype-width normalization: int32(-1)
    and int64(-1) hash differently, so the two sides of any keyed exchange
    must hash through the same widened type or equal keys never meet."""
    if arr.dtype == object:
        return pd.util.hash_array(arr.astype(object))
    if arr.dtype.kind in "iub":
        arr = arr.astype(np.int64, copy=False)
    elif arr.dtype.kind == "f":
        arr = arr.astype(np.float64, copy=False)
    return pd.util.hash_array(arr)


def _plan_size_estimate(ds) -> int | None:
    """Byte-size estimate WITHOUT triggering execution.

    ``Dataset.size_bytes()`` on a lazy derived dataset EXECUTES the whole
    upstream plan (and the snapshot is not reused by datasets derived
    afterwards), so calling it from a bucket-sizing heuristic silently
    doubles every pipeline's work.  Instead: use the cached snapshot when
    one exists, else walk the logical plan for metadata-known sizes (a
    parquet read knows its size from footers alone).  A transform's output
    size is approximated by its inputs' — the right order of magnitude for
    sizing buckets."""
    try:
        if ds._plan.has_computed_output():
            return ds.size_bytes()  # cached snapshot — free

        def op_size(op) -> int | None:
            md = op.infer_metadata()
            if md.size_bytes is not None:
                return md.size_bytes
            deps = op.input_dependencies
            if not deps:
                return None
            total = 0
            for d in deps:
                s = op_size(d)
                if s is None:
                    return None
                total += s
            return total

        return op_size(ds._logical_plan.dag)
    except Exception:
        return None


def pick_num_buckets(ds, num_buckets: int | None, target_bytes: int = 512 << 20) -> int:
    if num_buckets is not None:
        return num_buckets
    sz = _plan_size_estimate(ds)
    if sz is None:
        # No cheap size: scale with the cluster instead of executing the
        # plan twice.  2 buckets/core keeps every core busy through stragglers.
        try:
            import ray

            cpus = int(ray.cluster_resources().get("CPU", 16))
        except Exception:
            cpus = 16
        return max(32, 2 * cpus)
    return max(32, int(sz // target_bytes) + 1)


def bucketed_map_groups(
    ds,
    key_cols,
    fn,
    num_buckets: int | None = None,
    out_schema: pa.Schema | None = None,
    batch_format: str = "pandas",
):
    """Shuffle by hash(key_cols) % P, then apply ``fn`` per bucket.

    ``fn`` receives every row of every key-group hashed into the bucket
    (bucket column removed) — a pandas DataFrame by default, a pyarrow
    Table with ``batch_format="pyarrow"`` (the fast path: bucket fns that
    work on numpy arrays skip the full Arrow→pandas conversion of the
    bucket, which otherwise copies every string column).  Returns a
    DataFrame or pyarrow Table either way.

    ``out_schema``: the output's Arrow schema, when the caller knows it.
    The sort exchange under ``map_groups`` can emit EMPTY blocks (a key
    range with no rows), and Ray never calls the UDF on those — they pass
    through schemaless, which floods the executor log with RefBundle
    schema warnings and is the known stall hazard for schema-dependent
    downstream ops (union + sort).  With a schema, a fused follow-up stage
    stamps empties typed and casts pandas dtype drift back to the declared
    Arrow types."""
    nb = pick_num_buckets(ds, num_buckets)
    keys = list(key_cols)

    def add_bucket(t: pa.Table) -> pa.Table:
        h = np.zeros(t.num_rows, dtype=np.uint64)
        for c in keys:
            arr = t[c].combine_chunks().to_numpy(zero_copy_only=False)
            hc = hash_normalized(arr)
            h = h * np.uint64(1000003) ^ hc
        return t.append_column(_BUCKET_COL, pa.array((h % nb).astype(np.int32)))

    if batch_format == "pyarrow":
        apply = lambda g: fn(g.drop_columns([_BUCKET_COL]))  # noqa: E731
    else:
        apply = lambda g: fn(g.drop(columns=[_BUCKET_COL]))  # noqa: E731

    out = (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby(_BUCKET_COL)
        .map_groups(apply, batch_format=batch_format)
    )
    if out_schema is not None:
        empty = out_schema.empty_table()

        def stamp(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return empty
            return t if t.schema == out_schema else t.select(out_schema.names).cast(out_schema)

        out = out.map_batches(stamp, batch_format="pyarrow")
    return out


def group_bounds(sorted_keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(starts, ends) of equal-value runs in a sorted key array."""
    n = len(sorted_keys)
    if n == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    change = np.flatnonzero(sorted_keys[1:] != sorted_keys[:-1]) + 1
    starts = np.concatenate([[0], change])
    ends = np.concatenate([change, [n]])
    return starts, ends


def group_bounds_multi(*sorted_cols: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(starts, ends) of equal-TUPLE runs across co-sorted key arrays
    (the composite-key analogue of :func:`group_bounds`)."""
    n = len(sorted_cols[0])
    if n == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    change = np.zeros(n - 1, dtype=bool)
    for c in sorted_cols:
        change |= c[1:] != c[:-1]
    idx = np.flatnonzero(change) + 1
    starts = np.concatenate([[0], idx])
    ends = np.concatenate([idx, [n]])
    return starts, ends


def col_np(t: pa.Table, name: str) -> np.ndarray:
    """Arrow column → numpy (chunk-safe; zero-copy for flat numerics)."""
    return t[name].combine_chunks().to_numpy(zero_copy_only=False)
