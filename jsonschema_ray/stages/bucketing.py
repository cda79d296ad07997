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

import os

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

# One-shot telemetry: the direct raw-task exchange rides Ray-private
# surfaces (Dataset.iter_internal_ref_bundles, ds._logical_plan).  When a
# Ray upgrade removes one, every pipeline silently lands on the (correct
# but slower) AllToAll plan — warn ONCE so the degradation is visible.
# Deliberately NOT fired when the size gate routes to AllToAll: that is
# the designed behavior above DIRECT_EXCHANGE_MAX_BYTES.
_DIRECT_FALLBACK_WARNED = False


def _warn_direct_fallback(err: BaseException) -> None:
    import warnings

    if not isinstance(err, (AttributeError, TypeError)):
        # Not an API-surface removal — a transient execution failure
        # (object-store pressure, worker death) also lands here because
        # the upstream plan executes inside the bundle iteration.  Warn
        # without the version diagnosis and WITHOUT latching, so a later
        # genuine API removal still gets its one-shot version warning.
        warnings.warn(
            "direct bucket exchange attempt failed "
            f"({type(err).__name__}: {err}); using the streaming AllToAll "
            "plan for this exchange",
            RuntimeWarning,
            stacklevel=3,
        )
        return
    global _DIRECT_FALLBACK_WARNED
    if _DIRECT_FALLBACK_WARNED:
        return
    _DIRECT_FALLBACK_WARNED = True
    warnings.warn(
        "direct bucket exchange unavailable on this Ray version "
        f"({type(err).__name__}: {err}); falling back to the streaming "
        "AllToAll plan for ALL bucketed exchanges — correct but slower at "
        "small exchange sizes. The engine is pinned to ray[data]==2.49.* "
        "(pyproject.toml); re-validate the private-API surfaces after a "
        "Ray upgrade.",
        RuntimeWarning,
        stacklevel=3,
    )

# Above this estimated input size a direct (raw-task) exchange's
# nblocks × nbuckets intermediate-object count stops being "a few hundred
# small objects" and Ray's streaming AllToAll is the right plan.
DIRECT_EXCHANGE_MAX_BYTES = int(
    os.environ.get("GRAFT_DIRECT_EXCHANGE_MAX_BYTES", str(8 << 30))
)


def from_pandas_clean(df, preserve_index: bool = False) -> pa.Table:
    """``pa.Table.from_pandas`` WITHOUT the pandas schema metadata.

    The metadata makes ``pa.Schema`` unhashable (its dict participates in
    the hash), which defeats Ray's block-schema deduplication and floods
    every run with per-block "Failed to hash the schemas" warnings.
    Every block OUR stages emit is metadata-free via this helper /
    :func:`pandas_map`; the one remaining warning source is Ray's READ
    operator unifying the schemas of pandas-written input parquet (the
    files themselves carry the metadata — outside the engine's control,
    silenced at the logging config for bench/pytest runs)."""
    t = pa.Table.from_pandas(df, preserve_index=preserve_index)
    return t.replace_schema_metadata(None) if t.schema.metadata else t


def pandas_map(fn):
    """Wrap a pandas-in/pandas-out batch fn so its output re-enters Ray
    as a METADATA-FREE Arrow block: Ray's own pandas→block conversion
    attaches pandas metadata, which makes the schema unhashable and
    floods logs with per-block schema-dedup warnings."""

    def wrapped(df):
        out = fn(df)
        return from_pandas_clean(out) if isinstance(out, pd.DataFrame) else out

    return wrapped


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


def _direct_map_groups(ds, bucket_ids, fn, nb, out_schema, batch_format):
    """Raw-task twin of the ``groupby(bucket).map_groups`` exchange for the
    small-exchange regime (same pattern as the fused transcript plan's
    direct exchange — see validate_pipeline._direct_bucket_exchange).

    One split task per input block sorts the block by bucket id once and
    emits one zero-copy slice per bucket (Ray's Arrow serializer
    truncates sliced buffers, so a slice ships only its own rows); one
    reduce task per bucket concats its pieces and applies ``fn``.  Ray's sort-backed
    AllToAll pays seconds of fixed sample/barrier latency at sandbox data
    sizes; this moves the same bytes without it.  Gated to inputs under
    :data:`DIRECT_EXCHANGE_MAX_BYTES` and to callers that declare
    ``out_schema`` (an all-empty bucket must still return a typed block).
    Returns None when the route does not apply (caller falls back to the
    Dataset plan)."""
    import ray
    import ray.data as rd

    if nb < 2:  # num_returns=1 yields a bare ref, not a 1-tuple
        return None
    empty_out = out_schema.empty_table()

    @ray.remote(num_returns=nb)
    def split_block(block):
        if isinstance(block, pd.DataFrame):
            block = from_pandas_clean(block)
        if block.num_rows == 0:
            e = block.slice(0, 0)
            return tuple(e for _ in range(nb))
        b = bucket_ids(block)
        if b.size > 1 and not (b[1:] >= b[:-1]).all():
            order = np.argsort(b, kind="stable")
            block = block.take(pa.array(order, pa.int64()))
            b = b[order]
        bounds = np.searchsorted(b, np.arange(nb + 1))
        return tuple(
            block.slice(bounds[i], bounds[i + 1] - bounds[i]) for i in range(nb)
        )

    @ray.remote
    def reduce_bucket(*pieces):
        live = [p for p in pieces if p.num_rows]
        if not live:
            return empty_out
        # permissive: a unioned input's sides may disagree on integer
        # width (int32 key vs int64 key) — promote like the Dataset plan
        g = pa.concat_tables(live, promote_options="permissive")
        res = fn(g if batch_format == "pyarrow" else g.to_pandas())
        if isinstance(res, pd.DataFrame):
            res = from_pandas_clean(res)
        if res.num_rows == 0:
            return empty_out
        if res.schema != out_schema:
            res = res.select(out_schema.names).cast(out_schema)
        return res

    try:
        splits = [
            split_block.remote(bref)
            for bundle in ds.iter_internal_ref_bundles()
            for bref in bundle.block_refs
        ]
    except Exception as err:
        _warn_direct_fallback(err)
        return None
    if not splits:
        return None
    outs = [reduce_bucket.remote(*[s[i] for s in splits]) for i in range(nb)]
    return rd.from_arrow_refs(outs)


def bucketed_map_groups(
    ds,
    key_cols,
    fn,
    num_buckets: int | None = None,
    out_schema: pa.Schema | None = None,
    batch_format: str = "pandas",
    exchange: str = "auto",
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

    def bucket_ids(t: pa.Table) -> np.ndarray:
        h = np.zeros(t.num_rows, dtype=np.uint64)
        for c in keys:
            arr = t[c].combine_chunks().to_numpy(zero_copy_only=False)
            hc = hash_normalized(arr)
            h = h * np.uint64(1000003) ^ hc
        return (h % nb).astype(np.int32)

    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column(_BUCKET_COL, pa.array(bucket_ids(t)))

    route = os.environ.get("GRAFT_BUCKETED_EXCHANGE", exchange)
    if route not in ("auto", "direct", "ray"):
        raise ValueError(f"unknown exchange route {route!r}")
    if route == "direct" and out_schema is None:
        if exchange == "direct":
            # an explicit caller request that cannot be honored is an error
            raise ValueError(
                "exchange='direct' requires out_schema (an all-empty bucket "
                "must return a typed block)"
            )
        # env-forced A/B sweep: say which call sites fall back so the
        # measurement isn't silently mixed
        import warnings

        warnings.warn(
            "GRAFT_BUCKETED_EXCHANGE=direct ignored for a caller without "
            "out_schema; running the Dataset exchange",
            stacklevel=2,
        )
        route = "ray"
    if route == "auto":
        sz = _plan_size_estimate(ds)
        route = (
            "direct"
            if out_schema is not None
            and sz is not None
            and sz < DIRECT_EXCHANGE_MAX_BYTES
            else "ray"
        )
    if route == "direct" and out_schema is not None:
        out = _direct_map_groups(ds, bucket_ids, fn, nb, out_schema, batch_format)
        if out is not None:
            return out

    # pandas results re-enter Ray as metadata-free Arrow (pandas_map's
    # contract): Ray's own pandas→block conversion attaches metadata that
    # makes the schema unhashable, and downstream schema unification then
    # warns per block BEFORE the stamp stage could strip it
    if batch_format == "pyarrow":
        apply = pandas_map(lambda g: fn(g.drop_columns([_BUCKET_COL])))
    else:
        apply = pandas_map(lambda g: fn(g.drop(columns=[_BUCKET_COL])))

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
            if t.schema != out_schema:
                return t.select(out_schema.names).cast(out_schema)
            # == ignores metadata: Ray's own pandas→block conversion under
            # map_groups attaches pandas metadata, which makes the schema
            # unhashable (see from_pandas_clean) — strip it here too
            return t.replace_schema_metadata(None) if t.schema.metadata else t

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
