"""Join operators Ray Data lacks natively: as-of and range joins.

Both follow the engine's shuffle discipline:

* :func:`asof_join` — "most recent right row STRICTLY BEFORE the left
  row's time, per key" by default (``allow_exact_matches=False``, the
  SQL oracle's ``r.ts < l.ts``); pass ``allow_exact_matches=True`` for
  at-or-before.  Left and right are hash-bucketed on the key (one
  shuffle each, same bucket space so buckets align); inside a bucket
  ``pandas.merge_asof(by=key)`` resolves every key-group vectorized.
  Partitioning assumption: a single key's rows fit one bucket — the same
  co-location bound as any keyed join; salt by time range if a key is
  degenerate (cf. checks.conv_checks_salted).
* :func:`range_join_broadcast` — non-equi join against a SMALL interval
  table: intervals are broadcast once (``ray.put``), each batch resolves
  membership with one ``np.searchsorted`` — no shuffle at all.  Right for
  calendar windows, config epochs, deployment ranges; a large interval
  side would need an interval-partitioned shuffle instead.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .bucketing import hash_normalized, pandas_map, pick_num_buckets


def _type_of_map(*datasets) -> dict[str, pa.DataType]:
    """column → arrow type across datasets (first wins).  Pandas-backed
    datasets report numpy dtypes; coerce so schema construction works."""
    out: dict[str, pa.DataType] = {}
    for ds in datasets:
        sch = ds.schema()
        if sch is None:  # a fully-empty dataset reports no schema
            continue
        for n, t in zip(sch.names, sch.types):
            if not isinstance(t, pa.DataType):
                try:
                    t = pa.from_numpy_dtype(t)
                except (TypeError, pa.ArrowNotImplementedError):
                    t = pa.string()
            out.setdefault(n, t)
    return out

__all__ = [
    "asof_join",
    "range_join_broadcast",
    "hash_join",
    "detect_hot_keys",
    "salted_hash_join",
    "auto_hash_join",
    "bloom_semi_join",
]


def asof_join(
    left_ds,
    right_ds,
    by: str,
    on: str,
    left_cols: list[str],
    right_cols: list[str],
    direction: str = "backward",
    allow_exact_matches: bool = False,
    suffix: str = "_right",
):
    """→ Dataset: left rows + matched right columns (null when no match).

    One aligned shuffle: both sides are null-padded to a common column set
    and unioned, so a single hash exchange on ``by`` co-locates each key's
    left and right rows."""
    nb = pick_num_buckets(left_ds, None)
    all_cols = [by, on, *left_cols, *right_cols]

    type_of = _type_of_map(left_ds, right_ds)

    def tag(side: str, own: list[str]):
        def fn(t: pa.Table) -> pa.Table:
            key = t[by].combine_chunks().to_numpy(zero_copy_only=False)
            b = (hash_normalized(key) % nb).astype(np.int32)
            cols = {}
            for c in all_cols:
                if c in (by, on) or c in own:
                    cols[c] = t[c]
                else:
                    cols[c] = pa.nulls(t.num_rows, type_of[c])
            cols["_b"] = pa.array(b)
            cols["_side"] = pa.array([side] * t.num_rows, pa.string())
            return pa.table(cols)

        return fn

    both = left_ds.map_batches(tag("L", left_cols), batch_format="pyarrow").union(
        right_ds.map_batches(tag("R", right_cols), batch_format="pyarrow")
    )

    def join_bucket(df: pd.DataFrame) -> pd.DataFrame:
        left = df[df["_side"] == "L"][[by, on, *left_cols]].sort_values(
            on, kind="stable"
        )
        right = df[df["_side"] == "R"][[by, on, *right_cols]].dropna(
            subset=[on]
        ).sort_values(on, kind="stable")
        renames = {on: f"{on}{suffix}", **{c: f"{c}{suffix}" for c in right_cols}}
        if left.empty:
            for c in renames.values():
                left[c] = pd.Series(dtype=object)
            return left
        return pd.merge_asof(
            left,
            right.rename(columns=renames),
            left_on=on,
            right_on=f"{on}{suffix}",
            by=by,
            direction=direction,
            allow_exact_matches=allow_exact_matches,
        )

    out_cols = [by, on, *left_cols, f"{on}{suffix}", *(f"{c}{suffix}" for c in right_cols)]
    target = pa.schema(
        [(by, type_of[by]), (on, type_of[on])]
        + [(c, type_of[c]) for c in left_cols]
        + [(f"{on}{suffix}", type_of[on])]
        + [(f"{c}{suffix}", type_of[c]) for c in right_cols]
    )

    def recast(t: pa.Table) -> pa.Table:
        # ONLY stamp schemaless empty blocks (sort under map_groups emits
        # them without calling the UDF); non-empty blocks keep merge_asof's
        # own dtypes — unmatched rows float-promote right columns, and a
        # blanket cast back to int would fail on those NaNs
        if t.num_rows == 0:
            return target.empty_table()
        return t

    return (
        both.groupby("_b")
        .map_groups(pandas_map(join_bucket), batch_format="pandas")
        .map_batches(recast, batch_format="pyarrow")
    )


def range_join_broadcast(ds, intervals: pd.DataFrame, on: str, lo_col: str, hi_col: str, tag_cols: list[str]):
    """Join each row to the interval containing ``on`` (lo <= v < hi).

    ``intervals`` must be non-overlapping and sorted by ``lo_col``; rows
    falling in no interval are dropped (inner join semantics)."""
    import ray

    iv = intervals.sort_values(lo_col).reset_index(drop=True)
    ref = ray.put(
        {
            "lo": iv[lo_col].to_numpy(),
            "hi": iv[hi_col].to_numpy(),
            "tags": {c: iv[c].to_numpy() for c in tag_cols},
        }
    )

    # stateless tasks: the broadcast interval table is a zero-copy local
    # plasma read per batch — no per-call actor-pool spin-up
    def range_join(t: pa.Table, side_ref=ref) -> pa.Table:
        side = ray.get(side_ref)
        lo, hi, tags = side["lo"], side["hi"], side["tags"]
        v = t[on].combine_chunks().to_numpy(zero_copy_only=False)
        idx = np.searchsorted(lo, v, side="right") - 1
        ok = (idx >= 0) & (v < hi[np.clip(idx, 0, None)])
        keep = np.flatnonzero(ok)
        out = t.take(pa.array(keep.astype(np.int64)))
        for c, vals in tags.items():
            out = out.append_column(c, pa.array(vals[idx[keep]]))
        return out

    return ds.map_batches(range_join, batch_format="pyarrow", zero_copy_batch=True)


def hash_join(
    left_ds,
    right_ds,
    on: str,
    left_cols: list[str],
    right_cols: list[str],
    how: str = "inner",
):
    """Big-big equi-join via ONE aligned hash exchange (``how``: inner,
    semi, anti).  Both sides are null-padded to a common column set and
    unioned so a single shuffle on the key co-locates matching rows; each
    bucket resolves with a pandas merge / key-membership test.

    Broadcast the small side instead (cf. queries.q_segment_revenue) when
    one side fits the object store — this operator is for two large sides.
    Skewed keys: a hot key lands whole in one bucket; pre-aggregate or salt
    (split the hot key's right side and replicate the left) before joining.
    """
    from .bucketing import bucketed_map_groups

    nb = pick_num_buckets(left_ds, None)
    all_cols = [on, *left_cols, *right_cols]

    type_of = _type_of_map(left_ds, right_ds)

    def tag(side: str, own: list[str]):
        def fn(t: pa.Table) -> pa.Table:
            cols = {}
            for c in all_cols:
                if c == on or c in own:
                    cols[c] = t[c]
                else:
                    cols[c] = pa.nulls(t.num_rows, type_of[c])
            cols["_side"] = pa.array([side] * t.num_rows, pa.string())
            return pa.table(cols)

        return fn

    both = left_ds.map_batches(tag("L", left_cols), batch_format="pyarrow").union(
        right_ds.map_batches(tag("R", right_cols), batch_format="pyarrow")
    )

    def join_bucket(df: pd.DataFrame) -> pd.DataFrame:
        left = df[df["_side"] == "L"][[on, *left_cols]]
        right = df[df["_side"] == "R"][[on, *right_cols]]
        if how == "inner":
            return left.merge(right, on=on, how="inner")
        keys = set(right[on].to_numpy())
        mask = left[on].isin(keys).to_numpy()
        return left[mask] if how == "semi" else left[~mask]

    out_cols = [on, *left_cols] + (right_cols if how == "inner" else [])
    target = pa.schema([(c, type_of[c]) for c in out_cols])
    # out_schema both restores the sides' true Arrow types (the union's
    # null padding floats int columns through pandas) and stamps the
    # exchange's empty blocks typed; the bucketed exchange also gives this
    # join the direct raw-task route in the small-exchange regime
    return bucketed_map_groups(
        both, [on], join_bucket, num_buckets=nb, out_schema=target
    )


# Tree-reduce fan-in for Bloom bitmap partials: each merge round ORs up to
# this many n_bits/8-byte rows per task, and the driver's final take is
# bounded by the same number — at 10⁵ input blocks the old driver-side OR
# loop would have pulled 10⁵ × 1 MiB onto the driver.
_BLOOM_FANIN = 32


def _tree_reduce_or(partials_ds, n_words: int, fanin: int = _BLOOM_FANIN):
    """→ (merged uint64[n_words], driver_rows): distributed OR-merge of a
    dataset of ``bits`` binary rows (each ``n_words`` uint64 words).

    Rounds of ``repartition → map_batches`` OR ≤``fanin`` rows per task
    until at most ``fanin`` rows remain; only those reach the driver.
    Rounds are O(log_fanin(blocks)); each round's ``materialize`` holds
    1/fanin of the previous round's bytes."""
    import math

    def or_rows(t: pa.Table) -> pa.Table:
        bits = np.zeros(n_words, dtype=np.uint64)
        for buf in t["bits"]:
            bits |= np.frombuffer(buf.as_py(), dtype=np.uint64)
        return pa.table({"bits": pa.array([bits.tobytes()], pa.binary())})

    merged = partials_ds.materialize()
    n = merged.count()
    while n > fanin:
        merged = (
            merged.repartition(max(1, math.ceil(n / fanin)))
            .map_batches(or_rows, batch_format="pyarrow", batch_size=None)
            .materialize()
        )
        n = merged.count()
    bloom = np.zeros(n_words, dtype=np.uint64)
    for r in merged.take_all():
        bloom |= np.frombuffer(r["bits"], dtype=np.uint64)
    return bloom, n


def _bloom_hashes(vals: np.ndarray, n_bits: int, k_hashes: int) -> np.ndarray:
    """(len(vals), k) bit positions via double hashing h1 + i·h2.

    Dtypes are normalized before hashing: ``pd.util.hash_array`` is
    width-sensitive for negative integers (int32 -1 and int64 -1 hash
    differently), so a left int32 key column probed against a right int64
    filter would silently drop true matches — violating the no-false-
    negatives contract.  Both sides hash through the same widened type."""
    from .bucketing import hash_normalized

    h1 = hash_normalized(vals)
    h2 = h1 * np.uint64(0x9E3779B97F4A7C15) ^ np.uint64(0xD1B54A32D192ED03)
    h2 |= np.uint64(1)
    out = np.empty((len(vals), k_hashes), dtype=np.uint64)
    for i in range(k_hashes):
        out[:, i] = (h1 + np.uint64(i) * h2) % np.uint64(n_bits)
    return out


def bloom_semi_join(
    left_ds,
    right_ds,
    on: str,
    left_cols: list[str],
    n_bits: int = 1 << 23,
    k_hashes: int = 4,
):
    """Semi-join with a Bloom prefilter on the left side.

    The right side's keys compact into a Bloom filter built from mergeable
    per-batch bitmap partials (n_bits/8 bytes each, OR-merged on the
    driver, broadcast once).  Each left batch drops rows whose key cannot
    be on the right BEFORE the exchange — false negatives are impossible,
    and false positives are resolved by the exact hash join that follows.
    At a selective right side this cuts the all-to-all exchange to the
    surviving rows; 1 MiB of filter replaces shuffling the non-matching
    bulk.  Right-side partials shuffle nothing: they OR-merge in
    distributed tree rounds of ≤``_BLOOM_FANIN`` rows each, so the
    driver receives at most one fan-in of bitmap rows however many
    input blocks the right side has."""
    import ray

    n_words = n_bits // 64

    def partial_bits(t: pa.Table) -> pa.Table:
        vals = t[on].combine_chunks().to_numpy(zero_copy_only=False)
        bits = np.zeros(n_words, dtype=np.uint64)
        if len(vals):
            pos = _bloom_hashes(vals, n_bits, k_hashes).reshape(-1)
            np.bitwise_or.at(bits, (pos >> 6).astype(np.int64), np.uint64(1) << (pos & np.uint64(63)))
        return pa.table({"bits": pa.array([bits.tobytes()], pa.binary())})

    partials = right_ds.select_columns([on]).map_batches(
        partial_bits, batch_format="pyarrow"
    )
    bloom, _rows = _tree_reduce_or(partials, n_words)
    bref = ray.put(bloom)

    def prefilter(t: pa.Table) -> pa.Table:
        b = ray.get(bref)
        vals = t[on].combine_chunks().to_numpy(zero_copy_only=False)
        if not len(vals):
            return t
        pos = _bloom_hashes(vals, n_bits, k_hashes)
        hit = np.ones(len(vals), dtype=bool)
        for i in range(k_hashes):
            p = pos[:, i]
            hit &= (b[(p >> 6).astype(np.int64)] >> (p & np.uint64(63))) & np.uint64(1) != 0
        return t.filter(pa.array(hit))

    pruned = left_ds.map_batches(prefilter, batch_format="pyarrow", zero_copy_batch=True)
    return hash_join(pruned, right_ds, on=on, left_cols=left_cols, right_cols=[], how="semi")


def detect_hot_keys(ds, on: str, threshold: int = 100_000) -> set:
    """Keys whose row count exceeds ``threshold`` — combiner counts per
    batch, tiny grouped merge, driver collects only the (few) hot keys."""
    from .bucketing import bucketed_map_groups

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(on, sort=False).size().reset_index(name="_n")

    partials = ds.select_columns([on]).map_batches(
        pandas_map(partial), batch_format="pandas"
    )

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(on, sort=False)["_n"].sum().reset_index()
        return g[g["_n"] > threshold]

    from ..stages.sampling import _input_schema

    in_sch = _input_schema(ds)
    out_schema = (
        pa.schema([(on, in_sch.field(on).type), ("_n", pa.int64())])
        if in_sch is not None
        else None  # unknown input schema → AllToAll fallback route
    )
    hot = bucketed_map_groups(partials, [on], merge, out_schema=out_schema).to_pandas()
    if on not in hot.columns:  # empty result on the schema-less fallback route
        return set()
    return set(hot[on])


def salted_hash_join(
    left_ds,
    right_ds,
    on: str,
    left_cols: list[str],
    right_cols: list[str],
    hot_keys: set,
    n_salts: int = 16,
):
    """Inner equi-join that survives hot keys: a hot key's LEFT rows are
    sprayed across ``n_salts`` sub-buckets (round-robin) while its RIGHT
    rows are replicated into every sub-bucket, so no single bucket holds a
    hot key's full cross product input.  Non-hot keys join exactly as in
    :func:`hash_join` (salt 0 both sides)."""
    nb = pick_num_buckets(left_ds, None) * max(1, n_salts // 4)
    all_cols = [on, *left_cols, *right_cols]

    type_of = _type_of_map(left_ds, right_ds)

    import ray

    # broadcast the hot keys as a sorted array once; per-batch membership is
    # one vectorized np.isin, not a Python scan
    href = ray.put(np.asarray(sorted(hot_keys)))

    def tag(side: str, own: list[str]):
        def fn(t: pa.Table) -> pa.Table:
            hot_arr = ray.get(href)
            key = t[on].combine_chunks().to_numpy(zero_copy_only=False)
            is_hot = np.isin(key, hot_arr)
            # width-normalized hash: a raw pd.util.hash_array is
            # width-sensitive for negative ints (int32 -1 and int64 -1
            # hash apart), so an int32 left key against an int64 right
            # key would land the SAME key in different buckets and
            # silently drop matches — the exact hazard hash_join already
            # guards via hash_normalized
            from .bucketing import hash_normalized

            base = hash_normalized(key)
            reps = np.ones(len(key), dtype=np.int64)
            if side == "R":
                reps[is_hot] = n_salts  # replicate hot right rows
            idx = np.repeat(np.arange(len(key)), reps)
            if side == "L":
                salt = np.zeros(len(key), dtype=np.uint64)
                salt[is_hot] = np.arange(int(is_hot.sum()), dtype=np.uint64) % n_salts
                salt = salt[idx]
            else:
                # for each replicated row: salts 0..n_salts-1; non-hot → 0
                offs = np.concatenate([np.arange(r) for r in reps]) if len(reps) else np.empty(0, np.int64)
                salt = offs.astype(np.uint64)
            b = ((base[idx] * np.uint64(1000003)) ^ salt) % nb
            t2 = t.take(pa.array(idx.astype(np.int64)))
            cols = {}
            for c in all_cols:
                if c == on or c in own:
                    cols[c] = t2[c]
                else:
                    cols[c] = pa.nulls(t2.num_rows, type_of[c])
            cols["_b"] = pa.array(b.astype(np.int32))
            cols["_side"] = pa.array([side] * t2.num_rows, pa.string())
            return pa.table(cols)

        return fn

    both = left_ds.map_batches(tag("L", left_cols), batch_format="pyarrow").union(
        right_ds.map_batches(tag("R", right_cols), batch_format="pyarrow")
    )

    def join_bucket(df: pd.DataFrame) -> pd.DataFrame:
        left = df[df["_side"] == "L"][[on, *left_cols]]
        right = df[df["_side"] == "R"][[on, *right_cols]]
        return left.merge(right, on=on, how="inner")

    out_cols = [on, *left_cols, *right_cols]
    target = pa.schema([(c, type_of[c]) for c in out_cols])
    return (
        both.groupby("_b")
        .map_groups(join_bucket, batch_format="pandas")
        .map_batches(lambda t: t.select(out_cols).cast(target), batch_format="pyarrow")
    )


def auto_hash_join(
    left_ds,
    right_ds,
    on: str,
    left_cols: list[str],
    right_cols: list[str],
    hot_threshold: int = 1_000_000,
    n_salts: int = 16,
):
    """Inner join with automatic skew handling: detect over-threshold keys
    (cheap combiner pass) and route through :func:`salted_hash_join` only
    when any exist; otherwise the plain single-exchange join."""
    hot = detect_hot_keys(left_ds, on, hot_threshold)
    if hot:
        return salted_hash_join(
            left_ds, right_ds, on, left_cols, right_cols, hot_keys=hot, n_salts=n_salts
        )
    return hash_join(left_ds, right_ds, on, left_cols, right_cols, how="inner")
