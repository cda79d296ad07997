"""The flagship pipeline: transcript table → violation rows + profile.

Shape (SURVEY.md §3.4, as built):

    read_parquet (column-pruned)
      ├─ schema-level check (plan compiled against the ACTUAL table schema;
      │    static violations emitted as table-scoped rows)
      ├─ map_batches(VectorValidator, actor pool, zero-copy Arrow)
      │    → row violations (+ folded referential check, one sweep);
      │    SlowPathValidator fallback for non-vectorizable schemas
      ├─ conversation checks: ONE hash-bucketed shuffle serving
      │    uniqueness + contiguity + ts order — "bucket" (conv-colocated)
      │    or "salted" (range-split, skew-proof) strategy
      └─ map_batches(ColumnProfiler) → tree merge → profile
    union of violation streams → sort(conv_id, turn_idx) → write_parquet

`quarantine_split` additionally routes violating rows to a dead-letter
dataset via key anti-/semi-joins. Everything streams; only the profile
partials and small violation aggregates materialize on the driver.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..sources.transcripts import TRANSCRIPT_SCHEMA_JSON
from ..stages.checks import (
    contiguity_violations,
    conv_checks_violations,
    duplicate_key_violations,
    referential_violations,
    ts_order_violations,
)
from ..stages.validate import VectorValidator

__all__ = [
    "transcript_violations",
    "transcript_violations_fused",
    "transcript_violations_fused1",
    "validate_transcripts",
    "quarantine_split",
]

TRANSCRIPT_ARROW_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)

ALL_CHECKS = ("rows", "referential", "unique", "contiguity", "order")


def transcript_violations(
    ds,
    schema_json: str = TRANSCRIPT_SCHEMA_JSON,
    checks=ALL_CHECKS,
    mode: str = "first",
    concurrency: int | None = None,
    batch_size: int = 65536,
    conv_strategy: str = "bucket",
    fused: bool | None = None,
):
    """→ Dataset of violation rows, sorted by (conv_id, turn_idx).

    ``fused=None`` (default) auto-routes the full-check bucket-strategy
    configuration to :func:`transcript_violations_fused` — one input scan
    instead of two, measured 2-3.3× faster at the compute-bound scale
    (BASELINE.md, single-scan fusion A/B).  ``fused=False`` forces the
    two-scan plan (the A/B baseline)."""
    if fused is None:
        fused = tuple(checks) == ALL_CHECKS and conv_strategy == "bucket"
    elif fused and not (tuple(checks) == ALL_CHECKS and conv_strategy == "bucket"):
        # explicit fused=True with parameters the fused plans cannot
        # express — say so instead of silently running the two-scan plan
        import warnings

        warnings.warn(
            "fused=True supports only the full check set with the bucket "
            "conv strategy; falling back to the two-scan plan",
            stacklevel=2,
        )
    if fused and tuple(checks) == ALL_CHECKS and conv_strategy == "bucket":
        # single-exchange plan first (order-preserving range buckets from
        # parquet footer stats); falls back to hash buckets + final sort
        # when footer statistics are unavailable
        one = transcript_violations_fused1(
            ds,
            schema_json=schema_json,
            mode=mode,
            batch_size=batch_size,
            concurrency=concurrency,
        )
        if one is not None:
            return one
        return transcript_violations_fused(
            ds,
            schema_json=schema_json,
            mode=mode,
            batch_size=batch_size,
            concurrency=concurrency,
        )
    parts = []
    fold_referential = "rows" in checks and "referential" in checks
    if "rows" in checks:
        # Compile against the table's ACTUAL schema so shape mismatches
        # (unexpected column under additionalProperties=false, required
        # column absent entirely) surface as schema-level violation rows
        # (conv_id='', turn_idx=-1 → table-scoped) instead of being
        # silently dropped or crashing the per-batch checks.
        import ray.data as rd

        from ..core import parse as _parse
        from ..stages.checks import VIOLATION_PA_SCHEMA
        from ..vector.plan import compile_plan

        from ..vector.plan import UnsupportedPlanError

        try:
            sch = ds.schema()
            arrow_schema = pa.schema(list(zip(sch.names, sch.types)))
        except Exception:
            arrow_schema = TRANSCRIPT_ARROW_SCHEMA
        try:
            plan = compile_plan(_parse(schema_json), arrow_schema)
        except UnsupportedPlanError:
            # Schemas outside the vectorizable subset (top-level
            # composition, patternProperties, exotic column types) fall
            # back to the exact per-row engine — slower, never wrong.
            plan = None
        if plan is not None and plan.static_violations:
            rows = [
                {"conv_id": "", "turn_idx": -1, "keyword": kw, "message": msg}
                for _col, kw, msg in plan.static_violations
            ]
            parts.append(
                rd.from_arrow(pa.Table.from_pylist(rows, schema=VIOLATION_PA_SCHEMA))
            )
        if plan is not None:
            if concurrency is not None:
                # explicit pool sizing → actor pool (plan compiled once per
                # actor in __init__)
                parts.append(
                    ds.map_batches(
                        VectorValidator,
                        batch_format="pyarrow",
                        zero_copy_batch=True,
                        batch_size=batch_size,
                        concurrency=concurrency,
                        fn_constructor_kwargs=dict(
                            schema_json=schema_json,
                            arrow_schema=arrow_schema,
                            mode=mode,
                            with_referential=fold_referential,
                        ),
                    )
                )
            else:
                # default: stateless tasks + per-worker compiled-plan cache
                # — same compile-once amortization, no per-call actor-pool
                # spin-up (which dominates second-scale pipelines)
                from ..stages.validate import validate_rows_batch

                parts.append(
                    ds.map_batches(
                        validate_rows_batch,
                        batch_format="pyarrow",
                        zero_copy_batch=True,
                        batch_size=batch_size,
                        fn_kwargs=dict(
                            schema_json=schema_json,
                            arrow_schema=arrow_schema,
                            mode=mode,
                            with_referential=fold_referential,
                        ),
                    )
                )
        else:
            from ..stages.validate import validate_rows_slow_batch

            parts.append(
                ds.map_batches(
                    validate_rows_slow_batch,
                    batch_format="pyarrow",
                    zero_copy_batch=True,
                    batch_size=batch_size,
                    fn_kwargs=dict(schema_json=schema_json),
                )
            )
            if fold_referential:
                parts.append(referential_violations(ds))
    elif "referential" in checks:
        parts.append(referential_violations(ds))

    conv_wanted = tuple(c for c in ("unique", "contiguity", "order") if c in checks)
    if conv_wanted == ("unique", "contiguity", "order"):
        # One hash shuffle serves all three conversation checks.  "bucket"
        # co-locates whole conversations (bounded by the longest conv);
        # "salted" keys by (conv_id, turn_idx // R) and stitches ranges
        # via per-range summaries — skew-proof for degenerate conversations.
        if conv_strategy == "salted":
            from ..stages.checks import conv_checks_salted

            parts.append(conv_checks_salted(ds))
        elif conv_strategy == "auto":
            from ..stages.checks import conv_checks_auto

            parts.append(conv_checks_auto(ds))
        else:
            parts.append(conv_checks_violations(ds))
    else:
        if "unique" in conv_wanted:
            parts.append(duplicate_key_violations(ds))
        if "contiguity" in conv_wanted:
            parts.append(contiguity_violations(ds))
        if "order" in conv_wanted:
            parts.append(ts_order_violations(ds))
    out = parts[0]
    if len(parts) > 1:
        out = out.union(*parts[1:])
    return out.sort(["conv_id", "turn_idx", "keyword"])


def transcript_violations_fused(
    ds,
    schema_json: str = TRANSCRIPT_SCHEMA_JSON,
    mode: str = "first",
    batch_size: int = 65536,
    num_buckets: int | None = None,
    concurrency: int | None = None,
):
    """Single-scan twin of :func:`transcript_violations` (full check set,
    bucket strategy): the default plan's row branch and conv-check branch
    are two consumers of ``ds``, so the input parquet is READ TWICE.  Here
    the validator's batch pass emits BOTH the row/referential violations
    AND the conversation-check key rows (conv_id, turn_idx, ts) as one
    tagged stream; a single conv_id-hashed exchange then separates the
    tags, runs uniqueness/contiguity/ts-order on the key rows, and passes
    violation rows through untouched.  The input is scanned exactly once.

    Trade: violation rows ride the conv exchange (4 extra small columns
    per violation) in exchange for one less full input scan — wins when
    violations are sparse relative to input rows (real corpora), loses
    when they are dense (the planted test data).  Measured A/B lives in
    BASELINE.md; output is row-for-row identical to the default plan
    (tests/test_round3.py::test_fused_equals_default)."""
    import numpy as np
    import pandas as pd  # noqa: F401  (bucket hash)
    import ray.data as rd

    from ..core import parse as _parse
    from ..stages.checks import (
        EMPTY_VIOLATIONS,
        VIOLATION_PA_SCHEMA,
        _run_bucket,
    )
    from ..stages.bucketing import pick_num_buckets
    from ..stages.validate import validate_rows_batch
    from ..vector.plan import UnsupportedPlanError, compile_plan

    try:
        sch = ds.schema()
        arrow_schema = pa.schema(list(zip(sch.names, sch.types)))
    except Exception:
        arrow_schema = TRANSCRIPT_ARROW_SCHEMA
    try:
        plan = compile_plan(_parse(schema_json), arrow_schema)
    except UnsupportedPlanError:
        plan = None
    if plan is None:
        # non-vectorizable schema → the two-scan plan's exact fallback
        return transcript_violations(
            ds, schema_json=schema_json, mode=mode, fused=False
        )

    statics = None
    if plan.static_violations:
        rows = [
            {
                "conv_id": "",
                "turn_idx": -1,
                "keyword": kw,
                "message": msg,
            }
            for _col, kw, msg in plan.static_violations
        ]
        statics = rd.from_arrow(pa.Table.from_pylist(rows, schema=VIOLATION_PA_SCHEMA))

    def fused_batch(batch: pa.Table) -> pa.Table:
        viol = validate_rows_batch(
            batch,
            schema_json=schema_json,
            arrow_schema=arrow_schema,
            mode=mode,
            with_referential=True,
        )
        nv = viol.num_rows
        n = batch.num_rows
        viol_t = pa.table(
            {
                "conv_id": viol["conv_id"].cast(pa.string()),
                "turn_idx": viol["turn_idx"].cast(pa.int32()),
                "keyword": viol["keyword"],
                "message": viol["message"],
                "ts": pa.nulls(nv, pa.timestamp("us")),
                "_tag": pa.array(np.full(nv, 1, dtype=np.int8)),
            }
        )
        conv_t = pa.table(
            {
                "conv_id": batch["conv_id"].cast(pa.string()),
                "turn_idx": batch["turn_idx"].cast(pa.int32()),
                "keyword": pa.nulls(n, pa.string()),
                "message": pa.nulls(n, pa.string()),
                "ts": batch["ts"].cast(pa.timestamp("us")),
                "_tag": pa.array(np.zeros(n, dtype=np.int8)),
            }
        )
        return pa.concat_tables([viol_t, conv_t])

    nb = pick_num_buckets(ds, num_buckets)

    def add_bucket(t: pa.Table) -> pa.Table:
        conv = t["conv_id"].combine_chunks().to_numpy(zero_copy_only=False)
        b = (pd.util.hash_array(conv.astype(object)) % nb).astype(np.int32)
        return t.append_column("_b", pa.array(b, pa.int32()))

    def run_fused_bucket(df) -> pa.Table:
        tag = df["_tag"].to_numpy()
        parts = []
        viol = df[tag == 1]
        if len(viol):
            parts.append(
                pa.table(
                    {
                        "conv_id": pa.array(viol["conv_id"], pa.string()),
                        "turn_idx": pa.array(
                            viol["turn_idx"].to_numpy(), pa.int32()
                        ),
                        "keyword": pa.array(viol["keyword"], pa.string()),
                        "message": pa.array(viol["message"], pa.string()),
                    }
                )
            )
        conv = df[tag == 0]
        if len(conv):
            cc = _run_bucket(
                conv[["conv_id", "turn_idx", "ts"]],
                ("unique", "contiguity", "order"),
            )
            if cc.num_rows:
                parts.append(cc)
        if not parts:
            return EMPTY_VIOLATIONS
        return pa.concat_tables(parts)

    empty = VIOLATION_PA_SCHEMA.empty_table()

    def stamp(t: pa.Table) -> pa.Table:
        # empty sort partitions pass through schemaless (UDF never called)
        if t.num_rows == 0:
            return empty
        return (
            t
            if t.schema == VIOLATION_PA_SCHEMA
            else t.select(VIOLATION_PA_SCHEMA.names).cast(VIOLATION_PA_SCHEMA)
        )

    out = (
        ds.map_batches(
            fused_batch,
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
        )
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(
            lambda g: run_fused_bucket(g.drop(columns=["_b"])),
            batch_format="pandas",
        )
        .map_batches(stamp, batch_format="pyarrow")
    )
    if statics is not None:
        out = out.union(statics)
    return out.sort(["conv_id", "turn_idx", "keyword"])


def _conv_range_bucketer(ds, nb: int):
    """Order-preserving conv_id → bucket map from parquet footer
    statistics, or None when unavailable.

    The fused pipeline's exchange only needs whole-conversation
    co-location; a HASH bucket gives that but scrambles order, forcing a
    second all-to-all to sort the output.  A bucket map that is MONOTONE
    in conv_id gives co-location AND leaves the bucket sequence globally
    ordered, so sorting within each bucket yields fully sorted output —
    one exchange instead of two.

    Boundaries are EMPIRICAL quantiles of the per-row-group min/max
    conv_id statistics (parquet footers — metadata only, no scan): row
    groups hold ~equal row counts, so their min/max values sample the id
    distribution regardless of id format or file ordering.  Arithmetic
    interpolation of the [min, max] byte range is NOT used — decimal ids
    occupy ~4% of each byte position, so interpolated boundaries land in
    empty regions and collapse the bucket count.  Rows route via
    ``np.searchsorted`` on fixed-width byte strings, which compares
    exactly like Arrow's string sort (UTF-8 preserves codepoint order,
    so this holds for all unicode; prefix truncation is weakly monotone,
    equal-prefix ids just share a bucket).  Sample skew degrades
    balance, never correctness or order.  Null conv_id rows get the
    last bucket, where the in-bucket sort places them last (Ray sort
    parity)."""
    try:
        files = ds.input_files()
        if not files:
            return None
        import pyarrow.parquet as pq

        # Boundaries are quantiles of a SAMPLE — any subset of row groups
        # gives valid (order-preserving) boundaries, only balance varies.
        # So cap the footers read: at ≥10⁵ input files a serial
        # every-footer loop would be the startup bottleneck.  Evenly
        # spaced files keep coverage across the id range whatever the
        # file ordering; a thread pool overlaps the metadata IO.
        MAX_FILES = 64
        if len(files) > MAX_FILES:
            pick = np.linspace(0, len(files) - 1, MAX_FILES).astype(int)
            files = [files[i] for i in np.unique(pick)]

        def file_stats(f: str) -> list[str] | None:
            md = pq.read_metadata(f)
            idx = md.schema.to_arrow_schema().get_field_index("conv_id")
            if idx < 0:
                return None
            out: list[str] = []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                if st is None or not st.has_min_max:
                    return None
                mn, mx = st.min, st.max
                if isinstance(mn, bytes):
                    mn, mx = mn.decode(), mx.decode()
                out.append(mn)
                out.append(mx)
            return out

        if len(files) > 1:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=min(16, len(files))) as ex:
                per_file = list(ex.map(file_stats, files))
        else:
            per_file = [file_stats(files[0])]
        if any(p is None for p in per_file):
            return None
        sample: list[str] = [s for p in per_file for s in p]
        if not sample:
            return None
        enc = sorted(s.encode() for s in sample)
        W = max(16, max(len(b) for b in enc))
        m = len(enc)
        bnds = np.unique(
            np.array(
                [enc[m * k // nb] for k in range(1, nb)], dtype=f"S{W}"
            )
        )

        def bucket_of(conv_np: np.ndarray) -> np.ndarray:
            isnull = np.array([c is None for c in conv_np])
            safe = np.where(isnull, "", conv_np)
            # UTF-8 bytes compare exactly like Arrow's string sort for ALL
            # unicode (UTF-8 preserves codepoint order); S{W} truncation is
            # weakly monotone, so routing stays order-preserving
            keys = np.char.encode(np.asarray(safe, dtype=str), "utf-8").astype(
                f"S{W}"
            )
            b = np.searchsorted(bnds, keys, side="right").astype(np.int32)
            b[isnull] = len(bnds) + 1  # nulls last, matching Ray sort
            return b

        return bucket_of
    except Exception:
        return None


def transcript_violations_fused1(
    ds,
    schema_json: str = TRANSCRIPT_SCHEMA_JSON,
    mode: str = "first",
    batch_size: int = 65536,
    num_buckets: int | None = None,
    concurrency: int | None = None,
):
    """Single-EXCHANGE twin of :func:`transcript_violations_fused`.

    The two-exchange fused plan hash-buckets the tagged stream (all-to-all
    #1) and then sorts the violations (all-to-all #2).  Here the bucket
    map is :func:`_conv_range_bucketer` — monotone in conv_id — so bucket
    order IS global order: each bucket runs the conversation checks and
    emits its violations fully sorted by (conv_id, turn_idx, keyword),
    and the concatenated bucket outputs need NO final sort.  Per-operator
    stats showed each all-to-all carries seconds of fixed latency at
    sandbox scale and half the moved bytes at any scale, so this is the
    default route whenever footer statistics allow it; callers fall back
    to the hash+sort plan otherwise (returns None here)."""
    import ray.data as rd

    from ..core import parse as _parse
    from ..stages.bucketing import pick_num_buckets
    from ..stages.checks import (
        EMPTY_VIOLATIONS,
        VIOLATION_PA_SCHEMA,
        _run_bucket,
    )
    from ..stages.validate import validate_rows_batch
    from ..vector.plan import UnsupportedPlanError, compile_plan

    try:
        sch = ds.schema()
        arrow_schema = pa.schema(list(zip(sch.names, sch.types)))
    except Exception:
        arrow_schema = TRANSCRIPT_ARROW_SCHEMA
    try:
        plan = compile_plan(_parse(schema_json), arrow_schema)
    except UnsupportedPlanError:
        return None
    if plan is None:
        return None

    nb = pick_num_buckets(ds, num_buckets)
    bucket_of = _conv_range_bucketer(ds, nb)
    if bucket_of is None:
        return None

    statics = None
    if plan.static_violations:
        rows = sorted(
            (
                {"conv_id": "", "turn_idx": -1, "keyword": kw, "message": msg}
                for _col, kw, msg in plan.static_violations
            ),
            key=lambda r: (r["keyword"], r["message"]),
        )
        statics = rd.from_arrow(pa.Table.from_pylist(rows, schema=VIOLATION_PA_SCHEMA))

    def fused_batch(batch: pa.Table) -> pa.Table:
        viol = validate_rows_batch(
            batch,
            schema_json=schema_json,
            arrow_schema=arrow_schema,
            mode=mode,
            with_referential=True,
        )
        nv = viol.num_rows
        n = batch.num_rows
        viol_t = pa.table(
            {
                "conv_id": viol["conv_id"].cast(pa.string()),
                "turn_idx": viol["turn_idx"].cast(pa.int32()),
                "keyword": viol["keyword"],
                "message": viol["message"],
                "ts": pa.nulls(nv, pa.timestamp("us")),
                "_tag": pa.array(np.full(nv, 1, dtype=np.int8)),
            }
        )
        conv_t = pa.table(
            {
                "conv_id": batch["conv_id"].cast(pa.string()),
                "turn_idx": batch["turn_idx"].cast(pa.int32()),
                "keyword": pa.nulls(n, pa.string()),
                "message": pa.nulls(n, pa.string()),
                "ts": batch["ts"].cast(pa.timestamp("us")),
                "_tag": pa.array(np.zeros(n, dtype=np.int8)),
            }
        )
        return pa.concat_tables([viol_t, conv_t])

    def add_bucket(t: pa.Table) -> pa.Table:
        conv = t["conv_id"].combine_chunks().to_numpy(zero_copy_only=False)
        return t.append_column("_b", pa.array(bucket_of(conv), pa.int32()))

    def run_sorted_bucket(df) -> pa.Table:
        tag = df["_tag"].to_numpy()
        parts = []
        viol = df[tag == 1]
        if len(viol):
            parts.append(
                viol[["conv_id", "turn_idx", "keyword", "message"]]
            )
        conv = df[tag == 0]
        if len(conv):
            cc = _run_bucket(
                conv[["conv_id", "turn_idx", "ts"]],
                ("unique", "contiguity", "order"),
            )
            if cc.num_rows:
                parts.append(cc.to_pandas())
        if not parts:
            return EMPTY_VIOLATIONS
        import pandas as pd

        allp = pd.concat(parts, ignore_index=True)
        # the bucket sequence is conv-ordered (monotone bucketer), so a
        # full in-bucket sort yields GLOBALLY sorted output — the final
        # all-to-all sort of the hash plan disappears
        allp = allp.sort_values(
            ["conv_id", "turn_idx", "keyword"], kind="stable", na_position="last"
        )
        return pa.table(
            {
                "conv_id": pa.array(allp["conv_id"], pa.string()),
                "turn_idx": pa.array(allp["turn_idx"].to_numpy(), pa.int32()),
                "keyword": pa.array(allp["keyword"], pa.string()),
                "message": pa.array(allp["message"], pa.string()),
            }
        )

    empty = VIOLATION_PA_SCHEMA.empty_table()

    def stamp(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty
        return (
            t
            if t.schema == VIOLATION_PA_SCHEMA
            else t.select(VIOLATION_PA_SCHEMA.names).cast(VIOLATION_PA_SCHEMA)
        )

    out = (
        ds.map_batches(
            fused_batch,
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
        )
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(
            lambda g: run_sorted_bucket(g.drop(columns=["_b"])),
            batch_format="pandas",
        )
        .map_batches(stamp, batch_format="pyarrow")
    )
    if statics is not None:
        # '' sorts before every real conv id, so statics lead the stream
        out = statics.union(out)
    return out


def validate_transcripts(
    input_path: str,
    out_dir: str | None = None,
    schema_json: str = TRANSCRIPT_SCHEMA_JSON,
    checks=ALL_CHECKS,
    mode: str = "first",
    profile: bool = False,
    concurrency: int | None = None,
):
    """Read → validate → (optionally) write + profile.  Returns a dict."""
    import ray.data as rd

    ds = rd.read_parquet(input_path)
    violations = transcript_violations(
        ds, schema_json=schema_json, checks=checks, mode=mode, concurrency=concurrency
    )
    result = {"violations": violations}
    if profile:
        from ..stages.stats import profile_dataset

        result["profile"] = profile_dataset(rd.read_parquet(input_path))
    if out_dir is not None:
        violations.write_parquet(out_dir)
        result["out_dir"] = out_dir
    return result


def quarantine_split(
    ds,
    schema_json: str = TRANSCRIPT_SCHEMA_JSON,
    key_cols=("conv_id", "turn_idx"),
):
    """Dead-letter routing: → (clean_ds, quarantined_ds).

    Row-level violations decide membership; the violating keys are
    anti-/semi-joined back against the input (one aligned hash exchange
    each), so the full rows are never collected on the driver and the
    text column never shuffles with the violation keys."""
    from ..stages.joins import hash_join

    viol_keys = (
        transcript_violations(ds, schema_json=schema_json, checks=("rows",))
        .map_batches(
            lambda t: t.select(list(key_cols)),
            batch_format="pyarrow",
        )
    )
    # composite key → single join key (hash of the pair)
    import pandas as pd

    def keyed(d):
        def fn(t: pa.Table) -> pa.Table:
            import numpy as np

            conv = t[key_cols[0]].combine_chunks().to_numpy(zero_copy_only=False)
            turn = t[key_cols[1]].combine_chunks().to_numpy(zero_copy_only=False)
            k = pd.util.hash_array(conv.astype(object)) * np.uint64(1000003) ^ pd.util.hash_array(
                turn.astype(np.int64)
            )
            return t.append_column("_k", pa.array(k.astype(np.int64)))

        return d.map_batches(fn, batch_format="pyarrow")

    left = keyed(ds)
    right = keyed(viol_keys).map_batches(
        lambda t: t.select(["_k"]), batch_format="pyarrow"
    )
    cols = [c for c in ds.schema().names]
    clean = hash_join(left, right, on="_k", left_cols=cols, right_cols=[], how="anti")
    bad = hash_join(left, right, on="_k", left_cols=cols, right_cols=[], how="semi")
    drop = lambda d: d.map_batches(  # noqa: E731
        lambda t: t.drop_columns(["_k"]), batch_format="pyarrow"
    )
    return drop(clean), drop(bad)
