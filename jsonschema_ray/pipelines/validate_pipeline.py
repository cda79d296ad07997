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

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..sources.transcripts import TRANSCRIPT_SCHEMA_JSON
from ..stages.checks import (
    contiguity_violations,
    conv_checks_violations,
    duplicate_key_violations,
    referential_violations,
    ts_order_violations,
)
from ..stages.bucketing import from_pandas_clean
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
    sort: bool = True,
):
    """→ Dataset of violation rows, sorted by (conv_id, turn_idx).

    ``sort=False`` skips the final ordering exchange on the two-scan
    parts plan — for consumers that only need the violation SET (joins,
    counts); the fused routes always emit sorted output.

    ``fused=None`` (default) auto-routes the full-check bucket-strategy
    configuration to :func:`transcript_violations_fused` — one input scan
    instead of two, measured 2-3.3× faster at the compute-bound scale
    (BASELINE.md, single-scan fusion A/B).  ``fused=False`` forces the
    two-scan plan (the A/B baseline)."""
    # fail loud on bad check selections: a typo ('uniqe') would otherwise
    # silently drop coverage, and an empty tuple crashed with a bare
    # IndexError at plan-assembly time
    unknown = set(checks) - set(ALL_CHECKS)
    if unknown:
        raise ValueError(
            f"unknown checks {sorted(unknown)}; valid names: {list(ALL_CHECKS)}"
        )
    if not checks:
        raise ValueError("checks must name at least one of " + str(list(ALL_CHECKS)))
    conv_only = "rows" not in checks and set(checks) == {
        "referential",
        "unique",
        "contiguity",
        "order",
    }
    if fused is None:
        fused = (
            tuple(checks) == ALL_CHECKS or conv_only
        ) and conv_strategy == "bucket"
    elif fused and not (
        (tuple(checks) == ALL_CHECKS or conv_only) and conv_strategy == "bucket"
    ):
        # explicit fused=True with parameters the fused plans cannot
        # express — say so instead of silently running the two-scan plan
        import warnings

        warnings.warn(
            "fused=True supports only the full check set with the bucket "
            "conv strategy; falling back to the two-scan plan",
            stacklevel=2,
        )
    if fused and tuple(checks) == ALL_CHECKS and conv_strategy == "bucket":
        # hot-conversation guard: a conversation too large for one reduce
        # task (estimated from parquet footer statistics — no data IO) is
        # excluded from the fused plan's conv exchange and checked by the
        # skew-proof salted kernel instead
        hot = _hot_conversations(ds, _hot_conv_threshold()) or frozenset()
        if hot:
            return _fused_with_hot_split(
                ds,
                hot,
                schema_json=schema_json,
                mode=mode,
                batch_size=batch_size,
                concurrency=concurrency,
            )
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
    if fused and conv_only and conv_strategy == "bucket":
        # conv-checks-only fused route: same single-exchange plan with
        # the keyword pass swapped for the per-batch referential kernel —
        # one scan + one exchange instead of two scans + hash exchange +
        # final sort.  A degenerate (hot) conversation gets the same
        # salted split as the full-check route (its bucketed exchange is
        # just as skew-exposed as the fused one); missing footer stats
        # fall through to the parts plan below.
        hot = _hot_conversations(ds, _hot_conv_threshold()) or frozenset()
        if hot:
            return _fused_with_hot_split(
                ds,
                hot,
                schema_json=schema_json,
                mode=mode,
                batch_size=batch_size,
                concurrency=concurrency,
                keywords=False,
            )
        one = transcript_violations_fused1(
            ds,
            schema_json=schema_json,
            mode=mode,
            batch_size=batch_size,
            concurrency=concurrency,
            keywords=False,
        )
        if one is not None:
            return one
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
    return out.sort(["conv_id", "turn_idx", "keyword"]) if sort else out


def _maybe_coalesce_read(ds):
    """Re-plan a BARE parquet read with cluster-sized blocks.

    Ray's default read parallelism targets hundreds of small blocks; every
    block then costs the sort exchange a (map-block × reduce-partition)
    object transfer, and at sandbox scale that overhead IS the exchange
    (measured: 6M-turn upstream+sort 10.4 s at 81 blocks → 3.7 s at 16,
    same 8 CPUs).  One block per ~half-core, capped at ~256 MB, keeps the
    transfer matrix small here and block size bounded at 100 TB (where
    the byte cap, not the CPU count, decides).  Only a dataset that is
    exactly a parquet read is re-planned — anything with upstream
    transforms is returned untouched.  Column projection is carried over;
    a read with any other pushed-down scan kwarg (row filter, …) is left
    alone rather than silently widened."""
    try:
        op = ds._logical_plan.dag
        if type(op).__name__ != "Read":
            return ds
        if getattr(op, "_parallelism", -1) != -1:
            return ds  # caller chose a block count — respect it
        src = getattr(op, "_datasource", None)
        if type(src).__name__ != "ParquetDatasource":
            return ds
        # any read configuration the re-plan cannot reproduce → leave the
        # read alone (row filters, schema overrides, read-time UDFs,
        # hive partition columns)
        if getattr(src, "_to_batches_kwargs", None):
            return ds
        if getattr(src, "_read_schema", None) is not None:
            return ds
        if getattr(src, "_block_udf", None) is not None:
            return ds
        if getattr(src, "_partition_columns", None):
            return ds
        # include_paths adds a column the re-issued read would drop —
        # and the schema change would surface at EXECUTION time, outside
        # this try/except — so leave such reads alone.  The resolved
        # filesystem (possibly a custom authenticated one) and the
        # partitioning are CARRIED THROUGH instead: both always exist on
        # the installed Ray's ParquetDatasource, defaults included.
        if getattr(src, "_include_paths", False):
            return ds
        columns = getattr(src, "_data_columns", None)
        files = ds.input_files()
        if not files:
            return ds
        import ray
        import ray.data as rd

        from ..stages.bucketing import _plan_size_estimate

        cpus = int(ray.cluster_resources().get("CPU", 8))
        est = _plan_size_estimate(ds) or 0
        bpc = int(os.environ.get("GRAFT_READ_BLOCKS_PER_CPU", "2"))
        k = max(bpc * cpus, int(est // (256 << 20)) + 1)
        kwargs = {}
        if getattr(src, "_filesystem", None) is not None:
            kwargs["filesystem"] = src._filesystem
        if getattr(src, "_partitioning", None) is not None:
            kwargs["partitioning"] = src._partitioning
        return rd.read_parquet(
            files, columns=columns, override_num_blocks=k, **kwargs
        )
    except Exception:
        return ds


def _hot_conv_threshold() -> int:
    return int(os.environ.get("GRAFT_HOT_CONV_ROWS", str(2_000_000)))


_HOTCONV_CACHE: dict = {}
_NO_STATS = "no_stats"  # cached verdict: footer statistics unavailable


def _parquet_leaf_index(md, name: str) -> int:
    """Parquet LEAF-column index of the top-level primitive column ``name``.

    Row-group statistics are addressed by leaf (depth-first flattened)
    index, which diverges from the Arrow top-level field index as soon as
    any earlier column is nested — e.g. a struct column before conv_id
    shifts every later leaf, so an Arrow ``get_field_index`` lookup would
    silently read an unrelated leaf's min/max.  Matching on the leaf
    ``path`` is the only safe lookup."""
    for i in range(md.num_columns):
        if md.schema.column(i).path == name:
            return i
    return -1


def _files_fingerprint(files) -> str:
    """Digest of the file listing plus local (mtime_ns, size) per file, so
    a dataset rewritten in place at the same paths invalidates cached
    footer-derived state; non-statable paths (object stores) contribute
    the path alone.  Also keeps cache keys O(1)-sized instead of holding
    a tuple of every input path."""
    import hashlib
    import os as _os

    h = hashlib.blake2b(digest_size=16)
    for f in files:
        h.update(str(f).encode())
        h.update(b"|")  # unambiguous record: path|stat\0
        try:
            st = _os.stat(f)
            h.update(b"%d:%d" % (st.st_mtime_ns, st.st_size))
        except OSError:
            pass
        h.update(b"\0")
    return h.hexdigest()


def _file_conv_counts(f: str):
    """Per-conversation row counts provable from ONE parquet file's footer
    (row groups whose conv_id min == max lie wholly inside that
    conversation).  → list[(conv_id, rows)] or None when any group lacks
    statistics."""
    import pyarrow.parquet as pq

    md = pq.read_metadata(f)
    idx = _parquet_leaf_index(md, "conv_id")
    if idx < 0:
        return None
    out = []
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        st = g.column(idx).statistics
        if st is None or not st.has_min_max:
            return None
        mn, mx = st.min, st.max
        if isinstance(mn, bytes):
            mn, mx = mn.decode(), mx.decode()
        if mn == mx:
            out.append((mn, g.num_rows))
    return out


def _slice_conv_counts(files: list, cutoff: int):
    """Footer scan of one contiguous slice of the file listing (runs as a
    Ray task at large file counts): merged per-conv counts, returning only
    conversations with slice-local count > ``cutoff`` so the driver merge
    stays small.  None ⇒ statistics unavailable somewhere in the slice."""
    counts: dict[str, int] = {}
    for f in files:
        per = _file_conv_counts(f)
        if per is None:
            return None
        for conv, n in per:
            counts[conv] = counts.get(conv, 0) + n
    return {c: n for c, n in counts.items() if n > cutoff}


def _hot_conversations(ds, hot_threshold: int):
    """Conversations whose row count exceeds ``hot_threshold``, computed
    from parquet footer statistics only — no data IO.

    A row group whose conv_id min == max lies entirely inside ONE
    conversation, so summing such groups' row counts per value
    lower-bounds that conversation's size (the two edge groups per file
    are missed — an undercount of at most two row groups, irrelevant at
    guard thresholds).  Every file's footer is read: ≤512 files locally
    via a thread pool, above that as Ray tasks over contiguous 64-file
    slices of the listing (footers are a few KB each — 100k files is
    seconds of cluster-parallel metadata IO, and sampling instead was
    measured blind: a hot conversation spanning 60 of 100k files
    intersects an evenly spaced 512-file sample ~0 times).  Each slice
    task keeps only conversations with > threshold/64 slice-local rows,
    and the merged total flags at > threshold/2 — so a conversation is
    detected as long as its rows touch ≤32 dropped slices (any layout
    that keeps a conversation's files roughly contiguous, as range-
    partitioned or ingest-ordered writes do, touches ~2).  Over-flagging
    is bounded by 2× (convs above threshold/2) and only costs the salted
    reroute, never correctness.  Returns None when footer statistics are
    unavailable (detection off; callers keep the plain plan, matching
    the pre-guard behavior)."""
    try:
        files = ds.input_files()
        if not files:
            return None
        key = (_files_fingerprint(files), int(hot_threshold))
        hit = _HOTCONV_CACHE.get(key)
        if hit is not None:
            # the no-statistics verdict is cached too — otherwise every
            # call over a stats-less dataset repeats the full footer sweep
            return None if hit is _NO_STATS else hit

        def _verdict(v):
            # bounded cache with single-entry (oldest-first) eviction —
            # clearing wholesale would force every other cached dataset
            # back through its footer sweep
            if len(_HOTCONV_CACHE) > 32:
                _HOTCONV_CACHE.pop(next(iter(_HOTCONV_CACHE)))
            _HOTCONV_CACHE[key] = _NO_STATS if v is None else v
            return v

        MAX_LOCAL_FILES = 512
        counts: dict[str, int] = {}
        if len(files) <= MAX_LOCAL_FILES:
            if len(files) > 1:
                from concurrent.futures import ThreadPoolExecutor

                with ThreadPoolExecutor(max_workers=min(16, len(files))) as ex:
                    per_file = list(ex.map(_file_conv_counts, files))
            else:
                per_file = [_file_conv_counts(files[0])]
            if any(p is None for p in per_file):
                return _verdict(None)
            for per in per_file:
                for conv, n in per:
                    counts[conv] = counts.get(conv, 0) + n
            flag_at = hot_threshold
        else:
            import ray as _ray

            cutoff = max(1, hot_threshold // 64)
            scan = _ray.remote(num_cpus=0.25)(_slice_conv_counts)
            refs = [
                scan.remote(files[i : i + 64], cutoff)
                for i in range(0, len(files), 64)
            ]
            for part in _ray.get(refs):
                if part is None:
                    return _verdict(None)
                for conv, n in part.items():
                    counts[conv] = counts.get(conv, 0) + n
            flag_at = hot_threshold // 2
        hot = frozenset(c for c, n in counts.items() if n > flag_at)
        return _verdict(hot)
    except Exception:
        # transient failures (listing races, IO) are NOT cached — the next
        # call retries the sweep
        return None


def _fused_with_hot_split(
    ds,
    hot,
    schema_json: str,
    mode: str,
    batch_size: int,
    concurrency: int | None,
    keywords: bool = True,
):
    """Degenerate-skew escape hatch for the fused headline plan.

    Conversations in ``hot`` are excluded from the fused plan's conv
    exchange (their ROW validations still run in the one main scan), and
    their uniqueness/contiguity/order checks run through
    :func:`~jsonschema_ray.stages.checks.conv_checks_salted`, whose
    (conv_id, turn_idx // R) keying bounds every shuffle group.  Conv
    checks are per-conversation independent, so partitioning the
    conversations between the two kernels is exactly equivalent to one
    kernel over all of them (differential:
    tests/test_round5.py::test_hot_conversation_guard).  Costs one extra
    filtered 3-column scan — only ever paid on degenerate inputs.

    ``keywords=False`` is the CHECKS-ONLY twin (referential + conv
    checks, no per-row keyword plan) — same split, referential still
    covers every row in the main scan."""
    import pyarrow.compute as pc

    from ..stages.checks import conv_checks_salted

    main = transcript_violations_fused1(
        ds,
        schema_json=schema_json,
        mode=mode,
        batch_size=batch_size,
        concurrency=concurrency,
        exclude_convs=hot,
        keywords=keywords,
    )
    if main is None and keywords:
        main = transcript_violations_fused(
            ds,
            schema_json=schema_json,
            mode=mode,
            batch_size=batch_size,
            concurrency=concurrency,
            exclude_convs=hot,
        )
    if main is None:
        # checks-only and the range bucketer bailed: compose from parts,
        # conv checks still split cold (bucketed) / hot (salted) so the
        # degenerate conversation never lands whole in one reduce task
        from ..stages.checks import conv_checks_violations, referential_violations

        drop_hot = _exclude_filter(hot)
        cold_keys = ds.select_columns(["conv_id", "turn_idx", "ts"]).map_batches(
            drop_hot, batch_format="pyarrow", zero_copy_batch=True
        )
        main = referential_violations(ds).union(conv_checks_violations(cold_keys))
    hot_arr = pa.array(sorted(hot), pa.string())

    def keep_hot(t: pa.Table) -> pa.Table:
        mask = pc.fill_null(pc.is_in(t["conv_id"], value_set=hot_arr), False)
        return t.filter(mask)

    hot_keys = ds.select_columns(["conv_id", "turn_idx", "ts"]).map_batches(
        keep_hot, batch_format="pyarrow", zero_copy_batch=True
    )
    salted = conv_checks_salted(hot_keys)
    return main.union(salted).sort(["conv_id", "turn_idx", "keyword"])


def _exclude_filter(exclude_convs):
    """→ callable dropping rows whose conv_id is in the hot set (None when
    no exclusion).  Null conv_ids are never dropped (fill_null False)."""
    if not exclude_convs:
        return None
    import pyarrow.compute as pc

    arr = pa.array(sorted(exclude_convs), pa.string())

    def drop_hot(t: pa.Table) -> pa.Table:
        mask = pc.fill_null(pc.is_in(t["conv_id"], value_set=arr), False)
        return t.filter(pc.invert(mask))

    return drop_hot


def transcript_violations_fused(
    ds,
    schema_json: str = TRANSCRIPT_SCHEMA_JSON,
    mode: str = "first",
    batch_size: int = 65536,
    num_buckets: int | None = None,
    concurrency: int | None = None,
    exclude_convs=None,
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
    (tests/test_round3.py::test_fused_equals_default).

    ``exclude_convs`` (internal, passed by the hot-split route) drops the
    named conversations from the conv-check branch; on the slow-path
    fallback the result is UNSORTED — the hot-split caller sorts the
    final union once."""
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

    ds = _maybe_coalesce_read(ds)
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
        # non-vectorizable schema → the two-scan plan's exact fallback.
        # exclude_convs must survive the downgrade: conv checks run only
        # on the COLD conversations (the caller covers hot via the salted
        # kernel) — otherwise every hot conversation's unique/contiguity/
        # order violations are emitted twice and the skew the guard
        # exists for comes back through the fallback
        if not exclude_convs:
            return transcript_violations(
                ds, schema_json=schema_json, mode=mode, fused=False
            )
        from ..stages.checks import conv_checks_violations

        rowsref = transcript_violations(
            ds,
            schema_json=schema_json,
            mode=mode,
            fused=False,
            checks=("rows", "referential"),
            sort=False,  # the hot-split caller sorts the final union once
        )
        cold = ds.select_columns(["conv_id", "turn_idx", "ts"]).map_batches(
            _exclude_filter(exclude_convs),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        # no sort here either: exclude_convs is only ever passed by
        # _fused_with_hot_split, which sorts after unioning the salted
        # stream — sorting three times paid two wasted all-to-alls
        return rowsref.union(conv_checks_violations(cold))

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

    drop_hot = _exclude_filter(exclude_convs)

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
        if drop_hot is not None:
            conv_t = drop_hot(conv_t)
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
                        # from_pandas: a 'required' violation on a null
                        # turn_idx floats to NaN through pandas, and a
                        # raw pa.array(..., int32) would raise on it —
                        # NaN must come back as a NULL turn_idx
                        "turn_idx": pa.Array.from_pandas(
                            viol["turn_idx"], type=pa.int32()
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
        # footer statistics are immutable for a given file set — cache the
        # computed boundaries so repeated runs over the same input (bench
        # passes, retried pipelines) skip the metadata reads entirely; the
        # fingerprint folds in local mtime/size so in-place rewrites at
        # the same paths don't serve stale boundaries
        cache_key = (_files_fingerprint(files), nb)
        cached = _BUCKETER_CACHE.get(cache_key)
        if cached is not None:
            return _make_bucket_of(*cached)
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
            idx = _parquet_leaf_index(md, "conv_id")
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
        if len(_BUCKETER_CACHE) > 32:
            _BUCKETER_CACHE.pop(next(iter(_BUCKETER_CACHE)))
        _BUCKETER_CACHE[cache_key] = (bnds, W)
        return _make_bucket_of(bnds, W)
    except Exception:
        return None


_BUCKETER_CACHE: dict = {}


def _make_bucket_of(bnds: np.ndarray, W: int):
    def bucket_of(conv_col) -> np.ndarray:
        # UTF-8 bytes compare exactly like Arrow's string sort for ALL
        # unicode (UTF-8 preserves codepoint order); S{W} truncation is
        # weakly monotone, so routing stays order-preserving
        if isinstance(conv_col, (pa.Array, pa.ChunkedArray)):
            # hot path: pad the Arrow string buffer into fixed-width
            # byte keys with ONE vectorized gather — no per-row Python
            # (np.char.encode was the headline plan's biggest kernel)
            from ..stages.tokhash import _string_bytes_view

            arr = (
                conv_col.combine_chunks()
                if isinstance(conv_col, pa.ChunkedArray)
                else conv_col
            )
            n = len(arr)
            isnull = np.zeros(n, dtype=bool)
            if arr.null_count:
                isnull = np.asarray(arr.is_null())
                arr = arr.fill_null("")
            data, offsets = _string_bytes_view(arr)
            lens = np.minimum(np.diff(offsets), W).astype(np.int64)
            out = np.zeros(n * W, dtype=np.uint8)
            total = int(lens.sum())
            if total:
                starts = offsets[:-1]
                reps = np.repeat(starts, lens)
                cum = np.zeros(n, dtype=np.int64)
                np.cumsum(lens[:-1], out=cum[1:])
                intra = np.arange(total, dtype=np.int64) - np.repeat(cum, lens)
                out[np.repeat(np.arange(n, dtype=np.int64) * W, lens) + intra] = (
                    data[reps + intra]
                )
            keys = out.view(f"S{W}")
        else:
            conv_np = conv_col
            isnull = np.array([c is None for c in conv_np])
            safe = np.where(isnull, "", conv_np)
            keys = np.char.encode(np.asarray(safe, dtype=str), "utf-8").astype(
                f"S{W}"
            )
        b = np.searchsorted(bnds, keys, side="right").astype(np.int32)
        b[isnull] = len(bnds) + 1  # nulls last, matching Ray sort
        return b

    # true partition-id range: 0..len(bnds) from searchsorted, plus the
    # null bucket — consumers that pre-allocate per-bucket slots (the
    # direct exchange) read this instead of assuming nb
    bucket_of.nparts = len(bnds) + 2
    return bucket_of


def _sort_violations(t: pa.Table) -> pa.Table:
    """Sort a violations table by (conv_id, turn_idx, keyword).

    Equivalent to Arrow's multi-key ``sort_indices`` but ~1.8× faster on
    violation-shaped data: the two string keys are dictionary-encoded in
    C++, the (small) dictionaries ranked, and one numpy ``lexsort`` over
    the integer codes orders the rows — no per-row string comparisons.
    Falls back to the Arrow sort when any key column holds nulls (the
    engine never emits null keys; defensive only)."""
    import pyarrow.compute as pc

    keys = [
        ("conv_id", "ascending"),
        ("turn_idx", "ascending"),
        ("keyword", "ascending"),
    ]
    from ..stages.checks import _conv_order_codes

    conv = t["conv_id"].combine_chunks()
    kw = t["keyword"].combine_chunks()
    turn_a = t["turn_idx"].combine_chunks()
    if conv.null_count or kw.null_count or turn_a.null_count:
        return t.take(pc.sort_indices(t, sort_keys=keys))

    order = np.lexsort(
        (
            _conv_order_codes(kw),
            turn_a.to_numpy(zero_copy_only=False),
            _conv_order_codes(conv),
        )
    )
    return t.take(pa.array(order, pa.int64()))


# Above this estimated input size the direct exchange's nblocks × nparts
# intermediate-object count stops being "a few hundred small objects" and
# Ray's streaming AllToAll (merged, push-based shuffle) is the right plan.
from ..stages.bucketing import DIRECT_EXCHANGE_MAX_BYTES as _DIRECT_EXCHANGE_MAX_BYTES


def _direct_bucket_exchange(ds, make_parts, bucket_of, nparts, reduce_parts, batch_size):
    """Two-stage raw-Ray twin of ``groupby("_b").map_groups`` for the
    small-exchange regime.

    Ray's sort-backed AllToAll pays a fixed sample/barrier/wave latency
    that dominates when the exchanged data is small (measured at 24M
    turns / 8 CPUs: whole pipeline 13.8 s → 5.7 s with this exchange,
    identical output).  When the whole exchange fits comfortably in one
    node's object store, a direct map-side split — per input block, one
    typed sub-table per bucket for EACH of the two streams (violations /
    conversation keys, so neither stream ships the other's null-padded
    columns) — plus one reduce task per bucket moves the same bytes with
    none of the fixed cost.  Split tasks launch as read blocks stream
    out (``iter_internal_ref_bundles``), so the read overlaps the split
    instead of hitting a materialize barrier.

    Partitioning assumption: this creates ``nblocks × 2·nparts``
    intermediate objects with no merging, so it is gated to inputs under
    :data:`_DIRECT_EXCHANGE_MAX_BYTES`; at cluster scale callers keep
    the streaming AllToAll plan, whose shuffle backend merges
    intermediates.  Peak object-store footprint matches the AllToAll
    barrier's (same blocks, same exchange bytes)."""
    import ray
    import ray.data as rd

    @ray.remote(num_returns=2 * nparts)
    def split_block(block: pa.Table):
        if isinstance(block, pd.DataFrame):
            # upstream pandas map stages yield pandas blocks — same guard
            # as bucketing._direct_map_groups, without it num_rows raises
            # inside the task instead of the graceful AllToAll fallback
            block = from_pandas_clean(block)
        viols: list[list[pa.Table]] = [[] for _ in range(nparts)]
        convs: list[list[pa.Table]] = [[] for _ in range(nparts)]
        vproto = cproto = None
        for off in range(0, max(block.num_rows, 1), batch_size):
            viol_t, conv_t = make_parts(block.slice(off, batch_size))
            if vproto is None:
                vproto, cproto = viol_t.slice(0, 0), conv_t.slice(0, 0)
            for t, acc in ((viol_t, viols), (conv_t, convs)):
                if not t.num_rows:
                    continue
                b = bucket_of(t["conv_id"])
                if b.size > 1 and not (b[1:] >= b[:-1]).all():
                    # conv-clustered input blocks arrive already bucket-
                    # ordered; only reorder when they don't
                    order = np.argsort(b, kind="stable")
                    t = t.take(pa.array(order, pa.int64()))
                    b = b[order]
                bounds = np.searchsorted(b, np.arange(nparts + 1))
                for i in range(nparts):
                    part = t.slice(bounds[i], bounds[i + 1] - bounds[i])
                    if part.num_rows:
                        acc[i].append(part)
        # pieces are zero-copy slices: Ray's Arrow serializer truncates
        # sliced buffers, so each piece ships only its own rows
        out = [pa.concat_tables(p) if p else vproto for p in viols]
        out += [pa.concat_tables(p) if p else cproto for p in convs]
        return tuple(out)

    @ray.remote
    def reduce_bucket(*pieces: pa.Table) -> pa.Table:
        half = len(pieces) // 2
        return reduce_parts(list(pieces[:half]), list(pieces[half:]))

    try:
        splits = [
            split_block.remote(bref)
            for bundle in ds.iter_internal_ref_bundles()
            for bref in bundle.block_refs
        ]
    except Exception as err:
        from ..stages.bucketing import _warn_direct_fallback

        _warn_direct_fallback(err)
        return None
    if not splits:
        return None
    outs = [
        reduce_bucket.remote(*[s[i] for s in splits], *[s[nparts + i] for s in splits])
        for i in range(nparts)
    ]
    return rd.from_arrow_refs(outs)


def transcript_violations_fused1(
    ds,
    schema_json: str = TRANSCRIPT_SCHEMA_JSON,
    mode: str = "first",
    batch_size: int = 65536,
    num_buckets: int | None = None,
    concurrency: int | None = None,
    exchange: str = "auto",
    exclude_convs=None,
    keywords: bool = True,
):
    """Single-EXCHANGE twin of :func:`transcript_violations_fused`.

    ``keywords=False`` runs the CONV-CHECKS-ONLY configuration
    (referential + unique + contiguity + order, no per-row keyword
    plan): referential violations are computed per input batch in the
    same scan and ride the same order-preserving conv exchange, so the
    checks-only pipeline pays one scan + one exchange instead of the
    two-scan union + hash exchange + final sort of the parts plan
    (6M turns / 32 cpus: 5.3 s → ~1 s).

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
    )
    from ..stages.validate import validate_rows_batch
    from ..vector.plan import UnsupportedPlanError, compile_plan

    ds = _maybe_coalesce_read(ds)
    try:
        sch = ds.schema()
        arrow_schema = pa.schema(list(zip(sch.names, sch.types)))
    except Exception:
        arrow_schema = TRANSCRIPT_ARROW_SCHEMA
    plan = None
    if keywords:
        try:
            plan = compile_plan(_parse(schema_json), arrow_schema)
        except UnsupportedPlanError:
            return None
        if plan is None:
            return None
    project_cols = None
    if not keywords:
        # checks-only scan needs 5 of the 6 transcript columns — drop the
        # rest (text) before the exchange so the payload bytes never ride
        # it.  The projection is applied AFTER the range bucketer below:
        # select_columns hides input_files() from the footer-stat reader.
        need = ["conv_id", "turn_idx", "role", "tool", "ts"]
        names = set(arrow_schema.names)
        if not set(need) <= names:
            return None
        if names - set(need):
            project_cols = need

    route = os.environ.get("GRAFT_FUSED1_EXCHANGE", exchange)
    if route not in ("auto", "direct", "ray"):
        raise ValueError(f"unknown exchange route {route!r}")
    est = None
    if route == "auto":
        from ..stages.bucketing import _plan_size_estimate

        est = _plan_size_estimate(ds)
        route = (
            "direct"
            if concurrency is None  # an explicit concurrency knob only
            # applies to the Dataset plan's map stage
            and est is not None
            and est < _DIRECT_EXCHANGE_MAX_BYTES
            else "ray"
        )

    if route == "direct" and num_buckets is None:
        # the direct route's bucket count sets REDUCE-task granularity:
        # ≥2 per core keeps every core busy through the reduce wave, and
        # the ~64 MB ceiling per bucket bounds reduce-task heap (measured
        # at 24M turns: nb 32 → 64 cuts 32-CPU wall 3.4 → 2.6 s)
        import ray as _ray

        cpus = int(_ray.cluster_resources().get("CPU", 8))
        nb = max(64, 2 * cpus, int((est or 0) // (64 << 20)))
    else:
        nb = pick_num_buckets(ds, num_buckets)
    bucket_of = _conv_range_bucketer(ds, nb)
    if bucket_of is None:
        return None
    if project_cols is not None:
        ds = ds.select_columns(project_cols)

    statics = None
    if plan is not None and plan.static_violations:
        rows = sorted(
            (
                {"conv_id": "", "turn_idx": -1, "keyword": kw, "message": msg}
                for _col, kw, msg in plan.static_violations
            ),
            key=lambda r: (r["keyword"], r["message"]),
        )
        statics = rd.from_arrow(pa.Table.from_pylist(rows, schema=VIOLATION_PA_SCHEMA))

    drop_hot = _exclude_filter(exclude_convs)
    from ..stages.checks import referential_batch

    def fused_batch(batch: pa.Table) -> pa.Table:
        viol = (
            validate_rows_batch(
                batch,
                schema_json=schema_json,
                arrow_schema=arrow_schema,
                mode=mode,
                with_referential=True,
            )
            if keywords
            else referential_batch(batch)
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
        if drop_hot is not None:
            conv_t = drop_hot(conv_t)
        return pa.concat_tables([viol_t, conv_t])

    def make_parts(batch: pa.Table) -> tuple[pa.Table, pa.Table]:
        # direct-exchange twin of fused_batch: the two streams stay
        # separate, so neither ships the other's null-padded columns
        viol = (
            validate_rows_batch(
                batch,
                schema_json=schema_json,
                arrow_schema=arrow_schema,
                mode=mode,
                with_referential=True,
            )
            if keywords
            else referential_batch(batch)
        )
        viol_t = pa.table(
            {
                "conv_id": viol["conv_id"].cast(pa.string()),
                "turn_idx": viol["turn_idx"].cast(pa.int32()),
                "keyword": viol["keyword"].cast(pa.string()),
                "message": viol["message"].cast(pa.string()),
            }
        )
        conv_t = pa.table(
            {
                "conv_id": batch["conv_id"].cast(pa.string()),
                "turn_idx": batch["turn_idx"].cast(pa.int32()),
                "ts": batch["ts"].cast(pa.timestamp("us")),
            }
        )
        if drop_hot is not None:
            conv_t = drop_hot(conv_t)
        return viol_t, conv_t

    def add_bucket(t: pa.Table) -> pa.Table:
        b = bucket_of(t["conv_id"])  # Arrow fast path, no row Python
        return t.append_column("_b", pa.array(b, pa.int32()))

    import pyarrow.compute as pc

    from ..stages.checks import _run_bucket_table

    def run_sorted_bucket(g: pa.Table) -> pa.Table:
        # all-Arrow bucket pass: tag split, conv checks (vectorized
        # kernel), one C++ multi-key sort — no pandas conversion of the
        # bucket's string columns
        if "_b" in g.column_names:
            g = g.drop_columns(["_b"])
        if g.num_rows == 0:
            return EMPTY_VIOLATIONS
        tag = g["_tag"].combine_chunks()
        parts = []
        viol = g.filter(pc.equal(tag, 1))
        if viol.num_rows:
            parts.append(
                viol.select(["conv_id", "turn_idx", "keyword", "message"]).cast(
                    VIOLATION_PA_SCHEMA
                )
            )
        conv = g.filter(pc.equal(tag, 0))
        if conv.num_rows:
            cc = _run_bucket_table(
                conv.select(["conv_id", "turn_idx", "ts"]),
                ("unique", "contiguity", "order"),
            )
            if cc.num_rows:
                parts.append(cc)
        if not parts:
            return EMPTY_VIOLATIONS
        # no table-level combine: _sort_violations combines per key
        # column and its take compacts the output (the bucket sequence is
        # conv-ordered, so the in-bucket sort yields GLOBALLY sorted
        # output — the final all-to-all sort of the hash plan disappears)
        return _sort_violations(pa.concat_tables(parts))

    empty = VIOLATION_PA_SCHEMA.empty_table()

    def stamp(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty
        return (
            t
            if t.schema == VIOLATION_PA_SCHEMA
            else t.select(VIOLATION_PA_SCHEMA.names).cast(VIOLATION_PA_SCHEMA)
        )

    def reduce_parts(viol_pieces, conv_pieces) -> pa.Table:
        # direct-exchange reduce: same kernels as run_sorted_bucket, minus
        # the tag split (the two streams arrive separately)
        parts = [p for p in viol_pieces if p.num_rows]
        conv_live = [p for p in conv_pieces if p.num_rows]
        if conv_live:
            cc = _run_bucket_table(
                pa.concat_tables(conv_live), ("unique", "contiguity", "order")
            )
            if cc.num_rows:
                parts.append(cc)
        if not parts:
            return empty
        return _sort_violations(
            pa.concat_tables([p.cast(VIOLATION_PA_SCHEMA) for p in parts])
        )

    out = None
    if route == "direct":
        out = _direct_bucket_exchange(
            ds,
            make_parts,
            bucket_of,
            getattr(bucket_of, "nparts", nb + 1),
            reduce_parts,
            batch_size,
        )
    if out is None:
        out = (
            ds.map_batches(
                fused_batch,
                batch_format="pyarrow",
                batch_size=batch_size,
                concurrency=concurrency,
            )
            .map_batches(add_bucket, batch_format="pyarrow")
            .groupby("_b")
            .map_groups(run_sorted_bucket, batch_format="pyarrow")
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
        # sort=False: only unordered join keys are needed — the final
        # all-to-all sort of the violation stream would be a wasted
        # exchange here
        transcript_violations(
            ds, schema_json=schema_json, checks=("rows",), sort=False
        )
        .map_batches(
            lambda t: t.select(list(key_cols)),
            batch_format="pyarrow",
        )
    )

    # composite key → ONE join key, built injectively (validity flags +
    # a separator the stringified turn can never contain), NOT a 64-bit
    # hash: at billions of rows a hash-only membership join silently
    # misroutes every colliding clean row into quarantine
    def keyed(d):
        def fn(t: pa.Table) -> pa.Table:
            conv = t[key_cols[0]].cast(pa.string())
            turn = t[key_cols[1]].cast(pa.int64()).cast(pa.string())
            flags = pc.binary_join_element_wise(
                pc.if_else(pc.is_valid(conv), "1", "0"),
                pc.if_else(pc.is_valid(turn), "1", "0"),
                "",
            )
            k = pc.binary_join_element_wise(
                flags, pc.fill_null(conv, ""), pc.fill_null(turn, ""), "\x1f"
            )
            return t.append_column("_k", k)

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
