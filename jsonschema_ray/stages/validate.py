"""Row-level validation stages for ``map_batches``.

Three callable classes, all designed as **actor pools**: compile work happens
once per actor in ``__init__`` (the reference's one-time ``Parse``,
jsonschema.go:6-16), per-batch work is vectorized (``__call__``).

* :class:`VectorValidator` — the hot path: vectorized keyword kernels over
  zero-copy Arrow batches (vector/plan.py).
* :class:`SlowPathValidator` — exact row-as-JSON-object evaluation through
  the core engine; used for differential testing and schemas the vectorized
  layer can't express.
* :class:`PayloadValidator` — validates a column of raw JSON documents
  (e.g. ``events.props``) per row against a compiled schema — the direct
  distributed analogue of the reference's ``Schema.Validate(data []byte)``
  (validate.go:15-21).

All emit violation rows; the id columns are configurable
(``("conv_id", "turn_idx")`` for transcripts per FIXTURES.md §4).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..core import parse
from ..core.jsontypes import JNum, keyword_of as _keyword_of, tree_value
from ..core.schema import Schema, ValidationError
from ..vector.plan import VectorPlan, compile_plan

__all__ = [
    "VectorValidator",
    "SlowPathValidator",
    "PayloadValidator",
    "validate_rows_batch",
    "validate_rows_slow_batch",
    "violation_schema",
    "row_to_tree",
]


def violation_schema(id_fields: list[tuple[str, pa.DataType]]) -> pa.Schema:
    return pa.schema(
        list(id_fields) + [("keyword", pa.string()), ("message", pa.string())]
    )


def _emit(batch: pa.Table, idx: np.ndarray, keywords, messages, id_cols) -> pa.Table:
    cols = {}
    take = pa.array(idx, type=pa.int64())
    for c in id_cols:
        cols[c] = batch[c].take(take)
    cols["keyword"] = pa.array(keywords, type=pa.string())
    cols["message"] = pa.array(messages, type=pa.string())
    return pa.table(cols)


class VectorValidator:
    """Vectorized constraint evaluation; one compiled plan per actor.

    ``with_referential=True`` folds the role/tool referential check
    (stages/checks.py) into the same batch pass, so the row stage makes a
    single sweep over each Arrow block."""

    def __init__(
        self,
        schema_json: str,
        arrow_schema: pa.Schema,
        id_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
        mode: str = "first",
        with_referential: bool = False,
    ) -> None:
        self.plan: VectorPlan = compile_plan(parse(schema_json), arrow_schema)
        self.arrow_schema = arrow_schema
        self.id_cols = list(id_cols)
        self.mode = mode
        self.with_referential = with_referential

    def __call__(self, batch: pa.Table) -> pa.Table:
        # same batch/plan type reconciliation as validate_rows_batch —
        # pandas stages degrade all-null columns to Arrow null type
        if batch.schema.names == self.arrow_schema.names and not batch.schema.equals(
            self.arrow_schema
        ):
            try:
                batch = batch.cast(self.arrow_schema)
            except (pa.ArrowInvalid, pa.ArrowTypeError, pa.ArrowNotImplementedError):
                pass
        idx, kws, msgs = self.plan.evaluate(batch, mode=self.mode)
        out = _emit(batch, idx, kws, msgs, self.id_cols)
        if self.with_referential:
            from .checks import referential_batch

            ref = referential_batch(batch)
            if ref.num_rows:
                out = pa.concat_tables([out, ref])
        return out


# Per-worker-process compiled-plan cache: stateless tasks get the same
# compile-once amortization the actor pool gives, without paying a pool
# spin-up on every pipeline invocation (tasks reuse warm Ray workers).
_PLAN_CACHE: dict[tuple, VectorPlan] = {}


def validate_rows_batch(
    batch: pa.Table,
    schema_json: str,
    arrow_schema: pa.Schema,
    id_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
    mode: str = "first",
    with_referential: bool = False,
) -> pa.Table:
    """Stateless-task twin of :class:`VectorValidator`."""
    key = (
        schema_json,
        mode,
        tuple((n, str(t)) for n, t in zip(arrow_schema.names, arrow_schema.types)),
    )
    plan = _PLAN_CACHE.get(key)
    if plan is None:
        plan = _PLAN_CACHE.setdefault(
            key, compile_plan(parse(schema_json), arrow_schema)
        )
    if batch.schema.names == arrow_schema.names and not batch.schema.equals(
        arrow_schema
    ):
        # reconcile batch types with the plan's schema: a pandas stage
        # upstream degrades an all-null column to Arrow null type, and a
        # string-typed check kernel would crash on it — casting null→T is
        # always valid (all values stay null).  Incompatible real drift
        # fails the cast loudly, which is the right outcome.
        try:
            batch = batch.cast(arrow_schema)
        except (pa.ArrowInvalid, pa.ArrowTypeError, pa.ArrowNotImplementedError):
            pass  # let the plan's own kernels surface the type error
    idx, kws, msgs = plan.evaluate(batch, mode=mode)
    out = _emit(batch, idx, kws, msgs, list(id_cols))
    if with_referential:
        from .checks import referential_batch

        ref = referential_batch(batch)
        if ref.num_rows:
            out = pa.concat_tables([out, ref])
    return out


def row_to_tree(names, values, ts_cols, float_cols, row: int):
    """Row → JSON tree with NULL fields dropped (the absent-key mapping)."""
    obj = {}
    for j, name in enumerate(names):
        v = values[j][row]
        if v is None:
            continue
        if j in ts_cols:
            v = v.strftime("%Y-%m-%dT%H:%M:%S.%f")
        elif j in float_cols:
            v = JNum(repr(v))
        elif isinstance(v, bool):
            pass
        elif isinstance(v, int):
            v = JNum(str(v))
        elif isinstance(v, (list, dict)):
            v = tree_value(v)
        obj[name] = v
    return obj


class SlowPathValidator:
    """Exact per-row evaluation of the row object through the core engine."""

    def __init__(
        self,
        schema_json: str,
        id_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
    ) -> None:
        self.schema: Schema = parse(schema_json)
        self.id_cols = list(id_cols)

    def __call__(self, batch: pa.Table) -> pa.Table:
        names = batch.column_names
        ts_cols = {
            j
            for j, f in enumerate(batch.schema)
            if pa.types.is_timestamp(f.type) or pa.types.is_date(f.type)
        }
        float_cols = {
            j for j, f in enumerate(batch.schema) if pa.types.is_floating(f.type)
        }
        values = [batch[c].to_pylist() for c in names]
        idx, kws, msgs = [], [], []
        for i in range(batch.num_rows):
            tree = row_to_tree(names, values, ts_cols, float_cols, i)
            try:
                self.schema.validate(tree)
            except ValidationError as e:
                idx.append(i)
                kws.append(_keyword_of(e.msg))
                msgs.append(e.msg)
        return _emit(batch, np.array(idx, dtype=np.int64), kws, msgs, self.id_cols)


# keyword extraction lives in core.jsontypes (shared with the vector plan)


# Per-worker-process compile cache: stateless map_batches tasks get the same
# compile-once amortization an actor pool gives (jsonschema.go:6-16's Parse
# vs per-doc Validate split), without pool cold-start — tasks reuse warm Ray
# worker processes.
_SCHEMA_CACHE: dict[str, Schema] = {}


def _cached_schema(schema_json: str) -> Schema:
    sch = _SCHEMA_CACHE.get(schema_json)
    if sch is None:
        sch = _SCHEMA_CACHE.setdefault(schema_json, parse(schema_json))
    return sch


def validate_payload_batch(
    batch: pa.Table,
    schema_json: str,
    payload_col: str,
    id_cols: tuple[str, ...] = ("doc_id",),
) -> pa.Table:
    """Stateless-task twin of :class:`PayloadValidator`."""
    sch = _cached_schema(schema_json)
    payloads = batch[payload_col].to_pylist()
    idx, kws, msgs = [], [], []
    for i, doc in enumerate(payloads):
        if doc is None:
            continue
        msg = sch.check(doc)
        if msg is not None:
            idx.append(i)
            kws.append(_keyword_of(msg))
            msgs.append(msg)
    return _emit(batch, np.array(idx, dtype=np.int64), kws, msgs, list(id_cols))


def validate_rows_slow_batch(
    batch: pa.Table,
    schema_json: str,
    id_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
) -> pa.Table:
    """Stateless-task twin of :class:`SlowPathValidator` (per-worker
    compile cache)."""
    sv = SlowPathValidator.__new__(SlowPathValidator)
    sv.schema = _cached_schema(schema_json)
    sv.id_cols = list(id_cols)
    return sv(batch)


class PayloadValidator:
    """Validate a raw-JSON string column per row (events.props-style)."""

    def __init__(
        self,
        schema_json: str,
        payload_col: str,
        id_cols: tuple[str, ...] = ("event_id",),
    ) -> None:
        self.schema: Schema = parse(schema_json)
        self.payload_col = payload_col
        self.id_cols = list(id_cols)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.payload_col].to_pylist()
        idx, kws, msgs = [], [], []
        for i, doc in enumerate(payloads):
            if doc is None:
                continue
            msg = self.schema.check(doc)
            if msg is not None:
                idx.append(i)
                kws.append(_keyword_of(msg))
                msgs.append(msg)
        return _emit(batch, np.array(idx, dtype=np.int64), kws, msgs, self.id_cols)
