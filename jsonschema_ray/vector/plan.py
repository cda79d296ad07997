"""Compile a Draft-4 row schema into vectorized Arrow predicates.

The reference validates one JSON document at a time by streaming tokens
(validate.go:23-77).  Here the "document" is a row of an Arrow table — per
BASELINE.json input_hint the row ``{"conv_id": …, "turn_idx": …, …}`` — and
each keyword becomes a *columnar* kernel over the whole batch:

================  =========================================================
keyword           kernel
================  =========================================================
``type``          static arrow-type check at compile time (typed columns
                  satisfy or violate wholesale; schema.go:27-65)
``enum``          ``pc.is_in`` (validate.go:79-98's enumMap fast path,
                  vectorized)
``pattern``       ``pc.match_substring_regex`` — RE2, unanchored search,
                  the same regex engine + semantics as Go ``regexp.Match``
                  (validate.go:202-204)
``min/maxLength`` ``pc.utf8_length`` — codepoint count, same unit as
                  ``utf8.RuneCount`` (validate.go:193-201)
``minimum`` etc.  typed comparisons, exact for integer columns with
                  rational bounds (validate.go:231-253)
``multipleOf``    integer modulo (exact); non-integral divisors fall back
                  to per-row Fractions (validate.go:249-253)
``required``      ``pc.is_valid`` — a NULL field is the absent key
                  (validate.go:409-414,513-515)
``dependencies``  dependentRequired as masked requiredness
                  (validate.go:415-438)
================  =========================================================

**NULL = absent key.**  The row-object view drops NULL fields, so property
keywords only apply to non-null values and ``required`` is exactly the
null check.  The slow-path evaluator (stages/validate.py) builds row JSON
the same way, which is what makes differential testing exact.

**Fail-fast parity.**  ``mode="first"`` reports one violation per row — the
first in the reference's evaluation order (per-key property checks in
column order with each property's internal order enum → type → string/number
branch, then ``required`` in declaration order; validate.go:29-77,452-515).
``mode="all"`` reports every violation (the reference's own TODO at
validate.go:18).

Messages are the full wrapped-context strings the row-level validator
produces, e.g. ``object: "role": enum: "\"bot\"" is not present in enum``.
"""

from __future__ import annotations

from fractions import Fraction

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..core.jsontypes import go_quote, keyword_of, rat_str, tree_value
from ..core.schema import (
    ARRAY_T,
    BOOLEAN_T,
    INTEGER_T,
    NULL_T,
    NUMBER_T,
    OBJECT_T,
    STRING_T,
    Schema,
)

__all__ = ["UnsupportedPlanError", "VectorPlan", "compile_plan", "VIOLATION_FIELDS"]

VIOLATION_FIELDS = ("keyword", "message")


class UnsupportedPlanError(ValueError):
    """Schema shape the vectorized layer can't express; use the slow path."""


def _arrow_json_type(t: pa.DataType) -> tuple[str, int]:
    """(jx token name, typeSet bit) for an arrow column type."""
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string", STRING_T
    if pa.types.is_integer(t):
        return "number", INTEGER_T
    if pa.types.is_floating(t) or pa.types.is_decimal(t):
        return "number", NUMBER_T
    if pa.types.is_boolean(t):
        return "bool", BOOLEAN_T
    if pa.types.is_timestamp(t) or pa.types.is_date(t):
        return "string", STRING_T  # rendered as ISO strings in the row object
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return "array", ARRAY_T
    if pa.types.is_struct(t) or pa.types.is_map(t):
        return "object", OBJECT_T
    if pa.types.is_null(t):
        return "null", NULL_T
    raise UnsupportedPlanError(f"unsupported arrow type {t}")


def _types_allow(types: int, bit: int) -> bool:
    if types == 0:
        return True
    if bit == INTEGER_T:
        # integer satisfies "number" too (schema.go:63-65 via numberType
        # check in validateNumber, validate.go:209).
        return bool(types & (INTEGER_T | NUMBER_T))
    return bool(types & bit)


class _Check:
    """One vectorized predicate: mask(batch) → bool ndarray of violations."""

    __slots__ = ("column", "keyword", "_mask", "_message")

    def __init__(self, column, keyword, mask_fn, message) -> None:
        self.column = column
        self.keyword = keyword
        self._mask = mask_fn
        self._message = message

    def mask(self, batch: pa.Table) -> np.ndarray:
        return self._mask(batch)

    def messages(self, batch: pa.Table, idx: np.ndarray) -> list[str]:
        if callable(self._message):
            vals = batch[self.column].take(pa.array(idx)).to_pylist()
            return [self._message(v) for v in vals]
        return [self._message] * len(idx)


def _np_bool(arr) -> np.ndarray:
    """ChunkedArray/Array of bool (possibly with nulls) → ndarray, null=False."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return arr.fill_null(False).to_numpy(zero_copy_only=False)


def _valid_mask(col) -> np.ndarray:
    return _np_bool(pc.is_valid(col))


def _render_scalar(v) -> str:
    """Canonical JSON rendering of an arrow python value — exactly the
    slow path's ``to_json(tree)`` (lexeme-preserving, recursive, so list
    and struct values render identically across engines)."""
    from ..core.jsontypes import to_json

    return to_json(tree_value(v))


def _value_fraction(v) -> Fraction:
    if isinstance(v, np.floating):
        v = float(v)
    if isinstance(v, float):
        # Decimal lexeme, matching the slow path's JNum(repr(v)): 0.3 → 3/10,
        # not the exact binary expansion Fraction(0.3) would give.  Keeps
        # multipleOf masks and min/max message rationals identical between
        # the fast and slow engines.
        return Fraction(repr(v))
    if isinstance(v, np.integer):
        return Fraction(int(v))
    return Fraction(v)


class VectorPlan:
    """Ordered vectorized checks compiled from (Schema, arrow schema).

    ``static_violations`` are schema-level: the *table* shape itself violates
    (missing required column, wholesale type mismatch); they apply to every
    row and are reported once per partition by the pipeline rather than per
    row.
    """

    def __init__(self, checks, static_violations, columns) -> None:
        self.checks: list[_Check] = checks
        self.static_violations: list[tuple[str, str, str]] = static_violations
        self.columns = columns

    def evaluate(self, batch: pa.Table, mode: str = "first"):
        """→ (row_indices ndarray, keywords list, messages list)."""
        n = batch.num_rows
        out_idx: list[np.ndarray] = []
        out_kw: list[str] = []
        out_msg: list[str] = []
        claimed = np.zeros(n, dtype=bool) if mode == "first" else None
        rows: list[tuple[int, str, str]] = []
        for check in self.checks:
            mask = check.mask(batch)
            if mode == "first":
                new = mask & ~claimed
                claimed |= mask
            else:
                new = mask
            if not new.any():
                continue
            idx = np.flatnonzero(new)
            msgs = check.messages(batch, idx)
            for i, m in zip(idx, msgs):
                # keyword=None → per-row derivation from the message (items
                # checks surface the element's own keyword, like _keyword_of
                # does on the slow path)
                rows.append((int(i), check.keyword or keyword_of(m), m))
        if mode == "first":
            rows.sort(key=lambda r: r[0])
        else:
            rows.sort(key=lambda r: (r[0],))
        if rows:
            out_idx = np.fromiter((r[0] for r in rows), dtype=np.int64, count=len(rows))
        else:
            out_idx = np.empty(0, dtype=np.int64)
        out_kw = [r[1] for r in rows]
        out_msg = [r[2] for r in rows]
        return out_idx, out_kw, out_msg


def compile_plan(schema: Schema, arrow_schema: pa.Schema) -> VectorPlan:
    """Compile the top-level object schema onto the table's columns."""
    if schema.all_of or schema.any_of or schema.one_of or schema.not_ is not None or schema.enum:
        raise UnsupportedPlanError("top-level composition keywords need the slow path")
    if schema.types not in (0, OBJECT_T):
        raise UnsupportedPlanError("top-level type must be object")
    # dependentSchemas compile below (restricted shapes); other top-level
    # gates unchanged.
    if schema.items is not None or schema.unique_items:
        raise UnsupportedPlanError("array keywords at top level")

    checks: list[_Check] = []
    static: list[tuple[str, str, str]] = []
    names = list(arrow_schema.names)
    name_set = set(names)

    # additionalProperties=false with unexpected table columns → schema-level.
    # The SCHEMA form compiles below, per unmatched column, inside the key
    # loop (validate.go:484-496).
    if schema.additional_properties == ("bool", False):
        for col in names:
            if col not in schema.properties and not any(
                rx.search(col) for rx, _src, _sub in schema.pattern_properties
            ):
                static.append(
                    (
                        col,
                        "additionalProperties",
                        f"object: {go_quote(col)}: additional properties are not allowed",
                    )
                )

    # dependentSchemas (validate.go:439-452): evaluated BEFORE the key
    # loop, so their checks precede property checks in fail-fast order.  A
    # sub-schema validates the whole row object conditioned on the key's
    # presence; restricted to the flat shapes the plan expresses
    # (properties + required) — anything richer routes to the slow path.
    # trigger keys fire in ROW-OBJECT (column) order, matching the slow
    # path's pre-pass over obj keys — not schema declaration order
    for dkey in names:
        sub = schema.dependent_schemas.get(dkey)
        if sub is None:
            continue
        if (
            sub.enum
            or sub.all_of
            or sub.any_of
            or sub.one_of
            or sub.not_ is not None
            or sub.pattern_properties
            or sub.dependent_schemas
            or sub.dependent_required
            or sub.items is not None
            or sub.unique_items
            or sub.min_properties is not None
            or sub.max_properties is not None
            or sub.types not in (0, OBJECT_T)
            or sub.additional_properties is not None
            or sub.minimum is not None
            or sub.maximum is not None
            or sub.multiple_of is not None
            or sub.min_length is not None
            or sub.max_length is not None
            or sub.pattern is not None
        ):
            raise UnsupportedPlanError(
                f"dependentSchemas[{dkey!r}] shape needs the slow path"
            )
        prefix = f"object: dependent {go_quote(dkey)}: "
        for col in names:
            sp = sub.properties.get(col)
            if sp is None:
                continue
            for c in _compile_property(
                col,
                sp,
                arrow_schema.field(col).type,
                static,
                ctx=f"{prefix}object: {go_quote(col)}: ",
            ):
                checks.append(_conditioned(c, dkey))
        for req in sub.required:
            if req not in name_set:
                checks.append(
                    _Check(
                        dkey,
                        "required",
                        (lambda k: lambda b: _valid_mask(b[k]))(dkey),
                        f"{prefix}object: required property {go_quote(req)} is missing",
                    )
                )
                continue
            checks.append(
                _Check(
                    dkey,
                    "required",
                    (
                        lambda k, r: lambda b: _valid_mask(b[k]) & ~_valid_mask(b[r])
                    )(dkey, req),
                    f"{prefix}object: required property {go_quote(req)} is missing",
                )
            )

    # Per-key checks in arrow column order (validate.go:452-508): pattern
    # regexes are matched against the STATIC column names once at compile
    # time; each matching pattern's sub-schema compiles with the slow
    # path's wrap context (`pattern "src"`), declaration order first, then
    # the plain property schema (validate.go:465-478's per-key order).
    ap = schema.additional_properties
    for col in names:
        field_type = arrow_schema.field(col).type
        matched = False
        for rx, src, sub in schema.pattern_properties:
            if rx.search(col):
                matched = True
                checks.extend(
                    _compile_property(
                        col,
                        sub,
                        field_type,
                        static,
                        ctx=f"object: {go_quote(col)}: pattern {go_quote(src)}: ",
                    )
                )
        prop = schema.properties.get(col)
        if prop is not None:
            checks.extend(_compile_property(col, prop, field_type, static))
        elif not matched and ap is not None and ap[0] == "schema":
            # additionalProperties schema form: the sub-schema validates
            # every unmatched column's values (validate.go:485-489)
            checks.extend(
                _compile_property(
                    col,
                    ap[1],
                    field_type,
                    static,
                    ctx=f"object: {go_quote(col)}: additionalProperties: ",
                )
            )

    # required after the key loop (validate.go:513-515), declaration order.
    for req in schema.required:
        if req not in name_set:
            static.append(
                (
                    req,
                    "required",
                    f"object: required property {go_quote(req)} is missing",
                )
            )
            continue
        checks.append(
            _Check(
                req,
                "required",
                (lambda c: lambda b: ~_valid_mask(b[c]))(req),
                f"object: required property {go_quote(req)} is missing",
            )
        )

    # dependentRequired: key present → dependents required
    # (validate.go:415-438).  Trigger keys fire in ROW-OBJECT (column)
    # order — the slow path's pre-pass iterates obj keys, so with several
    # triggers present the first-reported missing dependent follows column
    # order, not schema declaration order.
    for key in names:
        deps = schema.dependent_required.get(key)
        if deps is None:
            continue
        for dep in deps:
            if dep not in name_set:
                checks.append(
                    _Check(
                        key,
                        # Slow path's _keyword_of maps "required property …
                        # is missing" to "required" regardless of whether it
                        # came from dependentRequired — keep keyword parity.
                        "required",
                        (lambda c: lambda b: _valid_mask(b[c]))(key),
                        f"object: required property {go_quote(dep)} is missing",
                    )
                )
                continue
            checks.append(
                _Check(
                    key,
                    "required",
                    (
                        lambda k, d: lambda b: _valid_mask(b[k]) & ~_valid_mask(b[d])
                    )(key, dep),
                    f"object: required property {go_quote(dep)} is missing",
                )
            )

    # One _Check per bound so each violation carries its own keyword and
    # message (slow path emits distinct smaller/bigger strings,
    # validate.go:517-522); NULLs vary per row so the key count is row-wise.
    if schema.min_properties is not None:
        checks.append(
            _Check(
                names[0],
                "minProperties",
                _props_count_mask(names, schema.min_properties, None),
                f"object: length is smaller than {schema.min_properties}",
            )
        )
    if schema.max_properties is not None:
        checks.append(
            _Check(
                names[0],
                "maxProperties",
                _props_count_mask(names, None, schema.max_properties),
                f"object: length is bigger than {schema.max_properties}",
            )
        )

    return VectorPlan(checks, static, names)


def _branch_viol_mask(col: str, branch: Schema, t: pa.DataType):
    """mask(batch) → True where a non-null value VIOLATES the branch.

    A branch "matches" a value iff none of its compiled checks fire —
    the masks compose with or/and/invert to express oneOf/anyOf/not
    (buffer-and-rescan per subschema in the reference, validate.go:29-54,
    becomes pure mask algebra here).  Messages are unused: composition
    verdicts carry the reference's fixed strings."""
    branch_checks = _compile_property(col, branch, t, [], ctx="")

    def mask(b: pa.Table) -> np.ndarray:
        m = np.zeros(b.num_rows, dtype=bool)
        for c in branch_checks:
            m |= c.mask(b)
        return m

    return mask


def _one_of_checks(col: str, branches, t: pa.DataType, ctx: str) -> list[_Check]:
    masks = [_branch_viol_mask(col, br, t) for br in branches]

    _memo: dict = {}

    def match_count(b: pa.Table, final: bool = False) -> np.ndarray:
        # the two oneOf checks run back-to-back on the same batch —
        # memoize the branch-count pass by batch identity so each batch
        # pays N branch evaluations, not 2N.  The SECOND check clears the
        # memo (final=True): plans are cached process-wide, so retaining
        # the last batch would pin one full block per oneOf property in
        # every warm worker between runs.
        if _memo.get("b") is b:
            cnt = _memo["cnt"]
            if final:
                _memo.clear()
            return cnt
        cnt = np.zeros(b.num_rows, dtype=np.int64)
        for m in masks:
            cnt += ~m(b)
        if not final:
            _memo["b"], _memo["cnt"] = b, cnt
        return cnt

    # two checks so each case carries its exact message
    # (validate.go:113-135); a row's count picks exactly one
    return [
        _Check(
            col,
            "oneOf",
            lambda b, _c=col: _valid_mask(b[_c]) & (match_count(b) > 1),
            f"{ctx}oneOf: must match exactly once",
        ),
        _Check(
            col,
            "oneOf",
            lambda b, _c=col: _valid_mask(b[_c]) & (match_count(b, final=True) == 0),
            f"{ctx}oneOf: must match at least once",
        ),
    ]


def _any_of_check(col: str, branches, t: pa.DataType, ctx: str) -> _Check:
    masks = [_branch_viol_mask(col, br, t) for br in branches]

    def mask(b: pa.Table) -> np.ndarray:
        bad = _valid_mask(b[col])
        for m in masks:
            bad &= m(b)
        return bad

    return _Check(col, "anyOf", mask, f"{ctx}anyOf: must match at least once")


def _not_check(col: str, branch: Schema, t: pa.DataType, ctx: str) -> _Check:
    viol = _branch_viol_mask(col, branch, t)
    return _Check(
        col,
        "not",
        lambda b, _c=col: _valid_mask(b[_c]) & ~viol(b),
        f"{ctx}not: must not match",
    )


def _conditioned(check: _Check, cond_col: str) -> _Check:
    """AND a check's mask with the presence of ``cond_col``."""
    inner = check._mask
    return _Check(
        check.column,
        check.keyword,
        lambda b, _inner=inner, _c=cond_col: _inner(b) & _valid_mask(b[_c]),
        check._message,
    )


def _props_count_mask(names, min_p, max_p):
    def mask(batch: pa.Table) -> np.ndarray:
        count = np.zeros(batch.num_rows, dtype=np.int64)
        for c in names:
            count += _valid_mask(batch[c]).astype(np.int64)
        bad = np.zeros(batch.num_rows, dtype=bool)
        if min_p is not None:
            bad |= count < min_p
        if max_p is not None:
            bad |= count > max_p
        return bad

    return mask


def _compile_property(
    col: str, prop: Schema, t: pa.DataType, static, ctx: str | None = None
) -> list[_Check]:
    """Compile one sub-schema against one column.  ``ctx`` is the wrapped
    message prefix — ``object: "col": `` for a plain property, ``object:
    "col": pattern "re": `` when the sub-schema came from a matching
    patternProperties entry (validate.go:471-478's wrap)."""
    if ctx is None:
        ctx = f"object: {go_quote(col)}: "
    if pa.types.is_null(t):
        # pandas stages degrade an all-null column to Arrow null type —
        # every value is null, i.e. the property is ABSENT on every row
        # (the engine's null-is-absent contract), so no value-level check
        # can ever fire; presence (`required`) is evaluated separately
        # via is_valid, which handles null-typed columns fine
        return []
    if (
        prop.properties
        or prop.pattern_properties
        or prop.required
        or prop.dependent_required
        or prop.dependent_schemas
    ):
        raise UnsupportedPlanError(
            f"property {col!r} uses keywords the vectorized layer can't express"
        )
    # min/maxProperties only constrain OBJECT values — a non-struct column
    # can never hold one, so the keyword is vacuous there; on a struct
    # column the fast path has no object-size kernel and silently dropping
    # the check would pass rows the slow path rejects
    if (
        (prop.min_properties is not None or prop.max_properties is not None)
        and (pa.types.is_struct(t) or pa.types.is_map(t))
    ):
        raise UnsupportedPlanError(
            f"min/maxProperties on struct column {col!r} needs the slow path"
        )

    tok, bit = _arrow_json_type(t)
    checks: list[_Check] = []
    is_ts = pa.types.is_timestamp(t) or pa.types.is_date(t)

    # composition slot, in the reference's evaluation order
    # enum → allOf → oneOf → anyOf → not (validate.go:29-54).
    if prop.enum:
        checks.append(_enum_check(col, prop, t, is_ts, ctx))
    for i, br in enumerate(prop.all_of):
        # allOf distributes: every branch's checks apply directly, with
        # the slow path's `allOf: [i]` wrap (validate.go:100-111)
        checks.extend(
            _compile_property(col, br, t, static, ctx=f"{ctx}allOf: [{i}]: ")
        )
    if prop.one_of:
        checks.extend(_one_of_checks(col, prop.one_of, t, ctx))
    if prop.any_of:
        checks.append(_any_of_check(col, prop.any_of, t, ctx))
    if prop.not_ is not None:
        checks.append(_not_check(col, prop.not_, t, ctx))

    # type: static per column (schema.go:27-65).
    if not _types_allow(prop.types, bit):
        msg = f"{ctx}{tok}: type is not allowed"
        checks.append(
            _Check(col, "type", (lambda c: lambda b: _valid_mask(b[c]))(col), msg)
        )
        return checks  # fail-fast: type error shadows the rest for every row

    if tok == "string":
        if prop.min_length is not None or prop.max_length is not None:
            if is_ts:
                raise UnsupportedPlanError(f"length keywords on timestamp column {col!r}")
            if prop.min_length is not None:
                checks.append(
                    _Check(
                        col,
                        "minLength",
                        (
                            lambda c, m: lambda b: _np_bool(
                                pc.less(pc.utf8_length(b[c]), m)
                            )
                        )(col, prop.min_length),
                        f"{ctx}string: length is smaller than {prop.min_length}",
                    )
                )
            if prop.max_length is not None:
                checks.append(
                    _Check(
                        col,
                        "maxLength",
                        (
                            lambda c, m: lambda b: _np_bool(
                                pc.greater(pc.utf8_length(b[c]), m)
                            )
                        )(col, prop.max_length),
                        f"{ctx}string: length is bigger than {prop.max_length}",
                    )
                )
        if prop.pattern is not None:
            if is_ts:
                raise UnsupportedPlanError(f"pattern on timestamp column {col!r}")
            pat = prop.pattern_source
            checks.append(
                _Check(
                    col,
                    "pattern",
                    (
                        lambda c, p: lambda b: _np_bool(
                            pc.invert(pc.match_substring_regex(b[c], p))
                        )
                    )(col, pat),
                    f"{ctx}string: does not match pattern {pat}",
                )
            )
    elif tok == "number":
        lexical_int = pa.types.is_integer(t)
        if not lexical_int and (prop.types & INTEGER_T) and not (prop.types & NUMBER_T):
            # float column declared integer-only: every non-null value has a
            # fractional lexeme (we render doubles with repr), so this was
            # handled by the type check above via _types_allow.
            pass
        checks.extend(_numeric_checks(col, prop, t, ctx))
    elif tok == "array":
        checks.extend(_array_checks(col, prop, t, ctx))
    return checks


def _array_checks(col: str, prop: Schema, t: pa.DataType, ctx: str) -> list[_Check]:
    """List-column keywords, in the slow path's order: per-element items
    checks, uniqueItems, then length bounds (validate.go:267-377).

    Masks vectorize over the FLATTENED child array (one kernel pass for
    every element of every row, scattered back to parents); messages
    recompute the first offending element through the exact engine for
    flagged rows only — the reference's buffer-only-on-failure idiom."""
    from ..core.equal import equal
    from ..core.schema import ValidationError

    checks: list[_Check] = []
    child = t.value_type

    if prop.items is not None:
        if prop.items[0] != "object":
            raise UnsupportedPlanError(f"tuple-form items on column {col!r}")
        sub = prop.items[1]
        if sub.enum or sub.all_of or sub.any_of or sub.one_of or sub.not_ is not None:
            # composition over possibly-null elements: slow path
            raise UnsupportedPlanError(
                f"items composition keywords on column {col!r}"
            )
        sub_checks = _compile_property("__e", sub, child, [], ctx="")
        # a NULL element is JSON null: it violates iff the sub-schema's
        # type set excludes null (other keywords skip nulls, like the
        # slow path's type dispatch)
        null_viol = sub.types != 0 and not (sub.types & NULL_T)

        def items_mask(b, c=col, sc=sub_checks, nv=null_viol):
            arr = b[c].combine_chunks()
            out = np.zeros(len(arr), dtype=bool)
            flat = pc.list_flatten(arr)
            if len(flat) == 0 and not nv:
                return out
            parent = pc.list_parent_indices(arr).to_numpy(zero_copy_only=False)
            m = np.zeros(len(flat), dtype=bool)
            if len(flat):
                tmp = pa.table({"__e": flat})
                for ck in sc:
                    m |= ck.mask(tmp)
                if nv:
                    m |= ~_valid_mask(flat)
            if m.any():
                np.logical_or.at(out, parent[m], True)
            return out

        def items_msg(v, sub=sub, ctx=ctx):
            for i, elem in enumerate(tree_value(v)):
                try:
                    sub.validate(elem)
                except ValidationError as e:
                    return f"{ctx}array: [{i}]: {e.msg}"
            return f"{ctx}array: items violation"  # pragma: no cover

        checks.append(_Check(col, None, items_mask, items_msg))

    if prop.unique_items:
        if not (
            pa.types.is_string(child)
            or pa.types.is_large_string(child)
            or pa.types.is_integer(child)
            or pa.types.is_floating(child)
            or pa.types.is_boolean(child)
        ):
            raise UnsupportedPlanError(
                f"uniqueItems on non-primitive list column {col!r}"
            )
        import pandas as pd

        def unique_mask(b, c=col):
            arr = b[c].combine_chunks()
            out = np.zeros(len(arr), dtype=bool)
            flat = pc.list_flatten(arr)
            if len(flat) == 0:
                return out
            parent = pc.list_parent_indices(arr).to_numpy(zero_copy_only=False)
            vals = flat.to_numpy(zero_copy_only=False)
            if flat.null_count and pa.types.is_integer(child):
                # nullable ints float-coerce (2^53 precision loss): stay exact
                vals = np.asarray(flat.to_pylist(), dtype=object)
            dup = pd.DataFrame({"p": parent, "v": vals}).duplicated().to_numpy()
            if dup.any():
                np.logical_or.at(out, parent[dup], True)
            return out

        def unique_msg(v, ctx=ctx):
            elems = tree_value(v)
            for xi in range(len(elems)):
                for yi in range(len(elems)):
                    if xi != yi and equal(elems[xi], elems[yi]):
                        return f"{ctx}array: items {xi} and {yi} are equal"
            return f"{ctx}array: duplicate items"  # pragma: no cover

        checks.append(_Check(col, "uniqueItems", unique_mask, unique_msg))

    if prop.min_items is not None:
        checks.append(
            _Check(
                col,
                "minItems",
                (
                    lambda c, n: lambda b: _np_bool(
                        pc.less(pc.list_value_length(b[c]), n)
                    )
                )(col, prop.min_items),
                f"{ctx}array: length is smaller than {prop.min_items}",
            )
        )
    if prop.max_items is not None:
        checks.append(
            _Check(
                col,
                "maxItems",
                (
                    lambda c, n: lambda b: _np_bool(
                        pc.greater(pc.list_value_length(b[c]), n)
                    )
                )(col, prop.max_items),
                f"{ctx}array: length is bigger than {prop.max_items}",
            )
        )
    return checks


def _enum_check(col, prop: Schema, t, is_ts, ctx: str) -> _Check:
    from ..core.jsontypes import JNum

    vals = prop.enum
    py_vals = []
    for v in vals:
        if isinstance(v, JNum):
            f = v.fraction()
            py_vals.append(int(f) if f.denominator == 1 else float(f))
        elif isinstance(v, (str, bool)) or v is None:
            py_vals.append(v)
        else:
            raise UnsupportedPlanError(f"composite enum values on column {col!r}")
    if is_ts:
        raise UnsupportedPlanError(f"enum on timestamp column {col!r}")
    # Mixed-type enums (e.g. ["a", 1] against a string column): only the
    # values deep-equal-compatible with the column type can ever match
    # (jsonequal.Equal compares type tags first, equal.go:177-185).  Build
    # the is_in set from just those; if none fit, every non-null value fails.
    fitting = [v for v in py_vals if _enum_value_fits(v, t)]
    value_set = None
    if fitting:
        try:
            value_set = pa.array(fitting, type=t)
        except (pa.ArrowInvalid, pa.ArrowTypeError, OverflowError):
            # some fitting values still fail CONVERSION (an int past the
            # int64 range raises OverflowError, a 1e300 float raises
            # ArrowInvalid on an int column): such a value cannot equal
            # any representable column value, so drop it per value —
            # flagging every row (the old all-or-nothing fallback) would
            # report rows equal to a REPRESENTABLE enum member as
            # violations, and OverflowError escaped the except entirely,
            # crashing the task instead of compiling a plan
            conv = []
            for v in fitting:
                try:
                    pa.array([v], type=t)
                    conv.append(v)
                except (pa.ArrowInvalid, pa.ArrowTypeError, OverflowError):
                    pass
            value_set = pa.array(conv, type=t) if conv else None
    if value_set is None:
        def mask_all(b, c=col):
            return _valid_mask(b[c])

        return _Check(col, "enum", mask_all, _enum_msg(ctx))

    def mask(b, c=col, vs=value_set):
        return _np_bool(pc.invert(pc.is_in(b[c], value_set=vs))) & _valid_mask(b[c])

    return _Check(col, "enum", mask, _enum_msg(ctx))


def _enum_value_fits(v, t: pa.DataType) -> bool:
    """Can enum value ``v`` deep-equal any value of column type ``t``?

    Explicit type-tag rules (not a pa.array try) because pyarrow silently
    truncates e.g. ``pa.array([1.5], type=int64())`` to ``[1]``.
    """
    if v is None:
        return pa.types.is_null(t)  # non-null values never equal JSON null
    if isinstance(v, bool):
        return pa.types.is_boolean(t)
    if isinstance(v, str):
        return pa.types.is_string(t) or pa.types.is_large_string(t)
    numeric = (
        pa.types.is_integer(t) or pa.types.is_floating(t) or pa.types.is_decimal(t)
    )
    if isinstance(v, int):
        return numeric
    if isinstance(v, float):
        if pa.types.is_integer(t):
            return v.is_integer()  # 1.0 == 1 across lexemes (equal.go:39-79)
        return numeric
    return False


def _enum_msg(ctx: str):
    def message(v) -> str:
        return f"{ctx}enum: {go_quote(_render_scalar(v))} is not present in enum"

    return message


def _numeric_checks(col, prop: Schema, t, ctx: str) -> list[_Check]:
    checks = []
    int_col = pa.types.is_integer(t)

    def bound_scalar(bound: Fraction, kind: str):
        """Exact comparison value for the column type.

        For integer columns an exclusive-equivalent integer threshold is
        computed so rational bounds stay exact; float columns compare in
        float64 (their own value domain).
        """
        if int_col:
            return bound
        return float(bound)

    if prop.minimum is not None:
        b = prop.minimum
        excl = prop.exclusive_minimum

        if int_col and b.denominator != 1:
            import math

            thr = math.ceil(b)  # v < b  ⟺  v < ceil(b) for integers
            mask_fn = (lambda c, th: lambda bt: _np_bool(pc.less(bt[c], th)))(col, thr)
        else:
            cmp = pc.less_equal if excl else pc.less
            mask_fn = (
                lambda c, th, cp: lambda bt: _np_bool(cp(bt[c], th))
            )(col, int(b) if int_col else float(b), cmp)

        def msg_min(v, b=b):
            return f"{ctx}number: value {rat_str(_value_fraction(v))} is smaller than {rat_str(b)}"

        checks.append(_Check(col, "minimum", mask_fn, msg_min))

    if prop.maximum is not None:
        b = prop.maximum
        excl = prop.exclusive_maximum
        if int_col and b.denominator != 1:
            import math

            thr = math.floor(b)
            mask_fn = (lambda c, th: lambda bt: _np_bool(pc.greater(bt[c], th)))(
                col, thr
            )
        else:
            cmp = pc.greater_equal if excl else pc.greater
            mask_fn = (
                lambda c, th, cp: lambda bt: _np_bool(cp(bt[c], th))
            )(col, int(b) if int_col else float(b), cmp)

        def msg_max(v, b=b):
            return f"{ctx}number: value {rat_str(_value_fraction(v))} is bigger than {rat_str(b)}"

        checks.append(_Check(col, "maximum", mask_fn, msg_max))

    if prop.multiple_of is not None:
        m = prop.multiple_of
        if int_col and m.denominator == 1:
            mask_fn = (
                lambda c, k: lambda bt: _np_bool(
                    pc.not_equal(
                        pc.subtract(
                            bt[c], pc.multiply(pc.divide(bt[c], k), k)
                        ),
                        0,
                    )
                )
            )(col, int(m))
        else:

            def mask_fn(bt, c=col, k=m):
                vals = bt[c].to_numpy(zero_copy_only=False)
                ok = _valid_mask(bt[c])
                bad = np.zeros(len(vals), dtype=bool)
                for i in np.flatnonzero(ok):
                    bad[i] = (_value_fraction(vals[i]) / k).denominator != 1
                return bad

        def msg_mul(v, m=m):
            quo = _value_fraction(v) / m
            return f"{ctx}number: {rat_str(quo)} is not multiple of {rat_str(m)}"

        checks.append(_Check(col, "multipleOf", mask_fn, msg_mul))
    return checks
