"""Compiled Draft-4 schema graph and fail-fast row-level validator.

This is the engine's *slow path*: exact Draft-4 keyword evaluation over
lexeme-preserving JSON trees, used for nested JSON payload columns and for
the conformance corpus.  The hot path for flat transcript columns is the
vectorized plan in :mod:`jsonschema_ray.vector`.

Semantics and message templates mirror the reference validator
(validate.go:23-525):

* keyword evaluation order: enum → allOf → oneOf → anyOf → not, then the
  type-specific branch (validate.go:29-72); the type-branch error is wrapped
  with the token-type name (validate.go:74), giving contextual messages like
  ``object: "number": string: type is not allowed`` (README.md:41-42);
* empty type set matches everything (schema.go:63-65);
* Draft-4 ``integer`` is lexical — ``1.0`` is not an integer
  (validate.go:220-229);
* numeric keywords compare exactly via rationals (validate.go:231-253);
  ``multipleOf``'s message renders the *quotient* (the reference mutates
  ``val`` via ``Rat.Quo`` before formatting, validate.go:250-251);
* string lengths count code points (``utf8.RuneCount``, validate.go:194);
* ``uniqueItems`` is pairwise deep-JSON equality (validate.go:359-370);
* objects: dependent keys are collected in a pre-pass, dependent schemas
  validate the whole object, property routing honors properties /
  patternProperties / additionalProperties with the reference's wrap
  contexts (validate.go:382-525).

The reference reports the first violation only (fail-fast; its TODO at
validate.go:18 notes error collection as future work).  :meth:`Schema.validate`
reproduces that; the table layer turns messages into violation rows.
"""

from __future__ import annotations

import re
from fractions import Fraction

from .equal import equal
from .jsontypes import (
    JNum,
    JSONError,
    go_quote,
    json_token_type,
    parse_json,
    rat_str,
    to_json,
)

__all__ = ["ValidationError", "Schema", "TYPE_BITS"]


class ValidationError(Exception):
    def __init__(self, msg: str) -> None:
        super().__init__(msg)
        self.msg = msg


# Same bitset layout as the reference (schema.go:27-37).
STRING_T = 1 << 0
NUMBER_T = 1 << 1
INTEGER_T = 1 << 2
NULL_T = 1 << 3
BOOLEAN_T = 1 << 4
ARRAY_T = 1 << 5
OBJECT_T = 1 << 6

TYPE_BITS = {
    "string": STRING_T,
    "number": NUMBER_T,
    "integer": INTEGER_T,
    "null": NULL_T,
    "boolean": BOOLEAN_T,
    "array": ARRAY_T,
    "object": OBJECT_T,
}


_MISSING = object()  # sentinel: one dict lookup decides presence + value


def _fail(msg: str):
    raise ValidationError(msg)


def _wrap(ctx: str, e: ValidationError):
    raise ValidationError(f"{ctx}: {e.msg}") from None


class Schema:
    """Immutable compiled validator node (cyclic via ``$ref``)."""

    __slots__ = (
        "types",
        "enum",
        "enum_keys",
        "all_of",
        "any_of",
        "one_of",
        "not_",
        "min_properties",
        "max_properties",
        "required",
        "properties",
        "pattern_properties",
        "additional_properties",
        "dependent_required",
        "dependent_schemas",
        "min_items",
        "max_items",
        "unique_items",
        "items",
        "additional_items",
        "minimum",
        "exclusive_minimum",
        "maximum",
        "exclusive_maximum",
        "multiple_of",
        "min_length",
        "max_length",
        "pattern",
        "pattern_source",
        "_enum_str_set",
        "_num_fast",
        "_has_comp",
    )

    def __init__(self) -> None:
        self.types: int = 0
        self.enum: list = []
        self.enum_keys: frozenset = frozenset()
        self.all_of: list[Schema] = []
        self.any_of: list[Schema] = []
        self.one_of: list[Schema] = []
        self.not_: Schema | None = None
        self.min_properties: int | None = None
        self.max_properties: int | None = None
        self.required: list[str] = []
        self.properties: dict[str, Schema] = {}
        self.pattern_properties: list[tuple[re.Pattern, str, Schema]] = []
        self.additional_properties: tuple | None = None
        self.dependent_required: dict[str, list[str]] = {}
        self.dependent_schemas: dict[str, Schema] = {}
        self.min_items: int | None = None
        self.max_items: int | None = None
        self.unique_items: bool = False
        self.items: tuple | None = None
        self.additional_items: tuple | None = None
        self.minimum: Fraction | None = None
        self.exclusive_minimum: bool = False
        self.maximum: Fraction | None = None
        self.exclusive_maximum: bool = False
        self.multiple_of: Fraction | None = None
        self.min_length: int | None = None
        self.max_length: int | None = None
        self.pattern: re.Pattern | None = None
        self.pattern_source: str | None = None
        # lazy fast-path caches (fields above are filled by the compiler
        # after construction, so these are computed on first use)
        self._enum_str_set: frozenset | None = None
        self._num_fast: tuple | None = None
        self._has_comp: bool | None = None

    # -- public API ------------------------------------------------------

    def validate_json(self, data) -> None:
        """Validate raw JSON ``bytes | str``; raises ValidationError."""
        try:
            tree = parse_json(data)
        except JSONError as e:
            raise ValidationError(str(e)) from None
        self.validate(tree)

    def check(self, data) -> str | None:
        """Returns the first violation message, or None when valid."""
        try:
            if isinstance(data, (bytes, str)):
                self.validate_json(data)
            else:
                self.validate(data)
            return None
        except ValidationError as e:
            return e.msg

    # -- validate dispatch (validate.go:23-77) ---------------------------

    def validate(self, value) -> None:
        has_comp = self._has_comp
        if has_comp is None:
            has_comp = self._has_comp = bool(
                self.enum or self.all_of or self.one_of or self.any_of
            ) or self.not_ is not None
        if has_comp:
            try:
                self._validate_enum(value)
            except ValidationError as e:
                _wrap("enum", e)
            try:
                self._validate_all_of(value)
            except ValidationError as e:
                _wrap("allOf", e)
            try:
                self._validate_one_of(value)
            except ValidationError as e:
                _wrap("oneOf", e)
            try:
                self._validate_any_of(value)
            except ValidationError as e:
                _wrap("anyOf", e)
            try:
                self._validate_not(value)
            except ValidationError as e:
                _wrap("not", e)

        # exact-type dispatch (the tree holds only None/bool/str/JNum/
        # list/dict); the jx token-type name is rendered only on failure
        t = type(value)
        try:
            if t is str:
                self._validate_string(value)
            elif t is JNum:
                self._validate_number(value)
            elif t is dict:
                self._validate_object(value)
            elif t is list:
                self._validate_array(value)
            else:
                self._check_type(NULL_T if value is None else BOOLEAN_T)
        except ValidationError as e:
            _wrap(json_token_type(value), e)

    # -- composition (validate.go:79-161) --------------------------------

    def _validate_enum(self, value) -> None:
        if not self.enum:
            return
        if type(value) is str:
            # deep equality can only match a str against a str variant, so a
            # raw-string set decides membership without rendering JSON
            ss = self._enum_str_set
            if ss is None:
                ss = self._enum_str_set = frozenset(
                    v for v in self.enum if type(v) is str
                )
            if value in ss:
                return
            _fail(f"{go_quote(to_json(value))} is not present in enum")
        if to_json(value) in self.enum_keys:
            return  # fast path, cf. enumMap (validate.go:84-87)
        for variant in self.enum:
            if equal(variant, value):
                return
        _fail(f"{go_quote(to_json(value))} is not present in enum")

    def _validate_all_of(self, value) -> None:
        for i, schema in enumerate(self.all_of):
            try:
                schema.validate(value)
            except ValidationError as e:
                _wrap(f"[{i}]", e)

    def _validate_one_of(self, value) -> None:
        if not self.one_of:
            return
        counter = 0
        for schema in self.one_of:
            try:
                schema.validate(value)
            except ValidationError:
                continue
            if counter != 0:
                _fail("must match exactly once")
            counter += 1
        if counter == 0:
            _fail("must match at least once")

    def _validate_any_of(self, value) -> None:
        if not self.any_of:
            return
        for schema in self.any_of:
            try:
                schema.validate(value)
                return
            except ValidationError:
                continue
        _fail("must match at least once")

    def _validate_not(self, value) -> None:
        if self.not_ is not None:
            try:
                self.not_.validate(value)
            except ValidationError:
                return
            _fail("must not match")

    # -- scalars (validate.go:163-264) -----------------------------------

    def _check_type(self, bit: int) -> None:
        if self.types != 0 and not (self.types & bit):
            _fail("type is not allowed")

    def _validate_string(self, s: str) -> None:
        self._check_type(STRING_T)
        if self.min_length is None and self.max_length is None and self.pattern is None:
            return
        if self.min_length is not None or self.max_length is not None:
            count = len(s)  # code points, = utf8.RuneCount on the encoded bytes
            if self.min_length is not None and count < self.min_length:
                _fail(f"length is smaller than {self.min_length}")
            if self.max_length is not None and count > self.max_length:
                _fail(f"length is bigger than {self.max_length}")
        if self.pattern is not None and not self.pattern.search(s):
            _fail(f"does not match pattern {self.pattern_source}")

    def _validate_number(self, num: JNum) -> None:
        has_number = self.types == 0 or bool(self.types & NUMBER_T)
        has_constraints = (
            self.minimum is not None
            or self.maximum is not None
            or self.multiple_of is not None
        )
        if has_number and not has_constraints:
            return
        if not has_number:
            if num.is_int:
                self._check_type(INTEGER_T)
            else:
                self._check_type(NUMBER_T)
                return
        if has_constraints:
            # int-vs-int fast path: integral bounds + integer lexeme compare
            # as machine ints, skipping Fraction allocation entirely
            fast = self._num_fast
            if fast is None:
                fast = self._num_fast = (
                    self.multiple_of is None
                    and (self.minimum is None or self.minimum.denominator == 1)
                    and (self.maximum is None or self.maximum.denominator == 1),
                    None if self.minimum is None else self.minimum.numerator,
                    None if self.maximum is None else self.maximum.numerator,
                )
            if fast[0] and num.is_int:
                v = int(num.lexeme)
                lo, hi = fast[1], fast[2]
                if lo is not None and (v < lo or (self.exclusive_minimum and v == lo)):
                    _fail(f"value {v}/1 is smaller than {lo}/1")
                if hi is not None and (v > hi or (self.exclusive_maximum and v == hi)):
                    _fail(f"value {v}/1 is bigger than {hi}/1")
                return
            val = num.fraction()
            if self.minimum is not None:
                if val < self.minimum or (self.exclusive_minimum and val == self.minimum):
                    _fail(f"value {rat_str(val)} is smaller than {rat_str(self.minimum)}")
            if self.maximum is not None:
                if val > self.maximum or (self.exclusive_maximum and val == self.maximum):
                    _fail(f"value {rat_str(val)} is bigger than {rat_str(self.maximum)}")
            if self.multiple_of is not None:
                quo = val / self.multiple_of
                if quo.denominator != 1:
                    # The reference formats the mutated quotient
                    # (validate.go:250-251).
                    _fail(f"{rat_str(quo)} is not multiple of {rat_str(self.multiple_of)}")

    # -- arrays (validate.go:267-380) ------------------------------------

    def _elem_validator(self, idx: int) -> "Schema | None":
        it = self.items
        if it is None or it[0] == "object":
            # "items" absent or single-schema: additionalItems is ignored
            # (validate.go:267-275).
            return None if it is None else it[1]
        arr = it[1]
        if idx < len(arr):
            return arr[idx]
        ai = self.additional_items
        if ai is None:
            return None
        if ai[0] == "schema":
            return ai[1]
        if ai[1]:
            return None
        _fail("schema does not allow additionalItems")

    def _validate_array(self, arr: list) -> None:
        self._check_type(ARRAY_T)
        if (
            self.min_items is None
            and self.max_items is None
            and not self.unique_items
            and self.items is None
            and self.additional_items is None
        ):
            return
        collected: list = []
        for i, elem in enumerate(arr):
            sch = self._elem_validator(i)
            if sch is not None or self.unique_items:
                if self.unique_items:
                    collected.append(elem)
                if sch is not None:
                    try:
                        sch.validate(elem)
                    except ValidationError as e:
                        _wrap(f"[{i}]", e)
        n = len(arr)
        if len(collected) > 1:
            for xi in range(len(collected)):
                for yi in range(len(collected)):
                    if xi == yi:
                        continue
                    if equal(collected[xi], collected[yi]):
                        _fail(f"items {xi} and {yi} are equal")
        if self.min_items is not None and n < self.min_items:
            _fail(f"length is smaller than {self.min_items}")
        if self.max_items is not None and n > self.max_items:
            _fail(f"length is bigger than {self.max_items}")

    # -- objects (validate.go:382-525) -----------------------------------

    def _validate_object(self, obj: dict) -> None:
        self._check_type(OBJECT_T)
        if (
            self.min_properties is None
            and self.max_properties is None
            and not self.required
            and not self.properties
            and not self.pattern_properties
            and self.additional_properties is None
            and not self.dependent_schemas
            and not self.dependent_required
        ):
            return

        # Insertion-ordered stand-in for the reference's required set; the
        # reference reports an arbitrary leftover key (Go map iteration,
        # validate.go:513-515) — we deterministically report the first in
        # declaration order.
        required: dict[str, None] = dict.fromkeys(self.required)
        dependent: list[tuple[str, Schema]] = []
        if self.dependent_required or self.dependent_schemas:
            for key in obj:
                extra = self.dependent_required.get(key)
                if extra is not None:
                    for r in extra:
                        required.setdefault(r, None)
                ds = self.dependent_schemas.get(key)
                if ds is not None:
                    dependent.append((key, ds))
        for name, ds in dependent:
            try:
                ds.validate(obj)
            except ValidationError as e:
                _wrap(f"dependent {go_quote(name)}", e)

        multi_pass = self.additional_properties is not None or bool(
            self.pattern_properties
        )
        for k, v in obj.items():
            required.pop(k, None)
            prop = self.properties.get(k, _MISSING)
            in_props = prop is not _MISSING
            if not in_props:
                prop = None
                if not multi_pass:
                    continue
            try:
                if not multi_pass:
                    prop.validate(v)
                    continue
                matched = False
                for rx, src, psch in self.pattern_properties:
                    if rx.search(k):
                        matched = True
                        try:
                            psch.validate(v)
                        except ValidationError as e:
                            _wrap(f"pattern {go_quote(src)}", e)
                if in_props:
                    prop.validate(v)
                elif not matched:
                    ap = self.additional_properties
                    if ap is not None:
                        if ap[0] == "bool":
                            if not ap[1]:
                                _fail("additional properties are not allowed")
                        else:
                            try:
                                ap[1].validate(v)
                            except ValidationError as e:
                                _wrap("additionalProperties", e)
            except ValidationError as e:
                _wrap(go_quote(k), e)

        for k in required:
            _fail(f"required property {go_quote(k)} is missing")
        n = len(obj)
        if self.min_properties is not None and n < self.min_properties:
            _fail(f"length is smaller than {self.min_properties}")
        if self.max_properties is not None and n > self.max_properties:
            _fail(f"length is bigger than {self.max_properties}")
