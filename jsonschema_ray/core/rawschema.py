"""Strict, shape-checked decoding of raw Draft-4 schemas.

Mirrors the reference's ``RawSchema`` custom decoders (raw_schema.go:85-365):

* ``type``: string or array of strings drawn from the 7 Draft-4 names
  (raw_schema.go:35-82) — anything else is a parse error;
* ``properties`` / ``patternProperties``: objects of schemas, order-preserving
  (raw_schema.go:148-167, 230-249);
* ``items``: object (single schema) or array (tuple form)
  (raw_schema.go:185-196);
* ``additionalProperties`` / ``additionalItems``: bool or schema
  (raw_schema.go:340-365);
* ``dependencies``: object whose values are arrays of strings
  (dependentRequired) or schemas (dependentSchemas) (raw_schema.go:282-324);
* numeric keywords keep their raw lexemes and reject strings/bools
  (raw_schema.go:19-30);
* the count keywords (``min/maxLength`` etc.) must be non-negative lexical
  integers (Go ``*uint64`` unmarshal).

All malformed shapes raise :class:`SchemaParseError` — the 24 cases in the
reference's ``TestParse`` (jsonschema_test.go:144-180) must all fail here.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .jsontypes import JNum, json_token_type

__all__ = ["SchemaParseError", "RawSchema", "raw_schema_from_tree"]

_TYPE_NAMES = frozenset(
    ["array", "boolean", "integer", "null", "number", "object", "string"]
)


class SchemaParseError(ValueError):
    pass


def _err(msg: str):
    raise SchemaParseError(msg)


@dataclass
class RawSchema:
    id: str | None = None
    ref: str | None = None
    types: list[str] | None = None
    format: str | None = None
    enum: list | None = None

    all_of: list["RawSchema"] = field(default_factory=list)
    any_of: list["RawSchema"] = field(default_factory=list)
    one_of: list["RawSchema"] = field(default_factory=list)
    not_: "RawSchema | None" = None

    min_properties: int | None = None
    max_properties: int | None = None
    required: list[str] = field(default_factory=list)
    properties: list[tuple[str, "RawSchema"]] = field(default_factory=list)
    pattern_properties: list[tuple[str, "RawSchema"]] = field(default_factory=list)
    # None = absent; ("bool", b) or ("schema", RawSchema)
    additional_properties: tuple | None = None
    dependent_required: dict[str, list[str]] = field(default_factory=dict)
    dependent_schemas: dict[str, "RawSchema"] = field(default_factory=dict)

    min_items: int | None = None
    max_items: int | None = None
    unique_items: bool = False
    # None = absent; ("object", RawSchema) or ("array", [RawSchema])
    items: tuple | None = None
    additional_items: tuple | None = None

    minimum: JNum | None = None
    exclusive_minimum: bool = False
    maximum: JNum | None = None
    exclusive_maximum: bool = False
    multiple_of: JNum | None = None

    min_length: int | None = None
    max_length: int | None = None
    pattern: str | None = None


def _want_str(v, kw: str) -> str:
    if not isinstance(v, str):
        _err(f"{kw}: unexpected type {json_token_type(v)!r}")
    return v


def _want_bool(v, kw: str) -> bool:
    if v is not True and v is not False:
        _err(f"{kw}: unexpected type {json_token_type(v)!r}")
    return v


def _want_num(v, kw: str) -> JNum:
    if not isinstance(v, JNum):
        _err(f"invalid number for {kw}: unexpected type {json_token_type(v)!r}")
    return v


def _want_uint(v, kw: str) -> int:
    # Go decodes these into *uint64: the literal must be a non-negative
    # lexical integer WITHIN uint64 range (2^64 overflows Go's unmarshal
    # with a range error — accepting a Python bigint here would compile
    # schemas the reference reports as parse failures).
    if not isinstance(v, JNum) or not v.is_int:
        _err(f"{kw}: cannot unmarshal into uint64")
    n = int(v.lexeme)
    if n < 0:
        _err(f"{kw}: cannot unmarshal negative value into uint64")
    if n > 2**64 - 1:
        _err(f"{kw}: cannot unmarshal number {v.lexeme} into uint64 (overflow)")
    return n


def _parse_type(v) -> list[str]:
    def one(x) -> str:
        s = _want_str(x, "type")
        if s not in _TYPE_NAMES:
            _err(f"unexpected type {s!r}")
        return s

    if isinstance(v, str):
        return [one(v)]
    if isinstance(v, list):
        return [one(x) for x in v]
    _err(f"type: unexpected type {json_token_type(v)!r}")


def _parse_schema_map(v, kw: str) -> list[tuple[str, RawSchema]]:
    if not isinstance(v, dict):
        _err(f"{kw}: unexpected type {json_token_type(v)!r}")
    return [(k, raw_schema_from_tree(sub)) for k, sub in v.items()]


def _parse_additional(v, kw: str) -> tuple:
    if v is True or v is False:
        return ("bool", v)
    if isinstance(v, dict):
        return ("schema", raw_schema_from_tree(v))
    _err(f"{kw}: unexpected type {json_token_type(v)!r}")


# Keywords whose Go struct field is a plain type, pointer, or slice:
# encoding/json treats a JSON null for these as "not present" (no-op,
# no error).  The remaining keywords (type, properties,
# patternProperties, dependencies, minimum, maximum, multipleOf) are
# NON-pointer fields with custom UnmarshalJSON, which encoding/json DOES
# invoke on null — their jx decoders error, so null stays a parse error
# for them (raw_schema.go:85-120 field-by-field).
_NULL_IS_ABSENT = frozenset(
    {
        "id", "$ref", "format", "enum", "allOf", "anyOf", "oneOf", "not",
        "minProperties", "maxProperties", "required",
        "additionalProperties", "minItems", "maxItems", "uniqueItems",
        "items", "additionalItems", "exclusiveMinimum", "exclusiveMaximum",
        "maxLength", "minLength", "pattern",
    }
)


def raw_schema_from_tree(tree) -> RawSchema:
    if not isinstance(tree, dict):
        _err(f"schema must be an object, got {json_token_type(tree)}")
    s = RawSchema()
    for key, v in tree.items():
        if v is None and key in _NULL_IS_ABSENT:
            continue
        if key == "id":
            s.id = _want_str(v, "id")
        elif key == "$ref":
            s.ref = _want_str(v, "$ref")
        elif key == "type":
            s.types = _parse_type(v)
        elif key == "format":
            s.format = _want_str(v, "format")
        elif key == "enum":
            if not isinstance(v, list):
                _err(f"enum: unexpected type {json_token_type(v)!r}")
            s.enum = v
        elif key == "allOf" or key == "anyOf" or key == "oneOf":
            if not isinstance(v, list):
                _err(f"{key}: unexpected type {json_token_type(v)!r}")
            dest = [raw_schema_from_tree(x) for x in v]
            if key == "allOf":
                s.all_of = dest
            elif key == "anyOf":
                s.any_of = dest
            else:
                s.one_of = dest
        elif key == "not":
            if not isinstance(v, dict):
                _err(f"not: unexpected type {json_token_type(v)!r}")
            s.not_ = raw_schema_from_tree(v)
        elif key == "minProperties":
            s.min_properties = _want_uint(v, key)
        elif key == "maxProperties":
            s.max_properties = _want_uint(v, key)
        elif key == "required":
            if not isinstance(v, list):
                _err(f"required: unexpected type {json_token_type(v)!r}")
            s.required = [_want_str(x, "required") for x in v]
        elif key == "properties":
            s.properties = _parse_schema_map(v, key)
        elif key == "patternProperties":
            s.pattern_properties = _parse_schema_map(v, key)
        elif key == "additionalProperties":
            s.additional_properties = _parse_additional(v, key)
        elif key == "dependencies":
            if not isinstance(v, dict):
                _err(f"dependencies: unexpected type {json_token_type(v)!r}")
            for dk, dv in v.items():
                if isinstance(dv, list):
                    s.dependent_required[dk] = [
                        _want_str(x, "dependencies") for x in dv
                    ]
                elif isinstance(dv, dict):
                    s.dependent_schemas[dk] = raw_schema_from_tree(dv)
                else:
                    _err(f"dependencies: unexpected type {json_token_type(dv)!r}")
        elif key == "minItems":
            s.min_items = _want_uint(v, key)
        elif key == "maxItems":
            s.max_items = _want_uint(v, key)
        elif key == "uniqueItems":
            s.unique_items = _want_bool(v, key)
        elif key == "items":
            if isinstance(v, list):
                s.items = ("array", [raw_schema_from_tree(x) for x in v])
            elif isinstance(v, dict):
                s.items = ("object", raw_schema_from_tree(v))
            else:
                _err(f"items: unexpected type {json_token_type(v)!r}")
        elif key == "additionalItems":
            s.additional_items = _parse_additional(v, key)
        elif key == "minimum":
            s.minimum = _want_num(v, key)
        elif key == "exclusiveMinimum":
            s.exclusive_minimum = _want_bool(v, key)
        elif key == "maximum":
            s.maximum = _want_num(v, key)
        elif key == "exclusiveMaximum":
            s.exclusive_maximum = _want_bool(v, key)
        elif key == "multipleOf":
            s.multiple_of = _want_num(v, key)
        elif key == "maxLength":
            s.max_length = _want_uint(v, key)
        elif key == "minLength":
            s.min_length = _want_uint(v, key)
        elif key == "pattern":
            s.pattern = _want_str(v, key)
        # Unknown keywords are ignored, matching encoding/json's behavior.
    return s
