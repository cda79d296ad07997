"""Violation-message parity with the reference's wrapped-context format.

The reference reports the first violation with contextual wrapping, e.g.
``object: "number": string: type is not allowed`` (reference README.md:41-42);
templates are cited in SURVEY.md §1.1.  These messages become the ``message``
column of the violation-row table, so they are pinned here."""

from __future__ import annotations

import json

import pytest

from jsonschema_ray.core import parse

README_SCHEMA = {
    "type": "object",
    "properties": {
        "number": {"type": "number"},
        "street_name": {"type": "string"},
        "street_type": {"type": "string", "enum": ["Street", "Avenue", "Boulevard"]},
    },
}

CASES = [
    # The reference README's worked example (README.md:26-42).
    (
        README_SCHEMA,
        {"number": "1600", "street_name": "Pennsylvania", "street_type": "Avenue"},
        'object: "number": string: type is not allowed',
    ),
    ({"type": "string"}, 10, "number: type is not allowed"),
    ({"enum": ["a", "b"]}, "c", 'enum: "\\"c\\"" is not present in enum'),
    ({"minLength": 2}, "a", "string: length is smaller than 2"),
    ({"maxLength": 1}, "ab", "string: length is bigger than 1"),
    ({"pattern": "^a+$"}, "bbb", "string: does not match pattern ^a+$"),
    ({"minimum": 5}, 4, "number: value 4/1 is smaller than 5/1"),
    ({"maximum": 5}, 6, "number: value 6/1 is bigger than 5/1"),
    # multipleOf formats the mutated quotient (validate.go:250-251).
    ({"multipleOf": 2}, 7, "number: 7/2 is not multiple of 2/1"),
    ({"minItems": 2}, [1], "array: length is smaller than 2"),
    ({"maxItems": 1}, [1, 2], "array: length is bigger than 1"),
    ({"uniqueItems": True}, [1, 2, 1], "array: items 0 and 2 are equal"),
    ({"items": {"type": "string"}}, ["a", 1], "array: [1]: number: type is not allowed"),
    (
        {"items": [{"type": "string"}], "additionalItems": False},
        ["a", 1],
        "array: schema does not allow additionalItems",
    ),
    ({"required": ["foo"]}, {}, 'object: required property "foo" is missing'),
    (
        {"properties": {"foo": {"type": "string"}}},
        {"foo": 1},
        'object: "foo": number: type is not allowed',
    ),
    (
        {"additionalProperties": False, "properties": {"a": {}}},
        {"a": 1, "b": 2},
        'object: "b": additional properties are not allowed',
    ),
    (
        {"dependencies": {"foo": ["bar"]}},
        {"foo": 1},
        'object: required property "bar" is missing',
    ),
    ({"minProperties": 1}, {}, "object: length is smaller than 1"),
    ({"maxProperties": 1}, {"a": 1, "b": 2}, "object: length is bigger than 1"),
    ({"not": {}}, 1, "not: must not match"),
    ({"anyOf": [{"type": "string"}]}, 1, "anyOf: must match at least once"),
    ({"oneOf": [{"type": "string"}]}, 1, "oneOf: must match at least once"),
    ({"oneOf": [{}, {}]}, 1, "oneOf: must match exactly once"),
    (
        {"allOf": [{}, {"type": "string"}]},
        1,
        "allOf: [1]: number: type is not allowed",
    ),
    (
        {"patternProperties": {"^f": {"type": "string"}}},
        {"foo": 1},
        'object: "foo": pattern "^f": number: type is not allowed',
    ),
    # Exclusive bounds flip the comparison (validate.go:239,245).
    (
        {"minimum": 5, "exclusiveMinimum": True},
        5,
        "number: value 5/1 is smaller than 5/1",
    ),
    (
        {"maximum": 1.5, "exclusiveMaximum": True},
        1.5,
        "number: value 3/2 is bigger than 3/2",
    ),
]


@pytest.mark.parametrize(
    "schema,data,want", CASES, ids=[c[2][:45] for c in CASES]
)
def test_message(schema, data, want):
    sch = parse(json.dumps(schema))
    assert sch.check(json.dumps(data)) == want
