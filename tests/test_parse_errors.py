"""The 24 malformed-schema cases from the reference's TestParse
(jsonschema_test.go:114-194) — compile must fail on every one."""

from __future__ import annotations

import pytest

from jsonschema_ray.core import JSONError, SchemaCompileError, parse

VERY_BAD = r"""{
  "allOf": [
    {
      "patternProperties": {
        "foo$": {
          "dependencies": {
            "foo": {
              "additionalProperties": {
                "additionalItems": {
                  "properties": {
                    "foo": {
                      "items": {
                        "required": [
                          "foo",
                          "foo"
                        ]
                      }
                    }
                  }
                }
              }
            }
          }
        }
      }
    }
  ]
}"""

BAD_SCHEMAS = [
    # Invalid JSON handling.
    "",
    "{",
    "[]",
    # Invalid structure handling.
    '{"type":{}}',
    '{"id":{}}',
    '{"items":10}',
    '{"minimum":"10"}',
    '{"minimum":true}',
    '{"properties":["foobar"]}',
    '{"additionalProperties":{"type":1}}',
    '{"additionalProperties":[]}',
    '{"patternProperties":{"foo":[]}}',
    '{"dependencies":{"foo":1}}',
    '{"dependencies":{"foo":[1]}}',
    '{"dependencies":{"foo":{"type":1}}}',
    # Invalid "type".
    '{"type":["foobar"]}',
    # Invalid "id".
    '{"dependencies":{"id":":"}}',
    '{"definitions":{"foo":{"id":":"}}}',
    '{"items":[{"id":":"}]}',
    '{"items":{"id":":"}}',
    # Invalid "ref".
    '{"$ref":":"}',
    # Duplicate "required".
    VERY_BAD,
    # Bad regex (a single backslash).
    '{"pattern":"\\\\"}',
    '{"patternProperties":{"\\\\":{}}}',
]


@pytest.mark.parametrize("data", BAD_SCHEMAS, ids=range(len(BAD_SCHEMAS)))
def test_parse_error(data):
    with pytest.raises((SchemaCompileError, JSONError)):
        parse(data)


def test_parse_ok_simple():
    sch = parse('{"type": "integer", "minimum": 0}')
    assert sch.check("5") is None
    assert sch.check("5.5") == "number: type is not allowed"
    assert sch.check("-1") == "number: value -1/1 is smaller than 0/1"
