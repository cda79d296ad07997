"""Component tests: RFC 6901 pointer walk and deep JSON equality.

Mirrors the reference's spec tables (jsonpointer_test.go:14-94 — the RFC 6901
§5 example document — and internal/jsonequal/equal_test.go)."""

from __future__ import annotations

import pytest

from jsonschema_ray.core import PointerError, equal, find, parse_json

# RFC 6901 §5 example document.
RFC_DOC = r"""{
   "foo": ["bar", "baz"],
   "": 0,
   "a/b": 1,
   "c%d": 2,
   "e^f": 3,
   "g|h": 4,
   "i\\j": 5,
   "k\"l": 6,
   " ": 7,
   "m~n": 8
}"""

RFC_CASES = [
    ("", None),  # whole document
    ("#/foo", ["bar", "baz"]),
    ("#/foo/0", "bar"),
    ("#/", 0),
    ("#/a~1b", 1),
    ("#/c%25d", 2),
    ("#/e%5Ef", 3),
    ("#/g%7Ch", 4),
    ("#/i%5Cj", 5),
    ("#/k%22l", 6),
    ("#/%20", 7),
    ("#/m~0n", 8),
]


@pytest.mark.parametrize("frag,expected", RFC_CASES)
def test_rfc6901(frag, expected):
    tree = parse_json(RFC_DOC)
    _, got = find(frag, tree)
    if expected is None:
        assert got is tree
    else:
        got = int(got.lexeme) if hasattr(got, "lexeme") else got
        assert got == expected


@pytest.mark.parametrize(
    "frag",
    ["#/missing", "#/foo/2", "#/foo/x", "#/foo/-", "#foo", "#/foo/0/bar"],
)
def test_pointer_errors(frag):
    tree = parse_json(RFC_DOC)
    with pytest.raises(PointerError):
        find(frag, tree)


EQUAL_CASES = [
    ("1", "1", True),
    ("1", "1.0", True),
    ("1", "1e0", True),
    ("0", "-0", True),
    ("0", "0.0", True),
    ("1.5", "3e-1", False),
    ("1.5", "1.50", True),
    ("10", "1e1", True),
    ("123456789012345678901", "123456789012345678902", False),
    ('"a"', '"a"', True),
    ('"a"', '"b"', False),
    ('"1"', "1", False),
    ("null", "null", True),
    ("null", "false", False),
    ("true", "true", True),
    ("[1, 2]", "[1.0, 2.0]", True),
    ("[1, 2]", "[2, 1]", False),
    ("[1, 2]", "[1, 2, 3]", False),
    ('{"a": 1, "b": 2}', '{"b": 2.0, "a": 1.0}', True),
    ('{"a": 1}', '{"a": 1, "b": 2}', False),
    ('{"a": {"b": [1]}}', '{"a": {"b": [1.0]}}', True),
    ('{"a": 1}', '{"b": 1}', False),
]


@pytest.mark.parametrize("a,b,want", EQUAL_CASES)
def test_deep_equal(a, b, want):
    assert equal(parse_json(a), parse_json(b)) is want
    assert equal(parse_json(b), parse_json(a)) is want
