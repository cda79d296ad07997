"""Deep JSON equality with the reference's numeric-equivalence ladder.

Mirrors the semantics of ``internal/jsonequal/equal.go`` (reference):

* type tags must match first (equal.go:177-185);
* strings compare by decoded bytes (equal.go:27-37);
* numbers compare by *value* across lexemes with the exact ladder from
  equal.go:39-79: both-zero fast path, identical-lexeme fast path, the
  "two distinct integer lexemes are distinct values" short-circuit, a float64
  comparison fast path, and an exact rational fallback when the float64
  conversion overflows;
* arrays compare elementwise in order (equal.go:81-117);
* objects compare as unordered key→value maps (equal.go:119-174).
"""

from __future__ import annotations

import math

from .jsontypes import JNum, json_token_type

__all__ = ["equal"]


def _num_equal(a: JNum, b: JNum) -> bool:
    la, lb = a.lexeme, b.lexeme
    if la == lb:
        return True
    if a.fraction() == 0 and b.fraction() == 0:
        return True
    # NOTE no "one side zero → unequal" rung: the reference has none
    # (equal.go:50-69) — it falls through to the float64 fast path, where
    # an underflowing lexeme like 1e-999 parses to 0.0 and EQUALS zero.
    if a.is_int and b.is_int:
        # Distinct non-zero integer lexemes (JSON forbids leading zeros /
        # plus signs) denote distinct values.
        return False
    x, y = float(la), float(lb)
    if math.isinf(x) or math.isinf(y):
        # Go falls back to exact big.Rat when ParseFloat overflows.
        return a.fraction() == b.fraction()
    return x == y


def equal(a, b) -> bool:
    ta, tb = json_token_type(a), json_token_type(b)
    if ta != tb:
        return False
    if ta == "null":
        return True
    if ta == "bool" or ta == "string":
        return a == b
    if ta == "number":
        return _num_equal(a, b)
    if ta == "array":
        if len(a) != len(b):
            return False
        return all(equal(x, y) for x, y in zip(a, b))
    # object
    if len(a) != len(b):
        return False
    for k, va in a.items():
        if k not in b or not equal(va, b[k]):
            return False
    return True
