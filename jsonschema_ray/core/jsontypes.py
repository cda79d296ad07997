"""Lexeme-preserving JSON values and Go-compatible formatting helpers.

The reference validator (tdakkota/jsonschema) never converts JSON numbers to
floats: it keeps the raw token (``jx.Num``) and promotes to ``big.Rat`` only
when a numeric keyword needs the value (raw_schema.go:10-31,
validate.go:231-253).  Draft-4's ``integer`` type is *lexical*: a number is an
integer iff its token has no fraction/exponent part (validate.go:220-229), so
``1.0`` fails ``{"type": "integer"}``.

We reproduce this with :class:`JNum`, which wraps the raw lexeme string that
``json.loads`` hands to its ``parse_int`` / ``parse_float`` hooks.
"""

from __future__ import annotations

import math
from fractions import Fraction
from functools import lru_cache

__all__ = [
    "JNum",
    "JSONError",
    "parse_json",
    "json_token_type",
    "to_json",
    "go_quote",
    "rat_str",
]


class JSONError(ValueError):
    """Raised when a document is not valid JSON."""


class JNum:
    """A JSON number that remembers its lexeme.

    ``is_int`` mirrors ``jx.Num.IsInt`` — true iff the lexeme contains no
    ``.``/``e``/``E`` (reference validate.go:221).
    """

    __slots__ = ("lexeme", "_frac")

    def __init__(self, lexeme: str) -> None:
        self.lexeme = lexeme
        self._frac = None

    @property
    def is_int(self) -> bool:
        lx = self.lexeme
        return "." not in lx and "e" not in lx and "E" not in lx

    def fraction(self) -> Fraction:
        f = self._frac
        if f is None:
            lx = self.lexeme
            # int lexemes skip Fraction's string-parsing regex
            f = Fraction(int(lx)) if self.is_int else Fraction(lx)
            self._frac = f
        return f

    def __repr__(self) -> str:  # pragma: no cover
        return f"JNum({self.lexeme!r})"

    # Equality by numeric value (used in tests; the validator uses
    # jsonequal.equal for semantic comparisons).
    def __eq__(self, other: object) -> bool:
        if isinstance(other, JNum):
            return self.fraction() == other.fraction()
        return NotImplemented

    def __hash__(self) -> int:
        return hash(self.fraction())


def _reject_constant(name: str):
    raise JSONError(f"invalid json: constant {name} is not allowed")


def _make_decoder():
    import json

    return json.JSONDecoder(
        parse_float=JNum, parse_int=JNum, parse_constant=_reject_constant
    )


# json.loads(**kwargs) builds a fresh JSONDecoder per call; one shared
# instance (stateless, thread-safe) drops that from the per-doc hot path.
_DECODER = _make_decoder()


def parse_json(data):
    """Parse ``bytes | str`` into a lexeme-preserving tree.

    Numbers become :class:`JNum`; objects keep document key order (CPython
    dicts preserve insertion order, matching the reference's streaming object
    iteration, validate.go:452-508).
    """
    if isinstance(data, (bytes, bytearray)):
        try:
            data = data.decode("utf-8")
        except UnicodeDecodeError as e:
            raise JSONError(f"invalid json: {e}") from None
    try:
        return _DECODER.decode(data)
    except JSONError:
        raise
    except ValueError as e:
        raise JSONError(f"invalid json: {e}") from None


def tree_value(v):
    """Arrow python value → lexeme-preserving JSON tree value, recursively
    (list/struct columns carry nested numbers that must become JNum)."""
    if v is None or isinstance(v, str):
        return v
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if not math.isfinite(v):
            # Arrow float columns can carry NaN/Inf, which JSON cannot
            # express (and pandas round-trips can't distinguish NaN from
            # null anyway) — map non-finite to the engine's null-is-absent
            # convention instead of minting an invalid lexeme whose
            # fraction() crashes numeric keywords downstream
            return None
        return JNum(repr(v))
    if isinstance(v, int):
        return JNum(str(v))
    if isinstance(v, list):
        return [tree_value(x) for x in v]
    if isinstance(v, dict):
        return {k: tree_value(x) for k, x in v.items()}
    # datetime-like (nested timestamps)
    return v.strftime("%Y-%m-%dT%H:%M:%S.%f")


_KEYWORD_PATTERNS = [
    ("is not present in enum", "enum"),
    ("does not match pattern", "pattern"),
    ("type is not allowed", "type"),
    ("required property", "required"),
    ("is smaller than", None),  # length vs value, resolved below
    ("is bigger than", None),
    ("is not multiple of", "multipleOf"),
    ("additional properties are not allowed", "additionalProperties"),
    ("are equal", "uniqueItems"),
    ("must match exactly once", "oneOf"),
    ("must match at least once", None),
    ("must not match", "not"),
    ("schema does not allow additionalItems", "additionalItems"),
    ("invalid json", "json"),
]


def keyword_of(msg: str) -> str:
    """Draft-4 keyword for a wrapped message (for the ``keyword`` column)."""
    for pat, kw in _KEYWORD_PATTERNS:
        if pat in msg:
            if kw is not None:
                return kw
            if pat == "must match at least once":
                return "oneOf" if "oneOf" in msg else "anyOf"
            is_len = "length is" in msg
            tail = "smaller" if "smaller" in msg else "bigger"
            if is_len:
                if "string:" in msg.rsplit("length is", 1)[0][-40:]:
                    return "minLength" if tail == "smaller" else "maxLength"
                if "array:" in msg.rsplit("length is", 1)[0][-40:]:
                    return "minItems" if tail == "smaller" else "maxItems"
                return "minProperties" if tail == "smaller" else "maxProperties"
            return "minimum" if tail == "smaller" else "maximum"
    return "schema"


# jx token-type names used by the reference when wrapping type-dispatch errors
# (validate.go:74 `errors.Wrap(err, tt.String())`).
def json_token_type(value) -> str:
    if value is None:
        return "null"
    if value is True or value is False:
        return "bool"
    if isinstance(value, str):
        return "string"
    if isinstance(value, JNum):
        return "number"
    if isinstance(value, list):
        return "array"
    if isinstance(value, dict):
        return "object"
    raise TypeError(f"not a JSON value: {type(value)!r}")


def to_json(value) -> str:
    """Compact canonical rendering of a tree (numbers emit their lexemes)."""
    out: list[str] = []
    _render(value, out)
    return "".join(out)


def _render(value, out: list[str]) -> None:
    import json

    if value is None:
        out.append("null")
    elif value is True:
        out.append("true")
    elif value is False:
        out.append("false")
    elif isinstance(value, JNum):
        out.append(value.lexeme)
    elif isinstance(value, str):
        out.append(json.dumps(value, ensure_ascii=False))
    elif isinstance(value, list):
        out.append("[")
        for i, v in enumerate(value):
            if i:
                out.append(",")
            _render(v, out)
        out.append("]")
    elif isinstance(value, dict):
        out.append("{")
        for i, (k, v) in enumerate(value.items()):
            if i:
                out.append(",")
            out.append(json.dumps(k, ensure_ascii=False))
            out.append(":")
            _render(v, out)
        out.append("}")
    else:
        raise TypeError(f"not a JSON value: {type(value)!r}")


_GO_ESCAPES = {
    "\a": "\\a",
    "\b": "\\b",
    "\f": "\\f",
    "\n": "\\n",
    "\r": "\\r",
    "\t": "\\t",
    "\v": "\\v",
    "\\": "\\\\",
    '"': '\\"',
}


@lru_cache(maxsize=4096)
def go_quote(s: str) -> str:
    """Approximate Go ``strconv.Quote`` — used for ``%q`` message parity."""
    out = ['"']
    for ch in s:
        esc = _GO_ESCAPES.get(ch)
        if esc is not None:
            out.append(esc)
            continue
        o = ord(ch)
        if o < 0x20 or o == 0x7F:
            out.append(f"\\x{o:02x}")
        elif ch.isprintable():
            out.append(ch)
        elif o < 0x10000:
            out.append(f"\\u{o:04x}")
        else:
            out.append(f"\\U{o:08x}")
    out.append('"')
    return "".join(out)


def rat_str(f: Fraction) -> str:
    """Render like Go ``big.Rat.String()`` — always ``a/b``."""
    return f"{f.numerator}/{f.denominator}"
