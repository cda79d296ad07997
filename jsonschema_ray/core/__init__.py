"""Pure-Python Draft-4 core: compile + exact row-level validation.

This package is driver-side / per-actor state only; the distributed hot path
lives in :mod:`jsonschema_ray.vector` and :mod:`jsonschema_ray.stages`.
"""

from .compiler import SchemaCompileError, compile_raw, parse
from .equal import equal
from .jsontypes import JNum, JSONError, go_quote, parse_json, rat_str, to_json
from .pointer import PointerError, find
from .rawschema import RawSchema, SchemaParseError, raw_schema_from_tree
from .resolver import NoRemote, Remote, ResolveError
from .schema import Schema, ValidationError

__all__ = [
    "JNum",
    "JSONError",
    "NoRemote",
    "PointerError",
    "RawSchema",
    "Remote",
    "ResolveError",
    "Schema",
    "SchemaCompileError",
    "SchemaParseError",
    "ValidationError",
    "compile_raw",
    "equal",
    "find",
    "go_quote",
    "parse",
    "parse_json",
    "rat_str",
    "raw_schema_from_tree",
    "to_json",
]
