"""RawSchema → Schema compilation with ``$ref`` resolution.

Mirrors the reference compiler (compiler.go:20-261, resolve.go:56-112):

* ``Parse`` = strict decode → ``collectIDs`` → compile (jsonschema.go:6-16);
* a schema node with ``$ref`` compiles to the resolved target; everything
  else on the node is ignored (compiler.go:49-55, Draft-4 behavior);
* an ``id`` member opens a new base-URI scope for nested refs
  (compiler.go:56-62);
* ``format`` is parsed but deliberately dropped (compiler.go:64-67) — it
  produces no violations, matching the reference's suite skip;
* duplicate entries in ``required`` are a compile error (compiler.go:106-114);
* regexes compile eagerly so bad patterns fail at compile time
  (compiler.go:125-128, 195-200);
* ``$ref`` resolution caches by the literal ref string and registers the
  schema *before* compiling its children, which is what makes recursive /
  cyclic refs terminate (resolve.go:57, resolve.go:88-91);
* resolution depth is capped (maxResolveDepth=1000, resolve.go:11) — here as
  a compiler-wide counter, which also catches pure ref→ref cycles.
"""

from __future__ import annotations

import re
from fractions import Fraction

from .document import Document, collect_ids
from .jsontypes import JNum, parse_json, to_json
from .rawschema import RawSchema, SchemaParseError, raw_schema_from_tree
from .resolver import Remote, ResolveError
from .schema import TYPE_BITS, Schema
from .urls import URLError, parse_url, resolve_url, strip_fragment

__all__ = ["SchemaCompileError", "parse", "compile_raw"]

_MAX_RESOLVE_DEPTH = 1000


class SchemaCompileError(ValueError):
    pass


def _err(msg: str):
    raise SchemaCompileError(msg)


def parse(data, resolver=None) -> Schema:
    """Parse and compile a Draft-4 schema document (jsonschema.go:6-16)."""
    try:
        tree = parse_json(data)
    except ValueError as e:
        raise SchemaCompileError(str(e)) from None
    try:
        raw = raw_schema_from_tree(tree)
    except SchemaParseError as e:
        raise SchemaCompileError(str(e)) from None
    try:
        doc = collect_ids(None, tree)
    except (ValueError, URLError) as e:
        raise SchemaCompileError(f"collect IDs: {e}") from None
    return _Compiler(doc, resolver or Remote()).compile(raw)


def compile_raw(tree, resolver=None) -> Schema:
    """Compile an already-parsed schema tree (dict of JNum-bearing values)."""
    raw = raw_schema_from_tree(tree)
    doc = collect_ids(None, tree)
    return _Compiler(doc, resolver or Remote()).compile(raw)


class _Compiler:
    def __init__(self, doc: Document, resolver) -> None:
        self.doc = doc
        self.resolver = resolver
        self.remotes: dict[str, Document] = {"": doc}
        if doc.id is not None:
            self.remotes[strip_fragment(doc.id)] = doc
        self.refcache: dict[str, Schema] = {}
        self.depth = 0

    def compile(self, raw: RawSchema) -> Schema:
        return self._compile(raw, self.doc.id)

    def _compile(self, raw: RawSchema, base: str | None) -> Schema:
        return self._compile1(raw, base, None)

    def _compile1(self, raw: RawSchema, base: str | None, save) -> Schema:
        if raw.ref:
            try:
                return self._resolve(raw.ref, base)
            except (SchemaCompileError, URLError, ValueError) as e:
                _err(f"resolve {raw.ref!r}: {e}")
        if raw.id:
            try:
                parse_url(raw.id)
                base = resolve_url(base, raw.id)
            except URLError as e:
                _err(f"parse $id: {e}")

        s = Schema()
        types = 0
        for t in raw.types or ():
            types |= TYPE_BITS[t]
        s.types = types
        s.enum = raw.enum or []
        s.enum_keys = frozenset(to_json(v) for v in s.enum)
        s.min_properties = raw.min_properties
        s.max_properties = raw.max_properties
        s.unique_items = raw.unique_items
        s.min_items = raw.min_items
        s.max_items = raw.max_items
        s.exclusive_minimum = raw.exclusive_minimum
        s.exclusive_maximum = raw.exclusive_maximum
        s.min_length = raw.min_length
        s.max_length = raw.max_length
        if save is not None:
            save(s)  # register before children → cyclic refs terminate

        seen_required: set[str] = set()
        for field in raw.required:
            # Draft-4 §5.4.3: elements MUST be unique (compiler.go:106-114).
            if field in seen_required:
                _err(f'"required" list must be unique, duplicate {field!r}')
            seen_required.add(field)
        s.required = list(raw.required)

        for name, sub in raw.properties:
            try:
                s.properties[name] = self._compile(sub, base)
            except SchemaCompileError as e:
                _err(f"property {name!r}: {e}")

        for pattern, sub in raw.pattern_properties:
            try:
                rx = re.compile(pattern)
                item = self._compile(sub, base)
            except (re.error, SchemaCompileError) as e:
                _err(f"patternProperty {pattern!r}: {e}")
            s.pattern_properties.append((rx, pattern, item))

        if raw.items is not None:
            kind, val = raw.items
            try:
                if kind == "array":
                    s.items = ("array", self._compile_many(val, base))
                else:
                    s.items = ("object", self._compile(val, base))
            except SchemaCompileError as e:
                _err(f"items: {e}")

        if raw.additional_properties is not None:
            kind, val = raw.additional_properties
            if kind == "bool":
                s.additional_properties = ("bool", val)
            else:
                try:
                    s.additional_properties = ("schema", self._compile(val, base))
                except SchemaCompileError as e:
                    _err(f"additionalProperties: {e}")

        for field, sub in raw.dependent_schemas.items():
            try:
                s.dependent_schemas[field] = self._compile(sub, base)
            except SchemaCompileError as e:
                _err(f"dependent schema {field!r}: {e}")
        s.dependent_required = dict(raw.dependent_required)

        if raw.additional_items is not None:
            kind, val = raw.additional_items
            if kind == "bool":
                s.additional_items = ("bool", val)
            else:
                try:
                    s.additional_items = ("schema", self._compile(val, base))
                except SchemaCompileError as e:
                    _err(f"additionalItems: {e}")

        if raw.pattern is not None and raw.pattern != "":
            try:
                s.pattern = re.compile(raw.pattern)
            except re.error as e:
                _err(f"pattern: {e}")
            s.pattern_source = raw.pattern

        for name, subs, dest in (
            ("allOf", raw.all_of, s.all_of),
            ("anyOf", raw.any_of, s.any_of),
            ("oneOf", raw.one_of, s.one_of),
        ):
            try:
                dest.extend(self._compile_many(subs, base))
            except SchemaCompileError as e:
                _err(f"{name}: {e}")

        if raw.not_ is not None:
            try:
                s.not_ = self._compile(raw.not_, base)
            except SchemaCompileError as e:
                _err(f"not: {e}")

        for name, num in (
            ("minimum", raw.minimum),
            ("maximum", raw.maximum),
            ("multipleOf", raw.multiple_of),
        ):
            if num is None:
                continue
            try:
                val = Fraction(num.lexeme)
            except (ValueError, ZeroDivisionError) as e:
                _err(f"{name}: {e}")
            if name == "minimum":
                s.minimum = val
            elif name == "maximum":
                s.maximum = val
            else:
                s.multiple_of = val

        return s

    def _compile_many(self, raws, base) -> list[Schema]:
        out = []
        for i, sub in enumerate(raws):
            try:
                out.append(self._compile(sub, base))
            except SchemaCompileError as e:
                _err(f"[{i}]: {e}")
        return out

    # -- $ref resolution (resolve.go:56-112) -----------------------------

    def _resolve(self, ref: str, base: str | None) -> Schema:
        cached = self.refcache.get(ref)
        if cached is not None:
            return cached

        u = resolve_url(base, ref)
        loc = strip_fragment(u)

        if self.depth + 1 >= _MAX_RESOLVE_DEPTH:
            _err("resolve depth exceeded")
        self.depth += 1
        try:
            new_url, root = self._resolve_url(u, loc)
            if new_url is not None:
                loc = strip_fragment(new_url)
            try:
                raw = raw_schema_from_tree(root)
            except SchemaParseError as e:
                _err(f"unmarshal: {e}")

            def save(s: Schema) -> None:
                self.refcache[ref] = s

            return self._compile1(raw, loc, save)
        finally:
            self.depth -= 1

    def _resolve_url(self, u: str, loc: str):
        val, ok = self.doc.resolve_id(u)
        if ok:
            return u, val
        doc = self.remotes.get(loc)
        if doc is None:
            try:
                data = self.resolver.resolve(loc)
            except ResolveError as e:
                _err(f"remote {loc!r}: {e}")
            doc = collect_ids(None, parse_json(data))
            self.remotes[loc] = doc
        return doc.resolve(u)
