"""Schema documents and embedded-``id`` collection.

Mirrors the reference's ``document`` / ``collectIDs`` (document.go:10-136):
a document is a schema tree plus a map of embedded ``id`` URIs → sub-trees,
built by recursively scanning only the schema-bearing keywords
(document.go:114-129): ``definitions properties patternProperties
dependencies`` (object-of-schemas), ``additionalItems additionalProperties
not`` (single schema), ``allOf anyOf oneOf`` (array-of-schemas) and ``items``
(either).  Notably ``enum`` is *not* scanned — an object inside an enum with
an ``id`` member must not register as an identifier
(custom suite ``id.json``).
"""

from __future__ import annotations

from .jsontypes import json_token_type
from .pointer import find
from .urls import parse_url, resolve_url

__all__ = ["Document", "collect_ids"]

_OBJ_KEYWORDS = ("definitions", "properties", "patternProperties", "dependencies")
_ONE_KEYWORDS = ("additionalItems", "additionalProperties", "not")
_ARR_KEYWORDS = ("allOf", "anyOf", "oneOf")


class Document:
    __slots__ = ("id", "data", "ids")

    def __init__(self, doc_id: str | None, data, ids: dict) -> None:
        self.id = doc_id
        self.data = data
        self.ids = ids

    def resolve_id(self, u: str):
        ref = resolve_url(self.id, u) if self.id is not None else u
        if ref in self.ids:
            return self.ids[ref], True
        return None, False

    def resolve(self, u: str):
        """Returns (retargeted_url_or_None, subtree)."""
        val, ok = self.resolve_id(u)
        if ok:
            return u, val
        return find(u, self.data)


def _find_id(tree, base: str | None) -> str | None:
    if not isinstance(tree, dict):
        return None
    doc_id = None
    for key, val in tree.items():
        if key != "id":
            continue
        if not isinstance(val, str):
            raise ValueError(f"find ID: id must be a string, got {json_token_type(val)}")
        parse_url(val)
        doc_id = resolve_url(base, val) if base is not None else val
    return doc_id


def collect_ids(base: str | None, tree) -> Document:
    root = Document(_find_id(tree, base), tree, {})
    if root.id is not None:
        root.ids[root.id] = root.data

    def do(sub) -> None:
        if not isinstance(sub, dict):
            return
        b = root.id if root.id is not None else base
        child = collect_ids(b, sub)
        if child.id is not None:
            root.ids[child.id] = child.data
        root.ids.update(child.ids)

    for key, val in (tree.items() if isinstance(tree, dict) else ()):
        if key in _OBJ_KEYWORDS:
            if isinstance(val, dict):
                for sub in val.values():
                    do(sub)
        elif key in _ONE_KEYWORDS:
            do(val)
        elif key in _ARR_KEYWORDS:
            if isinstance(val, list):
                for sub in val:
                    do(sub)
        elif key == "items":
            if isinstance(val, list):
                for sub in val:
                    do(sub)
            elif isinstance(val, dict):
                do(val)
    return root
