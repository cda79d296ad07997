"""RFC 6901 JSON-Pointer walk with in-flight ``id`` base-URI retargeting.

Mirrors the reference's ``find`` / ``findKey`` / ``findIdx`` / ``unescape``
(jsonpointer.go:26-180) over parsed trees instead of raw bytes:

* the pointer is the (percent-decoded) URL fragment; empty → whole document;
* a non-``/``-prefixed pointer is an error;
* each ``/``-separated segment is unescaped with ``~1`` → ``/`` before
  ``~0`` → ``~`` in a single left-to-right pass (jsonpointer.go:167-180);
* while scanning an object for a key, an ``id`` string member retargets the
  base URL for the remaining walk (jsonpointer.go:113-165);
* array segments must be base-10 unsigned indices (jsonpointer.go:77-105).
"""

from __future__ import annotations

from .jsontypes import json_token_type
from .urls import fragment_of, resolve_url

__all__ = ["PointerError", "find"]


class PointerError(ValueError):
    pass


def _unescape(part: str) -> str:
    if "~1" not in part and "~0" not in part:
        return part
    out = []
    i = 0
    while i < len(part):
        if part.startswith("~1", i):
            out.append("/")
            i += 2
        elif part.startswith("~0", i):
            out.append("~")
            i += 2
        else:
            out.append(part[i])
            i += 1
    return "".join(out)


def _find_idx(arr: list, part: str):
    # ASCII digits only, like the reference's strconv.ParseUint: Python's
    # str.isdigit() also accepts Unicode digits ('٣', '²'), which would
    # silently resolve (or crash int()) where Go reports invalid syntax
    if not part or not all("0" <= c <= "9" for c in part):
        raise PointerError(f'find index "{part}": index: invalid syntax')
    idx = int(part)
    if idx < len(arr):
        return arr[idx], True
    return None, False


def _find_key(base: str | None, obj: dict, part: str):
    """Returns (new_base, value, found) scanning keys in document order."""
    result = None
    found = False
    new_base = None
    for key, val in obj.items():
        if found and new_base is not None:
            break
        if key == part:
            result = val
            found = True
        elif key == "id" and isinstance(val, str):
            new_base = resolve_url(base, val)
    if new_base is None:
        new_base = base
    return new_base, result, found


def find(u: str, tree, base: str | None = None):
    """Walk the fragment pointer of ``u`` over ``tree``.

    Returns ``(retargeted_url, subtree)`` where the URL reflects any ``id``
    members seen along the walk (used for nested base-URI changes).
    """
    ptr = fragment_of(u)
    if ptr == "":
        return u, tree
    if not ptr.startswith("/"):
        raise PointerError(f"invalid pointer {ptr!r}: pointer must start with '/'")
    cur = tree
    cur_url = u
    for part in ptr[1:].split("/"):
        part = _unescape(part)
        tt = json_token_type(cur)
        if tt == "object":
            new_base, result, ok = _find_key(cur_url, cur, part)
            cur_url = new_base if new_base is not None else cur_url
        elif tt == "array":
            result, ok = _find_idx(cur, part)
        else:
            raise PointerError(f"unexpected type {tt!r}")
        if not ok:
            raise PointerError(f"pointer {ptr[1:]!r} not found")
        cur = result
    return cur_url, cur
