"""Remote-reference resolvers (the reference's only plugin surface).

Mirrors ``RemoteResolver`` / ``Remote`` / ``NoRemote`` (resolver.go:14-95):
``http``/``https`` via GET with optional basic auth from the URL userinfo;
``file`` / scheme-less paths read from disk (absolute paths rejected unless
``allow_relative``); anything else errors.  The default resolver used by
:func:`jsonschema_ray.core.compiler.parse` is :class:`Remote`, matching
``newCompiler`` (compiler.go:26-28) — the conformance tests only ever hit
``localhost:1234``.
"""

from __future__ import annotations

from urllib.parse import urlsplit

__all__ = ["ResolveError", "NoRemote", "Remote", "builtin_remote_cache"]


class ResolveError(Exception):
    pass


def builtin_remote_cache() -> dict[str, bytes]:
    """Offline cache of well-known public schema documents.

    The draft-04 meta-schema (json-schema.org) is vendored as package data so
    schemas that ``$ref`` it compile hermetically — the sandbox has no
    network, and at 100 TB scale every validator actor resolving it over HTTP
    would be wrong anyway.
    """
    import os

    here = os.path.dirname(__file__)
    with open(os.path.join(here, "draft4_metaschema.json"), "rb") as f:
        meta = f.read()
    return {
        "http://json-schema.org/draft-04/schema": meta,
        "https://json-schema.org/draft-04/schema": meta,
    }


def _fs_valid_path(p: str) -> bool:
    """Mirror of Go ``io/fs.ValidPath`` (reference resolver.go:87): a valid
    path is unrooted and slash-separated with no empty, "." or ".."
    elements; "." alone names the root.  The reference REJECTS any other
    shape when ``AllowRelative`` is false — including rooted paths and
    ``..`` traversals the previous ``startswith("/")`` check let through."""
    if p == ".":
        return True
    if not p or p.startswith("/") or p.endswith("/"):
        return False
    return all(el not in ("", ".", "..") for el in p.split("/"))


class NoRemote:
    def resolve(self, loc: str) -> bytes:
        raise ResolveError("remote references are not allowed")


class Remote:
    def __init__(self, allow_relative: bool = False, timeout: float = 10.0) -> None:
        self.allow_relative = allow_relative
        self.timeout = timeout
        self.cache = builtin_remote_cache()

    def resolve(self, loc: str) -> bytes:
        import urllib.error
        import urllib.request

        cached = self.cache.get(loc)
        if cached is not None:
            return cached

        parts = urlsplit(loc)
        scheme = parts.scheme
        if scheme in ("http", "https"):
            req = urllib.request.Request(loc, method="GET")
            if parts.username is not None and parts.password is not None:
                import base64

                cred = f"{parts.username}:{parts.password}".encode()
                req.add_header(
                    "Authorization", "Basic " + base64.b64encode(cred).decode()
                )
            try:
                with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                    # urllib already raises HTTPError for non-2xx, so this
                    # only guards exotic handlers; >= 300 keeps 299 (a
                    # legal 2xx) accepted
                    if resp.status >= 300:
                        raise ResolveError(f"bad HTTP code {resp.status}")
                    return resp.read()
            except urllib.error.URLError as e:
                raise ResolveError(f"do: {e}") from None
        if scheme in ("file", ""):
            path = parts.path
            if not self.allow_relative and not _fs_valid_path(path):
                raise ResolveError("relative paths are not allowed")
            try:
                with open(path, "rb") as f:
                    return f.read()
            except OSError as e:
                raise ResolveError(str(e)) from None
        raise ResolveError(f"unknown scheme {scheme!r}")
