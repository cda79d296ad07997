"""Minimal Go-``net/url``-compatible URI handling for ``id`` / ``$ref``.

The reference resolves refs with ``url.Parse`` / ``URL.ResolveReference``
(resolve.go:49-54, document.go:16-23).  We wrap :mod:`urllib.parse` but add
the strictness the compile-error tests rely on: ``url.Parse(":")`` fails in Go
with "missing protocol scheme" (jsonschema_test.go:169-174), while urllib
accepts it silently.
"""

from __future__ import annotations

from urllib.parse import unquote, urldefrag, urljoin, urlsplit, uses_relative

__all__ = ["URLError", "parse_url", "resolve_url", "strip_fragment", "fragment_of"]


class URLError(ValueError):
    pass


def _check(ref: str) -> None:
    for ch in ref:
        o = ord(ch)
        if o < 0x20 or o == 0x7F:
            raise URLError(f"net/url: invalid control character in URL")
    # Scheme validation: text before the first ':' that precedes any
    # '/', '?' or '#' must be a non-empty ALPHA *( ALPHA / DIGIT / "+" / "-" / "." ).
    for i, ch in enumerate(ref):
        if ch in "/?#":
            break
        if ch == ":":
            scheme = ref[:i]
            if not scheme:
                raise URLError(f"parse {ref!r}: missing protocol scheme")
            if not scheme[0].isalpha() or not all(
                c.isalnum() or c in "+-." for c in scheme
            ):
                # Go treats e.g. "1http://x" as an opaque path, not an error;
                # only an *empty* scheme is fatal.  Keep parity: no error.
                pass
            break


def parse_url(ref: str) -> str:
    """Validate ``ref`` like Go ``url.Parse`` and return it normalized."""
    _check(ref)
    return ref


def _remove_dot_segments(p: str) -> str:
    """RFC 3986 §5.2.4, literally (Go applies it in ResolveReference).
    Empty segments ('x//y') are PRESERVED — they are distinct URLs."""
    out: list[str] = []
    inp = p
    while inp:
        if inp.startswith("../"):
            inp = inp[3:]
        elif inp.startswith("./"):
            inp = inp[2:]
        elif inp.startswith("/./"):
            inp = "/" + inp[3:]
        elif inp == "/.":
            inp = "/"
        elif inp.startswith("/../"):
            inp = "/" + inp[4:]
            if out:
                out.pop()
        elif inp == "/..":
            inp = "/"
            if out:
                out.pop()
        elif inp in (".", ".."):
            inp = ""
        else:
            i = inp.find("/", 1)
            if i == -1:
                out.append(inp)
                inp = ""
            else:
                out.append(inp[:i])
                inp = inp[i:]
    return "".join(out)


def resolve_url(base: str | None, ref: str) -> str:
    """``base.Parse(ref)`` / ``ResolveReference`` semantics (RFC 3986)."""
    _check(ref)
    if not base:
        return ref
    b = urlsplit(base)
    if not b.scheme or b.scheme in uses_relative:
        return urljoin(base, ref)
    # urllib's urljoin refuses relative resolution for schemes outside
    # its uses_relative allowlist (tag:, urn:, custom) and silently
    # returns the bare ref — Go's URL.ResolveReference is scheme-
    # agnostic RFC 3986, so merge manually for those schemes
    r = urlsplit(ref)
    if r.scheme:
        return ref
    base_nf, _ = urldefrag(base)
    if not ref:
        return base_nf
    if ref.startswith("#"):
        return base_nf + ref
    bb = urlsplit(base_nf)
    frag = f"#{r.fragment}" if r.fragment else ""
    query = f"?{r.query}" if r.query else ""
    if r.netloc:
        # network-path reference (//host/path): the REF's authority wins
        # (RFC 5.3 / Go ResolveReference), never the base's
        return f"{b.scheme}://{r.netloc}{_remove_dot_segments(r.path)}{query}{frag}"
    if not bb.netloc and bb.path and not bb.path.startswith("/"):
        # OPAQUE base (scheme:non-slash — Go sets URL.Opaque): Go's
        # ResolveReference contributes NOTHING of the opaque part to a
        # relative path ref; resolvePath("", ref) roots it with a
        # leading slash ("tag:opaque" + "x" → "tag:/x")
        path = _remove_dot_segments("/" + r.path) if r.path else ""
        return f"{b.scheme}:{path}{query}{frag}"
    netloc = f"//{bb.netloc}" if bb.netloc else ""
    if not r.path:
        return f"{b.scheme}:{netloc}{bb.path}{query or ('?' + bb.query if bb.query else '')}{frag}"
    if r.path.startswith("/"):
        path = _remove_dot_segments(r.path)
    else:
        head = bb.path.rpartition("/")[0]
        merged = f"{head}/{r.path}" if "/" in bb.path else r.path
        path = _remove_dot_segments(merged)
    return f"{b.scheme}:{netloc}{path}{query}{frag}"


def strip_fragment(u: str) -> str:
    return urldefrag(u)[0]


def fragment_of(u: str) -> str:
    """Percent-decoded fragment, like Go ``URL.Fragment``."""
    return unquote(urlsplit(u).fragment)
