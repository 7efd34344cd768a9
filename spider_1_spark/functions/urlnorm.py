"""RFC 3986 URL canonicalization — SPEC-2 of SURVEY.md §0.4.

This module is the single shared implementation used by BOTH the
pure-Python reference oracle (reference_model/spider1_ref.py) and the
Spark engine (wrapped in a vectorized pandas UDF, engine/operators.py).
Sharing one implementation is what makes "exact match of the URL-seen
set vs reference" (BASELINE.json:2,14) a meaningful, testable property.

Pinned normalization steps (SPEC-2):
  1. lowercase scheme and host;
  2. remove default ports (:80 http, :443 https);
  3. resolve relative refs against the parent URL and remove
     dot-segments (RFC 3986 §5.2.4);
  4. percent-decode only *unreserved* chars (ALPHA / DIGIT / ``-._~``),
     uppercase the hex of any remaining %XX escape;
  5. sort query parameters by (key, value) byte order, preserving
     duplicates, re-join with '&'; drop a bare trailing '?';
  6. strip the fragment;
  7. empty path -> '/'.

Only http(s) URLs are canonical; every other scheme returns ``None``
(SPEC-7: "non-http(s) schemes dropped").
"""

from __future__ import annotations

import re
from urllib.parse import urljoin, urlsplit

_UNRESERVED = frozenset(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~"
)
_PCT_RE = re.compile(r"%([0-9a-fA-F]{2})")


def _norm_pct(s: str) -> str:
    """Percent-decode unreserved chars; uppercase remaining %XX hex."""

    def repl(m: re.Match) -> str:
        ch = chr(int(m.group(1), 16))
        if ch in _UNRESERVED:
            return ch
        return "%" + m.group(1).upper()

    return _PCT_RE.sub(repl, s)


def _remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4 remove_dot_segments."""
    out: list[str] = []
    inp = path
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


def _norm_query(query: str) -> str:
    """SPEC-2 step 5: sort params by (key, value) byte order, keep dups."""
    if not query:
        return ""
    pairs: list[tuple[str, str, bool]] = []
    for tok in query.split("&"):
        if not tok:
            continue
        if "=" in tok:
            k, v = tok.split("=", 1)
            pairs.append((_norm_pct(k), _norm_pct(v), True))
        else:
            pairs.append((_norm_pct(tok), "", False))
    pairs.sort(key=lambda p: (p[0], p[1]))
    return "&".join(k + "=" + v if has_eq else k for k, v, has_eq in pairs)


def canonicalize(url: str, base: str | None = None) -> str | None:
    """Return the canonical form of ``url`` (resolved against ``base`` if
    given), or ``None`` for non-http(s) / unparseable URLs.

    Idempotent: ``canonicalize(canonicalize(u)) == canonicalize(u)``
    (property-tested in tests/test_properties.py).
    """
    if url is None:
        return None
    url = url.strip()
    if base is not None:
        try:
            url = urljoin(base, url)
        except ValueError:
            return None
    try:
        parts = urlsplit(url)
    except ValueError:
        return None
    scheme = parts.scheme.lower()
    if scheme not in ("http", "https"):
        return None
    try:
        host = (parts.hostname or "").lower()
        port = parts.port
    except ValueError:
        return None
    if not host:
        return None
    if port is not None and not (
        (scheme == "http" and port == 80) or (scheme == "https" and port == 443)
    ):
        netloc = f"{host}:{port}"
    else:
        netloc = host
    path = _remove_dot_segments(_norm_pct(parts.path)) or "/"
    query = _norm_query(parts.query)
    out = f"{scheme}://{netloc}{path}"
    if query:
        out += "?" + query
    return out


def host_of(canonical_url: str) -> str:
    """Host (with non-default port) of an already-canonical URL."""
    return urlsplit(canonical_url).netloc
