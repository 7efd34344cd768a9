"""HTML link/image extraction — SPEC-7, shared by oracle and engine.

No bs4/lxml in the sandbox (SURVEY §0.5 [ENV]); the synthetic web
(fixtures/webgen.py) emits a regular subset of HTML, and this regex
extractor is pinned as the extraction semantics for both sides:
``<a href>`` and ``<img src alt>`` tags in document order; the 0-based
position in that interleaved order is the SPEC-3 ``link_pos``.
"""

from __future__ import annotations

import re

# document-order scan of both tag kinds in one pass
_TAG_RE = re.compile(
    r"""<a\s+[^>]*href\s*=\s*"([^"]*)"[^>]*>"""
    r"""|<img\s+[^>]*src\s*=\s*"([^"]*)"[^>]*>""",
    re.IGNORECASE | re.DOTALL,
)
_ALT_RE = re.compile(r"""\balt\s*=\s*"([^"]*)\"""", re.IGNORECASE)


def extract_refs(html: bytes | str) -> list[tuple[int, str, str, str]]:
    """Return ``[(link_pos, kind, raw_url, caption)]`` in document order.

    kind is ``'a'`` or ``'img'``; caption is the img ``alt`` attribute
    verbatim ('' if absent; always '' for anchors) — SPEC-7 pins caption
    equality as the per-row invariant (BASELINE.json:15).
    """
    if html is None:
        return []
    if isinstance(html, (bytes, bytearray)):
        html = html.decode("utf-8", errors="replace")
    out: list[tuple[int, str, str, str]] = []
    pos = 0
    for m in _TAG_RE.finditer(html):
        if m.group(1) is not None:
            out.append((pos, "a", m.group(1), ""))
        else:
            alt = _ALT_RE.search(m.group(0))
            out.append((pos, "img", m.group(2), alt.group(1) if alt else ""))
        pos += 1
    return out
