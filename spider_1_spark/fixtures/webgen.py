"""Deterministic synthetic web — SPEC-1 ``page(url)`` (FIXTURES.md §A).

The web is a pure function of the canonical URL; the reference oracle
(reference_model/spider1_ref.py) and the Spark engine's ``page_store``
(engine/operators.py fetch stage) share THIS implementation, so both
crawl exactly the same graph with no network (SURVEY §0.5 [ENV]).

Layout:
  * hosts ``h0.example.test .. h{H-1}.example.test``; h0 is the hot
    host (receives an outsized share of cross-host links -> exercises
    salting, SURVEY op A5);
  * pages ``/p/{i}``; images ``/img/{m}.{fmt}`` with
    fmt in {ppm, png, qlossy};
  * per-page rng: ``numpy PCG64(seed = 42 ^ url_hash64(url))`` where
    url_hash64 = first 8 bytes of sha256 (stdlib, stable everywhere);
  * anchors use a deterministic mix of raw href styles (relative,
    dot-segments, uppercase host, default port, unsorted query) to
    exercise SPEC-2 canonicalization;
  * roughly 1 in 17 image payloads is deliberately truncated to
    exercise the ``decode_failed`` counter (SPEC-8/11).

The class is tiny and picklable: safe to ship into Spark executors.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np

from spider_1_spark.functions import codecs

SEED = 42

_WORDS = (
    "amber basil cedar delta ember fjord gamma haze iris jade koala lumen "
    "maple nectar onyx prism quartz raven sable topaz umber vapor willow "
    "xenon yarrow zephyr anchor breeze cobalt dune echo flint grove heron "
    "ivory jetty kelp lagoon mesa nimbus oasis pearl quill reef summit "
    "tundra upland vortex wharf yucca zenith arbor bluff crest drift "
    "eyrie fable glade hollow inlet knoll ledge marsh notch"
).split()
assert len(_WORDS) == 64

_PAGE_RE = re.compile(r"^http://(h\d+)\.example\.test/p/(\d+)(?:\?.*)?$")
_IMG_RE = re.compile(r"^http://(h\d+)\.example\.test/img/(\d+)\.(ppm|png|qlossy)$")


def url_hash64(url: str) -> int:
    """First 8 bytes of sha256(url), big-endian unsigned."""
    return int.from_bytes(hashlib.sha256(url.encode("utf-8")).digest()[:8], "big")


def _rng(url: str) -> np.random.Generator:
    return np.random.Generator(np.random.PCG64(SEED ^ url_hash64(url)))


class SyntheticWeb:
    """Deterministic page/image/robots store over H hosts.

    ``payload="none"`` emits pages WITHOUT <img> items (identical rng
    draws, so the anchor graph is unchanged): the scaling-evidence
    bench uses it to hold 10^8-row frontiers in this box's RAM/disk —
    schedule + rank + gate + dedup + fetch/extract stay the full
    pipeline, only the image bytes (the memory hog) are absent
    (BENCH/BASELINE.md §3g, VERDICT r2 "Next round" item 1).
    """

    def __init__(self, n_hosts: int = 8, payload: str = "image"):
        self.n_hosts = n_hosts
        self.payload = payload

    # ------------------------------------------------------------ html
    def html(self, canonical_url: str) -> bytes | None:
        m = _PAGE_RE.match(canonical_url)
        if not m:
            return None
        host, i = m.group(1), int(m.group(2))
        k = int(host[1:])
        if k >= self.n_hosts:
            return None
        rng = _rng(canonical_url)
        n_links = int(rng.integers(0, 6))
        n_imgs = int(rng.integers(0, 4))

        items: list[str] = []
        for _ in range(n_links):
            j = int(rng.integers(0, i + 4))
            cross = rng.random() < 0.20
            if cross:
                tk = 0 if rng.random() < 0.5 else (k + 1) % self.n_hosts
                thost = f"h{tk}.example.test"
            else:
                thost = f"{host}.example.test"
            style = int(rng.integers(0, 5))
            if not cross and style == 0:
                href = f"/p/{j}"
            elif not cross and style == 1:
                href = f"../p/./{j}"  # dot segments, relative
            elif style == 2:
                href = f"http://{thost.upper()}/p/{j}"  # uppercase host
            elif style == 3:
                href = f"http://{thost}:80/p/{j}"  # default port
            else:
                href = f"http://{thost}/p/{j}?b=2&a=1&a=0"  # unsorted query
            items.append(f'<a href="{href}">l{j}</a>')

        for _ in range(n_imgs):
            # rng draws happen in BOTH payload modes (anchor graph stays
            # identical); only the emitted <img> item is payload-gated
            mm = int(rng.integers(0, 50))
            fmt = ("ppm", "png", "qlossy")[int(rng.integers(0, 3))]
            w1, w2 = (_WORDS[int(rng.integers(0, 64))] for _ in range(2))
            cap = f"cap {host} {mm} {w1} {w2}"
            if getattr(self, "payload", "image") == "image":
                items.append(f'<img src="/img/{mm}.{fmt}" alt="{cap}">')

        order = rng.permutation(len(items))
        body = "".join(items[int(o)] for o in order)
        return f"<html><body>{body}</body></html>".encode("utf-8")

    # ----------------------------------------------------------- image
    def image(self, canonical_url: str) -> bytes | None:
        m = _IMG_RE.match(canonical_url)
        if not m:
            return None
        mm, fmt = int(m.group(2)), m.group(3)
        rng = _rng(canonical_url)
        w = int(rng.choice([16, 24, 32, 48, 64]))
        h = int(rng.choice([16, 24, 32, 48, 64]))
        px = rng.integers(0, 256, (h + 2, w + 2, 3)).astype(np.float64)
        # 3x3 box smoothing (valid region) -> natural-ish gradients
        sm = sum(
            px[dy : dy + h, dx : dx + w, :] for dy in range(3) for dx in range(3)
        ) / 9.0
        rgb = sm.astype(np.uint8)
        data = codecs.encode(rgb, fmt)
        if mm % 17 == 13:  # deterministic corruption -> decode_failed
            return data[: max(4, len(data) // 2)]
        return data

    def source_pixels(self, canonical_url: str) -> np.ndarray | None:
        """Pre-encode pixels (for PSNR/allclose checks in tests)."""
        m = _IMG_RE.match(canonical_url)
        if not m:
            return None
        rng = _rng(canonical_url)
        w = int(rng.choice([16, 24, 32, 48, 64]))
        h = int(rng.choice([16, 24, 32, 48, 64]))
        px = rng.integers(0, 256, (h + 2, w + 2, 3)).astype(np.float64)
        sm = sum(
            px[dy : dy + h, dx : dx + w, :] for dy in range(3) for dx in range(3)
        ) / 9.0
        return sm.astype(np.uint8)

    # ---------------------------------------------------------- robots
    def robots(self, host: str) -> str:
        m = re.match(r"^h(\d+)\.example\.test$", host)
        if not m:
            return ""
        k = int(m.group(1))
        if k % 5 == 3:
            return "User-agent: *\nDisallow: /p/3\n"
        if k % 7 == 2:
            return "User-agent: *\nAllow: /p/\nDisallow: /\n"
        return "User-agent: *\nDisallow:\n"


def make_seeds(n_seeds: int = 4, n_hosts: int = 8) -> list[str]:
    """FIXTURES §A1 seed list: mixed-case + unsorted query on purpose."""
    return [
        f"HTTP://H{k % n_hosts}.Example.Test:80/p/0?b=1&a=2"
        for k in range(n_seeds)
    ]
