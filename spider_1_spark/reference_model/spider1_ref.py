"""Pinned executable reference spec — the single-process oracle.

``/root/reference`` (logonmy/Spider-1) was EMPTY at survey time
(SURVEY.md §0.1), so per SURVEY §0.3 this file IS the reference: a
deterministic, single-process, pure-Python (stdlib + numpy) crawler
implementing SPEC-1..12 of SURVEY §0.4 verbatim. The Spark engine's
crawl ordering, URL-seen set, image rows, and counters are compared
against this oracle byte-for-byte in pytest (BASELINE.json:2,14,15).

If the real Spider-1 tree ever appears, reconcile THIS file against it
(one file); the engine depends only on the spec, never on the
reference implementation.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field

from spider_1_spark.functions import robots as robots_mod
from spider_1_spark.functions.codecs import DecodeError, decode
from spider_1_spark.functions.extract import extract_refs
from spider_1_spark.functions.phash import dhash64
from spider_1_spark.functions.urlnorm import canonicalize, host_of

COUNTER_NAMES = (
    "fetched",
    "deduped",
    "deferred",
    "dropped",
    "robots_blocked",
    "decode_failed",
)


@dataclass(frozen=True)
class Policy:
    """SPEC-1 politeness budget."""

    max_depth: int = 3
    per_host_wave_budget: int = 2  # B
    per_host_total_cap: int = 5  # C
    global_page_budget: int = 50  # G
    user_agent: str = "*"


@dataclass
class CrawlResult:
    # SPEC-3: [(seq, url, depth, parent_rank, link_pos, wave_id)]
    crawl_log: list[tuple[int, str, int, int, int, int]] = field(default_factory=list)
    # SPEC-4: canonical_url -> (first_wave, depth, parent_rank, link_pos)
    seen: dict[str, tuple[int, int, int, int]] = field(default_factory=dict)
    # SPEC-10: [(image_id, bytes, w, h, fmt, caption, phash)]
    images: list[tuple[str, bytes, int, int, str, str, int]] = field(
        default_factory=list
    )
    counters: dict[str, int] = field(
        default_factory=lambda: {k: 0 for k in COUNTER_NAMES}
    )
    # per-host total fetches (SPEC-5 cap C bookkeeping; used by resume tests)
    host_fetch_total: dict[str, int] = field(default_factory=dict)
    n_waves: int = 0

    @property
    def ordering(self) -> list[str]:
        return [row[1] for row in self.crawl_log]

    @property
    def seen_set(self) -> set[str]:
        return set(self.seen)


def image_id_of(canonical_image_url: str) -> str:
    """SPEC-10: sha256(canonical_image_url) hex, first 32 chars."""
    return hashlib.sha256(canonical_image_url.encode("utf-8")).hexdigest()[:32]


def crawl(seeds: list[str], policy: Policy, web) -> CrawlResult:
    """Run the pinned single-process crawl (SPEC-1..11).

    ``web`` provides ``html(url)``, ``image(url)``, ``robots(host)``
    (fixtures/webgen.py; injectable so property tests can use random
    graphs).
    """
    res = CrawlResult()
    # key = (depth, parent_rank, link_pos); url appended as tiebreak
    frontier: list[tuple[tuple[int, int, int], str]] = []

    # SPEC-1/4: seeds enter at depth 0 in seed-list order
    for idx, raw in enumerate(seeds):
        canon = canonicalize(raw)
        if canon is None:
            continue
        if canon in res.seen:
            res.counters["deduped"] += 1
            continue
        res.seen[canon] = (0, 0, idx, 0)
        frontier.append(((0, idx, 0), canon))

    robots_cache: dict[str, list[tuple[bool, str]]] = {}
    global_fetched = 0
    seq = 0
    wave = 0

    while frontier:
        candidates = sorted(frontier, key=lambda t: (t[0], t[1]))
        next_frontier: list[tuple[tuple[int, int, int], str]] = []
        wave_count: dict[str, int] = {}

        for key, url in candidates:
            depth, parent_rank, link_pos = key
            host = host_of(url)
            # SPEC-6: robots fetched once per host, no budget, no log entry
            if host not in robots_cache:
                robots_cache[host] = robots_mod.parse_robots(
                    web.robots(host), policy.user_agent
                )
            if not robots_mod.allowed(robots_cache[host], robots_mod.robots_path(url)):
                res.counters["robots_blocked"] += 1
                continue
            # SPEC-5 gate order: total cap C, then wave budget B, then G
            if res.host_fetch_total.get(host, 0) >= policy.per_host_total_cap:
                res.counters["dropped"] += 1
                continue
            if wave_count.get(host, 0) >= policy.per_host_wave_budget:
                res.counters["deferred"] += 1
                next_frontier.append((key, url))  # original key kept
                continue
            if global_fetched >= policy.global_page_budget:
                res.counters["dropped"] += 1
                continue

            # ---- fetch ----
            global_fetched += 1
            res.host_fetch_total[host] = res.host_fetch_total.get(host, 0) + 1
            wave_count[host] = wave_count.get(host, 0) + 1
            res.counters["fetched"] += 1
            res.crawl_log.append((seq, url, depth, parent_rank, link_pos, wave))
            html = web.html(url)
            if html is not None:
                for pos, kind, raw_url, caption in extract_refs(html):
                    canon = canonicalize(raw_url, base=url)
                    if canon is None:
                        continue  # non-http(s) dropped silently (SPEC-7)
                    if canon in res.seen:
                        res.counters["deduped"] += 1
                        continue
                    if kind == "a":
                        if depth + 1 > policy.max_depth:
                            continue  # beyond max_depth: never enqueued/seen
                        res.seen[canon] = (wave, depth + 1, seq, pos)
                        next_frontier.append(((depth + 1, seq, pos), canon))
                    else:  # img: seen but never parsed; yields one row
                        res.seen[canon] = (wave, depth + 1, seq, pos)
                        data = web.image(canon)
                        if data is None:
                            res.counters["decode_failed"] += 1
                            continue
                        try:
                            rgb, fmt = decode(data)
                        except DecodeError:
                            res.counters["decode_failed"] += 1
                            continue
                        h, w = rgb.shape[:2]
                        res.images.append(
                            (
                                image_id_of(canon),
                                data,
                                w,
                                h,
                                fmt,
                                caption,
                                dhash64(rgb),
                            )
                        )
            seq += 1

        res.n_waves = wave + 1
        wave += 1
        frontier = next_frontier
        if global_fetched >= policy.global_page_budget:
            break
    return res
