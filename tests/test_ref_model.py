"""Tests for the pinned executable reference spec (SURVEY §0.3/§0.4).

These pin the oracle's behavior; tests/test_oracle_equivalence.py then
holds the Spark engine to exactly these artifacts.
"""

import numpy as np

from spider_1_spark.fixtures.webgen import SyntheticWeb, make_seeds
from spider_1_spark.functions.codecs import decode, psnr
from spider_1_spark.functions.urlnorm import canonicalize, host_of
from spider_1_spark.reference_model.spider1_ref import (
    Policy,
    crawl,
    image_id_of,
)

WEB = SyntheticWeb(n_hosts=8)
POLICY = Policy(max_depth=3, per_host_wave_budget=2,
                per_host_total_cap=5, global_page_budget=50)


def run(seeds=None, policy=POLICY, web=WEB):
    return crawl(seeds or make_seeds(4, 8), policy, web)


class TestDeterminism:
    def test_identical_runs(self):
        a, b = run(), run()
        assert a.crawl_log == b.crawl_log
        assert a.seen == b.seen
        assert a.images == b.images
        assert a.counters == b.counters


class TestOrderingInvariants:
    def test_seq_dense_and_monotone(self):
        r = run()
        assert [row[0] for row in r.crawl_log] == list(range(len(r.crawl_log)))
        # within a wave, fetched URLs are in SPEC-3 key order
        by_wave = {}
        for seq, url, depth, pr, lp, wave in r.crawl_log:
            by_wave.setdefault(wave, []).append((depth, pr, lp, url))
        for wave, keys in by_wave.items():
            assert keys == sorted(keys), f"wave {wave} out of key order"

    def test_seeds_fetched_first(self):
        r = run()
        seeds = [canonicalize(s) for s in make_seeds(4, 8)]
        uniq = list(dict.fromkeys(seeds))
        # wave-0 fetches start with the seed list (subject to politeness)
        assert r.ordering[: len(uniq)] == uniq

    def test_all_fetched_urls_canonical(self):
        r = run()
        for url in r.ordering:
            assert canonicalize(url) == url


class TestBudgets:
    def test_per_host_wave_budget(self):
        r = run()
        per = {}
        for seq, url, depth, pr, lp, wave in r.crawl_log:
            key = (wave, host_of(url))
            per[key] = per.get(key, 0) + 1
        assert max(per.values()) <= POLICY.per_host_wave_budget

    def test_per_host_total_cap(self):
        r = run()
        assert max(r.host_fetch_total.values()) <= POLICY.per_host_total_cap

    def test_global_budget(self):
        r = run(policy=Policy(max_depth=6, per_host_wave_budget=4,
                              per_host_total_cap=100, global_page_budget=10))
        assert r.counters["fetched"] <= 10

    def test_deferral_happens_and_keeps_keys(self):
        # tight wave budget => deferrals; deferred rows keep original key
        r = run(policy=Policy(max_depth=3, per_host_wave_budget=1,
                              per_host_total_cap=50, global_page_budget=200))
        assert r.counters["deferred"] > 0
        # a deferred URL fetched in a later wave has key depth < wave id
        late = [row for row in r.crawl_log if row[2] < row[5]]
        assert late, "expected at least one deferred fetch in a later wave"


class TestSeenSet:
    def test_seen_superset_of_fetched(self):
        r = run()
        assert set(r.ordering) <= r.seen_set

    def test_dedup_counted(self):
        r = run()
        assert r.counters["deduped"] > 0  # synthetic web has shared links

    def test_robots_blocked_never_fetched(self):
        # host h3 (k%5==3) disallows /p/3; h2/h7? k%7==2 -> only /p/ allowed
        r = run()
        assert "http://h3.example.test/p/3" not in set(r.ordering)
        assert r.counters["robots_blocked"] >= 0


class TestImages:
    def test_rows_well_formed(self):
        r = run()
        assert len(r.images) > 0
        ids = set()
        for image_id, data, w, h, fmt, caption, phash in r.images:
            ids.add(image_id)
            assert len(image_id) == 32
            rgb, sniffed = decode(data)
            assert sniffed == fmt
            assert (rgb.shape[1], rgb.shape[0]) == (w, h)
            assert caption.startswith("cap ")
            assert -(1 << 63) <= phash < (1 << 63)
        assert len(ids) == len(r.images)  # one row per unique image URL

    def test_per_row_invariant_vs_source(self):
        """BASELINE.json:15 — decoded-pixel allclose / PSNR>=40dB."""
        r = run()
        checked = 0
        # rebuild canonical url -> row map via image_id
        for image_id, data, w, h, fmt, caption, phash in r.images:
            # find the url by brute force over seen (test-scale only)
            for url in r.seen_set:
                if "/img/" in url and image_id_of(url) == image_id:
                    src = WEB.source_pixels(url)
                    got, _ = decode(data)
                    if fmt in ("ppm", "png"):
                        assert np.array_equal(got, src)
                    else:
                        assert psnr(src, got) >= 40.0
                    checked += 1
                    break
        assert checked == len(r.images)

    def test_decode_failures_counted(self):
        # webgen corrupts m%17==13 payloads; with 50 image ids it appears
        r = run(policy=Policy(max_depth=4, per_host_wave_budget=4,
                              per_host_total_cap=50, global_page_budget=300))
        assert r.counters["decode_failed"] > 0


class TestCounters:
    def test_counter_identity(self):
        r = run()
        assert r.counters["fetched"] == len(r.crawl_log)
        assert r.counters["fetched"] == sum(r.host_fetch_total.values())
