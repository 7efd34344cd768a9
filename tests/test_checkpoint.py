"""SURVEY §5.3 — resumability (SPEC-12, BASELINE.json:6,14).

Invariant: ``run(seeds)`` ≡ ``run k waves; resume`` for every wave
boundary k, over ALL artifacts (crawl log, seen, images, counters).
Also: crash residue between "tables written" and "manifest renamed"
must be rolled back by ``cleanup()`` on resume.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile

import pytest

from spider_1_spark.engine import Policy, SparkCrawler
from spider_1_spark.fixtures.webgen import SyntheticWeb, make_seeds
from spider_1_spark.reference_model import spider1_ref as ref

N_HOSTS, N_SEEDS = 8, 4
POLICY = Policy(2, 2, 5, 24)


def collect(art):
    return (
        sorted(
            (r.seq, r.url, r.depth, r.parent_rank, r.link_pos, r.wave_id)
            for r in art.crawl_log.collect()
        ),
        {
            r.url: (r.first_wave, r.depth, r.parent_rank, r.link_pos)
            for r in art.seen.collect()
        },
        sorted(
            (r.image_id, bytes(r.bytes), r.w, r.h, r.fmt, r.caption, r.phash)
            for r in art.images.collect()
        ),
        art.counters,
        art.n_waves,
    )


@pytest.fixture(scope="module")
def oracle():
    return ref.crawl(
        make_seeds(N_SEEDS, N_HOSTS), POLICY, SyntheticWeb(N_HOSTS)
    )


def test_resume_from_every_wave_boundary(spark, oracle):
    web = SyntheticWeb(N_HOSTS)
    seeds = make_seeds(N_SEEDS, N_HOSTS)
    n_waves = oracle.n_waves
    assert n_waves >= 2, "config must produce a multi-wave crawl"
    for k in (1, n_waves - 1):
        root = tempfile.mkdtemp(prefix=f"spider1_resume{k}_")
        try:
            c1 = SparkCrawler(spark, POLICY, web, root)
            c1.run(seeds, max_waves=k)  # stop mid-crawl
            # fresh crawler object (fresh process semantics) resumes
            c2 = SparkCrawler(spark, POLICY, web, root)
            art = c2.resume()
            log, seen, images, counters, waves = collect(art)
            assert log == [tuple(t) for t in oracle.crawl_log], f"k={k}"
            assert seen == oracle.seen, f"k={k}"
            assert images == sorted(oracle.images), f"k={k}"
            assert counters == oracle.counters, f"k={k}"
            assert waves == n_waves, f"k={k}"
        finally:
            shutil.rmtree(root, ignore_errors=True)


def test_crash_residue_rolled_back(spark, oracle):
    """Simulate a crash AFTER state tables were written but BEFORE the
    manifest rename: stale v=/w= dirs must be pruned and the re-run
    wave must produce identical artifacts."""
    web = SyntheticWeb(N_HOSTS)
    seeds = make_seeds(N_SEEDS, N_HOSTS)
    root = tempfile.mkdtemp(prefix="spider1_crash_")
    try:
        c1 = SparkCrawler(spark, POLICY, web, root)
        c1.run(seeds, max_waves=1)
        manifest = c1.store.read_manifest()
        assert manifest["wave_id"] == 0

        # fabricate uncommitted wave-1 output (what a crash leaves)
        for name, vdir in (
            ("frontier", "v=2"),
            ("seen", "v=2"),
            ("hosts", "v=2"),
            ("images", "w=1"),
            ("crawl_log", "w=1"),
            ("metrics", "w=1"),
        ):
            d = os.path.join(root, name, vdir)
            os.makedirs(d, exist_ok=True)
            with open(os.path.join(d, "garbage.parquet"), "wb") as f:
                f.write(b"not a parquet file")

        art = SparkCrawler(spark, POLICY, web, root).resume()
        log, seen, images, counters, waves = collect(art)
        assert log == [tuple(t) for t in oracle.crawl_log]
        assert seen == oracle.seen
        assert images == sorted(oracle.images)
        assert counters == oracle.counters
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_manifest_commit_is_atomic_rename(spark):
    """The manifest file is always complete JSON (tmp+os.replace)."""
    root = tempfile.mkdtemp(prefix="spider1_manifest_")
    try:
        from spider_1_spark.engine.state import ParquetSnapshotStore

        st = ParquetSnapshotStore(spark, root)
        st.commit({"wave_id": 3, "versions": {}, "counters": {}})
        with open(st.manifest_path) as f:
            assert json.load(f)["wave_id"] == 3
        assert not [
            p for p in os.listdir(root) if p.endswith(".manifest.tmp")
        ], "no tmp residue after commit"
    finally:
        shutil.rmtree(root, ignore_errors=True)
