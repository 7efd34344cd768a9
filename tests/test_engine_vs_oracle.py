"""SURVEY §5.1 — exact equality of the Spark engine vs the pinned
single-process oracle (BASELINE.json:2,14,15).

Artifacts compared bit-for-bit per configuration:
  * crawl ordering: the full (seq, url, depth, parent_rank, link_pos,
    wave_id) log [SPEC-3];
  * final URL-seen set WITH discovery metadata [SPEC-4];
  * images row set: image_id, raw bytes, w, h, fmt, caption, phash
    [SPEC-8..10] — phash/bytes equality subsumes decoded-pixel
    equality because both sides share the decoders;
  * counter totals, and the engine's per-partition metrics rows must
    SUM to the oracle's totals [SPEC-11].

Configs chosen (tests/../scripts probe) to exercise every gate:
``tight_g`` hits mid-wave G exhaustion; ``robots`` hits robots_blocked,
deferral, per-host caps and decode failures.
"""

from __future__ import annotations

import shutil
import tempfile

import pytest

from spider_1_spark.engine import Policy, SparkCrawler
from spider_1_spark.fixtures.webgen import SyntheticWeb, make_seeds
from spider_1_spark.reference_model import spider1_ref as ref

CONFIGS = {
    # name: (n_hosts, n_seeds, policy)
    "tight_g": (8, 6, Policy(3, 2, 8, 11)),
    "robots": (12, 8, Policy(2, 1, 4, 30)),
}


def run_both(spark, name, **crawler_kwargs):
    n_hosts, n_seeds, policy = CONFIGS[name]
    web = SyntheticWeb(n_hosts)
    seeds = make_seeds(n_seeds, n_hosts)
    oracle = ref.crawl(seeds, policy, web)
    root = tempfile.mkdtemp(prefix=f"spider1_{name}_")
    try:
        art = SparkCrawler(spark, policy, web, root, **crawler_kwargs).run(seeds)
        yield_art = (
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
            art.metrics.collect(),
            art.n_waves,
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return oracle, yield_art


def check_equal(oracle, art):
    log, seen, images, counters, metrics, n_waves = art
    # SPEC-3 crawl ordering, exact
    assert log == [tuple(t) for t in oracle.crawl_log]
    # SPEC-4 seen set + discovery metadata, exact
    assert seen == oracle.seen
    # SPEC-8..10 image rows, exact (bytes + phash + caption)
    assert images == sorted(oracle.images)
    # SPEC-11 counters, exact
    assert counters == oracle.counters
    assert n_waves == oracle.n_waves

    # per-partition metrics rows sum to the oracle totals (SPEC-11 /
    # BASELINE.json:6 "per-partition lineage counters")
    sums = {k: 0 for k in ref.COUNTER_NAMES}
    for row in metrics:
        for k in sums:
            sums[k] += row[k]
    assert sums == oracle.counters


@pytest.mark.parametrize("name", sorted(CONFIGS))
def test_engine_matches_oracle_exactly(spark, name):
    oracle, art = run_both(spark, name)
    check_equal(oracle, art)


@pytest.mark.parametrize("name", sorted(CONFIGS))
def test_engine_matches_oracle_grouped_rank_path(spark, name, monkeypatch):
    """Force candidate_set's grouped two-phase rank (the huge-budget /
    hot-host skew path, normally taken only when B > 4096) onto the
    small fixtures and require the same bit-for-bit oracle equality."""
    from spider_1_spark.engine import operators as ops

    monkeypatch.setattr(ops, "SALT_PATH_MAX_B", 0)
    oracle, art = run_both(spark, name)
    check_equal(oracle, art)


def test_wave_commit_releases_all_cached_blocks(spark):
    """ADVICE r1: localCheckpoint'ed frames were released with
    DataFrame.unpersist(), which does NOT free their RDD blocks —
    cached-block growth on long crawls.  After a run every
    wave-created cache entry AND checkpoint block must be gone."""
    jsc = spark.sparkContext._jsc.sc()
    before = len(jsc.getRDDStorageInfo())
    oracle, art = run_both(spark, "tight_g")
    check_equal(oracle, art)
    after = len(jsc.getRDDStorageInfo())
    assert after <= before, (
        f"crawl leaked {after - before} cached RDD(s) past wave commit"
    )


def test_engine_matches_oracle_aligned_probe_path(spark):
    """The standalone shard-ALIGNED bloom probe (bloom.probe — the
    10^10-scale variant that bounds per-task sidecar I/O) must produce
    the same bit-for-bit artifacts as the default fused probe."""
    oracle, art = run_both(spark, "robots", aligned_probe=True)
    check_equal(oracle, art)


def test_engine_matches_oracle_hosts_shuffle_join_path(spark):
    """hosts_broadcast_max=-1 forces the partitioned shuffle join for
    the frontier⋈hosts enrichment from wave 0 — the auto-degrade path
    the engine takes past 4M known hosts (crawler.py), which otherwise
    never runs on test-size host counts (VERDICT r2 missing item 4).
    -1, not 0: the manifest's host count starts at 0 and the broadcast
    branch triggers on n_hosts_known <= max, so 0 would still
    broadcast wave 0 (whose all-hosts-new join shape is exactly what
    needs the shuffle-path coverage)."""
    oracle, art = run_both(spark, "robots", hosts_broadcast_max=-1)
    check_equal(oracle, art)


@pytest.mark.parametrize("payload", ["image", "none"])
def test_engine_matches_oracle_frontier_mode(spark, payload):
    """run_frontier + max_depth=0 — the BENCH regime (image harvesting
    over a pre-built frontier).  Every wave of this mode takes the
    depth-exhausted pipelined harvest path (crawler.py no_anchor):
    wave w's fetch/decode runs on a pool thread while wave w+1's
    schedule+rank chain executes, so this pins bit-for-bit equality of
    ordering/seen/images/counters under that cross-wave concurrency.
    The oracle equivalent is a plain seed crawl over the same URLs in
    seed_rank order with the same policy.

    payload="none" is the image-free web the 10^8-row scaling evidence
    runs on (BENCH/BASELINE.md §3g): same web object on both sides, so
    equality here proves that AT max_depth=0 the mode changes nothing
    about scheduling — anchors are dropped before the frontier either
    way, so only the <img> items (and hence images rows /
    decode_failed) vanish.  (The claim is deliberately scoped: at
    depth>0 the shorter item list draws a different page-item
    permutation, so link_pos/anchor ORDER differs between payload
    modes — each mode is oracle-equal to itself, not to the other.)"""
    from spider_1_spark.fixtures.frontier_gen import frontier_frame

    n_hosts, n_rows = 20, 2500
    # B sized so the zipf hot host drains in ~4 politeness waves and
    # deferred rows persist across 3+ waves (multiple pipelined
    # handoffs, not a single-wave drain)
    policy = Policy(
        max_depth=0,
        per_host_wave_budget=150,
        per_host_total_cap=1 << 40,
        global_page_budget=1 << 40,
    )
    web = SyntheticWeb(n_hosts, payload=payload)
    frame = frontier_frame(spark, n_rows, n_hosts)
    seeds = [
        r.raw_url
        for r in frame.orderBy("seed_rank").collect()
    ]
    oracle = ref.crawl(seeds, policy, web)
    assert oracle.n_waves >= 3, "fixture must span several waves"
    if payload == "none":
        assert not oracle.images and oracle.counters["decode_failed"] == 0
    root = tempfile.mkdtemp(prefix="spider1_frontier_")
    try:
        art = SparkCrawler(spark, policy, web, root).run_frontier(frame)
        got = (
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
            art.metrics.collect(),
            art.n_waves,
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    check_equal(oracle, got)


def test_grouped_topk_ranks_null_host_rows(spark):
    """A null host (host_udf emits None for unparseable urls) is a
    legal group: the grouped-rank gate must RANK those rows against
    cap_h like any host, not silently drop them (the pandas-groupby
    default dropna would — r4 review finding)."""
    from spider_1_spark.engine.operators import _grouped_topk

    rows = []
    for i in range(40):
        rows.append((None, 0, i, 0, f"bad://u{i}", 0, 7))
    for i in range(40):
        rows.append((f"h{i % 2}", 0, i, 0, f"http://h{i % 2}.x/{i}", 0, 7))
    df = spark.createDataFrame(
        rows,
        "host string, depth int, parent_rank long, link_pos int, "
        "url string, t0 int, cap_h long",
    )
    out = _grouped_topk(df, 4)
    got = out.collect()
    out._rank_source.unpersist()
    by_host = {}
    for r in got:
        by_host.setdefault(r.host, []).append(r.parent_rank)
    # every host, INCLUDING None, keeps exactly its cap_h=7 smallest
    # rows by the (depth, parent_rank, link_pos, url) ordering
    expect = {}
    for h, *_ in rows:
        ranks = sorted(r[2] for r in rows if r[0] == h)
        expect[h] = ranks[:7]
    assert {h: sorted(v) for h, v in by_host.items()} == expect


def test_grouped_topk_null_host_spans_partitions(spark):
    """Null hosts sort FIRST under the range partitioning, so a large
    unparseable-URL population straddles the first partition boundary
    and reaches the driver-side offsets build as a SPANNING host with
    host=None.  When any str host spans a boundary too, the offsets
    sort compares (None, pid) with (str, pid) — which raised TypeError
    and killed the whole query before the None-safe key (ADVICE r4).
    200 null + 200 'hA' rows over 4 range partitions force both to
    span; correctness of the ranks is asserted, not just survival."""
    from spider_1_spark.engine.operators import _grouped_topk

    rows = []
    for i in range(200):
        rows.append((None, 0, i, 0, f"bad://u{i:03d}", 0, 150))
    for i in range(200):
        rows.append(("hA", 0, i, 0, f"http://hA.x/{i:03d}", 0, 150))
    df = spark.createDataFrame(
        rows,
        "host string, depth int, parent_rank long, link_pos int, "
        "url string, t0 int, cap_h long",
    )
    out = _grouped_topk(df, 4)
    got = out.collect()
    out._rank_source.unpersist()
    by_host: dict = {}
    for r in got:
        by_host.setdefault(r.host, []).append(r.parent_rank)
    # cap_h=150 > 400/4 rows-per-partition, so neither host fits in
    # one partition's local rank range: correct output REQUIRES the
    # cross-partition offsets to have been applied to both groups
    assert {h: sorted(v) for h, v in by_host.items()} == {
        None: list(range(150)),
        "hA": list(range(150)),
    }
