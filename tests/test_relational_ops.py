"""Property tests for the scale-pattern relational ops added in r3:
salted skew join, bloom-prefilter join reduction, HLL sketch aggs.

DuckDB value-equality for the registry keys runs in
test_entry_contract.py / scripts/check_oracle.py; here we pin the
properties the oracle CANNOT see: salting is value-invisible under an
engineered hot key, the bloom prefilter never drops a true match and
actually prunes, and sketch estimates are merge-consistent and
error-bounded.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from spider_1_spark.relational.queries import (
    bloom_prefilter,
    salted_equi_join,
)


def test_salted_join_equals_plain_on_hot_key(spark):
    """One key owns 80% of the fact side (the shape that stalls a
    plain shuffle join at 100 TB).  The salted join must return
    exactly the plain join's rows — salting is physical, not
    semantic."""
    hot = [(0, i) for i in range(4000)]
    cold = [(k, 100_000 + k) for k in range(1, 51)]
    fact = spark.createDataFrame(hot + cold, "k long, payload long")
    dim = spark.createDataFrame(
        [(k, f"d{k}") for k in range(0, 51, 2)], "dk long, attr string"
    )
    salted = salted_equi_join(fact, "k", "payload", dim, "dk")
    plain = fact.join(dim, fact.k == dim.dk)
    got = sorted(map(tuple, salted.select("k", "payload", "attr").collect()))
    want = sorted(map(tuple, plain.select("k", "payload", "attr").collect()))
    assert got == want
    assert len(got) == 4000 + 25  # hot key kept every copy


def test_salted_join_spreads_hot_key_across_salts(spark):
    """The whole point: the hot key's rows must carry more than one
    distinct salt value, i.e. land in more than one shuffle group."""
    fact = spark.createDataFrame(
        [(0, i) for i in range(4000)], "k long, payload long"
    )
    salted = fact.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col("payload")), F.lit(8)).cast("int")
    )
    n_salts = salted.select("_salt").distinct().count()
    assert n_salts == 8


@settings(max_examples=8, deadline=None)
@given(
    st.lists(st.integers(0, 12), min_size=1, max_size=60),
    st.lists(st.integers(0, 12), min_size=0, max_size=10, unique=True),
    st.sampled_from([1, 2, 8]),
)
def test_salted_join_matches_plain_property(spark, fact_keys, dim_keys,
                                            n_salts):
    """∀ small tables and salt counts (incl. the degenerate S=1):
    salted join ≡ plain join — duplicates, missing keys, empty dim."""
    fact = spark.createDataFrame(
        [(k, i) for i, k in enumerate(fact_keys)], "k long, payload long"
    )
    dim = spark.createDataFrame(
        [(k, f"d{k}") for k in dim_keys], "dk long, attr string"
    ) if dim_keys else spark.createDataFrame([], "dk long, attr string")
    salted = salted_equi_join(fact, "k", "payload", dim, "dk", n_salts)
    plain = fact.join(dim, fact.k == dim.dk)
    got = sorted(map(tuple, salted.select("k", "payload", "attr").collect()))
    want = sorted(map(tuple, plain.select("k", "payload", "attr").collect()))
    assert got == want


def test_bloom_prefilter_zero_false_negatives_and_prunes(spark):
    """Every true match survives the prefilter (FNs are structurally
    impossible: build and probe share the JVM position expression);
    the prefilter drops most non-matching keys (it is a filter, not a
    pass-through)."""
    fact = spark.createDataFrame(
        [(k,) for k in range(20_000)], "fk long"
    )
    dim = spark.createDataFrame(
        [(k,) for k in range(0, 20_000, 97)], "dk long"
    )
    pre, bmp = bloom_prefilter(spark, fact, "fk", dim, "dk")
    kept = {r.fk for r in pre.collect()}
    bmp.unpersist()
    true_matches = set(range(0, 20_000, 97))
    assert true_matches <= kept, "bloom dropped a true match"
    # 207 true keys in a 2^20-bit bloom: FP rate is tiny — the
    # prefilter must remove the overwhelming majority of non-matches
    assert len(kept) < 1000, f"bloom pruned almost nothing: {len(kept)}"


def test_bloom_prefilter_empty_dim_drops_everything(spark):
    """An empty build side yields an all-zero bitmap: no fact row can
    probe true (the empty-wave edge the engine's A6 also has)."""
    fact = spark.createDataFrame([(k,) for k in range(100)], "fk long")
    dim = spark.createDataFrame([], "dk long")
    pre, bmp = bloom_prefilter(spark, fact, "fk", dim, "dk")
    assert pre.count() == 0
    bmp.unpersist()


def test_bloom_prefilter_rejects_mismatched_key_types(spark):
    """xxhash64 is type-sensitive (hash(1::int) != hash(1::long)) —
    a silent type mismatch would be a silent false-negative source,
    so the helper must fail loudly."""
    import pytest as _pytest

    fact = spark.createDataFrame([(1,)], "fk long")
    dim = spark.createDataFrame([(1,)], "dk int")
    with _pytest.raises(ValueError, match="type mismatch"):
        bloom_prefilter(spark, fact, "fk", dim, "dk")


def test_salted_join_rejects_reserved_column(spark):
    """A caller-owned _salt column would be silently clobbered and
    dropped — the helper must refuse instead."""
    import pytest as _pytest

    fact = spark.createDataFrame([(1, 2, 0)], "k long, p long, _salt int")
    dim = spark.createDataFrame([(1,)], "dk long")
    with _pytest.raises(ValueError, match="_salt"):
        salted_equi_join(fact, "k", "p", dim, "dk")


def test_hll_sketch_estimate_bounds_and_merge_consistency(spark):
    """lgk=12 HLL on 20k distinct keys: estimate within 5% of exact;
    union-of-part-sketches estimates EXACTLY like the direct sketch
    over the whole input (register-wise max is associative — the
    property that makes pre-aggregated sketch tables sound)."""
    df = spark.createDataFrame(
        [(i % 4, i) for i in range(40_000)], "part int, uid long"
    )  # 40k rows, 40k distinct uids, 4 parts
    per = df.groupBy("part").agg(
        F.hll_sketch_agg("uid", F.lit(12)).alias("sk")
    )
    merged_est = (
        per.agg(F.hll_union_agg("sk").alias("u"))
        .select(F.hll_sketch_estimate("u").alias("est"))
        .collect()[0]["est"]
    )
    direct_est = df.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("uid", F.lit(12))).alias(
            "est"
        )
    ).collect()[0]["est"]
    assert merged_est == direct_est
    assert abs(merged_est - 40_000) / 40_000 < 0.05


def test_intervals_coverage_matches_bruteforce(spark, tmp_path):
    """intervals_coverage vs a brute-force per-user sweep over an
    engineered fixture with every regime: nested intervals, chained
    overlaps, exact-touch boundaries (start == prev end merges), and
    isolated points — the window-stack must reproduce the exact
    island count and covered micros."""
    import datetime as dt

    from spider_1_spark.relational.queries import intervals_coverage

    epoch = dt.datetime(1970, 1, 1)
    rows = []
    # (user, event_id, start_seconds); dur_s = event_id % 7200 + 60
    cases = [
        (1, 7140, 0),      # dur 7200s: [0, 7200)
        (1, 1, 100),       # dur 61s: nested inside the first
        (1, 7200, 7260),   # dur 60s: starts exactly at 7200+60? ->
        (1, 30, 20000),    # isolated
        (2, 120, 0),       # chain: [0,180)
        (2, 110, 180),     # start == prev end -> merges (<= rule)
        (2, 50, 500),      # isolated
    ]
    for u, eid, start_s in cases:
        rows.append(
            (eid, epoch + dt.timedelta(seconds=start_s), u, "view", 0.0,
             "{}")
        )
    path = str(tmp_path / "iv")
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string",
    ).write.parquet(f"{path}/events.parquet")
    got = {
        r.user_id: (r.n_intervals, r.n_islands, r.covered_us)
        for r in intervals_coverage(spark, path).collect()
    }

    def brute(ivs):
        ivs = sorted(ivs)
        islands = []
        for s, e in ivs:
            if islands and s <= islands[-1][1]:
                islands[-1][1] = max(islands[-1][1], e)
            else:
                islands.append([s, e])
        return (
            len(ivs), len(islands), sum(e - s for s, e in islands)
        )

    per_user: dict[int, list] = {}
    for u, eid, start_s in cases:
        s = start_s * 1_000_000
        per_user.setdefault(u, []).append(
            (s, s + (eid % 7200 + 60) * 1_000_000)
        )
    assert got == {u: brute(ivs) for u, ivs in per_user.items()}


def test_timeseries_gapfill_spine_is_dense_and_zero_filled(spark):
    """Every (event_type, day) cell in the global [min, max] day range
    must be present exactly once, silent days as explicit zeros, and
    the filled counts must sum back to the raw event count."""
    from spider_1_spark.relational.queries import timeseries_gapfill

    sf = "/root/testdata/sf0.001"
    rows = timeseries_gapfill(spark, sf).collect()
    days = {r.day for r in rows}
    types = {r.event_type for r in rows}
    assert days == set(range(min(days), max(days) + 1))
    assert len(rows) == len(days) * len(types)  # dense, no dup cells
    assert any(r.n == 0 for r in rows) or len(days) * len(types) == sum(
        1 for r in rows if r.n > 0
    )
    n_events = spark.read.parquet(f"{sf}/events.parquet").count()
    assert sum(r.n for r in rows) == n_events


def test_stream_dedup_actually_sees_triplicated_source(spark):
    """The dedup key's evidence depends on the source really carrying
    3 byte-identical copies per event: pin the staging fixture (3
    files, 3x base rows) and that the deduped aggregate sums back to
    the BASE count, not the inflated one."""
    import glob

    from spider_1_spark.relational.queries import (
        _stream_dup_src_dir,
        stream_dedup_watermark,
    )

    sf = "/root/testdata/sf0.001"
    path = _stream_dup_src_dir(sf)
    assert len(glob.glob(path + "/*.parquet")) == 3
    base = spark.read.parquet(f"{sf}/events.parquet").count()
    assert spark.read.parquet(path).count() == 3 * base
    out = stream_dedup_watermark(spark, sf).collect()
    assert sum(r.n for r in out) == base


def test_foreach_batch_upsert_replays_four_batches(spark):
    """The CDC key's evidence rests on foreachBatch really running
    once per staged file: the append log must hold base+delta rows
    (1000 inserts + 100 updates), and the merged view must apply
    value+1000 to exactly the event_id % 10 == 0 subset."""
    from spider_1_spark.relational.queries import (
        _scratch_dir,
        stream_foreach_batch_upsert,
    )

    sf = "/root/testdata/sf0.001"
    out = {r.event_id: r for r in
           stream_foreach_batch_upsert(spark, sf).collect()}
    log = spark.read.parquet(_scratch_dir("fbu_log", sf))
    assert log.count() == 1100  # 3 insert slices + 1 update slice
    assert log.select("seq").distinct().count() == 2
    base = {
        r.event_id: r
        for r in spark.read.parquet(f"{sf}/events.parquet").collect()
    }
    assert set(out) == set(base)
    for eid, r in out.items():
        expect = base[eid].value + (1000.0 if eid % 10 == 0 else 0.0)
        assert r.value == expect
