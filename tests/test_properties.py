"""SURVEY §5.2 — property-based tests (hypothesis).

Random web graphs × random policies: the Spark engine's equality with
the oracle is covered (expensively) in test_engine_vs_oracle; here the
properties that guard the shared primitives and the oracle itself run
at hypothesis volume, plus the bloom filter's zero-false-negative
guarantee (SPEC-4 correctness depends on it).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from spider_1_spark.engine.bloom import BLOOM_K, bit_positions
from spider_1_spark.functions.urlnorm import canonicalize
from spider_1_spark.pipeline import textops
from spider_1_spark.reference_model import spider1_ref as ref

# ------------------------------------------------------ canonicalizer

url_text = st.text(
    alphabet=st.characters(min_codepoint=0x20, max_codepoint=0x7E),
    max_size=60,
)


@settings(max_examples=300, deadline=None)
@given(url_text)
def test_canonicalize_idempotent_on_arbitrary_input(s):
    c1 = canonicalize(s)
    if c1 is not None:
        assert canonicalize(c1) == c1


@settings(max_examples=200, deadline=None)
@given(
    st.integers(0, 7),
    st.integers(0, 30),
    st.lists(
        st.tuples(
            st.sampled_from("abzk"), st.text("ab019", max_size=6)
        ),
        max_size=4,
    ),
)
def test_canonicalize_query_sort_total(host_k, page, params):
    q = "&".join(f"{k}={v}" for k, v in params)
    u = f"http://H{host_k}.Example.Test:80/p/{page}" + (f"?{q}" if q else "")
    c = canonicalize(u)
    assert c is not None
    assert c.startswith(f"http://h{host_k}.example.test/p/{page}")
    if "?" in c:
        toks = c.split("?", 1)[1].split("&")
        assert toks == sorted(
            toks, key=lambda t: tuple(t.split("=", 1)) if "=" in t else (t, "")
        )


# ------------------------------------------------ oracle policy sweep

policies = st.builds(
    ref.Policy,
    st.integers(1, 4),      # max_depth
    st.integers(1, 4),      # B
    st.integers(1, 12),     # C
    st.integers(5, 200),    # G
)


@settings(max_examples=20, deadline=None)
@given(policies, st.integers(2, 10), st.integers(1, 6))
def test_oracle_invariants_under_random_policies(pol, n_hosts, n_seeds):
    from spider_1_spark.fixtures.webgen import SyntheticWeb, make_seeds

    res = ref.crawl(make_seeds(n_seeds, n_hosts), pol, SyntheticWeb(n_hosts))
    # seq dense, ordering sorted by key WITHIN each wave (deferral can
    # carry a small key into a later wave — SPEC-5), budgets respected
    assert [r[0] for r in res.crawl_log] == list(range(len(res.crawl_log)))
    by_wave: dict[int, list] = {}
    for r in res.crawl_log:
        by_wave.setdefault(r[5], []).append((r[2], r[3], r[4], r[1]))
    for wave_keys in by_wave.values():
        assert wave_keys == sorted(wave_keys)
    assert res.counters["fetched"] <= pol.global_page_budget
    per_host: dict[str, int] = {}
    for _, url, *_ in res.crawl_log:
        h = url.split("/")[2]
        per_host[h] = per_host.get(h, 0) + 1
    assert all(v <= pol.per_host_total_cap for v in per_host.values())
    assert set(r[1] for r in res.crawl_log) <= res.seen_set


# ------------------------------------------------------- bloom filter

@settings(max_examples=50, deadline=None)
@given(st.lists(url_text, min_size=1, max_size=50, unique=True))
def test_bloom_bit_positions_stable_and_in_range(urls):
    m = 1 << 16
    s = pd.Series(urls)
    idx1 = bit_positions(s, m)
    idx2 = bit_positions(s, m)
    assert (idx1 == idx2).all()
    assert idx1.shape == (len(urls), BLOOM_K)
    assert (idx1 < m).all()


def test_bloom_zero_false_negatives_and_bounded_fpr():
    """Insert 20k URLs into a single shard-sized bitmap; every inserted
    URL must probe positive; FPR on 20k fresh URLs must be small."""
    m = 1 << 20
    bm = np.zeros(m // 8, dtype=np.uint8)
    ins = pd.Series([f"http://h{i % 97}.example.test/p/{i}" for i in range(20_000)])
    idx = bit_positions(ins, m)
    for i in range(BLOOM_K):
        byte = (idx[:, i] >> np.uint64(3)).astype(np.int64)
        bit = (idx[:, i] & np.uint64(7)).astype(np.int64)
        np.bitwise_or.at(bm, byte, (1 << bit).astype(np.uint8))

    def probe(series):
        p = bit_positions(series, m)
        hit = np.ones(len(series), dtype=bool)
        for i in range(BLOOM_K):
            byte = (p[:, i] >> np.uint64(3)).astype(np.int64)
            bit = (p[:, i] & np.uint64(7)).astype(np.int64)
            hit &= (bm[byte] >> bit) & 1 == 1
        return hit

    assert probe(ins).all(), "bloom must never miss an inserted URL"
    fresh = pd.Series([f"http://other{i}.example.test/q/{i}" for i in range(20_000)])
    fpr = probe(fresh).mean()
    # m/n = 52 bits/url, k=4 -> theoretical FPR ~ 3e-5; allow slack
    assert fpr < 0.005, f"FPR {fpr:.4f} out of bounds"


# ----------------------------------------------------- minhash bounds

@settings(max_examples=30, deadline=None)
@given(st.integers(0, 2**31), st.integers(1, 20))
def test_minhash_signature_deterministic(seed, n_tokens):
    rng = np.random.Generator(np.random.PCG64(seed))
    words = [f"w{int(x)}" for x in rng.integers(0, 50, n_tokens)]
    text = " ".join(words)
    a, b = textops.minhash_params(32)
    sh = textops.shingle_hashes(text)
    s1 = textops.minhash_signature(sh, a, b)
    s2 = textops.minhash_signature(textops.shingle_hashes(text), a, b)
    assert (s1 == s2).all()
    assert (s1 < textops.MERSENNE61 + 1).all()
