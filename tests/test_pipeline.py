"""Pytest oracles for the training-data pipeline ops (rows-only keys).

Each rows-only operator is verified against a pure-Python reference
built from the SAME textops primitives (shared-implementation
discipline, SURVEY §5.1) on engineered fixtures with known duplicate
structure — plus determinism and recall properties for the
approximate ops.
"""

from __future__ import annotations

import itertools
import shutil
import tempfile

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from spider_1_spark.pipeline import textops

WORDS = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu nu "
    "xi omicron pi rho sigma tau upsilon phi chi psi omega red blue green"
).split()


def make_docs():
    """Docs with engineered structure: exact dups, near dups, uniques."""
    rng = np.random.Generator(np.random.PCG64(123))
    docs = []
    for i in range(20):
        docs.append(" ".join(rng.choice(WORDS, size=30)))
    near = docs[3].split()
    near[7] = "REPLACED"
    extra = [
        docs[0],                      # exact dup of 0      -> id 20
        " ".join(near),               # near dup of 3       -> id 21
        docs[5] + " tail extra",      # near dup of 5       -> id 22
        "",                           # empty doc           -> id 23
        "single",                     # tiny doc            -> id 24
    ]
    return docs + extra


def make_embeddings():
    """10 tight clusters x 12 points in 64-d (unit-norm)."""
    rng = np.random.Generator(np.random.PCG64(321))
    centers = rng.standard_normal((10, 64))
    rows = []
    vid = 0
    for label, c in enumerate(centers):
        for _ in range(12):
            v = c + 0.05 * rng.standard_normal(64)
            v = v / np.linalg.norm(v)
            rows.append((vid, [float(x) for x in v.astype(np.float32)], label))
            vid += 1
    return rows


@pytest.fixture(scope="module")
def sf_dir(spark):
    tmp = tempfile.mkdtemp(prefix="spider1_pipe_")
    docs = make_docs()
    ddf = spark.createDataFrame(
        [
            (i, t, "en", f"src{i % 3}", len(t))
            for i, t in enumerate(docs)
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    ddf.write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
    edf = spark.createDataFrame(
        make_embeddings(), "vec_id long, embedding array<float>, label int"
    )
    edf.write.mode("overwrite").parquet(f"{tmp}/embeddings.parquet")
    yield tmp
    shutil.rmtree(tmp, ignore_errors=True)


# ---------------------------------------------------------------- oracles

def py_lsh_pairs(docs):
    a, b = textops.minhash_params(64)
    sigs = {
        i: textops.minhash_signature(textops.shingle_hashes(t), a, b)
        for i, t in enumerate(docs)
    }
    bands = {i: textops.band_hashes(s, 16) for i, s in sigs.items()}
    pairs = set()
    for i, j in itertools.combinations(range(len(docs)), 2):
        if any(x == y for x, y in zip(bands[i], bands[j])):
            pairs.add((i, j))
    return sigs, pairs


def test_minhash_lsh_matches_python_oracle(spark, sf_dir):
    from spider_1_spark.pipeline.queries import dedup_minhash_lsh

    docs = make_docs()
    sigs, cand = py_lsh_pairs(docs)
    expect = {}
    for i, j in cand:
        est = float(np.mean(sigs[i] == sigs[j]))
        if est >= 0.5:
            expect[(i, j)] = est

    got = {
        (r.doc_a, r.doc_b): r.est_jaccard
        for r in dedup_minhash_lsh(spark, sf_dir).collect()
    }
    # pair sets exact; estimates to rounding tolerance (Spark rounds
    # HALF_UP, Python banker's — 58/64 = 0.90625 differs in the 4th dp)
    assert set(got) == set(expect)
    for k in expect:
        assert abs(got[k] - expect[k]) < 5e-4, k
    # engineered dups must be found
    assert (0, 20) in got and got[(0, 20)] == 1.0   # exact dup
    assert (3, 21) in got                            # near dup
    assert (5, 22) in got                            # near dup


def test_ngram_jaccard_matches_python_oracle(spark, sf_dir):
    from spider_1_spark.pipeline.queries import dedup_ngram_jaccard

    docs = make_docs()
    _, cand = py_lsh_pairs(docs)
    sh = {i: textops.shingle_hashes(t) for i, t in enumerate(docs)}
    expect = {}
    for i, j in cand:
        jac = round(textops.jaccard(sh[i], sh[j]), 4)
        if jac >= 0.3:
            expect[(i, j)] = jac
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup_ngram_jaccard(spark, sf_dir).collect()
    }
    assert got == expect
    assert got[(0, 20)] == 1.0


def test_simhash_matches_python_oracle(spark, sf_dir):
    from spider_1_spark.pipeline.queries import dedup_simhash

    docs = make_docs()
    sh = {i: textops.simhash64(t) for i, t in enumerate(docs)}
    expect = {}
    for i, j in itertools.combinations(range(len(docs)), 2):
        # pigeonhole: pair surfaces iff >= 1 of 4 16-bit blocks equal
        blocks_equal = any(
            ((sh[i] >> (16 * blk)) & 0xFFFF) == ((sh[j] >> (16 * blk)) & 0xFFFF)
            for blk in range(4)
        )
        ham = textops.hamming64(sh[i], sh[j])
        if blocks_equal and ham <= 6:
            expect[(i, j)] = ham
    got = {
        (r.doc_a, r.doc_b): r.hamming
        for r in dedup_simhash(spark, sf_dir).collect()
    }
    assert got == expect
    assert got[(0, 20)] == 0  # exact dup -> identical simhash


def test_phash_hamming_matches_python_oracle(spark):
    """dedup_phash_hamming must equal the pure-Python pigeonhole+
    popcount oracle over the SAME fixture bytes (shared decode +
    dhash64 primitives), and the engineered exact byte-copies must
    surface at Hamming 0."""
    from spider_1_spark.functions.codecs import DecodeError, decode
    from spider_1_spark.functions.phash import dhash64
    from spider_1_spark.pipeline.queries import (
        _phash_fixture_path,
        dedup_phash_hamming,
    )

    rows = spark.read.parquet(_phash_fixture_path(spark)).collect()
    hashes = {}
    for r in rows:
        try:
            rgb, _ = decode(bytes(r.bytes))
        except DecodeError:
            continue
        h = dhash64(rgb)
        hashes[r.image_id] = h & ((1 << 64) - 1)
    expect = {}
    for a, b in itertools.combinations(sorted(hashes), 2):
        ha, hb = hashes[a], hashes[b]
        blocks_equal = any(
            ((ha >> (16 * k)) & 0xFFFF) == ((hb >> (16 * k)) & 0xFFFF)
            for k in range(4)
        )
        ham = bin(ha ^ hb).count("1")
        if blocks_equal and ham <= 6:
            expect[(a, b)] = ham
    got = {
        (r.img_a, r.img_b): r.hamming
        for r in dedup_phash_hamming(spark, None).collect()
    }
    assert got == expect
    copies = [(a, b) for (a, b) in got if b == a + "-copy"]
    assert copies, "exact byte-copies must pair"
    assert all(got[p] == 0 for p in copies)


def test_doc_fingerprint_matches_python_oracle(spark, sf_dir):
    from spider_1_spark.pipeline.queries import doc_fingerprint

    docs = make_docs()
    got: dict[int, list[int]] = {}
    for r in doc_fingerprint(spark, sf_dir).collect():
        got.setdefault(r.doc_id, []).append(r.fp & ((1 << 64) - 1))
    for i, t in enumerate(docs):
        expect = [f & ((1 << 64) - 1) for f in textops.winnow_fingerprints(t)]
        assert sorted(got.get(i, [])) == sorted(expect), f"doc {i}"


def test_ann_lsh_recall_vs_brute_force(spark, sf_dir):
    from spider_1_spark.pipeline.queries import (
        ann_cosine_topk,
        ann_lsh_bucketed,
    )

    exact = {}
    for r in ann_cosine_topk(spark, sf_dir).collect():
        exact.setdefault(r.query_id, set()).add(r.neighbor_id)
    approx = {}
    for r in ann_lsh_bucketed(spark, sf_dir).collect():
        approx.setdefault(r.query_id, set()).add(r.neighbor_id)
    # clustered fixture: same-cluster points share buckets with high
    # probability -> strong recall expected
    recalls = [
        len(exact[q] & approx.get(q, set())) / len(exact[q]) for q in exact
    ]
    assert np.mean(recalls) >= 0.6, f"mean recall {np.mean(recalls):.2f}"

    # determinism: re-running yields the identical result set
    again = {
        (r.query_id, r.neighbor_id, r.sim, r.rank)
        for r in ann_lsh_bucketed(spark, sf_dir).collect()
    }
    first = {
        (r.query_id, r.neighbor_id, r.sim, r.rank)
        for r in ann_lsh_bucketed(spark, sf_dir).collect()
    }
    assert again == first


def test_ann_multiprobe_recall_dominates_single_probe(spark, sf_dir):
    """Multi-probe (flip one sign bit per probe) must lift recall to
    >= 0.8 vs the exact baseline at UNCHANGED bucket count, and never
    lose a neighbor the single-probe variant found (its probe set is a
    strict superset) — VERDICT r2 next-round item 9."""
    from spider_1_spark.pipeline.queries import (
        ann_cosine_topk,
        ann_lsh_bucketed,
        ann_lsh_multiprobe,
    )

    exact, single, multi = {}, {}, {}
    for res, df in (
        (exact, ann_cosine_topk(spark, sf_dir)),
        (single, ann_lsh_bucketed(spark, sf_dir)),
        (multi, ann_lsh_multiprobe(spark, sf_dir)),
    ):
        for r in df.collect():
            res.setdefault(r.query_id, set()).add(r.neighbor_id)

    m_recalls = [
        len(exact[q] & multi.get(q, set())) / len(exact[q]) for q in exact
    ]
    s_recalls = [
        len(exact[q] & single.get(q, set())) / len(exact[q]) for q in exact
    ]
    assert np.mean(m_recalls) >= 0.8, (
        f"multi-probe mean recall {np.mean(m_recalls):.2f}"
    )
    assert np.mean(m_recalls) >= np.mean(s_recalls)
    # superset candidate pool: a true neighbor found single-probe can
    # only be displaced by a BETTER (also-true) neighbor, so per-query
    # recall never drops
    for q in exact:
        assert len(exact[q] & multi.get(q, set())) >= len(
            exact[q] & single.get(q, set())
        ), f"query {q} lost recall going multi-probe"


def test_ann_ivf_recall_and_determinism(spark, sf_dir):
    """IVF (trained coarse centroids + 3-list probe) must reach >= 0.8
    recall vs the exact baseline on the clustered fixture and be
    deterministic across runs (Lloyd init is the lowest vec_ids — no
    RNG anywhere in the train/assign path)."""
    from spider_1_spark.pipeline.queries import (
        ann_cosine_topk,
        ann_ivf_bucketed,
    )

    exact, ivf = {}, {}
    for res, df in (
        (exact, ann_cosine_topk(spark, sf_dir)),
        (ivf, ann_ivf_bucketed(spark, sf_dir)),
    ):
        for r in df.collect():
            res.setdefault(r.query_id, set()).add(r.neighbor_id)
    recalls = [
        len(exact[q] & ivf.get(q, set())) / len(exact[q]) for q in exact
    ]
    assert np.mean(recalls) >= 0.8, f"IVF mean recall {np.mean(recalls):.2f}"

    again = {
        (r.query_id, r.neighbor_id, r.sim, r.rank)
        for r in ann_ivf_bucketed(spark, sf_dir).collect()
    }
    first = {
        (r.query_id, r.neighbor_id, r.sim, r.rank)
        for r in ann_ivf_bucketed(spark, sf_dir).collect()
    }
    assert again == first


def test_embedding_dedup_lsh_recall_vs_label_blocked(spark, sf_dir):
    """The production LSH-blocked embedding dedup must recover >=95%
    of the pairs the exact (label-blocked) variant finds on the
    clustered fixture (VERDICT r1 item 2: label blocking was the
    scale-killer; the LSH path must not trade away recall)."""
    from spider_1_spark.pipeline.queries import (
        dedup_embedding_cosine,
        dedup_embedding_label_blocked,
    )

    exact = {
        (r.id_a, r.id_b): r.sim
        for r in dedup_embedding_label_blocked(spark, sf_dir).collect()
    }
    lsh = {
        (r.id_a, r.id_b): r.sim
        for r in dedup_embedding_cosine(spark, sf_dir).collect()
    }
    assert exact, "fixture must produce same-cluster pairs"
    recall = len(set(exact) & set(lsh)) / len(exact)
    assert recall >= 0.95, f"LSH recall {recall:.3f}"
    # shared pairs carry identical cosine values
    for k in set(exact) & set(lsh):
        assert lsh[k] == exact[k]


def test_cc_embedding_matches_union_find(spark, sf_dir):
    """dedup_cc_embedding must equal a pure-Python union-find over the
    SAME pair set: identical (vec_id -> min-reachable-id) labels and
    component sizes.  On the 10-cluster fixture the components must
    also be non-trivial (transitivity matters: a~b, b~c without a~c
    still lands all three in one cluster)."""
    from spider_1_spark.pipeline.queries import (
        dedup_cc_embedding,
        dedup_embedding_cosine,
    )

    pairs = [
        (r.id_a, r.id_b)
        for r in dedup_embedding_cosine(spark, sf_dir).collect()
    ]
    assert pairs, "fixture must produce near-dup edges"

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by min id so the root IS the min-label
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo
    want = {x: find(x) for x in parent}
    comp_sizes: dict[int, int] = {}
    for r in want.values():
        comp_sizes[r] = comp_sizes.get(r, 0) + 1

    got = dedup_cc_embedding(spark, sf_dir).collect()
    assert {r.vec_id: r.component for r in got} == want
    assert all(r.cluster_size == comp_sizes[r.component] for r in got)
    # the 12-point clusters exercise transitive closure, not just pairs
    assert max(comp_sizes.values()) >= 3


def test_cc_minhash_matches_union_find(spark, sf_dir):
    """dedup_cc_minhash must equal a pure-Python union-find over the
    SAME minhash-LSH pair set (the text-side counterpart of
    test_cc_embedding_matches_union_find): identical min-reachable
    labels and component sizes, non-singletons only."""
    from spider_1_spark.pipeline.queries import (
        dedup_cc_minhash,
        dedup_minhash_lsh,
    )

    pairs = [
        (r.doc_a, r.doc_b)
        for r in dedup_minhash_lsh(spark, sf_dir).collect()
    ]
    assert pairs, "fixture must produce minhash near-dup edges"

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo
    want = {x: find(x) for x in parent}
    comp_sizes: dict[int, int] = {}
    for r in want.values():
        comp_sizes[r] = comp_sizes.get(r, 0) + 1

    got = dedup_cc_minhash(spark, sf_dir).collect()
    assert {r.doc_id: r.component for r in got} == want
    assert all(r.cluster_size == comp_sizes[r.component] for r in got)


def test_corpus_apply_dedup_keeps_canonicals_and_singletons(spark, sf_dir):
    """The cleaned corpus = every vec_id minus the non-canonical
    members of each near-dup component (union-find oracle over the
    same pair set): canonicals survive, duplicates are gone, and
    singletons pass through untouched."""
    import pyarrow.parquet as pq

    from spider_1_spark.pipeline.queries import (
        corpus_apply_dedup,
        dedup_embedding_cosine,
    )

    pairs = [
        (r.id_a, r.id_b)
        for r in dedup_embedding_cosine(spark, sf_dir).collect()
    ]
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo
    dropped = {x for x in parent if find(x) != x}
    assert dropped, "fixture must actually drop duplicates"

    all_ids = {
        rec["vec_id"]
        for rec in pq.read_table(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id"]
        ).to_pylist()
    }
    kept = {r.vec_id for r in corpus_apply_dedup(spark, sf_dir).collect()}
    assert kept == all_ids - dropped


def test_lsh_bucket_cap_bounds_degenerate_buckets(spark):
    """A boilerplate-heavy corpus (many identical docs) must not blow
    up the LSH band self-join: buckets above the cap are dropped and
    reported by lsh_dropped_buckets (VERDICT r1 item 3)."""
    import pandas as pd  # noqa: F401

    from spider_1_spark.pipeline.queries import (
        SIG_BANDS,
        _lsh_candidate_pairs,
        lsh_dropped_buckets,
        minhash_signatures,
    )

    n_dup, n_uniq = 40, 6
    rows = [(i, "the same boilerplate text repeated everywhere here")
            for i in range(n_dup)]
    rows += [
        (100 + j, f"unique document number {j} with words w{j} x{j} y{j}")
        for j in range(n_uniq)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sig = minhash_signatures(docs).persist()

    capped = _lsh_candidate_pairs(sig, bucket_cap=16).collect()
    # identical docs share ALL bands -> every band bucket holds 40 > 16
    # -> all dropped; no pair survives from the degenerate group
    dup_ids = set(range(n_dup))
    assert not any(r.doc_a in dup_ids and r.doc_b in dup_ids for r in capped)
    dropped = lsh_dropped_buckets(sig, bucket_cap=16).collect()
    assert len(dropped) == SIG_BANDS
    assert all(r.n_docs == n_dup for r in dropped)

    # with the cap above the bucket size the full pair set is back
    uncapped = _lsh_candidate_pairs(sig, bucket_cap=64).collect()
    n_dup_pairs = n_dup * (n_dup - 1) // 2
    got_dup_pairs = sum(
        1 for r in uncapped if r.doc_a in dup_ids and r.doc_b in dup_ids
    )
    assert got_dup_pairs == n_dup_pairs
    sig.unpersist()


def test_dedup_keep_best_picks_longest_then_min_id(spark):
    """Engineered dupe groups: normalization (lower/trim/collapse-ws)
    must merge re-wrapped mirrors; winner = longest copy, ties to the
    smallest doc_id; python sha256 oracle pins the group keys."""
    import hashlib
    import re

    from spider_1_spark.pipeline.queries import dedup_keep_best

    rows = [
        (1, "Hello  World"),          # group A, 12 chars
        (2, "hello world"),           # group A, 11 chars
        (3, "  HELLO WORLD "),        # group A, 14 chars -> winner
        (4, "same text!"),            # group B, 10 chars -> tie, min id
        (5, "same TEXT!"),            # group B, 10 chars
        (6, "a singleton document"),  # group C
    ]
    tmp = tempfile.mkdtemp(prefix="spider1_keepbest_")
    try:
        spark.createDataFrame(
            [(i, t, len(t)) for i, t in rows],
            "doc_id long, text string, n_chars long",
        ).write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
        got = {
            r.grp: (r.keep_id, r.keep_chars, r.n_copies)
            for r in dedup_keep_best(spark, tmp).collect()
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    def grp(text: str) -> str:
        norm = re.sub(r"\s+", " ", text.strip(" ").lower())
        return hashlib.sha256(norm.encode()).hexdigest()

    assert got == {
        grp("Hello  World"): (3, 14, 3),
        grp("same text!"): (4, 10, 2),
        grp("a singleton document"): (6, 20, 1),
    }


def test_dedup_keep_best_randomized_matches_python_oracle(spark):
    """One randomized 200-doc batch (seeded) with messy whitespace,
    case variants, and engineered dupe families vs a pure-python
    normalize/group/select oracle — the property the engineered
    3-group test can't cover: arbitrary interleavings of spaces,
    tabs, newlines, vertical tabs, and form feeds."""
    import hashlib
    import random
    import re

    from spider_1_spark.pipeline.queries import dedup_keep_best

    rng = random.Random(77)
    ws = [" ", "\t", "\n", "\x0b", "\f", "  ", " \t "]
    bases = [f"base document {i} with words" for i in range(40)]
    rows = []
    for i in range(200):
        base = rng.choice(bases)
        words = base.split(" ")
        if rng.random() < 0.5:
            words = [w.upper() if rng.random() < 0.3 else w for w in words]
        text = "".join(
            w + (rng.choice(ws) if j < len(words) - 1 else "")
            for j, w in enumerate(words)
        )
        if rng.random() < 0.3:
            text = rng.choice(ws) + text
        if rng.random() < 0.3:
            text = text + rng.choice(ws)
        rows.append((i, text, len(text)))

    tmp = tempfile.mkdtemp(prefix="spider1_keepbest_rand_")
    try:
        spark.createDataFrame(
            rows, "doc_id long, text string, n_chars long"
        ).write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
        got = {
            r.grp: (r.keep_id, r.keep_chars, r.n_copies)
            for r in dedup_keep_best(spark, tmp).collect()
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    # python oracle mirroring the pinned normalization exactly:
    # strip spaces only (SQL trim), lower, collapse [ \t\n\x0b\f\r]+
    groups: dict[str, list[tuple[int, int]]] = {}
    for i, text, n in rows:
        norm = re.sub(
            r"[ \t\n\r\f\x0b]+", " ", text.strip(" ").lower()
        )
        grp = hashlib.sha256(norm.encode()).hexdigest()
        groups.setdefault(grp, []).append((i, n))
    want = {}
    for grp, members in groups.items():
        keep = max(members, key=lambda m: (m[1], -m[0]))
        want[grp] = (keep[0], keep[1], len(members))
    assert got == want
    assert any(v[2] > 1 for v in want.values()), "need real dupe groups"


def test_simhash_block_cap_bounds_degenerate_blocks(spark):
    """A boilerplate-heavy corpus (identical simhashes) must not blow
    up the simhash block self-join: blocks above the cap are dropped
    and reported by simhash_dropped_blocks (VERDICT r2 wrong item 2 —
    the same degenerate-bucket guard _lsh_candidate_pairs already
    has)."""
    from spider_1_spark.pipeline.queries import (
        _simhash_pairs,
        simhash_dropped_blocks,
    )

    n_dup, n_uniq = 40, 6
    rows = [(i, "the same boilerplate text repeated everywhere here")
            for i in range(n_dup)]
    rows += [
        (100 + j, f"unique document number {j} with words w{j} x{j} y{j}")
        for j in range(n_uniq)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    # identical docs share ALL 4 blocks -> every block holds 40 > 16
    # -> all dropped; no pair survives from the degenerate group
    capped = _simhash_pairs(docs, block_cap=16).collect()
    dup_ids = set(range(n_dup))
    assert not any(r.doc_a in dup_ids and r.doc_b in dup_ids for r in capped)
    dropped = simhash_dropped_blocks(docs, block_cap=16).collect()
    assert len(dropped) >= 4  # the 4 blocks of the boilerplate simhash
    assert any(r.n_docs == n_dup for r in dropped)

    # with the cap above the block size the full pair set is back
    uncapped = _simhash_pairs(docs, block_cap=64).collect()
    n_dup_pairs = n_dup * (n_dup - 1) // 2
    got_dup_pairs = sum(
        1 for r in uncapped
        if r.doc_a in dup_ids and r.doc_b in dup_ids and r.hamming == 0
    )
    assert got_dup_pairs == n_dup_pairs


def test_embedding_lsh_bits_parameter_and_cap(spark, sf_dir):
    """The bands/bits knobs are real parameters (VERDICT r2 wrong item
    3): a higher bit-width must keep the final near-dup pair set
    identical on the clustered fixture (tight clusters survive finer
    buckets), the bucket cap must bound degenerate buckets, and the
    generated DuckDB oracle must track the SAME knob values
    bit-for-bit — including when the cap actively drops buckets."""
    import duckdb

    from spider_1_spark.pipeline.queries import (
        _emb,
        _emb_dedup_sql,
        dedup_embedding_cosine,
        emb_dropped_buckets,
    )

    base = {
        (r.id_a, r.id_b): r.sim
        for r in dedup_embedding_cosine(spark, sf_dir).collect()
    }
    finer = {
        (r.id_a, r.id_b): r.sim
        for r in dedup_embedding_cosine(spark, sf_dir, bits=8).collect()
    }
    assert base and finer == base

    # cap below the cluster size drops every cluster bucket
    assert emb_dropped_buckets(
        _emb(spark, sf_dir), bucket_cap=8
    ).count() > 0
    capped = dedup_embedding_cosine(spark, sf_dir, bucket_cap=8).collect()
    assert len(capped) < len(base)

    # SQL oracle tracks the knobs in lockstep, cap actively dropping
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"parquet_scan('{sf_dir}/embeddings.parquet/*.parquet')"
    )
    duck = {
        (ia, ib): s
        for ia, ib, s in con.execute(
            _emb_dedup_sql(bucket_cap=8)
        ).fetchall()
    }
    got = {(r.id_a, r.id_b): r.sim for r in capped}
    assert got == duck


def test_multimodal_decode_statuses(spark, sf_dir):
    from spider_1_spark.pipeline.queries import multimodal_decode

    rows = multimodal_decode(spark, sf_dir).collect()
    by_status: dict[str, int] = {}
    for r in rows:
        by_status[r.status] = by_status.get(r.status, 0) + 1
    assert by_status.get("unsupported_codec") == 1  # the jpeg stub row
    assert by_status.get("ok", 0) > 0
    for r in rows:
        if r.status == "ok":
            assert r.w >= 16 and r.h >= 16 and r.fmt in ("ppm", "png", "qlossy")
            assert r.phash is not None and r.thumb_mean is not None
        else:
            assert r.w is None and r.phash is None


def test_dedup_exact_on_fixture(spark, sf_dir):
    from spider_1_spark.pipeline.queries import dedup_exact

    rows = dedup_exact(spark, sf_dir).collect()
    dups = {r.keep_id: r.n_copies for r in rows if r.n_copies > 1}
    assert dups == {0: 2}  # doc 20 is the only exact duplicate (of 0)


# ------------------------------------------------------- textops properties

def test_minhash_estimates_jaccard():
    rng = np.random.Generator(np.random.PCG64(5))
    a, b = textops.minhash_params(256)
    base = [" ".join(rng.choice(WORDS, size=60)) for _ in range(6)]
    for t in base:
        toks = t.split()
        k = rng.integers(0, len(toks))
        mod = toks.copy()
        mod[k] = "XX"
        s1 = textops.shingle_hashes(t)
        s2 = textops.shingle_hashes(" ".join(mod))
        exact = textops.jaccard(s1, s2)
        est = float(
            np.mean(
                textops.minhash_signature(s1, a, b)
                == textops.minhash_signature(s2, a, b)
            )
        )
        assert abs(est - exact) < 0.15


def test_simhash_properties():
    t = "the quick brown fox jumps over the lazy dog"
    assert textops.simhash64(t) == textops.simhash64(t)
    near = textops.simhash64(t.replace("fox", "cat"))
    far = textops.simhash64(" ".join(["zzz%d" % i for i in range(9)]))
    d_near = textops.hamming64(textops.simhash64(t), near)
    d_far = textops.hamming64(textops.simhash64(t), far)
    assert d_near < d_far


def test_winnow_robust_to_distant_edit():
    t1 = "x" * 50 + "the common middle section here" + "y" * 50
    t2 = "a" * 50 + "the common middle section here" + "b" * 50
    f1 = set(textops.winnow_fingerprints(t1))
    f2 = set(textops.winnow_fingerprints(t2))
    assert f1 & f2, "shared region must share fingerprints"


# ------------------------------------------------------- corpus curation

@pytest.fixture(scope="module")
def curation_dir(spark):
    """Mixed-lang docs with planted PII, for the curation ops."""
    tmp = tempfile.mkdtemp(prefix="spider1_cur_")
    rows = []
    for i in range(400):
        lang = ("en", "es", "de", "fr")[i % 4]
        text = f"doc {i} body with filler words here"
        if i % 10 == 0:
            text += f" contact user{i}@example.com now"
        if i % 7 == 0:
            text += f" account 123456789{i}"
        rows.append((i, text, lang, f"src{i % 3}", len(text)))
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, "
        "n_chars long",
    ).write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
    yield tmp
    shutil.rmtree(tmp, ignore_errors=True)


def test_sample_stratified_rate_and_determinism(spark, curation_dir):
    """Hash-threshold sampling: per-stratum rates land near the pinned
    ceilings, the sample is a pure function of doc_id (identical across
    runs / parallelism), and membership matches a python md5 oracle."""
    import hashlib

    from spider_1_spark.pipeline.queries import (
        _STRATUM_HEX, _STRATUM_HEX_DEFAULT, sample_stratified,
    )

    out = {
        (r.lang, r.source): (r.n_sampled, r.min_doc_id, r.sum_chars)
        for r in sample_stratified(spark, curation_dir).collect()
    }
    # python oracle over the same fixture
    expect = {}
    for i in range(400):
        lang = ("en", "es", "de", "fr")[i % 4]
        text = f"doc {i} body with filler words here"
        if i % 10 == 0:
            text += f" contact user{i}@example.com now"
        if i % 7 == 0:
            text += f" account 123456789{i}"
        thr = _STRATUM_HEX.get(lang, _STRATUM_HEX_DEFAULT)
        if hashlib.md5(str(i).encode()).hexdigest()[:4] < thr:
            key = (lang, f"src{i % 3}")
            n, mn, sc = expect.get(key, (0, 10**9, 0))
            expect[key] = (n + 1, min(mn, i), sc + len(text))
    assert out == expect
    # en strata sample at ~2x the default rate (0.2 vs 0.1 ceilings)
    n_en = sum(v[0] for (lg, _), v in out.items() if lg == "en")
    n_other = sum(v[0] for (lg, _), v in out.items() if lg != "en")
    assert n_en > 0 and n_other > 0
    # rerun is bit-identical (no RNG state anywhere)
    again = {
        (r.lang, r.source): (r.n_sampled, r.min_doc_id, r.sum_chars)
        for r in sample_stratified(spark, curation_dir).collect()
    }
    assert again == out


def test_pii_scrub_redacts_planted_pii(spark, curation_dir):
    from spider_1_spark.pipeline.queries import text_pii_scrub

    rows = {r.doc_id: r for r in
            text_pii_scrub(spark, curation_dir).collect()}
    assert len(rows) == 400
    for i, r in rows.items():
        assert "@" not in r.scrubbed
        assert "123456789" not in r.scrubbed
        if i % 10 == 0:
            assert "<EMAIL>" in r.scrubbed
        if i % 7 == 0:
            assert "<NUM>" in r.scrubbed
        if i % 10 and i % 7:
            assert r.delta_chars == 0
        else:
            # the audit column measures the redaction delta
            orig = f"doc {i} body with filler words here"
            if i % 10 == 0:
                orig += f" contact user{i}@example.com now"
            if i % 7 == 0:
                orig += f" account 123456789{i}"
            assert r.delta_chars == len(orig) - len(r.scrubbed)


def test_text_repetition_signals_on_engineered_docs(spark):
    """Exact repetition signals on docs with known structure: a
    degenerate looping doc is dropped, a diverse doc is kept, and
    every signal matches a pure-python oracle (including the
    single-word doc whose bigram set is empty)."""
    import shutil
    import tempfile

    from spider_1_spark.pipeline.queries import text_repetition

    docs = {
        0: "spam " * 9 + "spam",              # one word repeated 10x
        1: "a b a b a b a b a b",             # all bigrams duplicated
        2: "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9",   # fully diverse
        3: "one two three four five six seven eight nine ten once",
        4: "solo",                            # no bigrams at all
        # leading/trailing tabs + newlines must NOT fabricate empty
        # tokens (they would double-count and flip keep)
        5: "\tv0 v1  v2 v3 v4 v5 v6 v7 v8 v9\n",
        6: " \t \n ",                         # whitespace-only: zeroed
    }
    tmp = tempfile.mkdtemp(prefix="spider1_rep_")
    try:
        spark.createDataFrame(
            [(i, t, "en", "src0", len(t)) for i, t in docs.items()],
            "doc_id long, text string, lang string, source string, "
            "n_chars long",
        ).write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
        got = {r.doc_id: r for r in text_repetition(spark, tmp).collect()}
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    for i, t in docs.items():
        ws = t.split()  # python split drops empty pieces, like the op
        n = len(ws)
        distinct = len(set(ws)) / n if n else 0.0
        top = max(ws.count(w) for w in set(ws)) / n if n else 0.0
        bigs = [f"{a} {b}" for a, b in zip(ws, ws[1:])]
        dup = (1 - len(set(bigs)) / len(bigs)) if bigs else 0.0
        r = got[i]
        assert r.n_words == n
        assert r.distinct_frac == round(distinct, 6)
        assert r.top_word_frac == round(top, 6)
        assert r.dup_bigram_frac == round(dup, 6)
        assert r.keep == (
            distinct >= 0.3 and top <= 0.12 and dup <= 0.08
        ), i
    # the thresholds actually separate the engineered corpus
    assert not got[0].keep and not got[1].keep
    assert got[2].keep and got[3].keep
    # whitespace edges: doc 5 scores exactly like the diverse doc 2
    # (10 real tokens, no empties) and the whitespace-only doc zeroes
    assert got[5].n_words == 10 and got[5].keep
    assert got[6].n_words == 0 and not got[6].keep
    assert got[6].distinct_frac == 0.0 and got[6].dup_bigram_frac == 0.0


def test_corpus_shard_shuffle_matches_md5_oracle(spark, curation_dir):
    """Shard assignment and within-shard order are a pure function of
    doc_id (md5 oracle), positions are contiguous 1..n per shard, and
    every shard is populated — the reproducible-global-shuffle
    contract trainers rely on."""
    import hashlib
    from collections import Counter

    from spider_1_spark.pipeline.queries import (
        SHUFFLE_SHARDS,
        corpus_shard_shuffle,
    )

    rows = corpus_shard_shuffle(spark, curation_dir).collect()
    assert len(rows) == 400
    order: dict[int, list[tuple[int, int]]] = {}
    shard_of = {}
    for i in range(400):
        h = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
        s = h % SHUFFLE_SHARDS
        shard_of[i] = s
        order.setdefault(s, []).append((h, i))
    for r in rows:
        assert r.shard == shard_of[r.doc_id]
    pos_map = {(r.shard, r.pos): r.doc_id for r in rows}
    for s, lst in order.items():
        lst.sort()
        for p, (_, i) in enumerate(lst, start=1):
            assert pos_map[(s, p)] == i
    counts = Counter(r.shard for r in rows)
    assert len(counts) == SHUFFLE_SHARDS
    for s, lst in order.items():
        assert counts[s] == len(lst)


def _collect_quantized(spark, sf_dir):
    """Reassemble the exploded (vec_id, pos, code) rows back into
    per-vector code arrays (the r4 result grain — VERDICT r3 item 1)."""
    from spider_1_spark.pipeline.queries import emb_quantize_int8

    out = {}
    for r in emb_quantize_int8(spark, sf_dir).collect():
        rec = out.setdefault(r.vec_id, {"scale": r.scale, "codes": {}})
        assert rec["scale"] == r.scale  # scale constant within a vector
        rec["codes"][r.pos] = r.code
    for rec in out.values():
        codes = rec["codes"]
        assert sorted(codes) == list(range(len(codes)))  # pos dense, 0-based
        rec["codes"] = [codes[i] for i in range(len(codes))]
    return out


def test_emb_quantize_int8_reconstruction_bound(spark, sf_dir):
    """Codes stay in [-127, 127], zero vectors degrade to scale 0, and
    dequantized values reconstruct the input within the symmetric-
    quantization bound (0.5 / scale per coordinate) — checked against
    the raw vectors with numpy."""
    import numpy as np
    import pyarrow.parquet as pq

    out = _collect_quantized(spark, sf_dir)
    raw = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pylist()
    assert len(out) == len(raw)
    for rec in raw:
        r = out[rec["vec_id"]]
        v = np.asarray(rec["embedding"], dtype=np.float64)
        codes = np.asarray(r["codes"], dtype=np.int64)
        assert len(codes) == len(v)
        assert codes.min() >= -127 and codes.max() <= 127
        if not np.any(v):
            assert r["scale"] == 0.0 and not codes.any()
            continue
        assert r["scale"] > 0
        err = np.abs(v - codes / r["scale"])
        assert err.max() <= 0.5 / r["scale"] + 1e-9


def test_emb_quantize_int8_zero_and_large_vectors(spark):
    """The degradation paths the sf fixture (unit-norm vectors) never
    exercises: an all-zero vector must emit scale 0 + zero codes, and
    a large-magnitude vector must keep an exact (unrounded) scale so
    codes/scale dequantizes — a scale rounded to 9 decimals would
    collapse to 0 for max|x| >= ~1e10."""
    import shutil
    import tempfile

    rows = [
        (0, [0.0] * 4, 0),
        (1, [1.0e12, -5.0e11, 0.0, 2.5e11], 1),
        (2, [0.5, -0.25, 0.125, -1.0], 2),
    ]
    tmp = tempfile.mkdtemp(prefix="spider1_qnt_")
    try:
        spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        ).write.mode("overwrite").parquet(f"{tmp}/embeddings.parquet")
        got = _collect_quantized(spark, tmp)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    assert got[0]["scale"] == 0.0 and got[0]["codes"] == [0, 0, 0, 0]
    big = got[1]
    # -5e11/1e12 lands exactly on the .5 rounding boundary in reals,
    # so that code is pinned only through the dequant bound below
    assert big["scale"] > 0
    assert big["codes"][0] == 127 and big["codes"][2] == 0
    # dequantization round-trips within the bound even at 1e12 scale
    # (compare against the float32-stored values; -5e11/1e12 sits ON
    # the .5 tie, so the bound is met with relative slack only)
    import numpy as np

    for v, c in zip(np.asarray(rows[1][1], dtype=np.float32), big["codes"]):
        assert abs(float(v) - c / big["scale"]) <= 0.5 / big["scale"] * (1 + 1e-6)
    assert got[2]["codes"] == [64, -32, 16, -127]


def test_length_histogram_totals(spark, curation_dir):
    from spider_1_spark.pipeline.queries import docs_length_histogram

    out = docs_length_histogram(spark, curation_dir).collect()
    assert sum(r.n_docs for r in out) == 400
    for r in out:
        assert r.bin * 100 <= r.min_chars <= r.max_chars < (r.bin + 1) * 100
        assert r.n_docs * r.min_chars <= r.sum_chars <= r.n_docs * r.max_chars


def test_docs_quantiles_match_numpy_linear(spark, curation_dir):
    """The CDF-readoff quantiles equal numpy's type-7 'linear'
    definition per language — the independent oracle for the exact
    interpolation (the DuckDB quantile_cont lockstep is covered by
    the entry-contract test)."""
    from spider_1_spark.pipeline.queries import _Q_PS, docs_quantiles

    out = {r.lang: r for r in docs_quantiles(spark, curation_dir).collect()}
    lens: dict[str, list[int]] = {}
    for i in range(400):
        lang = ("en", "es", "de", "fr")[i % 4]
        text = f"doc {i} body with filler words here"
        if i % 10 == 0:
            text += f" contact user{i}@example.com now"
        if i % 7 == 0:
            text += f" account 123456789{i}"
        lens.setdefault(lang, []).append(len(text))
    assert set(out) == set(lens)
    for lang, vals in lens.items():
        r = out[lang]
        assert r.n == len(vals)
        for p in _Q_PS:
            got = getattr(r, f"p{int(p * 100)}")
            want = round(float(np.quantile(vals, p, method="linear")), 4)
            assert got == pytest.approx(want, abs=1e-9), (lang, p)


def test_dedup_queries_release_their_caches(spark, sf_dir):
    """The dedup ops persist wide intermediates (minhash signatures,
    exploded hash blocks, embedding band buckets) that several DAG
    branches re-read; they must materialize the result and unpersist
    those, or a session running the full 75-key registry accumulates
    one orphaned cache per dedup call.  Contract: after a call only
    the localCheckpoint'ed RESULT may hold blocks (the cacheManager
    gains no entry), and releasing the result frame returns executor
    storage to its pre-call level."""
    from spider_1_spark.engine.crawler import _release_cached
    from spider_1_spark.pipeline.queries import (
        dedup_embedding_cosine,
        dedup_minhash_lsh,
        dedup_ngram_jaccard,
        dedup_simhash,
    )

    sc = spark.sparkContext._jsc.sc()
    cm = spark._jsparkSession.sharedState().cacheManager()
    cm_empty_before = cm.isEmpty()
    for fn in (dedup_minhash_lsh, dedup_ngram_jaccard, dedup_simhash,
               dedup_embedding_cosine):
        before = len(sc.getRDDStorageInfo())
        df = fn(spark, sf_dir)
        df.collect()
        if cm_empty_before:
            assert cm.isEmpty(), f"{fn.__name__} left a cacheManager entry"
        _release_cached(df)
        assert len(sc.getRDDStorageInfo()) <= before, fn.__name__


def test_decontaminate_ngram_matches_python_oracle(spark, sf_dir):
    """decontaminate_ngram vs a direct Python transcription of its
    contract (distinct word 5-grams, bench = doc_id % 17 == 0, grams
    in > DECON_MAX_BENCH_DF bench docs dropped, contaminated when one
    bench doc shares >= DECON_MIN_SHARED grams).  The module fixture
    plants an exact dup (doc 20 == doc 0, and 0 is a bench id), so
    the result is non-vacuous by construction."""
    from collections import Counter

    from spider_1_spark.pipeline.queries import (
        DECON_MAX_BENCH_DF,
        DECON_MIN_SHARED,
        DECON_N,
        decontaminate_ngram,
    )

    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }

    def grams(text):
        w = text.split(" ")
        return {
            " ".join(w[i:i + DECON_N])
            for i in range(len(w) - DECON_N + 1)
        } if len(w) >= DECON_N else set()

    bench = {i: grams(t) for i, t in docs.items() if i % 17 == 0}
    df = Counter(g for gs in bench.values() for g in gs)
    bench = {
        i: {g for g in gs if df[g] <= DECON_MAX_BENCH_DF}
        for i, gs in bench.items()
    }
    want = {}
    for i, t in docs.items():
        if i % 17 == 0:
            continue
        shared = [len(grams(t) & gs) for gs in bench.values()]
        hits = [s for s in shared if s >= DECON_MIN_SHARED]
        if hits:
            want[i] = (max(hits), len(hits))
    got = {
        r.doc_id: (r.max_shared, r.n_bench_docs)
        for r in decontaminate_ngram(spark, sf_dir).collect()
    }
    assert got == want
    assert 20 in got  # the planted exact dup of bench doc 0


def test_decontaminate_ngram_df_cap_drops_boilerplate(spark):
    """Grams present in more than DECON_MAX_BENCH_DF benchmark docs
    must carry no contamination evidence (they are boilerplate AND the
    hot join keys).  Fixture: 12 bench docs (> cap) share one
    boilerplate sentence that a corpus doc repeats verbatim — not
    flagged; a second corpus doc overlaps ONE bench doc on 3 distinct
    rare grams — flagged."""
    import tempfile

    from spider_1_spark.pipeline.queries import decontaminate_ngram

    boiler = "this content is provided as is without any warranty"
    rare = "zebra quark mango delta onyx pivot lunar"  # 3 x 5-grams
    rows = []
    for k in range(12):  # bench ids: multiples of 17, all > cap share
        rows.append((17 * k, f"{boiler} bench variant {k}"))
    rows[3] = (17 * 3, f"{boiler} {rare}")  # one bench doc adds rare
    rows.append((1, f"{boiler} corpus echo one"))   # boiler only
    rows.append((2, f"prefix words {rare}"))        # rare overlap
    tmp = tempfile.mkdtemp(prefix="spider1_decon_")
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(f"{tmp}/documents.parquet")
    got = {
        r.doc_id: (r.max_shared, r.n_bench_docs)
        for r in decontaminate_ngram(spark, tmp).collect()
    }
    assert 1 not in got, "boilerplate-only overlap must be capped away"
    assert got == {2: (3, 1)}


def test_multimodal_resize_matches_pure_python_oracle(spark, sf_dir):
    """Full per-row oracle: re-run decode + resize kernels single-
    process over the SAME fixture parquet and compare every checksum
    — the Spark plumbing (binary scan, repartition, Arrow batches)
    must be a pure pass-through around the kernels."""
    import hashlib

    import pyarrow.parquet as pq

    from spider_1_spark.functions.codecs import decode
    from spider_1_spark.functions.imageops import (
        resize_bilinear,
        resize_nearest,
    )
    from spider_1_spark.pipeline.queries import (
        MM_RESIZE_HW,
        _mm_fixture_path,
        multimodal_resize,
    )

    rows = multimodal_resize(spark, sf_dir).collect()
    tbl = pq.read_table(_mm_fixture_path(spark)).to_pylist()
    expect = {}
    for rec in tbl:
        if rec["declared_fmt"] == "jpeg":
            expect[rec["image_id"]] = ("unsupported_codec", None, None)
            continue
        rgb, _ = decode(bytes(rec["bytes"]))
        nn = resize_nearest(rgb, MM_RESIZE_HW, MM_RESIZE_HW)
        bil = resize_bilinear(rgb, MM_RESIZE_HW, MM_RESIZE_HW)
        cks = int.from_bytes(
            hashlib.blake2b(nn.tobytes(), digest_size=8).digest(),
            "big", signed=True,
        )
        expect[rec["image_id"]] = ("ok", cks, round(float(bil.mean()), 4))
    assert len(rows) == len(expect)
    for r in rows:
        st, cks, bm = expect[r.image_id]
        assert r.status == st
        assert r.nn_checksum == cks
        assert r.bil_mean == bm


def test_multimodal_frame_sample_matches_pure_python_oracle(spark, sf_dir):
    import pyarrow.parquet as pq

    from spider_1_spark.functions.codecs import decode
    from spider_1_spark.functions.imageops import (
        ContainerError,
        decode_video,
    )
    from spider_1_spark.functions.phash import dhash64
    from spider_1_spark.pipeline.queries import (
        VID_STRIDE,
        _video_fixture_path,
        multimodal_frame_sample,
    )

    rows = multimodal_frame_sample(spark, sf_dir).collect()
    tbl = pq.read_table(_video_fixture_path(spark)).to_pylist()
    expect = set()
    for rec in tbl:
        try:
            frames = decode_video(bytes(rec["bytes"]))
        except ContainerError:
            expect.add((rec["video_id"], "container_error",
                        None, None, None, None, None))
            continue
        for idx in range(0, len(frames), VID_STRIDE):
            rgb, _ = decode(frames[idx])
            try:
                ph = dhash64(rgb)
            except ValueError:
                expect.add((rec["video_id"], "frame_too_small", idx,
                            len(frames), rgb.shape[1], rgb.shape[0],
                            None))
                continue
            expect.add((rec["video_id"], "ok", idx, len(frames),
                        rgb.shape[1], rgb.shape[0], ph))
    got = {(r.video_id, r.status, r.frame_idx, r.n_frames, r.w, r.h,
            r.frame_phash) for r in rows}
    assert got == expect
    # the too-small-frame degradation path is visibly exercised
    assert ("vid-tiny", "frame_too_small", 0, 1, 4, 4, None) in got
    # stride sampling is visibly exercised: clips with >3 frames
    # contribute >1 row and skipped indices are absent
    vids = [r for r in rows if r.video_id == "vid04" and r.status == "ok"]
    assert sorted(r.frame_idx for r in vids) == [0, 3, 6, 9]


def test_multimodal_audio_features_match_numpy(spark, sf_dir):
    import pyarrow.parquet as pq

    from spider_1_spark.functions.imageops import (
        ContainerError,
        decode_pcm,
        pcm_features,
    )
    from spider_1_spark.pipeline.queries import (
        _audio_fixture_path,
        multimodal_audio_features,
    )

    rows = multimodal_audio_features(spark, sf_dir).collect()
    tbl = pq.read_table(_audio_fixture_path(spark)).to_pylist()
    expect = {}
    for rec in tbl:
        try:
            rate, samples = decode_pcm(bytes(rec["bytes"]))
        except ContainerError:
            expect[rec["clip_id"]] = None
            continue
        rms, zcr = pcm_features(samples)
        expect[rec["clip_id"]] = (
            rate, samples.size, samples.size * 1000 // rate,
            round(rms, 4), zcr,
        )
    assert len(rows) == len(expect)
    for r in rows:
        e = expect[r.clip_id]
        if e is None:
            assert r.status == "container_error" and r.rms is None
        else:
            assert r.status == "ok"
            assert (r.rate, r.n_samples, r.duration_ms, r.rms, r.zcr) == e


def test_corpus_pack_sequences_tiles_each_shard(spark, sf_dir):
    """Packing invariants per shard: start offsets tile the
    concatenated token stream exactly (sorted starts are the running
    sum of lengths, no gaps/overlaps), block ids match the
    concatenate-then-chunk arithmetic, and the assignment is a pure
    function of doc_id (re-running yields identical rows)."""
    from spider_1_spark.pipeline.queries import (
        PACK_BUDGET,
        corpus_pack_sequences,
    )

    rows = corpus_pack_sequences(spark, sf_dir).collect()
    by_shard: dict[int, list] = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r)
    assert sum(len(v) for v in by_shard.values()) == len(rows)
    for shard, rs in by_shard.items():
        rs.sort(key=lambda r: r.start_tok)
        acc = 0
        for r in rs:
            assert r.start_tok == acc  # contiguous, no gaps/overlaps
            acc += r.n_tok
            assert r.first_block == r.start_tok // PACK_BUDGET
            assert r.last_block == (
                r.start_tok + max(r.n_tok, 1) - 1
            ) // PACK_BUDGET
            assert r.first_block <= r.last_block
    again = {
        r.doc_id: (r.shard, r.start_tok)
        for r in corpus_pack_sequences(spark, sf_dir).collect()
    }
    assert again == {r.doc_id: (r.shard, r.start_tok) for r in rows}


@settings(max_examples=6, deadline=None)
@given(st.sampled_from([1, 2, 3, 8, 16]), st.sampled_from([1, 7, 64, 1024]))
def test_corpus_pack_sequences_matches_python_packer(
    spark, sf_dir, shards, budget
):
    """Full independent oracle, not just invariants (VERDICT r4 item
    7): a pure-python packer — pyarrow read, regex token count, md5
    shard hash, per-shard (h, doc_id) sort, running offset — must
    reproduce every row bit-for-bit, for RANDOM (PACK_SHARDS,
    PACK_BUDGET) including the degenerate single-shard and
    1-token-block corners.  The module constants are patched at call
    time (the DF builder reads them per invocation)."""
    import hashlib
    import re

    import pyarrow.parquet as pq

    from spider_1_spark.pipeline import queries as pqm

    ws = re.compile(r"[ \t\n\r\f\x0b]+")
    tbl = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    per_shard: dict[int, list] = {}
    for doc_id, text in zip(
        tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist()
    ):
        n_tok = sum(1 for t in ws.split(text) if t)
        h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16)
        per_shard.setdefault(h % shards, []).append((h, doc_id, n_tok))
    expect = {}
    for shard, docs in per_shard.items():
        acc = 0
        for h, doc_id, n_tok in sorted(docs):
            expect[doc_id] = (
                shard, n_tok, acc, acc // budget,
                (acc + max(n_tok, 1) - 1) // budget,
            )
            acc += n_tok

    old = pqm.PACK_SHARDS, pqm.PACK_BUDGET
    pqm.PACK_SHARDS, pqm.PACK_BUDGET = shards, budget
    try:
        got = {
            r.doc_id: (r.shard, r.n_tok, r.start_tok, r.first_block,
                       r.last_block)
            for r in pqm.corpus_pack_sequences(spark, sf_dir).collect()
        }
    finally:
        pqm.PACK_SHARDS, pqm.PACK_BUDGET = old
    assert got == expect


def test_docs_quantiles_approx_rank_contract(spark, sf_dir):
    """The GK-sketch contract the rows-only key rests on: every
    approximate quantile is an actual n_chars value of its language
    whose rank is within n/accuracy of the exact target rank."""
    import pyarrow.parquet as pq

    from spider_1_spark.pipeline.queries import (
        _QA_ACCURACY,
        docs_quantiles_approx,
    )

    docs = pq.read_table(f"{sf_dir}/documents.parquet").to_pylist()
    by_lang: dict[str, list] = {}
    for d in docs:
        by_lang.setdefault(d["lang"], []).append(d["n_chars"])
    for vals in by_lang.values():
        vals.sort()
    out = docs_quantiles_approx(spark, sf_dir).collect()
    assert len(out) == 3 * len(by_lang)
    for r in out:
        vals = by_lang[r.lang]
        n = len(vals)
        assert r.approx_n_chars in vals
        # all ranks (1-based) where this value occurs
        lo = vals.index(r.approx_n_chars) + 1
        hi = n - vals[::-1].index(r.approx_n_chars)
        target = r.pct / 100.0 * n
        eps = max(1.0, n / _QA_ACCURACY)  # floor/ceil slack at tiny n
        assert lo - eps <= target + eps and hi + eps >= target - eps
