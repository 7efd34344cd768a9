"""Training-data pipeline operators over documents/embeddings.

The data-curation surface a 100 TB crawl corpus needs (task brief §
"beyond the reference's own operators"): deduplication (exact,
MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine), similarity
search (brute-force + LSH-bucketed ANN), text analysis (language-ID,
quality scoring, token counting, winnowing fingerprints), and the
multimodal binary-column plumbing.

Design rules (same as the crawl engine):
  * every Python crossing is Arrow-vectorized (pandas_udf /
    mapInPandas) — no per-row Python UDFs;
  * all hashing is seeded + process-stable (pipeline/textops.py), so
    results are identical at any parallelism — LSH bucket joins
    produce the same pairs on 4 cores or 4000 executors;
  * blocked self-joins (LSH bands / simhash blocks / label blocking)
    instead of O(n²) cross-joins — the only shapes that survive 10^9
    documents; brute-force variants exist as small-side baselines.

SQL-checkable ops are in PIPE_SQL (DuckDB oracle); the rest are
rows-only for the driver with full pytest oracles in
tests/test_pipeline.py (pure-python reference via the SAME textops
primitives + hand-computed small cases).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from spider_1_spark.pipeline import textops


def _docs(spark, sf):
    return spark.read.parquet(f"{sf}/documents.parquet")


def _emb(spark, sf):
    return spark.read.parquet(f"{sf}/embeddings.parquet")


def _materialized(result: DataFrame, *cached: DataFrame) -> DataFrame:
    """Eagerly materialize ``result``, then release the ``cached``
    intermediates.

    The persist() sites in this module cache wide intermediates (LSH
    signatures, exploded hash blocks, band buckets) that several
    branches of one query's DAG re-read.  Left cached they outlive
    the query for the whole session — Spark's cacheManager holds the
    logical plan, so a long-lived driver running the full registry
    accumulates one orphaned cache per dedup call.  localCheckpoint
    pins only the (much smaller) candidate-pair RESULT, and the
    ContextCleaner releases those blocks once the caller drops the
    returned frame."""
    try:
        out = result.localCheckpoint(eager=True)
    finally:
        # release even if materialization throws — a leaked cache
        # lives for the session (ADVICE r3, applied module-wide here)
        for c in cached:
            c.unpersist()
    return out


# ------------------------------------------------------------ dedup: exact

def dedup_exact(spark, sf):
    """Exact dedup by full text: first doc_id wins per group."""
    d = _docs(spark, sf)
    return d.groupBy("text").agg(
        F.min("doc_id").alias("keep_id"), F.count("*").alias("n_copies")
    ).select("keep_id", "n_copies")


def dedup_exact_hash(spark, sf):
    """Scale path: group by sha256(text) — the shuffle key is 32 bytes
    instead of the document body (what you actually do at 100 TB)."""
    d = _docs(spark, sf)
    return (
        d.groupBy(F.sha2("text", 256).alias("text_sha"))
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("n_copies"))
    )


def dedup_keep_best(spark, sf):
    """Canonical-document SELECTION per exact-content group — which
    copy survives dedup (dedup_exact picks min id; real curation keeps
    the highest-QUALITY copy).  Group key = sha256 of the normalized
    text (lowercase, trimmed, whitespace collapsed — so re-encoded /
    re-wrapped mirrors of one page collapse); winner = max_by over the
    ordering struct (n_chars, -doc_id): longest copy wins, ties to the
    smallest doc_id, fully deterministic because doc_id is unique.

    Scale shape: ONE aggregate with map-side partial aggregation —
    each task reduces to a single winner per group BEFORE the
    shuffle, so the exchange carries one candidate per group per
    task and a 10^9-copy boilerplate group costs O(1) aggregation
    state.  Physical note (from the .explain audit): max_by's struct
    buffer is not hash-aggregable, so Spark plans a SortAggregate —
    the sort is by GROUP KEY within each task (then a sequential
    fold), not a per-group sort of copies; the decisive difference
    from the window/row_number formulation (topk_per_group) remains
    that a window shuffles and sorts EVERY copy of every document
    with no map-side reduction."""
    d = _docs(spark, sf)
    # explicit whitespace class, NOT \s: Java's \s includes \x0B
    # (vertical tab) while RE2's does not — the one corner where the
    # two engines' \s disagree.  The class below IS Java's \s, spelled
    # so RE2 matches it identically (\x0B is a valid hex escape in
    # both), keeping Spark behavior unchanged and the oracle exact on
    # any input.
    norm = F.regexp_replace(
        F.lower(F.trim(F.col("text"))), r"[ \t\n\r\f\x0B]+", " "
    )
    best = d.groupBy(F.sha2(norm, 256).alias("grp")).agg(
        F.max_by(
            F.struct(
                F.col("doc_id").alias("doc_id"),
                F.col("n_chars").alias("n_chars"),
            ),
            F.struct(F.col("n_chars"), (-F.col("doc_id")).alias("neg_id")),
        ).alias("b"),
        F.count("*").alias("n_copies"),
    )
    return best.select(
        "grp",
        F.col("b.doc_id").alias("keep_id"),
        F.col("b.n_chars").alias("keep_chars"),
        "n_copies",
    )


# ---------------------------------------------------- dedup: minhash + LSH

SIG_N, SIG_BANDS = 64, 16


def minhash_signatures(docs: DataFrame) -> DataFrame:
    """doc_id -> minhash signature + shingle set (Arrow-batched)."""
    a, b = textops.minhash_params(SIG_N)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sigs, shs = [], []
            for text in pdf["text"]:
                sh = textops.shingle_hashes(text)
                sig = textops.minhash_signature(sh, a, b)
                sigs.append([int(x) for x in sig])  # < 2^61: int64-safe
                shs.append([int(x) - (1 << 64 if x >= 1 << 63 else 0)
                            for x in sh])
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "sig": sigs, "shingles": shs}
            )

    return docs.select("doc_id", "text").mapInPandas(
        gen, "doc_id long, sig array<long>, shingles array<long>"
    )


# a band value shared by b documents emits b^2 join rows; real corpora
# have degenerate bands (empty/boilerplate shingles), so buckets above
# this cap are DROPPED before the self-join — identical docs are still
# caught by dedup_exact_hash, and near-dup recall survives via the
# doc's other 15 bands.  The cap bounds the worst bucket's pair
# blow-up to cap^2 regardless of corpus shape (the property that keeps
# LSH dedup alive on a boilerplate-heavy 10^9-doc crawl).
LSH_BUCKET_CAP = 512


def _lsh_candidate_pairs(
    sig_df: DataFrame, bucket_cap: int = LSH_BUCKET_CAP
) -> DataFrame:
    """Band-bucket self-join: pairs sharing >= 1 LSH band.

    Buckets with more than ``bucket_cap`` members are dropped before
    the join (see LSH_BUCKET_CAP); ``lsh_dropped_buckets`` reports what
    a given corpus loses to the cap.  The pair dedup is a 2-column
    aggregate (doc_a, doc_b only cross the shuffle, never band columns).
    """
    b = _band_rows(sig_df)
    ok = (
        b.groupBy("band_idx", "band_hash")
        .agg(F.count("*").alias("_bn"))
        .filter(F.col("_bn") <= bucket_cap)
        .select("band_idx", "band_hash")
    )
    b = b.join(ok, ["band_idx", "band_hash"], "left_semi")
    lhs = b.select(
        F.col("doc_id").alias("doc_a"), "band_idx", "band_hash"
    )
    rhs = b.select(
        F.col("doc_id").alias("doc_b"), "band_idx", "band_hash"
    )
    return (
        lhs.join(rhs, ["band_idx", "band_hash"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def _band_rows(sig_df: DataFrame) -> DataFrame:
    """(doc_id, band_idx, band_hash) rows from minhash signatures."""

    def bands(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, sig in zip(pdf["doc_id"], pdf["sig"]):
                for band_idx, bh in enumerate(
                    textops.band_hashes(np.array(sig, dtype=np.uint64),
                                        SIG_BANDS)
                ):
                    rows.append(
                        (doc_id, band_idx,
                         bh - (1 << 64 if bh >= 1 << 63 else 0))
                    )
            if rows:
                yield pd.DataFrame(
                    rows, columns=["doc_id", "band_idx", "band_hash"]
                )

    return sig_df.mapInPandas(
        bands, "doc_id long, band_idx int, band_hash long"
    )


def lsh_dropped_buckets(
    sig_df: DataFrame, bucket_cap: int = LSH_BUCKET_CAP
) -> DataFrame:
    """Observability for the bucket cap: the (band_idx, band_hash,
    n_docs) buckets the cap drops — run it when tuning the cap for a
    new corpus (a dropped bucket is recall silently traded for a
    bounded join, worth logging at scale)."""
    return (
        _band_rows(sig_df)
        .groupBy("band_idx", "band_hash")
        .agg(F.count("*").alias("n_docs"))
        .filter(F.col("n_docs") > bucket_cap)
    )


def dedup_minhash_lsh(spark, sf):
    """MinHash(64) + 16-band LSH near-dup pairs, est. Jaccard >= 0.5.

    shingle -> minhash -> band -> bucket-join; the signature-agreement
    estimate avoids re-reading document bodies for the verify step.
    """
    sig = minhash_signatures(_docs(spark, sf)).persist()
    pairs = _lsh_candidate_pairs(sig)
    sa = sig.select(F.col("doc_id").alias("doc_a"), F.col("sig").alias("sig_a"))
    sb = sig.select(F.col("doc_id").alias("doc_b"), F.col("sig").alias("sig_b"))
    est = (
        F.aggregate(
            F.zip_with(
                "sig_a", "sig_b",
                lambda x, y: F.when(x == y, 1.0).otherwise(0.0),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        / SIG_N
    )
    return _materialized(
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("est_jaccard", F.round(est, 4))
        .filter(F.col("est_jaccard") >= 0.5)
        .select("doc_a", "doc_b", "est_jaccard"),
        sig,
    )


def dedup_ngram_jaccard(spark, sf):
    """LSH candidates verified with EXACT shingle-set Jaccard >= 0.3
    (the two-phase dedup: cheap recall stage + exact precision stage)."""
    sig = minhash_signatures(_docs(spark, sf)).persist()
    pairs = _lsh_candidate_pairs(sig)
    sa = sig.select(F.col("doc_id").alias("doc_a"),
                    F.col("shingles").alias("sh_a"))
    sb = sig.select(F.col("doc_id").alias("doc_b"),
                    F.col("shingles").alias("sh_b"))
    joined = pairs.join(sa, "doc_a").join(sb, "doc_b")

    @F.pandas_udf(T.DoubleType())
    def jac_udf(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series(
            [
                textops.jaccard(
                    np.sort(np.array(x, dtype=np.int64).astype(np.uint64)),
                    np.sort(np.array(y, dtype=np.int64).astype(np.uint64)),
                )
                for x, y in zip(a, b)
            ]
        )

    return _materialized(
        joined.withColumn("jaccard", F.round(jac_udf("sh_a", "sh_b"), 4))
        .filter(F.col("jaccard") >= 0.3)
        .select("doc_a", "doc_b", "jaccard"),
        sig,
    )


# --------------------------------------------------------- dedup: simhash

@F.pandas_udf(T.LongType())
def simhash_udf(texts: pd.Series) -> pd.Series:
    return pd.Series([textops.simhash64(t) for t in texts], dtype="Int64")


# same degenerate-bucket failure mode as LSH_BUCKET_CAP: a 16-bit
# block value shared by b documents (boilerplate-heavy corpora at 10^9
# docs WILL have hot blocks) emits b² join rows before .distinct() —
# blocks above the cap are dropped before the self-join, bounding the
# worst block's blow-up to cap² regardless of corpus shape.  Identical
# docs are still caught by dedup_exact_hash; a near-dup pair losing a
# hot block still surfaces via its 3 other blocks.
SIMHASH_BLOCK_CAP = 512


def _blocks64(df: DataFrame, id_col: str, hash_col: str) -> DataFrame:
    """(_id, _h, block_idx, block_val): 4 x 16-bit pigeonhole rows of
    any 64-bit hash column — shared by simhash (text) and phash
    (image) near-dup blocking."""
    return df.select(
        F.col(id_col).alias("_id"),
        F.col(hash_col).alias("_h"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("block_idx"),
                        F.shiftrightunsigned(hash_col, 16 * i)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("block_val"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("blk"),
    ).select("_id", "_h", "blk.block_idx", "blk.block_val")


def _hamming64_pairs(
    hashed: DataFrame,
    id_col: str,
    hash_col: str,
    out_a: str,
    out_b: str,
    block_cap: int,
    max_dist: int,
) -> DataFrame:
    """Near-dup pairs of 64-bit hashes, Hamming <= ``max_dist``,
    capped pigeonhole blocking.

    4 x 16-bit blocks — a pair misses every block only if >= 4 blocks
    differ, i.e. guaranteed recall for distance <= 3; 4..6 found with
    high probability.  Exact verify via bit_count(xor).  Blocks with
    more than ``block_cap`` members are dropped before the self-join
    (bounding each block's join at cap²; the *_dropped_blocks helpers
    report what a corpus loses to the cap)."""
    # persisted: the cap aggregate, its semi-join probe, and both
    # self-join sides read this frame — uncached, the per-row hash
    # UDF would recompute ~4x over the corpus (same pattern as the
    # minhash signature persist above)
    blocks = _blocks64(hashed, id_col, hash_col).persist()
    ok = (
        blocks.groupBy("block_idx", "block_val")
        .agg(F.count("*").alias("_bn"))
        .filter(F.col("_bn") <= block_cap)
        .select("block_idx", "block_val")
    )
    # keep `blocks` bound to the PERSISTED frame (unpersisting a
    # derived frame would not drop the ancestor's cacheManager entry)
    kept = blocks.join(ok, ["block_idx", "block_val"], "left_semi")
    lhs = kept.select(
        F.col("_id").alias(out_a), F.col("_h").alias("_ha"),
        "block_idx", "block_val",
    )
    rhs = kept.select(
        F.col("_id").alias(out_b), F.col("_h").alias("_hb"),
        "block_idx", "block_val",
    )
    return _materialized(
        lhs.join(rhs, ["block_idx", "block_val"])
        .filter(F.col(out_a) < F.col(out_b))
        .select(out_a, out_b, "_ha", "_hb")
        .distinct()
        .withColumn(
            "hamming",
            F.bit_count(F.expr("_ha ^ _hb")).cast("int"),
        )
        .filter(F.col("hamming") <= max_dist)
        .select(out_a, out_b, "hamming"),
        blocks,
    )


def _simhash_pairs(
    docs: DataFrame, block_cap: int = SIMHASH_BLOCK_CAP
) -> DataFrame:
    """SimHash near-dup pairs, Hamming distance <= 6 (see
    _hamming64_pairs for the blocking/cap contract)."""
    d = docs.select("doc_id", simhash_udf(F.col("text")).alias("sh"))
    return _hamming64_pairs(d, "doc_id", "sh", "doc_a", "doc_b",
                            block_cap, 6)


def simhash_dropped_blocks(
    docs: DataFrame, block_cap: int = SIMHASH_BLOCK_CAP
) -> DataFrame:
    """Observability for the block cap: the (block_idx, block_val,
    n_docs) blocks the cap drops — same pattern as lsh_dropped_buckets
    (a dropped block is recall silently traded for a bounded join)."""
    d = docs.select("doc_id", simhash_udf(F.col("text")).alias("sh"))
    return (
        _blocks64(d, "doc_id", "sh")
        .groupBy("block_idx", "block_val")
        .agg(F.count("*").alias("n_docs"))
        .filter(F.col("n_docs") > block_cap)
    )


def dedup_simhash(spark, sf):
    """SimHash near-dup pairs with Hamming distance <= 6 (capped
    pigeonhole blocking — see _simhash_pairs)."""
    return _simhash_pairs(_docs(spark, sf))


# ------------------------------------------- dedup: embedding cosine pairs

def _cosine(a_col: str, b_col: str):
    da = F.col(a_col).cast("array<double>")
    db = F.col(b_col).cast("array<double>")
    dot = F.aggregate(
        F.zip_with(da, db, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
    )
    na = F.sqrt(
        F.aggregate(F.zip_with(da, da, lambda x, y: x * y), F.lit(0.0),
                    lambda a, x: a + x)
    )
    nb = F.sqrt(
        F.aggregate(F.zip_with(db, db, lambda x, y: x * y), F.lit(0.0),
                    lambda a, x: a + x)
    )
    return dot / (na * nb)


# Rademacher-plane LSH for the embedding dedup blocking: ``bands``
# bands of ``bits`` sign bits each, candidate pair = same bucket in ANY
# band (band-OR for recall).  The projection is INTEGER-exact on both
# engines — embeddings are quantized with floor(float64(x) * 1000)
# (identical IEEE ops in Spark/numpy and DuckDB) and dotted with ±1
# plane entries, so the sign bits (and hence the buckets and the pair
# set) are bit-identical between the Spark op and its SQL oracle; a
# float hyperplane projection could flip a near-zero sign between
# engines and break the driver's value-hash compare.
#
# Both knobs are ARGUMENTS threaded through the Spark op and the
# generated SQL oracle in lockstep (VERDICT r2 item 3: a compile-time
# constant left 64 buckets/band at any corpus size — ~10^14 candidate
# pairs per band at 10^9 rows).  At 10^9 rows raise ``bits`` so the
# expected bucket population n/2^bits stays executor-memory bounded;
# EMB_BUCKET_CAP bounds the damage of skewed buckets the expectation
# misses (same pattern as LSH_BUCKET_CAP / SIMHASH_BLOCK_CAP, with
# emb_dropped_buckets as the observability hook).
EMB_BANDS, EMB_BITS = 8, 6
EMB_BUCKET_CAP = 4096


def _emb_planes(bands: int = EMB_BANDS, bits: int = EMB_BITS) -> np.ndarray:
    rng = np.random.Generator(np.random.PCG64(17))
    return rng.choice(np.array([-1.0, 1.0]), size=(bands * bits, 64))


def _emb_band_buckets(
    e: DataFrame, bands: int = EMB_BANDS, bits: int = EMB_BITS
) -> DataFrame:
    """(vec_id, band_idx, bucket) rows — ``bands`` rows per vector."""
    planes = _emb_planes(bands, bits).astype(np.int64)

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def buckets_udf(embs: pd.Series) -> pd.Series:
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in embs])
        q = np.floor(mat * 1000.0).astype(np.int64)
        b = (q @ planes.T) > 0  # (n, bands*bits)
        out = np.zeros((len(embs), bands), dtype=np.int32)
        for band in range(bands):
            for i in range(bits):
                out[:, band] |= b[:, band * bits + i].astype(np.int32) << i
        return pd.Series(list(out))

    return e.select(
        "vec_id",
        F.posexplode(buckets_udf("embedding")).alias("band_idx", "bucket"),
    )


def emb_dropped_buckets(
    e: DataFrame,
    bands: int = EMB_BANDS,
    bits: int = EMB_BITS,
    bucket_cap: int = EMB_BUCKET_CAP,
) -> DataFrame:
    """Observability for the bucket cap: (band_idx, bucket, n_vecs)
    buckets the cap drops — run when tuning bands/bits for a corpus."""
    return (
        _emb_band_buckets(e, bands, bits)
        .groupBy("band_idx", "bucket")
        .agg(F.count("*").alias("n_vecs"))
        .filter(F.col("n_vecs") > bucket_cap)
    )


def dedup_embedding_cosine(
    spark,
    sf,
    bands: int = EMB_BANDS,
    bits: int = EMB_BITS,
    bucket_cap: int = EMB_BUCKET_CAP,
):
    """Embedding near-dup pairs, cosine >= 0.4, LSH-bucket blocked.

    Candidate pairs share a Rademacher-LSH band bucket (band-OR over
    ``bands`` bands — see _emb_planes); only candidates compute the
    exact cosine.  The join is O(sum of bucket²); buckets above
    ``bucket_cap`` are dropped before the self-join (skew guard).
    The exact-but-unscalable label-blocked variant survives as
    dedup_embedding_label_blocked, the pytest recall yardstick."""
    e = _emb(spark, sf)
    # persisted: cap aggregate + semi-join probe + both self-join
    # sides — uncached, the bucket pandas UDF runs ~4x over the corpus
    b = _emb_band_buckets(e, bands, bits).persist()
    ok = (
        b.groupBy("band_idx", "bucket")
        .agg(F.count("*").alias("_bn"))
        .filter(F.col("_bn") <= bucket_cap)
        .select("band_idx", "bucket")
    )
    # keep `b` bound to the PERSISTED frame (unpersisting a derived
    # frame would not drop the ancestor's cacheManager entry)
    kept = b.join(ok, ["band_idx", "bucket"], "left_semi")
    pairs = (
        kept.select(F.col("vec_id").alias("id_a"), "band_idx", "bucket")
        .join(
            kept.select(F.col("vec_id").alias("id_b"), "band_idx", "bucket"),
            ["band_idx", "bucket"],
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    ea = e.select(F.col("vec_id").alias("id_a"),
                  F.col("embedding").alias("emb_a"))
    eb = e.select(F.col("vec_id").alias("id_b"),
                  F.col("embedding").alias("emb_b"))
    return _materialized(
        pairs.join(ea, "id_a")
        .join(eb, "id_b")
        .withColumn("sim", F.round(_cosine("emb_a", "emb_b"), 4))
        .filter(F.col("sim") >= 0.4)
        .select("id_a", "id_b", "sim"),
        b,
    )


def dedup_embedding_label_blocked(spark, sf):
    """Label-blocked exact variant (pytest oracle only — label blocks
    are O(n²/|labels|), a scale-killer at 10^9 rows; kept as the
    recall yardstick for the LSH-blocked production path above)."""
    e = _emb(spark, sf)
    a = e.select(F.col("vec_id").alias("id_a"), "label",
                 F.col("embedding").alias("emb_a"))
    b = e.select(F.col("vec_id").alias("id_b"), "label",
                 F.col("embedding").alias("emb_b"))
    return (
        a.join(b, "label")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("sim", F.round(_cosine("emb_a", "emb_b"), 4))
        .filter(F.col("sim") >= 0.4)
        .select("id_a", "id_b", "sim")
    )


# -------------------------------------------- dedup: connected components

def dedup_cc_embedding(spark, sf, max_rounds: int = 25):
    """Connected-components clustering of the embedding near-dup pairs.

    The pair stage (dedup_embedding_cosine) emits EDGES; "same
    document" is the transitive closure of those edges (a~b, b~c =>
    one cluster), so corpus-level dedup keeps one canonical doc per
    COMPONENT, not per pair.  Labels every clustered vec_id with the
    minimum vec_id reachable from it (deterministic under any
    partitioning) plus the component size; singletons (no near-dup)
    are excluded by construction.

    Algorithm: distributed min-label propagation — each round every
    node takes min(own label, neighbours' labels) via one shuffle over
    the symmetrized edge list, stopping when a round changes no label.
    Rounds = graph diameter; near-dup graphs are unions of
    near-cliques (diameter 2-3), so this beats O(log n)-round
    large-star/small-star alternation (Kiveris et al., "Connected
    Components in MapReduce and Beyond", SoCC 2014) in practice —
    switch to that if a corpus ever shows deep chain components
    (``max_rounds`` guards the pathological case).  Each round
    localCheckpoints the label frame: iterative plans otherwise grow
    a lineage that re-executes the whole history every round.
    """
    pairs = dedup_embedding_cosine(spark, sf).select("id_a", "id_b")
    return _min_label_components(
        pairs, max_rounds, "dedup_cc_embedding"
    ).select(
        F.col("id").alias("vec_id"),
        F.col("comp").alias("component"),
        "cluster_size",
    )


def _min_label_components(
    pairs: DataFrame, max_rounds: int, op_name: str
) -> DataFrame:
    """Min-label propagation over an undirected edge list (2-column
    ``pairs`` frame) → ``(id, comp, cluster_size)`` for every
    non-singleton node.  Shared by the embedding and minhash CC ops —
    see dedup_cc_embedding's docstring for the algorithm and its
    scale/convergence envelope."""
    a, b = pairs.columns
    edges = (
        pairs.union(pairs.select(b, a))
        .toDF("src", "dst")
        .repartition("src")
        .persist()
    )
    try:
        labels = (
            edges.select(F.col("src").alias("id"))
            .distinct()
            .withColumn("comp", F.col("id"))
            .localCheckpoint()
        )
        for _ in range(max_rounds):
            nbr_min = (
                edges.join(
                    labels.select(F.col("id").alias("dst"),
                                  F.col("comp").alias("dst_comp")),
                    "dst",
                )
                .groupBy("src")
                .agg(F.min("dst_comp").alias("nbr_comp"))
            )
            new_labels = (
                labels.join(nbr_min, labels.id == nbr_min.src, "left")
                .select(
                    "id",
                    F.least(
                        "comp", F.coalesce("nbr_comp", F.col("comp"))
                    ).alias("comp"),
                )
                .localCheckpoint()
            )
            changed = new_labels.join(
                labels, ["id", "comp"], "left_anti"
            ).count()
            labels = new_labels
            if changed == 0:
                break
        else:
            # Returning here would hand back intermediate (non-minimal)
            # labels with silently split components — fail loudly
            # instead; a corpus with diameter > max_rounds needs the
            # large-star/small-star alternation the docstring points at.
            raise RuntimeError(
                f"{op_name} did not converge in {max_rounds} "
                f"rounds ({changed} labels still changing); the near-dup "
                "graph has a deeper component than min-label propagation "
                "should be used for"
            )
        sizes = labels.groupBy("comp").agg(
            F.count("*").alias("cluster_size")
        )
        out = labels.join(sizes, "comp").select(
            "id", "comp", "cluster_size"
        )
    finally:
        # release on every exit — convergence, non-convergence raise,
        # or a mid-round failure (ADVICE r3 cache discipline)
        edges.unpersist()
    return out


def dedup_cc_minhash(spark, sf, max_rounds: int = 25):
    """Connected-components clustering of the MinHash-LSH near-dup
    pairs — the TEXT-side counterpart of dedup_cc_embedding, closing
    the same gap: dedup_minhash_lsh emits pairwise edges, but corpus
    dedup keeps one canonical doc per transitive component.  Same
    min-label propagation (shared helper), labels = min reachable
    doc_id + component size.  rows-only for the driver (the pair
    stage is rows-only — signature agreement has no SQL equivalent);
    pytest pins the exact component set against a pure-python
    union-find over the same pairs."""
    pairs = dedup_minhash_lsh(spark, sf).select("doc_a", "doc_b")
    return _min_label_components(
        pairs, max_rounds, "dedup_cc_minhash"
    ).select(
        F.col("id").alias("doc_id"),
        F.col("comp").alias("component"),
        "cluster_size",
    )


# ------------------------------------------------------- similarity search

ANN_K, ANN_NQ = 10, 5


def ann_cosine_topk(spark, sf):
    """Brute-force cosine top-k: the exact baseline every ANN variant
    is measured against.  Query side is broadcast (tiny)."""
    e = _emb(spark, sf)
    q = e.filter(F.col("vec_id") < ANN_NQ).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    c = e.select(F.col("vec_id").alias("neighbor_id"),
                 F.col("embedding").alias("n_emb"))
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("sim", F.round(_cosine("q_emb", "n_emb"), 6))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= ANN_K)
        .select("query_id", "neighbor_id", F.round("sim", 4).alias("sim"),
                "rank")
    )


N_PLANES = 6


def _hyperplanes(dim: int = 64, n_planes: int = N_PLANES, seed: int = 11):
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.standard_normal((n_planes, dim))


def _ann_lsh_topk(spark, sf, probe_flips: int = 0):
    """Shared LSH top-k core for ann_lsh_bucketed / ann_lsh_multiprobe.

    Sign bits of N_PLANES fixed hyperplane projections -> bucket id
    (bit count sized so buckets are populated at test scale; at 10^9
    rows raise it so bucket size stays executor-memory bounded); the
    top-k search shuffles only same-bucket rows (O(n) instead of the
    brute-force O(n·q) scan).

    ``probe_flips > 0`` is MULTI-PROBE: each query additionally probes
    the ``probe_flips`` buckets at Hamming distance 1 from its own (one
    sign bit flipped — the buckets a near-neighbor most likely fell
    into when its projection sat close to a hyperplane).  Recall rises
    without growing buckets or re-hashing the corpus: only the tiny
    query side fans out ×(1+probe_flips), so the join stays
    bucket-bounded.  A candidate lives in exactly one bucket and the
    probe set is distinct buckets, so no (query, neighbor) pair can
    duplicate — no dedup step needed before ranking."""
    planes = _hyperplanes()

    @F.pandas_udf(T.IntegerType())
    def bucket_udf(embs: pd.Series) -> pd.Series:
        mat = np.stack([np.asarray(e, dtype=np.float64) for e in embs])
        bits = (mat @ planes.T) > 0
        out = np.zeros(len(embs), dtype=np.int32)
        for i in range(planes.shape[0]):
            out |= bits[:, i].astype(np.int32) << i
        return pd.Series(out)

    e = _emb(spark, sf).withColumn("bucket", bucket_udf("embedding"))
    q = e.filter(F.col("vec_id") < ANN_NQ).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb"),
        "bucket",
    )
    if probe_flips:
        probes = F.array(
            F.col("bucket"),
            *[
                F.col("bucket").bitwiseXOR(F.lit(1 << i))
                for i in range(min(probe_flips, N_PLANES))
            ],
        )
        q = q.select(
            "query_id", "q_emb", F.explode(probes).alias("bucket")
        )
    c = e.select(F.col("vec_id").alias("neighbor_id"),
                 F.col("embedding").alias("n_emb"), "bucket")
    scored = (
        q.join(c, "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("sim", F.round(_cosine("q_emb", "n_emb"), 6))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= ANN_K)
        .select("query_id", "neighbor_id", F.round("sim", 4).alias("sim"),
                "rank")
    )


def ann_lsh_bucketed(spark, sf):
    """Scale-path ANN: random-hyperplane LSH buckets + in-bucket top-k
    (see _ann_lsh_topk).  Recall vs the exact baseline is measured in
    tests/test_pipeline.py."""
    return _ann_lsh_topk(spark, sf)


def ann_lsh_multiprobe(spark, sf):
    """Multi-probe ANN: same buckets as ann_lsh_bucketed, plus each
    query probes its N_PLANES Hamming-1 neighbor buckets (flip one sign
    bit).  Lifts recall toward the exact baseline at unchanged bucket
    count — the standard trade when growing 2^bits buckets (more
    memory) or adding hash tables (more corpus passes) is off the
    table.  tests/test_pipeline.py pins recall >= 0.8 on the fixture
    and that it strictly dominates the single-probe recall."""
    return _ann_lsh_topk(spark, sf, probe_flips=N_PLANES)


IVF_C, IVF_PROBE, IVF_ITERS = 8, 3, 2


def _ivf_assign_udf(centroids: np.ndarray):
    """pandas_udf: index of the max-cosine centroid for each vector."""
    # pre-normalize once so assignment is a single matmul per batch
    cn = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)

    @F.pandas_udf(T.IntegerType())
    def assign(embs: pd.Series) -> pd.Series:
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in embs])
        mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True),
                               1e-12)
        return pd.Series(np.argmax(mat @ cn.T, axis=1).astype(np.int32))

    return assign


def _ivf_centroids(e: DataFrame, n_cent: int = IVF_C,
                   iters: int = IVF_ITERS) -> np.ndarray:
    """Deterministic Lloyd centroids, DataFrame-native.

    Init = the ``n_cent`` lowest vec_ids (deterministic, no RNG); each
    iteration is ONE shuffle: assign (pandas_udf over a broadcast
    C×dim matrix — tiny), then per-(cid, dim) mean via posexplode +
    groupBy.  Driver traffic is O(C·dim) per iteration (512 values
    here), independent of corpus size — the classic IVF train loop at
    10^9 rows is exactly this plan with a sampled training subset.

    The mean is computed as an INTEGER sum of floor(x*1000)-quantized
    components divided driver-side: float sum merge order varies with
    shuffle task completion, so ``F.avg`` over doubles can differ in
    the last ulp between runs and flip a near-tied argmax assignment —
    integer sums are order-independent, making the trained centroids
    (and everything downstream) bit-deterministic.  Same quantization
    trick as the embedding-dedup oracle (_emb_band_buckets)."""
    init = (
        e.orderBy("vec_id").limit(n_cent).select("embedding").collect()
    )
    cent = np.stack([np.asarray(r.embedding, dtype=np.float64)
                     for r in init])
    for _ in range(iters):
        assigned = e.select(
            _ivf_assign_udf(cent)(F.col("embedding")).alias("cid"),
            F.posexplode("embedding").alias("dim", "x"),
        ).select(
            "cid", "dim",
            F.floor(F.col("x").cast("double") * 1000).cast("long")
            .alias("q"),
        )
        rows = (
            assigned.groupBy("cid", "dim")
            .agg(F.sum("q").alias("s"), F.count("*").alias("n"))
            .collect()
        )
        new = cent.copy()  # empty clusters keep their old centroid
        for r in rows:
            new[r.cid, r.dim] = (r.s / 1000.0) / r.n
        cent = new
    return cent


def ann_ivf_bucketed(spark, sf):
    """IVF ANN: coarse k-means partitions + multi-list probe.

    The corpus is assigned once to its nearest of IVF_C trained
    centroids (inverted lists); each query scans only its IVF_PROBE
    nearest lists.  Complements the LSH variants: data-adaptive
    partitions follow the corpus's actual cluster structure where
    fixed hyperplanes cannot.  At 10^9 rows: train on a sampled
    subset, raise IVF_C so lists stay executor-memory bounded, and the
    probe join stays O(q · avg-list) with the tiny query side
    broadcast.  Recall vs the exact baseline and determinism are
    pinned in tests/test_pipeline.py; rows-only for the driver (the
    trained centroids have no closed-form SQL)."""
    e = _emb(spark, sf)
    cent = _ivf_centroids(e)
    assign = _ivf_assign_udf(cent)
    cn = cent / np.linalg.norm(cent, axis=1, keepdims=True)

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def probe_udf(embs: pd.Series) -> pd.Series:
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in embs])
        mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True),
                               1e-12)
        sims = mat @ cn.T
        top = np.argsort(-sims, axis=1)[:, :IVF_PROBE].astype(np.int32)
        return pd.Series(list(top))

    c = e.select(F.col("vec_id").alias("neighbor_id"),
                 F.col("embedding").alias("n_emb"),
                 assign(F.col("embedding")).alias("cid"))
    q = (
        e.filter(F.col("vec_id") < ANN_NQ)
        .select(F.col("vec_id").alias("query_id"),
                F.col("embedding").alias("q_emb"),
                F.explode(probe_udf(F.col("embedding"))).alias("cid"))
    )
    scored = (
        q.join(c, "cid")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("sim", F.round(_cosine("q_emb", "n_emb"), 6))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= ANN_K)
        .select("query_id", "neighbor_id", F.round("sim", 4).alias("sim"),
                "rank")
    )


# ----------------------------------------------------------- text analysis

def text_tokens(spark, sf):
    """Token counting: whitespace tokens + BPE-ish lexer tokens."""
    d = _docs(spark, sf)
    return d.select(
        "doc_id",
        F.size(F.split(F.trim("text"), r"\s+")).cast("long").alias("n_ws"),
        F.size(F.regexp_extract_all("text", F.lit(r"\w+|[^\w\s]"), 0))
        .cast("long")
        .alias("n_lex"),
    )


def text_quality(spark, sf):
    """Quality scoring: length / punctuation / stopword signals plus a
    keep/drop flag — the standard pre-training corpus filter shape."""
    d = _docs(spark, sf)
    words = F.size(F.split(F.trim("text"), r"\s+")).cast("double")
    n_punct = F.length(F.regexp_replace("text", r"[^.!?,;:]", "")).cast(
        "double"
    )
    n_stop = F.size(
        F.regexp_extract_all(
            F.lower("text"), F.lit(r"\b(the|and|of|to|a|in|is)\b"), 0
        )
    ).cast("double")
    return d.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars_m"),
        words.cast("long").alias("n_words"),
        F.round(n_punct / F.length("text"), 4).alias("punct_ratio"),
        F.round(n_stop / words, 4).alias("stop_ratio"),
        ((words >= 5) & (words <= 2000) & (n_punct / F.length("text") < 0.2))
        .alias("keep"),
    )


_LANG_PATTERNS = {
    "en": r"\b(the|and|of|to|a|in|is)\b",
    "es": r"\b(el|la|de|que|los|una)\b",
    "de": r"\b(der|die|und|das|ein|nicht)\b",
    "fr": r"\b(le|la|les|et|une|dans)\b",
    "zh": r"\b(de|shi|bu|le|zai|you)\b",
}


def text_langid(spark, sf):
    """Marker-token language ID (n-gram heuristic): per-language
    stopword hit counts, argmax with a pinned tie order; reported as a
    (labelled_lang, predicted) confusion rollup."""
    d = _docs(spark, sf)
    scores = {
        lang: F.size(
            F.regexp_extract_all(F.lower("text"), F.lit(pat), 0)
        )
        for lang, pat in _LANG_PATTERNS.items()
    }
    best = F.greatest(*[scores[lg] for lg in textops.LANG_ORDER])
    pred = F.when(best <= 0, "und")
    for lg in textops.LANG_ORDER:  # pinned order breaks ties
        pred = pred.when(scores[lg] == best, lg)
    return (
        d.select("lang", pred.alias("predicted"))
        .groupBy("lang", "predicted")
        .agg(F.count("*").alias("n"))
    )


REPETITION_SCAN_CAP = 10_000  # tokens per doc the signals are read from


def text_repetition(spark, sf):
    """Repetition-based quality signals (the Gopher-rules family):
    distinct-word fraction, top-word mass, and duplicate-bigram
    fraction per document — the filters that kill boilerplate and
    degenerate/looping text before pre-training.

    Scale shape: every signal is computed INSIDE the document's token
    array (array_distinct / transform+filter / zip_with bigrams), so
    the whole op is one codegen'd projection over the scan — zero
    shuffle at any corpus size, unlike the naive explode + groupBy
    formulation whose shuffle carries every token of the corpus.  The
    per-row cost of the top-word scan is O(distinct × words), so the
    signals are computed over the first REPETITION_SCAN_CAP tokens —
    bounding one pathological million-token spam page to a constant
    per-row cost (Gopher applies these filters to bounded windows
    anyway).  Tokens are the NON-EMPTY \\s+-split pieces: leading /
    trailing tabs and newlines (ubiquitous in crawl text) must not
    fabricate empty 'words' that skew every signal; empty/whitespace-
    only docs degrade to zeroed signals + keep=false instead of
    dividing by zero."""
    d = _docs(spark, sf)
    words = F.slice(
        F.filter(F.split("text", r"\s+"), lambda x: x != ""),
        1,
        REPETITION_SCAN_CAP,
    )
    n = F.size(words).cast("double")
    top = F.array_max(
        F.transform(
            F.array_distinct(words),
            lambda w: F.size(F.filter(words, lambda x: x == w)),
        )
    ).cast("double")
    n_m1 = F.greatest(F.size(words) - 1, F.lit(0))  # slice len >= 0
    big = F.zip_with(
        F.slice(words, 1, n_m1),
        F.slice(words, 2, n_m1),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    distinct_frac = F.when(
        n > 0, F.round(F.size(F.array_distinct(words)) / n, 6)
    ).otherwise(F.lit(0.0))
    top_word_frac = F.when(n > 0, F.round(top / n, 6)).otherwise(F.lit(0.0))
    dup_bigram_frac = F.when(
        F.size(big) > 0,
        F.round(
            1.0 - F.size(F.array_distinct(big)) / F.size(big).cast("double"),
            6,
        ),
    ).otherwise(F.lit(0.0))
    return d.select(
        "doc_id",
        F.size(words).cast("long").alias("n_words"),
        distinct_frac.alias("distinct_frac"),
        top_word_frac.alias("top_word_frac"),
        dup_bigram_frac.alias("dup_bigram_frac"),
        (
            (distinct_frac >= 0.3)
            & (top_word_frac <= 0.12)
            & (dup_bigram_frac <= 0.08)
        ).alias("keep"),
    )


def emb_quantize_int8(spark, sf):
    """Symmetric int8 embedding quantization — the 4x storage/bandwidth
    reduction every large embedding corpus ships with: per-vector
    scale = 127 / max|x|, codes = round(x * scale) ∈ [-127, 127].

    Scale shape: pure per-row array math (transform / array_max inside
    codegen) plus a generator (posexplode) — no shuffle, no UDF, no
    state; at 100 TB this runs at scan speed.  The arithmetic is
    IEEE-double on both engines so the DuckDB oracle matches
    code-for-code (verified bit-exact over the full fixture); all-zero
    vectors degrade to scale 0 / zero codes instead of dividing by
    zero.  The numpy reconstruction-error bound (≤ 0.5/scale per
    coordinate) is pinned in pytest.

    Result shape (r4): one row per (vec_id, pos) — the codes array is
    EXPLODED rather than returned raw because the driver's
    order-insensitive canonicalizer sorts every result column and a
    list-valued column is unhashable in pandas (the r03 hard-fail;
    VERDICT r3 item 1).  Same lesson as emb_centroid_per_label: any
    full-oracle key must emit scalar top-level columns only — enforced
    mechanically by tests/test_static_guards.py."""
    e = _emb(spark, sf)
    mx = F.array_max(F.transform("embedding", lambda x: F.abs(x.cast("double"))))
    scale = F.when(mx > 0, 127.0 / mx).otherwise(F.lit(0.0))
    codes = F.transform(
        "embedding",
        lambda x: F.when(
            mx > 0, F.round(x.cast("double") * (127.0 / mx)).cast("int")
        ).otherwise(F.lit(0)),
    )
    # scale is emitted UNROUNDED: 127/mx is IEEE-exact on both engines,
    # and rounding it would zero out (or skew) the scale for
    # large-magnitude vectors (mx >= ~1e10) whose codes are non-zero —
    # a downstream dequantizer would divide by zero
    return e.select(
        "vec_id",
        "label",
        scale.alias("scale"),
        F.posexplode(codes).alias("pos", "code"),
    ).withColumn("pos", F.col("pos").cast("long"))


SHUFFLE_SHARDS = 8


def corpus_shard_shuffle(spark, sf):
    """Deterministic global shuffle + sharding — the last stage of
    training-data prep: every doc gets a pseudorandom but
    parallelism-invariant position (shard, pos) so trainers stream
    shards in a reproducible shuffled order with no RNG state.

    shard = md5(doc_id) mod K and pos = rank of the hash within the
    shard: a pure function of the key, so the assignment is identical
    on 4 cores or 4000 executors and re-runnable incrementally (the
    same property sample_stratified relies on).  Scale shape: ONE
    shuffle, partitioned by shard — each task sorts only its own
    shard (at 100 TB: K = O(corpus/target-shard-size), so per-task
    sort stays bounded); the sink writes partitionBy(shard) so a
    trainer reads one directory per shard.  The returned frame is the
    read-back of that sink — the round-trip is what the driver
    verifies."""
    from spider_1_spark.relational.queries import _scratch_dir

    d = _docs(spark, sf)
    h = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
    ).cast("long")
    staged = d.select(
        "doc_id",
        "lang",
        h.alias("h"),
        F.pmod(h, F.lit(SHUFFLE_SHARDS)).cast("int").alias("shard"),
    )
    ranked = staged.select(
        "doc_id",
        "lang",
        "shard",
        F.row_number()
        .over(Window.partitionBy("shard").orderBy("h", "doc_id"))
        .cast("long")
        .alias("pos"),
    )
    out = _scratch_dir("shards", sf)
    ranked.write.mode("overwrite").partitionBy("shard").parquet(out)
    back = spark.read.parquet(out)
    return back.select(
        "doc_id", "lang", F.col("shard").cast("int").alias("shard"), "pos"
    )


# --------------------------------------------------------- corpus curation

# Per-stratum hash-threshold sample rates, as 4-hex-digit md5-prefix
# ceilings: 0x3333/0x10000 ≈ 20% for English, 0x1999/0x10000 ≈ 10%
# for everything else.  A hash threshold (vs rand()) makes the sample
# a pure function of the key — identical on 4 cores or 4000
# executors, re-runnable incrementally, and joinable across pipeline
# stages (the same doc is in or out everywhere).
_STRATUM_HEX = {"en": "3333"}
_STRATUM_HEX_DEFAULT = "1999"


def sample_stratified(spark, sf):
    """Deterministic stratified sampling: keep a doc iff the first 4
    hex chars of md5(doc_id) fall under its stratum's ceiling, then
    roll up per (lang, source) for a compact audit of exactly which
    rows survived.  Scale: the filter is a narrow map over the scan
    (no shuffle, no RNG state); only the small audit rollup shuffles."""
    d = _docs(spark, sf)
    h4 = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4)
    thr = F.when(
        F.col("lang") == "en", F.lit(_STRATUM_HEX["en"])
    ).otherwise(F.lit(_STRATUM_HEX_DEFAULT))
    return (
        d.where(h4 < thr)
        .groupBy("lang", "source")
        .agg(
            F.count("*").alias("n_sampled"),
            F.min("doc_id").alias("min_doc_id"),
            F.sum("n_chars").alias("sum_chars"),
        )
    )


# PII patterns pinned to the syntax subset Java regex (Spark) and RE2
# (DuckDB) interpret identically: literal classes, bounded repeats —
# no backrefs or lookarounds.
_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_LONGNUM = r"[0-9]{6,}"


def text_pii_scrub(spark, sf):
    """PII scrubbing: redact email addresses and 6+-digit runs
    (phone/account-number shaped) from the text column — the standard
    pre-release pass over a crawled corpus.  Built-in regexp_replace
    only (JVM-side, whole-stage codegen); delta_chars audits how much
    each doc was redacted."""
    d = _docs(spark, sf)
    scrub = F.regexp_replace(
        F.regexp_replace("text", _PII_EMAIL, "<EMAIL>"),
        _PII_LONGNUM,
        "<NUM>",
    )
    return d.select(
        "doc_id",
        scrub.alias("scrubbed"),
        (F.length("text") - F.length(scrub)).cast("long").alias(
            "delta_chars"
        ),
    )


def docs_length_histogram(spark, sf):
    """Corpus length histogram (100-char bins): the shape check every
    curation run starts with.  One partial-aggregated groupBy on a
    derived int key — map-side combine leaves ~bins rows per task, so
    the shuffle is O(bins x partitions) regardless of corpus size."""
    d = _docs(spark, sf)
    bin_ = F.floor(F.col("n_chars") / 100).cast("long")
    return d.groupBy(bin_.alias("bin")).agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )


# Interpolated-quantile fractions for the curation cutoff report.
_Q_PS = (0.5, 0.95, 0.99)


def docs_quantiles(spark, sf):
    """Exact per-language length quantiles (p50/p95/p99 of n_chars) —
    the numbers every min/max-length curation cutoff is read off of.

    Scale design: NOT a per-group sort of raw rows (a window ordered
    by n_chars would put an entire dominant language in one task).
    Instead build the value-histogram CDF: groupBy (lang, n_chars)
    with map-side combine leaves O(distinct lengths x partitions)
    shuffle rows regardless of corpus size, and the running-sum
    window then runs over the tiny aggregated frame.  The quantile at
    fraction p is read off the CDF as the first value whose
    cumulative count reaches rank floor/ceil(1+(n-1)p), linearly
    interpolated — the same type-7 definition DuckDB's quantile_cont
    and numpy's 'linear' use, so the oracle match is exact (both
    sides compute (n-1)*p in IEEE doubles).  Works for any integer or
    low-cardinality column; for continuous doubles at 10^9 rows the
    same shape applies after fixed-width binning (or Spark's
    approx_percentile when a t-digest error bound is acceptable)."""
    d = _docs(spark, sf)
    cw = Window.partitionBy("lang").orderBy("n_chars")
    tw = Window.partitionBy("lang")
    cdf = (
        d.groupBy("lang", "n_chars")
        .agg(F.count("*").alias("cnt"))
        .withColumn("cum", F.sum("cnt").over(cw))
        .withColumn("n", F.sum("cnt").over(tw))
    )

    def _rank_mins(p, tag):
        pos = F.lit(1.0) + (F.col("n") - F.lit(1)) * F.lit(p)
        return [
            F.min(
                F.when(F.col("cum") >= F.floor(pos), F.col("n_chars"))
            ).alias(f"_vlo_{tag}"),
            F.min(
                F.when(F.col("cum") >= F.ceil(pos), F.col("n_chars"))
            ).alias(f"_vhi_{tag}"),
        ]

    def _interp(p, tag):
        pos = F.lit(1.0) + (F.col("n") - F.lit(1)) * F.lit(p)
        frac = pos - F.floor(pos)
        lo, hi = F.col(f"_vlo_{tag}"), F.col(f"_vhi_{tag}")
        return F.round(lo + frac * (hi - lo), 4).alias(f"p{tag}")

    tags = [str(int(p * 100)) for p in _Q_PS]
    agg = cdf.groupBy("lang", "n").agg(
        *[c for p, t in zip(_Q_PS, tags) for c in _rank_mins(p, t)]
    )
    return agg.select(
        "lang", "n", *[_interp(p, t) for p, t in zip(_Q_PS, tags)]
    )


def emb_centroid_per_label(spark, sf):
    """Per-label embedding centroids — the codebook-update shape every
    k-means / IVF training loop runs at corpus scale (and the class-
    prototype computation for nearest-centroid labeling).

    Scale design: posexplode to (label, pos, v) then ONE hash
    aggregate on (label, pos) — Spark's partial aggregation map-side
    combines each task down to O(labels x dim) rows, so the shuffle is
    O(labels x dim x partitions) regardless of corpus size (10^9
    vectors shuffle the same few thousand rows per task as 10^4 do).
    Never collect-and-average driver-side, and never groupBy(label)
    with collect_list (that shuffles every vector whole).  Output is
    rounded to 6 dp: both engines average the identical float32 values
    in IEEE doubles, ordered differently — double summation error is
    O(n * eps) ~ 1e-13, far inside the rounding."""
    e = _emb(spark, sf)
    ex = e.select("label", F.posexplode("embedding").alias("pos", "v"))
    return ex.groupBy("label", "pos").agg(
        F.round(F.avg("v"), 6).alias("c"),
        F.count("*").cast("long").alias("n_vecs"),
    )


def docs_ngram_topk(spark, sf):
    """Top-3 character trigrams per language (count desc, gram asc) —
    the n-gram frequency profile used for language-model corpus audits
    and contamination checks.

    Scale design: the trigram fan-out is pure JVM (sequence +
    transform + explode inside whole-stage codegen — ~n_chars rows per
    doc, no Python), then ONE hash aggregate on (lang, gram) with
    map-side combine (shuffle is O(distinct-grams x partitions), not
    corpus size), and the final top-k window runs over the tiny
    aggregated frame (grams per language, not rows per language).
    Deterministic tie-break: (count desc, gram asc) — both engines
    compare UTF-8 bytes."""
    d = _docs(spark, sf).filter(F.length("text") >= 3)
    grams = d.select(
        "lang",
        F.explode(
            F.expr(
                "transform(sequence(1, length(text) - 2), "
                "i -> substring(text, i, 3))"
            )
        ).alias("gram"),
    )
    counts = grams.groupBy("lang", "gram").agg(
        F.count("*").cast("long").alias("n")
    )
    w = Window.partitionBy("lang").orderBy(F.desc("n"), F.asc("gram"))
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("lang", "gram", "n", F.col("rk").cast("long").alias("rk"))
    )


DECON_N = 5            # words per shingle
DECON_MIN_SHARED = 3   # shared distinct shingles with ONE bench doc
DECON_MAX_BENCH_DF = 10  # grams in more bench docs are no evidence


def decontaminate_ngram(spark, sf):
    """Benchmark decontamination: which corpus docs leak eval data?

    The standard pre-training hygiene step — remove training docs that
    overlap held-out benchmarks: a corpus doc is CONTAMINATED if it
    shares >= DECON_MIN_SHARED distinct word 5-grams with any single
    benchmark doc.  Benchmark set here = the ``doc_id % 17 == 0``
    slice of the documents table (a deterministic held-out stand-in;
    production points this side at the external eval-suite table).
    Output per contaminated doc: the max shingle overlap with one
    bench doc plus how many bench docs it trips — integer-exact.

    Scale design: the 5-gram fan-out is pure JVM (split + sequence +
    transform + explode inside whole-stage codegen, no Python); grams
    present in more than DECON_MAX_BENCH_DF benchmark docs are dropped
    BEFORE the join (boilerplate n-grams are no evidence of leakage
    and are exactly the hot join keys — the same cap-the-skew
    discipline as the LSH bucket caps); the benchmark gram side is
    broadcast (bounded by eval-suite size x grams/doc, independent of
    corpus size), so the corpus side never shuffles for the probe —
    one codegen explode + broadcast join + map-side-combined groupBy.
    At 10^9+ bench grams, swap the broadcast for a shuffle join keyed
    on xxhash64(gram)."""
    d = _docs(spark, sf)

    def grams(df, id_alias):
        # array_distinct BEFORE the explode: the distinct-grams-per-doc
        # contract needs dedup only within one doc, and one doc's grams
        # all live in one array — dedup there is free, where a
        # .distinct() after the explode would shuffle the full
        # exploded corpus
        words = F.split(F.col("text"), " ")
        return df.filter(F.size(words) >= DECON_N).select(
            F.col("doc_id").alias(id_alias),
            F.explode(
                F.array_distinct(
                    F.transform(
                        F.sequence(
                            F.lit(1), F.size(words) - (DECON_N - 1)
                        ),
                        lambda i: F.array_join(
                            F.slice(words, i, DECON_N), " "
                        ),
                    )
                )
            ).alias("gram"),
        )

    bench = grams(d.filter(F.col("doc_id") % 17 == 0), "bench_id")
    rare = (
        bench.groupBy("gram")
        .agg(F.count("*").alias("_df"))
        .filter(F.col("_df") <= DECON_MAX_BENCH_DF)
        .select("gram")
    )
    bench = bench.join(rare, "gram", "left_semi")
    corpus = grams(d.filter(F.col("doc_id") % 17 != 0), "doc_id")
    shared = (
        corpus.join(F.broadcast(bench), "gram")
        .groupBy("doc_id", "bench_id")
        .agg(F.count("*").cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= DECON_MIN_SHARED)
    )
    return shared.groupBy("doc_id").agg(
        F.max("n_shared").alias("max_shared"),
        F.count("*").cast("long").alias("n_bench_docs"),
    )


def doc_fingerprint(spark, sf):
    """Winnowing fingerprints (rolling k-gram hash, min-in-window):
    exploded (doc_id, fp) rows — overlap of fp sets across docs is the
    plagiarism/near-dup signal at corpus scale."""
    d = _docs(spark, sf)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fps = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                for fp in textops.winnow_fingerprints(text):
                    ids.append(doc_id)
                    fps.append(fp - (1 << 64 if fp >= 1 << 63 else 0))
            yield pd.DataFrame({"doc_id": ids, "fp": fps})

    return d.select("doc_id", "text").mapInPandas(gen, "doc_id long, fp long")


# -------------------------------------------------------------- multimodal

MM_SCHEMA = (
    "image_id string, status string, w int, h int, fmt string, "
    "phash long, thumb_mean double"
)


def _mm_fixture_path(spark) -> str:
    """Write the deterministic binary-column fixture table ONCE to a
    shared parquet path and return it — multimodal_decode then reads a
    real columnar source (binary scan -> repartition -> Arrow decode),
    the actual 100 TB shape, instead of a driver-built row list
    (VERDICT r1 item 5/8).  Creation is race-safe: write to a unique
    temp dir, atomic-rename into place, first writer wins."""
    import os
    import tempfile
    import uuid

    from spider_1_spark.fixtures.webgen import SyntheticWeb
    from spider_1_spark.reference_model.spider1_ref import image_id_of

    final = os.path.join(tempfile.gettempdir(), "spider1_mm_fixture_v1")
    if os.path.isdir(final):
        return final
    web = SyntheticWeb(4)
    urls = [
        f"http://h{k}.example.test/img/{m}.{fmt}"
        for k in range(2)
        for m in range(10)
        for fmt in ("ppm", "png", "qlossy")
    ]
    rows = [(image_id_of(u), web.image(u), "auto") for u in urls]
    rows.append(("stub-jpeg-row", b"\xff\xd8\xff\xe0FAKEJPEG", "jpeg"))
    staging = final + "." + uuid.uuid4().hex[:8]
    spark.createDataFrame(
        rows, "image_id string, bytes binary, declared_fmt string"
    ).coalesce(4).write.mode("overwrite").parquet(staging)
    try:
        os.rename(staging, final)
    except OSError:  # concurrent writer won the rename
        import shutil

        shutil.rmtree(staging, ignore_errors=True)
    return final


def multimodal_decode(spark, sf):
    """Multimodal binary-column plumbing: opaque image bytes + typed
    metadata in a PARQUET table -> decode / feature-extract /
    thumbnail, Arrow-batched over a columnar binary scan.

    The synthetic formats (ppm/png/qlossy) decode for real; codecs the
    sandbox lacks (jpeg — no Pillow/cv2, SURVEY §0.5) are STUBBED
    behind a clearly-marked unsupported_codec status so the Spark-side
    schema/partitioning/batching is real and tested."""
    from spider_1_spark.functions.codecs import DecodeError, decode
    from spider_1_spark.functions.phash import dhash64

    src = spark.read.parquet(_mm_fixture_path(spark))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for image_id, data, declared in zip(
                pdf["image_id"], pdf["bytes"], pdf["declared_fmt"]
            ):
                if declared == "jpeg":
                    # STUB: real deployment plugs Pillow/libjpeg here
                    out.append((image_id, "unsupported_codec", None, None,
                                "jpeg", None, None))
                    continue
                try:
                    rgb, fmt = decode(bytes(data))
                except DecodeError:
                    out.append((image_id, "decode_failed", None, None,
                                None, None, None))
                    continue
                h, w = rgb.shape[:2]
                thumb = rgb[: h - h % 8, : w - w % 8].reshape(
                    8, (h - h % 8) // 8, 8, (w - w % 8) // 8, 3
                ).mean(axis=(1, 3))  # 8x8 block-mean thumbnail
                out.append(
                    (image_id, "ok", w, h, fmt, dhash64(rgb),
                     round(float(thumb.mean()), 4))
                )
            cols = list(zip(*out))
            yield pd.DataFrame(
                {
                    "image_id": cols[0],
                    "status": cols[1],
                    "w": pd.array(cols[2], dtype="Int32"),
                    "h": pd.array(cols[3], dtype="Int32"),
                    "fmt": cols[4],
                    "phash": pd.array(cols[5], dtype="Int64"),
                    "thumb_mean": pd.array(cols[6], dtype="Float64"),
                }
            )

    return src.repartition(4, "image_id").mapInPandas(gen, MM_SCHEMA)


# ------------------------------------------------- dedup: perceptual hash

PHASH_BLOCK_CAP = 512


def _phash_fixture_path(spark) -> str:
    """Binary-column image table with ENGINEERED duplicate structure:
    base images from the deterministic synthetic web, plus exact
    byte-copies and pixel-perturbed (re-encoded) near-duplicates —
    written once, race-safe rename, same pattern as _mm_fixture_path."""
    import os
    import tempfile
    import uuid

    from spider_1_spark.fixtures.webgen import SyntheticWeb
    from spider_1_spark.functions.codecs import decode, encode_ppm

    final = os.path.join(tempfile.gettempdir(), "spider1_phash_fixture_v1")
    if os.path.isdir(final):
        return final
    web = SyntheticWeb(4)
    urls = [
        f"http://h{k}.example.test/img/{m}.{fmt}"
        for k in range(2)
        for m in range(12)
        for fmt in ("ppm", "png")
    ]
    rng = np.random.Generator(np.random.PCG64(99))
    rows = []
    for i, u in enumerate(urls):
        data = web.image(u)
        rows.append((f"img{i:03d}", data))
        if i % 6 == 0:  # exact byte-copy -> Hamming 0, always found
            rows.append((f"img{i:03d}-copy", data))
        if i % 6 == 3:  # near-dup: sparse ±2 pixel noise, re-encoded
            rgb, _ = decode(data)
            noisy = rgb.astype(np.int16)
            mask = rng.random(noisy.shape[:2]) < 0.02
            if mask.any():
                noisy[mask] = np.clip(
                    noisy[mask]
                    + rng.integers(-2, 3, size=(int(mask.sum()), 3)),
                    0, 255,
                )
            rows.append((f"img{i:03d}-near",
                         encode_ppm(noisy.astype(np.uint8))))
    staging = final + "." + uuid.uuid4().hex[:8]
    spark.createDataFrame(
        rows, "image_id string, bytes binary"
    ).coalesce(4).write.mode("overwrite").parquet(staging)
    try:
        os.rename(staging, final)
    except OSError:  # concurrent writer won the rename
        import shutil

        shutil.rmtree(staging, ignore_errors=True)
    return final


def dedup_phash_hamming(spark, sf):
    """Image near-dup pairs by perceptual hash, Hamming <= 6.

    The crawl's image-dedup story at corpus level: decode + dhash64
    (the same perceptual hash the engine's A15 stage emits) over a
    real binary-column parquet scan, Arrow-batched, then the SAME
    capped 4x16-bit pigeonhole self-join the text simhash op uses
    (_hamming64_pairs) — no all-pairs compare at any corpus size.
    Undecodable rows are skipped (a production run routes them to the
    decode_failed counter, engine crawler.py)."""
    from spider_1_spark.functions.codecs import DecodeError, decode
    from spider_1_spark.functions.phash import dhash64

    src = spark.read.parquet(_phash_fixture_path(spark))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hs = [], []
            for image_id, data in zip(pdf["image_id"], pdf["bytes"]):
                try:
                    rgb, _ = decode(bytes(data))
                except DecodeError:
                    continue
                ids.append(image_id)
                hs.append(dhash64(rgb))
            yield pd.DataFrame(
                {"image_id": ids, "phash": pd.array(hs, dtype="Int64")}
            )

    hashed = src.repartition(4, "image_id").mapInPandas(
        gen, "image_id string, phash long"
    )
    return _hamming64_pairs(
        hashed, "image_id", "phash", "img_a", "img_b", PHASH_BLOCK_CAP, 6
    )


# ------------------------------------------- multimodal: resize / video / audio

MM_RESIZE_HW = 16  # output side length; compile-time = stable checksums


def multimodal_resize(spark, sf):
    """Image resize as a REAL kernel (no stub): decode the binary
    column, nearest-neighbor AND bilinear resample to 16x16 with pure
    numpy (functions/imageops.py), emit per-image checksums.  This is
    the thumbnail/normalize stage of a vision-training pipeline: the
    Arrow batch shape, binary scan, and per-image fan-in are exactly
    what a libjpeg-backed deployment runs; only the codec layer is
    synthetic (SURVEY §0.5 — no Pillow in the sandbox).  Identity and
    interpolation properties are pinned in tests/test_functions.py."""
    import hashlib

    from spider_1_spark.functions.codecs import DecodeError, decode
    from spider_1_spark.functions.imageops import (
        resize_bilinear,
        resize_nearest,
    )

    src = spark.read.parquet(_mm_fixture_path(spark))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for image_id, data, declared in zip(
                pdf["image_id"], pdf["bytes"], pdf["declared_fmt"]
            ):
                if declared == "jpeg":
                    out.append((image_id, "unsupported_codec",
                                None, None, None, None))
                    continue
                try:
                    rgb, _ = decode(bytes(data))
                except DecodeError:
                    out.append((image_id, "decode_failed",
                                None, None, None, None))
                    continue
                nn = resize_nearest(rgb, MM_RESIZE_HW, MM_RESIZE_HW)
                bil = resize_bilinear(rgb, MM_RESIZE_HW, MM_RESIZE_HW)
                nn_sum = int.from_bytes(
                    hashlib.blake2b(nn.tobytes(), digest_size=8).digest(),
                    "big", signed=True,
                )
                out.append((
                    image_id, "ok", rgb.shape[1], rgb.shape[0],
                    nn_sum, round(float(bil.mean()), 4),
                ))
            cols = list(zip(*out)) if out else [[]] * 6
            yield pd.DataFrame({
                "image_id": cols[0],
                "status": cols[1],
                "src_w": pd.array(cols[2], dtype="Int32"),
                "src_h": pd.array(cols[3], dtype="Int32"),
                "nn_checksum": pd.array(cols[4], dtype="Int64"),
                "bil_mean": pd.array(cols[5], dtype="Float64"),
            })

    return src.repartition(4, "image_id").mapInPandas(
        gen,
        "image_id string, status string, src_w int, src_h int, "
        "nn_checksum long, bil_mean double",
    )


VID_STRIDE = 3


def _video_fixture_path(spark) -> str:
    """Deterministic multi-frame video fixture (VID1 container, ppm/png
    frames), written once with the race-safe rename pattern."""
    import os
    import tempfile
    import uuid

    from spider_1_spark.functions.codecs import encode
    from spider_1_spark.functions.imageops import encode_video

    final = os.path.join(tempfile.gettempdir(), "spider1_video_fixture_v2")
    if os.path.isdir(final):
        return final
    rows = []
    for v in range(8):
        frames = []
        for f in range(4 + 2 * (v % 5)):
            hh, ww = 16 + 4 * (v % 3), 20
            i = np.arange(hh, dtype=np.int64)[:, None, None]
            j = np.arange(ww, dtype=np.int64)[None, :, None]
            c = np.arange(3, dtype=np.int64)[None, None, :]
            rgb = ((3 * f + 7 * v + 5 * i + 11 * j + 29 * c) % 256
                   ).astype(np.uint8)
            frames.append(encode(rgb, "ppm" if f % 2 else "png"))
        rows.append((f"vid{v:02d}", encode_video(frames)))
    rows.append(("vid-corrupt", b"VID1\x02\x00\xff\xff\xff\xff"))
    # a well-formed container whose frame decodes but is smaller than
    # the 9x8 dHash grid — pins the frame_too_small degradation path
    tiny = (np.arange(4 * 4 * 3, dtype=np.int64) % 256).astype(
        np.uint8).reshape(4, 4, 3)
    rows.append(("vid-tiny", encode_video([encode(tiny, "ppm")])))
    staging = final + "." + uuid.uuid4().hex[:8]
    spark.createDataFrame(
        rows, "video_id string, bytes binary"
    ).coalesce(4).write.mode("overwrite").parquet(staging)
    try:
        os.rename(staging, final)
    except OSError:
        import shutil

        shutil.rmtree(staging, ignore_errors=True)
    return final


def multimodal_frame_sample(spark, sf):
    """Video frame-sampling: parse the multi-frame container, keep
    every VID_STRIDE-th frame (stride sampling — the standard
    preprocessing shape for video-language training), decode kept
    frames, one output row per sampled frame.

    mapInPandas is the right form because the fan-out ratio is
    data-dependent (a clip's bytes arrive as ONE binary cell; the
    output batch is LONGER than the input batch) — a pandas_udf
    Series→Series could not change the row count.  Corrupt containers
    degrade to a single container_error row instead of poisoning the
    batch."""
    from spider_1_spark.functions.codecs import DecodeError, decode
    from spider_1_spark.functions.imageops import (
        ContainerError,
        decode_video,
    )
    from spider_1_spark.functions.phash import dhash64

    src = spark.read.parquet(_video_fixture_path(spark))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for video_id, data in zip(pdf["video_id"], pdf["bytes"]):
                try:
                    frames = decode_video(bytes(data))
                except ContainerError:
                    out.append((video_id, "container_error",
                                None, None, None, None, None))
                    continue
                for idx in range(0, len(frames), VID_STRIDE):
                    try:
                        rgb, fmt = decode(frames[idx])
                    except DecodeError:
                        out.append((video_id, "decode_failed", idx,
                                    len(frames), None, None, None))
                        continue
                    try:
                        ph = dhash64(rgb)
                    except ValueError:
                        # decodable but below the 9x8 dHash grid: keep
                        # the frame row (w/h are real), phash NULL —
                        # a tiny thumbnail must not kill the task
                        out.append((video_id, "frame_too_small", idx,
                                    len(frames), rgb.shape[1],
                                    rgb.shape[0], None))
                        continue
                    out.append((video_id, "ok", idx, len(frames),
                                rgb.shape[1], rgb.shape[0], ph))
            cols = list(zip(*out)) if out else [[]] * 7
            yield pd.DataFrame({
                "video_id": cols[0],
                "status": cols[1],
                "frame_idx": pd.array(cols[2], dtype="Int32"),
                "n_frames": pd.array(cols[3], dtype="Int32"),
                "w": pd.array(cols[4], dtype="Int32"),
                "h": pd.array(cols[5], dtype="Int32"),
                "frame_phash": pd.array(cols[6], dtype="Int64"),
            })

    return src.repartition(4, "video_id").mapInPandas(
        gen,
        "video_id string, status string, frame_idx int, n_frames int, "
        "w int, h int, frame_phash long",
    )


def _audio_fixture_path(spark) -> str:
    """Deterministic PCM1 audio fixture: integer sawtooth-family
    waveforms (no libm — bit-identical everywhere), varying rate and
    length per clip."""
    import os
    import tempfile
    import uuid

    from spider_1_spark.functions.imageops import encode_pcm

    final = os.path.join(tempfile.gettempdir(), "spider1_audio_fixture_v1")
    if os.path.isdir(final):
        return final
    rows = []
    for v in range(10):
        rate = (8000, 16000, 22050)[v % 3]
        n = 1000 + 317 * v
        i = np.arange(n, dtype=np.int64)
        wave = ((i * (37 + v) + 13 * v) % 2048) - 1024  # sawtooth
        sign = np.where((i // (50 + v)) % 2 == 0, 1, -1)
        rows.append((f"clip{v:02d}", encode_pcm(rate, (wave * sign) // 2)))
    rows.append(("clip-corrupt", b"PCM1\x00\x1f"))
    staging = final + "." + uuid.uuid4().hex[:8]
    spark.createDataFrame(
        rows, "clip_id string, bytes binary"
    ).coalesce(4).write.mode("overwrite").parquet(staging)
    try:
        os.rename(staging, final)
    except OSError:
        import shutil

        shutil.rmtree(staging, ignore_errors=True)
    return final


def multimodal_audio_features(spark, sf):
    """Audio feature extraction over a binary PCM column: duration,
    RMS level, zero-crossing count — the cheap quality gates an audio
    corpus is filtered on before expensive ASR/embedding stages.
    Pure-numpy over Arrow batches; the numpy reference oracle lives
    in tests/test_functions.py."""
    from spider_1_spark.functions.imageops import (
        ContainerError,
        decode_pcm,
        pcm_features,
    )

    src = spark.read.parquet(_audio_fixture_path(spark))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for clip_id, data in zip(pdf["clip_id"], pdf["bytes"]):
                try:
                    rate, samples = decode_pcm(bytes(data))
                except ContainerError:
                    out.append((clip_id, "container_error",
                                None, None, None, None, None))
                    continue
                rms, zcr = pcm_features(samples)
                out.append((
                    clip_id, "ok", rate, int(samples.size),
                    int(samples.size * 1000) // rate if rate else None,
                    round(rms, 4), zcr,
                ))
            cols = list(zip(*out)) if out else [[]] * 7
            yield pd.DataFrame({
                "clip_id": cols[0],
                "status": cols[1],
                "rate": pd.array(cols[2], dtype="Int32"),
                "n_samples": pd.array(cols[3], dtype="Int64"),
                "duration_ms": pd.array(cols[4], dtype="Int64"),
                "rms": pd.array(cols[5], dtype="Float64"),
                "zcr": pd.array(cols[6], dtype="Int64"),
            })

    return src.repartition(4, "clip_id").mapInPandas(
        gen,
        "clip_id string, status string, rate int, n_samples long, "
        "duration_ms long, rms double, zcr long",
    )


# ----------------------------------------------------- generated oracles

def _emb_dedup_sql(
    bands: int = EMB_BANDS,
    bits: int = EMB_BITS,
    bucket_cap: int = EMB_BUCKET_CAP,
) -> str:
    """DuckDB oracle for dedup_embedding_cosine with the SAME
    Rademacher-LSH blocking AND the same bucket cap: floor(x*1000)
    quantization + ±1 plane dots are integer-exact in both engines, so
    the candidate pair set matches bit-for-bit (see _emb_planes).
    Generated from the same (bands, bits, bucket_cap) arguments as the
    Spark op — changing a knob rebuilds both sides in lockstep."""
    planes = _emb_planes(bands, bits)

    def dot(p):
        lit = "[" + ",".join(str(float(x)) for x in p) + "]::DOUBLE[]"
        return f"list_dot_product(q, {lit})"

    band_cols = []
    for band in range(bands):
        bit_terms = [
            f"(CASE WHEN {dot(planes[band * bits + i])} > 0 "
            f"THEN {1 << i} ELSE 0 END)"
            for i in range(bits)
        ]
        band_cols.append("(" + " + ".join(bit_terms) + f") AS b{band}")
    # per-band surviving buckets (population <= cap), mirroring the
    # Spark side's left_semi filter before the self-join
    ok_ctes = ", ".join(
        f"ok{k} AS (SELECT b{k} AS v FROM b GROUP BY b{k} "
        f"HAVING count(*) <= {bucket_cap})"
        for k in range(bands)
    )
    same_bucket = " OR ".join(
        f"(a.b{k} = c.b{k} AND a.b{k} IN (SELECT v FROM ok{k}))"
        for k in range(bands)
    )
    cos = (
        "list_dot_product(ea.embedding::DOUBLE[], eb.embedding::DOUBLE[])"
        " / (sqrt(list_dot_product(ea.embedding::DOUBLE[], "
        "ea.embedding::DOUBLE[])) * sqrt(list_dot_product("
        "eb.embedding::DOUBLE[], eb.embedding::DOUBLE[])))"
    )
    return (
        "WITH qe AS (SELECT vec_id, list_transform(embedding, "
        "x -> floor(CAST(x AS DOUBLE) * 1000)) AS q FROM embeddings), "
        "b AS (SELECT vec_id, " + ", ".join(band_cols) + " FROM qe), "
        + ok_ctes + ", "
        "pairs AS (SELECT DISTINCT a.vec_id AS id_a, c.vec_id AS id_b "
        f"FROM b a JOIN b c ON a.vec_id < c.vec_id AND ({same_bucket})) "
        f"SELECT p.id_a, p.id_b, round({cos}, 4) AS sim "
        "FROM pairs p JOIN embeddings ea ON ea.vec_id = p.id_a "
        "JOIN embeddings eb ON eb.vec_id = p.id_b "
        f"WHERE round({cos}, 4) >= 0.4"
    )


def corpus_apply_dedup(spark, sf):
    """The dedup story END-TO-END: corpus in, cleaned corpus out.
    dedup_embedding_cosine finds near-dup PAIRS, dedup_cc_embedding
    closes them into components — this op applies the verdict,
    keeping exactly one canonical doc (the min-id member) per
    component plus every singleton, i.e. what actually ships to
    training.

    Scale shape: the drop list (clustered non-canonical ids) is tiny
    relative to the corpus — a near-dup component of size k drops
    k-1 rows — so the final left_anti join broadcasts the drop side
    and the corpus never shuffles; everything upstream inherits the
    capped-bucket discipline of the pair stage."""
    clusters = dedup_cc_embedding(spark, sf)
    drop = clusters.filter(
        F.col("vec_id") != F.col("component")
    ).select("vec_id")
    return _emb(spark, sf).join(
        F.broadcast(drop), "vec_id", "left_anti"
    ).select("vec_id", "label")


def _apply_dedup_sql() -> str:
    """Oracle for corpus_apply_dedup: the recursive-CTE component
    labels (same as _cc_sql) filtered to non-canonical members, as a
    NOT IN against the corpus."""
    return (
        "SELECT e.vec_id, e.label FROM embeddings e "
        "WHERE e.vec_id NOT IN (SELECT vec_id FROM "
        f"({_cc_sql()}) c WHERE vec_id <> component)"
    )


def _cc_sql() -> str:
    """DuckDB oracle for dedup_cc_embedding: the SAME bit-exact pair
    set (_emb_dedup_sql) closed transitively with a recursive CTE —
    reach(id, comp) enumerates every (node, reachable node) pair, so
    min(comp) per id is exactly the min-label the Spark propagation
    converges to.  Reach is O(sum of component²) rows: fine for an
    oracle at sf0.01, which is why the distributed side iterates
    instead."""
    return (
        "WITH RECURSIVE "
        f"dup AS (SELECT id_a, id_b FROM ({_emb_dedup_sql()}) t), "
        "edges AS (SELECT id_a AS src, id_b AS dst FROM dup "
        "UNION ALL SELECT id_b, id_a FROM dup), "
        "reach(id, comp) AS ("
        "SELECT DISTINCT src, src FROM edges "
        "UNION "
        "SELECT e.dst, r.comp FROM reach r JOIN edges e ON e.src = r.id), "
        "labels AS (SELECT id AS vec_id, min(comp) AS component "
        "FROM reach GROUP BY id) "
        "SELECT vec_id, component, "
        "count(*) OVER (PARTITION BY component)::BIGINT AS cluster_size "
        "FROM labels"
    )


def emb_dist_to_centroid(spark, sf):
    """Per-vector distance to its own label centroid — the embedding
    QC pass every labeled corpus runs: vectors far from their class
    prototype are mislabels, outliers, or drift, and the distance
    column is what the curation threshold is read off of.

    Scale shape: the centroid is the emb_centroid_per_label aggregate
    (posexplode → ONE map-side-combined hash agg, O(labels × dim)
    result) and joins back BROADCAST — the corpus-side exploded frame
    never shuffles for the join; the distance sum is then one hash agg
    keyed by vec_id with map-side combine.  Both engines average the
    identical float32 values in doubles and round the centroid to 6 dp
    BEFORE the distance arithmetic, so the compounding inputs are
    identical; the final distance is rounded to 6 dp (sum-order ulps
    ~1e-15, far inside the rounding — the ann_cosine_topk precedent).
    """
    e = _emb(spark, sf)
    ex = e.select(
        "vec_id",
        "label",
        F.posexplode("embedding").alias("pos", "v"),
    ).withColumn("v", F.col("v").cast("double"))
    cent = ex.groupBy("label", "pos").agg(
        F.round(F.avg("v"), 6).alias("c")
    )
    diff = ex.join(F.broadcast(cent), ["label", "pos"])
    return (
        diff.groupBy("vec_id", "label")
        .agg(
            F.sum(
                (F.col("v") - F.col("c")) * (F.col("v") - F.col("c"))
            ).alias("ss")
        )
        .select(
            "vec_id", "label", F.round(F.sqrt("ss"), 6).alias("dist")
        )
    )


PACK_SHARDS = 8  # packing shards (at 100 TB: corpus / shard-target)
PACK_BUDGET = 1024  # tokens per packed training sequence


def corpus_pack_sequences(spark, sf):
    """GPT-style sequence packing — the last tokenizer-side step of
    training-data prep: concatenate documents in a deterministic
    pseudorandom order and chunk the token stream into fixed
    PACK_BUDGET-token blocks, recording where each document lands
    (its start offset and the first/last block it touches).  Trainers
    then stream blocks; documents straddling a boundary are split
    across consecutive blocks — the standard concatenate-then-chunk
    regime.

    Determinism + scale shape: docs are sharded by md5(doc_id) mod K
    and ordered by (md5-prefix, doc_id) WITHIN each shard — the same
    parallelism-invariant pure-function-of-key discipline as
    corpus_shard_shuffle, so the packing is identical on 4 cores or
    4000 executors.  The running token offset is a per-SHARD window
    (never a global single-partition window — the thing that dies at
    10^10 docs); K is sized so a shard's token stream fits a task.
    Token counts are the module's standard whitespace-class split, so
    both engines count identically."""
    d = _docs(spark, sf)
    n_tok = F.size(
        F.filter(
            F.split("text", r"[ \t\n\r\f\x0B]+"), lambda x: x != ""
        )
    ).cast("long")
    h = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
    ).cast("long")
    t = d.select(
        "doc_id",
        n_tok.alias("n_tok"),
        h.alias("h"),
        (h % PACK_SHARDS).cast("int").alias("shard"),
    )
    w = Window.partitionBy("shard").orderBy("h", "doc_id")
    packed = t.withColumn(
        "start_tok",
        F.sum("n_tok").over(w.rowsBetween(Window.unboundedPreceding, 0))
        - F.col("n_tok"),
    )
    return packed.select(
        "doc_id",
        "shard",
        "n_tok",
        "start_tok",
        F.floor(F.col("start_tok") / PACK_BUDGET)
        .cast("long")
        .alias("first_block"),
        F.floor(
            (F.col("start_tok") + F.greatest("n_tok", F.lit(1)) - 1)
            / PACK_BUDGET
        )
        .cast("long")
        .alias("last_block"),
    )


_QA_ACCURACY = 10_000  # GK sketch accuracy: rank error <= n / accuracy


def docs_quantiles_approx(spark, sf):
    """Sketch-based per-language length quantiles via
    ``percentile_approx`` — the scale path next to docs_quantiles'
    exact histogram-CDF: the Greenwald-Khanna sketch is partial-
    aggregable (map-side combine, mergeable across partitions), costs
    O(accuracy) state per group regardless of row count, and bounds
    RANK error at n / accuracy — the right tool when the column is
    continuous or the distinct-value histogram itself is too wide.

    rows-only at the driver: the sketch's chosen order statistic is
    implementation-specific (DuckDB's approx_quantile uses t-digest —
    a different sketch with a different answer), so there is no
    cross-engine value oracle; pytest instead pins the CONTRACT —
    every approximate value is a real order statistic of its group
    whose rank is within n/accuracy of the exact target rank
    (tests/test_pipeline.py)."""
    d = _docs(spark, sf)
    qs = d.groupBy("lang").agg(
        F.percentile_approx(
            "n_chars", [0.5, 0.95, 0.99], F.lit(_QA_ACCURACY)
        ).alias("qs")
    )
    # explode to the scalar grain (the emb_quantize_int8 lesson; pos
    # maps 0/1/2 -> p50/p95/p99)
    return qs.select(
        "lang", F.posexplode("qs").alias("pos", "approx_n_chars")
    ).select(
        "lang",
        F.element_at(
            F.array(F.lit(50), F.lit(95), F.lit(99)), F.col("pos") + 1
        ).alias("pct"),
        F.col("approx_n_chars").cast("long").alias("approx_n_chars"),
    )


TEXT_JACCARD_SLICE = 30  # docs in the exact pairwise slice


def text_jaccard_pairs(spark, sf):
    """EXACT pairwise word-set Jaccard over a bounded document slice —
    the ground-truth complement to the rows-only LSH dedup keys
    (dedup_minhash_lsh / dedup_ngram_jaccard approximate exactly this
    quantity): every pair in the slice gets its true similarity, fully
    SQL-checkable, so the driver holds a value-exact oracle for the
    similarity arithmetic the approximate keys build on.

    Scale shape: this is by design a BOUNDED baseline — the slice is
    capped at TEXT_JACCARD_SLICE docs (≤ n·(n−1)/2 pairs), the token
    sets live in-array (array_distinct of the module's standard
    whitespace split, same class as docs_tfidf so Java and RE2 \\s
    divergence can't bite), and the self-join broadcasts the tiny
    slice — at 100 TB the UNBOUNDED version of this query is exactly
    what the LSH keys exist to avoid (their caps + dropped-bucket
    reports are the scale path; this key is their truth set).
    |a∪b| is computed as |a|+|b|−|a∩b| on BOTH engines rather than via
    a union function, so set-size semantics cannot diverge."""
    d = _docs(spark, sf).filter(F.col("doc_id") < TEXT_JACCARD_SLICE)
    toks = F.array_distinct(
        F.filter(
            F.split("text", r"[ \t\n\r\f\x0B]+"), lambda x: x != ""
        )
    )
    t = d.select("doc_id", toks.alias("toks"))
    a = t.select(
        F.col("doc_id").alias("doc_a"), F.col("toks").alias("ta")
    )
    b = t.select(
        F.col("doc_id").alias("doc_b"), F.col("toks").alias("tb")
    )
    pairs = a.join(F.broadcast(b), F.col("doc_a") < F.col("doc_b"))
    ni = F.size(F.array_intersect("ta", "tb"))
    denom = F.size("ta") + F.size("tb") - ni
    return pairs.select(
        "doc_a",
        "doc_b",
        ni.cast("bigint").alias("n_common"),
        F.when(denom > 0, F.round(ni / denom, 6))
        .otherwise(F.lit(0.0))
        .alias("jaccard"),
    )


# ------------------------------------------------------------- registries

PIPE_FNS = {
    "text_jaccard_pairs": text_jaccard_pairs,
    "corpus_pack_sequences": corpus_pack_sequences,
    "docs_quantiles_approx": docs_quantiles_approx,
    "emb_dist_to_centroid": emb_dist_to_centroid,
    "dedup_exact": dedup_exact,
    "dedup_exact_hash": dedup_exact_hash,
    "dedup_keep_best": dedup_keep_best,
    "dedup_minhash_lsh": dedup_minhash_lsh,
    "dedup_ngram_jaccard": dedup_ngram_jaccard,
    "dedup_simhash": dedup_simhash,
    "dedup_embedding_cosine": dedup_embedding_cosine,
    "dedup_cc_embedding": dedup_cc_embedding,
    "dedup_cc_minhash": dedup_cc_minhash,
    "corpus_apply_dedup": corpus_apply_dedup,
    "ann_cosine_topk": ann_cosine_topk,
    "ann_lsh_bucketed": ann_lsh_bucketed,
    "ann_lsh_multiprobe": ann_lsh_multiprobe,
    "ann_ivf_bucketed": ann_ivf_bucketed,
    "text_tokens": text_tokens,
    "text_quality": text_quality,
    "text_langid": text_langid,
    "text_repetition": text_repetition,
    "corpus_shard_shuffle": corpus_shard_shuffle,
    "emb_quantize_int8": emb_quantize_int8,
    "sample_stratified": sample_stratified,
    "text_pii_scrub": text_pii_scrub,
    "docs_length_histogram": docs_length_histogram,
    "docs_quantiles": docs_quantiles,
    "emb_centroid_per_label": emb_centroid_per_label,
    "docs_ngram_topk": docs_ngram_topk,
    "decontaminate_ngram": decontaminate_ngram,
    "doc_fingerprint": doc_fingerprint,
    "multimodal_decode": multimodal_decode,
    "multimodal_resize": multimodal_resize,
    "multimodal_frame_sample": multimodal_frame_sample,
    "multimodal_audio_features": multimodal_audio_features,
    "dedup_phash_hamming": dedup_phash_hamming,
}

PIPE_SQL: dict[str, str | None] = {
    # same md5-prefix hash arithmetic as corpus_shard_shuffle (h is a
    # non-negative 32-bit prefix, so % == pmod) and the docs_tfidf
    # whitespace class; constants interpolated so retuning cannot
    # desynchronize engine and oracle
    "corpus_pack_sequences": (
        "WITH t AS (SELECT doc_id, "
        "len(list_filter(string_split_regex(text, "
        "'[ \\t\\n\\r\\f\\x0B]+'), x -> x <> ''))::BIGINT AS n_tok, "
        "('0x' || substring(md5(doc_id::VARCHAR), 1, 8))::BIGINT AS h "
        "FROM documents), "
        f"s AS (SELECT doc_id, n_tok, h, (h % {PACK_SHARDS})::INTEGER "
        "AS shard FROM t), "
        "p AS (SELECT doc_id, shard, n_tok, "
        "sum(n_tok) OVER (PARTITION BY shard ORDER BY h, doc_id "
        "ROWS UNBOUNDED PRECEDING) - n_tok AS start_tok FROM s) "
        # start_tok is a window-sum in DuckDB and therefore HUGEINT;
        # the driver hashes dtypes, so cast to BIGINT to match Spark's
        # long (r4 driver hash-fail; VERDICT r4 item 1)
        "SELECT doc_id, shard, n_tok, start_tok::BIGINT AS start_tok, "
        f"(start_tok // {PACK_BUDGET})::BIGINT AS first_block, "
        "((start_tok + greatest(n_tok, 1) - 1) "
        f"// {PACK_BUDGET})::BIGINT AS last_block FROM p"
    ),
    "docs_quantiles_approx": None,  # sketch choice is impl-specific
    # centroid rounded to 6 dp BEFORE the distance on both engines so
    # the compounding inputs are identical; pos is an internal join
    # key (0-based Spark, 1-based DuckDB — consistent within each)
    "emb_dist_to_centroid": (
        "WITH ex AS (SELECT vec_id, label, "
        "generate_subscripts(embedding, 1) AS pos, "
        "unnest(embedding::DOUBLE[]) AS v FROM embeddings), "
        "cent AS (SELECT label, pos, round(avg(v), 6) AS c FROM ex "
        "GROUP BY label, pos), "
        "d AS (SELECT e.vec_id, e.label, "
        "sum((e.v - c.c) * (e.v - c.c)) AS ss FROM ex e JOIN cent c "
        "ON e.label = c.label AND e.pos = c.pos "
        "GROUP BY e.vec_id, e.label) "
        "SELECT vec_id, label, round(sqrt(ss), 6) AS dist FROM d"
    ),
    # same whitespace class as docs_tfidf; |a∪b| = |a|+|b|−|a∩b| on
    # both engines (list_intersect and array_intersect both return
    # distinct elements)
    "text_jaccard_pairs": (
        "WITH t AS (SELECT doc_id, list_distinct(list_filter("
        "string_split_regex(text, '[ \\t\\n\\r\\f\\x0B]+'), "
        "x -> x <> '')) AS toks FROM documents "
        f"WHERE doc_id < {TEXT_JACCARD_SLICE}) "
        "SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, "
        "len(list_intersect(a.toks, b.toks))::BIGINT AS n_common, "
        "CASE WHEN len(a.toks) + len(b.toks) "
        "- len(list_intersect(a.toks, b.toks)) > 0 THEN "
        "round(len(list_intersect(a.toks, b.toks)) / (len(a.toks) "
        "+ len(b.toks) - len(list_intersect(a.toks, b.toks))), 6) "
        "ELSE 0.0 END AS jaccard "
        "FROM t a JOIN t b ON a.doc_id < b.doc_id"
    ),
    "dedup_exact": (
        "SELECT min(doc_id) AS keep_id, count(*)::BIGINT AS n_copies "
        "FROM documents GROUP BY text"
    ),
    "dedup_exact_hash": (
        "SELECT sha256(text) AS text_sha, min(doc_id) AS keep_id, "
        "count(*)::BIGINT AS n_copies FROM documents GROUP BY sha256(text)"
    ),
    # whitespace spelled as an explicit class (== Java \s incl. \x0B;
    # RE2's bare \s would EXCLUDE \x0B and diverge); 'g' = Spark's
    # replace-all default; winner = longest copy, ties to min doc_id
    "dedup_keep_best": (
        "WITH g AS (SELECT sha256(regexp_replace(lower(trim(text)), "
        "'[ \\t\\n\\r\\f\\x0B]+', ' ', 'g')) AS grp, doc_id, n_chars "
        "FROM documents), "
        "m AS (SELECT grp, max(n_chars) AS keep_chars, "
        "count(*)::BIGINT AS n_copies FROM g GROUP BY grp) "
        "SELECT m.grp, min(g.doc_id) AS keep_id, m.keep_chars, "
        "m.n_copies FROM g JOIN m ON g.grp = m.grp "
        "AND g.n_chars = m.keep_chars "
        "GROUP BY m.grp, m.keep_chars, m.n_copies"
    ),
    "dedup_embedding_cosine": _emb_dedup_sql(),
    "dedup_cc_embedding": _cc_sql(),
    "corpus_apply_dedup": _apply_dedup_sql(),
    "ann_cosine_topk": (
        "WITH scored AS (SELECT q.vec_id AS query_id, "
        "c.vec_id AS neighbor_id, "
        "round(list_dot_product(q.embedding::DOUBLE[], "
        "c.embedding::DOUBLE[]) / (sqrt(list_dot_product("
        "q.embedding::DOUBLE[], q.embedding::DOUBLE[])) * "
        "sqrt(list_dot_product(c.embedding::DOUBLE[], "
        "c.embedding::DOUBLE[]))), 6) AS sim "
        "FROM embeddings q JOIN embeddings c "
        "ON q.vec_id < 5 AND c.vec_id <> q.vec_id) "
        "SELECT query_id, neighbor_id, round(sim, 4) AS sim, "
        "rank FROM (SELECT *, row_number() OVER (PARTITION BY query_id "
        "ORDER BY sim DESC, neighbor_id)::BIGINT AS rank FROM scored) "
        "WHERE rank <= 10"
    ),
    "text_tokens": (
        r"SELECT doc_id, len(regexp_split_to_array(trim(text), '\s+'))"
        r"::BIGINT AS n_ws, len(regexp_extract_all(text, "
        r"'\w+|[^\w\s]'))::BIGINT AS n_lex FROM documents"
    ),
    "text_quality": (
        r"SELECT doc_id, length(text)::BIGINT AS n_chars_m, "
        r"len(regexp_split_to_array(trim(text), '\s+'))::BIGINT "
        r"AS n_words, "
        r"round(length(regexp_replace(text, '[^.!?,;:]', '', 'g')) "
        r"/ length(text)::DOUBLE, 4) AS punct_ratio, "
        r"round(len(regexp_extract_all(lower(text), "
        r"'\b(the|and|of|to|a|in|is)\b')) / "
        r"len(regexp_split_to_array(trim(text), '\s+'))::DOUBLE, 4) "
        r"AS stop_ratio, "
        r"(len(regexp_split_to_array(trim(text), '\s+')) BETWEEN 5 AND "
        r"2000 AND length(regexp_replace(text, '[^.!?,;:]', '', 'g')) "
        r"/ length(text)::DOUBLE < 0.2) AS keep FROM documents"
    ),
    "text_langid": (
        r"WITH s AS (SELECT lang, "
        r"len(regexp_extract_all(lower(text), '\b(the|and|of|to|a|in|is)\b')) AS s_en, "
        r"len(regexp_extract_all(lower(text), '\b(el|la|de|que|los|una)\b')) AS s_es, "
        r"len(regexp_extract_all(lower(text), '\b(der|die|und|das|ein|nicht)\b')) AS s_de, "
        r"len(regexp_extract_all(lower(text), '\b(le|la|les|et|une|dans)\b')) AS s_fr, "
        r"len(regexp_extract_all(lower(text), '\b(de|shi|bu|le|zai|you)\b')) AS s_zh "
        r"FROM documents), p AS (SELECT lang, CASE "
        r"WHEN greatest(s_en, s_es, s_de, s_fr, s_zh) <= 0 THEN 'und' "
        r"WHEN s_en = greatest(s_en, s_es, s_de, s_fr, s_zh) THEN 'en' "
        r"WHEN s_es = greatest(s_en, s_es, s_de, s_fr, s_zh) THEN 'es' "
        r"WHEN s_de = greatest(s_en, s_es, s_de, s_fr, s_zh) THEN 'de' "
        r"WHEN s_fr = greatest(s_en, s_es, s_de, s_fr, s_zh) THEN 'fr' "
        r"ELSE 'zh' END AS predicted FROM s) "
        r"SELECT lang, predicted, count(*)::BIGINT AS n FROM p "
        r"GROUP BY lang, predicted"
    ),
    # l[:len(l)-1] NOT l[:-1]: DuckDB's negative slice end is
    # inclusive-from-the-end, so l[:-1] is the WHOLE list and list_zip
    # would pad a NULL bigram per doc.  Tokens = non-empty \s+ pieces
    # capped at REPETITION_SCAN_CAP, mirroring the Spark side.
    "text_repetition": (
        r"WITH t AS (SELECT doc_id, "
        r"list_slice(list_filter(regexp_split_to_array(text, '\s+'), "
        rf"x -> x != ''), 1, {REPETITION_SCAN_CAP}) AS l "
        r"FROM documents), b AS (SELECT doc_id, l, "
        r"len(l) AS n, list_transform("
        r"list_zip(l[:len(l)-1], l[2:]), x -> x[1] || ' ' || x[2]) "
        r"AS big FROM t), m AS (SELECT doc_id, n::BIGINT AS n_words, "
        r"CASE WHEN n > 0 THEN "
        r"round(len(list_distinct(l)) / n::DOUBLE, 6) ELSE 0.0 END "
        r"AS distinct_frac, "
        r"CASE WHEN n > 0 THEN "
        r"round(list_max(list_transform(list_distinct(l), "
        r"w -> len(list_filter(l, x -> x = w)))) / n::DOUBLE, 6) "
        r"ELSE 0.0 END AS top_word_frac, "
        r"CASE WHEN len(big) > 0 THEN round(1.0 - "
        r"len(list_distinct(big)) / len(big)::DOUBLE, 6) ELSE 0.0 END "
        r"AS dup_bigram_frac FROM b) "
        r"SELECT doc_id, n_words, distinct_frac, top_word_frac, "
        r"dup_bigram_frac, (distinct_frac >= 0.3 AND "
        r"top_word_frac <= 0.12 AND dup_bigram_frac <= 0.08) AS keep "
        r"FROM m"
    ),
    # h is a 32-bit hex prefix (non-negative), so % == pmod; the
    # modulus interpolates SHUFFLE_SHARDS so retuning K cannot
    # desynchronize engine and oracle
    "corpus_shard_shuffle": (
        "WITH t AS (SELECT doc_id, lang, "
        "('0x' || substring(md5(doc_id::VARCHAR), 1, 8))::BIGINT AS h "
        "FROM documents) "
        f"SELECT doc_id, lang, (h % {SHUFFLE_SHARDS})::INTEGER AS shard, "
        f"row_number() OVER (PARTITION BY h % {SHUFFLE_SHARDS} "
        "ORDER BY h, doc_id) AS pos FROM t"
    ),
    # exploded (vec_id, pos) grain — generate_subscripts and unnest of
    # the same-length list align row-for-row in DuckDB, mirroring
    # Spark's posexplode (pos is 0-based on both sides)
    "emb_quantize_int8": (
        "WITH m AS (SELECT vec_id, label, embedding, "
        "list_max(list_transform(embedding, x -> abs(x::DOUBLE))) AS mx "
        "FROM embeddings) "
        "SELECT vec_id, label, "
        "CASE WHEN mx > 0 THEN 127.0 / mx ELSE 0.0 END AS scale, "
        "generate_subscripts(embedding, 1) - 1 AS pos, "
        "unnest(list_transform(embedding, x -> CASE WHEN mx > 0 THEN "
        "round(x::DOUBLE * (127.0 / mx))::INTEGER ELSE 0 END)) AS code "
        "FROM m"
    ),
    "sample_stratified": (
        "SELECT lang, source, count(*)::BIGINT AS n_sampled, "
        "min(doc_id) AS min_doc_id, sum(n_chars)::BIGINT AS sum_chars "
        "FROM documents "
        "WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < "
        f"(CASE WHEN lang = 'en' THEN '{_STRATUM_HEX['en']}' "
        f"ELSE '{_STRATUM_HEX_DEFAULT}' END) "
        "GROUP BY lang, source"
    ),
    "text_pii_scrub": (
        "WITH s AS (SELECT doc_id, text, regexp_replace(regexp_replace("
        f"text, '{_PII_EMAIL}', '<EMAIL>', 'g'), "
        f"'{_PII_LONGNUM}', '<NUM>', 'g') AS scrubbed FROM documents) "
        "SELECT doc_id, scrubbed, "
        "(length(text) - length(scrubbed))::BIGINT AS delta_chars FROM s"
    ),
    "docs_length_histogram": (
        "SELECT CAST(floor(n_chars / 100) AS BIGINT) AS bin, "
        "count(*)::BIGINT AS n_docs, sum(n_chars)::BIGINT AS sum_chars, "
        "min(n_chars) AS min_chars, max(n_chars) AS max_chars "
        "FROM documents GROUP BY 1"
    ),
    "docs_quantiles": (
        "SELECT lang, count(*)::BIGINT AS n, "
        + ", ".join(
            f"round(quantile_cont(n_chars, {p}), 4) AS p{int(p * 100)}"
            for p in _Q_PS
        )
        + " FROM documents GROUP BY lang"
    ),
    "emb_centroid_per_label": (
        "SELECT label, pos, round(avg(v), 6) AS c, "
        "count(*)::BIGINT AS n_vecs FROM ("
        "SELECT label, CAST(generate_subscripts(embedding, 1) - 1 AS INT) "
        "AS pos, unnest(embedding) AS v FROM embeddings) "
        "GROUP BY label, pos"
    ),
    "docs_ngram_topk": (
        "WITH g AS (SELECT lang, unnest(list_transform("
        "range(1, len(text) - 1), "
        "i -> substring(text, CAST(i AS INT), 3))) AS gram "
        "FROM documents WHERE len(text) >= 3), "
        "c AS (SELECT lang, gram, count(*)::BIGINT AS n FROM g "
        "GROUP BY 1, 2) "
        "SELECT lang, gram, n, rk FROM (SELECT lang, gram, n, "
        "row_number() OVER (PARTITION BY lang ORDER BY n DESC, gram)"
        "::BIGINT AS rk FROM c) WHERE rk <= 3"
    ),
    "decontaminate_ngram": (
        "WITH tok AS (SELECT doc_id, string_split(text, ' ') AS w "
        "FROM documents), "
        "gd AS (SELECT DISTINCT doc_id, gram FROM ("
        "SELECT doc_id, unnest(list_transform(range(1, len(w) - 3), "
        "i -> array_to_string(w[i:i + 4], ' '))) AS gram "
        "FROM tok WHERE len(w) >= 5)), "
        "bench AS (SELECT doc_id AS bench_id, gram FROM gd "
        "WHERE doc_id % 17 = 0), "
        "rare AS (SELECT gram FROM bench GROUP BY gram "
        "HAVING count(*) <= 10), "
        "b2 AS (SELECT bench_id, bench.gram FROM bench "
        "JOIN rare ON bench.gram = rare.gram), "
        "corpus AS (SELECT doc_id, gram FROM gd WHERE doc_id % 17 <> 0), "
        "shared AS (SELECT corpus.doc_id, b2.bench_id, "
        "count(*)::BIGINT AS n_shared FROM corpus "
        "JOIN b2 ON corpus.gram = b2.gram "
        "GROUP BY 1, 2 HAVING count(*) >= 3) "
        "SELECT doc_id, max(n_shared) AS max_shared, "
        "count(*)::BIGINT AS n_bench_docs FROM shared GROUP BY doc_id"
    ),
    # rows-only (pytest oracles in tests/test_pipeline.py):
    "dedup_minhash_lsh": None,
    "dedup_cc_minhash": None,  # pair stage is rows-only (no SQL equiv)
    "dedup_ngram_jaccard": None,
    "dedup_simhash": None,
    "ann_lsh_bucketed": None,
    "ann_lsh_multiprobe": None,
    "ann_ivf_bucketed": None,
    "doc_fingerprint": None,
    "multimodal_decode": None,
    "multimodal_resize": None,       # image decode — no SQL equivalent
    "multimodal_frame_sample": None,
    "multimodal_audio_features": None,
    "dedup_phash_hamming": None,  # image decode — no SQL equivalent
}
