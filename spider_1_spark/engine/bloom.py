"""Partitioned Bloom URL-seen prefilter — SURVEY §2 op A6 (SPEC-4).

BASELINE.json:6,14: "partitioned Bloom/cuckoo URL-seen filter
maintained as … state tables at 10^10-URL scale".  Design:

  * the seen set is sharded by ``shard = h1(url) % S`` where h1 is the
    first half of a 128-bit blake2b of the URL (process-stable, shared
    by probe and update paths); each shard owns a fixed-size numpy
    bitmap sidecar, versioned like every other state table
    (``bloom/v=<n>/shard-<k>.npy``) and committed under the same
    manifest (SPEC-12 resume covers it);
  * per wave, the NEW seen URLs are partitioned by shard and each task
    ORs its shard's new bits into the previous version's bitmap
    (incremental; write = O(new urls + bitmap));
  * the probe is fused into the fetch/extract Arrow stage
    (``probe_pandas``): each worker lazily caches the shard bitmaps it
    touches — no extra shuffle.  At 10^10 URLs (thousands of larger
    shards on shared storage) the standalone shard-aligned ``probe``
    stage bounds per-task I/O instead;
  * ZERO false negatives by construction (bits only set for real
    URLs — property-tested in tests/test_properties.py); false
    positives are resolved by the exact join on the (small)
    maybe-seen side.

Bits: k=4 positions via Kirsch–Mitzenmacher double hashing
(g_i = h1 + i*h2) over an m-bit bitmap per shard.
"""

from __future__ import annotations

import hashlib
import io as _io
import os
from typing import Iterator, Protocol, runtime_checkable

import numpy as np
import pandas as pd

BLOOM_K = 4


@runtime_checkable
class ShardIO(Protocol):
    """Byte-level shard-file storage with an ATOMIC publish.

    The bloom commit protocol needs exactly one storage property: a
    shard file at its final key is either absent or a complete payload
    — a reader must never observe a torn write (a partial bitmap would
    produce bloom FALSE NEGATIVES, which the engine's zero-FN contract
    forbids).  ``write_atomic`` is the publish point.

    Backends:
      * ``LocalShardIO`` — tmp-file + fsync + ``os.replace`` (POSIX
        rename atomicity), the single-machine / HDFS-mounted impl;
      * object stores need NO rename: a single full-object PUT is
        already all-or-nothing on S3/GCS/ABFS (the key is absent until
        the PUT completes, then serves the full payload).  Exactly-one
        -writer per shard is guaranteed upstream by the shard-keyed
        repartition in ``update`` — where that cannot be relied on,
        use a conditional PUT (S3 ``If-None-Match: *`` on versioned
        keys / GCS ``ifGenerationMatch=0``) so a duplicate speculative
        task fails instead of double-publishing.  Shard keys are
        versioned (``v=<n>/shard-<k>``), never rewritten in place, so
        read-after-write consistency of NEW keys (which all three major
        stores guarantee) is sufficient.
    """

    def read(self, path: str) -> bytes | None:
        """Full payload at ``path``, or None if absent."""
        ...

    def write_atomic(self, path: str, payload: bytes) -> None:
        """Publish ``payload`` at ``path`` all-or-nothing."""
        ...

    def list_version_dirs(self, base: str) -> list[tuple[int, str]]:
        """(version, dir-path) pairs under ``base`` (``v=<n>`` layout).
        On an object store this is a prefix listing."""
        ...

    def delete_dir(self, path: str) -> None:
        """Remove a version directory and its shard objects (prefix
        delete on an object store).  Used by crash-residue pruning, so
        it must tolerate a partially-written directory."""
        ...


class LocalShardIO:
    """Local-filesystem ShardIO: tmp + fsync + rename commit."""

    def read(self, path: str) -> bytes | None:
        try:
            with open(path, "rb") as f:
                return f.read()
        except FileNotFoundError:
            return None

    def write_atomic(self, path: str, payload: bytes) -> None:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(payload)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)
        # the rename is atomic but not durable until the DIRECTORY
        # entry is flushed: a power loss after the wave's manifest
        # commits could otherwise revert the shard to its previous
        # version — a bloom false negative on resume
        dfd = os.open(os.path.dirname(path), os.O_RDONLY)
        try:
            os.fsync(dfd)
        finally:
            os.close(dfd)

    def list_version_dirs(self, base: str) -> list[tuple[int, str]]:
        import re

        if not os.path.isdir(base):
            return []
        out = []
        for d in os.listdir(base):
            m = re.match(r"^v=(\d+)$", d)
            if m:
                out.append((int(m.group(1)), os.path.join(base, d)))
        return out

    def delete_dir(self, path: str) -> None:
        import shutil

        shutil.rmtree(path, ignore_errors=True)


def _hashes(urls) -> tuple[np.ndarray, np.ndarray]:
    """Two stable 64-bit hashes per url (blake2b-128 split)."""
    h1 = np.empty(len(urls), dtype=np.uint64)
    h2 = np.empty(len(urls), dtype=np.uint64)
    for i, u in enumerate(urls):
        d = hashlib.blake2b(u.encode("utf-8"), digest_size=16).digest()
        h1[i] = int.from_bytes(d[:8], "big")
        h2[i] = int.from_bytes(d[8:], "big") | 1  # odd -> full cycle
    return h1, h2


def bit_positions(urls, m_bits: int) -> np.ndarray:
    """(n, BLOOM_K) bit indices in [0, m_bits)."""
    h1, h2 = _hashes(urls)
    idx = np.empty((len(urls), BLOOM_K), dtype=np.uint64)
    for i in range(BLOOM_K):
        idx[:, i] = (h1 + np.uint64(i) * h2) % np.uint64(m_bits)
    return idx


class BloomStore:
    """Versioned shard-file bloom sidecars under the state root.

    All storage goes through a ``ShardIO`` (default ``LocalShardIO``)
    so the commit point is pluggable per deployment — the store itself
    never opens files (see ShardIO for the object-store mapping)."""

    def __init__(self, root: str, n_shards: int = 32, m_bits: int = 1 << 22,
                 io: ShardIO | None = None):
        self.base = os.path.join(root, "bloom")
        self.n_shards = n_shards
        self.m_bits = m_bits
        self.io: ShardIO = io if io is not None else LocalShardIO()

    def vdir(self, version: int) -> str:
        return os.path.join(self.base, f"v={version}")

    def shard_path(self, version: int, shard: int) -> str:
        return os.path.join(self.vdir(version), f"shard-{shard}.npy")

    def load_shard(self, version: int, shard: int) -> np.ndarray:
        """Bitmap for a shard at a version (latest ≤ version; zeros if
        never written — untouched shards are never copied forward)."""
        for v in range(version, -1, -1):
            payload = self.io.read(self.shard_path(v, shard))
            if payload is not None:
                return np.load(_io.BytesIO(payload))
        return np.zeros(self.m_bits // 8, dtype=np.uint8)

    def write_shard(self, version: int, shard: int, bits: np.ndarray) -> None:
        buf = _io.BytesIO()
        np.save(buf, bits, allow_pickle=False)
        self.io.write_atomic(self.shard_path(version, shard), buf.getvalue())

    def prune(self, keep_max: int) -> None:
        """Delete version dirs above the committed manifest (crash
        residue) — through the ShardIO so non-local backends prune
        their stale objects too (a survivor above keep_max would be
        read back as live bits by ``load_shard``'s fallback)."""
        for v, path in self.io.list_version_dirs(self.base):
            if v > keep_max:
                self.io.delete_dir(path)


def probe_pandas(
    urls: pd.Series,
    bloom: BloomStore,
    version: int,
    shard_cache: dict[int, np.ndarray],
) -> np.ndarray:
    """Worker-side probe of one pandas batch (no extra shuffle) —
    fused into the fetch/extract stage by operators.fetch_extract."""
    h1, h2 = _hashes(urls)
    shards = (h1 % np.uint64(bloom.n_shards)).astype(np.int64)
    hit = np.zeros(len(urls), dtype=bool)
    for shard in np.unique(shards):
        bm = shard_cache.get(int(shard))
        if bm is None:
            bm = bloom.load_shard(version, int(shard))
            shard_cache[int(shard)] = bm
        sel = shards == shard
        h = np.ones(int(sel.sum()), dtype=bool)
        for i in range(BLOOM_K):
            pos = (h1[sel] + np.uint64(i) * h2[sel]) % np.uint64(bloom.m_bits)
            byte = (pos >> np.uint64(3)).astype(np.int64)
            bit = (pos & np.uint64(7)).astype(np.int64)
            h &= (bm[byte] >> bit) & 1 == 1
        hit[sel] = h
    return hit


def probe(df, bloom: BloomStore, version: int, url_col: str = "url"):
    """Standalone shard-ALIGNED probe stage (the 10^10-scale variant):
    repartitions by shard so each task loads few sidecars."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    n_shards = bloom.n_shards

    @F.pandas_udf(T.IntegerType())
    def shard_udf(urls: pd.Series) -> pd.Series:
        h1, _ = _hashes(urls)
        return pd.Series((h1 % np.uint64(n_shards)).astype(np.int32))

    df = df.withColumn("_shard", shard_udf(F.col(url_col)))
    out_schema = df.schema.add("maybe_seen", "boolean")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[int, np.ndarray] = {}
        for pdf in batches:
            if pdf.empty:
                continue
            pdf = pdf.copy()
            pdf["maybe_seen"] = probe_pandas(
                pdf[url_col], bloom, version, cache
            )
            yield pdf

    return (
        df.repartition(n_shards, "_shard")
        .mapInPandas(gen, out_schema)
        .drop("_shard")
    )


def update(new_urls_df, bloom: BloomStore, prev_version: int,
           new_version: int) -> None:
    """OR the new URLs' bits into each touched shard.

    Tasks are partitioned by the TRUE shard key (same blake2b-derived
    shard as the probe) so exactly one task owns each shard file —
    concurrent writers to one shard would lose bits (false negatives).
    Untouched shards are found at older versions by ``load_shard``.
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    n_shards = bloom.n_shards

    @F.pandas_udf(T.IntegerType())
    def shard_udf(urls: pd.Series) -> pd.Series:
        h1, _ = _hashes(urls)
        return pd.Series((h1 % np.uint64(n_shards)).astype(np.int32))

    df = new_urls_df.select(
        F.col("url"), shard_udf(F.col("url")).alias("_shard")
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc: dict[int, np.ndarray] = {}
        for pdf in batches:
            for shard, grp in pdf.groupby("_shard"):
                bm = acc.get(int(shard))
                if bm is None:
                    bm = bloom.load_shard(prev_version, int(shard)).copy()
                    acc[int(shard)] = bm
                h1, h2 = _hashes(grp["url"])
                for i in range(BLOOM_K):
                    pos = (h1 + np.uint64(i) * h2) % np.uint64(bloom.m_bits)
                    byte = (pos >> np.uint64(3)).astype(np.int64)
                    bit = (pos & np.uint64(7)).astype(np.int64)
                    np.bitwise_or.at(bm, byte, (1 << bit).astype(np.uint8))
        for shard, bm in acc.items():
            bloom.write_shard(new_version, shard, bm)
            yield pd.DataFrame({"shard": [shard], "n": [1]})

    df.repartition(n_shards, "_shard").mapInPandas(
        gen, "shard int, n int"
    ).count()
