"""Versioned Parquet state store with atomic manifest commit.

SURVEY §1.4: BASELINE.json:6,14 call for Iceberg state tables, but the
sandbox has no Iceberg runtime jar and no network (SURVEY §0.5 [ENV]).
This module provides the ``ParquetSnapshotStore`` backend: versioned
directory layout ``<root>/<table>/v=<n>/part-*.parquet`` for snapshot
tables plus ``<root>/<table>/w=<wave>/`` for append tables, with a
single ``manifest.json`` whose atomic rename IS the commit point
(SPEC-12).  On a real cluster with Iceberg on the classpath the same
interface maps onto ``writeTo(...).append()`` / snapshot ids; nothing
outside this module touches storage paths directly.

Crash-safety contract (tests/test_checkpoint.py):
  * a wave writes new table versions and wave-partitioned appends FIRST,
    then renames the manifest — a crash anywhere before the rename leaves
    the previous manifest intact;
  * ``cleanup()`` at open/resume deletes any version/wave directories
    newer than the committed manifest (stale output of a crashed wave);
  * wave appends are overwrite-by-directory, so re-executing a wave
    after a crash is idempotent.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# ---------------------------------------------------------------- schemas

FRONTIER_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("host", T.StringType()),
        T.StructField("host_hash", T.LongType()),
        T.StructField("depth", T.IntegerType()),
        T.StructField("parent_rank", T.LongType()),
        T.StructField("link_pos", T.IntegerType()),
        T.StructField("discovered_wave", T.IntegerType()),
        T.StructField("state", T.StringType()),  # PENDING | DEFERRED
    ]
)

SEEN_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("host_hash", T.LongType()),
        T.StructField("first_wave", T.IntegerType()),
        T.StructField("depth", T.IntegerType()),
        T.StructField("parent_rank", T.LongType()),
        T.StructField("link_pos", T.IntegerType()),
    ]
)

HOSTS_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField("host_hash", T.LongType()),
        T.StructField("rules_json", T.StringType()),
        T.StructField("fetch_total", T.IntegerType()),
    ]
)

# exact driver sink schema, BASELINE.json:15 / FIXTURES §A5
IMAGES_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("bytes", T.BinaryType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("fmt", T.StringType()),
        T.StructField("caption", T.StringType()),
        T.StructField("phash", T.LongType()),
    ]
)

CRAWL_LOG_SCHEMA = T.StructType(
    [
        T.StructField("seq", T.LongType()),
        T.StructField("url", T.StringType()),
        T.StructField("depth", T.IntegerType()),
        T.StructField("parent_rank", T.LongType()),
        T.StructField("link_pos", T.IntegerType()),
        T.StructField("wave_id", T.IntegerType()),
    ]
)

METRICS_SCHEMA = T.StructType(
    [
        T.StructField("wave_id", T.IntegerType()),
        T.StructField("stage", T.StringType()),
        T.StructField("partition_id", T.IntegerType()),
        T.StructField("fetched", T.LongType()),
        T.StructField("deduped", T.LongType()),
        T.StructField("deferred", T.LongType()),
        T.StructField("dropped", T.LongType()),
        T.StructField("robots_blocked", T.LongType()),
        T.StructField("decode_failed", T.LongType()),
    ]
)

SCHEMAS = {
    "frontier": FRONTIER_SCHEMA,
    "seen": SEEN_SCHEMA,
    "hosts": HOSTS_SCHEMA,
    "images": IMAGES_SCHEMA,
    "crawl_log": CRAWL_LOG_SCHEMA,
    "metrics": METRICS_SCHEMA,
}

VERSIONED = ("frontier", "seen", "hosts")
APPEND = ("images", "crawl_log", "metrics")

_V_RE = re.compile(r"^v=(\d+)$")
_W_RE = re.compile(r"^w=(\d+)$")


class ParquetSnapshotStore:
    """Rename-commit snapshot store (SURVEY §1.4 backend b)."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    # ------------------------------------------------------- manifest

    @property
    def manifest_path(self) -> str:
        return os.path.join(self.root, "manifest.json")

    def read_manifest(self) -> dict | None:
        try:
            with open(self.manifest_path) as f:
                return json.load(f)
        except FileNotFoundError:
            return None

    def commit(self, manifest: dict) -> None:
        """Atomic commit point: tmp-write + os.replace (SPEC-12)."""
        fd, tmp = tempfile.mkstemp(dir=self.root, suffix=".manifest.tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(manifest, f, sort_keys=True)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self.manifest_path)

    def cleanup(self) -> None:
        """Delete dirs newer than the committed manifest (crash residue)."""
        m = self.read_manifest()
        versions = (m or {}).get("versions", {})
        wave = (m or {}).get("wave_id", -1)
        for name in VERSIONED:
            keep = versions.get(name, -1)
            self._prune(name, _V_RE, keep)
        for name in APPEND:
            self._prune(name, _W_RE, wave)

    def _prune(self, name: str, pat: re.Pattern, keep_max: int) -> None:
        base = os.path.join(self.root, name)
        if not os.path.isdir(base):
            return
        for d in os.listdir(base):
            m = pat.match(d)
            if m and int(m.group(1)) > keep_max:
                shutil.rmtree(os.path.join(base, d), ignore_errors=True)

    # ------------------------------------------------- versioned tables

    def version_path(self, name: str, version: int) -> str:
        return os.path.join(self.root, name, f"v={version}")

    def write_version(self, name: str, version: int, df: DataFrame) -> None:
        path = self.version_path(name, version)
        df.write.mode("overwrite").parquet(path)

    def read_version(self, name: str, version: int) -> DataFrame:
        return self._read(self.version_path(name, version), SCHEMAS[name])

    def read_delta_union(self, name: str, upto_version: int) -> DataFrame:
        """Union of v=0..upto_version for DELTA-stored tables.

        The ``seen`` table is append-only by nature (SPEC-4: URLs are
        only ever added), so each version directory holds only that
        wave's delta — the full set is the union.  This keeps the
        per-wave write O(new URLs) instead of O(total seen): rewriting
        the whole seen set every wave is O(W²) I/O and would be fatal
        at the 10^10-URL design point (SURVEY §6).  Maps directly onto
        Iceberg appends on a real cluster (§1.4).
        """
        paths = [
            self.version_path(name, v)
            for v in range(upto_version + 1)
            if self._has_parquet(self.version_path(name, v))
        ]
        if not paths:
            return self.spark.createDataFrame([], SCHEMAS[name])
        return self.spark.read.schema(SCHEMAS[name]).parquet(*paths)

    # ---------------------------------------------------- append tables

    def wave_path(self, name: str, wave: int) -> str:
        return os.path.join(self.root, name, f"w={wave}")

    def write_wave(self, name: str, wave: int, df: DataFrame) -> None:
        # overwrite-by-directory => idempotent wave re-execution
        df.write.mode("overwrite").parquet(self.wave_path(name, wave))

    def read_waves(self, name: str, upto_wave: int) -> DataFrame:
        paths = [
            self.wave_path(name, w)
            for w in range(upto_wave + 1)
            if self._has_parquet(self.wave_path(name, w))
        ]
        if not paths:
            return self.spark.createDataFrame([], SCHEMAS[name])
        return self.spark.read.schema(SCHEMAS[name]).parquet(*paths)

    # ----------------------------------------------------------- helpers

    @staticmethod
    def _has_parquet(path: str) -> bool:
        return os.path.isdir(path) and any(
            f.endswith(".parquet") for f in os.listdir(path)
        )

    def _read(self, path: str, schema: T.StructType) -> DataFrame:
        if not self._has_parquet(path):
            return self.spark.createDataFrame([], schema)
        return self.spark.read.schema(schema).parquet(path)
