"""Synthetic bench frontier — FIXTURES.md §A8 / BASELINE.md protocol.

Generates a deterministic N-row seed frontier over H hosts with
zipf(1.2) host skew (hot-host share ≈ 19% at H=10^4 — the skew the
salted politeness windows must absorb, SURVEY op A5).  URLs are real
pages of the deterministic synthetic web (fixtures/webgen.py), so the
bench exercises the full fetch→extract→decode pipeline, not a no-op.

Generation is fully distributed and collect()-free: host assignment is
an inverse-CDF lookup on a hash of the row id (vectorized numpy inside
``mapInPandas``), so the same (N, H, seed) always produces the same
frontier at any parallelism — a 10^10-row frontier generates the same
way on a real cluster (scale knob is just ``spark.range(N)``).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession

SEED = 42
ALPHA = 1.2


def zipf_cdf(n_hosts: int, alpha: float = ALPHA) -> np.ndarray:
    w = np.arange(1, n_hosts + 1, dtype=np.float64) ** -alpha
    return np.cumsum(w) / w.sum()


def frontier_frame(
    spark: SparkSession, n_rows: int, n_hosts: int = 10_000, seed: int = SEED
) -> DataFrame:
    """(seed_rank, raw_url) frame for SparkCrawler.run_frontier."""
    cdf = zipf_cdf(n_hosts)
    cdf_b = spark.sparkContext.broadcast(cdf)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        c = cdf_b.value
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            # splitmix-style deterministic hash -> uniform [0, 1)
            z = (ids.astype(np.uint64) + np.uint64(seed)) * np.uint64(
                0x9E3779B97F4A7C15
            )
            z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
            z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
            u = (z >> np.uint64(11)).astype(np.float64) / float(1 << 53)
            hosts = np.searchsorted(c, u, side="right")
            urls = [
                f"http://h{h}.example.test/p/{i}"
                for h, i in zip(hosts, ids)
            ]
            yield pd.DataFrame({"seed_rank": ids, "raw_url": urls})

    return spark.range(n_rows).mapInPandas(gen, "seed_rank long, raw_url string")


def write_frontier(
    spark: SparkSession,
    path: str,
    n_rows: int,
    n_hosts: int = 10_000,
    seed: int = SEED,
) -> None:
    frontier_frame(spark, n_rows, n_hosts, seed).write.mode(
        "overwrite"
    ).parquet(path)
