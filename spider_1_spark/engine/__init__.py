"""Distributed crawl engine (SURVEY §2 Layer A, §3 EP1/EP2)."""

from spider_1_spark.engine.crawler import CrawlArtifacts, SparkCrawler
from spider_1_spark.engine.state import ParquetSnapshotStore
from spider_1_spark.reference_model.spider1_ref import Policy

__all__ = ["CrawlArtifacts", "SparkCrawler", "ParquetSnapshotStore", "Policy"]
