"""Shared pytest fixtures — one SparkSession per test session.

SURVEY §0.5 [ENV]: local-mode Spark 4.1.2; Arrow enabled because every
Python crossing in the engine is a pandas UDF / mapInPandas stage
(BASELINE.json:15 "no per-row Python").
"""

from __future__ import annotations

import os
import sys

import pytest

# make `import spider_1_spark` work for spawned Python workers too
REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)
os.environ["PYTHONPATH"] = (
    REPO_ROOT + os.pathsep + os.environ.get("PYTHONPATH", "")
)


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .appName("spider1-spark-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "4g")
        .config("spark.sql.maxPlanStringLength", "1000000")
        .config("spark.scheduler.mode", "FAIR")
        .config(
            "spark.scheduler.allocation.file",
            os.path.join(
                REPO_ROOT, "spider_1_spark", "engine", "fairscheduler.xml"
            ),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.driver.extraJavaOptions", "-Dlog4j2.level=error")
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()
