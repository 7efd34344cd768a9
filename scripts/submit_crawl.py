"""spark-submit entry point for the distributed crawl (SURVEY §3 EP1).

    spark-submit --master local[32] \
        --py-files dist/spider_1_spark.zip \
        scripts/submit_crawl.py \
        --frontier /path/frontier.parquet --state-root /tmp/crawl_state \
        --hosts 10000 --wave-budget 64 --max-depth 0

Resumable: re-running with the same --state-root continues from the
last committed wave (SPEC-12).  The synthetic web store stands in for
the fetch layer; a requests-backed store plugs into the same
``web`` interface on a networked cluster (SURVEY §7 "not built").
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--frontier", required=True, help="seed frontier parquet "
                   "(seed_rank long, raw_url string)")
    p.add_argument("--state-root", required=True)
    p.add_argument("--hosts", type=int, default=10_000)
    p.add_argument("--max-depth", type=int, default=0)
    p.add_argument("--wave-budget", type=int, default=64)
    p.add_argument("--host-cap", type=int, default=1 << 40)
    p.add_argument("--global-budget", type=int, default=1 << 40)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--max-waves", type=int, default=None,
                   help="stop after N waves (resumable later)")
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    # FAIR pools keep each wave's critical path ahead of the previous
    # wave's lagging sink writes (engine/fairscheduler.xml).  The
    # allocation file is driver-side only, but when the package ships
    # as a --py-files zip its data files are zip-internal paths Spark
    # cannot open — extract to a real file first.
    from spider_1_spark.engine.crawler import FAIR_SCHEDULER_XML

    fair_xml = FAIR_SCHEDULER_XML
    if not os.path.isfile(fair_xml):
        import importlib.resources
        import tempfile

        data = (
            importlib.resources.files("spider_1_spark.engine")
            .joinpath("fairscheduler.xml")
            .read_bytes()
        )
        fd, fair_xml = tempfile.mkstemp(suffix=".xml", prefix="fairsched")
        with os.fdopen(fd, "wb") as f:
            f.write(data)

    spark = (
        SparkSession.builder.appName("spider1-crawl")
        .config("spark.scheduler.mode", "FAIR")
        .config("spark.scheduler.allocation.file", fair_xml)
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    # Spark's 200-partition default makes every per-wave job pay
    # 200-task scheduling overhead on small clusters (measured: ~2.3
    # min/wave at local[4] vs ~15 s with a parallelism-derived count).
    # Respect an explicit --conf; otherwise size to the cluster.
    if not spark.sparkContext.getConf().contains(
        "spark.sql.shuffle.partitions"
    ):
        spark.conf.set(
            "spark.sql.shuffle.partitions",
            str(2 * spark.sparkContext.defaultParallelism),
        )

    from spider_1_spark.engine import Policy, SparkCrawler
    from spider_1_spark.fixtures.webgen import SyntheticWeb

    policy = Policy(
        max_depth=args.max_depth,
        per_host_wave_budget=args.wave_budget,
        per_host_total_cap=args.host_cap,
        global_page_budget=args.global_budget,
    )
    crawler = SparkCrawler(
        spark, policy, SyntheticWeb(args.hosts), args.state_root
    )
    t0 = time.time()
    if args.resume:
        art = crawler.resume(max_waves=args.max_waves)
    else:
        art = crawler.run_frontier(
            spark.read.parquet(args.frontier), max_waves=args.max_waves
        )
    out = {
        "elapsed_s": round(time.time() - t0, 2),
        "n_waves": art.n_waves,
        "counters": art.counters,
        "images_rows": art.images.count(),
        "crawl_log_rows": art.crawl_log.count(),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
