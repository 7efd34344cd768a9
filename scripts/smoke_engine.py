"""Manual smoke: engine vs oracle on a tiny graph (debug loop)."""

import shutil
import sys
import tempfile
import time

from pyspark.sql import SparkSession

from spider_1_spark.engine import Policy, SparkCrawler
from spider_1_spark.engine.crawler import FAIR_SCHEDULER_XML
from spider_1_spark.fixtures.webgen import SyntheticWeb, make_seeds
from spider_1_spark.reference_model import spider1_ref as ref


def main():
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("smoke")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.scheduler.mode", "FAIR")
        .config("spark.scheduler.allocation.file", FAIR_SCHEDULER_XML)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    web = SyntheticWeb(n_hosts=8)
    seeds = make_seeds(4, 8)
    policy = Policy(
        max_depth=3, per_host_wave_budget=2, per_host_total_cap=5,
        global_page_budget=50,
    )
    t0 = time.time()
    oracle = ref.crawl(seeds, policy, web)
    print(f"oracle: {time.time()-t0:.2f}s waves={oracle.n_waves} "
          f"log={len(oracle.crawl_log)} seen={len(oracle.seen)} "
          f"images={len(oracle.images)} counters={oracle.counters}")

    root = tempfile.mkdtemp(prefix="spider1_state_")
    try:
        t0 = time.time()
        eng = SparkCrawler(spark, policy, web, root)
        art = eng.run(seeds)
        print(f"engine: {time.time()-t0:.2f}s waves={art.n_waves} "
              f"counters={art.counters}")

        log = sorted(
            (r.seq, r.url, r.depth, r.parent_rank, r.link_pos, r.wave_id)
            for r in art.crawl_log.collect()
        )
        olog = [tuple(t) for t in oracle.crawl_log]
        if log != olog:
            print("ORDER MISMATCH")
            for i, (a, b) in enumerate(zip(olog, log)):
                if a != b:
                    print(f"  first diff at {i}:\n   oracle {a}\n   engine {b}")
                    break
            print(f"  lens oracle={len(olog)} engine={len(log)}")
        else:
            print("ordering OK")

        seen = {
            r.url: (r.first_wave, r.depth, r.parent_rank, r.link_pos)
            for r in art.seen.collect()
        }
        if seen != oracle.seen:
            extra = set(seen) - set(oracle.seen)
            missing = set(oracle.seen) - set(seen)
            print(f"SEEN MISMATCH extra={sorted(extra)[:5]} missing={sorted(missing)[:5]}")
            both = [u for u in seen if u in oracle.seen and seen[u] != oracle.seen[u]]
            for u in both[:5]:
                print(f"  meta diff {u}: oracle={oracle.seen[u]} engine={seen[u]}")
        else:
            print("seen OK")

        imgs = sorted(
            (r.image_id, bytes(r.bytes), r.w, r.h, r.fmt, r.caption, r.phash)
            for r in art.images.collect()
        )
        oimgs = sorted(oracle.images)
        print("images OK" if imgs == oimgs else
              f"IMAGES MISMATCH engine={len(imgs)} oracle={len(oimgs)}")

        print("counters OK" if art.counters == oracle.counters else
              f"COUNTERS MISMATCH {art.counters} vs {oracle.counters}")
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
