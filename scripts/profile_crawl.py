"""Event-log profiler for the crawl bench — per-stage scaling attribution.

Runs the same crawl as bench.py (same knobs) with Spark event logging
enabled, then parses the event log into a per-stage table: executor
run time (cpu-parallel work), task count, and the *serial* span each
stage contributed to the wall clock.  Comparing two runs at different
`SPARK_GRAFT_CPUS` shows exactly which stages scale with cores and
which are fixed cost — the input the BASELINE.md §3 efficiency
analysis needs.

Usage:
  SPARK_GRAFT_CPUS=16 SPARK_GRAFT_BENCH_N=1000000 \
      python scripts/profile_crawl.py /tmp/evt16
  python scripts/profile_crawl.py --parse /tmp/evt16   # re-parse only
"""

from __future__ import annotations

import json
import os
import sys
from collections import defaultdict

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def run(evt_dir: str) -> None:
    import bench

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))
    n_rows = int(os.environ.get("SPARK_GRAFT_BENCH_N", "1000000"))
    n_hosts = int(os.environ.get("SPARK_GRAFT_BENCH_HOSTS", "10000"))
    os.makedirs(evt_dir, exist_ok=True)
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(
            os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
        )
        .config("spark.executorEnv.PYTHONPATH", REPO)
        .config("spark.network.maxRemoteBlockSizeFetchToMem", "64m")
        .config(
            "spark.executor.memory",
            os.environ.get("SPARK_GRAFT_EXEC_MEM", "4g"),
        )
        .appName("spider1-profile")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.scheduler.mode", "FAIR")
        .config("spark.scheduler.allocation.file", bench._FAIR_XML)
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", evt_dir)
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    try:
        bench.crawl_bench(spark, 20_000, 200, warm=True)  # warm-up
        res = bench.crawl_bench(spark, n_rows, n_hosts)
        print(json.dumps({"cpus": cpus, **{k: res[k] for k in
                          ("elapsed_s", "urls_per_sec", "n_waves")}}))
    finally:
        spark.stop()


def parse(evt_dir: str, top: int = 40) -> None:
    files = [os.path.join(evt_dir, f) for f in os.listdir(evt_dir)
             if not f.startswith(".")]
    path = max(files, key=os.path.getmtime)
    if os.path.isdir(path):  # eventlog_v2 rolling dir
        path = max(
            (os.path.join(path, f) for f in os.listdir(path)
             if "appstatus" not in f),
            key=os.path.getmtime,
        )
    stages = {}           # sid -> dict
    stage_tasks = defaultdict(lambda: [0, 0.0, 0.0, 0.0])
    # sid -> [n_tasks, sum_run_ms, sum_deser+ser, sum_py]
    if path.endswith(".zstd"):
        import io

        import pyarrow as pa

        text = io.TextIOWrapper(
            pa.input_stream(path, compression="zstd"), encoding="utf-8"
        )
    else:
        text = open(path)
    for line in text:
        try:
            e = json.loads(line)
        except json.JSONDecodeError:
            continue
        ev = e.get("Event")
        if ev == "SparkListenerStageCompleted":
            si = e["Stage Info"]
            sid = si["Stage ID"]
            sub = si.get("Submission Time")
            comp = si.get("Completion Time")
            stages[sid] = {
                "name": si["Stage Name"],
                "details": (si.get("Details") or "").split("\n")[0][:120],
                "wall_ms": (comp - sub) if sub and comp else 0,
                "sub": sub or 0,
                "n_part": si.get("Number of Tasks"),
            }
        elif ev == "SparkListenerTaskEnd":
            sid = e["Stage ID"]
            tm = e.get("Task Metrics") or {}
            rec = stage_tasks[sid]
            rec[0] += 1
            rec[1] += tm.get("Executor Run Time", 0)
            rec[2] += (tm.get("Executor Deserialize Time", 0)
                       + tm.get("Result Serialization Time", 0))
            sch = e.get("Task Info", {})
            rec[3] += max(0, sch.get("Launch Time", 0) and 0)
    rows = []
    for sid, s in stages.items():
        n, run_ms, overhead, _ = stage_tasks.get(sid, [0, 0, 0, 0])
        rows.append((s["wall_ms"], run_ms, n, sid, s["name"], s["sub"]))
    rows.sort(key=lambda r: -r[0])
    t0 = min((r[5] for r in rows if r[5]), default=0)
    total_wall = sum(r[0] for r in rows)
    total_run = sum(r[1] for r in rows)
    print(f"{'wall_s':>7} {'cpu_s':>8} {'tasks':>6} {'sid':>5} "
          f"{'t+':>7}  stage")
    for wall, run_ms, n, sid, name, sub in rows[:top]:
        print(f"{wall/1e3:7.2f} {run_ms/1e3:8.2f} {n:6d} {sid:5d} "
              f"{(sub-t0)/1e3:7.1f}  {name[:70]}")
    print(f"\nTOTAL stage-wall {total_wall/1e3:.1f}s  "
          f"task-cpu {total_run/1e3:.1f}s  file={os.path.basename(path)}")


if __name__ == "__main__":
    if sys.argv[1] == "--parse":
        parse(sys.argv[2], int(sys.argv[3]) if len(sys.argv) > 3 else 40)
    else:
        run(sys.argv[1])
