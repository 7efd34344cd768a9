"""Aggregate Spark event-log task metrics per stage: run vs real-cpu vs GC vs shuffle.

Companion to profile_crawl.py (same event-log dirs).  Usage:
  python scripts/parse_stage_metrics.py /tmp/evt16
"""
import io
import json
import os
import sys
from collections import defaultdict

import pyarrow as pa


def load(evt_dir):
    files = [os.path.join(evt_dir, f) for f in os.listdir(evt_dir) if not f.startswith(".")]
    path = max(files, key=os.path.getmtime)
    if os.path.isdir(path):
        path = max((os.path.join(path, f) for f in os.listdir(path) if "appstatus" not in f),
                   key=os.path.getmtime)
    if path.endswith(".zstd"):
        return io.TextIOWrapper(pa.input_stream(path, compression="zstd"), encoding="utf-8")
    return open(path)


def main(evt_dir):
    stages = {}
    agg = defaultdict(lambda: defaultdict(float))
    for line in load(evt_dir):
        try:
            e = json.loads(line)
        except json.JSONDecodeError:
            continue
        ev = e.get("Event")
        if ev == "SparkListenerStageCompleted":
            si = e["Stage Info"]
            stages[si["Stage ID"]] = si["Stage Name"]
        elif ev == "SparkListenerTaskEnd":
            sid = e["Stage ID"]
            tm = e.get("Task Metrics") or {}
            a = agg[sid]
            a["n"] += 1
            a["run_ms"] += tm.get("Executor Run Time", 0)
            a["cpu_ns"] += tm.get("Executor CPU Time", 0)
            a["gc_ms"] += tm.get("JVM GC Time", 0)
            srm = tm.get("Shuffle Read Metrics") or {}
            swm = tm.get("Shuffle Write Metrics") or {}
            a["sh_read"] += srm.get("Remote Bytes Read", 0) + srm.get("Local Bytes Read", 0)
            a["sh_write"] += swm.get("Shuffle Bytes Written", 0)
            a["sh_write_ms"] += swm.get("Shuffle Write Time", 0) / 1e6
            a["fetch_wait_ms"] += srm.get("Fetch Wait Time", 0)
            inm = tm.get("Input Metrics") or {}
            a["input"] += inm.get("Bytes Read", 0)
            outm = tm.get("Output Metrics") or {}
            a["output"] += outm.get("Bytes Written", 0)
            a["deser_ms"] += tm.get("Executor Deserialize Time", 0)
            a["spill"] += tm.get("Disk Bytes Spilled", 0)
    rows = []
    for sid, a in agg.items():
        rows.append((a["run_ms"] / 1e3, a["cpu_ns"] / 1e9, a["gc_ms"] / 1e3,
                     a["sh_read"] / 2**20, a["sh_write"] / 2**20, a["sh_write_ms"] / 1e3,
                     a["spill"] / 2**20, int(a["n"]), sid,
                     stages.get(sid, "?")[:60]))
    rows.sort(key=lambda r: -r[0])
    tot_run = sum(r[0] for r in rows)
    tot_cpu = sum(r[1] for r in rows)
    tot_gc = sum(r[2] for r in rows)
    tot_sw = sum(r[5] for r in rows)
    tot_spill = sum(r[6] for r in rows)
    print(f"{'run_s':>8} {'cpu_s':>8} {'gc_s':>6} {'shR_MB':>8} {'shW_MB':>8} "
          f"{'shWr_s':>6} {'spill':>7} {'n':>4} {'sid':>5}  stage")
    for r in rows[:30]:
        print(f"{r[0]:8.1f} {r[1]:8.1f} {r[2]:6.1f} {r[3]:8.0f} {r[4]:8.0f} "
              f"{r[5]:6.1f} {r[6]:7.0f} {r[7]:4d} {r[8]:5d}  {r[9]}")
    print(f"\nTOTAL run={tot_run:.0f}s real_cpu={tot_cpu:.0f}s gc={tot_gc:.0f}s "
          f"shuffle_write_time={tot_sw:.0f}s spill={tot_spill:.0f}MB "
          f"blocked(run-cpu-gc)={tot_run - tot_cpu - tot_gc:.0f}s")


if __name__ == "__main__":
    main(sys.argv[1])
