"""Two-cluster-size scaling evidence — BASELINE.md protocol step 2.

Runs bench.py as subprocesses at local[8] and local[32] on identical
input (same N, hosts, seed) and appends raw JSON lines to
BENCH/scaling_raw.jsonl.  Efficiency = (thr@32 / thr@8) / 4, target
>= 0.8 (BASELINE.json:2,14; sandbox stand-in for N vs 4N executors).

Usage: python scripts/scaling_bench.py [N_ROWS ...]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(cpus: int, n_rows: int) -> dict:
    env = dict(os.environ)
    env.update(
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_BENCH_N=str(n_rows),
        PYTHONPATH=REPO,
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=3600,
    )
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [1_000_000, 10_000_000]
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    raw_path = os.path.join(REPO, "BENCH", "scaling_raw.jsonl")
    with open(raw_path, "a") as f:
        for n in sizes:
            r8 = run(8, n)
            print(f"n={n} local[8]: {r8['value']} urls/s "
                  f"({r8['queries']['crawl_frontier']}s)", flush=True)
            f.write(json.dumps(r8) + "\n")
            f.flush()
            r32 = run(32, n)
            print(f"n={n} local[32]: {r32['value']} urls/s "
                  f"({r32['queries']['crawl_frontier']}s)", flush=True)
            f.write(json.dumps(r32) + "\n")
            f.flush()
            eff = (r32["value"] / r8["value"]) / 4.0
            print(f"n={n} efficiency (thr32/thr8)/4 = {eff:.3f}", flush=True)


if __name__ == "__main__":
    main()
