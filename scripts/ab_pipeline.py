"""Interleaved 3-way engine A/B — defeats this VM's regime drift.

BENCH/BASELINE.md §1: identical configs drift ±15-30% (and whole
half-hour regimes shift ~1.5x), so cross-batch comparison is invalid;
engine-change attribution must interleave variants within one batch.
Variants are full extracted trees (git archive) under .bench_eng/ so
each subprocess imports exactly one engine version:

  old  = cb89f2f  end-of-prior-snapshot engine
  jvm  = d026106  + JVM-side global fetch rank
  pipe = <repo>   + depth-exhausted harvest pipelining (HEAD)

Usage: python scripts/ab_pipeline.py [reps=3] [n_rows=1000000] [cpus=16]
Appends one line per run to BENCH/ab_pipeline_16c_1e6.log.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# Engine variants are PINNED WORKING TREES under .bench_eng/ (gitignored
# scratch, deleted at round close — VERDICT r2 item 8).  To re-pin for a
# new A/B:  git worktree add .bench_eng/<name> <commit>  (or cp -r the
# repo and check out the commit there); each tree just needs bench.py +
# spider_1_spark/ importable via PYTHONPATH=<tree>.
VARIANTS = [
    ("old", os.path.join(REPO, ".bench_eng", "old")),
    ("jvm", os.path.join(REPO, ".bench_eng", "jvm")),
    ("pipe", REPO),
]


def run(tree: str, cpus: int, n_rows: int) -> dict:
    env = dict(os.environ)
    env.update(
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_BENCH_N=str(n_rows),
        PYTHONPATH=tree,
        # interleaving across variants IS this harness's rep scheme
        SPARK_GRAFT_BENCH_CRAWL_REPS="1",
    )
    out = subprocess.run(
        [sys.executable, os.path.join(tree, "bench.py")],
        env=env,
        cwd=tree,
        capture_output=True,
        text=True,
        timeout=3600,
    )
    # a failed bench must surface its stderr, not die as a JSON/index
    # error on an empty stdout (ADVICE r2)
    if out.returncode != 0:
        raise RuntimeError(
            f"bench.py ({tree}, {cpus} cpus, n={n_rows}) exited "
            f"{out.returncode}; stderr tail:\n{out.stderr[-4000:]}"
        )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    n_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    log = os.path.join(REPO, "BENCH", "ab_pipeline_16c_1e6.log")
    with open(log, "a") as f:
        for rep in range(1, reps + 1):
            for name, tree in VARIANTS:
                r = run(tree, cpus, n_rows)
                line = (
                    f"{name} rep{rep}: {r['value']} urls/s "
                    f"{r['queries']['crawl_frontier']} s "
                    f"(counters fetched={r['counters']['fetched']} "
                    f"deduped={r['counters']['deduped']} "
                    f"deferred={r['counters']['deferred']})"
                )
                print(line, flush=True)
                f.write(line + "\n")
                f.flush()


if __name__ == "__main__":
    main()
