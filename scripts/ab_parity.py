"""Interleaved HEAD-vs-pinned-commit parity A/B at one parallelism.

Purpose (round-3 close): the final-engine 10^8 payload-free pair
(BENCH/BASELINE.md §3j) read 0.689 with its two legs measured ~4 h
apart — inside §3i's documented 3.4x per-run drift, but a cross-batch
number all the same.  This harness answers the only attributable
question: did the engine CHANGE between the §3g criterion commit
(ceb72b1) and HEAD?  It interleaves the two engines back-to-back in
one batch at the SAME core count and input, so regime drift hits both
legs alike and any per-variant gap is the engine's.

Pin the baseline tree first (gitignored scratch, delete at round
close):  git worktree add .bench_eng/ceb ceb72b1

Usage: python scripts/ab_parity.py [reps=2] [n_rows=100000000] \
           [cpus=16] [payload=none] [base_name=ceb] [base_tree=.bench_eng/ceb]
Appends one line per leg to BENCH/ab_parity_<rows>_<cpus>c[_<payload>].log.
The baseline variant defaults to the §3g criterion engine pinned at
`.bench_eng/ceb`; pass a name + worktree path to A/B against any other
pinned commit (e.g. the round-2 close for headline-vs-headline
questions).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(tree: str, cpus: int, n_rows: int, payload: str) -> dict:
    env = dict(os.environ)
    env.update(
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_BENCH_N=str(n_rows),
        SPARK_GRAFT_BENCH_PAYLOAD=payload,
        PYTHONPATH=tree,
        # interleaving across variants IS this harness's rep scheme
        SPARK_GRAFT_BENCH_CRAWL_REPS="1",
        # parity legs only need the crawl number; the relational batch
        # would add a second SparkContext per leg for nothing
        SPARK_GRAFT_BENCH_SKIP_REL="1",
    )
    out = subprocess.run(
        [sys.executable, os.path.join(tree, "bench.py")],
        env=env,
        cwd=tree,
        capture_output=True,
        text=True,
        timeout=14400,
    )
    if out.returncode != 0:
        raise RuntimeError(
            f"bench.py ({tree}, {cpus} cpus, n={n_rows}) exited "
            f"{out.returncode}; stderr tail:\n{out.stderr[-4000:]}"
        )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    n_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000_000
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    payload = sys.argv[4] if len(sys.argv) > 4 else "none"
    base_name = sys.argv[5] if len(sys.argv) > 5 else "ceb"
    base_tree = (
        sys.argv[6]
        if len(sys.argv) > 6
        else os.path.join(REPO, ".bench_eng", "ceb")
    )
    variants = [("head", REPO), (base_name, base_tree)]
    suffix = "" if payload == "none" else f"_{payload}"
    log = os.path.join(
        REPO, "BENCH", f"ab_parity_{n_rows}_{cpus}c{suffix}.log"
    )
    with open(log, "a") as f:
        for rep in range(1, reps + 1):
            for name, tree in variants:
                r = run(tree, cpus, n_rows, payload)
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
