"""Memory-bandwidth calibration — §1/§3d companion to the CPU probe.

The §1 pure-Python calibration is register-bound (LCG arithmetic) and
shows flat per-process speed through 16 concurrent processes — it
proves the box has 16+ real cores but says nothing about the MEMORY
subsystem those cores share.  Spark's shuffle/sort/cache-unroll stages
are bandwidth-bound, so this probe measures the aggregate copy
bandwidth N concurrent processes can extract: each process repeatedly
copies a 256 MB numpy array (read+write traffic, far beyond LLC).

Usage: python scripts/membw_probe.py [procs ...]   # default 1 2 4 8 16 32
Prints one JSON line per N: aggregate GB/s and per-process GB/s.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time

SIZE_MB = 256
REPS = 20


def worker(q) -> None:
    import numpy as np

    a = np.random.default_rng(0).integers(
        0, 255, size=SIZE_MB * 1024 * 1024, dtype=np.uint8
    )
    b = np.empty_like(a)
    # touch once so both buffers are faulted in before timing
    np.copyto(b, a)
    t0 = time.time()
    for _ in range(REPS):
        np.copyto(b, a)
    q.put(time.time() - t0)


def run(n: int) -> dict:
    q = mp.Queue()
    procs = [mp.Process(target=worker, args=(q,)) for _ in range(n)]
    for p in procs:
        p.start()
    times = [q.get() for _ in procs]
    for p in procs:
        p.join()
    # copy = read SIZE + write SIZE per rep
    gb_per_proc = REPS * 2 * SIZE_MB / 1024
    aggregate = sum(gb_per_proc / t for t in times)
    return {
        "procs": n,
        "agg_GBps": round(aggregate, 1),
        "per_proc_GBps": round(aggregate / n, 1),
        "max_proc_s": round(max(times), 2),
    }


if __name__ == "__main__":
    counts = [int(x) for x in sys.argv[1:]] or [1, 2, 4, 8, 16, 32]
    for n in counts:
        print(json.dumps(run(n)), flush=True)
