#!/usr/bin/env python3
"""Measure the machine's actual parallel CPU capacity: a pure-CPU kernel
(sha1 over bytes, no I/O, no shared state) run in N worker processes.

If hardware gives < 4x from 8 to 32 workers, no Spark job can reach 0.8
scaling efficiency on this box — the BENCH.md report needs this ceiling."""

import hashlib
import json
import multiprocessing as mp
import sys
import time

WORK_ITEMS = 6000


def burn(_):
    h = b"x" * 4096
    for _i in range(400):
        h = hashlib.sha1(h).digest() * 205  # ~10KB back in
    return len(h)


def measure(workers: int) -> float:
    with mp.Pool(workers) as pool:
        t0 = time.time()
        pool.map(burn, range(WORK_ITEMS), chunksize=WORK_ITEMS // (workers * 8))
        return time.time() - t0


if __name__ == "__main__":
    counts = [int(x) for x in sys.argv[1:]] or [8, 32]
    res = {}
    for w in counts:
        dt = measure(w)
        res[str(w)] = {"wall_sec": round(dt, 2),
                       "items_per_sec": round(WORK_ITEMS / dt, 1)}
    lo, hi = str(counts[0]), str(counts[-1])
    speedup = res[hi]["items_per_sec"] / res[lo]["items_per_sec"]
    res["speedup"] = round(speedup, 3)
    res["ideal"] = counts[-1] / counts[0]
    res["hardware_efficiency"] = round(speedup / (counts[-1] / counts[0]), 3)
    print(json.dumps(res))
