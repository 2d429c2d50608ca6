#!/usr/bin/env python3
"""Measure the machine's delivered parallel capacity with two probes, each
run in N independent worker processes (no I/O, no shared state, no JVM):

* ``cpu``  — sha1 over a 4KB buffer: cache-resident, pure ALU.  The ceiling
  for compute-bound work.
* ``mem``  — strided reads over a 256MB private numpy array: DRAM-streaming.
  The ceiling for byte-streaming work (which is what a WARC/CDX pipeline is:
  every payload byte crosses the memory bus several times).

On a shared VM the two ceilings differ a lot: vCPUs scale near-linearly but
the single socket's memory bandwidth is divided among workers.  A real
N->4N *executor* scale-out multiplies memory bandwidth with the nodes, so
the mem probe is the honest single-box ceiling for a bandwidth-bound job.

If hardware gives < 4x from N to 4N workers, no Spark job of that class can
reach 0.8 scaling efficiency on this box — BENCH.md reports both ceilings.
"""

import hashlib
import json
import multiprocessing as mp
import sys
import time

WORK_ITEMS = 6000
MEM_ITEMS = 192
_ARR = None


def burn(_):
    h = b"x" * 4096
    for _i in range(400):
        h = hashlib.sha1(h).digest() * 205  # ~10KB back in
    return len(h)


def _mem_init():
    global _ARR
    import numpy as np
    # 256MB per worker: far beyond LLC, forces DRAM streaming
    _ARR = np.arange(32 * 1024 * 1024, dtype=np.float64)


def stream(_):
    # one full pass (read + reduce) over 256MB
    return float(_ARR.sum())


def measure(workers: int, fn, items: int, init=None) -> float:
    with mp.Pool(workers, initializer=init) as pool:
        if init:
            pool.map(fn, range(workers), chunksize=1)  # touch pages, untimed
        t0 = time.time()
        pool.map(fn, range(items), chunksize=max(1, items // (workers * 8)))
        return time.time() - t0


if __name__ == "__main__":
    counts = [int(x) for x in sys.argv[1:]] or [8, 32]
    res = {}
    for w in counts:
        cpu_dt = measure(w, burn, WORK_ITEMS)
        mem_dt = measure(w, stream, MEM_ITEMS, init=_mem_init)
        res[str(w)] = {
            "cpu_wall_sec": round(cpu_dt, 2),
            "cpu_items_per_sec": round(WORK_ITEMS / cpu_dt, 1),
            "mem_wall_sec": round(mem_dt, 2),
            "mem_gb_per_sec": round(MEM_ITEMS * 0.25 / mem_dt, 2),
        }
    lo, hi = str(counts[0]), str(counts[-1])
    ideal = counts[-1] / counts[0]
    cpu_speedup = res[hi]["cpu_items_per_sec"] / res[lo]["cpu_items_per_sec"]
    mem_speedup = res[hi]["mem_gb_per_sec"] / res[lo]["mem_gb_per_sec"]
    res["ideal"] = ideal
    res["cpu_speedup"] = round(cpu_speedup, 3)
    res["mem_speedup"] = round(mem_speedup, 3)
    res["hardware_efficiency"] = round(cpu_speedup / ideal, 3)
    res["mem_bandwidth_efficiency"] = round(mem_speedup / ideal, 3)
    print(json.dumps(res))
