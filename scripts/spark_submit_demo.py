#!/usr/bin/env python3
"""Run the crawl via ``spark-submit --py-files`` on two multi-executor
cluster sizes (N and 4N executors) and report the scaling efficiency.

The north rule requires the job to run "via spark-submit --py-files on
multi-executor clusters at N and 4N executors".  No real cluster exists
in this sandbox; ``local-cluster[E,C,MEM]`` is Spark's closest honest
stand-in — it launches E SEPARATE executor JVMs (own block managers,
own python workers, real serialization between driver and executors),
unlike ``local[N]``'s single shared JVM.  Protocol per the host-noise
rules (BENCH.md): the two cluster sizes alternate A/B/A/B across fresh
launches (cluster spin-up excluded — each app warms untimed first),
best-of-2 per side, /proc/stat steal recorded per window.

Usage: python scripts/spark_submit_demo.py [pages] [batch] [gens] [rounds]
Prints one JSON line; BENCH.md records the numbers.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# N and 4N executors, 2 cores each (4 vs 16 cores total on the 32-vCPU
# host, leaving headroom for both drivers never overlapping)
LO = "local-cluster[2,2,8192]"
HI = "local-cluster[8,2,8192]"


def build_zip(tmp: str) -> str:
    zpath = os.path.join(tmp, "cdx_writer_spark.zip")
    pkg = os.path.join(REPO, "cdx_writer_spark")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    p = os.path.join(root, f)
                    z.write(p, os.path.relpath(p, REPO))
    return zpath


def steal_jiffies() -> int:
    with open("/proc/stat") as f:
        return int(f.readline().split()[8])


def run_once(master: str, zpath: str, tmp: str, pages: int, batch: int,
             gens: int) -> dict:
    submit = shutil.which("spark-submit") or os.path.join(
        os.path.dirname(sys.executable), "spark-submit")
    env = dict(os.environ)
    # neutral cwd + no repo on PYTHONPATH: the engine import must come
    # from the --py-files archive or the app fails
    env.pop("PYTHONPATH", None)
    env["PYSPARK_PYTHON"] = sys.executable
    s0 = steal_jiffies()
    out = subprocess.run(
        [submit, "--master", master, "--driver-memory", "8g",
         "--conf", "spark.executor.memory=6g",
         "--py-files", zpath,
         os.path.join(REPO, "scripts", "submit_crawl_job.py"),
         "--pages", str(pages), "--batch", str(batch),
         "--generations", str(gens)],
        cwd=tmp, env=env, capture_output=True, text=True, timeout=1800)
    steal = steal_jiffies() - s0
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            r = json.loads(line[len("RESULT "):])
            r["steal_jif"] = steal
            return r
    sys.stderr.write(out.stdout[-3000:] + "\n" + out.stderr[-5000:] + "\n")
    raise RuntimeError(f"no RESULT line from {master}")


def main() -> None:
    pages = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    gens = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    rounds = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    tmp = tempfile.mkdtemp(prefix="cdx_submit_")
    try:
        zpath = build_zip(tmp)
        lo_runs, hi_runs = [], []
        for i in range(rounds):
            lo_runs.append(run_once(LO, zpath, tmp, pages, batch, gens))
            print(f"  lo[{i}] {lo_runs[-1]}", file=sys.stderr, flush=True)
            hi_runs.append(run_once(HI, zpath, tmp, pages, batch, gens))
            print(f"  hi[{i}] {hi_runs[-1]}", file=sys.stderr, flush=True)
        lo = max(r["urls_per_sec"] for r in lo_runs)
        hi = max(r["urls_per_sec"] for r in hi_runs)
        res = {
            "masters": [LO, HI],
            "executors": [lo_runs[0]["executors"], hi_runs[0]["executors"]],
            "total_cores": [lo_runs[0]["total_cores"],
                            hi_runs[0]["total_cores"]],
            "pages": pages, "batch": batch, "generations": gens,
            "urls_per_sec_lo": lo, "urls_per_sec_hi": hi,
            "scaling_efficiency": round(hi / lo / 4, 3),
            "runs_lo": lo_runs, "runs_hi": hi_runs,
            "module_file": lo_runs[0]["module_file"],
        }
        print(json.dumps(res), flush=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
