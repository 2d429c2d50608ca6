#!/usr/bin/env python3
"""Two-cluster-size scaling evidence (BASELINE.md protocol): run the SAME
crawl job on the SAME input at N and 4N cores in separate JVMs, report
throughput at both plus efficiency = T(4N) / (4 * T(N)).

Usage: python scripts/scaling_bench.py [n_pages] [generations]
Writes BENCH.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

RUNNER = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from cdx_writer_spark.session import get_spark
from bench import crawl_bench
cores = {cores}
spark = get_spark(app_name="scaling-bench-%d" % cores, cores=cores)
spark.sparkContext.setLogLevel("ERROR")
res = crawl_bench(spark, {n_pages}, generations={gens})
res["cores"] = cores
print("SCALING_RESULT " + json.dumps(res))
"""


def run_at(cores: int, n_pages: int, gens: int, repo: str) -> dict:
    code = RUNNER.format(repo=repo, cores=cores, n_pages=n_pages, gens=gens)
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, cwd=repo, timeout=3600)
    for line in out.stdout.splitlines():
        if line.startswith("SCALING_RESULT "):
            return json.loads(line[len("SCALING_RESULT "):])
    raise RuntimeError(f"no result at cores={cores}:\n{out.stdout[-2000:]}\n"
                       f"{out.stderr[-2000:]}")


def main():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 300000
    gens = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    lo, hi = 8, 32

    r_lo = run_at(lo, n_pages, gens, repo)
    r_hi = run_at(hi, n_pages, gens, repo)
    eff = (r_hi["urls_per_sec"] / (hi / lo)) / r_lo["urls_per_sec"]
    result = {
        "n_pages": n_pages, "generations": gens,
        "cores_lo": lo, "cores_hi": hi,
        "urls_per_sec_lo": r_lo["urls_per_sec"],
        "urls_per_sec_hi": r_hi["urls_per_sec"],
        "wall_sec_lo": r_lo["crawl_sec"],
        "wall_sec_hi": r_hi["crawl_sec"],
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "pass": eff >= 0.8,
    }
    with open(os.path.join(repo, "BENCH.md"), "w") as f:
        f.write(f"""# BENCH — scaling evidence (N vs 4N cores)

Protocol (BASELINE.md): same deterministic synthetic crawl (Zipf hosts,
{n_pages} pages, {gens} generations, politeness + bloom seen-set) run in
separate JVMs at local[{lo}] (N) and local[{hi}] (4N); shuffle partitions
scale with cores (session.py).

| cores | wall sec | urls/sec (scheduled+discovered) |
|---|---|---|
| {lo} | {r_lo['crawl_sec']} | {r_lo['urls_per_sec']} |
| {hi} | {r_hi['crawl_sec']} | {r_hi['urls_per_sec']} |

**Scaling efficiency = throughput(4N) / (4 x throughput(N)) =
{result['scaling_efficiency']}** (target >= 0.8: {'PASS' if result['pass'] else 'FAIL'})

Skew mitigation in play: salted (host, salt) partial top-k before the exact
per-host politeness rank (salt factor {16}); AQE skew-join splitting enabled.
Raw: `{json.dumps(result)}`
""")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
