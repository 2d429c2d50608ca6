#!/usr/bin/env python3
"""Interleaved A/B of the crawl loop between two CrawlConfig overrides
(SAME repo code, two live JVMs at the same core count).  Pairs alternate
A/B in the same host window, each side best-of-2, so minute-scale host
drift cancels pairwise (BENCH.md protocol).

Usage:
  python scripts/ab_cfg.py CORES N_PAGES BATCH GENS PAIRS CFG_A CFG_B [SEEDS]
e.g. the overlap-plan lever at the 3-generation headline shape:
  python scripts/ab_cfg.py 32 200000 50000 3 3 '{}' '{"overlap_plan": true}'
or bloom vs cuckoo seen filters:
  python scripts/ab_cfg.py 32 200000 50000 3 3 \
      '{"bloom_min_keys": 1}' '{"seen_filter": "cuckoo", "bloom_min_keys": 1}'
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

JVM_OPTS = "-Xms12g -XX:+AlwaysPreTouch -XX:+UseParallelGC"

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
os.environ["SPARK_GRAFT_DRIVER_MEM"] = "12g"
from cdx_writer_spark.session import get_spark
from cdx_writer_spark.sources.synth import synth_pages, synth_robots, synth_seeds
from cdx_writer_spark.frontier.crawl import CrawlConfig, run_crawl
from cdx_writer_spark.functions.udfs import sha1_b32, surt_key
spark = get_spark(app_name="abcfg-{tag}", cores={cores},
                  extra={{"spark.driver.extraJavaOptions": {jvm_opts!r}}})
spark.sparkContext.setLogLevel("ERROR")

def stat():
    with open('/proc/stat') as f:
        p = f.readline().split()
    return [int(x) for x in p[1:9]]

n_pages = {n_pages}
n_hosts = max(1000, n_pages // 20)
pages = synth_pages(spark, n_pages, n_hosts=n_hosts)
(pages.limit(4096).select(surt_key("url").alias("k"),
                          sha1_b32("html").alias("h"))
 .groupBy("k").count().count())
seeds = synth_seeds(spark, {seeds}, n_pages, n_hosts=n_hosts)
robots = synth_robots(spark, n_hosts=n_hosts)
cfg = CrawlConfig(per_host_budget=64, global_batch={batch}, **{overrides})

def one():
    s0, t0 = stat(), time.time()
    _f, _s, cdx, metrics = run_crawl(spark, pages, seeds, robots, cfg, {gens})
    n_cdx = cdx.count()
    dt = time.time() - t0
    d = [b - a for a, b in zip(s0, stat())]
    tot = sum(m["scheduled"] + m["novel"] for m in metrics)
    return {{"urls_per_sec": round(tot / dt, 1), "wall": round(dt, 2),
             "cdx": n_cdx,
             "overlapped_gens": sum(1 for m in metrics
                                    if m.get("plan_overlapped")),
             "steal_frac": round(d[7] / max(3200.0 * dt, 1), 4)}}

one()  # untimed warm
print("READY", flush=True)
for line in sys.stdin:
    if line.strip() == "RUN":
        print("RESULT " + json.dumps(one()), flush=True)
    elif line.strip() == "QUIT":
        break
spark.stop()
"""


class Runner:
    def __init__(self, repo, tag, cores, n_pages, batch, gens, overrides,
                 seeds):
        self.p = subprocess.Popen(
            [sys.executable, "-u", "-c",
             CHILD.format(repo=repo, tag=tag, cores=cores, n_pages=n_pages,
                          batch=batch, gens=gens, jvm_opts=JVM_OPTS,
                          overrides=repr(overrides), seeds=seeds)],
            cwd=repo, text=True, stdin=subprocess.PIPE,
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL)

    def ready(self):
        for line in self.p.stdout:
            if line.strip() == "READY":
                return
        raise RuntimeError("runner died before READY")

    def run(self):
        self.p.stdin.write("RUN\n")
        self.p.stdin.flush()
        for line in self.p.stdout:
            line = line.strip()
            if line.startswith("RESULT "):
                return json.loads(line[7:])
        raise RuntimeError("runner died")

    def quit(self):
        try:
            self.p.stdin.write("QUIT\n")
            self.p.stdin.flush()
            self.p.wait(timeout=60)
        except Exception:
            self.p.kill()


def main():
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    n_pages = int(sys.argv[2]) if len(sys.argv) > 2 else 200000
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 50000
    gens = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    pairs = int(sys.argv[5]) if len(sys.argv) > 5 else 3
    cfg_a = json.loads(sys.argv[6]) if len(sys.argv) > 6 else {}
    cfg_b = json.loads(sys.argv[7]) if len(sys.argv) > 7 else {}
    seeds = (int(sys.argv[8]) if len(sys.argv) > 8
             else max(500, n_pages // 10))
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r_a = Runner(repo, "A", cores, n_pages, batch, gens, cfg_a, seeds)
    r_a.ready()
    r_b = Runner(repo, "B", cores, n_pages, batch, gens, cfg_b, seeds)
    r_b.ready()
    a_runs, b_runs, speedups = [], [], []
    for _ in range(pairs):
        a = max(r_a.run(), r_a.run(), key=lambda r: r["urls_per_sec"])
        b = max(r_b.run(), r_b.run(), key=lambda r: r["urls_per_sec"])
        a_runs.append(a)
        b_runs.append(b)
        speedups.append(round(b["urls_per_sec"] / a["urls_per_sec"], 3))
    r_a.quit()
    r_b.quit()
    assert all(x["cdx"] == a_runs[0]["cdx"] for x in a_runs + b_runs), \
        "A/B output row counts diverge — not comparing the same work"
    print(json.dumps({
        "cores": cores, "n_pages": n_pages, "batch": batch, "gens": gens,
        "seeds": seeds, "cfg_a": cfg_a, "cfg_b": cfg_b,
        "a": a_runs, "b": b_runs, "pair_speedups_b_over_a": speedups,
        "median_speedup": round(statistics.median(speedups), 3),
    }))


if __name__ == "__main__":
    main()
