#!/usr/bin/env python3
"""Interleaved A/B of the 2b crawl workload (ONE production-shaped
generation: batch rows over a 4x web) between two repo checkouts —
old (default /tmp/repo_old_r4, a `git archive HEAD` snapshot) and new
(this working tree).  Pairs alternate old/new in the same host window,
each side best-of-2, so drift cancels pairwise.

Usage: python scripts/ab_crawl_2b.py [cores] [n_pages] [batch] [pairs] [old_repo]
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
spark = get_spark(app_name="ab2b-{tag}", cores={cores},
                  extra={{"spark.driver.extraJavaOptions": {jvm_opts!r}}})
spark.sparkContext.setLogLevel("ERROR")

def stat():
    with open('/proc/stat') as f:
        p = f.readline().split()
    return [int(x) for x in p[1:9]]

n_pages = {n_pages}
pages = synth_pages(spark, n_pages, n_hosts=n_pages // 20)
(pages.limit(4096).select(surt_key("url").alias("k"),
                          sha1_b32("html").alias("h"))
 .groupBy("k").count().count())
seeds = synth_seeds(spark, {batch}, n_pages, n_hosts=n_pages // 20)
robots = synth_robots(spark, n_hosts=n_pages // 20)
cfg = CrawlConfig(per_host_budget=64, global_batch={batch})

def one():
    s0, t0 = stat(), time.time()
    _f, _s, cdx, metrics = run_crawl(spark, pages, seeds, robots, cfg, 1)
    n_cdx = cdx.count()
    dt = time.time() - t0
    d = [b - a for a, b in zip(s0, stat())]
    tot = sum(m["scheduled"] + m["novel"] for m in metrics)
    ph = metrics[0].get("wall_phases") or {{}}
    return {{"urls_per_sec": round(tot / dt, 1), "wall": round(dt, 2),
             "cdx": n_cdx, "steal_frac": round(d[7] / max(3200.0 * dt, 1), 4),
             "phases": ph,
             "init": round(dt - sum(ph.values()), 2) if ph else None,
             "step": metrics[0].get("step_phases")}}

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
    def __init__(self, repo, tag, cores, n_pages, batch):
        self.p = subprocess.Popen(
            [sys.executable, "-u", "-c",
             CHILD.format(repo=repo, tag=tag, cores=cores, n_pages=n_pages,
                          batch=batch, jvm_opts=JVM_OPTS)],
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
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    n_pages = int(sys.argv[2]) if len(sys.argv) > 2 else 1600000
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 400000
    pairs = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    old_repo = sys.argv[5] if len(sys.argv) > 5 else "/tmp/repo_old_r4"
    new_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r_old = Runner(old_repo, "old", cores, n_pages, batch)
    r_old.ready()
    r_new = Runner(new_repo, "new", cores, n_pages, batch)
    r_new.ready()
    olds, news, speedups = [], [], []
    for _ in range(pairs):
        a = max(r_old.run(), r_old.run(), key=lambda r: r["urls_per_sec"])
        b = max(r_new.run(), r_new.run(), key=lambda r: r["urls_per_sec"])
        olds.append(a)
        news.append(b)
        speedups.append(round(b["urls_per_sec"] / a["urls_per_sec"], 3))
    r_old.quit()
    r_new.quit()
    print(json.dumps({
        "cores": cores, "n_pages": n_pages, "batch": batch,
        "old": olds, "new": news, "pair_speedups": speedups,
        "median_speedup": round(statistics.median(speedups), 3),
    }))


if __name__ == "__main__":
    main()
