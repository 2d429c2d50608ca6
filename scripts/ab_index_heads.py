#!/usr/bin/env python3
"""Interleaved A/B of the CDX index map between two repo checkouts
(e.g. round-2 HEAD vs working tree), reproducing bench.py's cdx_index
protocol exactly: local[32] + task.cpus=2 session, 1M synth records,
full-size untimed warm, then timed runs — but INTERLEAVED between two
live JVMs so this host's bursty steal cancels (the only valid
comparison protocol here; see BENCH.md §0).

Usage: ab_index_heads.py [old_repo] [new_repo] [n_records] [pairs]
"""
from __future__ import annotations

import json
import subprocess
import sys

CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
import os
os.environ["SPARK_GRAFT_DRIVER_MEM"] = "12g"
from cdx_writer_spark.session import get_spark
from bench import materialize, synth_warc_records
from cdx_writer_spark.operators.cdx import cdx_fields, cdx_lines
spark = get_spark(app_name="abidx-{tag}", cores=32,
                  extra={{"spark.task.cpus": "2",
                          "spark.driver.extraJavaOptions":
                          "-Xms12g -XX:+AlwaysPreTouch -XX:+UseParallelGC"}})
spark.sparkContext.setLogLevel("ERROR")
plan = cdx_lines(cdx_fields(synth_warc_records(spark, {n})))
materialize(plan)   # untimed full-size warm
print("READY", flush=True)
for line in sys.stdin:
    if line.strip() != "RUN":
        break
    t0 = time.time(); materialize(plan); dt = time.time() - t0
    print("RESULT %.3f" % dt, flush=True)
spark.stop()
"""


def spawn(repo, tag, n):
    code = CHILD.format(repo=repo, tag=tag, n=n)
    return subprocess.Popen([sys.executable, "-u", "-c", code], cwd=repo,
                            text=True, stdin=subprocess.PIPE,
                            stdout=subprocess.PIPE,
                            stderr=subprocess.DEVNULL)


def read(p, tag=""):
    for line in p.stdout:
        line = line.strip()
        if tag and line == tag:
            return None
        if line.startswith("RESULT "):
            return float(line[7:])
    raise RuntimeError("child died")


def run(p):
    p.stdin.write("RUN\n")
    p.stdin.flush()
    return read(p)


def main():
    old_repo = sys.argv[1] if len(sys.argv) > 1 else "/tmp/repo_r2"
    new_repo = sys.argv[2] if len(sys.argv) > 2 else "/root/repo"
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 1_000_000
    pairs = int(sys.argv[4]) if len(sys.argv) > 4 else 4

    def steal():
        with open("/proc/stat") as f:
            return int(f.readline().split()[8])

    old = spawn(old_repo, "old", n)
    read(old, "READY")
    new = spawn(new_repo, "new", n)
    read(new, "READY")
    olds, news, steals = [], [], []
    for _ in range(pairs):
        s0 = steal()
        # best-of-2 per side per pair, same as bench.py
        olds.append(min(run(old), run(old)))
        news.append(min(run(new), run(new)))
        steals.append(steal() - s0)
    for p in (old, new):
        p.stdin.write("QUIT\n")
        p.stdin.flush()
    print(json.dumps({
        "n": n, "old_sec": olds, "new_sec": news,
        "steal_jiffies": steals,
        "old_rows_per_sec": [round(n / t, 1) for t in olds],
        "new_rows_per_sec": [round(n / t, 1) for t in news],
        "pairwise_new_over_old": [round(o / x, 3)
                                  for o, x in zip(olds, news)]}))


if __name__ == "__main__":
    main()
