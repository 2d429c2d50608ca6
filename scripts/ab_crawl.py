#!/usr/bin/env python3
"""Interleaved A/B of the crawl loop: old (committed, /tmp/repo_old) vs new
(working tree), same JVM options, alternating runs so host drift cancels."""
from __future__ import annotations

import json
import subprocess
import sys

CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from cdx_writer_spark.session import get_spark
from bench import crawl_bench
spark = get_spark(app_name="ab-{tag}", cores={cores},
                  extra={{"spark.driver.extraJavaOptions":
                          "-Xms10g -XX:+AlwaysPreTouch -XX:+UseParallelGC"}})
spark.sparkContext.setLogLevel("ERROR")
crawl_bench(spark, {n}, generations=3)   # warm
print("READY", flush=True)
for line in sys.stdin:
    if line.strip() == "RUN":
        r = crawl_bench(spark, {n}, generations=3)
        print("RESULT " + json.dumps(r["crawl_sec"]), flush=True)
    else:
        break
spark.stop()
"""


def spawn(repo, tag, cores, n):
    code = CHILD.format(repo=repo, tag=tag, cores=cores, n=n)
    return subprocess.Popen([sys.executable, "-u", "-c", code], cwd=repo,
                            text=True, stdin=subprocess.PIPE,
                            stdout=subprocess.PIPE,
                            stderr=subprocess.DEVNULL)


def read_until(p, tag):
    for line in p.stdout:
        line = line.strip()
        if line == tag:
            return None
        if line.startswith("RESULT "):
            return json.loads(line[7:])
    raise RuntimeError("child died")


def run(p):
    p.stdin.write("RUN\n")
    p.stdin.flush()
    return read_until(p, "")


def main():
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 400000
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    old = spawn("/tmp/repo_old", "old", cores, n)
    read_until(old, "READY")
    new = spawn("/root/repo", "new", cores, n)
    read_until(new, "READY")
    olds, news = [], []
    for _ in range(rounds):
        olds.append(run(old))
        news.append(run(new))
    for p in (old, new):
        p.stdin.write("QUIT\n")
        p.stdin.flush()
    print(json.dumps({"old_sec": olds, "new_sec": news,
                      "pairwise_speedup": [round(o / x, 3)
                                           for o, x in zip(olds, news)]}))


if __name__ == "__main__":
    main()
