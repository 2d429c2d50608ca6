#!/usr/bin/env python3
"""Interleaved crawl-bench A/B across two core counts (same repo code)."""
from __future__ import annotations

import json
import subprocess
import sys

CHILD = r"""
import json, sys
sys.path.insert(0, "/root/repo")
from cdx_writer_spark.session import get_spark
from bench import crawl_bench
spark = get_spark(app_name="abcc", cores={cores},
                  extra={{"spark.driver.extraJavaOptions":
                          "-Xms10g -XX:+AlwaysPreTouch -XX:+UseParallelGC"}})
spark.sparkContext.setLogLevel("ERROR")
crawl_bench(spark, {n}, generations=3)
print("READY", flush=True)
for line in sys.stdin:
    if line.strip() != "RUN":
        break
    r = crawl_bench(spark, {n}, generations=3)
    print("RESULT %.1f" % r["urls_per_sec"], flush=True)
spark.stop()
"""


def spawn(cores, n):
    code = CHILD.format(cores=cores, n=n)
    return subprocess.Popen([sys.executable, "-u", "-c", code],
                            cwd="/root/repo", text=True,
                            stdin=subprocess.PIPE, stdout=subprocess.PIPE,
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
    c1 = int(sys.argv[1])
    c2 = int(sys.argv[2])
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 200000
    rounds = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    a = spawn(c1, n)
    read(a, "READY")
    b = spawn(c2, n)
    read(b, "READY")
    ra, rb = [], []
    for _ in range(rounds):
        ra.append(run(a))
        rb.append(run(b))
    for p in (a, b):
        p.stdin.write("QUIT\n")
        p.stdin.flush()
    print(json.dumps({str(c1): ra, str(c2): rb}))


if __name__ == "__main__":
    main()
