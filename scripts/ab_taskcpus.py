#!/usr/bin/env python3
"""Interleaved A/B at local[32]: default task.cpus=1 (32 concurrent tasks)
vs task.cpus=2 (16 concurrent tasks) for the CDX map + crawl loop."""
from __future__ import annotations

import json
import subprocess
import sys

CHILD = r"""
import json, sys, time
sys.path.insert(0, "/root/repo")
from cdx_writer_spark.session import get_spark
from bench import materialize, synth_warc_records, crawl_bench
from cdx_writer_spark.operators.cdx import cdx_fields, cdx_lines
extra = {{"spark.driver.extraJavaOptions":
          "-Xms12g -XX:+AlwaysPreTouch -XX:+UseParallelGC"}}
if {taskcpus} > 1:
    extra["spark.task.cpus"] = str({taskcpus})
spark = get_spark(app_name="abtc", cores=32, extra=extra)
spark.sparkContext.setLogLevel("ERROR")
recs = synth_warc_records(spark, {n})
plan = cdx_lines(cdx_fields(recs))
materialize(plan)
print("READY", flush=True)
for line in sys.stdin:
    cmd = line.strip()
    if cmd == "RUN":
        t0 = time.time(); materialize(plan); dt = time.time() - t0
        print("RESULT %.1f" % ({n} / dt), flush=True)
    elif cmd == "CRAWL":
        r = crawl_bench(spark, 200000, generations=3)
        print("RESULT %.1f" % r["urls_per_sec"], flush=True)
    else:
        break
spark.stop()
"""


def spawn(taskcpus, n):
    code = CHILD.format(taskcpus=taskcpus, n=n)
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


def cmd(p, c):
    p.stdin.write(c + "\n")
    p.stdin.flush()
    return read(p)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1600000
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    a = spawn(1, n)
    read(a, "READY")
    b = spawn(2, n)
    read(b, "READY")
    out = {"tc1_rows": [], "tc2_rows": [], "tc1_crawl": [], "tc2_crawl": []}
    for _ in range(rounds):
        out["tc1_rows"].append(cmd(a, "RUN"))
        out["tc2_rows"].append(cmd(b, "RUN"))
    for _ in range(rounds):
        out["tc1_crawl"].append(cmd(a, "CRAWL"))
        out["tc2_crawl"].append(cmd(b, "CRAWL"))
    for p in (a, b):
        p.stdin.write("QUIT\n")
        p.stdin.flush()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
