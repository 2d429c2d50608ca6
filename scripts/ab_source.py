#!/usr/bin/env python3
"""Interleaved lo/hi scaling probe of the CDX map over a given source:
'synth' (inline codegen generation) or 'parquet' (pre-materialized snappy
files at /tmp/warc_records_bench).  Two JVMs (lo and hi cores) stay alive;
pairs are interleaved; prints per-pair efficiencies."""
from __future__ import annotations

import json
import subprocess
import sys

CHILD = r"""
import json, sys, time
sys.path.insert(0, "/root/repo")
from cdx_writer_spark.session import get_spark
from bench import materialize, synth_warc_records
from cdx_writer_spark.operators.cdx import cdx_fields, cdx_lines
spark = get_spark(app_name="absrc", cores={cores},
                  extra={{"spark.driver.extraJavaOptions":
                          "-Xms12g -XX:+AlwaysPreTouch -XX:+UseParallelGC"}})
spark.sparkContext.setLogLevel("ERROR")
if {src!r} == "parquet":
    recs = spark.read.parquet("/tmp/warc_records_bench")
else:
    recs = synth_warc_records(spark, {n})
plan = cdx_lines(cdx_fields(recs))
materialize(plan)
print("READY", flush=True)
for line in sys.stdin:
    if line.strip() != "RUN":
        break
    t0 = time.time(); materialize(plan); dt = time.time() - t0
    print("RESULT %.1f" % ({n} / dt), flush=True)
spark.stop()
"""


def spawn(src, cores, n):
    code = CHILD.format(src=src, cores=cores, n=n)
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
    src = sys.argv[1]
    lo = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    hi = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    n = int(sys.argv[4]) if len(sys.argv) > 4 else 1600000
    rounds = int(sys.argv[5]) if len(sys.argv) > 5 else 3
    a = spawn(src, lo, n)
    read(a, "READY")
    b = spawn(src, hi, n)
    read(b, "READY")
    ratio = hi / lo
    ra, rb, eff = [], [], []
    for _ in range(rounds):
        x1, y1 = run(a), run(b)
        x2, y2 = run(a), run(b)
        x, y = max(x1, x2), max(y1, y2)
        ra.append(x)
        rb.append(y)
        eff.append(round(y / ratio / x, 3))
    for p in (a, b):
        p.stdin.write("QUIT\n")
        p.stdin.flush()
    print(json.dumps({"src": src, "lo": ra, "hi": rb, "pair_eff": eff}))


if __name__ == "__main__":
    main()
