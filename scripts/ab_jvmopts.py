#!/usr/bin/env python3
"""Interleaved A/B of JVM options for the CDX map at one core count."""
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
spark = get_spark(app_name="abjvm", cores={cores},
                  extra={{"spark.driver.extraJavaOptions": {opts!r}}})
spark.sparkContext.setLogLevel("ERROR")
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


def spawn(opts, cores, n):
    code = CHILD.format(opts=opts, cores=cores, n=n)
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
    opts_a = sys.argv[1]
    opts_b = sys.argv[2]
    cores = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    n = int(sys.argv[4]) if len(sys.argv) > 4 else 1600000
    rounds = int(sys.argv[5]) if len(sys.argv) > 5 else 3
    a = spawn(opts_a, cores, n)
    read(a, "READY")
    b = spawn(opts_b, cores, n)
    read(b, "READY")
    ra, rb = [], []
    for _ in range(rounds):
        ra.append(run(a))
        rb.append(run(b))
    for p in (a, b):
        p.stdin.write("QUIT\n")
        p.stdin.flush()
    print(json.dumps({"a": ra, "b": rb,
                      "pairwise_b_over_a": [round(y / x, 3)
                                            for x, y in zip(ra, rb)]}))


if __name__ == "__main__":
    main()
