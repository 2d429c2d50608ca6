#!/usr/bin/env python3
"""Micro-bench the CDX map at one core count: current plan vs candidate
variants, same synthetic input, N timed runs each, interleaved."""
from __future__ import annotations

import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from cdx_writer_spark.session import get_spark  # noqa: E402
from bench import materialize, synth_warc_records  # noqa: E402
from cdx_writer_spark.operators.cdx import cdx_fields, cdx_lines  # noqa: E402


def main():
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 1600000
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    spark = get_spark(app_name="microbench-cdx", cores=cores,
                      extra={"spark.driver.extraJavaOptions":
                             "-Xms12g -XX:+AlwaysPreTouch -XX:+UseParallelGC"})
    spark.sparkContext.setLogLevel("ERROR")
    recs = synth_warc_records(spark, n)
    plan = cdx_lines(cdx_fields(recs))
    materialize(plan)  # warm
    times = []
    for i in range(runs):
        t0 = time.time()
        materialize(plan)
        times.append(round(time.time() - t0, 2))
    med = statistics.median(times)
    print(json.dumps({"cores": cores, "n": n, "times": times,
                      "median_sec": med,
                      "rows_per_sec": round(n / med, 1)}))
    spark.stop()


if __name__ == "__main__":
    main()
