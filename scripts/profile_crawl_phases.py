#!/usr/bin/env python3
"""Phase-decompose the 2b crawl workload (one 400k-row generation over a
1.6M-page web) at one core count: per-run wall, the loop's recorded
wall_phases (plan / job / post), and the residual (gen-0 init + harness
cdx count).  Transient probe for the Amdahl-term work; BENCH.md consumes
the numbers manually.

Usage: python scripts/profile_crawl_phases.py [cores] [n_pages] [batch] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "12g")

from cdx_writer_spark.session import get_spark  # noqa: E402
from cdx_writer_spark.sources.synth import (synth_pages, synth_robots,  # noqa: E402
                                            synth_seeds)
from cdx_writer_spark.frontier.crawl import CrawlConfig, run_crawl  # noqa: E402
from cdx_writer_spark.functions.udfs import sha1_b32, surt_key  # noqa: E402


def main():
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    n_pages = int(sys.argv[2]) if len(sys.argv) > 2 else 1600000
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 400000
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    spark = get_spark(app_name=f"phase-profile-{cores}", cores=cores,
                      extra={"spark.driver.extraJavaOptions":
                             "-Xms12g -XX:+AlwaysPreTouch -XX:+UseParallelGC"})
    spark.sparkContext.setLogLevel("ERROR")
    pages = synth_pages(spark, n_pages, n_hosts=n_pages // 20)
    (pages.limit(4096).select(surt_key("url").alias("k"),
                              sha1_b32("html").alias("h"))
     .groupBy("k").count().count())
    seeds = synth_seeds(spark, batch, n_pages, n_hosts=n_pages // 20)
    robots = synth_robots(spark, n_hosts=n_pages // 20)
    cfg = CrawlConfig(per_host_budget=64, global_batch=batch)

    def one():
        t0 = time.perf_counter()
        _f, _s, cdx, metrics = run_crawl(spark, pages, seeds, robots, cfg, 1)
        t1 = time.perf_counter()
        n = cdx.count()
        t2 = time.perf_counter()
        ph = metrics[0]["wall_phases"]
        loop = ph["plan"] + ph["job"] + ph["post"]
        return {"wall": round(t2 - t0, 2), "cdx_count": round(t2 - t1, 2),
                "phases": ph, "init_residual": round(t1 - t0 - loop, 2),
                "n_cdx": n,
                "urls": metrics[0]["scheduled"] + metrics[0]["novel"]}

    one()  # warm
    out = [one() for _ in range(reps)]
    print(json.dumps({"cores": cores, "runs": out}, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
