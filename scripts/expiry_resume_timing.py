#!/usr/bin/env python3
"""Recrawl-expiry resume timing: cuckoo (sharded DELETE against the live
filter) vs bloom (full filter rebuild) on the SAME checkpointed crawl.

Builds one checkpointed crawl per filter mode (identical shape), then
times ONLY the resumed run that passes ``expire_keys`` — the operation
the cuckoo filter exists to make O(|expired|) instead of O(total).
Host steal is recorded per window; this is a lifecycle observation, not
a graded pairwise number.

Usage: python scripts/expiry_resume_timing.py [cores] [n_pages] [batch]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def stat():
    with open("/proc/stat") as f:
        p = f.readline().split()
    return [int(x) for x in p[1:9]]


def main():
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    n_pages = int(sys.argv[2]) if len(sys.argv) > 2 else 400000
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 100000
    os.environ["SPARK_GRAFT_DRIVER_MEM"] = "12g"
    from pyspark.sql import functions as F

    from cdx_writer_spark.frontier.crawl import CrawlConfig, run_crawl
    from cdx_writer_spark.session import get_spark
    from cdx_writer_spark.sources.synth import (synth_pages, synth_robots,
                                                synth_seeds)

    spark = get_spark(app_name="expiry-timing", cores=cores,
                      extra={"spark.driver.extraJavaOptions":
                             "-Xms12g -XX:+AlwaysPreTouch -XX:+UseParallelGC"})
    spark.sparkContext.setLogLevel("ERROR")
    n_hosts = max(1000, n_pages // 20)
    pages = synth_pages(spark, n_pages, n_hosts=n_hosts)
    seeds = synth_seeds(spark, batch, n_pages, n_hosts=n_hosts)
    robots = synth_robots(spark, n_hosts=n_hosts)

    out = {"cores": cores, "n_pages": n_pages, "batch": batch, "modes": {}}
    for mode in ("cuckoo", "bloom"):
        cfg = CrawlConfig(per_host_budget=64, global_batch=batch,
                          seen_filter=mode, bloom_min_keys=1)
        d = tempfile.mkdtemp(prefix=f"expiry_{mode}_")
        run_crawl(spark, pages, seeds, robots, cfg, 2, checkpoint_dir=d)
        expired = (spark.read.parquet(os.path.join(d, "gen=00000", "cdx"))
                   .select("urlkey").distinct())
        n_exp = expired.count()
        s0, t0 = stat(), time.time()
        _f, _s, cdx, m = run_crawl(spark, pages, seeds, robots, cfg, 3,
                                   checkpoint_dir=d, resume=True,
                                   expire_keys=expired)
        n_cdx = cdx.count()
        dt = time.time() - t0
        dsteal = stat()[7] - s0[7]
        out["modes"][mode] = {
            "resume_wall_sec": round(dt, 2),
            "expired_keys": n_exp,
            "cdx_rows_resumed_gen": n_cdx,
            "steal_frac": round(dsteal / max(100.0 * 32 * dt, 1), 4),
        }
        shutil.rmtree(d, ignore_errors=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
