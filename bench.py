#!/usr/bin/env python3
"""Benchmark harness (driver contract): run the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and print ONE JSON line.

The headline metric is the north-rule one: URLs scheduled+indexed per
second through the crawl-frontier pipeline (frontier advance + CDX rows),
measured on the deterministic synthetic web.  Per-query wall seconds for
the operator catalog ride along in "queries".
"""

from __future__ import annotations

import json
import os
import sys
import time


def materialize(df):
    """Execute the full plan without driver-side collection."""
    df.write.format("noop").mode("overwrite").save()


HEADLINE = [
    "q1_pricing_summary", "q3_shipping_topk", "q5_regional_revenue",
    "q6_forecast_filter", "politeness_topk", "running_offset",
    "prefix_exclude", "prefix_exclude_big", "robots_parse",
    "filter_stats",
    "seen_anti_join", "seen_anti_join_cuckoo", "union_dedup",
    "date_normalize", "cdx_lookup", "banlist_prefix_dedup", "dedup_exact",
    "dedup_minhash_lsh", "dedup_simhash16",
    "dedup_ngram_jaccard", "cosine_topk", "embedding_label_stats",
    "token_stats", "quality_score", "doc_fingerprint", "tumbling_window",
    "sessionize",
]


def crawl_bench(spark, n_pages: int, generations: int = 3):
    """URLs scheduled+indexed per second over a synthetic Zipf web.

    Sized so each generation pushes a meaningful batch through the fetch/
    parse/canonicalize/dedup pipeline (seeds and hosts scale with the web;
    a 500-seed toy crawl would measure scheduler overhead, not throughput)."""
    from cdx_writer_spark.frontier.crawl import CrawlConfig, run_crawl
    from cdx_writer_spark.sources.synth import (synth_pages, synth_robots,
                                                synth_seeds)
    n_hosts = max(1000, n_pages // 20)
    # NO .cache(): Spark's in-memory columnar cache serializes under high
    # task concurrency on this host (16-core scans of a 1.2GB cache ran
    # slower than 4-core).  The synthetic web is pure whole-stage codegen —
    # regenerating it per scan is cheap and scales linearly, like a real
    # job's parallel object-store scan.
    pages = synth_pages(spark, n_pages, n_hosts=n_hosts)
    # warm the Arrow python workers + whole-stage codegen before timing:
    # the first pandas-UDF stage pays ~1s/worker of fork+import, which is
    # JVM-warmup noise, not pipeline throughput
    from cdx_writer_spark.functions.udfs import sha1_b32, surt_key
    from pyspark.sql import functions as F
    (pages.limit(4096)
     .select(surt_key("url").alias("k"), sha1_b32("html").alias("h"))
     .groupBy("k").count().count())
    seeds = synth_seeds(spark, max(500, n_pages // 10), n_pages,
                        n_hosts=n_hosts)
    robots = synth_robots(spark, n_hosts=n_hosts)
    cfg = CrawlConfig(per_host_budget=64,
                      global_batch=max(n_pages // 4, 1000))

    # best of 2 (same protocol as index_bench and the catalog queries):
    # a single run under this host's bursty steal reported phantom 1.7x
    # swings between otherwise-identical sessions
    runs = []
    for _ in range(2):
        t0 = time.time()
        _f, seen, cdx, metrics = run_crawl(spark, pages, seeds, robots,
                                           cfg, generations)
        n_cdx = cdx.count()
        runs.append((time.time() - t0, n_cdx, metrics))
    dt, n_cdx, metrics = min(runs, key=lambda r: r[0])
    n_sched = sum(m["scheduled"] for m in metrics)
    n_novel = sum(m["novel"] for m in metrics)
    return {
        "crawl_sec": round(dt, 3),
        "crawl_sec_runs": [round(r[0], 3) for r in runs],
        "urls_scheduled": n_sched,
        "urls_discovered_novel": n_novel,
        "cdx_rows": n_cdx,
        "urls_per_sec": round((n_sched + n_novel) / dt, 1),
    }


def synth_warc_records(spark, n: int, partitions: int | None = None):
    """warc_records envelope rows synthesized from the deterministic page
    generator: response records whose payload is a real HTTP message, so
    the CDX field kernels do full-fidelity work (header split, sha1,
    surt, meta-tag scan) per record.

    The input LAYOUT is fixed by the data, not the session's core count —
    exactly like files on object storage: ~50k records (~150 MB) per
    task.  A cluster-size comparison over a cores-proportional layout
    would compare different inputs (and give each side single-wave
    whole-partition granularity, where one straggler stretches the whole
    stage)."""
    from pyspark.sql import functions as F
    from cdx_writer_spark.sources.synth import synth_pages
    if partitions is None:
        partitions = min(max(n // 50_000, 8), 512)
    pages = synth_pages(spark, n, partitions=partitions)
    payload = F.concat(
        F.lit(b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
              b"X-Robots-Tag: noarchive\r\n\r\n"), F.col("html"))
    return pages.select(
        F.lit("synth.warc.gz").alias("filename"),
        F.col("page_id").cast("int").alias("record_idx"),
        F.col("page_id").alias("offset"),
        F.length("html").cast("long").alias("compressed_size"),
        F.lit("response").alias("record_type"),
        F.encode("url", "utf-8").alias("url_raw"),
        F.date_format("warc_ts", "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("date_raw"),
        F.lit(b"application/http; msgtype=response").alias("content_type"),
        F.length("html").cast("long").alias("content_length_hdr"),
        payload.cast("binary").alias("payload"),
        F.lit(None).cast("string").alias("payload_digest"),
        F.lit(None).cast("string").alias("sfps"))


def index_bench(spark, n_records: int):
    """CDX rows/sec through the full field pipeline — one embarrassingly
    parallel stage (the reference's whole engine, distributed).

    Protocol matches scripts/scaling_bench.py (the round-1 14x gap between
    this bench and the microbench was this bench running COLD): one
    untimed FULL-SIZE warm run (codegen + python workers + JIT + heap
    growth all land outside the timed window), then best-of-2 timed runs
    (this host has minutes-scale bursty hypervisor steal; min is the
    standard throughput estimator under one-sided noise)."""
    from cdx_writer_spark.operators.cdx import cdx_fields, cdx_lines
    # NO .cache(): see crawl_bench — the columnar cache anti-scales with
    # task concurrency here; inline codegen synth scales at ~0.96.
    recs = synth_warc_records(spark, n_records)
    # warm at full size (untimed)
    materialize(cdx_lines(cdx_fields(recs)))
    times = []
    for _ in range(2):
        t0 = time.time()
        materialize(cdx_lines(cdx_fields(recs)))
        times.append(time.time() - t0)
    dt = min(times)
    return {"index_sec": round(dt, 3), "records": n_records,
            "cdx_rows_per_sec": round(n_records / dt, 1),
            "index_sec_runs": [round(t, 3) for t in times]}


def _steal_jiffies() -> int | None:
    try:
        with open("/proc/stat") as fh:
            return int(fh.readline().split()[8])
    except Exception:
        return None


_PROBE_BUFS = None


def _dram_probe(duration: float = 0.3) -> float | None:
    """Single-thread streaming-copy bandwidth (GB/s).  Buffers are
    allocated once and reused so per-query probes don't pay fault-in."""
    global _PROBE_BUFS
    try:
        import numpy as np
        if _PROBE_BUFS is None:
            a = np.ones(128 * 1024 * 1024 // 8, dtype=np.int64)  # 128 MB
            b = np.empty_like(a)
            np.copyto(b, a)      # fault both in, untimed
            _PROBE_BUFS = (a, b)
        a, b = _PROBE_BUFS
        t0 = time.time()
        n = 0
        while time.time() - t0 < duration:
            np.copyto(b, a)
            n += 1
        return round(n * 0.25 / (time.time() - t0), 2)
    except Exception:
        return None


def host_state() -> dict:
    """~1s canary of the two host-noise axes this VM suffers (BENCH.md):
    hypervisor steal (bursty, minutes-scale) and DRAM-bandwidth
    contention from co-tenants (INVISIBLE to steal — healthy windows
    measure ~10-19 GB/s single-thread here, contended ones <5).  Recorded
    in the bench JSON so a cross-round comparison can tell a code change
    from a bad window."""
    s0 = _steal_jiffies()
    t0 = time.time()
    gbs = _dram_probe(0.6)
    dt = time.time() - t0
    s1 = _steal_jiffies()
    out = {}
    if gbs is not None:
        out["mem_gb_per_sec_1t"] = gbs
    if s0 is not None and s1 is not None and dt > 0:
        out["steal_cores"] = round((s1 - s0) / (100.0 * dt), 2)
    return out


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else 0.1
    host_before = host_state()

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from cdx_writer_spark.plans.catalog import QUERIES
    from cdx_writer_spark.session import get_spark

    # pre-size + pre-touch the heap: lazy heap growth during the first
    # heavy stage otherwise burns 400+ CPU-seconds of kernel page-zeroing
    # inside timed windows (scripts/scaling_bench.py protocol).  Sized
    # from the host so the bench still starts on small machines: 12g
    # when available, else ~60% of MemAvailable (env-overridable).
    heap_gb = 12
    try:
        with open("/proc/meminfo") as fh:
            avail_kb = next(int(l.split()[1]) for l in fh
                            if l.startswith("MemAvailable"))
        heap_gb = max(2, min(12, int(avail_kb * 0.6 / 1024 / 1024)))
    except (OSError, StopIteration):
        pass
    heap = os.environ.get("SPARK_GRAFT_DRIVER_MEM", f"{heap_gb}g")
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", heap)
    jvm_opts = {"spark.driver.extraJavaOptions":
                f"-Xms{heap} -XX:+AlwaysPreTouch -XX:+UseParallelGC"}
    spark = get_spark(app_name="cdx-writer-spark-bench", cores=cpus,
                      extra=jvm_opts)
    spark.sparkContext.setLogLevel("ERROR")

    # session warmup so the first catalog query doesn't absorb JVM/codegen/
    # parquet-footer/Arrow-worker startup (~8s of one-time cost that is not
    # query time): touch a scan, an agg, a window and a pandas UDF once
    from pyspark.sql import Window, functions as F
    from cdx_writer_spark.functions.udfs import surt_key
    warm = spark.read.parquet(f"{sf_dir}/orders.parquet").limit(20000)
    (warm.withColumn("k", surt_key(F.concat(F.lit("http://w.com/"),
                                            F.col("o_orderkey").cast("string"))))
     .withColumn("rn", F.row_number().over(
         Window.partitionBy("o_custkey").orderBy("o_orderkey")))
     .groupBy("o_orderstatus").count().count())

    # Per-query wall: best of 2 back-to-back runs (this host has
    # minutes-scale bursty hypervisor steal — a single-run number can
    # report a 10x phantom regression; steal is one-sided noise, so the
    # faster repeat is the lower-interference estimate.  Same protocol as
    # index_bench / scripts/scaling_bench.py.)  Both runs are recorded in
    # "query_runs" so a reader can see the spread.
    queries: dict[str, float] = {}
    query_runs: dict[str, list[float]] = {}
    # per-QUERY-WINDOW canaries (round-4 verdict: session-level canaries
    # can't adjudicate a single query's cross-round delta): steal cores
    # measured ACROSS the query's own two runs (free — /proc/stat
    # bracketing) plus a 0.3s single-thread DRAM probe right after.
    query_canaries: dict[str, dict] = {}
    t_all = time.time()
    for name in HEADLINE:
        runs = []
        s0, w0 = _steal_jiffies(), time.time()
        for _ in range(2):
            t0 = time.time()
            materialize(QUERIES[name](spark, sf_dir))
            runs.append(round(time.time() - t0, 3))
        s1, w1 = _steal_jiffies(), time.time()
        queries[name] = min(runs)
        query_runs[name] = runs
        can = {}
        if s0 is not None and s1 is not None and w1 > w0:
            can["steal_cores"] = round((s1 - s0) / (100.0 * (w1 - w0)), 2)
        gbs = _dram_probe(0.3)
        if gbs is not None:
            can["mem_gb_per_sec_1t"] = gbs
        query_canaries[name] = can

    crawl_pages = int(200000 * sf / 0.1)
    s0, w0 = _steal_jiffies(), time.time()
    crawl = crawl_bench(spark, max(crawl_pages, 5000))
    s1, w1 = _steal_jiffies(), time.time()
    if s0 is not None and s1 is not None and w1 > w0:
        crawl["steal_cores_window"] = round((s1 - s0) / (100.0 * (w1 - w0)), 2)
    crawl["mem_gb_per_sec_1t_after"] = _dram_probe(0.3)
    queries["crawl_frontier"] = crawl["crawl_sec"]
    query_canaries["crawl_frontier"] = {
        "steal_cores": crawl.get("steal_cores_window"),
        "mem_gb_per_sec_1t": crawl["mem_gb_per_sec_1t_after"]}

    if cpus >= 24:
        # This host class's DRAM bandwidth saturates at ~16 concurrent
        # streaming tasks and COLLAPSES beyond (BENCH.md dual probe: 66->17
        # GB/s from 16 to 32 numpy streamers).  The byte-heavy index map
        # measured 2.3x faster at local[32] with task.cpus=2 (16 fat tasks)
        # than with 32 thin ones — the standard Spark knob for
        # bandwidth-bound stages, so the index bench runs in a session
        # configured that way.
        spark.stop()
        spark = get_spark(app_name="cdx-writer-spark-bench-index",
                          cores=cpus,
                          extra={"spark.task.cpus": "2", **jvm_opts})
        spark.sparkContext.setLogLevel("ERROR")
    s0, w0 = _steal_jiffies(), time.time()
    index = index_bench(spark, max(int(1000000 * sf / 0.1), 10000))
    s1, w1 = _steal_jiffies(), time.time()
    if s0 is not None and s1 is not None and w1 > w0:
        index["steal_cores_window"] = round((s1 - s0) / (100.0 * (w1 - w0)), 2)
    index["mem_gb_per_sec_1t_after"] = _dram_probe(0.3)
    queries["cdx_index"] = index["index_sec"]
    query_canaries["cdx_index"] = {
        "steal_cores": index.get("steal_cores_window"),
        "mem_gb_per_sec_1t": index["mem_gb_per_sec_1t_after"]}
    # headline value = SUM OF BEST TIMES (named so: best-sum, not raw
    # wall — r2 and earlier reported single-run wall; see BENCH.md §0 for
    # the protocol history).  The raw wall of the whole bench (including
    # the second runs and warmups) rides along as wall_raw.
    total = round(sum(queries.values()), 3)
    wall_raw = round(time.time() - t_all, 3)

    # BENCH_r03 lesson: the driver captures only a bounded tail of stdout,
    # and the full object with per-run detail overflowed it ("parsed":
    # null).  The FINAL stdout line is therefore the compact headline
    # object only; the full detail (query_runs, crawl, index sub-objects)
    # goes to a side file + stderr.
    detail = {
        "metric": "headline_total_best_sum",
        "value": total,
        "unit": "sec",
        "wall_raw": wall_raw,
        "queries": queries,
        "query_runs": query_runs,
        "query_canaries": query_canaries,
        "sf": sf,
        "cpus": cpus,
        "urls_per_sec": crawl["urls_per_sec"],
        "cdx_rows_per_sec": index["cdx_rows_per_sec"],
        "crawl": crawl,
        "index": index,
        "host_before": host_before,
        "host_after": host_state(),
    }
    detail_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_detail.json")
    try:
        with open(detail_path, "w") as fh:
            json.dump(detail, fh, indent=1)
    except OSError:
        pass
    print(json.dumps(detail), file=sys.stderr)

    print(json.dumps({
        "metric": "headline_total_best_sum",
        "value": total,
        "unit": "sec",
        "wall_raw": wall_raw,
        "queries": queries,
        "sf": sf,
        "cpus": cpus,
        "urls_per_sec": crawl["urls_per_sec"],
        "cdx_rows_per_sec": index["cdx_rows_per_sec"],
        "host": detail["host_after"],
        "detail_file": "BENCH_detail.json",
    }))


if __name__ == "__main__":
    main()
