"""Frontier correctness: byte-identical text extraction (input_hint
invariant), deterministic scheduling under repartitioning, bloom-prefilter
== exact anti-join, robots gating, checkpoint/resume idempotence."""

import shutil

import pytest
from pyspark.sql import functions as F

from cdx_writer_spark.frontier.crawl import (CrawlConfig, crawl_step,
                                             init_frontier, run_crawl)
from cdx_writer_spark.frontier.seen import anti_join_seen, build_bloom
from cdx_writer_spark.functions.udfs import extract_text
from cdx_writer_spark.sources.synth import (synth_pages, synth_robots,
                                            synth_seeds)

N_PAGES = 2000


@pytest.fixture(scope="module")
def world(spark):
    pages = synth_pages(spark, N_PAGES, partitions=8).cache()
    seeds = synth_seeds(spark, 20, N_PAGES)
    robots = synth_robots(spark)
    pages.count()
    return pages, seeds, robots


def test_text_extraction_byte_identical(spark, world):
    pages, _, _ = world
    diff = (pages.withColumn("extracted", extract_text("html"))
            .filter(F.col("extracted") != F.col("text")).count())
    assert diff == 0


def test_crawl_deterministic_under_repartitioning(spark, world):
    pages, seeds, robots = world
    cfg = CrawlConfig(per_host_budget=2, global_batch=200, use_bloom=False,
                      collect_metrics=False)

    def run(parts):
        f, seen, cdx, m = run_crawl(spark, pages.repartition(parts),
                                    seeds.repartition(parts), robots, cfg, 3)
        return (sorted(r["urlkey"] for r in seen.collect()),
                sorted((r["urlkey"], r["generation"]) for r in cdx.collect()),
                sorted(tuple(r) for r in f.collect()))
    s1 = run(2)
    s2 = run(16)
    assert s1[0] == s2[0], "seen-set differs with parallelism"
    assert s1[1] == s2[1], "cdx differs with parallelism"
    assert s1[2] == s2[2], "frontier differs with parallelism"


def test_bloom_prefilter_matches_exact(spark):
    seen = spark.range(0, 3000).select(
        F.concat(F.lit("key"), F.col("id")).alias("urlkey"))
    cand = spark.range(2000, 5000).select(
        F.concat(F.lit("key"), F.col("id")).alias("urlkey"))
    bloom = build_bloom(seen, "urlkey", capacity=3000, fpp=0.01)
    exact = sorted(r["urlkey"] for r in
                   anti_join_seen(cand, seen, "urlkey").collect())
    with_bloom = sorted(r["urlkey"] for r in
                        anti_join_seen(cand, seen, "urlkey", bloom=bloom).collect())
    assert exact == with_bloom
    assert len(exact) == 2000


def test_robots_gate_blocks_banned_paths(spark, world):
    pages, seeds, robots = world
    cfg = CrawlConfig(per_host_budget=2, global_batch=300, use_bloom=False,
                      collect_metrics=False)
    frontier = init_frontier(seeds)
    seen = frontier.select("urlkey")
    nf, _, _, _ = crawl_step(pages, frontier, seen, robots, cfg, 0)
    banned_hosts = {r["host"] for r in robots.collect()}
    newly = nf.filter(F.col("generation") == 1)
    offenders = (newly.filter(F.col("host").isin(list(banned_hosts))
                              & F.col("url").rlike("/p/9"))
                 .count())
    assert offenders == 0


def test_checkpoint_resume_no_reemission(spark, world, tmp_path):
    pages, seeds, robots = world
    cfg = CrawlConfig(per_host_budget=2, global_batch=200, use_bloom=False)
    ckpt = str(tmp_path / "crawl_ckpt")

    _f, _s, cdx_full, _m = run_crawl(spark, pages, seeds, robots, cfg, 3,
                                     checkpoint_dir=ckpt)
    full = sorted((r["urlkey"], r["generation"]) for r in cdx_full.collect())

    # simulate a crash after generation 1: drop gen 2's checkpoint
    shutil.rmtree(f"{ckpt}/gen=00002")
    _f2, _s2, cdx_resumed, m2 = run_crawl(spark, pages, seeds, robots, cfg, 3,
                                          checkpoint_dir=ckpt, resume=True)
    assert [m["generation"] for m in m2] == [2], "resume should redo only gen 2"
    resumed = sorted((r["urlkey"], r["generation"])
                     for r in cdx_resumed.collect())
    gen2_full = [x for x in full if x[1] == 2]
    assert resumed == gen2_full, "resumed generation must re-emit exactly gen 2"
    # idempotence: no urlkey emitted twice across the resumed run
    emitted_before = {k for k, g in full if g < 2}
    assert all(k not in emitted_before for k, _ in resumed)


def test_distributed_top_k_exact(spark):
    from cdx_writer_spark.frontier.crawl import distributed_top_k
    df = (spark.range(0, 50000)
          .select(F.col("id"),
                  (F.xxhash64("id") % 1000).alias("priority"),
                  F.concat(F.lit("u"), F.col("id")).alias("urlkey")))
    got = distributed_top_k(df, [F.desc("priority"), F.col("urlkey")],
                            12345)
    expect = df.orderBy(F.desc("priority"), "urlkey").limit(12345)
    g = sorted(tuple(r) for r in got.collect())
    e = sorted(tuple(r) for r in expect.collect())
    assert len(g) == 12345
    assert g == e
