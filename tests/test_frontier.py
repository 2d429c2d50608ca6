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


def test_sharded_bloom_matches_exact_at_1m_keys(spark):
    """Sharded (shard, bitmap)-table bloom: parity with the exact anti-join
    at 10^6 keys.  Driver never holds a bitmap — its memory is O(1) in the
    key count (the global-bloom design collected ~1.2 MB/10^6 keys and
    would collect ~12 GB at 10^10)."""
    from cdx_writer_spark.frontier.seen import build_sharded_bloom
    seen = spark.range(1_000_000).select(
        F.concat(F.lit("key"), F.col("id")).alias("urlkey"))
    cand = spark.range(500_000, 1_500_000).select(
        F.concat(F.lit("key"), F.col("id")).alias("urlkey"),
        (F.col("id") % 7).alias("prio"))
    sb = build_sharded_bloom(seen, "urlkey", n_shards=64, capacity=2_000_000)
    exact = anti_join_seen(cand, seen, "urlkey")
    with_bloom = anti_join_seen(cand, seen, "urlkey", bloom=sb)
    assert with_bloom.count() == 500_000
    assert exact.select("urlkey").exceptAll(
        with_bloom.select("urlkey")).count() == 0
    assert with_bloom.select("urlkey").exceptAll(
        exact.select("urlkey")).count() == 0


def test_sharded_bloom_merge_covers_delta(spark):
    from cdx_writer_spark.frontier.seen import (build_sharded_bloom,
                                                merge_sharded_blooms,
                                                sharded_bloom_prefilter)
    a = spark.range(0, 5000).select(
        F.concat(F.lit("k"), F.col("id")).alias("urlkey"))
    b = spark.range(5000, 10000).select(
        F.concat(F.lit("k"), F.col("id")).alias("urlkey"))
    sb = build_sharded_bloom(a, "urlkey", n_shards=8, capacity=40_000)
    delta = build_sharded_bloom(b, "urlkey", n_shards=8, capacity=1,
                                m=sb.m, k=sb.k)
    merged = merge_sharded_blooms(sb, delta)
    # every key of both halves must be maybe_seen (no false negatives)
    flagged = sharded_bloom_prefilter(a.unionByName(b), "urlkey", merged)
    assert flagged.filter(~F.col("maybe_seen")).count() == 0


@pytest.mark.parametrize("mode", ["sharded", "global_amortized"])
def test_crawl_with_bloom_equals_exact(spark, world, mode):
    """The crawl must produce identical seen/cdx with any bloom deployment:
    the filter is an optimization, never a semantics change.  The
    global_amortized case forces the stale-broadcast window (rebroadcast
    threshold never reached), exercising the `recent` exact side table."""
    pages, seeds, robots = world
    base = dict(per_host_budget=2, global_batch=200)
    cfg_exact = CrawlConfig(use_bloom=False, **base)
    if mode == "sharded":
        cfg_bloom = CrawlConfig(use_bloom=True, bloom_min_keys=1,
                                bloom_shards=8, **base)
    else:
        cfg_bloom = CrawlConfig(use_bloom=True, bloom_min_keys=1,
                                bloom_rebroadcast_keys=10**9, **base)

    def run(cfg):
        f, seen, cdx, m = run_crawl(spark, pages, seeds, robots, cfg, 3)
        return (sorted(r["urlkey"] for r in seen.collect()),
                sorted((r["urlkey"], r["generation"])
                       for r in cdx.collect()))
    e = run(cfg_exact)
    b = run(cfg_bloom)
    assert e[0] == b[0], f"seen-set differs under {mode} bloom"
    assert e[1] == b[1], f"cdx differs under {mode} bloom"


def test_legacy_checkpoint_full_snapshot_load(spark, tmp_path):
    """Checkpoints from the pre-delta format (manifest without
    seen_format) stored the FULL seen set each generation; load_state must
    read only the latest snapshot, not union them into duplicates."""
    import json as jsonmod
    import os
    from cdx_writer_spark.frontier.crawl import load_state
    root = str(tmp_path / "legacy")
    full = spark.range(100).select(
        F.concat(F.lit("k"), F.col("id")).alias("urlkey"))
    for gen in (0, 1):
        d = os.path.join(root, f"gen={gen:05d}")
        full.limit(50 * (gen + 1)).write.parquet(os.path.join(d, "seen"))
        full.limit(10).selectExpr("urlkey", "urlkey AS url",
                                  "'h' AS host", "1.0 AS priority",
                                  f"{gen} AS generation") \
            .write.parquet(os.path.join(d, "frontier"))
        spark.createDataFrame([("k0", gen)], ["urlkey", "generation"]) \
            .write.parquet(os.path.join(d, "cdx"))
        with open(os.path.join(d, "manifest.json"), "w") as f:
            jsonmod.dump({"complete": True, "generation": gen}, f)
    gen, _fr, seen, _m = load_state(spark, root)
    assert gen == 1
    assert seen.count() == 100, "legacy snapshots must not be unioned"


def test_fused_generations_equal_unfused(spark, world):
    """The fused small-generation mode (2 jobs/gen, lazy checkpoints, seen
    delta derived from the frontier snapshot) must be result-identical to
    the fully-materialized big-generation path — it is a scheduling
    change, never a semantics change.  Covers both bloom and exact modes."""
    pages, seeds, robots = world
    for bloom_kw in (dict(use_bloom=False),
                     dict(use_bloom=True, bloom_min_keys=1)):
        base = dict(per_host_budget=2, global_batch=200, **bloom_kw)
        cfg_fused = CrawlConfig(fuse_below_rows=10**9, **base)
        cfg_big = CrawlConfig(fuse_below_rows=0, **base)

        def run(cfg):
            f, seen, cdx, m = run_crawl(spark, pages, seeds, robots, cfg, 3)
            return (sorted(r["urlkey"] for r in seen.collect()),
                    sorted((r["urlkey"], r["generation"])
                           for r in cdx.collect()),
                    sorted(tuple(r) for r in f.collect()),
                    [(x["scheduled"], x["novel"]) for x in m])
        a, b = run(cfg_fused), run(cfg_big)
        assert a[0] == b[0], f"seen differs fused-vs-unfused ({bloom_kw})"
        assert a[1] == b[1], f"cdx differs fused-vs-unfused ({bloom_kw})"
        assert a[2] == b[2], f"frontier differs fused-vs-unfused ({bloom_kw})"
        assert a[3] == b[3], f"metrics differ fused-vs-unfused ({bloom_kw})"


def test_checkpoint_blocks_actually_freed(spark, world):
    """Dataset.unpersist() is a no-op for localCheckpoint blocks on Spark
    4.1.2; the loop must free them via util.free_checkpoint or the block
    store grows monotonically.  Bound what survives a 3-generation crawl:
    per generation only parsed (backs the returned cdx) and the seen-part
    handle may remain, plus the live frontier and bloom state."""
    sc = spark.sparkContext

    def n_persisted():
        return len(sc._jsc.sc().getRDDStorageInfo())

    pages, seeds, robots = world
    before = n_persisted()
    cfg = CrawlConfig(per_host_budget=2, global_batch=200, use_bloom=True,
                      bloom_min_keys=1)
    gens = 3
    run_crawl(spark, pages, seeds, robots, cfg, gens)
    survivors = n_persisted() - before
    # fused path: init frontier + per gen (parsed + frontier snapshot);
    # anything above that means scratch (selected / bloom-flagged) leaked
    assert survivors <= 2 * gens + 2, \
        f"{survivors} persisted RDDs survive a {gens}-gen crawl"


def test_free_checkpoint_frees_blocks(spark):
    """unpersist() alone leaves localCheckpoint blocks cached (the Spark
    behavior free_checkpoint exists to work around); free_checkpoint
    removes them immediately."""
    from cdx_writer_spark.util import free_checkpoint
    sc = spark.sparkContext

    def ids():
        return {i.id() for i in sc._jsc.sc().getRDDStorageInfo()}

    before = ids()
    df = spark.range(0, 10000).selectExpr("id", "id * 2 AS x") \
        .localCheckpoint(eager=True)
    new = ids() - before
    assert new, "localCheckpoint should persist blocks"
    df.unpersist(True)
    assert new <= ids(), "documented no-op: unpersist leaves ckpt blocks"
    free_checkpoint(df)
    assert not (new & ids()), "free_checkpoint must drop the blocks"


def test_mixed_legacy_then_delta_checkpoint_load(spark, tmp_path):
    """Resuming a legacy (full-snapshot) dir and appending delta-v2
    generations must not union the legacy snapshots as if they were
    deltas: each generation's own manifest decides, and the newest
    non-delta generation supersedes everything before it."""
    import json as jsonmod
    import os
    from cdx_writer_spark.frontier.crawl import load_state

    root = str(tmp_path / "mixed")

    def write_gen(gen, keys_df, fmt):
        d = os.path.join(root, f"gen={gen:05d}")
        keys_df.write.parquet(os.path.join(d, "seen"))
        keys_df.limit(5).selectExpr(
            "urlkey", "urlkey AS url", "'h' AS host", "1.0 AS priority",
            f"{gen} AS generation").write.parquet(os.path.join(d, "frontier"))
        spark.createDataFrame([("k0", gen)], ["urlkey", "generation"]) \
            .write.parquet(os.path.join(d, "cdx"))
        mf = {"complete": True, "generation": gen}
        if fmt:
            mf["seen_format"] = fmt
        with open(os.path.join(d, "manifest.json"), "w") as f:
            jsonmod.dump(mf, f)

    keys = spark.range(100).select(
        F.concat(F.lit("k"), F.col("id")).alias("urlkey"))
    # legacy gens 0-1: FULL snapshots (gen1 = all 100 keys)
    write_gen(0, keys.limit(60), None)
    write_gen(1, keys, None)
    # delta-v2 gens 2-3: disjoint novel deltas of 10 each
    d2 = spark.range(100, 110).select(
        F.concat(F.lit("k"), F.col("id")).alias("urlkey"))
    d3 = spark.range(110, 120).select(
        F.concat(F.lit("k"), F.col("id")).alias("urlkey"))
    write_gen(2, d2, "delta-v2")
    write_gen(3, d3, "delta-v2")
    gen, _fr, seen, _m = load_state(spark, root)
    assert gen == 3
    assert seen.count() == 120, \
        "latest legacy snapshot + later deltas, no k-fold duplication"
    assert seen.distinct().count() == 120


def test_bloom_auto_shards_mid_run(spark, world):
    """With bloom_shards=0 the crawl auto-flips from the global broadcast
    bloom to the sharded (shard,bitmap) table once the seen set crosses
    bloom_auto_shard_keys — config-free 10^10 path.  Crossing mid-run
    must not change any result (the flip is just a rebuild)."""
    pages, seeds, robots = world
    base = dict(per_host_budget=2, global_batch=200)
    cfg_exact = CrawlConfig(use_bloom=False, **base)
    # threshold sits between gen-0 seen (~20 seeds + first novelties) and
    # the final seen count, so the run starts global and flips sharded
    cfg_auto = CrawlConfig(use_bloom=True, bloom_min_keys=1,
                           bloom_auto_shard_keys=200, **base)

    def run(cfg):
        f, seen, cdx, m = run_crawl(spark, pages, seeds, robots, cfg, 3)
        return (sorted(r["urlkey"] for r in seen.collect()),
                sorted((r["urlkey"], r["generation"]) for r in cdx.collect()))
    e, a = run(cfg_exact), run(cfg_auto)
    assert e[0] == a[0], "seen differs after auto-shard flip"
    assert e[1] == a[1], "cdx differs after auto-shard flip"


def test_robots_rules_parser(spark):
    """frontier/robots.py vs hand-computed expectations on the RFC-9309
    grammar corners: shared user-agent groups, non-matching agents,
    comments, blank Disallow, CRLF, case-insensitive fields, rules
    before any User-agent line (invalid, dropped)."""
    from cdx_writer_spark.frontier.robots import robots_rules
    body_a = ("Disallow: /orphan\n"              # before any UA: dropped
              "# comment only\n"
              "User-Agent: GoogleBot\r\n"
              "Disallow: /google-only\r\n"
              "\r\n"
              "User-agent: crawler\n"
              "USER-AGENT: *\n"                   # shared group matches *
              "Disallow: /a/   # inline comment\n"
              "Allow: /a/pub\n"
              "disallow:\n"                       # blank: allow-all, drop
              "\n"
              "User-agent: *\n"
              "DISALLOW: /b\n")
    body_b = ("User-agent: other\nDisallow: /x\n")   # nothing for *
    docs = spark.createDataFrame(
        [("h1.example", body_a), ("h2.example", body_b)], ["host", "body"])
    got = sorted(tuple(r) for r in robots_rules(docs).collect())
    assert got == [("h1.example", "allow", "/a/pub"),
                   ("h1.example", "disallow", "/a/"),
                   ("h1.example", "disallow", "/b")]
    # agent-specific parse picks the google record instead
    got_g = sorted(tuple(r) for r in
                   robots_rules(docs, agent="googlebot").collect())
    assert got_g == [("h1.example", "disallow", "/google-only")]


def test_big_batch_join_path_equals_broadcast(spark, world):
    """Forcing the big-batch join strategy (bloom-prefiltered shuffle
    fetch + shuffle leftover anti-join) must be result-identical to the
    broadcast path — join strategy is a cost decision, not semantics."""
    pages, seeds, robots = world
    base = dict(per_host_budget=2, global_batch=200, use_bloom=False)
    def run(cfg):
        f, seen, cdx, m = run_crawl(spark, pages, seeds, robots, cfg, 3)
        return (sorted(r["urlkey"] for r in seen.collect()),
                sorted((r["urlkey"], r["generation"]) for r in cdx.collect()),
                sorted(tuple(r) for r in f.collect()))
    a = run(CrawlConfig(**base))
    b = run(CrawlConfig(broadcast_batch_max_rows=0, **base))
    assert a == b, "big-batch join strategy changed results"


def test_crawl_delay_budgets(spark, world):
    """Crawl-delay robots lines become per-host budget overrides: a host
    asking for a delay gets at most gen_seconds/delay fetches per
    generation, every other host keeps the default budget, and budgets
    never exceed the default (salt-guard invariant)."""
    from cdx_writer_spark.frontier.robots import host_budgets, robots_rules
    pages, seeds, robots = world
    docs = spark.createDataFrame(
        [("site0.example.org",
          "User-agent: *\nCrawl-delay: 30\nDisallow: /p/9\n"),
         ("site1.example.org",
          "User-agent: *\nCrawl-delay: 0.5\nDisallow: /p/9\n")],
        ["host", "body"])
    rules = robots_rules(docs)
    budgets = host_budgets(rules, default_budget=4, gen_seconds=60.0)
    got = {r["host"]: r["budget"] for r in budgets.collect()}
    assert got == {"site0.example.org": 2,      # 60/30
                   "site1.example.org": 4}      # 120 clamped to default

    cfg = CrawlConfig(per_host_budget=4, global_batch=500, use_bloom=False)
    f, seen, cdx, m = run_crawl(spark, pages, seeds, robots, cfg, 2,
                                host_budgets=budgets)
    per_host = (cdx.join(
        spark.createDataFrame([("site0.example.org",)], ["h"]),
        F.expr("original_url LIKE 'http://site0.example.org/%'"), "left_semi")
        .groupBy("generation").count().collect())
    assert all(r["count"] <= 2 for r in per_host), \
        "crawl-delay budget exceeded for site0"
    # unconstrained run fetches at least as much overall
    f2, _s2, cdx2, _m2 = run_crawl(spark, pages, seeds, robots, cfg, 2)
    assert cdx2.count() >= cdx.count()


def test_async_saver_propagates_failures():
    """A failed background checkpoint write must surface at the next
    join/start, not vanish in the thread."""
    import pytest as _pytest
    from cdx_writer_spark.frontier import crawl as crawl_mod

    saver = crawl_mod._AsyncSave()
    orig = crawl_mod.save_state
    crawl_mod.save_state = lambda *a: (_ for _ in ()).throw(
        IOError("disk full"))
    try:
        saver.start("/nonexistent", 0, None, None, None, {})
        with _pytest.raises(IOError, match="disk full"):
            saver.join()
        saver.join()  # error is consumed; subsequent joins are clean
    finally:
        crawl_mod.save_state = orig


def test_cuckoo_filter_matches_exact(spark):
    """Cuckoo sidecar contract: NO false negatives ever (every inserted
    key reads maybe_seen=True), sane false-positive rate, and anti-join
    results identical to the exact join."""
    from cdx_writer_spark.frontier.seen import (anti_join_seen,
                                                build_cuckoo,
                                                cuckoo_prefilter)
    seen = spark.range(0, 30000).select(
        F.concat(F.lit("key"), F.col("id")).alias("urlkey"))
    cand = spark.range(20000, 50000).select(
        F.concat(F.lit("key"), F.col("id")).alias("urlkey"))
    filt = build_cuckoo(seen, "urlkey", capacity=60000)

    flagged = cuckoo_prefilter(seen, "urlkey", filt)
    assert flagged.filter(~F.col("maybe_seen")).count() == 0, \
        "false negative: an inserted key read as definitely-novel"
    fp = (cuckoo_prefilter(
        spark.range(10**6, 10**6 + 20000).select(
            F.concat(F.lit("key"), F.col("id")).alias("urlkey")),
        "urlkey", filt).filter("maybe_seen").count())
    assert fp / 20000 < 0.05, f"false-positive rate too high: {fp/20000}"

    exact = sorted(r["urlkey"] for r in
                   anti_join_seen(cand, seen, "urlkey").collect())
    got = sorted(r["urlkey"] for r in
                 anti_join_seen(cand, seen, "urlkey", bloom=filt).collect())
    assert got == exact


def test_cuckoo_insert_delete(spark):
    """The cuckoo extra over blooms: deletion.  Insert, delete half,
    remaining keys must still never read novel; deleted keys mostly
    vanish (fingerprint collisions may retain a few)."""
    import numpy as np
    from cdx_writer_spark.frontier.seen import (CuckooFilter,
                                                _cuckoo_fp_bucket,
                                                build_cuckoo,
                                                cuckoo_delete_keys,
                                                cuckoo_prefilter)
    keys = spark.range(0, 4000).select(
        F.concat(F.lit("u"), F.col("id")).alias("urlkey"))
    filt = build_cuckoo(keys, "urlkey", capacity=10000)
    hashed = keys.select(
        F.xxhash64("urlkey", F.lit(1)).alias("h1"),
        F.xxhash64("urlkey", F.lit(2)).alias("h2"),
        (F.regexp_extract("urlkey", r"u(\d+)", 1).cast("long") % 2 == 0)
        .alias("even")).collect()
    to_delete = [(r["h1"], r["h2"]) for r in hashed if r["even"]]
    n = cuckoo_delete_keys(filt, to_delete)
    assert n == len(to_delete)
    odd = keys.filter(
        F.regexp_extract("urlkey", r"u(\d+)", 1).cast("long") % 2 == 1)
    missing = cuckoo_prefilter(odd, "urlkey", filt) \
        .filter(~F.col("maybe_seen")).count()
    # a remaining key can only vanish if a deleted twin shared its
    # (fingerprint, bucket) — rare at this load
    assert missing <= 2, f"{missing} remaining keys vanished"
    even = keys.filter(
        F.regexp_extract("urlkey", r"u(\d+)", 1).cast("long") % 2 == 0)
    still = cuckoo_prefilter(even, "urlkey", filt) \
        .filter(F.col("maybe_seen")).count()
    assert still / 2000 < 0.05, f"deleted keys still present: {still}"


def test_crawl_with_cuckoo_equals_exact(spark, world):
    """The crawl with a cuckoo seen-filter sidecar == exact anti-join
    crawl — same guarantee the bloom deployments carry."""
    from cdx_writer_spark.frontier import crawl as crawl_mod
    from cdx_writer_spark.frontier.seen import build_cuckoo
    pages, seeds, robots = world
    base = dict(per_host_budget=2, global_batch=200)

    def run(cfg, bloom_override=None):
        if bloom_override is None:
            f, seen, cdx, m = run_crawl(spark, pages, seeds, robots, cfg, 2)
            return (sorted(r["urlkey"] for r in seen.collect()),
                    sorted((r["urlkey"], r["generation"])
                           for r in cdx.collect()))
        # drive crawl_step directly with the cuckoo sidecar
        from pyspark.sql import Observation
        frontier = crawl_mod.init_frontier(seeds).localCheckpoint(eager=True)
        seen = frontier.select("urlkey")
        cdx_parts = []
        for gen in range(2):
            filt = build_cuckoo(seen, "urlkey", capacity=200000)
            frontier, new_seen, cdx, m = crawl_mod.crawl_step(
                pages, frontier, seen, robots, cfg, gen, bloom=filt)
            frontier = frontier.localCheckpoint(eager=True)
            new_seen = frontier.where(
                F.col("generation") == gen + 1).select("urlkey")
            seen = seen.unionByName(new_seen)
            cdx_parts.append(cdx)
        all_cdx = cdx_parts[0].unionByName(cdx_parts[1])
        return (sorted(r["urlkey"] for r in seen.collect()),
                sorted((r["urlkey"], r["generation"])
                       for r in all_cdx.collect()))

    e = run(CrawlConfig(use_bloom=False, **base))
    c = run(CrawlConfig(use_bloom=False, **base), bloom_override=True)
    assert e[0] == c[0], "seen differs under cuckoo sidecar"
    assert e[1] == c[1], "cdx differs under cuckoo sidecar"


def test_cuckoo_deletion_enables_recrawl(spark):
    """The recrawl flow the cuckoo filter exists for: expire a URL by
    deleting it from BOTH the exact seen table and the filter, and the
    seen anti-join re-admits it as a candidate; with a bloom this would
    require a full filter rebuild."""
    from cdx_writer_spark.frontier.seen import (anti_join_seen,
                                                build_cuckoo,
                                                cuckoo_delete_keys)
    seen = spark.range(0, 5000).select(
        F.concat(F.lit("u"), F.col("id")).alias("urlkey"))
    filt = build_cuckoo(seen, "urlkey", capacity=20000)
    cand = spark.range(0, 5000, 500).select(
        F.concat(F.lit("u"), F.col("id")).alias("urlkey"))
    # nothing novel while everything is seen
    assert anti_join_seen(cand, seen, "urlkey", bloom=filt).count() == 0

    # expire u1000 and u2500: remove from the exact table AND the filter
    expired = ["u1000", "u2500"]
    pairs = (spark.createDataFrame([(k,) for k in expired], ["urlkey"])
             .select(F.xxhash64("urlkey", F.lit(1)).alias("h1"),
                     F.xxhash64("urlkey", F.lit(2)).alias("h2")).collect())
    assert cuckoo_delete_keys(filt, [(r["h1"], r["h2"]) for r in pairs]) == 2
    seen2 = seen.filter(~F.col("urlkey").isin(expired))
    got = sorted(r["urlkey"] for r in
                 anti_join_seen(cand, seen2, "urlkey", bloom=filt).collect())
    assert got == sorted(expired), \
        "expired URLs must be re-admitted through the filter + exact join"


def test_robots_gate_allow_overrides_disallow(spark):
    """RFC 9309 longest-match in the gate: an Allow carve-out inside a
    Disallow admits its subtree; Allow wins length ties."""
    from cdx_writer_spark.frontier.crawl import robots_gate
    rules = spark.createDataFrame(
        [("h1", "disallow", "/a/"), ("h1", "allow", "/a/pub"),
         ("h1", "disallow", "/a/pub/sec/"),   # deeper disallow re-blocks
         ("h2", "disallow", "/x"), ("h2", "allow", "/x")],  # tie: allow
        ["host", "rule_type", "path_prefix"])
    cand = spark.createDataFrame(
        [("h1", "http://h1/a/priv/1"), ("h1", "http://h1/a/pub/ok"),
         ("h1", "http://h1/a/pub/sec/no"), ("h1", "http://h1/other"),
         ("h2", "http://h2/x/tie"), ("h3", "http://h3/x/norules")],
        ["host", "url"])
    got = sorted(r["url"] for r in robots_gate(cand, rules).collect())
    assert got == ["http://h1/a/pub/ok", "http://h1/other",
                   "http://h2/x/tie", "http://h3/x/norules"]


def test_robots_gate_rfc9309_wildcards(spark):
    """RFC 9309 §2.2.3 special characters in the gate: '*' matches any
    octet sequence, a trailing '$' anchors at end-of-path, regex
    metacharacters in rules stay literal, a mid-rule '$' is a literal
    octet, and specificity (rule octet length) still decides between a
    wildcard Disallow and a longer Allow carve-out."""
    from cdx_writer_spark.frontier.crawl import robots_gate
    rules = spark.createDataFrame(
        [("h1", "disallow", "/*?sid="),       # session-id ban, any path
         ("h1", "allow", "/pub*?sid="),       # longer carve-out wins
         ("h2", "disallow", "/*.pdf$"),       # anchored extension ban
         ("h3", "disallow", "/a+(b)"),        # regex specials literal
         ("h4", "disallow", "/x$y")],         # mid-rule '$' literal
        ["host", "rule_type", "path_prefix"])
    cand = spark.createDataFrame(
        [("h1", "http://h1/p?sid=7"),         # blocked by /*?sid=
         ("h1", "http://h1/a/b?sid=x"),       # blocked (deep path)
         ("h1", "http://h1/p?x=1"),           # kept: no sid
         ("h1", "http://h1/pub1?sid=3"),      # kept: allow is longer
         ("h2", "http://h2/doc.pdf"),         # blocked: anchored hit
         ("h2", "http://h2/doc.pdfx"),        # kept: '$' anchors
         ("h2", "http://h2/doc.pdf?x"),       # kept: not end-of-path
         ("h3", "http://h3/a+(b)/q"),         # blocked literally
         ("h3", "http://h3/aab/q"),           # kept: '+' not a regex
         ("h4", "http://h4/x$y/z"),           # blocked literally
         ("h4", "http://h4/xy/z")],           # kept
        ["host", "url"])
    got = sorted(r["url"] for r in robots_gate(cand, rules).collect())
    assert got == ["http://h1/p?x=1", "http://h1/pub1?sid=3",
                   "http://h2/doc.pdf?x", "http://h2/doc.pdfx",
                   "http://h3/aab/q", "http://h4/xy/z"]


def test_robots_rules_star_fallback_for_named_agent(spark):
    """RFC 9309 §2.2.1: a named agent uses its specific group when the
    host has one, else falls back to the host's '*' group; hosts with
    neither contribute nothing."""
    from cdx_writer_spark.frontier.robots import robots_rules
    docs = spark.createDataFrame(
        [("spec.example",                      # has a googlebot group
          "User-agent: googlebot\nDisallow: /g\n\n"
          "User-agent: *\nDisallow: /star\n"),
         ("star.example",                      # '*' group only
          "User-agent: *\nDisallow: /s\n"),
         ("other.example",                     # unrelated group only
          "User-agent: bingbot\nDisallow: /b\n")],
        ["host", "body"])
    got = sorted(tuple(r) for r in
                 robots_rules(docs, agent="GoogleBot").collect())
    assert got == [("spec.example", "disallow", "/g"),
                   ("star.example", "disallow", "/s")]


def test_resume_after_midgeneration_kill_autoshard(spark, world, tmp_path,
                                                   monkeypatch):
    """Kill the loop BETWEEN gen 1's checkpoint write and that
    generation's block-freeing (write durable on disk, frees never ran),
    then resume with the sharded-bloom auto-flip active the whole time.
    Resume must redo exactly gen 2, re-emit no earlier urlkey, and land
    on the same seen set and frontier as an uninterrupted run."""
    import cdx_writer_spark.frontier.crawl as crawl_mod
    pages, seeds, robots = world
    ckpt = str(tmp_path / "kill_ckpt")
    cfg = CrawlConfig(per_host_budget=2, global_batch=200,
                      bloom_min_keys=1, bloom_auto_shard_keys=1)

    saved: list[int] = []
    real_save = crawl_mod.save_state
    real_free = crawl_mod.free_checkpoint

    def sync_start(self, *args):   # make the write synchronous so the
        self.join()                # kill lands deterministically after it
        real_save(*args)
        saved.append(args[1])

    def killer(df):
        if 1 in saved:
            raise RuntimeError("simulated kill")
        real_free(df)

    monkeypatch.setattr(crawl_mod._AsyncSave, "start", sync_start)
    monkeypatch.setattr(crawl_mod, "free_checkpoint", killer)
    with pytest.raises(RuntimeError, match="simulated kill"):
        run_crawl(spark, pages, seeds, robots, cfg, 3, checkpoint_dir=ckpt)
    assert saved == [0, 1], "kill must land right after gen 1's write"
    monkeypatch.undo()

    f2, s2, cdx2, m2 = run_crawl(spark, pages, seeds, robots, cfg, 3,
                                 checkpoint_dir=ckpt, resume=True)
    assert [m["generation"] for m in m2] == [2], "resume should redo gen 2"

    ff, sf, cdxf, _ = run_crawl(spark, pages, seeds, robots, cfg, 3)
    full = sorted((r["urlkey"], r["generation"]) for r in cdxf.collect())
    resumed = sorted((r["urlkey"], r["generation"]) for r in cdx2.collect())
    assert resumed == [x for x in full if x[1] == 2], \
        "resumed run must re-emit exactly gen 2"
    emitted_before = {k for k, g in full if g < 2}
    assert not emitted_before & {k for k, _ in resumed}, "re-emission"
    assert sorted(r["urlkey"] for r in s2.collect()) == \
        sorted(r["urlkey"] for r in sf.collect()), "seen parity"
    assert sorted(tuple(r) for r in f2.collect()) == \
        sorted(tuple(r) for r in ff.collect()), "frontier parity"


def test_sharded_cuckoo_matches_exact_1m_keys(spark):
    """The 10^10-path cuckoo: (shard, buckets) table at 10^6 keys, O(1)
    driver memory (no driver merge loop — the build never collects).
    No false negatives, sane fp rate, anti-join == exact, and the
    insert/delete co-group ops preserve the contract (delete leaves
    holes; a later insert must fill them without clobbering)."""
    from cdx_writer_spark.frontier.seen import (anti_join_seen,
                                                build_sharded_cuckoo,
                                                sharded_cuckoo_delete,
                                                sharded_cuckoo_insert,
                                                sharded_cuckoo_prefilter)
    n = 1_000_000
    seen = spark.range(0, n).select(
        F.concat(F.lit("key"), F.col("id")).alias("urlkey"))
    filt = build_sharded_cuckoo(seen, "urlkey", n_shards=32, capacity=4 * n)

    sample = spark.range(0, n, 97).select(
        F.concat(F.lit("key"), F.col("id")).alias("urlkey"))
    fneg = (sharded_cuckoo_prefilter(sample, "urlkey", filt)
            .filter(~F.col("maybe_seen")).count())
    assert fneg == 0, "false negative in sharded cuckoo"
    out = spark.range(10**8, 10**8 + 20000).select(
        F.concat(F.lit("key"), F.col("id")).alias("urlkey"))
    fp = (sharded_cuckoo_prefilter(out, "urlkey", filt)
          .filter("maybe_seen").count())
    assert fp / 20000 < 0.05, f"fp rate {fp/20000}"

    cand = spark.range(n - 20000, n + 20000).select(
        F.concat(F.lit("key"), F.col("id")).alias("urlkey"))
    exact = sorted(r["urlkey"] for r in
                   anti_join_seen(cand, seen, "urlkey").collect())
    got = sorted(r["urlkey"] for r in
                 anti_join_seen(cand, seen, "urlkey", bloom=filt).collect())
    assert got == exact

    # delete a stripe, insert a new stripe into the holes
    dele = spark.range(0, 40000, 2).select(
        F.concat(F.lit("key"), F.col("id")).alias("urlkey"))
    filt2 = sharded_cuckoo_delete(filt, dele, "urlkey")
    newk = spark.range(10**9, 10**9 + 20000).select(
        F.concat(F.lit("key"), F.col("id")).alias("urlkey"))
    filt3 = sharded_cuckoo_insert(filt2, newk, "urlkey")
    keep = spark.range(1, 40000, 2).select(
        F.concat(F.lit("key"), F.col("id")).alias("urlkey"))
    assert (sharded_cuckoo_prefilter(keep, "urlkey", filt3)
            .filter(~F.col("maybe_seen")).count()) <= 3, \
        "surviving keys vanished after the delete/insert cycle"
    assert (sharded_cuckoo_prefilter(newk, "urlkey", filt3)
            .filter(~F.col("maybe_seen")).count()) == 0, \
        "hole-filling insert lost keys"
    gone = (sharded_cuckoo_prefilter(dele, "urlkey", filt3)
            .filter("maybe_seen").count())
    assert gone / 20000 < 0.05, f"deleted keys still present: {gone}"


def test_run_crawl_cuckoo_filter_equals_exact(spark, world):
    """seen_filter='cuckoo' runs the sharded cuckoo through the WHOLE
    loop (build, per-generation inserts, prefilter) with results
    identical to the exact anti-join crawl."""
    pages, seeds, robots = world
    base = dict(per_host_budget=2, global_batch=200)

    def run(cfg):
        f, seen, cdx, m = run_crawl(spark, pages, seeds, robots, cfg, 3)
        return (sorted(r["urlkey"] for r in seen.collect()),
                sorted((r["urlkey"], r["generation"]) for r in cdx.collect()),
                sorted(tuple(r) for r in f.collect()))

    e = run(CrawlConfig(use_bloom=False, **base))
    c = run(CrawlConfig(seen_filter="cuckoo", bloom_min_keys=1, **base))
    assert e[0] == c[0], "seen differs under loop cuckoo filter"
    assert e[1] == c[1], "cdx differs under loop cuckoo filter"
    assert e[2] == c[2], "frontier differs under loop cuckoo filter"


def test_run_crawl_cuckoo_survives_capacity_overflow(spark):
    """Regression: the sharded cuckoo is built with 4x-seen headroom,
    but a discovery-phase generation can find MORE novel keys than that
    before the next top-of-loop rebuild check — the delta insert then
    overflowed a shard and the kick loop hard-failed ('cuckoo filter
    over capacity'; blooms just degrade fpp when overfull).  The loop
    must rebuild-with-headroom instead of folding an overflowing delta,
    and stay byte-identical to the exact-join crawl.  Shape: tiny seed
    set (seen_count ~ tens) over a branching world whose first
    generation discovers hundreds of novel urlkeys."""
    pages = synth_pages(spark, 4000, n_hosts=200, partitions=8)
    seeds = synth_seeds(spark, 30, 4000, n_hosts=200)
    robots = synth_robots(spark, n_hosts=200)
    base = dict(per_host_budget=64, global_batch=1000)

    def run(cfg):
        f, seen, cdx, m = run_crawl(spark, pages, seeds, robots, cfg, 3)
        return (sorted(r["urlkey"] for r in seen.collect()),
                sorted((r["urlkey"], r["generation"]) for r in cdx.collect()),
                [x["novel"] for x in m])

    e = run(CrawlConfig(use_bloom=False, **base))
    c = run(CrawlConfig(seen_filter="cuckoo", bloom_min_keys=1, **base))
    # the shape must actually exercise the overflow path: replay the
    # loop's own sizing rule (cap = 4x keys at every (re)build) over the
    # observed novel-per-generation sequence and require that some
    # generation's delta pushed the count past the standing cap — the
    # exact condition under which the old code overflowed a shard
    n0 = len(e[0]) - sum(e[2])     # initial (seed) urlkey count
    cap, cnt, hit = 4 * n0, n0, False
    for nov in e[2]:
        cnt += nov
        if cnt > cap:
            hit, cap = True, 4 * cnt
    assert hit, \
        f"vacuous shape: novel-per-gen {e[2]} never outgrows the filter"
    assert e[0] == c[0], "seen differs after cuckoo overflow rebuild"
    assert e[1] == c[1], "cdx differs after cuckoo overflow rebuild"


def test_recrawl_expiry_through_loop(spark, world, tmp_path):
    """Recrawl THROUGH run_crawl: expire previously-crawled urlkeys at
    resume; with seen_filter='cuckoo' the expiry is a sharded DELETE
    against the live filter (no rebuild), and the resumed crawl must
    (a) match the exact-join crawl row-for-row and (b) actually
    re-emit rediscovered expired URLs."""
    import shutil as _sh
    pages, seeds, robots = world
    base = dict(per_host_budget=2, global_batch=200)
    cfg_ck = CrawlConfig(seen_filter="cuckoo", bloom_min_keys=1, **base)
    cfg_ex = CrawlConfig(use_bloom=False, **base)

    d1 = str(tmp_path / "ck")
    run_crawl(spark, pages, seeds, robots, cfg_ck, 2, checkpoint_dir=d1)
    _sh.copytree(d1, str(tmp_path / "ex"))

    # expire EVERYTHING emitted in gens 0-1: any rediscovery re-admits
    emitted = spark.read.parquet(f"{d1}/gen=00000/cdx",
                                 f"{d1}/gen=00001/cdx")
    expired = emitted.select("urlkey").distinct()

    def finish(cfg, d):
        f, seen, cdx, m = run_crawl(spark, pages, seeds, robots, cfg, 4,
                                    checkpoint_dir=d, resume=True,
                                    expire_keys=expired)
        assert [x["generation"] for x in m] == [2, 3]
        return (sorted(r["urlkey"] for r in seen.collect()),
                sorted((r["urlkey"], r["generation"]) for r in cdx.collect()),
                sorted(tuple(r) for r in f.collect()))

    ck = finish(cfg_ck, d1)
    ex = finish(cfg_ex, str(tmp_path / "ex"))
    assert ck == ex, "cuckoo-delete resume differs from exact resume"
    re_emitted = {k for k, _ in ck[1]} & \
        {r["urlkey"] for r in expired.collect()}
    assert re_emitted, "no expired URL was re-emitted (vacuous recrawl)"


def test_jvm_parse_path_matches_python_udfs(spark, world):
    """The crawl parse stage keeps page bytes JVM-side: checksum =
    sha1+base32 expression arithmetic, outlinks = regexp_extract_all +
    a slim normalize UDF.  Both must equal the reference Python kernels
    (sha1_b32 / extract_outlinks) byte-for-byte — on the synth pages AND
    on adversarial hand-written html (quote styles, missing quotes,
    nested tags, whitespace, empty/None payloads, relative links)."""
    from pyspark.sql import functions as F

    from cdx_writer_spark.functions.udfs import (extract_outlinks,
                                                 normalize_links,
                                                 raw_hrefs_expr, sha1_b32)
    from cdx_writer_spark.operators.cdx import sha1_b32_binary_expr

    pages, _seeds, _robots = world
    adversarial = [
        ("http://ex.com/a/b", b'<a href="http://x.com/1">x</a>'
         b"<a href='/rel/p'>r</a><a href=bare>b</a>"),
        ("http://ex.com/", b'<A HREF = "UPPER">u</A><a id=z href="#frag">f'
         b'</a><a href="">empty</a>'),
        ("http://ex.com/d/", b'<a href="../up one">sp</a>'
         b'<a data-href="no">n</a><area href="not-a">'),
        ("http://ex.com/", "<a href=\"café/ü?q=1\">uni</a>"
         .encode("utf-8")),
        ("http://ex.com/", b""),
        ("http://ex.com/", None),
    ]
    adv = spark.createDataFrame(
        [(u, h) for u, h in adversarial], "url string, html binary")
    for df in (pages.select("url", "html").limit(500), adv):
        rows = (df.select(
            sha1_b32("html").alias("py_sum"),
            sha1_b32_binary_expr(F.col("html")).alias("jvm_sum"),
            extract_outlinks("html", "url").alias("py_links"),
            normalize_links(raw_hrefs_expr(F.col("html")), F.col("url"))
            .alias("hy_links"))).collect()
        assert rows
        for r in rows:
            assert r["py_sum"] == r["jvm_sum"]
            assert r["py_links"] == r["hy_links"]


def test_checkpoint_frontier_sorted_partitions_with_lineage(spark, world,
                                                            tmp_path):
    """The north rule materializes the frontier checkpoint as a priority
    queue: range-partitioned + sorted on (priority DESC, urlkey ASC), so
    part files carry disjoint descending priority ranges (parquet min/max
    stats prune top-of-queue scans), and the manifest records
    per-partition lineage (every part file of every artifact + parent
    generation + the layout contract) alongside the fetch/parse
    metrics."""
    import json
    import os

    import pyarrow.parquet as pq

    pages, seeds, robots = world
    cfg = CrawlConfig(per_host_budget=2, global_batch=200, use_bloom=False)
    ckpt = str(tmp_path / "sorted_ckpt")
    run_crawl(spark, pages, seeds, robots, cfg, 2, checkpoint_dir=ckpt)

    d = os.path.join(ckpt, "gen=00001")
    with open(os.path.join(d, "manifest.json")) as fh:
        m = json.load(fh)
    lin = m["lineage"]
    assert lin["parent_gen"] == 0
    assert lin["frontier_layout"] == ["priority DESC", "urlkey ASC"]
    for name in ("frontier", "seen", "cdx"):
        recorded = {e["file"] for e in lin["partitions"][name]}
        on_disk = {f for f in os.listdir(os.path.join(d, name))
                   if f.startswith("part-") and not f.endswith(".crc")}
        assert recorded == on_disk and recorded, f"{name} lineage mismatch"
        assert all(e["bytes"] > 0 for e in lin["partitions"][name])
    # gen 0's manifest must say it has no parent
    with open(os.path.join(ckpt, "gen=00000", "manifest.json")) as fh:
        assert json.load(fh)["lineage"]["parent_gen"] is None

    # sortedness within each part file, and disjoint descending ranges
    # across files (file index order == range partition order)
    files = sorted(os.path.join(d, "frontier", e["file"])
                   for e in lin["partitions"]["frontier"])
    prev_min = None
    for path in files:
        t = pq.read_table(path, columns=["priority", "urlkey"]).to_pandas()
        if t.empty:
            continue
        pairs = list(zip(-t["priority"].to_numpy(), t["urlkey"].tolist()))
        assert pairs == sorted(pairs), f"{path} not sorted"
        if prev_min is not None:
            assert t["priority"].max() <= prev_min, \
                "part files must cover descending priority ranges"
        prev_min = t["priority"].min()


def test_frontier_top_is_exact_and_reads_head_files_only(spark, tmp_path):
    """frontier_top must equal a full-scan TakeOrdered at every n, while
    the sorted-partition layout lets it read only the head part files
    (range partition blocks are contiguous in the total order, so the
    global top-n is a subset of the first files holding >= n rows)."""
    import json
    import os

    import pyarrow.parquet as pq

    from cdx_writer_spark.frontier.crawl import frontier_top, save_state

    fr = spark.range(2000).selectExpr(
        "concat('k', lpad(cast(id AS string), 6, '0')) AS urlkey",
        "concat('http://h/', id) AS url",
        "concat('h', id % 50) AS host",
        "round(rand(7), 6) AS priority",
        "0 AS generation")
    root = str(tmp_path / "queue_ckpt")
    # frontier_size forces ceil(17M/5M) = 4 range-partitioned part files
    save_state(root, 0, fr, fr.select("urlkey"), fr.select("urlkey"),
               {"frontier_size": 17_000_000})

    d = os.path.join(root, "gen=00000")
    with open(os.path.join(d, "manifest.json")) as fh:
        m = json.load(fh)
    files = [e["file"] for e in m["lineage"]["partitions"]["frontier"]]
    assert len(files) == 4, "test needs a multi-file layout"
    first_rows = pq.ParquetFile(
        os.path.join(d, "frontier", files[0])).metadata.num_rows

    def key(r):
        return (-r["priority"], r["urlkey"])

    full = spark.read.parquet(os.path.join(d, "frontier"))
    for n in (7, first_rows + 50, 1999):   # 1 file / 2 files / all files
        want = sorted(full.orderBy(F.desc("priority"), F.asc("urlkey"))
                      .limit(n).collect(), key=key)
        got = sorted(frontier_top(spark, root, n).collect(), key=key)
        assert [key(r) for r in got] == [key(r) for r in want], f"n={n}"

    # a FOREIGN declared layout must disable pruning (full-scan fallback),
    # not silently read the wrong head files
    want = sorted(full.orderBy(F.desc("priority"), F.asc("urlkey"))
                  .limit(7).collect(), key=key)
    m["lineage"]["frontier_layout"] = ["warc_ts ASC"]
    with open(os.path.join(d, "manifest.json"), "w") as fh:
        json.dump(m, fh)
    got = sorted(frontier_top(spark, root, 7).collect(), key=key)
    assert [key(r) for r in got] == [key(r) for r in want]

    # legacy checkpoint (no lineage block): full-scan fallback still exact
    del m["lineage"]
    with open(os.path.join(d, "manifest.json"), "w") as fh:
        json.dump(m, fh)
    got = sorted(frontier_top(spark, root, 7).collect(), key=key)
    assert [key(r) for r in got] == [key(r) for r in want]


def test_aqe_restored_after_loop_and_on_failure(spark, world):
    """run_crawl disables AQE for broadcast-path fused generations; the
    session value must come back at loop exit AND when the loop dies
    mid-generation (the session outlives the loop)."""
    import pytest as _pytest

    pages, seeds, robots = world
    key = "spark.sql.adaptive.enabled"
    orig = spark.conf.get(key)
    cfg = CrawlConfig(per_host_budget=2, global_batch=200)
    run_crawl(spark, pages, seeds, robots, cfg, 1)
    assert spark.conf.get(key) == orig, "AQE not restored after clean exit"

    bad_pages = pages.select("url")   # parse stage needs warc_ts/html
    with _pytest.raises(Exception):
        run_crawl(spark, bad_pages, seeds, robots, cfg, 1)
    assert spark.conf.get(key) == orig, "AQE not restored after failure"


def test_expiry_tombstone_persists_across_resumes(spark, world, tmp_path):
    """run_crawl(expire_keys=...) persists a tombstone: a LATER resume
    that does NOT re-pass expire_keys must still treat never-rediscovered
    expired keys as unseen (the recrawl isn't silently cancelled), while
    rediscovered keys — re-recorded in post-expiry deltas — stay seen."""
    import json as jsonmod
    import os

    from cdx_writer_spark.frontier.crawl import load_state

    pages, seeds, robots = world
    cfg = CrawlConfig(use_bloom=False, per_host_budget=2, global_batch=200)
    d = str(tmp_path / "tomb")
    run_crawl(spark, pages, seeds, robots, cfg, 2, checkpoint_dir=d)
    expired_df = (spark.read.parquet(f"{d}/gen=00000/cdx",
                                     f"{d}/gen=00001/cdx")
                  .select("urlkey").distinct())
    expired = {r["urlkey"] for r in expired_df.collect()}
    assert expired

    # resume WITH expire_keys for one generation -> tombstone written
    run_crawl(spark, pages, seeds, robots, cfg, 3, checkpoint_dir=d,
              resume=True, expire_keys=expired_df)
    tomb_dirs = os.listdir(os.path.join(d, "expired"))
    assert tomb_dirs, "no tombstone persisted"
    with open(os.path.join(d, "expired", tomb_dirs[0],
                           "manifest.json")) as fh:
        tm = jsonmod.load(fh)
    assert tm["complete"] and tm["asof_gen"] == 2

    # what generation 2 re-recorded: its seen delta (novel discoveries)
    redisc = {r["urlkey"] for r in
              spark.read.parquet(f"{d}/gen=00002/seen").collect()} & expired
    not_redisc = expired - redisc
    assert redisc, "vacuous: nothing was rediscovered at gen 2"
    assert not_redisc, "vacuous: everything was rediscovered at gen 2"

    # a fresh load_state WITHOUT expire_keys honors the tombstone
    _gen, _fr, seen, _m = load_state(spark, d)
    seen_keys = {r["urlkey"] for r in seen.collect()}
    assert redisc <= seen_keys, \
        "rediscovered expired keys fell out of the reassembled seen set"
    assert not (seen_keys & not_redisc), \
        "tombstone lost on resume: never-rediscovered expired keys " \
        "re-entered the seen set"

    # and a further resume without expire_keys keeps crawling consistently:
    # anything it emits is NOT something already re-emitted at gen 2
    _f, _s, cdx3, m3 = run_crawl(spark, pages, seeds, robots, cfg, 4,
                                 checkpoint_dir=d, resume=True)
    assert [x["generation"] for x in m3] == [3]
    g2 = {r["urlkey"] for r in
          spark.read.parquet(f"{d}/gen=00002/cdx").collect()}
    g3 = {r["urlkey"] for r in cdx3.collect()}
    assert not (g3 & g2), "re-emitted a key already re-emitted post-expiry"
    # manifest honesty (ADVICE): the recorded cdx_rows equals the rows
    # actually written for the resumed generation
    with open(os.path.join(d, "gen=00003", "manifest.json")) as fh:
        m = jsonmod.load(fh)
    assert m["cdx_rows"] == spark.read.parquet(
        f"{d}/gen=00003/cdx").count()


def test_frontier_top_priority_ties_across_file_boundaries(spark, tmp_path):
    """The frontier_top exactness argument leans on urlkey-unique
    tiebreaks: when a run of EQUAL priorities spans a part-file boundary,
    the range partitioner must have split the tie run in urlkey order, so
    reading head files in index order still yields the exact top-n.  Pin
    it with an all-ties frontier and with a two-level frontier whose tie
    run straddles the boundary."""
    import json
    import os

    import pyarrow.parquet as pq

    from cdx_writer_spark.frontier.crawl import frontier_top, save_state

    def build(priority_expr, tag):
        fr = spark.range(2000).selectExpr(
            "concat('k', lpad(cast(id AS string), 6, '0')) AS urlkey",
            "concat('http://h/', id) AS url",
            "concat('h', id % 50) AS host",
            f"{priority_expr} AS priority",
            "0 AS generation")
        root = str(tmp_path / tag)
        save_state(root, 0, fr, fr.select("urlkey"), fr.select("urlkey"),
                   {"frontier_size": 17_000_000})
        d = os.path.join(root, "gen=00000")
        with open(os.path.join(d, "manifest.json")) as fh:
            m = json.load(fh)
        files = [e["file"] for e in m["lineage"]["partitions"]["frontier"]]
        assert len(files) == 4, "test needs a multi-file layout"
        first_rows = pq.ParquetFile(
            os.path.join(d, "frontier", files[0])).metadata.num_rows
        return root, d, first_rows

    def key(r):
        return (-r["priority"], r["urlkey"])

    # (a) every priority identical: the entire frontier is one tie run
    root, d, first = build("cast(0.5 AS double)", "all_ties")
    full = spark.read.parquet(os.path.join(d, "frontier"))
    for n in (1, first - 1, first, first + 1, 1999):
        want = [key(r) for r in sorted(
            full.orderBy(F.desc("priority"), F.asc("urlkey"))
            .limit(n).collect(), key=key)]
        got = [key(r) for r in sorted(
            frontier_top(spark, root, n).collect(), key=key)]
        assert got == want, f"all-ties frontier diverges at n={n}"

    # (b) two priority levels, the high-priority tie run larger than the
    # first file so it MUST straddle a boundary
    root, d, first = build(
        "CASE WHEN id % 2 = 0 THEN 0.9 ELSE 0.1 END", "two_level")
    full = spark.read.parquet(os.path.join(d, "frontier"))
    assert first < 1000, "high-priority run must span multiple files"
    for n in (first, first + 1, 999, 1000, 1001):
        want = [key(r) for r in sorted(
            full.orderBy(F.desc("priority"), F.asc("urlkey"))
            .limit(n).collect(), key=key)]
        got = [key(r) for r in sorted(
            frontier_top(spark, root, n).collect(), key=key)]
        assert got == want, f"two-level frontier diverges at n={n}"


def test_overlap_plan_parity_and_engagement(spark, world):
    """CrawlConfig(overlap_plan=True) pre-builds generation g+1's plan on
    a second driver thread while g's job runs — results must be
    IDENTICAL to the sequential build (seen, cdx, frontier), the
    speculative plan must actually engage (non-vacuous), and a loop that
    invalidates the speculation (filter rebuilt every generation) must
    fall back to fresh builds with identical results too."""
    pages, seeds, robots = world
    base = dict(per_host_budget=2, global_batch=200)

    def run(cfg):
        f, seen, cdx, m = run_crawl(spark, pages, seeds, robots, cfg, 3)
        return (sorted(r["urlkey"] for r in seen.collect()),
                sorted((r["urlkey"], r["generation"]) for r in cdx.collect()),
                sorted(tuple(r) for r in f.collect()), m)

    seq = run(CrawlConfig(overlap_plan=False, **base))
    ovl = run(CrawlConfig(overlap_plan=True, **base))
    assert seq[:3] == ovl[:3], "overlap_plan changed crawl results"
    assert any(m.get("plan_overlapped") for m in ovl[3]), \
        "vacuous: no generation used a pre-built plan"
    # growth-aware frontier-size speculation (extrapolating the last
    # observed growth ratio): on this deterministic world BOTH eligible
    # generations (1 and 2, pre-built while 0 and 1 ran) must land on
    # the right side of every gate and engage — a raw current-size
    # guess strands plans that cross the top-k/salt boundaries
    assert sum(bool(m.get("plan_overlapped")) for m in ovl[3]) == 2, \
        f"expected both eligible generations to use pre-built plans: " \
        f"{[(m.get('plan_overlapped'), m.get('overlap_discarded')) for m in ovl[3]]}"

    # bloom active from the first keys: the global filter object is
    # rebuilt/flushed along the way; validation must catch any change
    seq_b = run(CrawlConfig(overlap_plan=False, bloom_min_keys=1,
                            bloom_rebroadcast_keys=1, **base))
    ovl_b = run(CrawlConfig(overlap_plan=True, bloom_min_keys=1,
                            bloom_rebroadcast_keys=1, **base))
    assert seq_b[:3] == ovl_b[:3], \
        "overlap_plan changed results under live-filter maintenance"


def test_cuckoo_insert_shard_overflow_falls_back_to_rebuild(
        spark, world, monkeypatch):
    """A per-shard 'cuckoo filter over capacity' failure during the
    incremental delta insert (possible under urlkey-hash skew even when
    the GLOBAL seen count is under bloom_cap) must trigger a full
    rebuild with fresh headroom, not kill the loop — and the crawl's
    output must be unchanged."""
    from cdx_writer_spark.frontier import seen as seen_mod
    from cdx_writer_spark.frontier.crawl import CrawlConfig, run_crawl
    pages, seeds, robots = world
    base = dict(per_host_budget=2, global_batch=200, seen_filter="cuckoo",
                bloom_min_keys=1)

    def cdx_set(cdx):
        return sorted((r["urlkey"], r["generation"]) for r in cdx.collect())

    _f, _s, cdx0, _m = run_crawl(spark, pages, seeds, robots,
                                 CrawlConfig(**base), 3)
    expected = cdx_set(cdx0)

    real_insert = seen_mod.sharded_cuckoo_insert
    boom = {"armed": True, "fired": 0}

    def failing_insert(filt, keys, key="urlkey"):
        newf = real_insert(filt, keys, key)
        if not boom["armed"]:
            return newf
        boom["armed"] = False
        boom["fired"] += 1

        class _Df:
            def localCheckpoint(self, eager=True):
                raise ValueError(
                    "PythonException: cuckoo filter over capacity")

        class _Newf:
            df = _Df()
            n_shards = newf.n_shards
            n_buckets = newf.n_buckets

        return _Newf()

    monkeypatch.setattr(seen_mod, "sharded_cuckoo_insert", failing_insert)
    _f, _s, cdx1, m1 = run_crawl(spark, pages, seeds, robots,
                                 CrawlConfig(**base), 3)
    assert boom["fired"] == 1, "the failure injection never fired"
    assert cdx_set(cdx1) == expected, \
        "overflow fallback changed the crawl output"
