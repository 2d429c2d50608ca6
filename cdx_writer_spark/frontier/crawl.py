"""The crawl frontier: iterative batch generations of
select → fetch → parse → index → discover → dedup → schedule
(north_rule; generalizes the reference's single-file loop,
cdx_writer.py:654-705, into a distributed URL-frontier pipeline).

Determinism contract (BASELINE.md): same seeds + budgets ⇒ identical
frontier ordering, seen-set and CDX rows at ANY parallelism level — every
selection is totally ordered with urlkey tiebreaks and every aggregate is
order-insensitive (min/max/sum only).

Scale notes (10^10 frontier):
* politeness ranking is two-phase: a salted partial top-k bounds the
  per-partition work on Zipf-hot hosts before the exact per-host
  row_number (engaged only when one host could overwhelm a reducer);
  per-host budgets can be reduced by robots Crawl-delay overrides
  (frontier/robots.py); the global pop is skipped when the frontier
  fits in the batch;
* the seen-set anti-join is the only unavoidable big shuffle; bloom
  pre-filtering (frontier/seen.py) cuts its probe volume above 10^6
  keys, auto-flipping to the sharded (shard, bitmap) deployment at
  10^8+; the big-batch fetch join is bloom-prefiltered the same way so
  the web side shuffles ~|batch| rows, never |web|;
* small generations run FUSED (two jobs via lazy localCheckpoints —
  see crawl_step); checkpoint-block storage is freed deterministically
  with util.free_checkpoint, never left to JVM GC;
* per-generation state is written as parquet snapshots (frontier, seen
  DELTA, cdx, metrics + manifest-last) = the checkpoint, asynchronously
  overlapped with the next generation; resume replays from the last
  complete manifest and re-emits nothing (anti-join on emitted CDX
  keys).  tests/test_crawl_simulator.py value-pins the whole loop
  against an independent single-process implementation.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..functions.udfs import surt_and_host
from ..util import ensure_checkpointed, free_checkpoint

__all__ = ["CrawlConfig", "init_frontier", "crawl_step", "run_crawl",
           "load_state", "page_cdx", "frontier_top"]

N_SALT = 16


def _union_all(parts: list[DataFrame]) -> DataFrame:
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _active_ctx():
    """The live SparkContext — the cache key for process-lifetime Column
    caches below.  py4j-backed Column objects hold Java references into
    one gateway; if the JVM is torn down and relaunched in a long-lived
    process, a cache keyed only on the module would serve stale handles
    that fail opaquely, so the caches rebuild whenever the context
    object changes."""
    from pyspark import SparkContext
    return SparkContext._active_spark_context


_PARSE_COLS: "tuple | None" = None   # (SparkContext, cols)


def _parse_cols() -> tuple:
    """The parse stage's projection Columns (content digest as sha1+base32
    expression arithmetic, html length, JVM-extracted hrefs -> python
    urljoin) — built ONCE per SparkContext and reused every generation.

    Column objects are immutable unresolved-attribute expressions, reusable
    across plans; rebuilding them per generation cost a measured ~0.3-1.3s
    of pure driver py4j time per generation (the base32 bit-algebra tree
    alone is ~300 nodes = hundreds of gateway round-trips), a straight
    addition to the loop's core-count-independent Amdahl term."""
    global _PARSE_COLS
    ctx = _active_ctx()
    if _PARSE_COLS is None or _PARSE_COLS[0] is not ctx:
        from ..functions.udfs import normalize_links, raw_hrefs_expr
        from ..operators.cdx import sha1_b32_binary_expr
        _PARSE_COLS = (ctx, (
            sha1_b32_binary_expr(F.col("html")).alias("checksum"),
            F.length("html").alias("html_len"),
            normalize_links(raw_hrefs_expr(F.col("html")), F.col("url"))
            .alias("outlinks")))
    return _PARSE_COLS[1]


@dataclass
class CrawlConfig:
    per_host_budget: int = 4       # politeness: max fetches per host per gen
    global_batch: int = 2000       # frontier pops per generation
    priority_decay: float = 0.8
    bloom_fpp: float = 0.01
    use_bloom: bool = True
    # below this many seen keys the exact anti-join beats the filter: a
    # few-million-key join is sub-second and parallel, while the bloom
    # costs a build job + driver OR + broadcast per rebuild plus the
    # recent-delta bookkeeping every generation — all core-count-
    # independent serial time.  The r6 interleaved A/B at the 2M-page /
    # 500k-batch bench shape (the filter first engages at gen 2, ~1M
    # seen keys) measured the 3-generation loop at 20.1-25.4s with
    # min=4M (filter never builds) vs 29.1-81.9s with min=1M, identical
    # CDX output — the crossover where cutting the probe shuffle pays is
    # comfortably above 4M keys on any hardware, since the build cost
    # itself grows with |seen| no slower than the probe saving does
    # until |seen| >> |batch|.
    bloom_min_keys: int = 4_000_000
    # broadcast the selected batch into the fetch/leftover joins only up
    # to this size; beyond it the driver collect+rebroadcast is a
    # measured ~1.5s/generation of serial time (and at 10^8-row
    # production batches would be GBs) — use a shuffle join instead.
    # (On a real deployment the frontier/pages tables are bucketed by
    # key — Iceberg storage-partitioned joins — so the shuffle is
    # one-sided or free; plans/layout.py carries that design.)
    broadcast_batch_max_rows: int = 200_000
    # 0 = driver-global broadcast bloom (fine to ~10^8 keys); > 0 = the
    # sharded (shard, bitmap)-table bloom from frontier/seen.py whose
    # driver memory is O(1) in the key count — the 10^10 deployment.
    bloom_shards: int = 0
    # with bloom_shards == 0, the crawl AUTO-FLIPS to the sharded bloom
    # (shard count sized from capacity) once the seen set crosses this —
    # no operator knowledge needed for the 10^10 path; the flip happens
    # as an ordinary rebuild, so parity with the exact join is unchanged
    bloom_auto_shard_keys: int = 200_000_000
    # skip the salted pre-top-k (schedule phase 0) while the frontier is
    # below this many rows: the skew it guards against needs ONE host
    # with enough rows to overwhelm a single reducer's sort (~10^7), and
    # under a Zipf host law the hottest host carries a few percent of
    # the frontier — so below ~2x10^7 frontier rows the extra window
    # shuffle is pure fixed cost per generation.  Size comes free from
    # the observe() metric on the frontier's checkpoint materialization.
    salt_phase_min_rows: int = 20_000_000
    # global mode: novel keys accumulate in a small exact side table and
    # the bitmap is re-OR-ed + re-broadcast only when they exceed this,
    # so broadcast serialization is amortized instead of per-generation
    bloom_rebroadcast_keys: int = 250_000
    # below this frontier size a generation runs FUSED: one heavy job
    # (the next-frontier checkpoint, which materializes fetch+parse+
    # discover in-line via lazy localCheckpoints) instead of 4-5, seen
    # delta derived from the frontier snapshot.
    # Above it (the 10^10 production regime, where job-launch latency is
    # <1% of a generation) every stage keeps its own eager checkpoint and
    # the seen delta is a compact per-generation frame instead of a
    # filter over retained full-frontier snapshots.
    fuse_below_rows: int = 2_000_000
    # compact the seen-set delta chain once it reaches this many parts
    seen_compact_parts: int = 32
    # run fused BROADCAST-PATH generations (batch <=
    # broadcast_batch_max_rows, so the fetch join has no shuffle) with
    # AQE disabled — session value restored for other generations and at
    # loop exit.  AQE re-plans each lazy localCheckpoint's toRdd one
    # materialized stage at a time, a driver-serial cost with nothing to
    # buy on a shuffle-free generation: interleaved A/B measured AQE-off
    # at 1.69x median on the 3-generation broadcast-path loop, but
    # 0.95x on the shuffle-join 400k-batch generation — so shuffle-join
    # and production-scale (unfused) generations keep AQE (skew-join
    # splitting, shuffle coalescing).  Evidence in BENCH.md.
    aqe_off_fused: bool = True
    # which seen-set sidecar filter the loop maintains: "bloom" (default;
    # global broadcast with auto-flip to ShardedBloom, above) or "cuckoo"
    # (always the sharded (shard, buckets) table from frontier/seen.py —
    # same contract, ~2 B/key, and O(1) DELETION so recrawl expiry via
    # run_crawl(expire_keys=...) edits the filter instead of rebuilding)
    seen_filter: str = "bloom"
    # build generation g+1's plan on a SECOND driver thread while
    # generation g's heavy job runs (the _AsyncSave pattern applied to
    # the ~1-2s/generation driver-serial plan term — BENCH.md phase
    # table).  Speculative: the pre-built plan embeds this generation's
    # gate decisions (fused/salt/top-k-skip), the live filter object and
    # the recent-delta composition; run_crawl validates all of them
    # against post-job reality and rebuilds from scratch on any
    # mismatch, so results are bit-identical by construction (pinned by
    # tests/test_frontier.py overlap parity).  Only engaged on fused
    # broadcast-path generations with a plan-only schedule
    # (global_batch <= 150k) and no sharded/cuckoo filter (those replace
    # the filter object every generation, which would always invalidate).
    # Default ON since r5: with growth-aware frontier-size speculation
    # both eligible headline generations engage; interleaved A/Bs at the
    # 3-generation headline shape measured median +5.5% (3 pairs) and
    # +4.7% (5 pairs; clean pairs +4..13%) — the win is the removal of a
    # core-count-INDEPENDENT driver term, so it grows with cluster size.
    overlap_plan: bool = True
    collect_metrics: bool = True


def _with_keys(df: DataFrame, url_col: str = "url") -> DataFrame:
    kh = surt_and_host(F.col(url_col))
    return (df.withColumn("_kh", kh)
            .withColumn("urlkey", F.col("_kh.urlkey"))
            .withColumn("host", F.col("_kh.host"))
            .drop("_kh"))


def init_frontier(seeds: DataFrame) -> DataFrame:
    """seeds(url, priority) -> frontier(urlkey, url, host, priority,
    generation).  Duplicate seeds collapse to max priority."""
    return (_with_keys(seeds)
            .groupBy("urlkey")
            .agg(F.max("priority").alias("priority"),
                 F.min("url").alias("url"), F.min("host").alias("host"))
            .withColumn("generation", F.lit(0))
            .select("urlkey", "url", "host", "priority", "generation"))


def distributed_top_k(df: DataFrame, order_cols, k: int,
                      scratch: list | None = None) -> DataFrame:
    """Exact global top-k without the driver merge.

    ``orderBy().limit(k)`` (TakeOrderedAndProject) ships up to k rows *per
    partition* to the driver and merges them single-threaded — for a 10^5+
    batch that serializes the whole scheduler and anti-scales with partition
    count.  Instead: range-partition on the order (so partition i precedes
    partition i+1 globally), sort within partitions, then take per-partition
    quotas computed from partition COUNTS (the only thing the driver ever
    sees).  Exact, deterministic, and independent of partitioning."""
    ranged = (df.repartitionByRange(*order_cols)
              .sortWithinPartitions(*order_cols)
              .localCheckpoint(eager=True))
    if scratch is not None:
        # the ranged checkpoint backs the returned frame; hand it to the
        # caller so its blocks are freed once the result materializes
        # (a per-generation leak otherwise — util.free_checkpoint)
        scratch.append(ranged)
    counts = {r["pid"]: r["cnt"] for r in
              ranged.groupBy(F.spark_partition_id().alias("pid"))
              .agg(F.count("*").alias("cnt")).collect()}
    quotas: dict[int, int] = {}
    remaining = k
    for pid in sorted(counts):
        if remaining <= 0:
            break
        take = min(remaining, counts[pid])
        quotas[pid] = take
        remaining -= take
    bc = df.sparkSession.sparkContext.broadcast(quotas)
    schema = ranged.schema

    def take_fn(batches):
        from pyspark import TaskContext
        quota = bc.value.get(TaskContext.get().partitionId(), 0)
        taken = 0
        for pdf in batches:
            if taken >= quota:
                break
            n = min(len(pdf), quota - taken)
            yield pdf.iloc[:n]
            taken += n

    return ranged.mapInPandas(take_fn, schema)


def schedule(frontier: DataFrame, cfg: CrawlConfig,
             frontier_size: int | None = None,
             host_budgets: DataFrame | None = None,
             scratch: list | None = None) -> DataFrame:
    """Politeness + priority-queue pop: per-host budget then global top-k,
    fully deterministic (urlkey tiebreaks).

    ``host_budgets`` (host, budget) optionally REDUCES specific hosts'
    budgets below cfg.per_host_budget (e.g. robots Crawl-delay via
    frontier.robots.host_budgets); values above the default are clamped
    by construction there, so the salted skew guard — sized for the
    default — stays an upper bound.  The join rides the same (host)
    hash partitioning the politeness window needs: no extra shuffle of
    the frontier.

    Phase 0 (skew): partial top-k within (host, salt) — cheap map-side
    bound so the hottest Zipf host can't overload one reducer.  Skipped
    (result-identical: phase 1 is exact, and every per-host top-budget
    row is inside its salt bucket's top-budget) while the frontier is
    known to be below cfg.salt_phase_min_rows — one fewer window shuffle
    per generation.
    Phase 1: exact row_number per host ≤ budget.
    Phase 2: global top ``global_batch`` by (priority, urlkey) via a
    range-partitioned sort (no single-node sort)."""
    pre = frontier
    if frontier_size is None or frontier_size >= cfg.salt_phase_min_rows:
        salted = frontier.withColumn(
            "salt", F.pmod(F.xxhash64("urlkey"), F.lit(N_SALT)))
        w0 = (Window.partitionBy("host", "salt")
              .orderBy(F.desc("priority"), "urlkey"))
        pre = (salted.withColumn("rn0", F.row_number().over(w0))
               .filter(F.col("rn0") <= cfg.per_host_budget)
               .drop("rn0", "salt"))
    w1 = Window.partitionBy("host").orderBy(F.desc("priority"), "urlkey")
    if host_budgets is not None:
        pre = pre.join(host_budgets, "host", "left")
        cap = F.coalesce(F.col("budget"), F.lit(cfg.per_host_budget))
    else:
        cap = F.lit(cfg.per_host_budget)
    polite = (pre.withColumn("rn", F.row_number().over(w1))
              .filter(F.col("rn") <= cap).drop("rn"))
    if host_budgets is not None:
        polite = polite.drop("budget")
    if frontier_size is not None and frontier_size <= cfg.global_batch:
        # the whole frontier fits in the batch: every polite row is
        # selected, so the global top-k (a full sort + extra
        # materialization, zero-scaling at sandbox size) is a no-op —
        # skip it.  Typical of the ramp-up generations of a crawl.
        return polite
    if cfg.global_batch <= 150_000:
        # TakeOrderedAndProject: k-per-partition heaps + driver merge.
        # Profiling at 400k-row frontiers showed this beats the exact
        # distributed quota pop (which pays a full extra materialization)
        # until k reaches several hundred thousand.
        return (polite.orderBy(F.desc("priority"), "urlkey")
                .limit(cfg.global_batch))
    return distributed_top_k(polite, [F.desc("priority"), F.col("urlkey")],
                             cfg.global_batch, scratch=scratch)


def page_cdx(parsed: DataFrame) -> DataFrame:
    """CDX projection of fetched+parsed pages (the reference's 11 fields
    where they exist for a live page; ``checksum`` was fabricated at parse
    time as base32(sha1(html)) exactly like cdx_writer.py:399-425)."""
    return parsed.select(
        F.col("urlkey").alias("urlkey"),
        F.date_format("warc_ts", "yyyyMMddHHmmss").alias("cdx_date"),
        F.col("url").alias("original_url"),
        F.lit("text/html").alias("mime"),
        F.lit("200").alias("status_code"),
        F.col("checksum"),
        F.lit("-").alias("redirect"),
        F.lit("-").alias("meta_flags"),
        F.col("html_len").cast("string").alias("rec_size"),
        F.lit("-").alias("rec_offset"),
        F.col("generation"))


# RFC 3986 §2.3 unreserved characters: a percent-encoded octet in this set
# is equivalent to the bare character and is DECODED during normalization;
# everything else (reserved gen/sub-delims, non-ASCII, controls) stays
# encoded, with its hex digits uppercased (RFC 3986 §6.2.2.1).
_UNRESERVED = ("ABCDEFGHIJKLMNOPQRSTUVWXYZ"
               "abcdefghijklmnopqrstuvwxyz0123456789-._~")


def _pct_norm_expr(col) -> "F.Column":
    """RFC 9309 §2.2.2 percent-encoding normalization as a pure JVM
    expression (no UDF): ``%XX`` decodes when the octet is unreserved
    (so ``Disallow: /%7Ejoe/`` matches ``/~joe/``), otherwise the hex is
    uppercased (``%2f`` ≡ ``%2F``); a ``%`` not followed by two hex
    digits stays literal.  Note ``%2A``/``%24`` stay ENCODED (``*`` and
    ``$`` are reserved sub-delims) and are therefore literal octets, not
    wildcard/anchor metacharacters — matching Google's reference matcher.
    Strings without ``%`` (the overwhelming majority of URL paths) pay a
    single contains() check."""
    dec = F.create_map(*[lit for ch in _UNRESERVED
                         for lit in (F.lit(f"{ord(ch):02X}"), F.lit(ch))])
    parts = F.split(col, "%", -1)
    rest = F.slice(parts, 2, F.greatest(F.size(parts) - 1, F.lit(0)))

    def fix(x):
        hx = F.upper(F.substring(x, 1, 2))
        return F.when(
            x.rlike("^[0-9A-Fa-f]{2}"),
            F.concat(F.coalesce(dec[hx], F.concat(F.lit("%"), hx)),
                     F.substring(x, 3, 2147483647))
        ).otherwise(F.concat(F.lit("%"), x))

    norm = F.concat(F.element_at(parts, 1),
                    F.array_join(F.transform(rest, fix), ""))
    return F.when(col.contains("%"), norm).otherwise(col)


def robots_rules_table(robots: DataFrame) -> DataFrame:
    """Per-host rule aggregation feeding robots_gate — generation-invariant,
    so run_crawl builds this plan ONCE and reuses it every generation
    (the regex-translation expression construction alone is hundreds of
    driver py4j calls).  Rule paths are percent-encoding-normalized first
    (RFC 9309 §2.2.2 — see _pct_norm_expr), so rule specificity (octet
    length) is measured on the canonical form.  Rules containing RFC 9309
    §2.2.3 special characters (``*`` = any octet sequence, trailing ``$``
    = end anchor) are translated here, in the tiny per-host agg, to
    anchored Java regexes; wildcard-free rules stay plain prefixes."""
    p = _pct_norm_expr(F.col("path_prefix"))
    # a '*' anywhere or a terminal '$' makes the rule a wildcard rule;
    # a '$' mid-rule is a literal octet per the RFC's grammar
    is_wild = p.contains("*") | p.endswith("$")
    # literal -> anchored regex: escape Java-regex specials except '*',
    # then '*' -> '.*', then a trailing escaped-'$' back to the anchor
    esc = F.regexp_replace(p, r"([.\\+?\[\]^$(){}|])", r"\\$1")
    rex = F.regexp_replace(esc, r"\*", ".*")
    rex = F.regexp_replace(rex, r"\\\$$", r"\$")
    wild_rule = F.struct(F.concat(F.lit("^"), rex).alias("rex"),
                         F.length(p).alias("n"))
    return (robots.filter(F.col("rule_type").isin("allow", "disallow"))
            .groupBy("host")
            .agg(F.collect_list(
                     F.when((F.col("rule_type") == "disallow") & ~is_wild,
                            p)).alias("bans"),
                 F.collect_list(
                     F.when((F.col("rule_type") == "allow") & ~is_wild,
                            p)).alias("allows"),
                 F.collect_list(
                     F.when((F.col("rule_type") == "disallow") & is_wild,
                            wild_rule)).alias("bans_w"),
                 F.collect_list(
                     F.when((F.col("rule_type") == "allow") & is_wild,
                            wild_rule)).alias("allows_w")))


_GATE_KEEP: "tuple | None" = None   # (SparkContext, Column)


def _gate_keep_col() -> "F.Column":
    """``NOT blocked`` filter over a candidates-⋈-rules row, cached per
    SparkContext (pure unresolved-attribute expression: ~100 py4j calls
    plus four aggregate-lambda closures per build, all per-generation
    driver time before this cache; see _active_ctx for the keying)."""
    global _GATE_KEEP
    ctx = _active_ctx()
    if _GATE_KEEP is not None and _GATE_KEEP[0] is ctx:
        return _GATE_KEEP[1]
    path = _pct_norm_expr(F.regexp_replace("url", r"^https?://[^/]*", ""))

    def longest_match(plain, wild):
        lp = F.aggregate(
            F.coalesce(plain, F.array().cast("array<string>")), F.lit(-1),
            lambda acc, r: F.when(path.startswith(r)
                                  & (F.length(r) > acc), F.length(r))
            .otherwise(acc))
        lw = F.aggregate(
            F.coalesce(wild,
                       F.array().cast("array<struct<rex:string,n:int>>")),
            F.lit(-1),
            lambda acc, r: F.when(F.regexp_like(path, r["rex"])
                                  & (r["n"] > acc), r["n"]).otherwise(acc))
        return F.greatest(lp, lw)

    _GATE_KEEP = (ctx, ~(longest_match(F.col("bans"), F.col("bans_w"))
                         > longest_match(F.col("allows"), F.col("allows_w"))))
    return _GATE_KEEP[1]


def robots_gate(candidates: DataFrame, robots: DataFrame | None = None,
                rules: DataFrame | None = None) -> DataFrame:
    """Broadcast-join robots rules on host; drop candidates the rules
    disallow, with RFC 9309 longest-match semantics: the most specific
    matching rule wins (specificity = rule-pattern octet length, as in
    Google's reference matcher), Allow wins a length tie — so an
    'Allow: /a/pub' carve-out inside 'Disallow: /a/' admits /a/pub/....
    RFC 9309 §2.2.3 special characters are supported (``*``/``$`` — see
    robots_rules_table).  Both rule paths and URL paths are normalized to
    canonical percent-encoding before comparison (RFC 9309 §2.2.2:
    unreserved octets decoded, remaining hex uppercased — _pct_norm_expr),
    so ``Disallow: /%7Ejoe/`` blocks ``/~joe/``.  Vectorized higher-order
    array folds, no UDF.

    Pass a prebuilt ``rules`` (robots_rules_table) to skip rebuilding the
    aggregation plan — run_crawl does, once for the whole crawl."""
    if rules is None:
        if robots is None:
            raise ValueError(
                "robots_gate needs either `robots` (raw (host, rule_type, "
                "path_prefix) rows) or a prebuilt `rules` table")
        rules = robots_rules_table(robots)
    joined = candidates.join(F.broadcast(rules), "host", "left")
    return joined.filter(_gate_keep_col()).drop("bans", "allows", "bans_w",
                                                "allows_w")


def crawl_step(pages: DataFrame, frontier: DataFrame, seen: DataFrame,
               robots: DataFrame | None, cfg: CrawlConfig, gen: int,
               bloom=None, recent: DataFrame | None = None,
               frontier_size: int | None = None, fused: bool = False,
               host_budgets: DataFrame | None = None,
               robots_rules: DataFrame | None = None):
    """One generation.  Returns (next_frontier, new_seen_keys, cdx, metrics).

    ``pages`` simulates the web: fetch = equi join on url.  ``bloom`` is an
    optional pre-built seen-set filter — a (bitmap|Broadcast, m, k) tuple
    or a seen.ShardedBloom (run_crawl maintains either incrementally);
    ``recent`` is the small set of keys seen since the filter last covered
    the full set (see seen.anti_join_seen).  Without a bloom the exact
    anti-join runs alone.

    Metric counts ride as ``observe()`` metrics on frames this step
    already materializes eagerly — zero extra jobs per generation (the
    count() jobs they replace were the loop's Amdahl serial term at
    small batch sizes).

    ``fused`` (run_crawl turns it on while the frontier is below
    cfg.fuse_below_rows): the generation runs as ONE heavy job — the
    next-frontier checkpoint in run_crawl — plus a trivial count of the
    persisted parse blocks.  Every compute-once frame (selection,
    parsed, bloom-flagged candidates) uses a LAZY localCheckpoint: the
    first job that touches it materializes+persists it in-line and
    later consumers (including a second union branch of the SAME job)
    read the persisted blocks, verified compute-once on Spark 4.1.2.
    The seen delta has no job of its own either: run_crawl derives it
    from the checkpointed next frontier (generation == gen+1) as a lazy
    checkpoint materialized by its first consumer.  Rationale: each
    eager job barrier measured ~1.5-2s of core-count-independent
    stage-launch + planning time at 16c (the 4-5-job round-2 layout
    cost ~12s/generation — the Amdahl term behind the loop's 0.26
    round-2 scaling; fusing the parse barrier was another interleaved
    +10% at 16c).  Observations stay on eager checkpoints only: an
    observe() under a lazy checkpoint records nothing (verified — the
    metric fires empty), which is why the scheduled count is a
    post-materialization count() instead.
    """
    from pyspark.sql import Observation

    # sub-phase wall clocks (driver): populated into metrics["step_phases"]
    # when SPARK_GRAFT_STEP_TIMERS=1 — diagnostics for the Amdahl-term work
    _timers: dict[str, float] = {}
    _timing = os.environ.get("SPARK_GRAFT_STEP_TIMERS") == "1"

    def _mark(tag: str, t0: float) -> float:
        t = time.perf_counter()
        if _timing:
            _timers[tag] = round(t - t0, 3)
        return t

    _t = time.perf_counter()
    # materialize the (small, batch-bounded) selection once — it feeds the
    # fetch join, the leftover anti-join and the metrics, and its lineage
    # contains window shuffles that must not re-execute per consumer.
    # Fused: lazily — the fetch join's broadcast build materializes it.
    # (A round-4 experiment replaced this + the leftover anti-join with a
    # single flagged "staged" checkpoint, fusing gen-0 seed dedup into the
    # politeness window's host partitioning — interleaved same-window A/B
    # at 16c measured it 0.81x: under AQE each lazy checkpoint's toRdd
    # materializes its pre-final stages one driver round-trip at a time,
    # so the fewer-exchanges layout actually serialized MORE than the
    # eager init job it replaced, and the staged checkpoint write cost
    # more than the broadcast anti-join it removed.  Reverted; evidence
    # in BENCH.md.  A second round-4 experiment swapped these lazy
    # localCheckpoints for persist() — a ~free cache mark vs 0.5-1.5s of
    # toRdd planning — and measured 0.77x pairwise on steal-clean
    # windows: DataFrame persist() routes through the COLUMNAR
    # InMemoryRelation, which anti-scales under task concurrency on
    # this host, while localCheckpoint persists raw row blocks and its
    # toRdd pre-materialization is reused stage work.  Also reverted;
    # evidence in BENCH.md.)
    scratch: list = []
    selected = (schedule(frontier, cfg, frontier_size,
                         host_budgets=host_budgets, scratch=scratch)
                .withColumn("generation", F.lit(gen))
                .localCheckpoint(eager=not fused))
    scratch.append(selected)
    _t = _mark("selected_ckpt", _t)

    # fetch: small batches broadcast against the (arbitrarily large) web
    # so the pages table never shuffles; big batches pay a shuffle join
    # instead — the driver collect + rebroadcast of a 10^5+-row batch is
    # measured serial time every generation, and at production batch
    # sizes would be GBs through one process.  The shuffle join is
    # preceded by a bloom pre-filter built from the batch keys (~1.2 MB
    # per 10^6 keys): only probable matches shuffle their payload, so
    # the web side's shuffle volume is ~|batch| rows instead of |web| —
    # at the production web:batch ratio (~100:1) a ~100x cut, and on
    # this host it keeps the join under the measured DRAM-bandwidth
    # ceiling (BENCH.md).  False positives are resolved by the join
    # itself.  (Deployed, pages and frontier are additionally bucketed
    # on their keys so the join is storage-partitioned; see
    # plans/layout.py.)
    web = pages.select("url", "warc_ts", "html")
    small_batch = cfg.global_batch <= cfg.broadcast_batch_max_rows
    if small_batch:
        fetched = web.join(F.broadcast(selected), "url", "inner")
    else:
        from .seen import bloom_prefilter, build_bloom
        fb, fm, fk = build_bloom(selected, "url",
                                 capacity=cfg.global_batch, fpp=0.02)
        pre = (bloom_prefilter(web, "url", fb, fm, fk)
               .filter(F.col("maybe_seen")).drop("maybe_seen"))
        fetched = pre.join(selected, "url", "inner")
    _t = _mark("fetch_bloom", _t)
    # parse once, checkpoint a SLIM projection (digest + outlinks, never the
    # raw html) — both the CDX emission and the discovery stage read it, so
    # the web table is scanned exactly once per generation.  Fused: LAZY,
    # so fetch+parse+discover+anti-join+union all materialize inside the
    # single next-frontier job (one barrier fewer — each eager job was
    # measured carrying ~1.5-2s of core-count-independent stage-launch +
    # plan time at 16c); the scheduled count then can't ride an observe()
    # (fires empty under a lazy checkpoint) — run_crawl counts the
    # persisted parsed blocks afterwards (~0.1s job).
    # the page payload NEVER crosses the JVM->Python boundary: the digest
    # is JVM expression arithmetic (sha1 + base32 bit algebra) and href
    # extraction is regexp_extract_all inside codegen; Python receives
    # only the slim href arrays for urljoin normalization.  Shipping raw
    # html through Arrow (the previous layout) was the loop's largest
    # DRAM mover — the binding resource on the bandwidth-capped 16-core
    # side (BENCH.md), and at 100 TB/generation scale pure waste.
    parsed_plan = fetched.select(
        "urlkey", "url", "warc_ts", "generation", "priority", *_parse_cols())
    _t = _mark("parsed_plan_build", _t)
    if fused:
        obs_parsed = None
        parsed = parsed_plan.localCheckpoint(eager=False)
    else:
        obs_parsed = Observation()
        parsed = (parsed_plan
                  .observe(obs_parsed, F.count(F.lit(1)).alias("n"))
                  .localCheckpoint(eager=True))
    _t = _mark("parsed_ckpt", _t)
    cdx = page_cdx(parsed)

    # discover: explode outlinks -> dedup RAW urls -> canonicalize -> dedup
    # urlkeys.  Nav-link duplication on the web is ~10x, so deduping the raw
    # strings first (pure JVM hash agg) cuts the python SURT kernel's input
    # by that factor; the second (cheap) agg merges the few raw spellings
    # that canonicalize to the same urlkey.
    cand = (parsed.select(F.col("priority").alias("parent_priority"),
                          F.explode("outlinks").alias("url"))
            .groupBy("url")
            .agg(F.max("parent_priority").alias("parent_priority"))
            .transform(_with_keys)
            .groupBy("urlkey")
            .agg(F.max("parent_priority").alias("parent_priority"),
                 F.min("url").alias("url"), F.min("host").alias("host")))
    if robots_rules is not None or robots is not None:
        cand = robots_gate(cand, robots, rules=robots_rules)
    _t = _mark("cand_robots_build", _t)

    # seen-set: candidates anti-join seen (bloom pre-filter cuts the probe
    # volume; the exact join stays the source of truth)
    from .seen import anti_join_seen
    novel = anti_join_seen(cand, seen, "urlkey", bloom=bloom, recent=recent,
                           materialize="lazy" if fused else True,
                           scratch=scratch)
    _t = _mark("anti_join_seen", _t)

    new_entries = novel.select(
        "urlkey", "url", "host",
        F.round(F.col("parent_priority") * cfg.priority_decay, 6).alias("priority"),
        F.lit(gen + 1).alias("generation"))
    if fused:
        # no checkpoint and no observation: new_entries materializes once,
        # inside the next-frontier checkpoint job; run_crawl reads the
        # novel count off that job's observation and derives the seen
        # delta by filtering the checkpointed frontier on generation
        obs_novel = None
        new_seen_keys = None
    else:
        obs_novel = Observation()
        new_entries = (new_entries
                       .observe(obs_novel, F.count(F.lit(1)).alias("n"))
                       .localCheckpoint(eager=True))
        # only the novel discoveries are new to the seen set: selected
        # URLs entered it the moment they were enqueued (distinct by
        # construction, so the union below needs no dedup shuffle)
        new_seen_keys = new_entries.select("urlkey")

    # selected is bounded by global_batch — broadcast when small so the
    # (much larger) frontier never shuffles for this anti-join; same
    # size gate as the fetch join above
    _t = _mark("new_entries_ckpt", _t)
    sel_keys = selected.select("urlkey")
    leftover = frontier.join(
        F.broadcast(sel_keys) if small_batch else sel_keys,
        "urlkey", "left_anti")
    next_frontier = leftover.unionByName(new_entries)
    _t = _mark("leftover_union_build", _t)

    # non-fused: parsed's eager localCheckpoint already ran its job; this
    # get returns the recorded metric without launching anything.  Fused:
    # parsed hasn't materialized yet — run_crawl fills the count in after
    # the frontier job (which materializes it in-line) completes.
    n_fetched = None if fused else int(obs_parsed.get["n"])
    metrics = {
        "generation": gen,
        "scheduled": n_fetched,    # == fetched == cdx rows by design
        "cdx_rows": n_fetched,
        "_parsed": parsed if fused else None,
        # checkpointed frames with no consumer after the next frontier
        # materializes — run_crawl frees their blocks with
        # util.free_checkpoint (plain unpersist() is a no-op on
        # localCheckpoint blocks; un-freed they accumulate across
        # generations and throughput degrades monotonically — measured
        # 2x over 3 repeats)
        "_scratch": scratch,
    }
    if _timing:
        metrics["step_phases"] = dict(_timers)
    if not fused:
        metrics["novel"] = int(obs_novel.get["n"])
        # the persisted frame behind new_seen (a projection of it): the
        # handle the seen-delta lifecycle must free at compaction
        metrics["_delta_handle"] = new_entries
    return next_frontier, new_seen_keys, cdx, metrics


# ------------------------------------------------------------ checkpoint --

def _gen_dir(root: str, gen: int) -> str:
    return os.path.join(root, f"gen={gen:05d}")


class _AsyncSave:
    """At-most-one-outstanding background checkpoint writer.

    Spark supports concurrent job submission from multiple driver
    threads, so the per-generation parquet writes (frontier, seen delta,
    cdx, manifest-last) overlap the next generation's compute instead of
    serializing after it.  ``join()`` re-raises any writer failure; the
    loop joins before starting the next write, before freeing any blocks
    the writer might still read (delta compaction), and before
    returning."""

    def __init__(self):
        self._t = None
        self._err = None

    def start(self, *args):
        import threading
        self.join()

        def run():
            try:
                save_state(*args)
            except BaseException as e:   # re-raised at join
                self._err = e

        self._t = threading.Thread(target=run, daemon=True)
        self._t.start()

    def join(self):
        if self._t is not None:
            self._t.join()
            self._t = None
        if self._err is not None:
            err, self._err = self._err, None
            raise err


class _AsyncPlan:
    """One-shot background plan builder (driver-thread overlap).

    Spark plan construction is py4j + Catalyst analysis work on the
    driver; running it on a second thread while the main thread blocks
    in the current generation's heavy job overlaps the loop's serial
    plan term with executor compute.  Build errors are captured, not
    raised — the caller falls back to a fresh foreground build (which
    would surface any real defect)."""

    def __init__(self, fn):
        import threading
        self.result = None
        self.error: BaseException | None = None

        def run():
            try:
                self.result = fn()
            except BaseException as e:   # speculative: never kills the loop
                self.error = e

        self._t = threading.Thread(target=run, daemon=True)
        self._t.start()

    def join(self):
        self._t.join()
        return self.result


def _gate_decisions(cfg: CrawlConfig, frontier_size: int | None) -> tuple:
    """The three result-identical-optimization gates a crawl_step plan
    bakes in from frontier_size (plus the AQE toggle key, which follows
    fused).  Two sizes with equal decisions produce interchangeable
    plans — the overlap-mode validation predicate."""
    fused = frontier_size is not None and frontier_size < cfg.fuse_below_rows
    salt_on = frontier_size is None or frontier_size >= cfg.salt_phase_min_rows
    topk_skip = (frontier_size is not None
                 and frontier_size <= cfg.global_batch)
    return (fused, salt_on, topk_skip)


def _part_files(path: str) -> list[dict]:
    """Per-partition lineage entry for one written parquet artifact:
    the part files with their byte sizes, straight off the filesystem
    (no Spark job)."""
    try:
        return sorted(
            ({"file": f, "bytes": os.path.getsize(os.path.join(path, f))}
             for f in os.listdir(path)
             if f.startswith("part-") and not f.endswith(".crc")),
            key=lambda e: e["file"])
    except OSError:
        return []


def save_state(root: str, gen: int, frontier: DataFrame, seen_delta: DataFrame,
               cdx: DataFrame, metrics: dict):
    """Per-generation snapshot.  ``seen`` is stored as a DELTA (this
    generation's new keys; gen 0 additionally carries the seed keys) — the
    seen set grows monotonically, so rewriting the whole set per generation
    would be O(total) I/O per generation at 10^10 scale.  Resume unions the
    deltas.

    The frontier is materialized as the north rule's priority queue:
    range-partitioned on DESCENDING priority (urlkey tiebreak) and sorted
    within partitions, so each parquet part file covers one priority
    range and carries min/max priority stats — a resumed scheduler that
    wants the top of the queue prunes whole files/row groups instead of
    scanning the frontier (and the hottest partition is the FIRST one,
    which a streaming consumer can take alone).  The manifest records
    per-partition lineage: every part file of every artifact with its
    size, the parent generation, the layout contract, and the
    generation's fetch/parse metrics (scheduled / novel / cdx_rows /
    wall_phases ride in ``metrics``)."""
    d = _gen_dir(root, gen)
    # partition count sized from the frontier (known for free from the
    # generation's observe() metric): ~5M rows per sorted partition at
    # scale, one file for the small frontiers of tests/sandbox runs
    n_rows = metrics.get("frontier_size")
    n_parts = (max(1, min(-(-n_rows // 5_000_000), 10_000))
               if n_rows is not None else None)
    srt = (F.desc("priority"), F.asc("urlkey"))
    fr_sorted = (frontier.repartitionByRange(n_parts, *srt) if n_parts
                 else frontier.repartitionByRange(*srt))
    (fr_sorted.sortWithinPartitions(*srt)
     .write.mode("overwrite").parquet(os.path.join(d, "frontier")))
    seen_delta.write.mode("overwrite").parquet(os.path.join(d, "seen"))
    cdx.write.mode("overwrite").parquet(os.path.join(d, "cdx"))
    manifest = dict(metrics)
    manifest["complete"] = True
    # format stamp: 'delta-v2' = per-generation seen DELTAS (union to
    # reassemble); absent = legacy full-snapshot-per-generation format
    manifest["seen_format"] = "delta-v2"
    manifest["lineage"] = {
        "parent_gen": gen - 1 if gen > 0 else None,
        "frontier_layout": list(_FRONTIER_LAYOUT),
        "partitions": {name: _part_files(os.path.join(d, name))
                       for name in ("frontier", "seen", "cdx")},
    }
    with open(os.path.join(d, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2)


_FRONTIER_LAYOUT = ["priority DESC", "urlkey ASC"]


def _latest_complete(root: str):
    """Newest generation dir under ``root`` whose manifest says
    complete -> (gen, dir, manifest) or None.  The single source of the
    latest-checkpoint rule, shared by load_state and frontier_top."""
    if not os.path.isdir(root):
        return None
    for g in sorted((g for g in os.listdir(root) if g.startswith("gen=")),
                    reverse=True):
        mf = os.path.join(root, g, "manifest.json")
        if os.path.exists(mf):
            with open(mf) as fh:
                m = json.load(fh)
            if m.get("complete"):
                return int(g.split("=")[1]), os.path.join(root, g), m
    return None


def frontier_top(spark: SparkSession, root: str, n: int) -> DataFrame:
    """Top-``n`` of the persisted priority queue WITHOUT scanning the
    frontier — the operational "what crawls next" query.

    The sorted-partition layout (save_state) is what makes this O(n)
    instead of O(frontier): part files cover DISJOINT descending
    (priority DESC, urlkey ASC) ranges in file-index order, so reading
    files in order until ``n`` rows are accumulated is EXACT — every row
    with priority above the cutoff lives in the files already read, and
    ties at the cutoff sort into earlier files too (same priority ⇒
    smaller urlkey first, and urlkey is unique in the frontier).  Row
    counts come from parquet footers (no data read); at a 10^10-row
    frontier a top-10^5 probe touches one ~5M-row file instead of 2000.

    The manifest's declared ``frontier_layout`` gates the pruning:
    legacy checkpoints without lineage, or any future/foreign layout,
    fall back to a full scan + TakeOrdered instead of silently reading
    the wrong files."""
    import pyarrow.parquet as pq

    state = _latest_complete(root)
    if state is None:
        raise FileNotFoundError(f"no complete checkpoint under {root}")
    _gen, state_dir, m = state
    fdir = os.path.join(state_dir, "frontier")
    order = (F.desc("priority"), F.asc("urlkey"))
    lin = m.get("lineage") or {}
    parts = (lin.get("partitions") or {}).get("frontier")
    if not parts or lin.get("frontier_layout") != _FRONTIER_LAYOUT:
        # legacy checkpoint, or a layout this reader doesn't understand
        return spark.read.parquet(fdir).orderBy(*order).limit(n)
    subset, rows = [], 0
    for e in parts:   # lineage order == range-partition order
        path = os.path.join(fdir, e["file"])
        subset.append(path)
        rows += pq.ParquetFile(path).metadata.num_rows
        if rows >= n:
            break
    return spark.read.parquet(*subset).orderBy(*order).limit(n)


def _tombstones(root: str) -> list[tuple[int, str]]:
    """Persisted recrawl-expiry tombstones under ``root/expired/`` ->
    [(asof_gen, keys_parquet_path)] ascending by asof_gen.  A tombstone
    written when a resume started at generation ``s`` cancels seen /
    emitted keys recorded by generations < s; deltas from s onward (which
    contain any rediscoveries) are untouched — so a rediscovered-and-
    re-emitted URL stays seen across later resumes while a
    not-yet-rediscovered one stays expired, without re-passing
    expire_keys."""
    d = os.path.join(root, "expired")
    if not os.path.isdir(d):
        return []
    out = []
    for name in sorted(os.listdir(d)):
        mf = os.path.join(d, name, "manifest.json")
        if os.path.exists(mf):
            with open(mf) as fh:
                m = json.load(fh)
            if m.get("complete"):
                out.append((int(m["asof_gen"]),
                            os.path.join(d, name, "keys")))
    out.sort(key=lambda t: t[0])
    return out


def _write_tombstone(root: str, asof_gen: int, exp: DataFrame) -> None:
    """Persist a recrawl-expiry tombstone (keys parquet + manifest-last,
    same complete-marker discipline as generation checkpoints).  Multiple
    tombstones may share an asof_gen (re-expiry at the same resume
    point); the subtraction in load_state applies each independently."""
    base = os.path.join(root, "expired")
    os.makedirs(base, exist_ok=True)
    k = 0
    while os.path.exists(os.path.join(base, f"asof={asof_gen:05d}-{k:02d}")):
        k += 1
    d = os.path.join(base, f"asof={asof_gen:05d}-{k:02d}")
    exp.write.mode("overwrite").parquet(os.path.join(d, "keys"))
    with open(os.path.join(d, "manifest.json"), "w") as f:
        json.dump({"complete": True, "asof_gen": asof_gen}, f)


def _subtract_tombstones(spark: SparkSession, frames: list[tuple[int, DataFrame]],
                         tombs: list[tuple[int, str]],
                         key_col: str = "urlkey") -> DataFrame | None:
    """Union per-generation frames, anti-joining each generation with the
    tombstones NEWER than it (asof_gen > gen).  Frames sharing the same
    applicable-tombstone set are unioned first so the number of anti-joins
    is O(#tombstones), not O(#generations)."""
    if not frames:
        return None
    groups: dict[tuple, DataFrame] = {}
    for g, df in frames:
        key = tuple(p for a, p in tombs if a > g)
        groups[key] = df if key not in groups \
            else groups[key].unionByName(df)
    out = None
    for key, df in groups.items():
        if key:
            tomb = (spark.read.parquet(*key)
                    .select(key_col).distinct())
            df = df.join(tomb, key_col, "left_anti")
        out = df if out is None else out.unionByName(df)
    return out


def load_state(spark: SparkSession, root: str):
    """Latest complete checkpoint -> (gen, frontier, seen, metrics) or None.
    ``seen`` is reassembled as the union of the per-generation deltas up to
    and including the returned generation, minus any persisted recrawl
    tombstones (run_crawl(expire_keys=...) — see _tombstones) that
    postdate each delta."""
    state = _latest_complete(root)
    if state is None:
        return None
    gen, state_dir, m = state
    fr = spark.read.parquet(os.path.join(state_dir, "frontier"))
    # assemble the seen set newest-first, checking EACH generation's own
    # manifest: a delta-v2 gen contributes its delta and the walk
    # continues; a legacy gen stored the FULL set, superseding everything
    # before it — stop there.  (Deciding from only the latest manifest
    # would union legacy FULL snapshots as if they were deltas after a
    # resume that appended delta-v2 gens to a legacy dir, duplicating the
    # seen set ~gen-fold and inflating the bloom sizing.)
    parts: list[tuple[int, str]] = []
    for i in range(gen, -1, -1):
        parts.append((i, os.path.join(_gen_dir(root, i), "seen")))
        mfi = os.path.join(_gen_dir(root, i), "manifest.json")
        fmt = None
        if os.path.exists(mfi):
            with open(mfi) as fh:
                fmt = json.load(fh).get("seen_format")
        if fmt != "delta-v2":
            break
    tombs = _tombstones(root)
    if not tombs:
        seen = spark.read.parquet(*[p for _, p in parts])
    else:
        seen = _subtract_tombstones(
            spark, [(i, spark.read.parquet(p)) for i, p in parts], tombs)
    return gen, fr, seen, m


def run_crawl(spark: SparkSession, pages: DataFrame, seeds: DataFrame,
              robots: DataFrame | None, cfg: CrawlConfig, generations: int,
              checkpoint_dir: str | None = None, resume: bool = False,
              host_budgets: DataFrame | None = None,
              expire_keys: DataFrame | None = None):
    """Run ``generations`` crawl steps; returns (frontier, seen, all_cdx,
    metrics list).  With ``resume``, continues from the last complete
    checkpoint and never re-emits a CDX row (idempotence via anti-join on
    already-emitted urlkeys per generation).

    ``expire_keys`` (resume path): recrawl scheduling — a (urlkey) frame
    of URLs whose revisit interval expired.  They leave the seen set and
    the emitted-keys guard, so rediscovering them re-enqueues and
    re-emits.  With ``seen_filter="cuckoo"`` the expiry is a DELETE
    against the sharded filter (O(|expired|) co-grouped work) instead of
    the O(total) rebuild every bloom variant would need.  Cuckoo-delete
    caveat: deleting a key whose (fingerprint, bucket) collides with a
    different stored key can evict that victim from the filter, so a few
    URLs BEYOND the expired set may be re-crawled/re-emitted early — the
    standard cuckoo-filter deletion semantics; callers scheduling expiry
    should expect occasional extra duplicates (the exact seen table is
    untouched, so correctness of the filter+exact pipeline is preserved).
    The expiry is PERSISTED as a tombstone under
    ``checkpoint_dir/expired/`` (keys parquet + asof_gen manifest):
    later resumes subtract it from the seen/emitted reassembly for all
    generations that predate it, so a recrawl that wasn't rediscovered
    yet is not silently cancelled and expire_keys need not be re-passed.

    Scale bookkeeping (all O(delta) per generation, never O(total)):
    * the seen set is a UNION of per-generation checkpointed deltas — no
      generation rewrites or re-materializes the whole set;
    * the bloom filter over it is maintained incrementally.  Global mode
      (bloom_shards=0): built once with capacity headroom and broadcast
      ONCE; per-generation novel keys accumulate in a small exact
      `recent` side table (checked by broadcast anti-join) and are OR-ed
      into the bitmap + re-broadcast only when they exceed
      cfg.bloom_rebroadcast_keys — broadcast serialization is amortized,
      superseded broadcasts unpersisted.  Sharded mode (bloom_shards>0):
      the (shard, bitmap) table is merged with the delta's shard bitmaps
      each generation, all distributed, driver memory O(1) in keys;
    * rebuilt (with 4x capacity) only if the set outgrows the filter;
    * the seen-set cardinality that gates/params the bloom is a running
      total from per-generation novel counts — no seen.count() jobs;
    * per-generation metric counts are observe() metrics on frames the
      step materializes anyway — no dedicated count() jobs."""
    import numpy as np

    from .seen import ShardedBloom, ShardedCuckoo, build_bloom, \
        build_sharded_bloom, build_sharded_cuckoo, merge_sharded_blooms, \
        sharded_cuckoo_delete, sharded_cuckoo_insert

    use_cuckoo = cfg.seen_filter == "cuckoo"
    start_gen = 0
    all_metrics: list[dict] = []
    emitted_keys = None
    pre_expire_seen = exp = None
    seen_parts: list[DataFrame]
    if resume and checkpoint_dir:
        state = load_state(spark, checkpoint_dir)
        if state is not None:
            last_gen, frontier, seen, _m = state
            start_gen = last_gen + 1
            # reassemble the emitted-CDX guard with the same persisted-
            # tombstone subtraction load_state applies to the seen set:
            # a tombstone at asof_gen s cancels emissions from gens < s
            # only (re-emissions from s onward stay guarded)
            tombs = _tombstones(checkpoint_dir)
            emitted_keys = _subtract_tombstones(
                spark,
                [(g, spark.read.parquet(
                    os.path.join(_gen_dir(checkpoint_dir, g), "cdx")))
                 for g in range(start_gen)],
                tombs)
            if expire_keys is not None:
                # recrawl expiry: the keys leave the seen set AND the
                # re-emission guard, so rediscovery re-enqueues them.
                # Persisted as a tombstone FIRST (manifest-last), so a
                # later resume without expire_keys keeps the expiry for
                # everything this run didn't rediscover.
                exp = expire_keys.select("urlkey").distinct()
                _write_tombstone(checkpoint_dir, start_gen, exp)
                pre_expire_seen = seen
                seen = seen.join(exp, "urlkey", "left_anti")
                emitted_keys = emitted_keys.join(exp, "urlkey",
                                                 "left_anti")
        else:
            resume = False
    from pyspark.sql import Observation

    frontier_size: int | None = None   # None = unknown (resume) -> keep salt
    init_handle = None   # gen-0 frontier checkpoint: seen_parts[0] reads its
    #                      blocks, so it is freed only at delta compaction
    if start_gen == 0:
        obs0 = Observation()
        frontier = (init_frontier(seeds)
                    .observe(obs0, F.count(F.lit(1)).alias("n"))
                    .localCheckpoint(eager=True))
        frontier_size = int(obs0.get["n"])
        # compact lazy delta (see the fused seen-delta note below): the
        # seed keys materialize on first use, and the init frontier
        # snapshot is freed after generation 0 instead of being pinned
        # by this seen part until compaction
        seen = frontier.select("urlkey").localCheckpoint(eager=False)
        init_handle = seen
    seen_parts = [seen]
    # persisted frames backing seen_parts (None for resume's parquet read).
    # In fused generations the handle IS the generation's full frontier
    # snapshot (the seen delta is a filter over it), so a handle may back
    # both the live frontier and a seen part — the freeing rules below
    # check identity against this list before releasing any blocks.
    seen_handles: list = [init_handle]

    sc = spark.sparkContext
    if not cfg.use_bloom:
        seen_count = 0
    elif start_gen == 0:
        # fresh start: |seen| == |frontier| == the seed count we already
        # observed — no dedicated count() job
        seen_count = frontier_size
    else:
        seen_count = seen.count()
    bloom = None                    # (Broadcast, m, k) | ShardedBloom
    bloom_bits: "np.ndarray | None" = None   # driver copy, global mode
    bloom_bc = None                 # live broadcast handle, global mode
    bloom_mk: tuple[int, int] | None = None
    bloom_cap = 0
    recent_parts: list[DataFrame] = []   # novel keys not yet in the filter
    pending_novel = 0

    if (use_cuckoo and cfg.use_bloom and pre_expire_seen is not None
            and seen_count >= cfg.bloom_min_keys):
        # recrawl expiry with the deletable filter: build from the
        # PRE-expiry set once (the deployment persists this table across
        # runs, so in production this build doesn't happen either), then
        # DELETE the expired keys — O(|expired|) co-grouped work where
        # any bloom variant would need an O(total) rebuild.
        n_exp = exp.count()
        bloom_cap = max(4 * (seen_count + n_exp), cfg.bloom_min_keys)
        n_shards = cfg.bloom_shards or max(16, -(-bloom_cap // 16_000_000))
        filt = build_sharded_cuckoo(pre_expire_seen, "urlkey", n_shards,
                                    capacity=bloom_cap)
        filt = sharded_cuckoo_delete(filt, exp, "urlkey")
        bloom = ShardedCuckoo(filt.df.localCheckpoint(eager=True),
                              filt.n_shards, filt.n_buckets)

    cdx_parts = []
    saver = _AsyncSave()
    # the per-host robots rules aggregation is generation-invariant: build
    # the plan once (its regex-translation expression construction is
    # hundreds of driver py4j calls) and let each generation's broadcast
    # build re-run only the tiny agg job
    robots_rules_plan = (robots_rules_table(robots)
                         if robots is not None else None)
    aqe_key = "spark.sql.adaptive.enabled"
    aqe_orig = spark.conf.get(aqe_key, "true")
    pending: dict | None = None   # overlap-thread pre-built next plan
    prev_in_size: int | None = None   # last generation's INPUT frontier size
    try:
        for gen in range(start_gen, generations):
            # fused small-generation mode: see crawl_step.  Off when the
            # frontier size is unknown (resume) or at production scale.
            fused = (frontier_size is not None
                     and frontier_size < cfg.fuse_below_rows)
            if cfg.aqe_off_fused:
                # AQE re-plans every lazy localCheckpoint's toRdd one
                # materialized stage at a time — on a SHUFFLE-FREE
                # (broadcast-fetch) fused generation that driver-serial
                # planning buys nothing: interleaved A/B measured
                # AQE-off at 1.25-1.94x (median 1.69x) on the
                # 3-generation broadcast-path loop, identical output,
                # but 0.95x on the shuffle-join 400k-batch generation —
                # so the toggle keys on the fetch path.  Restored for
                # every other generation and at loop exit (BENCH.md).
                # The conf is SESSION-wide and the async checkpoint
                # writer plans jobs from a background thread, so the
                # value is only ever flipped after joining any in-flight
                # write — in a homogeneous run it is set once at gen 0
                # (no writer is outstanding yet) and every overlapped
                # save then plans under the same, intended setting.
                aqe_off = (fused and cfg.global_batch
                           <= cfg.broadcast_batch_max_rows)
                want = "false" if aqe_off else aqe_orig
                if spark.conf.get(aqe_key) != want:
                    saver.join()
                    spark.conf.set(aqe_key, want)
            want_sharded = cfg.bloom_shards > 0 or (
                cfg.use_bloom and seen_count >= cfg.bloom_auto_shard_keys)
            mode_flip = (bloom is not None and not use_cuckoo
                         and want_sharded != isinstance(bloom, ShardedBloom))
            if cfg.use_bloom and seen_count >= cfg.bloom_min_keys and (
                    bloom is None or seen_count > bloom_cap or mode_flip):
                # (re)build over the full set with headroom so later generations
                # only fold in their deltas
                bloom_cap = max(4 * seen_count, cfg.bloom_min_keys)
                if use_cuckoo:
                    # the cuckoo sidecar is ALWAYS the sharded table — its
                    # whole point is the 10^10 deletable path; shard sizing
                    # mirrors the sharded bloom's
                    n_shards = cfg.bloom_shards or max(
                        16, -(-bloom_cap // 16_000_000))
                    sck = build_sharded_cuckoo(seen, "urlkey", n_shards,
                                               capacity=bloom_cap)
                    old_bloom_df = bloom.df if isinstance(
                        bloom, (ShardedBloom, ShardedCuckoo)) else None
                    bloom = ShardedCuckoo(sck.df.localCheckpoint(eager=True),
                                          sck.n_shards, sck.n_buckets)
                    if old_bloom_df is not None:
                        free_checkpoint(old_bloom_df)
                elif want_sharded:
                    # auto-sized shards: ~16M keys (~20 MB bitmap) per shard
                    n_shards = cfg.bloom_shards or max(
                        16, -(-bloom_cap // 16_000_000))
                    sb = build_sharded_bloom(seen, "urlkey", n_shards,
                                             capacity=bloom_cap,
                                             fpp=cfg.bloom_fpp)
                    old_bloom_df = bloom.df if isinstance(bloom, ShardedBloom) \
                        else None
                    bloom = ShardedBloom(sb.df.localCheckpoint(eager=True),
                                         sb.n_shards, sb.m, sb.k)
                    if old_bloom_df is not None:
                        free_checkpoint(old_bloom_df)
                    if bloom_bc is not None:
                        # released the superseded GLOBAL filter (auto-flip)
                        bloom_bc.unpersist()
                        bloom_bc, bloom_bits, bloom_mk = None, None, None
                else:
                    b, m, k = build_bloom(seen, "urlkey", capacity=bloom_cap,
                                          fpp=cfg.bloom_fpp)
                    bloom_bits = np.frombuffer(b, dtype=np.uint64).copy()
                    bloom_mk = (m, k)
                    if bloom_bc is not None:
                        bloom_bc.unpersist()
                    bloom_bc = sc.broadcast(bloom_bits.tobytes())
                    bloom = (bloom_bc, m, k)
                recent_parts, pending_novel = [], 0
            use_sharded = isinstance(bloom, ShardedBloom)

            recent = _union_all(recent_parts) if recent_parts else None
            prev_frontier_handle = frontier   # current gen's persisted frontier
            prev_frontier_delta = seen_parts[-1]   # lazy delta reading its blocks
            _t0 = time.perf_counter()
            # a plan pre-built on the overlap thread last generation is
            # used ONLY if every assumption it baked in still holds:
            # same gate decisions under the ACTUAL frontier size, the
            # same live filter object (any rebuild/flush/insert replaces
            # it), the same recent-delta composition, no compaction, no
            # resume guard.  Otherwise it is discarded and the plan is
            # rebuilt fresh — results identical either way.
            used_prebuilt = False
            if (pending is not None and pending["gen"] == gen and fused
                    and emitted_keys is None
                    and pending["bloom"] is bloom
                    and pending["recent_ids"]
                    == tuple(id(p) for p in recent_parts)
                    and pending["n_seen_parts"] == len(seen_parts)
                    and pending["decisions"]
                    == _gate_decisions(cfg, frontier_size)):
                frontier, new_seen, cdx, metrics = pending["result"]
                metrics["plan_overlapped"] = True
                used_prebuilt = True
            else:
                # a discarded speculative plan was never materialized —
                # its lazy checkpoint marks hold no blocks; just drop it
                frontier, new_seen, cdx, metrics = crawl_step(
                    pages, frontier, seen, robots, cfg, gen, bloom=bloom,
                    recent=recent, frontier_size=frontier_size, fused=fused,
                    host_budgets=host_budgets,
                    robots_rules=robots_rules_plan)
                if pending is not None:
                    metrics["overlap_discarded"] = True
            pending = None
            _t1 = time.perf_counter()   # plan construction (+ fetch-bloom job)
            scratch = metrics.pop("_scratch", [])
            delta_handle = metrics.pop("_delta_handle", None)
            if emitted_keys is not None:
                cdx = cdx.join(emitted_keys.select("urlkey").distinct(),
                               "urlkey", "left_anti")
            # frontier feeds two consumers next generation (schedule + leftover
            # anti-join) through window shuffles — materialize it once; its
            # row count (and, fused, the novel-discovery count) ride along as
            # free observe() metrics.  In fused mode this is the generation's
            # ONLY heavy job: selection, fetch, parse, discovery, bloom
            # check, exact anti-join and union all materialize inside it.
            #
            # overlap_plan: while that job runs in THIS thread, a second
            # driver thread pre-builds generation gen+1's plan against the
            # lazy checkpoint handle (plan construction is pure driver
            # py4j/Catalyst work; Spark supports concurrent submission).
            # An observe() records nothing under a lazy checkpoint
            # (verified, BENCH.md), so this path takes the counts as two
            # jobs instead: the materializing count() IS the heavy job,
            # and the novel count re-reads the persisted blocks (~0.1s).
            do_overlap = (
                cfg.overlap_plan and fused and gen + 1 < generations
                and emitted_keys is None
                and cfg.global_batch <= 150_000
                and cfg.global_batch <= cfg.broadcast_batch_max_rows
                and len(seen_parts) + 1 < cfg.seen_compact_parts
                and (bloom is None or isinstance(bloom, tuple)))
            spec_delta_cur = None
            if do_overlap:
                frontier = frontier.localCheckpoint(eager=False)
                spec_delta_cur = (frontier
                                  .where(F.col("generation") == gen + 1)
                                  .select("urlkey")
                                  .localCheckpoint(eager=False))
                spec_seen = _union_all(seen_parts + [spec_delta_cur])
                spec_recent_parts = (recent_parts + [spec_delta_cur]
                                     if bloom is not None
                                     else list(recent_parts))
                spec_recent = (_union_all(spec_recent_parts)
                               if spec_recent_parts else None)
                # speculated next-generation frontier size; validated at
                # use.  The running job's output size is unknowable here,
                # but frontier growth in the discovery phase is
                # multiplicative (branching-factor), so extrapolating the
                # last observed growth RATIO (fs^2 / fs_prev) tracks it;
                # the ratio decays to 1 as the crawl saturates, and a
                # misprediction only costs a discarded plan (the
                # validation predicate compares gate DECISIONS under the
                # actual size, so results are identical either way).
                # Measured: the raw current-size guess strands the
                # gen-1->2 plan on the wrong side of the top-k gate on
                # both the headline shape (48k spec vs 78k actual) and
                # the test world (68 vs 211); the ratio guess lands on
                # the right side of every gate in both.
                spec_fs = frontier_size
                if prev_in_size:
                    spec_fs = max(0, round(
                        frontier_size * frontier_size / prev_in_size))
                _ckpt, _bl = frontier, bloom

                def _build(ckpt=_ckpt, sseen=spec_seen, srec=spec_recent,
                           g=gen + 1, fs=spec_fs, bl=_bl):
                    return crawl_step(
                        pages, ckpt, sseen, robots, cfg, g, bloom=bl,
                        recent=srec, frontier_size=fs, fused=True,
                        host_budgets=host_budgets,
                        robots_rules=robots_rules_plan)

                plan_thread = _AsyncPlan(_build)
                n_rows = frontier.count()           # the heavy job
                vals = {"n": n_rows,
                        "novel": frontier
                        .where(F.col("generation") == gen + 1).count()}
                res = plan_thread.join()
                if res is not None:
                    pending = {
                        "gen": gen + 1, "result": res, "bloom": _bl,
                        "recent_ids": tuple(id(p)
                                            for p in spec_recent_parts),
                        # seen_parts gains this generation's delta below
                        "n_seen_parts": len(seen_parts) + 1,
                        "decisions": _gate_decisions(cfg, spec_fs),
                    }
                elif plan_thread.error is not None:
                    metrics["overlap_error"] = repr(plan_thread.error)
            else:
                obs_f = Observation()
                frontier = (frontier.observe(
                    obs_f, F.count(F.lit(1)).alias("n"),
                    F.sum(F.when(F.col("generation") == gen + 1, 1)
                          .otherwise(0)).alias("novel"))
                    .localCheckpoint(eager=True))
                vals = obs_f.get
            _t2 = time.perf_counter()   # the heavy frontier job
            prev_in_size = frontier_size
            frontier_size = int(vals["n"])
            metrics["frontier_size"] = frontier_size
            parsed_handle = metrics.pop("_parsed", None)
            if fused:
                metrics["novel"] = int(vals["novel"] or 0)
                # the frontier job just materialized the lazy parsed
                # checkpoint in-line; counting its persisted blocks is a
                # trivial job (no recompute) and replaces the observe() the
                # eager parse barrier used to carry
                n_fetched = parsed_handle.count()
                metrics["scheduled"] = n_fetched
                metrics["cdx_rows"] = n_fetched
                # the seen delta: this generation's novel entries, read off the
                # frontier snapshot (they are exactly the generation==gen+1
                # rows), as a LAZY checkpoint — its first consumer (the next
                # generation's anti-join, or this generation's checkpoint
                # write / bloom delta) materializes the compact key list
                # in-line, after which the seen chain reads these small
                # blocks instead of re-filtering every retained full-frontier
                # snapshot per generation (measured ~2x on the 3-generation
                # loop), and the superseded frontier snapshot is freed on
                # schedule instead of being pinned by its seen part
                new_seen = (spec_delta_cur if spec_delta_cur is not None
                            else frontier
                            .where(F.col("generation") == gen + 1)
                            .select("urlkey").localCheckpoint(eager=False))
                delta_handle = new_seen
            if emitted_keys is not None:
                # resumed runs: the manifest's cdx_rows must count the
                # rows the checkpoint actually writes — AFTER the
                # emitted-keys anti-join — not the parsed-block count
                # (which overstates any generation that re-parsed
                # already-emitted URLs).  parsed is persisted by now, so
                # this is a projection + anti-join over it, resume-only.
                metrics["cdx_rows"] = cdx.count()
            seen_parts.append(new_seen)
            seen_handles.append(delta_handle)
            compact_old: list | None = None
            if len(seen_parts) >= cfg.seen_compact_parts:
                # long crawls: compact the delta chain so per-part scan/task
                # overhead stays bounded — one O(total) pass amortized over
                # seen_compact_parts generations; the superseded backing frames
                # are freed at the END of this generation (the recent-bloom
                # flush below is forced first so no recent part outlives them)
                base = _union_all(seen_parts).localCheckpoint(eager=True)
                compact_old = [h for h in seen_handles if h is not None]
                seen_parts, seen_handles = [base], [base]
            seen = _union_all(seen_parts)
            if cfg.use_bloom:
                novel = metrics["novel"]
                seen_count += novel
                if bloom is not None and novel:
                    if isinstance(bloom, ShardedCuckoo):
                        if seen_count > bloom_cap:
                            # the delta would push the filter past its design
                            # load — a bloom just degrades fpp when overfull,
                            # but a cuckoo shard HARD-FAILS once its kick loop
                            # can't place a fingerprint.  Rebuild over the
                            # full set with fresh headroom instead of folding
                            # the delta (same cadence the top-of-loop rebuild
                            # would have used one generation too late).
                            bloom_cap = max(4 * seen_count,
                                            cfg.bloom_min_keys)
                            n_shards = cfg.bloom_shards or max(
                                16, -(-bloom_cap // 16_000_000))
                            newf = build_sharded_cuckoo(
                                seen, "urlkey", n_shards, capacity=bloom_cap)
                        else:
                            # insert the delta keys into their shards
                            # (co-grouped job, like the sharded bloom's merge
                            # but an insert — a cuckoo table can't be OR-ed)
                            newf = sharded_cuckoo_insert(bloom, new_seen,
                                                         "urlkey")
                        old_bloom_df = bloom.df
                        try:
                            new_df = newf.df.localCheckpoint(eager=True)
                        except Exception as e:
                            # the global-count guard above sizes against
                            # bloom_cap, but a cuckoo shard hard-fails
                            # PER-SHARD: severe urlkey-hash skew can
                            # overflow one shard while seen_count is
                            # still under cap.  Rebuild over the full
                            # set with ESCALATED headroom — doubling
                            # beyond the current cap, so the retry is
                            # never a byte-identical (and hence
                            # deterministically-failing) repeat of a
                            # rebuild that itself just overflowed.
                            if "over capacity" not in str(e):
                                raise
                            bloom_cap = max(4 * seen_count,
                                            cfg.bloom_min_keys,
                                            2 * bloom_cap)
                            n_shards = cfg.bloom_shards or max(
                                16, -(-bloom_cap // 16_000_000))
                            newf = build_sharded_cuckoo(
                                seen, "urlkey", n_shards,
                                capacity=bloom_cap)
                            new_df = newf.df.localCheckpoint(eager=True)
                        bloom = ShardedCuckoo(
                            new_df, newf.n_shards, newf.n_buckets)
                        free_checkpoint(old_bloom_df)
                    elif use_sharded:
                        # geometry from the LIVE filter (cfg.bloom_shards is 0
                        # when the sharded mode was auto-selected)
                        delta = build_sharded_bloom(
                            new_seen, "urlkey", bloom.n_shards, capacity=1,
                            m=bloom.m, k=bloom.k)
                        merged = merge_sharded_blooms(bloom, delta)
                        old_bloom_df = bloom.df
                        bloom = ShardedBloom(
                            merged.df.localCheckpoint(eager=True),
                            merged.n_shards, merged.m, merged.k)
                        free_checkpoint(old_bloom_df)
                    else:
                        recent_parts.append(new_seen)
                        pending_novel += novel
                if (not use_sharded and bloom is not None and recent_parts
                        and (pending_novel >= cfg.bloom_rebroadcast_keys
                             or compact_old is not None)):
                    # fold pending deltas into the bitmap + re-broadcast.
                    # Forced at compaction: the recent frames read blocks that
                    # are about to be freed, so they must enter the filter
                    # first.
                    m, k = bloom_mk
                    b, _, _ = build_bloom(_union_all(recent_parts),
                                          "urlkey", m=m, k=k)
                    bloom_bits |= np.frombuffer(b, dtype=np.uint64)
                    bloom_bc.unpersist()
                    bloom_bc = sc.broadcast(bloom_bits.tobytes())
                    bloom = (bloom_bc, m, k)
                    recent_parts, pending_novel = [], 0
            # phase walls (driver clock): plan = crawl_step call (plus the
            # fetch-bloom job for big batches), job = the fused heavy job,
            # post = parsed count + seen/bloom maintenance up to here
            metrics["wall_phases"] = {
                "plan": round(_t1 - _t0, 3), "job": round(_t2 - _t1, 3),
                "post": round(time.perf_counter() - _t2, 3)}
            cdx_parts.append(cdx)
            all_metrics.append(metrics)
            if checkpoint_dir:
                # gen 0's delta also carries the seed keys so the union of
                # deltas reconstructs the full seen set on resume.  The write
                # runs in the background (at most one outstanding) and
                # overlaps the next generation's compute; everything it reads
                # (frontier ckpt, delta, parsed-backed cdx) survives this
                # generation's frees, and the compaction branch joins first.
                delta = (seen_parts[0].unionByName(new_seen) if gen == 0
                         else new_seen)
                saver.start(checkpoint_dir, gen, frontier, delta, cdx, metrics)
            # ---- free superseded checkpoint blocks (last: everything that
            # still reads them — frontier ckpt, bloom flush, save_state — has
            # materialized).  A frontier snapshot that backs a live seen part
            # (fused generations, and gen 0's seed keys) stays until the
            # compaction that absorbs it; recent_parts never outlive their
            # backing frames because the flush above is forced at compaction.
            for df in scratch:
                free_checkpoint(df)
            if (prev_frontier_handle is not frontier
                    and not any(h is prev_frontier_handle
                                for h in seen_handles)):
                # the seen delta derived from this snapshot is a LAZY
                # checkpoint; normally some job this generation already
                # materialized it (the anti-join scans the seen union), but
                # a path that skipped it — e.g. AQE collapsing an empty
                # candidate leg — would otherwise leave live lineage into
                # the blocks we are about to free
                if any(h is prev_frontier_delta for h in seen_handles):
                    if checkpoint_dir and gen == 0:
                        # gen 0's in-flight background write unions this same
                        # lazy seed-keys delta: a writer job planned against
                        # the not-yet-materialized checkpoint can still be
                        # computing from the init frontier's lineage when its
                        # blocks are unpersisted, and lost localCheckpoint
                        # blocks are unrecoverable (the crash would surface
                        # at the next saver.join).  Wait for the write first;
                        # only gen 0 pays the serialization.
                        saver.join()
                    ensure_checkpointed(prev_frontier_delta)
                free_checkpoint(prev_frontier_handle)
            if compact_old is not None:
                # the in-flight checkpoint write may still read this
                # generation's delta, which compaction is about to free
                saver.join()
                for h in compact_old:
                    if h is not frontier:
                        free_checkpoint(h)
    finally:
        # join the background writer on EVERY exit: a mid-loop failure
        # must not leak a still-running checkpoint write (an immediate
        # resume retry could race it on the same gen directory) or
        # swallow an error the writer captured.  If both the loop and
        # the writer failed, the writer's error propagates with the
        # loop's attached as __context__.  The AQE restore runs last —
        # the session outlives the loop and other queries expect the
        # original setting — and never while a write is in flight.
        try:
            saver.join()
        finally:
            if cfg.aqe_off_fused:
                spark.conf.set(aqe_key, aqe_orig)
    all_cdx = cdx_parts[0] if cdx_parts else None
    for c in cdx_parts[1:]:
        all_cdx = all_cdx.unionByName(c)
    return frontier, seen, all_cdx, all_metrics
