"""Query catalog: every operator family from SURVEY.md §2 (and the
training-data-pipeline operators) as a named (Spark impl, DuckDB oracle SQL)
pair over the driver testdata tables.

Contract (driver's __spark_entry__):
  - each Spark callable takes (spark, sf_dir) and returns a DataFrame
  - the oracle SQL runs on DuckDB over the same parquet (views pre-registered
    with the bare table names)
  - column names and aliases MATCH between the two sides
  - double aggregates are rounded on both sides so value-hashes agree
  - top-k queries carry full deterministic ORDER BY + tiebreakers

Operator coverage map (reference file:line in comments):
  scan/filter/project      -> q1, q6            (cdx_writer.py:643-670 F1/F2)
  stats counters           -> filter_stats      (cdx_writer.py:648-652 A1)
  prefix anti-join         -> prefix_exclude    (cdx_writer.py:625-633 F3)
  date normalization       -> date_normalize    (cdx_writer.py:352-376 P3)
  equi joins + topk        -> q3, q5            (frontier link-graph shape)
  window/politeness        -> politeness_topk   (north_rule per-host budget)
  running offset           -> running_offset    (cdx_writer.py:655-656 P10)
  seen-set anti join       -> seen_anti_join    (north_rule URL-seen)
  frontier merge           -> union_dedup
  CDX index lookup         -> cdx_lookup        (README.md:25-27 sort contract)
  dedup: exact/minhash/jaccard/simhash
  similarity: brute-force cosine top-k (+ LSH variant in operators/)
  text: token stats, quality, fingerprints, lang-id
  streaming shape: tumbling windows, sessionization
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

__all__ = ["QUERIES", "ORACLES", "query_names", "run_query", "oracle_sql_for"]


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _spread(df: DataFrame) -> DataFrame:
    """Round-robin repartition IFF the scan under-parallelizes the session.

    The testdata tables are single parquet files with 1-6 row groups, so
    a scan — and every narrow stage after it, including md5-per-shingle
    kernels — runs on 1-6 cores regardless of cluster size (guide §2.5
    "input skew: one huge unsplittable file... repartition immediately
    after the read").  Applied ONLY in queries whose downstream per-row
    compute dominates the byte-bounded shuffle this adds, and gated TWO
    ways so it stays data-adaptive, not core-count-tuned: it is a no-op
    at production scale, where a many-file table already yields >= cores
    splits, AND a no-op below 4 MB of input, where one task finishes
    faster than the extra exchange's fixed latency (measured: sf0.1
    quality_score 0.44s -> 0.69s with an unconditional spread)."""
    import os
    n = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= n:
        return df
    try:
        nbytes = sum(os.path.getsize(f.removeprefix("file:"))
                     for f in df.inputFiles())
    except OSError:
        nbytes = None
    if nbytes is not None and nbytes < 4 * 1024 * 1024:
        return df
    return df.repartition(n)


# --------------------------------------------------------------------------
# Relational core (TPC-H-flavored — prove pushdown/agg/join/window/sort)
# --------------------------------------------------------------------------

def q1_pricing_summary(spark, sf):
    """TPC-H Q1 shape: wide agg with map-side partials (SURVEY §2.5)."""
    li = _t(spark, sf, "lineitem")
    return (li.filter(F.col("l_shipdate") <= F.lit("1998-09-01"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
                 F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
                 F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
                 F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
                 F.round(F.avg("l_discount"), 4).alias("avg_disc"),
                 F.count("*").alias("count_order"))
            .orderBy("l_returnflag", "l_linestatus"))


ORACLE_Q1 = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)                              AS sum_qty,
       round(sum(l_extendedprice), 2)                         AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2)      AS sum_disc_price,
       round(avg(l_quantity), 4)                              AS avg_qty,
       round(avg(l_discount), 4)                              AS avg_disc,
       count(*)                                               AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-01'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q3_shipping_topk(spark, sf):
    """3-way equi join + agg + deterministic top-k."""
    c = _t(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf, "orders")
    li = _t(spark, sf, "lineitem")
    return (c.join(o, c.c_custkey == o.o_custkey)
            .join(li, o.o_orderkey == li.l_orderkey)
            .groupBy("o_orderkey")
            .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
            .orderBy(F.desc("revenue"), "o_orderkey")
            .limit(10))


ORACLE_Q3 = """
SELECT o_orderkey,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON o_orderkey = l_orderkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY o_orderkey
ORDER BY revenue DESC, o_orderkey
LIMIT 10
"""


def q5_regional_revenue(spark, sf):
    """6-way join through the star schema; broadcast-able dims."""
    r = _t(spark, sf, "region")
    n = _t(spark, sf, "nation")
    c = _t(spark, sf, "customer")
    s = _t(spark, sf, "supplier")
    o = _t(spark, sf, "orders")
    li = _t(spark, sf, "lineitem")
    return (li.join(o, li.l_orderkey == o.o_orderkey)
            .join(c, o.o_custkey == c.c_custkey)
            .join(s, li.l_suppkey == s.s_suppkey)
            .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
            .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
            .groupBy("n_name")
            .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
            .orderBy(F.desc("revenue"), "n_name"))


ORACLE_Q5 = """
SELECT n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem JOIN orders   ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
              JOIN supplier ON l_suppkey = s_suppkey
              JOIN nation   ON s_nationkey = n_nationkey
              JOIN region   ON n_regionkey = r_regionkey
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


def q6_forecast_filter(spark, sf):
    """Selective filter + single agg: pushdown showcase (F1/F2 shape)."""
    li = _t(spark, sf, "lineitem")
    return (li.filter((F.col("l_discount") >= 0.05) & (F.col("l_discount") <= 0.07)
                      & (F.col("l_quantity") < 24))
            .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"),
                 F.count("*").alias("n_rows")))


ORACLE_Q6 = """
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
       count(*) AS n_rows
FROM lineitem
WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
"""


def politeness_topk(spark, sf):
    """Per-host politeness budget (north_rule): row_number <= k per key.
    Mirrors the frontier's per-host cap; here per customer over orders."""
    o = _t(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"),
                                                "o_orderkey")
    return (o.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 2)
            .select("o_custkey", "o_orderkey",
                    F.round("o_totalprice", 2).alias("price"), "rn"))


ORACLE_POLITENESS = """
SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS price, rn
FROM (SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders)
WHERE rn <= 2
"""


def running_offset(spark, sf):
    """Running byte-offset reconstruction (P10, cdx_writer.py:655-656):
    cumulative sum over an ordered partition."""
    e = _t(spark, sf, "events")
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    return (e.select("user_id", "event_id",
                     F.round(F.coalesce(F.sum("value").over(w), F.lit(0.0)), 4)
                     .alias("offset"))
            .filter(F.col("user_id") < 50))


ORACLE_RUNNING_OFFSET = """
SELECT user_id, event_id,
       round(coalesce(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0), 4) AS offset
FROM events
WHERE user_id < 50
"""


def prefix_exclude(spark, sf):
    """F3 exclude semantics (cdx_writer.py:625-633) as a broadcast LEFT ANTI
    prefix join: drop parts whose name starts with any banned prefix."""
    p = _t(spark, sf, "part")
    prefixes = spark.createDataFrame(
        [("alm",), ("ant",), ("aqu",), ("azu",)], ["pfx"])
    return (p.join(F.broadcast(prefixes),
                   F.expr("startswith(p_name, pfx)"), "left_anti")
            .agg(F.count("*").alias("kept"),
                 F.round(F.sum("p_retailprice"), 2).alias("kept_price")))


ORACLE_PREFIX_EXCLUDE = """
WITH prefixes(pfx) AS (VALUES ('alm'), ('ant'), ('aqu'), ('azu'))
SELECT count(*) AS kept, round(sum(p_retailprice), 2) AS kept_price
FROM part
WHERE NOT EXISTS (SELECT 1 FROM prefixes WHERE starts_with(p_name, pfx))
"""


def prefix_exclude_big(spark, sf):
    """F3 at archive-banlist scale (reference clean_the_banlist.py use
    case): ~10^5 prefixes at sf0.1, far beyond any nested-loop join —
    runs the range-partitioned ordered prefix merge
    (operators/exclude.py).  Urlkeys are synthesized from lineitem; the
    ban list mixes long per-(part,order) prefixes with short per-part
    prefixes that subsume them.  The construction terminates every
    prefix with '/', which makes string-prefix semantics coincide with
    the key predicates the DuckDB oracle states arithmetically — the
    Spark side still runs the real merge-scan, so a carry/boundary bug
    changes the counts."""
    from ..operators.exclude import prefix_exclude_anti
    li = _t(spark, sf, "lineitem")
    urls = li.select(
        F.concat(F.lit("com,p"), F.col("l_partkey"), F.lit(")/x/"),
                 F.col("l_orderkey"), F.lit("/"),
                 F.col("l_linenumber")).alias("urlkey"),
        "l_returnflag", "l_extendedprice")
    long_p = (li.filter(F.col("l_orderkey") % 7 == 0)
              .select(F.concat(F.lit("com,p"), F.col("l_partkey"),
                               F.lit(")/x/"), F.col("l_orderkey"),
                               F.lit("/")).alias("prefix")))
    p = _t(spark, sf, "part")
    short_p = (p.filter(F.col("p_partkey") % 100 == 0)
               .select(F.concat(F.lit("com,p"), F.col("p_partkey"),
                                F.lit(")/x/")).alias("prefix")))
    prefixes = long_p.unionByName(short_p)
    kept = prefix_exclude_anti(urls, prefixes, key="urlkey")
    return (kept.groupBy("l_returnflag")
            .agg(F.count("*").alias("kept"),
                 F.round(F.sum("l_extendedprice"), 2).alias("kept_price"))
            .orderBy("l_returnflag"))


ORACLE_PREFIX_EXCLUDE_BIG = """
SELECT l_returnflag, count(*) AS kept,
       round(sum(l_extendedprice), 2) AS kept_price
FROM lineitem
WHERE NOT (l_orderkey % 7 = 0 OR l_partkey % 100 = 0)
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


def robots_parse(spark, sf):
    """robots.txt parsing (north_rule robots gating; frontier/robots.py):
    synthesize one deterministic robots.txt per nation-host with records
    for other agents (must be ignored), a shared crawler+* record with
    an inline comment, a blank Disallow (dropped), CRLF lines and
    case-mixed field names — then parse for agent '*'.  The oracle
    states the expected rules arithmetically from the same parameters,
    so every parser behavior (record grouping, agent matching, comment
    stripping, blank-rule dropping) is value-checked."""
    from ..frontier.robots import robots_rules
    n = _t(spark, sf, "nation")
    host = F.concat(F.lit("www."), F.lower(F.col("n_name")),
                    F.lit(".example"))
    body = F.concat(
        F.lit("# synthetic robots\r\nUser-Agent: GoogleBot\r\n"
              "Disallow: /secret\r\n\r\n"
              "User-agent: crawler\nUSER-AGENT: *\nDisallow: /n/"),
        F.col("n_nationkey").cast("string"),
        F.lit("/\nAllow: /n/pub # inline comment\nDisallow:\n\n"),
        F.when(F.col("n_nationkey") % 2 == 0,
               F.lit("User-agent: *\nDisallow: /even\n"))
        .otherwise(F.lit("")))
    docs = n.select(host.alias("host"), body.alias("body"))
    return robots_rules(docs).orderBy("host", "rule_type", "path_prefix")


ORACLE_ROBOTS_PARSE = """
WITH hosts AS (
  SELECT 'www.' || lower(n_name) || '.example' AS host, n_nationkey AS k
  FROM nation)
SELECT host, rule_type, path_prefix FROM (
  SELECT host, 'disallow' AS rule_type,
         '/n/' || CAST(k AS VARCHAR) || '/' AS path_prefix FROM hosts
  UNION ALL
  SELECT host, 'allow', '/n/pub' FROM hosts
  UNION ALL
  SELECT host, 'disallow', '/even' FROM hosts WHERE k % 2 = 0)
ORDER BY host, rule_type, path_prefix
"""


def filter_stats(spark, sf):
    """A1 stats counters (cdx_writer.py:648-652): processed / included /
    filtered in one aggregate pass."""
    e = _t(spark, sf, "events")
    included = F.col("event_type").isin("view", "click", "purchase")
    filtered = F.col("value") < 0.1
    return e.agg(
        F.count("*").alias("num_records_processed"),
        F.sum(F.when(included & ~filtered, 1).otherwise(0)).alias("num_records_included"),
        F.sum(F.when(included & filtered, 1).otherwise(0)).alias("num_records_filtered"))


ORACLE_FILTER_STATS = """
SELECT count(*) AS num_records_processed,
       CAST(sum(CASE WHEN event_type IN ('view','click','purchase') AND NOT (value < 0.1)
                THEN 1 ELSE 0 END) AS BIGINT) AS num_records_included,
       CAST(sum(CASE WHEN event_type IN ('view','click','purchase') AND value < 0.1
                THEN 1 ELSE 0 END) AS BIGINT) AS num_records_filtered
FROM events
"""


def seen_anti_join(spark, sf):
    """URL-seen set semantics (north_rule): candidates LEFT ANTI seen.
    Users active in the last day of the data not seen before it."""
    e = _t(spark, sf, "events")
    cut = "2024-03-01"
    seen = e.filter(F.col("ts") < F.lit(cut)).select("user_id").distinct()
    cand = e.filter(F.col("ts") >= F.lit(cut)).select("user_id").distinct()
    return (cand.join(seen, "user_id", "left_anti")
            .agg(F.count("*").alias("new_users"),
                 F.coalesce(F.round(F.avg("user_id"), 4), F.lit(0.0)).alias("avg_uid")))


ORACLE_SEEN_ANTI = """
SELECT count(*) AS new_users,
       coalesce(round(avg(user_id), 4), 0) AS avg_uid
FROM (SELECT DISTINCT user_id FROM events WHERE ts >= TIMESTAMP '2024-03-01') c
WHERE NOT EXISTS (SELECT 1 FROM events s
                  WHERE s.ts < TIMESTAMP '2024-03-01' AND s.user_id = c.user_id)
"""


def seen_anti_join_cuckoo(spark, sf):
    """seen_anti_join routed through the 10^10-path ShardedCuckoo
    sidecar (distributed build + co-grouped prefilter + exact resolve,
    frontier/seen.py).  The filter is a PURE pre-filter — a miss skips
    the join, a hit is resolved exactly — so the oracle is byte-for-byte
    seen_anti_join's: any divergence is a filter false-negative bug."""
    from ..frontier.seen import anti_join_seen, build_sharded_cuckoo
    e = _t(spark, sf, "events")
    cut = "2024-03-01"
    seen = e.filter(F.col("ts") < F.lit(cut)).select("user_id").distinct()
    cand = e.filter(F.col("ts") >= F.lit(cut)).select("user_id").distinct()
    filt = build_sharded_cuckoo(seen, "user_id", n_shards=16,
                                capacity=8_000_000)
    novel = anti_join_seen(cand, seen, "user_id", bloom=filt,
                           materialize=False)
    return (novel.agg(
        F.count("*").alias("new_users"),
        F.coalesce(F.round(F.avg("user_id"), 4), F.lit(0.0)).alias("avg_uid")))


def union_dedup(spark, sf):
    """Frontier merge (seed ∪ discovered) + dedup (SURVEY §2.8)."""
    e = _t(spark, sf, "events")
    a = e.filter(F.col("event_type") == "signup").select("user_id")
    b = e.filter(F.col("event_type") == "purchase").select("user_id")
    return (a.unionByName(b).distinct()
            .agg(F.count("*").alias("n_users"),
                 F.sum("user_id").alias("sum_uid")))


ORACLE_UNION_DEDUP = """
SELECT count(*) AS n_users, CAST(sum(user_id) AS BIGINT) AS sum_uid
FROM (SELECT user_id FROM events WHERE event_type = 'signup'
      UNION
      SELECT user_id FROM events WHERE event_type = 'purchase')
"""


def date_normalize(spark, sf):
    """P3 date normalization (cdx_writer.py:352-376) applied to digit-date
    strings of length 12/14/16 synthesized from order dates."""
    o = _t(spark, sf, "orders")
    base = F.date_format("o_orderdate", "yyyyMMddHHmmss")
    raw = (F.when(F.col("o_orderkey") % 3 == 0, F.substring(base, 1, 12))
           .when(F.col("o_orderkey") % 3 == 1, base)
           .otherwise(F.concat(base, F.lit("49"))))
    normalized = (F.when(F.length(raw) == 14, raw)
                  .when(F.length(raw) == 16, F.substring(raw, 1, 14))
                  .when(F.length(raw) == 12, F.concat(raw, F.lit("00"))))
    return (o.select("o_orderkey", raw.alias("date_raw"),
                     normalized.alias("cdx_date"))
            .filter(F.col("o_orderkey") < 3000))


ORACLE_DATE_NORMALIZE = """
WITH raws AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 3 = 0 THEN substr(strftime(o_orderdate, '%Y%m%d%H%M%S'), 1, 12)
              WHEN o_orderkey % 3 = 1 THEN strftime(o_orderdate, '%Y%m%d%H%M%S')
              ELSE strftime(o_orderdate, '%Y%m%d%H%M%S') || '49' END AS date_raw
  FROM orders WHERE o_orderkey < 3000)
SELECT o_orderkey, date_raw,
       CASE WHEN length(date_raw) = 14 THEN date_raw
            WHEN length(date_raw) = 16 THEN substr(date_raw, 1, 14)
            WHEN length(date_raw) = 12 THEN date_raw || '00' END AS cdx_date
FROM raws
"""


def banlist_prefix_dedup(spark, sf):
    """A2 (reference tests/clean_the_banlist.py:138-146): drop every url
    that has a shorter url in the set as a prefix.  Input: synthetic
    banlist from documents — every 10th doc also contributes its bare
    host+path prefix, which subsumes the longer per-doc urls."""
    from ..operators.banlist import prefix_free
    d = _t(spark, sf, "documents")
    long_urls = d.select(
        F.concat(F.lit("http://www."), F.col("source"),
                 F.lit(".com/docs/"), F.col("doc_id").cast("string"))
        .alias("url"))
    short_urls = (d.filter(F.col("doc_id") % 10 == 0)
                  .select(F.concat(F.lit("http://www."), F.col("source"),
                                   F.lit(".com/docs/")).alias("url")))
    urls = long_urls.unionByName(short_urls)
    return prefix_free(urls).orderBy("url")


ORACLE_BANLIST = """
WITH urls AS (
  SELECT DISTINCT url FROM (
    SELECT 'http://www.' || source || '.com/docs/' || doc_id AS url
    FROM documents
    UNION ALL
    SELECT 'http://www.' || source || '.com/docs/' AS url
    FROM documents WHERE doc_id % 10 = 0))
SELECT url FROM urls u
WHERE NOT EXISTS (SELECT 1 FROM urls p
                  WHERE p.url <> u.url AND starts_with(u.url, p.url))
ORDER BY url
"""


# --------------------------------------------------------------------------
# Dedup family (documents)
# --------------------------------------------------------------------------

def dedup_exact(spark, sf):
    """Exact dedup: hash-groupBy on content digest, keep min doc_id
    (map-side combine; at 100 TB this is one shuffle on the digest)."""
    d = _t(spark, sf, "documents")
    return (d.groupBy(F.md5(F.col("text")).alias("content_hash"))
            .agg(F.min("doc_id").alias("keep_doc_id"),
                 F.count("*").alias("dup_count"))
            .agg(F.count("*").alias("distinct_docs"),
                 F.sum(F.col("dup_count") - 1).alias("exact_dups"),
                 F.sum("keep_doc_id").alias("sum_keep_ids")))


ORACLE_DEDUP_EXACT = """
SELECT count(*) AS distinct_docs,
       CAST(sum(dup_count - 1) AS BIGINT) AS exact_dups,
       CAST(sum(keep_doc_id) AS BIGINT) AS sum_keep_ids
FROM (SELECT md5(text) AS content_hash, min(doc_id) AS keep_doc_id,
             count(*) AS dup_count
      FROM documents GROUP BY md5(text))
"""


def dedup_minhash_lsh(spark, sf):
    """MinHash + LSH banding, oracle-checkable: hash_i(token) = md5(i||':'||
    token) (identical function on both engines), signature = min per seed,
    band = md5 of 2 concatenated minhashes, candidates = pairs sharing a
    band bucket.  At scale the band join is the only shuffle and is
    hash-partitioned by bucket.

    Plan shape (optimization guide §2.3/§2.4 — aggregate before you
    shuffle / remove shuffles outright): the shingles explode ONCE and
    all 8 per-seed minhashes ride a single ``groupBy(doc_id)`` as 8
    ``min`` aggregates (map-side partials, whole-stage codegen) instead
    of a broadcast crossJoin that multiplied the exploded rows 8x and
    re-aggregated them through two hash-aggregate exchanges; the band
    buckets are then a plain projection (md5 of the sorted minhash pair)
    rather than a second ``collect_list`` aggregation.  The md5 count is
    unchanged (the oracle fixes it); the band-bucket self-join stays the
    plan's only data-sized exchange.  Equivalence: min per seed over the
    same distinct-shingle set, same band assembly; pinned by the
    unchanged DuckDB oracle at sf0.01 (pytest) and sf0.1
    (scripts/oracle_check.py)."""
    d = (_spread(_t(spark, sf, "documents").select("doc_id", "text"))
         .select("doc_id", F.expr("filter(split(text,' '), t -> t <> '')")
                 .alias("toks")))
    shingles = F.expr(
        "array_distinct(transform(sequence(0, size(toks) - 3),"
        " i -> concat_ws(' ', slice(toks, i + 1, 3))))")
    tok = d.select("doc_id", F.explode(shingles).alias("token"))
    sig = tok.groupBy("doc_id").agg(*[
        F.min(F.md5(F.concat_ws(":", F.lit(str(s)), F.col("token"))))
        .alias(f"mh{s}") for s in range(8)])
    bucket = [F.md5(F.concat_ws("|", F.sort_array(F.array(
                  F.col(f"mh{2 * band}"), F.col(f"mh{2 * band + 1}")))))
              .alias(f"b{band}") for band in range(4)]
    bands = (sig.select("doc_id", *bucket)
             .select("doc_id", F.explode(F.array(*[
                 F.struct(F.lit(band).cast("int").alias("band"),
                          F.col(f"b{band}").alias("bucket"))
                 for band in range(4)])).alias("bb"))
             .select("doc_id", "bb.band", "bb.bucket"))
    a = bands.alias("a")
    b = bands.alias("b")
    pairs = (a.join(b, (F.col("a.band") == F.col("b.band"))
                    & (F.col("a.bucket") == F.col("b.bucket"))
                    & (F.col("a.doc_id") < F.col("b.doc_id")))
             .select(F.col("a.doc_id").alias("doc_a"),
                     F.col("b.doc_id").alias("doc_b")).distinct())
    return pairs.agg(F.count("*").alias("candidate_pairs"),
                     F.coalesce(F.sum(F.col("doc_a") + F.col("doc_b")), F.lit(0))
                     .alias("pair_id_sum"))


ORACLE_MINHASH = """
WITH t AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents),
tok AS (
  SELECT DISTINCT doc_id,
         toks[i + 1] || ' ' || toks[i + 2] || ' ' || toks[i + 3] AS token
  FROM t, (SELECT unnest(range(0, 10000)) AS i)
  WHERE i <= len(toks) - 3),
sig AS (
  SELECT doc_id, seed, min(md5(seed || ':' || token)) AS minhash
  FROM tok CROSS JOIN (SELECT unnest([0,1,2,3,4,5,6,7]) AS seed)
  GROUP BY doc_id, seed),
bands AS (
  SELECT doc_id, CAST(floor(seed / 2) AS INT) AS band,
         md5(string_agg(minhash, '|' ORDER BY minhash)) AS bucket
  FROM sig GROUP BY doc_id, CAST(floor(seed / 2) AS INT)),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id)
SELECT count(*) AS candidate_pairs,
       CAST(coalesce(sum(doc_a + doc_b), 0) AS BIGINT) AS pair_id_sum
FROM pairs
"""


def dedup_simhash16(spark, sf):
    """SimHash, value-checked: a 16-bit md5-based variant (md5 is
    identical on both engines; production uses 64-bit xxhash64, which
    DuckDB lacks — dedup_simhash_pairs stays the rows-only check for
    that).  Same one-pass shape as operators/dedup.simhash: ONE
    groupBy(doc) carrying all 16 bit-vote conditional sums."""
    d = (_t(spark, sf, "documents").filter(F.col("doc_id") < 80)
         .select("doc_id", F.expr(
             "array_distinct(filter(split(text, ' '), t -> t <> ''))")
             .alias("toks")))
    tok = d.select("doc_id", F.explode("toks").alias("tok")) \
           .withColumn("h", F.md5("tok"))

    def bit(i):
        ch = f"substring(h, {1 + i // 4}, 1)"
        v = f"(position({ch}, '0123456789abcdef') - 1)"
        return f"((shiftright({v}, {3 - i % 4}) & 1) = 1)"

    votes = [F.sum(F.when(F.expr(bit(i)), 1).otherwise(-1)).alias(f"v{i}")
             for i in range(16)]
    assemble = F.expr(" + ".join(
        f"(CASE WHEN v{i} > 0 THEN {1 << i} ELSE 0 END)" for i in range(16)))
    return (tok.groupBy("doc_id").agg(*votes)
            .select("doc_id", assemble.cast("long").alias("simhash16"))
            .orderBy("doc_id"))


ORACLE_SIMHASH16 = """
WITH tok AS (
  SELECT DISTINCT doc_id, tok
  FROM (SELECT doc_id,
               unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS tok
        FROM documents WHERE doc_id < 80)),
h AS (SELECT doc_id, md5(tok) AS h FROM tok),
bits AS (
  SELECT doc_id, i,
         ((position(substr(h, 1 + i // 4, 1) IN '0123456789abcdef') - 1)
          >> (3 - i % 4)) & 1 AS bit
  FROM h CROSS JOIN (SELECT unnest(range(0, 16)) AS i)),
votes AS (
  SELECT doc_id, i, sum(CASE WHEN bit = 1 THEN 1 ELSE -1 END) AS v
  FROM bits GROUP BY doc_id, i)
SELECT doc_id,
       CAST(sum(CASE WHEN v > 0 THEN 1 << i ELSE 0 END) AS BIGINT) AS simhash16
FROM votes GROUP BY doc_id ORDER BY doc_id
"""


def dedup_ngram_jaccard(spark, sf):
    """n-gram (3-word shingle) Jaccard near-dup pairs over exploded shingles:
    |A∩B| via equi-join counts, |A∪B| = |A|+|B|-|A∩B|.  Blocked by lang to
    bound the pair space (the scale path adds minhash pre-filtering).

    The input unions deterministic planted near-duplicates (doc_id+100000,
    text + ' planted variant') so the check is non-vacuous: every base doc
    pairs with its variant at jaccard = S/(S+2) >= 0.5, and both engines
    must agree on exactly which organic pairs clear the bar too."""
    base = (_t(spark, sf, "documents").filter(F.col("doc_id") < 60)
            .select("doc_id", "lang", "text"))
    variants = base.select(
        (F.col("doc_id") + 100000).alias("doc_id"), F.col("lang"),
        F.concat(F.col("text"), F.lit(" planted variant")).alias("text"))
    d = base.unionByName(variants)
    tok = d.select("doc_id", "lang", F.split("text", " ").alias("toks"))
    sh = (tok.select("doc_id", "lang",
                     F.explode(F.expr(
                         "transform(sequence(0, size(toks) - 3), "
                         "i -> concat_ws(' ', slice(toks, i + 1, 3)))")).alias("shingle"))
          .distinct())
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
                    & (F.col("a.lang") == F.col("b.lang"))
                    & (F.col("a.doc_id") < F.col("b.doc_id")))
             .groupBy(F.col("a.doc_id").alias("doc_a"),
                      F.col("b.doc_id").alias("doc_b"))
             .agg(F.count("*").alias("inter")))
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = (inter.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
           .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
           .select("doc_a", "doc_b",
                   F.round(F.col("inter") /
                           (F.col("sa.n_shingles") + F.col("sb.n_shingles")
                            - F.col("inter")), 4).alias("jaccard")))
    return jac.filter(F.col("jaccard") >= 0.5).orderBy("doc_a", "doc_b")


ORACLE_JACCARD = """
WITH d AS (
  SELECT doc_id, lang, text FROM documents WHERE doc_id < 60
  UNION ALL
  SELECT doc_id + 100000, lang, text || ' planted variant'
  FROM documents WHERE doc_id < 60),
sh AS (
  SELECT DISTINCT doc_id, lang, shingle
  FROM (SELECT doc_id, lang,
               concat_ws(' ', toks[i + 1], toks[i + 2], toks[i + 3]) AS shingle
        FROM (SELECT doc_id, lang, string_split(text, ' ') AS toks FROM d),
             (SELECT unnest(range(0, 10000)) AS i)
        WHERE i <= len(toks) - 3)),
sizes AS (SELECT doc_id, count(*) AS n_shingles FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.lang = b.lang
                      AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id)
SELECT doc_a, doc_b,
       round(inter / (sa.n_shingles + sb.n_shingles - inter), 4) AS jaccard
FROM inter JOIN sizes sa ON doc_a = sa.doc_id
           JOIN sizes sb ON doc_b = sb.doc_id
WHERE round(inter / (sa.n_shingles + sb.n_shingles - inter), 4) >= 0.5
ORDER BY doc_a, doc_b
"""


# --------------------------------------------------------------------------
# Similarity search (embeddings)
# --------------------------------------------------------------------------

def cosine_topk(spark, sf):
    """Brute-force cosine top-k ANN baseline: 3 query vectors vs all.
    Dot products via zip_with/aggregate (JVM higher-order fns, no UDF)."""
    emb0 = _t(spark, sf, "embeddings")
    emb = _spread(emb0.select("vec_id", "embedding"))
    queries = emb0.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec"))
    dot = F.expr("aggregate(zip_with(embedding, qvec, (x, y) -> x * y), "
                 "cast(0.0 as double), (acc, v) -> acc + v)")
    norm = ("sqrt(aggregate(%s, cast(0.0 as double), (acc, v) -> acc + v * v))")
    sim = dot / (F.expr(norm % "embedding") * F.expr(norm % "qvec"))
    scored = (emb.crossJoin(F.broadcast(queries))
              .filter(F.col("vec_id") != F.col("query_id"))
              .select("query_id", "vec_id", F.round(sim, 4).alias("cosine")))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "vec_id")
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 5)
            .select("query_id", "vec_id", "cosine", "rank"))


ORACLE_COSINE_TOPK = """
WITH q AS (SELECT vec_id AS query_id, embedding AS qvec
           FROM embeddings WHERE vec_id < 3),
scored AS (
  SELECT query_id, vec_id,
         round(list_dot_product(embedding, qvec) /
               (sqrt(list_dot_product(embedding, embedding)) *
                sqrt(list_dot_product(qvec, qvec))), 4) AS cosine
  FROM embeddings CROSS JOIN q
  WHERE vec_id <> query_id)
SELECT query_id, vec_id, cosine, rank FROM (
  SELECT query_id, vec_id, cosine,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, vec_id) AS rank
  FROM scored)
WHERE rank <= 5
"""


def embedding_label_stats(spark, sf):
    """Per-label embedding aggregates via higher-order fns (centroid-norm
    proxy; elementwise centroid lives in operators/similarity.py)."""
    emb = _t(spark, sf, "embeddings")
    lsum = F.expr("aggregate(embedding, cast(0.0 as double), (a, x) -> a + x)")
    return (emb.groupBy("label")
            .agg(F.count("*").alias("n_vecs"),
                 F.round(F.avg(lsum), 4).alias("avg_component_sum"))
            .orderBy("label"))


ORACLE_EMB_STATS = """
SELECT label, count(*) AS n_vecs,
       round(avg(list_sum(embedding)), 4) AS avg_component_sum
FROM embeddings GROUP BY label ORDER BY label
"""


# --------------------------------------------------------------------------
# Text analysis (documents)
# --------------------------------------------------------------------------

def token_stats(spark, sf):
    """Token counting per language: whitespace tokenization."""
    d = _t(spark, sf, "documents")
    ntok = F.size(F.filter(F.split("text", " "), lambda t: t != ""))
    return (d.groupBy("lang")
            .agg(F.count("*").alias("docs"),
                 F.sum(ntok).alias("total_tokens"),
                 F.round(F.avg(ntok), 4).alias("avg_tokens"),
                 F.round(F.avg("n_chars"), 4).alias("avg_chars"))
            .orderBy("lang"))


ORACLE_TOKEN_STATS = """
SELECT lang, count(*) AS docs,
       CAST(sum(len(list_filter(string_split(text, ' '), t -> t <> ''))) AS BIGINT) AS total_tokens,
       round(avg(len(list_filter(string_split(text, ' '), t -> t <> ''))), 4) AS avg_tokens,
       round(avg(n_chars), 4) AS avg_chars
FROM documents GROUP BY lang ORDER BY lang
"""


def quality_score(spark, sf):
    """Quality scoring: length, mean token length, stopword ratio — computed
    with replace-count arithmetic (engine-portable, no regex divergence).

    The tokenization is staged into its own projection so the
    split+filter runs ONCE per row (CollapseProject keeps a non-cheap
    expression referenced 4x in a separate project) instead of being
    re-inlined into every consumer expression (guide §1.2 per-task
    work); all downstream arithmetic is unchanged."""
    d = _spread(_t(spark, sf, "documents").select("doc_id", "text")).select(
        "doc_id", F.filter(F.split("text", " "),
                           lambda t: t != "").alias("_toks"))
    toks = F.col("_toks")
    ntok = F.size(toks)
    stop_hits = (F.size(F.filter(toks, lambda t: t == F.lit("the")))
                 + F.size(F.filter(toks, lambda t: t == F.lit("a"))))
    mean_len = F.aggregate(toks, F.lit(0.0),
                           lambda acc, t: acc + F.length(t))
    out = d.select(
        "doc_id",
        ntok.alias("n_tokens"),
        F.round(mean_len / ntok, 4).alias("mean_token_len"),
        F.round(stop_hits / ntok, 4).alias("stopword_ratio"))
    return (out.withColumn(
        "quality_ok",
        (F.col("n_tokens") >= 20) & (F.col("mean_token_len") >= 3.0))
        .orderBy("doc_id"))


ORACLE_QUALITY = """
WITH t AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
  FROM documents)
SELECT doc_id, len(toks) AS n_tokens,
       round(list_sum(list_transform(toks, x -> length(x)))::DOUBLE / len(toks), 4) AS mean_token_len,
       round((len(list_filter(toks, x -> x = 'the')) +
              len(list_filter(toks, x -> x = 'a')))::DOUBLE / len(toks), 4) AS stopword_ratio,
       (len(toks) >= 20 AND
        list_sum(list_transform(toks, x -> length(x)))::DOUBLE / len(toks) >= 3.0) AS quality_ok
FROM t ORDER BY doc_id
"""


def doc_fingerprint(spark, sf):
    """Document fingerprinting: min-hash of word 3-shingles per doc (a
    winnowing-style representative fingerprint)."""
    d = (_spread(_t(spark, sf, "documents").select("doc_id", "text"))
         .select("doc_id", F.expr("filter(split(text,' '), t -> t <> '')")
                 .alias("toks")))
    sh = F.expr("transform(sequence(0, size(toks) - 3),"
                " i -> md5(concat_ws(' ', slice(toks, i + 1, 3))))")
    # n_shingles == size(toks) - 2 by construction (the transform runs
    # over sequence(0, size-3), no dedup), so the md5-shingle array is
    # evaluated ONCE (for the min) instead of a second full evaluation
    # just to take its length (guide §1.2 per-task work; the oracle
    # itself states len(toks) - 2)
    return (d.select("doc_id",
                     F.array_min(sh).alias("fingerprint"),
                     (F.size("toks") - 2).alias("n_shingles"))
            .orderBy("doc_id"))


ORACLE_FINGERPRINT = """
WITH t AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
           FROM documents)
SELECT doc_id,
       list_min(list_transform(range(0, len(toks) - 2),
                i -> md5(toks[i + 1] || ' ' || toks[i + 2] || ' ' || toks[i + 3]))) AS fingerprint,
       len(toks) - 2 AS n_shingles
FROM t ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# Streaming shapes (events)
# --------------------------------------------------------------------------

def tumbling_window(spark, sf):
    """Tumbling 1-hour windows per event type (batch form of the
    streaming/ operator)."""
    e = _t(spark, sf, "events")
    return (e.groupBy(F.date_format(F.date_trunc("hour", "ts"),
                                    "yyyy-MM-dd HH:mm:ss").alias("hour"),
                      "event_type")
            .agg(F.count("*").alias("n_events"),
                 F.round(F.sum("value"), 4).alias("sum_value"))
            .orderBy("hour", "event_type"))


ORACLE_TUMBLING = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
       event_type, count(*) AS n_events, round(sum(value), 4) AS sum_value
FROM events GROUP BY 1, 2 ORDER BY hour, event_type
"""


def sessionize(spark, sf):
    """Gap-based sessionization (stateful-stream shape): new session when
    gap > 30 min; count sessions and mean session length per user."""
    e = _t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    marked = e.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > 1800), 1).otherwise(0))
    sessions = marked.withColumn(
        "session_id", F.sum("new_session").over(
            Window.partitionBy("user_id").orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, 0)))
    return (sessions.groupBy("user_id", "session_id")
            .agg(F.count("*").alias("n_events"))
            .groupBy("user_id")
            .agg(F.count("*").alias("n_sessions"),
                 F.round(F.avg("n_events"), 4).alias("avg_session_events"))
            .filter(F.col("user_id") < 100)
            .orderBy("user_id"))


ORACLE_SESSIONIZE = """
WITH marked AS (
  SELECT user_id, event_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
sessions AS (
  SELECT user_id,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM marked),
per_session AS (
  SELECT user_id, session_id, count(*) AS n_events
  FROM sessions GROUP BY user_id, session_id)
SELECT user_id, count(*) AS n_sessions,
       round(avg(n_events), 4) AS avg_session_events
FROM per_session
WHERE user_id < 100
GROUP BY user_id ORDER BY user_id
"""


def cdx_lookup(spark, sf):
    """Wayback-style CDX lookup — the CONSUMER side of the index artifact
    the reference produces (the README.md:25-27 sort contract exists
    exactly so these prefix lookups are range scans).  Each query is a
    urlkey prefix + target timestamp; matches are the prefix range; the
    result is the 3 temporally closest captures per query.

    Scale shape (10^10-row CDX): the tiny query list broadcasts and
    joins on its EQUI component — the SURT host segment — so the big
    side distributes as an ordinary hash join (never a nested-loop over
    the index); the sub-host prefix is a residual in-task filter; and on
    the deployed sorted/bucketed CDX layout (plans/layout.py,
    operators/cdx.py sort order) the [prefix, prefix+inf) range prunes
    parquet row groups via min/max stats.  Temporal distance is the
    14-digit-timestamp numeric distance (deterministic, identical
    arithmetic on both engines); full ORDER BY tiebreaks
    (urlkey, cdx_ts, event_id) make the top-3 unique."""
    e = _t(spark, sf, "events")
    cdx = e.select(
        F.concat(F.lit("com,site"), (F.col("user_id") % 40).cast("string"),
                 F.lit(")/page/"),
                 (F.col("event_id") % 997).cast("string")).alias("urlkey"),
        F.date_format("ts", "yyyyMMddHHmmss").alias("cdx_ts"),
        "event_id")
    qs = (e.filter(F.col("event_id") < 8)
          .select(F.col("event_id").alias("query_id"),
                  F.concat(F.lit("com,site"),
                           ((F.col("event_id") * 5) % 40).cast("string"),
                           F.lit(")/")).alias("prefix"),
                  F.date_format("ts", "yyyyMMddHHmmss").alias("target_ts")))
    host = F.substring_index(F.col("urlkey"), ")", 1)
    # the prefix's host segment, derived the same way as the CDX side's
    # (everything before the first ')') so sub-host prefixes like
    # 'com,site5)/page/' still join on their host instead of silently
    # matching nothing
    q_host = F.substring_index(F.col("prefix"), ")", 1)
    m = (cdx.withColumn("surt_host", host)
         .join(F.broadcast(qs.withColumn("surt_host", q_host)), "surt_host")
         .filter(F.col("urlkey").startswith(F.col("prefix"))))
    dist = F.abs(F.col("cdx_ts").cast("long") -
                 F.col("target_ts").cast("long"))
    w = (Window.partitionBy("query_id")
         .orderBy(dist.asc(), F.col("urlkey").asc(), F.col("cdx_ts").asc(),
                  F.col("event_id").asc()))
    return (m.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= 3)
            .select("query_id", "prefix", "urlkey", "cdx_ts", "rnk"))


ORACLE_CDX_LOOKUP = """
WITH cdx AS (
  SELECT 'com,site' || CAST(user_id % 40 AS VARCHAR) || ')/page/'
             || CAST(event_id % 997 AS VARCHAR) AS urlkey,
         strftime(ts, '%Y%m%d%H%M%S') AS cdx_ts,
         event_id
  FROM events),
q AS (
  SELECT event_id AS query_id,
         'com,site' || CAST((event_id * 5) % 40 AS VARCHAR) || ')/' AS prefix,
         strftime(ts, '%Y%m%d%H%M%S') AS target_ts
  FROM events WHERE event_id < 8),
m AS (
  SELECT q.query_id, q.prefix, c.urlkey, c.cdx_ts,
         row_number() OVER (
           PARTITION BY q.query_id
           ORDER BY abs(CAST(c.cdx_ts AS BIGINT) - CAST(q.target_ts AS BIGINT)),
                    c.urlkey, c.cdx_ts, c.event_id) AS rnk
  FROM cdx c
  JOIN q ON c.urlkey LIKE q.prefix || '%')
SELECT query_id, prefix, urlkey, cdx_ts, rnk FROM m WHERE rnk <= 3
"""


# --------------------------------------------------------------------------
# registry
# --------------------------------------------------------------------------

QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "q3_shipping_topk": q3_shipping_topk,
    "q5_regional_revenue": q5_regional_revenue,
    "q6_forecast_filter": q6_forecast_filter,
    "politeness_topk": politeness_topk,
    "running_offset": running_offset,
    "prefix_exclude": prefix_exclude,
    "prefix_exclude_big": prefix_exclude_big,
    "robots_parse": robots_parse,
    "filter_stats": filter_stats,
    "seen_anti_join": seen_anti_join,
    "seen_anti_join_cuckoo": seen_anti_join_cuckoo,
    "union_dedup": union_dedup,
    "date_normalize": date_normalize,
    "cdx_lookup": cdx_lookup,
    "banlist_prefix_dedup": banlist_prefix_dedup,
    "dedup_exact": dedup_exact,
    "dedup_minhash_lsh": dedup_minhash_lsh,
    "dedup_simhash16": dedup_simhash16,
    "dedup_ngram_jaccard": dedup_ngram_jaccard,
    "cosine_topk": cosine_topk,
    "embedding_label_stats": embedding_label_stats,
    "token_stats": token_stats,
    "quality_score": quality_score,
    "doc_fingerprint": doc_fingerprint,
    "tumbling_window": tumbling_window,
    "sessionize": sessionize,
}

ORACLES = {
    "q1_pricing_summary": ORACLE_Q1,
    "q3_shipping_topk": ORACLE_Q3,
    "q5_regional_revenue": ORACLE_Q5,
    "q6_forecast_filter": ORACLE_Q6,
    "politeness_topk": ORACLE_POLITENESS,
    "running_offset": ORACLE_RUNNING_OFFSET,
    "prefix_exclude": ORACLE_PREFIX_EXCLUDE,
    "prefix_exclude_big": ORACLE_PREFIX_EXCLUDE_BIG,
    "robots_parse": ORACLE_ROBOTS_PARSE,
    "filter_stats": ORACLE_FILTER_STATS,
    "seen_anti_join": ORACLE_SEEN_ANTI,
    "seen_anti_join_cuckoo": ORACLE_SEEN_ANTI,
    "union_dedup": ORACLE_UNION_DEDUP,
    "date_normalize": ORACLE_DATE_NORMALIZE,
    "cdx_lookup": ORACLE_CDX_LOOKUP,
    "banlist_prefix_dedup": ORACLE_BANLIST,
    "dedup_exact": ORACLE_DEDUP_EXACT,
    "dedup_minhash_lsh": ORACLE_MINHASH,
    "dedup_simhash16": ORACLE_SIMHASH16,
    "dedup_ngram_jaccard": ORACLE_JACCARD,
    "cosine_topk": ORACLE_COSINE_TOPK,
    "embedding_label_stats": ORACLE_EMB_STATS,
    "token_stats": ORACLE_TOKEN_STATS,
    "quality_score": ORACLE_QUALITY,
    "doc_fingerprint": ORACLE_FINGERPRINT,
    "tumbling_window": ORACLE_TUMBLING,
    "sessionize": ORACLE_SESSIONIZE,
}


def query_names():
    return list(QUERIES)


def run_query(spark, sf_dir, name):
    return QUERIES[name](spark, sf_dir)


def oracle_sql_for(name):
    return ORACLES.get(name)
