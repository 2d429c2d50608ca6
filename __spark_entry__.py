"""Driver contract for the spark-graft builder (PySpark target).

``entry``      — flagship crawl-index pipeline on sf0.001.
``queries``    — every implemented operator from SURVEY.md §2 + the
                 training-data operators, one callable per name.
``oracle_sql`` — DuckDB-equivalent SQL for each SQL-expressible query;
                 crawl-kernel queries (SURT canonicalization, frontier
                 generations) are rows-only checked (omitted here) since
                 their kernels are not expressible in ANSI SQL.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from cdx_writer_spark.plans import catalog


def _doc_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> synthetic well-formed page URLs (deterministic)."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    url = F.concat(F.lit("http://www."), F.col("source"),
                   F.lit(".example.com/Docs/"), F.col("doc_id").cast("string"),
                   F.lit("?b=2&a=1"))
    return d.withColumn("url", url)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: index-and-schedule pipeline over sf0.001 documents —
    SURT urlkeys (Arrow UDF), content digests, quality filter, exact dedup,
    per-host politeness budget, priority-ordered schedule."""
    from cdx_writer_spark.functions.udfs import surt_key, url_host
    sf_dir = "/root/testdata/sf0.001"
    pages = _doc_pages(spark, sf_dir)
    toks = F.filter(F.split("text", " "), lambda t: t != "")
    scored = (pages
              .withColumn("urlkey", surt_key("url"))
              .withColumn("host", url_host("url"))
              .withColumn("content_hash", F.md5("text"))
              .withColumn("n_tokens", F.size(toks))
              .filter(F.col("n_tokens") >= 5))
    deduped = (scored.groupBy("content_hash")
               .agg(F.min("doc_id").alias("doc_id"),
                    F.min("urlkey").alias("urlkey"),
                    F.min("host").alias("host"),
                    F.max("n_tokens").alias("n_tokens")))
    w = Window.partitionBy("host").orderBy(F.desc("n_tokens"), "urlkey")
    return (deduped.withColumn("rank_in_host", F.row_number().over(w))
            .filter(F.col("rank_in_host") <= 50)
            .select("urlkey", "host", "doc_id", "n_tokens", "rank_in_host")
            .orderBy(F.desc("n_tokens"), "urlkey"))


# ---------------------------------------------------------------------------
# crawl-kernel queries (rows-only checks: kernels not expressible in SQL,
# except crawl_surt_urlkey whose oracle reconstructs the expected SURT for
# well-formed URLs with pure string ops)
# ---------------------------------------------------------------------------

def crawl_surt_urlkey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the real SURT kernel (Arrow UDF) over synthetic well-formed URLs.
    Oracle: the expected SURT string rebuilt with SQL string functions."""
    from cdx_writer_spark.functions.udfs import surt_key
    return (_doc_pages(spark, sf_dir)
            .select("doc_id", surt_key("url").alias("urlkey"))
            .orderBy("doc_id"))


ORACLE_SURT_URLKEY = """
SELECT doc_id,
       array_to_string(list_reverse(string_split(source || '.example.com', '.')), ',')
       || ')/docs/' || doc_id || '?a=1&b=2' AS urlkey
FROM documents ORDER BY doc_id
"""


def crawl_frontier_cdx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three crawl generations over a deterministic synthetic web (Zipf
    hosts, robots, politeness, bloom-backed seen set) -> emitted CDX rows.
    Rows-only check here (frontier semantics are not ANSI-SQL-
    expressible); VALUE-checked in tests/test_crawl_simulator.py, which
    pins the exact CDX rows, seen set and final frontier of this same
    configuration against an independent single-process simulator."""
    from cdx_writer_spark.frontier.crawl import CrawlConfig, run_crawl
    from cdx_writer_spark.sources.synth import (synth_pages, synth_robots,
                                                synth_seeds)
    n = 2000
    pages = synth_pages(spark, n)
    seeds = synth_seeds(spark, 20, n)
    robots = synth_robots(spark)
    cfg = CrawlConfig(per_host_budget=2, global_batch=200)
    _f, _seen, cdx, _m = run_crawl(spark, pages, seeds, robots, cfg, 3)
    return cdx.orderBy("urlkey", "generation")


def crawl_cdx_fixture_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full WARC->CDX pipeline over the reference's own fixture corpus
    (byte-level parity is separately asserted by tests/test_cdx_goldens.py).
    Rows-only check."""
    from cdx_writer_spark.operators.cdx import cdx_fields, cdx_lines
    from cdx_writer_spark.sources.warc import read_warc_records
    recs = read_warc_records(spark, ["/root/reference/tests/uncompressed.arc",
                                     "/root/reference/tests/uncompressed.warc",
                                     "/root/reference/tests/wget_ia.warc.gz"])
    return cdx_lines(cdx_fields(recs, all_records=True), sort=True)


def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup candidate pairs through the REAL banded operator
    (operators/dedup.simhash: bit-vote signatures -> chunk explode ->
    band self-join -> Hamming), value-checked: the token hash is
    injected as a 32-bit md5-derived value (md5 is identical on both
    engines; conv(hex,16,10) == DuckDB's hex-char fold), 4 × 8-bit
    Hamming bands.  The production 64-bit xxhash64 signature path is
    value-pinned against an independent pure-Python XXH64 in
    tests/test_operators.py (DuckDB lacks xxhash64)."""
    from cdx_writer_spark.operators.dedup import simhash
    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .filter(F.col("doc_id") < 200))
    md5_32 = (lambda c: F.conv(F.substring(F.md5(c), 1, 8), 16, 10)
              .cast("long"))
    return (simhash(docs, n_bits=32, hamming_band_bits=8, hash_col=md5_32)
            .orderBy("doc_a", "doc_b"))


ORACLE_SIMHASH_PAIRS = """
WITH tok AS (
  SELECT doc_id,
         unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS tok
  FROM documents WHERE doc_id < 200),
h AS (SELECT doc_id, md5(tok) AS h FROM tok),
bits AS (
  SELECT doc_id, i,
         ((position(substr(h, 8 - i // 4, 1) IN '0123456789abcdef') - 1)
          >> (i % 4)) & 1 AS bit
  FROM h CROSS JOIN (SELECT unnest(range(0, 32)) AS i)),
votes AS (
  SELECT doc_id, i, sum(CASE WHEN bit = 1 THEN 1 ELSE -1 END) AS v
  FROM bits GROUP BY doc_id, i),
sim AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN v > 0 THEN 1::BIGINT << i ELSE 0 END) AS BIGINT)
         AS simhash
  FROM votes GROUP BY doc_id),
chunks AS (
  SELECT doc_id, simhash, c AS chunk, (simhash >> (c * 8)) & 255 AS val
  FROM sim CROSS JOIN (SELECT unnest(range(0, 4)) AS c)),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         bit_count(xor(a.simhash, b.simhash)) AS hamming
  FROM chunks a JOIN chunks b
    ON a.chunk = b.chunk AND a.val = b.val AND a.doc_id < b.doc_id)
SELECT doc_a, doc_b, hamming FROM pairs ORDER BY doc_a, doc_b
"""


def embedding_near_dup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH cosine near-dup, DuckDB-oracled: embeddings
    are cast to float64 up front so both engines run the identical
    double-precision arithmetic (sequential dot products are bit-equal —
    verified over every sf0.01 vector), and the md5-derived hyperplanes
    are inlined as double literals in the oracle SQL.  The input unions
    deterministic planted near-dups (vec_id+100000, embedding scaled by
    1.01 — cosine 1.0, identical sign sketch) so the check is non-vacuous:
    >= one pair per planted duplicate must be found."""
    from cdx_writer_spark.operators.dedup import embedding_near_dup
    emb = (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
           .select("vec_id",
                   F.col("embedding").cast("array<double>")
                   .alias("embedding")))
    planted = (emb.filter(F.col("vec_id") < 40)
               .select((F.col("vec_id") + 100000).alias("vec_id"),
                       F.transform("embedding", lambda x: x * F.lit(1.01))
                       .alias("embedding")))
    return (embedding_near_dup(emb.unionByName(planted), threshold=0.9)
            .orderBy("vec_a", "vec_b"))


def _oracle_near_dup_lsh() -> str:
    """Generate the near-dup oracle with the plane constants inlined
    (repr() round-trips doubles exactly; DuckDB parses them back to the
    identical float64 Spark embeds via F.lit).  Testdata embeddings are
    64-dimensional at every sf."""
    from cdx_writer_spark.operators.dedup import lsh_planes
    rows = ",\n  ".join(
        "(%d, [%s])" % (p, ", ".join(repr(v) for v in row))
        for p, row in enumerate(lsh_planes(12, 64, seed=7)))
    return f"""
WITH emb0 AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
emb AS (
  SELECT vec_id, v FROM emb0
  UNION ALL
  SELECT vec_id + 100000 AS vec_id,
         list_transform(v, x -> x * CAST(1.01 AS DOUBLE)) AS v
  FROM emb0 WHERE vec_id < 40),
planes(p, pv) AS (VALUES
  {rows}),
sk AS (
  SELECT vec_id, v,
         string_agg(CASE WHEN list_dot_product(v, pv) > 0
                         THEN '1' ELSE '0' END, '' ORDER BY p) AS bucket
  FROM emb CROSS JOIN planes GROUP BY vec_id, v),
scored AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         round(list_dot_product(a.v, b.v) /
               (sqrt(list_dot_product(a.v, a.v)) *
                sqrt(list_dot_product(b.v, b.v))), 6) AS cosine
  FROM sk a JOIN sk b ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
SELECT vec_a, vec_b, cosine FROM scored
WHERE cosine >= 0.9 ORDER BY vec_a, vec_b
"""


def similarity_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate nearest neighbors, value-checked end-to-end:
    external cell assignment (vec_id % 4 — the offline-codebook
    deployment shape), per-cell elementwise-mean centroids, n_probe=2
    probe selection by rounded cosine, exact top-k within probed cells
    (operators/similarity.ivf_topk_assigned).  The kmeans-built variant
    (ivf_topk) keeps its recall>=0.9 pytest pin — its centroids are not
    ANSI-SQL-expressible."""
    from cdx_writer_spark.operators.similarity import ivf_topk_assigned
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries_df = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec"))
    return (ivf_topk_assigned(emb, queries_df,
                              F.pmod(F.col("vec_id"), F.lit(4)), k=5,
                              n_probe=2)
            .orderBy("query_id", "rank"))


ORACLE_IVF_TOPK = """
WITH inv AS (SELECT vec_id, embedding, vec_id % 4 AS cell FROM embeddings),
cent AS (
  SELECT cell, list(m ORDER BY i) AS centroid FROM (
    SELECT cell, i, avg(CAST(embedding[i + 1] AS DOUBLE)) AS m
    FROM inv CROSS JOIN (SELECT unnest(range(0, 512)) AS i)
    WHERE i < len(embedding)
    GROUP BY cell, i)
  GROUP BY cell),
q AS (SELECT vec_id AS query_id, embedding AS qvec
      FROM embeddings WHERE vec_id < 3),
qc AS (
  SELECT query_id, qvec, cell,
         round(list_dot_product(CAST(qvec AS DOUBLE[]), centroid) /
               (sqrt(list_dot_product(CAST(qvec AS DOUBLE[]),
                                      CAST(qvec AS DOUBLE[]))) *
                sqrt(list_dot_product(centroid, centroid))), 4) AS sim
  FROM q CROSS JOIN cent),
probes AS (
  SELECT query_id, qvec, cell FROM (
    SELECT query_id, qvec, cell,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY sim DESC, cell) AS rn
    FROM qc) WHERE rn <= 2),
scored AS (
  SELECT query_id, vec_id,
         round(list_dot_product(embedding, qvec) /
               (sqrt(list_dot_product(embedding, embedding)) *
                sqrt(list_dot_product(qvec, qvec))), 4) AS cosine
  FROM inv JOIN probes USING (cell)
  WHERE vec_id <> query_id)
SELECT query_id, vec_id, cosine, rank FROM (
  SELECT query_id, vec_id, cosine,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, vec_id) AS rank
  FROM scored) WHERE rank <= 5
ORDER BY query_id, rank
"""


def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-lexicon language ID over documents (DuckDB-oracled: the
    marker-hit argmax with max-lang tiebreak is plain SQL)."""
    from cdx_writer_spark.operators.text import lang_id
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (lang_id(docs).select("doc_id", "lang", "pred_lang")
            .orderBy("doc_id"))


# mirrors operators/text.py LANG_MARKERS + the array_max struct tiebreak
# (max hits, then lexicographically greatest lang)
ORACLE_LANG_ID = """
WITH t AS (
  SELECT doc_id, lang,
         list_distinct(list_filter(string_split(text, ' '), x -> x <> '')) AS toks
  FROM documents),
m(mlang, markers) AS (VALUES
  ('en', ['the','and','of','to','is']),
  ('de', ['der','die','und','ist','nicht']),
  ('fr', ['le','la','et','est','les']),
  ('es', ['el','la','que','de','es']),
  ('zh', ['的','是','了','在','我'])),
s AS (SELECT doc_id, lang, mlang,
             len(list_intersect(toks, markers)) AS hits
      FROM t CROSS JOIN m),
r AS (SELECT doc_id, lang, mlang, hits,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY hits DESC, mlang DESC) AS rn
      FROM s)
SELECT doc_id, lang,
       CASE WHEN hits > 0 THEN mlang ELSE 'und' END AS pred_lang
FROM r WHERE rn = 1 ORDER BY doc_id
"""


def multimodal_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-media decode plumbing over Arrow batches — DuckDB-oracled
    end-to-end.  The decode kernel is the loudly-declared deterministic
    stub (image libs absent in this container), but the stub is a pure
    function of the synthesized payload (ASCII hex of sha2(media_id)
    repeated), so the ENTIRE pipeline — synth, mapInPandas batch
    iteration, schema, histogram feature — is reproducible in SQL: the
    16-bin high-nibble histogram of hex text collapses to digit /
    non-digit counts, whose normalized values (digits/64) are exact in
    float32.  The ``array<float>`` feature is projected to 16 scalar
    double columns because the driver canonicalizer sorts rows with
    pandas, which cannot factorize list-valued cells."""
    from cdx_writer_spark.operators.multimodal import (image_features,
                                                       synth_media)
    feats = image_features(synth_media(spark, 100))
    return (feats.select(
        "media_id", "width", "height", "format",
        F.size("feature").alias("feature_dim"),
        *[F.element_at("feature", i + 1).cast("double").alias(f"f{i:02d}")
          for i in range(16)])
        .orderBy("media_id"))


# mirrors operators/multimodal.py synth_media + _decode_image_stub: payload
# is the 64-char sha256 hex repeated 64x (4096 ASCII bytes), so hist[b>>4]
# is nonzero only at bin 3 (digits '0'-'9', ASCII 48-57) and bin 6 (chars
# 'a'-'f', ASCII 97-102); width/height come from the first two bytes.
ORACLE_MULTIMODAL = """
WITH m AS (
  SELECT range AS media_id,
         sha256(CAST(range AS VARCHAR)) AS hex
  FROM range(100)),
d AS (
  SELECT media_id,
         1 + ascii(substr(hex, 1, 1)) AS width,
         1 + ascii(substr(hex, 2, 1)) AS height,
         CAST(length(regexp_replace(hex, '[^0-9]', '', 'g')) AS DOUBLE)
           AS digits
  FROM m)
SELECT media_id, width, height,
       'stub/raw' AS format, 16 AS feature_dim,
       CAST(0.0 AS DOUBLE) AS f00, CAST(0.0 AS DOUBLE) AS f01, CAST(0.0 AS DOUBLE) AS f02,
       digits / 64.0 AS f03,
       CAST(0.0 AS DOUBLE) AS f04, CAST(0.0 AS DOUBLE) AS f05,
       (64.0 - digits) / 64.0 AS f06,
       CAST(0.0 AS DOUBLE) AS f07, CAST(0.0 AS DOUBLE) AS f08, CAST(0.0 AS DOUBLE) AS f09, CAST(0.0 AS DOUBLE) AS f10, CAST(0.0 AS DOUBLE) AS f11,
       CAST(0.0 AS DOUBLE) AS f12, CAST(0.0 AS DOUBLE) AS f13, CAST(0.0 AS DOUBLE) AS f14, CAST(0.0 AS DOUBLE) AS f15
FROM d ORDER BY media_id
"""


def streaming_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The tumbling-window aggregation executed as a Structured Streaming
    query (availableNow bounded replay) — must equal the batch oracle."""
    import shutil
    import tempfile
    from cdx_writer_spark.streaming.events import (stream_events,
                                                   windowed_counts)
    tmp = tempfile.mkdtemp(prefix="stream_contract_")
    src = f"{tmp}/events"
    import os
    os.makedirs(src)
    shutil.copy(f"{sf_dir}/events.parquet", f"{src}/part-0.parquet")
    name = "stream_contract_out"
    q = (windowed_counts(stream_events(spark, src))
         .writeStream.format("memory").queryName(name)
         .outputMode("complete")
         .option("checkpointLocation", f"{tmp}/ckpt")
         .trigger(availableNow=True).start())
    q.awaitTermination()
    return spark.table(name)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q = dict(catalog.QUERIES)
    q["crawl_surt_urlkey"] = crawl_surt_urlkey
    q["crawl_frontier_cdx"] = crawl_frontier_cdx
    q["crawl_cdx_fixture_lines"] = crawl_cdx_fixture_lines
    q["dedup_simhash_pairs"] = dedup_simhash_pairs
    q["embedding_near_dup_lsh"] = embedding_near_dup_lsh
    q["similarity_ivf_topk"] = similarity_ivf_topk
    q["text_lang_id"] = text_lang_id
    q["multimodal_image_features"] = multimodal_image_features
    q["streaming_tumbling_window"] = streaming_tumbling_window
    return q


def oracle_sql() -> dict[str, str]:
    o = dict(catalog.ORACLES)
    o["crawl_surt_urlkey"] = ORACLE_SURT_URLKEY
    o["text_lang_id"] = ORACLE_LANG_ID
    o["dedup_simhash_pairs"] = ORACLE_SIMHASH_PAIRS
    o["similarity_ivf_topk"] = ORACLE_IVF_TOPK
    o["embedding_near_dup_lsh"] = _oracle_near_dup_lsh()
    o["multimodal_image_features"] = ORACLE_MULTIMODAL
    # the streaming run must reproduce the batch tumbling-window oracle
    o["streaming_tumbling_window"] = catalog.ORACLE_TUMBLING
    return o
