"""Deterministic synthetic Common-Crawl-style pages (BASELINE.json
``input_hint`` shape: url, warc_ts, html, text, lang) + seeds + robots.

Everything is a pure function of the row id (seeded hashes, no RNG state),
so the same table materializes identically at any parallelism level — the
scaling-efficiency protocol (BASELINE.md) depends on that.

Host distribution is Zipfian (web realism; the politeness/salting machinery
exists *because* of this skew).  Outlinks are embedded in the html so the
frontier's link-extraction stage has real work, and ``text`` is exactly what
``operators.text.extract_text`` recovers — the per-row byte-identical
invariant is testable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

__all__ = ["synth_pages", "synth_seeds", "synth_robots", "N_HOSTS_DEFAULT"]

N_HOSTS_DEFAULT = 1000

_WORDS = ("crawl frontier index spark shuffle partition bloom cuckoo queue "
          "politeness robots surt warc cdx offset digest host zipf skew salt "
          "batch arrow vector column parquet iceberg snapshot resume lineage "
          "metric fetch parse extract link anchor page body head title").split()


def _zipf_host(id_col, n_hosts: int, seed: int):
    """Map a uniform hash of the row id onto a Zipf(1.0)-ish host index:
    host k gets ~1/(k+1) of the mass (harmonic), via inverse-CDF on the
    continuous approximation  F(k) ~ ln(k+1)/ln(n+1)."""
    u = (F.abs(F.xxhash64(id_col, F.lit(seed))) % 1000000) / 1000000.0
    k = F.floor(F.exp(u * F.log(F.lit(float(n_hosts + 1))))) - 1
    return F.least(k.cast("int"), F.lit(n_hosts - 1))


def synth_pages(spark: SparkSession, n_pages: int, *, seed: int = 42,
                n_hosts: int = N_HOSTS_DEFAULT, n_outlinks: int = 4,
                partitions: int | None = None) -> DataFrame:
    """pages(url, warc_ts, html, text, lang, page_id, host)."""
    df = spark.range(0, n_pages, numPartitions=partitions)
    host_k = _zipf_host(F.col("id"), n_hosts, seed)
    host = F.concat(F.lit("site"), host_k.cast("string"), F.lit(".example.org"))
    path_a = (F.abs(F.xxhash64("id", F.lit(seed + 1))) % 100).cast("string")
    url = F.concat(F.lit("http://"), host, F.lit("/p/"), path_a,
                   F.lit("/page-"), F.col("id").cast("string"), F.lit(".html"))
    ts = F.to_timestamp(F.lit("2013-06-01 00:00:00")) + \
        F.make_dt_interval(secs=(F.col("id") % 86400).cast("double"))
    lang = F.element_at(
        F.array(*[F.lit(x) for x in ("en", "en", "en", "de", "fr", "es", "zh")]),
        ((F.abs(F.xxhash64("id", F.lit(seed + 2))) % 7) + 1).cast("int"))

    # body text: 30 deterministic words
    words = F.array(*[F.lit(w) for w in _WORDS])
    body = F.concat_ws(" ", F.transform(
        F.sequence(F.lit(0), F.lit(29)),
        lambda i: F.element_at(
            words,
            ((F.abs(F.xxhash64(F.col("id") * 31 + i, F.lit(seed + 3)))
              % len(_WORDS)) + 1).cast("int"))))
    title = F.concat(F.lit("page "), F.col("id").cast("string"))
    text = F.concat(title, F.lit("\n"), body)

    # deterministic outlinks to other pages, as absolute URLs of the real
    # target (host+path are the same pure functions of the target id used
    # above, so the link graph is consistent and fetchable)
    def page_url(pid):
        tk = _zipf_host(pid, n_hosts, seed)
        thost = F.concat(F.lit("site"), tk.cast("string"),
                         F.lit(".example.org"))
        tpath = (F.abs(F.xxhash64(pid, F.lit(seed + 1))) % 100).cast("string")
        return F.concat(F.lit("http://"), thost, F.lit("/p/"), tpath,
                        F.lit("/page-"), pid.cast("string"), F.lit(".html"))

    link_ids = F.transform(
        F.sequence(F.lit(0), F.lit(n_outlinks - 1)),
        lambda i: F.abs(F.xxhash64(F.col("id") * 131 + i, F.lit(seed + 4)))
        % n_pages)
    links_html = F.concat_ws("", F.transform(
        link_ids,
        lambda lid: F.concat(F.lit('<a href="'), page_url(lid),
                             F.lit('">l</a>'))))
    robots_meta = (F.when(F.col("id") % 37 == 0,
                          F.lit('<meta name="robots" content="noindex,nofollow">'))
                   .otherwise(F.lit("")))
    html = F.concat(
        F.lit("<html><head><title>"), title, F.lit("</title>"), robots_meta,
        F.lit("</head><body><h1>"), title, F.lit("</h1><p>"), body,
        F.lit("</p>"), links_html, F.lit("</body></html>"))

    return df.select(
        url.alias("url"), ts.alias("warc_ts"),
        html.cast("binary").alias("html"), text.alias("text"), lang.alias("lang"),
        F.col("id").alias("page_id"), host.alias("host"))


def synth_seeds(spark: SparkSession, n_seeds: int, n_pages: int, *,
                seed: int = 42, n_hosts: int = N_HOSTS_DEFAULT) -> DataFrame:
    """seeds(url, priority): first pages of the lowest host indices."""
    df = spark.range(0, n_seeds)
    pid = F.abs(F.xxhash64("id", F.lit(seed + 9))) % n_pages
    host_k = _zipf_host(pid, n_hosts, seed)
    host = F.concat(F.lit("site"), host_k.cast("string"), F.lit(".example.org"))
    path_a = (F.abs(F.xxhash64(pid, F.lit(seed + 1))) % 100).cast("string")
    url = F.concat(F.lit("http://"), host, F.lit("/p/"), path_a,
                   F.lit("/page-"), pid.cast("string"), F.lit(".html"))
    prio = F.round(1.0 + (F.abs(F.xxhash64("id", F.lit(seed + 10))) % 1000)
                   / 1000.0, 3)
    return df.select(url.alias("url"), prio.alias("priority")).distinct()


def synth_robots(spark: SparkSession, *, seed: int = 42,
                 n_hosts: int = N_HOSTS_DEFAULT,
                 frac_disallowed: float = 0.1) -> DataFrame:
    """robots(host, rule_type, path_prefix): every 10th host disallows /p/9*
    paths (deterministic)."""
    df = spark.range(0, n_hosts)
    host = F.concat(F.lit("site"), F.col("id").cast("string"),
                    F.lit(".example.org"))
    step = max(int(1 / frac_disallowed), 1)
    return (df.filter(F.col("id") % step == 0)
            .select(host.alias("host"), F.lit("disallow").alias("rule_type"),
                    F.lit("/p/9").alias("path_prefix")))
