"""robots.txt parsing -> the (host, rule_type, path_prefix) rules table
consumed by frontier.crawl.robots_gate (north_rule robots gating).

The reference engine has no robots handling (it indexes already-fetched
archives); a crawl frontier must parse the fetched ``/robots.txt``
bodies itself.  Grammar implemented (the original REP as published in
the robotstxt.org spec and RFC 9309 §2): records are groups of
``User-agent`` lines followed by ``Allow``/``Disallow`` lines; a record
applies to agent ``*`` iff one of its User-agent lines is ``*`` (or the
configured agent string, matched case-insensitively); ``#`` starts a
comment; field names are case-insensitive; blank Disallow means
"allow everything" and is dropped.  Rule paths may use the RFC 9309
§2.2.3 special characters ``*`` (any octet sequence) and trailing
``$`` (end-of-path anchor) — matching happens in
``frontier.crawl.robots_gate``; this module only emits the raw rule
strings.  Percent-encoding equivalence (RFC 9309 §2.2.2) is handled at
match time: crawl._pct_norm_expr normalizes BOTH rule paths and URL
paths to canonical form (unreserved octets decoded, remaining hex
uppercased) before comparison, so ``/%7Ejoe/`` ≡ ``/~joe/`` while
reserved octets like ``%2F`` stay distinct from ``/``.

Implementation is pure DataFrame/window algebra — no UDF:
  split body -> posexplode keeps line order -> a running count of
  "User-agent line that starts a new record" boundaries assigns each
  line its record id -> records with a matching User-agent line are
  semi-joined back -> their Allow/Disallow lines become rules.
All shuffles hash on (host) or (host, record) — never on line text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["robots_rules", "host_budgets"]


def robots_rules(docs: DataFrame, host_col: str = "host",
                 body_col: str = "body", agent: str = "*") -> DataFrame:
    """(host, body) robots.txt docs -> (host, rule_type, path_prefix)."""
    lines = docs.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(body_col), "\r?\n"))
        .alias("pos", "raw"))
    # strip comments + whitespace; classify
    line = F.trim(F.regexp_replace("raw", "#.*$", ""))
    pat = r"(?i)^(user-agent|allow|disallow|crawl-delay)\s*:\s*(.*)$"
    fields = lines.select(
        "host", "pos",
        F.regexp_extract(line, pat, 1).alias("field"),
        F.trim(F.regexp_extract(line, pat, 2)).alias("value"))
    fields = (fields.filter(F.col("field") != "")
              .withColumn("field", F.lower("field")))

    w = Window.partitionBy("host").orderBy("pos")
    is_ua = (F.col("field") == "user-agent").cast("int")
    # a User-agent line NOT preceded by another User-agent line starts a
    # new record (consecutive UA lines share the record)
    boundary = (is_ua * F.when(
        F.lag("field").over(w).isNull()
        | (F.lag("field").over(w) != "user-agent"), 1).otherwise(0))
    recs = fields.withColumn(
        "record", F.sum(boundary).over(
            w.rowsBetween(Window.unboundedPreceding, 0)))

    # records whose UA set names the configured agent.  RFC 9309 §2.2.1
    # precedence: when a host has records naming this agent specifically,
    # they alone apply; otherwise the host's ``*`` records are the
    # fallback group.  (agent == "*" selects the ``*`` records directly.)
    ua = recs.filter(F.col("field") == "user-agent")
    if agent == "*":
        matching = (ua.filter(F.lower("value") == "*")
                    .select("host", "record").distinct())
    else:
        specific = (ua.filter(F.lower("value") == agent.lower())
                    .select("host", "record").distinct())
        star = (ua.filter(F.lower("value") == "*")
                .select("host", "record").distinct())
        hosts_specific = specific.select("host").distinct()
        matching = specific.unionByName(
            star.join(hosts_specific, "host", "left_anti"))
    rules = (recs.filter(F.col("field").isin("allow", "disallow",
                                             "crawl-delay")
                         & (F.col("value") != ""))
             .join(matching, ["host", "record"], "left_semi")
             .select("host",
                     F.col("field").alias("rule_type"),
                     F.col("value").alias("path_prefix")))
    return rules.distinct()


def host_budgets(rules: DataFrame, default_budget: int,
                 gen_seconds: float = 60.0) -> DataFrame:
    """Per-host politeness budget overrides from Crawl-delay rules:
    a host asking for ``delay`` seconds between fetches gets at most
    ``gen_seconds / delay`` fetches per generation (floored at 1,
    CLAMPED at ``default_budget`` — overrides only ever reduce, so the
    scheduler's salted skew guard, sized for the default, stays valid).
    Output (host, budget) feeds ``schedule(host_budgets=...)``."""
    delay = F.col("path_prefix").cast("double")
    return (rules.filter((F.col("rule_type") == "crawl-delay")
                         & delay.isNotNull() & (delay > 0))
            .groupBy("host").agg(F.max(delay).alias("_delay"))
            .select("host",
                    F.least(
                        F.greatest(F.floor(F.lit(gen_seconds) / F.col("_delay")),
                                   F.lit(1)),
                        F.lit(default_budget)).cast("int").alias("budget")))
