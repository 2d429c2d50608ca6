"""Randomized-grammar fuzz of the robots stack against an INDEPENDENT
in-test reference implementation (mirrors the SURT property suite's
second-implementation strategy, batched through Spark in one job
instead of per-example so the fuzz stays fast):

* ``robots_rules`` (frontier/robots.py) vs a from-scratch line parser —
  group structure, comments, CRLF, case, blank rules, agent fallback;
* ``robots_gate`` (frontier/crawl.py) vs a from-scratch RFC 9309
  longest-match matcher with ``*``/``$`` wildcard translation.

The corpus is seeded-random (deterministic across runs)."""

import random
import re

import pytest
from pyspark.sql import functions as F

# ----------------------------------------------------- reference impl --


def ref_parse(body: str, agent: str = "*"):
    """Independent robots.txt parser -> set of (rule_type, value)."""
    groups = []            # [(set_of_agents_lower, [(field, value), ...])]
    cur_agents, rules = None, []
    collecting = False
    for raw in re.split(r"\r?\n", body):
        line = raw.split("#", 1)[0].strip()
        m = re.match(r"(?i)^(user-agent|allow|disallow|crawl-delay)"
                     r"\s*:\s*(.*)$", line)
        if not m:
            continue
        field, value = m.group(1).lower(), m.group(2).strip()
        if field == "user-agent":
            if collecting:
                cur_agents.add(value.lower())
            else:
                if cur_agents is not None:
                    groups.append((cur_agents, rules))
                cur_agents, rules, collecting = {value.lower()}, [], True
        else:
            collecting = False
            if cur_agents is None or value == "":
                continue
            rules.append((field, value))
    if cur_agents is not None:
        groups.append((cur_agents, rules))
    a = agent.lower()
    spec = [r for ags, rs in groups if a in ags for r in rs]
    if a != "*" and not any(a in ags for ags, _ in groups):
        spec = [r for ags, rs in groups if "*" in ags for r in rs]
    return set(spec)


def ref_match(path: str, rule: str) -> bool:
    pat = re.escape(rule).replace(r"\*", ".*")
    if pat.endswith(r"\$"):
        pat = pat[:-2] + "$"
    return re.match(pat, path) is not None


def ref_allowed(path: str, rules) -> bool:
    dlen = max((len(v) for t, v in rules
                if t == "disallow" and ref_match(path, v)), default=-1)
    alen = max((len(v) for t, v in rules
                if t == "allow" and ref_match(path, v)), default=-1)
    return not dlen > alen


# ----------------------------------------------------------- corpus ----

FIELDS = ["User-agent", "USER-AGENT", "user-Agent", "Allow", "allow",
          "Disallow", "DISALLOW", "disallow", "Crawl-delay"]
AGENTS = ["*", "googlebot", "BingBot", "crawler", "other"]
PATH_CHARS = "abz019/.$*()+?-_"


def make_body(rng: random.Random) -> str:
    lines = []
    for _ in range(rng.randrange(0, 16)):
        roll = rng.random()
        if roll < 0.25:
            lines.append(f"User-agent: {rng.choice(AGENTS)}")
        elif roll < 0.75:
            field = rng.choice(FIELDS)
            val = "/" + "".join(rng.choice(PATH_CHARS)
                                for _ in range(rng.randrange(0, 9)))
            if rng.random() < 0.1:
                val = ""                      # blank rule: dropped
            com = "  # c" if rng.random() < 0.2 else ""
            lines.append(f"{field}: {val}{com}")
        elif roll < 0.85:
            lines.append("# full-line comment")
        elif roll < 0.95:
            lines.append("garbage line without colon")
        else:
            lines.append("")
    sep = "\r\n" if rng.random() < 0.3 else "\n"
    return sep.join(lines)


N_HOSTS = 200


@pytest.mark.parametrize("agent", ["*", "googlebot"])
def test_robots_rules_fuzz_vs_reference(spark, agent):
    from cdx_writer_spark.frontier.robots import robots_rules
    rng = random.Random(20260817)
    docs = [(f"h{i}.example", make_body(rng)) for i in range(N_HOSTS)]
    got = {}
    rows = robots_rules(
        spark.createDataFrame(docs, ["host", "body"]), agent=agent).collect()
    for r in rows:
        got.setdefault(r["host"], set()).add(
            (r["rule_type"], r["path_prefix"]))
    for host, body in docs:
        want = ref_parse(body, agent=agent)
        assert got.get(host, set()) == want, \
            f"{host} (agent={agent}):\n{body!r}\nspark={got.get(host)}\n" \
            f"ref={want}"


def test_robots_gate_fuzz_vs_reference(spark):
    from cdx_writer_spark.frontier.crawl import robots_gate
    rng = random.Random(20260818)
    docs = [(f"h{i}.example", make_body(rng)) for i in range(N_HOSTS)]
    host_rules = {h: [(t, v) for t, v in ref_parse(b)
                      if t in ("allow", "disallow")] for h, b in docs}
    rules_rows = [(h, t, v) for h, rs in host_rules.items() for t, v in rs]
    if not rules_rows:
        pytest.skip("degenerate corpus")
    cand = []
    for i in range(1000):
        h = f"h{rng.randrange(N_HOSTS)}.example"
        path = "/" + "".join(rng.choice(PATH_CHARS)
                             for _ in range(rng.randrange(0, 10)))
        cand.append((h, f"http://{h}{path}", path))
    gated = robots_gate(
        spark.createDataFrame([(h, u) for h, u, _ in cand],
                              ["host", "url"]),
        spark.createDataFrame(rules_rows,
                              ["host", "rule_type", "path_prefix"]))
    kept = {r["url"] for r in gated.collect()}
    for h, u, path in cand:
        want = ref_allowed(path, host_rules.get(h, []))
        assert (u in kept) == want, \
            f"{u}: spark kept={u in kept}, ref allowed={want}, " \
            f"rules={host_rules.get(h)}"
