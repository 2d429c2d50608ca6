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


_UNRESERVED = ("ABCDEFGHIJKLMNOPQRSTUVWXYZ"
               "abcdefghijklmnopqrstuvwxyz0123456789-._~")


def ref_pct_norm(s: str) -> str:
    """Independent RFC 9309 §2.2.2 normalization: decode %XX when the
    octet is unreserved, uppercase the hex otherwise; a % not followed
    by two hex digits stays literal."""
    out, i = [], 0
    while i < len(s):
        c = s[i]
        if c == "%" and re.match(r"^[0-9A-Fa-f]{2}", s[i + 1:i + 3]):
            hx = s[i + 1:i + 3].upper()
            ch = chr(int(hx, 16))
            out.append(ch if ch in _UNRESERVED else "%" + hx)
            i += 3
        else:
            out.append(c)
            i += 1
    return "".join(out)


def ref_match(path: str, rule: str) -> bool:
    pat = re.escape(rule).replace(r"\*", ".*")
    if pat.endswith(r"\$"):
        pat = pat[:-2] + "$"
    return re.match(pat, path) is not None


def ref_allowed(path: str, rules) -> bool:
    """Longest-match over PERCENT-NORMALIZED rules and path (specificity
    = normalized octet length), Allow wins ties — mirrors robots_gate."""
    npath = ref_pct_norm(path)
    nrules = [(t, ref_pct_norm(v)) for t, v in rules]
    dlen = max((len(v) for t, v in nrules
                if t == "disallow" and ref_match(npath, v)), default=-1)
    alen = max((len(v) for t, v in nrules
                if t == "allow" and ref_match(npath, v)), default=-1)
    return not dlen > alen


# ----------------------------------------------------------- corpus ----

FIELDS = ["User-agent", "USER-AGENT", "user-Agent", "Allow", "allow",
          "Disallow", "DISALLOW", "disallow", "Crawl-delay"]
AGENTS = ["*", "googlebot", "BingBot", "crawler", "other"]
PATH_CHARS = "abz019/.$*()+?-_"
# percent-encoded atoms (RFC 9309 §2.2.2 grammar): unreserved octets that
# must DECODE (%7E→~, %61→a, %41→A, %2e→.), reserved/other octets that
# must stay encoded with UPPERCASED hex (%2F, %2f, %3a, %2A — note %2A is
# a literal '*', not a wildcard), and malformed %-sequences that stay
# literal (%, %z, %4)
PCT_ATOMS = ["%7E", "%7e", "~", "%61", "%41", "%2e", "%2F", "%2f", "%3a",
             "%2A", "%24", "%", "%z", "%4"]


def _path_token(rng: random.Random) -> str:
    if rng.random() < 0.25:
        return rng.choice(PCT_ATOMS)
    return rng.choice(PATH_CHARS)


def make_body(rng: random.Random) -> str:
    lines = []
    for _ in range(rng.randrange(0, 16)):
        roll = rng.random()
        if roll < 0.25:
            lines.append(f"User-agent: {rng.choice(AGENTS)}")
        elif roll < 0.75:
            field = rng.choice(FIELDS)
            val = "/" + "".join(_path_token(rng)
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
        path = "/" + "".join(_path_token(rng)
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


def test_robots_gate_percent_encoding_equivalence(spark):
    """Pinned RFC 9309 §2.2.2 cases: unreserved octets decode (%7E ≡ ~,
    case-insensitive hex), reserved octets stay encoded (%2F ≢ /), and
    %2A is a literal '*', never a wildcard."""
    from cdx_writer_spark.frontier.crawl import robots_gate
    rules = [
        ("h1.example", "disallow", "/%7Ejoe/"),     # ≡ /~joe/
        ("h1.example", "allow", "/~joe/pub/"),      # longer → carve-out
        ("h2.example", "disallow", "/a%2Fb"),       # literal %2F, NOT '/'
        ("h3.example", "disallow", "/x%2Ay"),       # literal '*', no wildcard
    ]
    cand = [
        # (host, path, expected_allowed)
        ("h1.example", "/~joe/private", False),
        ("h1.example", "/%7ejoe/private", False),   # lowercase hex rule hit
        ("h1.example", "/~joe/pub/ok", True),
        ("h1.example", "/%7Ejoe/pub/ok", True),
        ("h2.example", "/a/b", True),               # %2F stays distinct
        ("h2.example", "/a%2fb", False),            # hex case-insensitive
        ("h3.example", "/xZZZy", True),             # %2A did not wildcard
        ("h3.example", "/x%2Ay", False),
        ("h3.example", "/x*y", False),              # bare '*' in path ≡ %2A? no:
        # '*' is not percent-encoded on either side, so /x*y matches the
        # literal-octet rule byte-wise after normalization (both sides hold
        # the same normalized '%2A'? no — the PATH has a bare '*', the rule
        # holds '%2A'; they differ).  Expected via the independent matcher:
    ]
    # the last case's expectation comes from the reference matcher to avoid
    # hand-reasoning mistakes
    cand[-1] = ("h3.example", "/x*y",
                ref_allowed("/x*y", [("disallow", "/x%2Ay")]))
    host_rules = {}
    for h, t, v in rules:
        host_rules.setdefault(h, []).append((t, v))
    gated = robots_gate(
        spark.createDataFrame(
            [(h, f"http://{h}{p}") for h, p, _ in cand], ["host", "url"]),
        spark.createDataFrame(rules, ["host", "rule_type", "path_prefix"]))
    kept = {r["url"] for r in gated.collect()}
    for h, p, want in cand:
        u = f"http://{h}{p}"
        assert (u in kept) == want, f"{u}: kept={u in kept}, want={want}"
        # and the independent matcher agrees with the pinned expectation
        assert ref_allowed(p, host_rules[h]) == want, f"ref disagrees on {p}"
