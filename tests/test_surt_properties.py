"""Property-based fuzz over the SURT kernel, complementing the 37-case
golden corpus (tests/test_surt.py): invariants that must hold for ANY
input, derived from the documented IA canonicalizer rules the kernel
implements (kernels/surt.py module docstring).  Pure-Python — no Spark.
"""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from cdx_writer_spark.kernels.surt import SurtError, host_of, surt

label = st.text(alphabet=string.ascii_letters + string.digits + "-",
                min_size=1, max_size=8).filter(
                    lambda s: not s.startswith("-") and not s.endswith("-"))
hosts = st.lists(label, min_size=2, max_size=4).map(".".join)
paths = st.text(alphabet=string.ascii_letters + string.digits + "/._-~",
                max_size=30)
queries = st.lists(
    st.tuples(st.text(string.ascii_lowercase, min_size=1, max_size=5),
              st.text(string.ascii_letters + string.digits, max_size=6)),
    max_size=4).map(lambda kv: "&".join(f"{k}={v}" for k, v in kv))


def _url(host, path, query=""):
    u = f"http://{host}/{path}"
    return u + ("?" + query if query else "")


@settings(max_examples=300, deadline=None)
@given(hosts, paths, queries)
def test_surt_total_and_deterministic(host, path, query):
    """surt() either canonicalizes or raises SurtError — never another
    exception — and is a pure function."""
    u = _url(host, path, query)
    try:
        a = surt(u)
    except SurtError:
        return
    assert a == surt(u)
    assert isinstance(a, str)
    # host labels are reversed and comma-joined before the ')'
    assert ")" in a


@settings(max_examples=300, deadline=None)
@given(hosts, paths, queries)
def test_surt_scheme_host_case_and_port_insensitive(host, path, query):
    """Scheme and host are case-insensitive; :80 is the http default."""
    u = _url(host, path, query)
    try:
        a = surt(u)
    except SurtError:
        return
    assert surt(f"HTTP://{host.upper()}/{path}"
                + ("?" + query if query else "")) == a
    assert surt(f"http://{host}:80/{path}"
                + ("?" + query if query else "")) == a


@settings(max_examples=300, deadline=None)
@given(hosts, paths)
def test_surt_www_stripped(host, path):
    """A leading www[digit]. label is dropped (IA rule) unless the host is
    only www.tld."""
    if host.split(".")[0].lower().startswith("www"):
        return
    try:
        a, b = surt(f"http://www.{host}/{path}"), surt(f"http://{host}/{path}")
    except SurtError:
        return
    assert a == b


@settings(max_examples=300, deadline=None)
@given(hosts, paths, queries)
def test_surt_idempotent_on_roundtrip_url(host, path, query):
    """Reconstructing a URL from the canonical host+path and re-surting
    yields the same key: canonicalization is a projection (f(f(x))=f(x))."""
    u = _url(host, path, query)
    try:
        k1 = surt(u)
        h = host_of(u)
    except SurtError:
        return
    tail = k1.split(")", 1)[1]
    u2 = f"http://{h}{tail}"
    try:
        k2 = surt(u2)
    except SurtError:
        return
    assert k2 == k1, f"not idempotent: {u!r} -> {k1!r} -> {k2!r}"


@settings(max_examples=300, deadline=None)
@given(hosts, paths, queries)
def test_host_of_consistent_with_surt(host, path, query):
    """host_of agrees with the surt key's reversed host labels."""
    u = _url(host, path, query)
    try:
        k, h = surt(u), host_of(u)
    except SurtError:
        return
    rev = ",".join(reversed(h.split(".")))
    # IP(-like) hosts keep dotted order (IA rule: no label reversal for
    # addresses, incl. hex/octal octet forms the canonicalizer resolves);
    # everything else reverses labels with commas
    assert (k.startswith(rev + ")") or k.startswith(rev + ":")
            or k.startswith(h + ")") or k.startswith(h + ":")), \
        f"surt key {k!r} matches neither reversed nor literal host {h!r}"


# ---------------------------------------------------------------- fast path

from cdx_writer_spark.kernels.surt import _surt_fast, _surt_full  # noqa: E402

# URL soup biased to straddle the fast-path boundary: simple hosts/paths
# plus every construct the fast guard must refuse (%-escapes, www, ports,
# queries, fragments, dot-segments, '//', uppercase, IPs, trailing slash)
fast_hosts = st.lists(
    st.text(alphabet=string.ascii_lowercase + string.digits + "-",
            min_size=1, max_size=6),
    min_size=1, max_size=4).map(".".join)
fast_paths = st.text(
    alphabet=string.ascii_lowercase + string.digits + "_./-%?#:@ A~",
    max_size=20)
prefixes = st.sampled_from(
    ["http://", "https://", "HTTP://", "http://www.", "http://www2.",
     "http://wwwx.", "", "ftp://", "http://1.2.3.4", "http://0x7f.1.2.3"])
suffixes = st.sampled_from(["", "/", ":80", ":8080", "?b=2&a=1", "#frag",
                            "/..", "/.", "//x", "/a/../b", "/a/./b",
                            ";jsessionid=0123456789abcdef0123456789abcdef"])


@settings(max_examples=2000, deadline=None)
@given(prefixes, fast_hosts, fast_paths, suffixes)
def test_surt_fast_path_matches_full(pre, host, path, suf):
    """Wherever the fast path fires, its output equals the full
    algorithm's — on a grammar dense around every guard boundary."""
    u = f"{pre}{host}/{path}{suf}".encode()
    fast = _surt_fast(u)
    if fast is None:
        return
    assert fast == _surt_full(u), u


@settings(max_examples=2000, deadline=None)
@given(prefixes, fast_hosts, fast_paths, suffixes)
def test_host_of_fast_path_matches_full(pre, host, path, suf):
    """host_of's fast path equals the full parse+canonicalize chain."""
    import re as _re
    from cdx_writer_spark.kernels.surt import (_FAST_RE, _ALPHA_RE,
                                               _IPV4_RE, _canonicalize_host,
                                               parse_url)
    u = f"{pre}{host}/{path}{suf}".encode()
    m = _FAST_RE.match(u)
    if m is None or _ALPHA_RE.search(m.group(1)) is None:
        return
    fast = m.group(1).decode("ascii")
    cleaned = u.replace(b"\t", b"").replace(b"\r", b"").replace(b"\n", b"")
    _s, _u2, h, _p, _pa, _q, _f = parse_url(cleaned)
    h = _canonicalize_host(h)
    if not _IPV4_RE.match(h):
        h = _re.sub(rb"^www\d*\.", b"", h, count=1)
    assert fast == h.decode("latin-1"), u
