"""Vectorized (Arrow) UDFs shared across operators — the only Python that
runs in hot paths; everything else stays JVM-side.

Per BASELINE.json input_hint: pandas/Arrow UDFs only, never per-row
``udf()``.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F, types as T

__all__ = ["surt_key", "url_host", "extract_text", "extract_outlinks",
           "sha1_b32", "raw_hrefs_expr", "normalize_links",
           "OUTLINK_HREF_RE"]

# Java-regex twin of extract_outlinks' byte regex (same ASCII \s/\b
# semantics; equivalent on valid UTF-8 — multibyte chars contain no
# quote/space/'>' bytes, so byte-wise and char-wise scans agree)
OUTLINK_HREF_RE = r"""(?i)<a\b[^>]*?\bhref\s*=\s*['"]?([^'">\s]+)"""


def raw_hrefs_expr(html_col) -> "F.Column":
    """``array<string>`` of raw href attribute values, extracted ENTIRELY
    JVM-side (``regexp_extract_all`` inside whole-stage codegen).

    Paired with ``normalize_links``, this keeps multi-KB page payloads
    out of the JVM->Python Arrow channel: the crawl parse stage ships
    only the extracted hrefs (~10 short strings/page) plus the base url
    to Python for urljoin normalization — the page body itself never
    leaves the JVM (its digest is JVM expression arithmetic too,
    operators/cdx.py sha1_b32_expr).  At 16+ concurrent tasks the Arrow
    transfer of raw html was the crawl loop's largest single DRAM
    mover (BENCH.md: this host's bandwidth ceiling binds the 16-core
    side), and at a production 100 TB/generation scale it is pure
    waste."""
    return F.regexp_extract_all(F.col(html_col).cast("string")
                                if isinstance(html_col, str) else
                                html_col.cast("string"),
                                F.lit(OUTLINK_HREF_RE), 1)


@F.pandas_udf(T.ArrayType(T.StringType()))
def normalize_links(hrefs: pd.Series, base_url: pd.Series) -> pd.Series:
    """urljoin each raw href against the page url (the live branch of the
    reference's urljoin_and_normalize, cdx_writer.py:475-544) — the
    Python half of the raw_hrefs_expr hybrid; input is the slim href
    arrays, never the page bytes."""
    from urllib.parse import urljoin

    def one(args):
        hs, base = args
        if hs is None:
            return []
        out = []
        for raw in hs:
            try:
                joined = urljoin(base or "", raw)
            except ValueError:
                continue
            out.append(joined.replace(" ", "%20"))
        return out
    return pd.Series(map(one, zip(hrefs, base_url)))


@F.pandas_udf(T.StringType())
def sha1_b32(payload: pd.Series) -> pd.Series:
    """base32(sha1(bytes)) — the reference's checksum fabrication
    (cdx_writer.py:399-425); no Spark builtin yields base32 digests."""
    import base64
    import hashlib

    def one(b):
        if b is None:
            return None
        return base64.b32encode(hashlib.sha1(bytes(b)).digest()).decode("ascii")
    return payload.map(one)


@F.pandas_udf(T.StringType())
def surt_key(urls: pd.Series) -> pd.Series:
    """URL -> SURT urlkey, falling back to the raw url on canonicalization
    failure (reference cdx_writer.py:277-291 semantics)."""
    from cdx_writer_spark.kernels.surt import surt

    def one(u):
        if u is None:
            return None
        try:
            return surt(u)
        except Exception:
            return u if isinstance(u, str) else u.decode("latin-1")
    return urls.map(one)


@F.pandas_udf(T.StringType())
def url_host(urls: pd.Series) -> pd.Series:
    """Canonicalized host (politeness bucketing key)."""
    from cdx_writer_spark.kernels.surt import host_of
    return urls.map(lambda u: host_of(u) if u is not None else None)


_KEY_HOST_SCHEMA = T.StructType([
    T.StructField("urlkey", T.StringType()),
    T.StructField("host", T.StringType()),
])


@F.pandas_udf(_KEY_HOST_SCHEMA)
def surt_and_host(urls: pd.Series) -> pd.DataFrame:
    """(urlkey, host) in ONE Arrow pass — the frontier canonicalizes every
    discovered URL, so fusing the two kernels halves the batch transfers."""
    from cdx_writer_spark.kernels.surt import host_of, surt

    keys, hosts = [], []
    for u in urls:
        if u is None:
            keys.append(None)
            hosts.append(None)
            continue
        try:
            keys.append(surt(u))
        except Exception:
            keys.append(u if isinstance(u, str) else u.decode("latin-1"))
        hosts.append(host_of(u))
    return pd.DataFrame({"urlkey": keys, "host": hosts})


def _strip_tags(html: bytes) -> str:
    """Extract text from page html: <title> then each <p> block, tags
    stripped, newline-joined.  Deterministic and byte-stable: the synth
    generator (sources/synth.py) emits exactly this text, making the
    input_hint per-row byte-identical invariant testable end-to-end."""
    import re
    if html is None:
        return None
    m = re.search(rb"<title>(.*?)</title>", html, re.S | re.I)
    parts = [m.group(1)] if m else []
    for p in re.finditer(rb"<p>(.*?)</p>", html, re.S | re.I):
        content = re.sub(rb"<[^>]*>", b"", p.group(1)).strip()
        if content:
            parts.append(content)
    return b"\n".join(parts).decode("utf-8", "replace")


@F.pandas_udf(T.StringType())
def extract_text(html: pd.Series) -> pd.Series:
    return html.map(_strip_tags)


@F.pandas_udf(T.ArrayType(T.StringType()))
def extract_outlinks(html: pd.Series, base_url: pd.Series) -> pd.Series:
    """href extraction + urljoin normalization (reference
    urljoin_and_normalize, cdx_writer.py:475-544, simplified to the live
    branch: absolutize against the page url)."""
    import re
    from urllib.parse import urljoin
    href = re.compile(rb"""<a\b[^>]*?\bhref\s*=\s*['"]?([^'">\s]+)""", re.I)

    def one(args):
        html_b, base = args
        if html_b is None:
            return []
        out = []
        for m in href.finditer(html_b):
            raw = m.group(1).decode("utf-8", "replace")
            try:
                joined = urljoin(base or "", raw)
            except ValueError:
                continue
            out.append(joined.replace(" ", "%20"))
        return out
    return pd.Series(map(one, zip(html, base_url)))
