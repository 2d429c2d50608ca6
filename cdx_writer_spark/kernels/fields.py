"""Per-record CDX field kernels — pure functions over a parsed archive
record, reimplementing every ``get_*``/``parse_*`` of the reference engine
(reference ``cdx_writer.py:105-620``).  These run vectorized inside Arrow
``mapInPandas`` batches on Spark; they are plain Python here so the golden
fixtures can pin them without a JVM.

Field letters (reference ``field_map``, cdx_writer.py:38-49):
  N massaged url  b date  a original url  m mime type  s response code
  k new style checksum  r redirect(-)  M AIF meta tags
  S compressed record size  V compressed arc file offset  g file name
"""

from __future__ import annotations

import base64
import hashlib
import re
from datetime import datetime

from .encdetect import to_unicode_like_reference
from .surt import surt
from .warcrec import Record

__all__ = ["compute_fields", "cdx_line", "CDX_DEFAULT_FORMAT", "FAKE_BUILD_VERSION"]

CDX_DEFAULT_FORMAT = "N b a m s k r M S V g"

# mirrors the reference's fake_build_version (cdx_writer.py:60)
FAKE_BUILD_VERSION = "archive-commons.0.0.1-SNAPSHOT-20120112102659-python"

_CRLF_SPLIT = re.compile(rb"\r?\n\r?\n")
_RESPONSE_CT = re.compile(rb"^application/http;\s*msgtype=response$", re.I)
_HTTP_STATUS = re.compile(rb"HTTP(?:/\d\.\d)? (\d+)")
_MIME_TOKEN = re.compile(r"^[a-z0-9\-\.\+/]+$")
_CHARSET = re.compile(rb"charset\s*=\s*([a-z0-9_\-]+)", re.I)
_META_TAG = re.compile(rb"(<meta[^>]+?>)", re.I)
_HEAD_END = re.compile(rb"(</head>)", re.I)
_META_NAME = re.compile(rb"""\b(?:name|http-equiv)\s*=\s*(['"]?)(.*?)(\1)[\s/>]""", re.I)
_META_CONTENT = re.compile(rb"""\bcontent\s*=\s*(['"]?)(.*?)(\1)[\s/>]""", re.I)

# reference lxml_parse_limit (cdx_writer.py:71-73): skip meta parse > 5 MB
META_PARSE_LIMIT = 5 * 1024 * 1024


def _sha1_b32(data: bytes) -> str:
    return base64.b32encode(hashlib.sha1(data).digest()).decode("ascii")


def parse_headers_and_content(rec: Record, screenshot_mode: bool = False):
    """reference cdx_writer.py:598-620"""
    if rec.record_type == "response" and rec.payload.startswith(b"HTTP"):
        parts = _CRLF_SPLIT.split(rec.payload, 1)
        if len(parts) == 2:
            headers, content = parts
        else:
            headers, content = rec.payload, None
        return headers.splitlines(), content
    if screenshot_mode and rec.record_type == "metadata":
        return None, rec.payload
    return None, None


def parse_http_header(headers, name: str):
    """First header line matching ``name:`` (reference cdx_writer.py:105-114)."""
    if headers is None:
        return None
    pat = re.compile(name.encode("ascii") + rb":\s*(.+)", re.I)
    for line in headers:
        m = pat.match(line)
        if m:
            return m.group(1)
    return None


def is_response(content_type: bytes | None) -> bool:
    return content_type is not None and _RESPONSE_CT.match(content_type) is not None


def get_mime_type(rec: Record, headers, screenshot_mode: bool = False) -> str:
    """reference cdx_writer.py:429-457 + 118-135"""
    if rec.record_type == "response" and is_response(rec.content_type):
        ct = parse_http_header(headers, "content-type")
        if ct is None:
            return "unk"
        ct = ct.strip()
        if ct == b"":
            return "unk"
        m = re.match(rb"(.+?);", ct)
        if m:
            ct = m.group(1)
        try:
            ct_s = ct.decode("ascii")
        except UnicodeDecodeError:
            return "unk"
        return ct_s if _MIME_TOKEN.match(ct_s) else "unk"
    if rec.record_type == "response":
        if rec.content_type is None:
            return "unk"
        mime = rec.content_type.replace(b"no-type", b"unk")
    elif rec.record_type == "warcinfo":
        mime = b"warc-info"
    elif screenshot_mode and rec.record_type == "metadata":
        mime = rec.content_type or b""
    else:
        mime = b"warc/" + rec.record_type.encode("ascii", "replace")
    try:
        return mime.decode("ascii")
    except UnicodeDecodeError:
        return "unk"


def get_response_code(rec: Record) -> str:
    """reference cdx_writer.py:585-596"""
    if rec.record_type != "response":
        return "-"
    m = _HTTP_STATUS.match(rec.payload)
    return m.group(1).decode("ascii") if m else "-"


def parse_meta_tags(rec: Record, mime_type: str, content: bytes | None):
    """reference cdx_writer.py:165-230; keys/values latin-1-decoded."""
    if not (rec.record_type == "response" and mime_type == "text/html"):
        return None
    if content is None:
        return None
    clen = rec.content_length_hdr
    if clen is not None and clen > META_PARSE_LIMIT:
        return {}
    return meta_tags_from_html(content)


def meta_tags_from_html(content: bytes):
    """The scan loop of parse_meta_tags, gates already applied — shared by
    the kernel path above and the Spark hot path (operators/cdx.py), which
    applies the response/text-html/5MB gates as Column exprs."""
    meta: dict[str, str] = {}
    html = content.strip()
    if html == b"":
        return meta
    head_limit = None
    m = _HEAD_END.search(html)
    if m:
        head_limit = m.start(1)
    for x in _META_TAG.finditer(html):
        if head_limit is not None and x.start(1) >= head_limit:
            break
        tag = x.group(1)
        mn = _META_NAME.search(tag)
        if not mn:
            continue
        name = mn.group(2).lower().decode("latin-1")
        mc = _META_CONTENT.search(tag)
        if not mc:
            continue
        content_v = mc.group(2).decode("latin-1")
        if name not in meta:
            meta[name] = content_v
        elif name != "refresh":  # first refresh tag wins
            meta[name] += "," + content_v
    return meta


def get_aif_meta_tags(rec: Record, headers, meta_tags) -> str:
    """Field M (reference cdx_writer.py:235-272): A/F/I flags in that order
    from meta robots + X-Robots-Tag, then the IA-proprietary P flag from
    WARC-Simple-Form-Province-Status."""
    x_robots = parse_http_header(headers, "x-robots-tag")
    return aif_flags(
        meta_tags,
        x_robots.decode("latin-1") if x_robots is not None else None,
        rec.get_header("WARC-Simple-Form-Province-Status"))


def aif_flags(meta_tags, x_robots: str | None, sfps: str | None) -> str:
    """Core of field M with the header values already extracted — shared by
    the kernel path and the Spark hot path (which pulls x-robots-tag out of
    the header block with a JVM regexp)."""
    robot_tags: list[str] = []
    if meta_tags and "robots" in meta_tags:
        robot_tags += meta_tags["robots"].split(",")
    if x_robots:
        robot_tags += x_robots.split(",")
    robot_tags = [t.strip().lower() for t in robot_tags]
    s = ""
    if "noarchive" in robot_tags:
        s += "A"
    if "nofollow" in robot_tags:
        s += "F"
    if "noindex" in robot_tags:
        s += "I"
    if sfps:
        first = sfps.split(",", 2)[0]
        try:
            if int(first) > 0:
                s += "P"
        except ValueError:
            pass
    return s if s else "-"


def get_date(date_raw: str | None) -> str:
    """reference cdx_writer.py:352-376"""
    if date_raw is None:
        return "-"
    if re.fullmatch(r"[0-9]+", date_raw):
        n = len(date_raw)
        if n == 14:
            return date_raw
        if n in (16, 18):
            return date_raw[:14]
        if n == 12:
            return date_raw + "00"
    elif re.match(r"^[a-f0-9]+$", date_raw):
        return "-"
    d = datetime.strptime(date_raw, "%Y-%m-%dT%H:%M:%SZ")
    return d.strftime("%Y%m%d%H%M%S")


def get_original_url(rec: Record, warc_path: str, screenshot_mode: bool = False) -> str:
    """reference cdx_writer.py:312-348"""
    if rec.record_type == "warcinfo":
        return "warcinfo:/%s/%s" % (warc_path, FAKE_BUILD_VERSION)
    url = to_unicode_like_reference(rec.url or b"")
    url = (url.replace("\r", "%0D").replace("\n", "%0A")
              .replace("\x0c", "%0C").replace("\x00", "%00"))
    if screenshot_mode:
        url = "http://web.archive.org/screenshot/" + url
    return url


def get_massaged_url(rec: Record, warc_path: str, screenshot_mode: bool = False) -> str:
    """Field N (reference cdx_writer.py:277-291): surt, falling back to the
    original url on any canonicalization error."""
    if rec.record_type == "warcinfo":
        return get_original_url(rec, warc_path, screenshot_mode)
    url = rec.url or b""
    if screenshot_mode:
        url = b"http://web.archive.org/screenshot/" + url
    try:
        return surt(url)
    except Exception:  # bare fallback mirrors reference cdx_writer.py:290
        return get_original_url(rec, warc_path, screenshot_mode)


def get_new_style_checksum(rec: Record, content: bytes | None) -> str:
    """Field k (reference cdx_writer.py:399-425).  The reference's patched
    warctools fabricates WARC-Payload-Digest (sha1 of the HTTP body) when the
    header is absent; we fabricate identically here."""
    if rec.record_type == "revisit":
        digest = rec.get_header("WARC-Payload-Digest")
        return digest.replace("sha1:", "") if digest is not None else "-"
    if rec.record_type == "response" and is_response(rec.content_type):
        digest = rec.get_header("WARC-Payload-Digest")
        if digest is not None:
            return digest.replace("sha1:", "")
        # fabricated payload digest: sha1 of the HTTP body
        body = content if content is not None else rec.payload
        return _sha1_b32(body if body is not None else b"")
    if rec.record_type == "response" and content is not None:
        digest = rec.get_header("WARC-Payload-Digest")
        if digest is not None:
            return digest.replace("sha1:", "")
        return _sha1_b32(content)
    return _sha1_b32(rec.payload)


def to_unicode(s, charset):
    """reference cdx_writer.py:460-473"""
    if isinstance(s, bytes):
        if charset is None:
            return s.decode("utf-8", "replace")
        try:
            return s.decode(charset, "replace")
        except LookupError:
            return s.decode("utf-8", "replace")
    return s


def urljoin_and_normalize(base, url, charset):
    """reference cdx_writer.py:475-544 (doctest-pinned): urljoin preserving
    empty fragments/queries, manual /../ and /./ collapse, spaces -> %20.

    >>> urljoin_and_normalize('http://archive.org/a/b/', '/c/d/../e/foo', 'utf-8')
    'http://archive.org/c/e/foo'
    >>> urljoin_and_normalize('http://archive.org/a/b/', '/foo/./bar/#', 'utf-8')
    'http://archive.org/foo/bar/#'
    >>> urljoin_and_normalize('http://archive.org', '../site', 'utf-8')
    'http://archive.org/site'
    >>> urljoin_and_normalize('http://www.seomoz.org/page-strength/http://www.example.com/',
    ...                       'http://www.seomoz.org/trifecta/fetch/page/http://www.example.com/',
    ...                       'utf-8')
    'http://www.seomoz.org/trifecta/fetch/page/http://www.example.com/'
    """
    from urllib.parse import urljoin
    url = to_unicode(url, charset)
    base = to_unicode(base, "utf-8")
    try:
        joined = urljoin(base, url)
    except ValueError:
        return "-"
    m = re.match(r"(https?://.+?/)", joined)
    if m:
        domain = joined[: m.end(1)]
        path = joined[m.end(1):]
        if path.startswith("../"):
            path = path[3:]
        norm = domain + re.sub(r"/[^/]+/\.\./", "/", path)
        norm = re.sub(r"/\./", "/", norm)
    else:
        norm = joined
    if url.endswith("?") and not norm.endswith("?"):
        norm += "?"
    elif url.endswith("#") and not norm.endswith("#"):
        norm += "#"
    return norm.replace(" ", "%20")


def parse_charset(headers, meta_tags):
    """reference cdx_writer.py:140-161"""
    charset = None
    ct = parse_http_header(headers, "content-type")
    if ct is not None:
        m = _CHARSET.search(ct)
        if m:
            charset = m.group(1).decode("latin-1")
    if charset is None and meta_tags is not None:
        ct2 = meta_tags.get("content-type")
        if ct2:
            m = _CHARSET.search(ct2.encode("latin-1"))
            if m:
                charset = m.group(1).decode("latin-1")
    if charset:
        charset = charset.replace("win-", "windows-")
    return charset


def compute_fields(rec: Record, warc_path: str, screenshot_mode: bool = False) -> dict:
    """All 11 CDX fields for one record, as the reference's per-record
    dispatch loop computes them (cdx_writer.py:672-699)."""
    headers, content = parse_headers_and_content(rec, screenshot_mode)
    mime = get_mime_type(rec, headers, screenshot_mode)
    meta_tags = parse_meta_tags(rec, mime, content)
    return {
        "N": get_massaged_url(rec, warc_path, screenshot_mode),
        "b": get_date(rec.date_raw),
        "a": get_original_url(rec, warc_path, screenshot_mode),
        "m": mime,
        "s": get_response_code(rec),
        "k": get_new_style_checksum(rec, content),
        "r": "-",  # by design (reference cdx_writer.py:549-555)
        "M": get_aif_meta_tags(rec, headers, meta_tags),
        "S": str(rec.compressed_size) if rec.compressed_size is not None else "-",
        "V": str(rec.offset),
        "g": warc_path,
    }


def cdx_line(fields: dict, fmt: str = CDX_DEFAULT_FORMAT) -> str:
    """Space-join the requested fields (reference cdx_writer.py:683-699)."""
    return " ".join(fields[f] for f in fmt.split()).rstrip()
