"""Minimal WARC/ARC record reader (replaces the reference's external
``warctools`` dependency; behavior pinned by the reference fixtures at
/root/reference/tests/*.{warc,arc}[.gz] and the golden CDX lines).

Yields one :class:`Record` per archive record with the same observable
surface the reference engine consumes (reference ``cdx_writer.py:654-668``):

* ``offset``          — compressed byte offset of the record (gzip member
                        start for ``.gz``, raw byte offset otherwise)
* ``compressed_size`` — gzip member span for ``.gz``; raw record size minus
                        the trailing separator otherwise
* ``record_type``     — warc type, or ``response``/``filedesc`` for ARC
* ``url`` (bytes), ``date_raw`` (str), ``content_type`` (bytes|None)
* ``content_length_hdr`` — the *declared* Content-Length / ARC length field
                        (may be negative: live-web-proxy artifacts)
* ``payload`` (bytes) — record block
* ``headers``         — record-level headers (WARC) as {lower-name: value}

ARC quirks handled (each pinned by a golden fixture):
  - transposed date/IP fields                  (transposed_header.arc.gz)
  - literal spaces in the URL, rejoined %20    (spaces_in_url.arc.gz)
  - spaces inside the content-type field       (alexa_charset_in_header.arc.gz)
  - missing (empty) content-type field         (alexa_short_header.arc.gz)
  - negative declared length, missing payload  (negative_content_length.arc.gz)
  - v2 field declaration over v1 records       (arc_v1_with_v2_header.arc.gz)
  - 12/16/18-digit and hex date fields         (passed through raw)
"""

from __future__ import annotations

import re
import zlib
from dataclasses import dataclass, field

__all__ = ["Record", "ParseError", "read_archive", "parse_archive_bytes",
           "stream_archive_records"]


class ParseError(Exception):
    """Strict-mode parse failure.  The reference aborts the whole run on
    record-level parse errors (cdx_writer.py:30-31,702-705: ``elif errors:
    raise ParseError``); lenient mode (the default here) skips malformed
    tails/members instead — pass ``strict=True`` for reference parity."""

_IP_RE = re.compile(rb"^\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}$")
_DIGITS_RE = re.compile(rb"^-?\d+$")
_GZIP_MAGIC = b"\x1f\x8b"


@dataclass
class Record:
    filename: str
    record_idx: int
    offset: int
    compressed_size: int | None
    record_type: str
    url: bytes | None
    date_raw: str | None
    content_type: bytes | None
    content_length_hdr: int | None
    payload: bytes
    headers: dict = field(default_factory=dict)

    def get_header(self, name: str) -> str | None:
        return self.headers.get(name.lower())


def _gzip_members(data: bytes, strict: bool = False):
    """Split a multi-member gzip blob into (offset, compressed_size, bytes)."""
    pos, n = 0, len(data)
    while pos < n:
        if data[pos: pos + 2] != _GZIP_MAGIC:
            raise ValueError("not a gzip member at offset %d" % pos)
        d = zlib.decompressobj(47)
        chunk = d.decompress(data[pos:])
        tail = d.flush()
        if tail:
            chunk += tail
        if strict and not d.eof:
            raise ParseError("truncated gzip member at offset %d" % pos)
        consumed = (n - pos) - len(d.unused_data)
        yield pos, consumed, chunk
        pos += consumed


# ---------------------------------------------------------------- ARC ----

def _parse_arc_header_line(line: bytes):
    """Return (url, date, content_type, declared_length) from an ARC record
    header line, tolerating the fixture pathologies documented above."""
    f = line.split(b" ")
    if len(f) < 5:
        # pad: treat missing fields as empty (very short headers)
        f = f + [b""] * (5 - len(f))
    if _IP_RE.match(f[1]):
        url, date, rest = f[0], f[2], f[3:]
    elif _DIGITS_RE.match(f[1]) and len(f[1]) >= 12 and _IP_RE.match(f[2]):
        # transposed date/IP
        url, date, rest = f[0], f[1], f[3:]
    else:
        # literal spaces in the URL: consume fields until the IP
        ip_i = None
        for i in range(1, len(f) - 2):
            if _IP_RE.match(f[i]):
                ip_i = i
                break
        if ip_i is None:
            url, date, rest = f[0], f[2] if len(f) > 2 else b"", f[3:]
        else:
            url = b"%20".join(f[:ip_i])
            date = f[ip_i + 1] if ip_i + 1 < len(f) else b""
            rest = f[ip_i + 2:]
    if len(rest) == 7 and _DIGITS_RE.match(rest[-1]) and _DIGITS_RE.match(rest[1]):
        # ARC v2: content-type result-code checksum location offset filename length
        ctype, length_s = rest[0], rest[-1]
    else:
        length_s = rest[-1] if rest else b"0"
        ctype = b" ".join(rest[:-1])
    try:
        length = int(length_s)
    except ValueError:
        length = 0
    return url, date.decode("latin-1"), (ctype if ctype else None), length


def _parse_arc_stream(chunks, filename: str, strict: bool = False):
    """``chunks``: iterable of (offset, compressed_size|None, bytes).  For
    uncompressed input pass a single (0, None, data) chunk."""
    chunks = list(chunks)
    records = []
    ci = 0
    pending = b""          # leftover bytes within the current chunk chain
    pending_off = 0        # raw offset of `pending` start (uncompressed mode)
    idx = 0
    compressed = chunks and chunks[0][1] is not None

    def emit(url, date, ctype, length, payload, offset, csize):
        nonlocal idx
        rtype = "filedesc" if url.startswith(b"filedesc:") else "response"
        if ctype is not None:
            # warctools normalizes the ARC content-type field: parameters
            # after ';' are dropped (golden alexa_charset_in_header.arc.gz)
            ctype = ctype.split(b";")[0].strip() or None
        if rtype == "filedesc":
            # warctools consumes the filedesc body as file metadata and
            # exposes empty record content (golden: filedesc checksum is
            # the sha1 of b'' in tests/test_excludes.py outputs)
            payload = b""
        records.append(Record(
            filename=filename, record_idx=idx, offset=offset,
            compressed_size=csize, record_type=rtype, url=url,
            date_raw=date, content_type=ctype, content_length_hdr=length,
            payload=payload,
            headers={"content-length": str(length)},
        ))
        idx += 1

    if compressed:
        while ci < len(chunks):
            start_ci = ci
            buf = chunks[ci][2]
            data = buf.lstrip(b"\n")
            if not data:
                ci += 1
                continue
            nl = data.find(b"\n")
            if nl < 0:
                nl = len(data)
            url, date, ctype, length = _parse_arc_header_line(data[:nl])
            want = max(length, 0)
            body_start = nl + 1
            while len(data) < body_start + want and ci + 1 < len(chunks):
                ci += 1
                data += chunks[ci][2]
            if strict and len(data) < body_start + want:
                raise ParseError(
                    "truncated ARC record at offset %d: declared %d, got %d"
                    % (chunks[start_ci][0], want, len(data) - body_start))
            payload = data[body_start: body_start + want]
            offset = chunks[start_ci][0]
            csize = sum(chunks[i][1] for i in range(start_ci, ci + 1))
            emit(url, date, ctype, length, payload, offset, csize)
            ci += 1
    else:
        data = chunks[0][2] if chunks else b""
        pos = 0
        n = len(data)
        while pos < n:
            while pos < n and data[pos: pos + 1] == b"\n":
                pos += 1
            if pos >= n:
                break
            nl = data.find(b"\n", pos)
            if nl < 0:
                nl = n
            url, date, ctype, length = _parse_arc_header_line(data[pos:nl])
            want = max(length, 0)
            body_start = nl + 1
            payload = data[body_start: body_start + want]
            if strict and len(payload) < want:
                raise ParseError(
                    "truncated ARC record at offset %d: declared %d, got %d"
                    % (pos, want, len(payload)))
            size = (body_start - pos) + want
            emit(url, date, ctype, length, payload, pos, size)
            pos = body_start + want
    return records


# --------------------------------------------------------------- WARC ----

def _parse_warc_block(data: bytes, pos: int):
    """Parse one WARC record starting at ``pos``.  Returns
    (headers dict, payload, end_of_payload, next_pos) or None."""
    m = re.compile(rb"WARC/\d+\.\d+\r?\n").match(data, pos)
    if not m:
        return None
    hdr_end = data.find(b"\r\n\r\n", m.end())
    sep = 4
    hdr_end_n = data.find(b"\n\n", m.end())
    if hdr_end < 0 or (0 <= hdr_end_n < hdr_end):
        hdr_end, sep = hdr_end_n, 2
    if hdr_end < 0:
        return None
    headers: dict[str, str] = {}
    for line in data[m.end(): hdr_end].split(b"\n"):
        line = line.rstrip(b"\r")
        if b":" in line:
            k, v = line.split(b":", 1)
            headers[k.strip().lower().decode("latin-1")] = (
                v.strip().decode("latin-1"))
    try:
        clen = int(headers.get("content-length", "0"))
    except ValueError:
        clen = 0
    body_start = hdr_end + sep
    payload = data[body_start: body_start + max(clen, 0)]
    end_of_payload = body_start + max(clen, 0)
    nxt = end_of_payload
    while data[nxt: nxt + 2] in (b"\r\n",) or data[nxt: nxt + 1] == b"\n":
        nxt += 2 if data[nxt: nxt + 2] == b"\r\n" else 1
    return headers, payload, end_of_payload, nxt


def _warc_record_from(headers, payload, filename, idx, offset, csize):
    url = headers.get("warc-target-uri")
    return Record(
        filename=filename, record_idx=idx, offset=offset,
        compressed_size=csize,
        record_type=headers.get("warc-type", ""),
        url=url.encode("latin-1") if url is not None else None,
        date_raw=headers.get("warc-date"),
        content_type=(headers.get("content-type") or "").encode("latin-1") or None,
        content_length_hdr=int(headers["content-length"])
        if re.fullmatch(r"-?\d+", headers.get("content-length", "")) else None,
        payload=payload, headers=headers,
    )


def _parse_warc_stream(chunks, filename: str, strict: bool = False):
    chunks = list(chunks)
    records = []
    idx = 0
    compressed = chunks and chunks[0][1] is not None
    if compressed:
        ci = 0
        while ci < len(chunks):
            start_ci = ci
            data = chunks[ci][2]
            parsed = _parse_warc_block(data, 0)
            # record may span gzip members (chunked-flush writers)
            while parsed is None or len(data) < parsed[2]:
                if ci + 1 >= len(chunks):
                    break
                ci += 1
                data += chunks[ci][2]
                parsed = _parse_warc_block(data, 0)
            if parsed is None:
                if strict:
                    raise ParseError("unparseable WARC member at offset %d"
                                     % chunks[start_ci][0])
                ci += 1
                continue
            if strict and len(data) < parsed[2]:
                raise ParseError("truncated WARC record at offset %d"
                                 % chunks[start_ci][0])
            headers, payload, _eop, _nxt = parsed
            offset = chunks[start_ci][0]
            csize = sum(chunks[i][1] for i in range(start_ci, ci + 1))
            records.append(_warc_record_from(headers, payload, filename, idx,
                                             offset, csize))
            idx += 1
            ci += 1
    else:
        data = chunks[0][2] if chunks else b""
        pos = 0
        while pos < len(data):
            parsed = _parse_warc_block(data, pos)
            if parsed is None:
                if strict and data[pos:].strip(b"\r\n"):
                    raise ParseError("unparseable WARC data at offset %d"
                                     % pos)
                break
            headers, payload, end_of_payload, nxt = parsed
            records.append(_warc_record_from(headers, payload, filename, idx,
                                             pos, end_of_payload - pos))
            idx += 1
            pos = nxt
    return records


# ------------------------------------------------------- streaming ----
#
# Multi-GB archives must never be materialized as one bytes object (the
# reference streams them too: /root/reference/tests/test_large_warcs.py:7-27
# runs 4 multi-GB WARCs through the same single-pass engine).  The streaming
# layer below reads fixed-size chunks from a file object, decompresses gzip
# members incrementally, and yields Records with O(record) buffering —
# byte-identical offsets/sizes to the batch parsers above (pinned by
# tests/test_warc_stream.py over every reference fixture at several chunk
# sizes).


class _HeadReader:
    """read(n) facade over (already-read head bytes ++ file object)."""

    def __init__(self, head: bytes, f):
        self._head = head
        self._f = f

    def read(self, n: int) -> bytes:
        if self._head:
            out, self._head = self._head[:n], self._head[n:]
            return bytes(out)
        return self._f.read(n)


def _gzip_members_from(reader, chunk_size: int = 1 << 20,
                       strict: bool = False):
    """Incrementally split a gzip stream into (offset, csize, plain_bytes)
    members.  Buffers at most one chunk + one decompressed member."""
    buf = reader.read(chunk_size)
    file_pos = 0
    while buf:
        while len(buf) < 2:
            nb = reader.read(chunk_size)
            if not nb:
                break
            buf += nb
        if buf[:2] != _GZIP_MAGIC:
            raise ValueError("not a gzip member at offset %d" % file_pos)
        member_start = file_pos
        d = zlib.decompressobj(47)
        out = []
        while True:
            out.append(d.decompress(buf))
            if d.eof:
                tail = d.flush()
                if tail:
                    out.append(tail)
                unused = d.unused_data
                file_pos += len(buf) - len(unused)
                yield member_start, file_pos - member_start, b"".join(out)
                buf = unused or reader.read(chunk_size)
                break
            file_pos += len(buf)
            buf = reader.read(chunk_size)
            if not buf:
                if strict:
                    raise ParseError("truncated gzip member at offset %d"
                                     % member_start)
                tail = d.flush()
                if tail:
                    out.append(tail)
                # truncated trailing member: surface what decompressed
                yield member_start, file_pos - member_start, b"".join(out)
                return


def _iter_warc_compressed(members, filename: str, strict: bool = False):
    """Streaming twin of the compressed branch of _parse_warc_stream."""
    idx = 0
    cur = None  # [start_offset, csize_sum, data]
    parsed = None
    for off, csize, data in members:
        if cur is None:
            cur = [off, csize, data]
        else:
            cur[1] += csize
            cur[2] += data
        parsed = _parse_warc_block(cur[2], 0)
        if parsed is None or len(cur[2]) < parsed[2]:
            continue  # record spans members (chunked-flush writers)
        headers, payload, _eop, _nxt = parsed
        yield _warc_record_from(headers, payload, filename, idx,
                                cur[0], cur[1])
        idx += 1
        cur = None
        parsed = None
    if cur is not None:
        if strict:
            raise ParseError("unparseable/truncated WARC member at offset %d"
                             % cur[0])
        if parsed is not None:
            # truncated trailing record — the batch parser emits it too
            headers, payload, _eop, _nxt = parsed
            yield _warc_record_from(headers, payload, filename, idx,
                                    cur[0], cur[1])


def _iter_arc_compressed(members, filename: str, strict: bool = False):
    """Streaming twin of the compressed branch of _parse_arc_stream."""
    idx = 0
    cur = None  # [start_offset, csize_sum, data, url, date, ctype, length]

    def build(url, date, ctype, length, payload, offset, csize, i):
        rtype = "filedesc" if url.startswith(b"filedesc:") else "response"
        if ctype is not None:
            ctype = ctype.split(b";")[0].strip() or None
        if rtype == "filedesc":
            payload = b""
        return Record(
            filename=filename, record_idx=i, offset=offset,
            compressed_size=csize, record_type=rtype, url=url,
            date_raw=date, content_type=ctype, content_length_hdr=length,
            payload=payload, headers={"content-length": str(length)})

    for off, csize, chunk in members:
        if cur is None:
            data = chunk.lstrip(b"\n")
            if not data:
                continue
            nl = data.find(b"\n")
            if nl < 0:
                nl = len(data)
            url, date, ctype, length = _parse_arc_header_line(data[:nl])
            cur = [off, csize, data, url, date, ctype, length, nl + 1]
        else:
            cur[1] += csize
            cur[2] += chunk
        _off, _cs, data, url, date, ctype, length, body_start = cur
        want = max(length, 0)
        if len(data) < body_start + want:
            continue  # payload spans members
        yield build(url, date, ctype, length,
                    data[body_start: body_start + want],
                    cur[0], cur[1], idx)
        idx += 1
        cur = None
    if cur is not None:
        _off, _cs, data, url, date, ctype, length, body_start = cur
        want = max(length, 0)
        if strict and len(data) < body_start + want:
            raise ParseError(
                "truncated ARC record at offset %d: declared %d, got %d"
                % (cur[0], want, len(data) - body_start))
        yield build(url, date, ctype, length,
                    data[body_start: body_start + want],
                    cur[0], cur[1], idx)


def _iter_warc_raw(reader, filename: str, chunk_size: int = 1 << 20,
                   strict: bool = False):
    """Streaming twin of the uncompressed branch of _parse_warc_stream:
    rolling buffer holding at most one record + one read chunk.  The batch
    parser consumes inter-record newline runs via ``nxt``; here separator
    bytes may arrive in a later chunk, so leading newlines are skipped
    explicitly before each parse."""
    buf = b""
    base = 0            # absolute file offset of buf[0]
    idx = 0
    eof = False
    while True:
        i = 0
        while i < len(buf) and (buf[i: i + 1] == b"\n"
                                or buf[i: i + 2] == b"\r\n"):
            i += 2 if buf[i: i + 2] == b"\r\n" else 1
        if i:
            buf = buf[i:]
            base += i
        if buf == b"\r" and not eof:
            # could be the first half of a CRLF separator
            nb = reader.read(chunk_size)
            if nb:
                buf += nb
                continue
            eof = True
        parsed = _parse_warc_block(buf, 0) if buf else None
        need_more = parsed is None or len(buf) < parsed[2]
        if need_more and not eof:
            nb = reader.read(chunk_size)
            if nb:
                buf += nb
                continue
            eof = True
            parsed = _parse_warc_block(buf, 0) if buf else None
        if parsed is None:
            if strict and buf.strip(b"\r\n"):
                raise ParseError("unparseable WARC data at offset %d" % base)
            return  # batch parser breaks on unparseable position too
        headers, payload, end_of_payload, nxt = parsed
        yield _warc_record_from(headers, payload, filename, idx, base,
                                end_of_payload)
        idx += 1
        buf = buf[nxt:]
        base += nxt
        if not buf and eof:
            return


def _iter_arc_raw(reader, filename: str, chunk_size: int = 1 << 20,
                  strict: bool = False):
    """Streaming twin of the uncompressed branch of _parse_arc_stream."""
    buf = b""
    base = 0
    idx = 0
    eof = False
    while True:
        # skip inter-record newlines
        i = 0
        while i < len(buf) and buf[i: i + 1] == b"\n":
            i += 1
        if i:
            buf = buf[i:]
            base += i
        nl = buf.find(b"\n")
        if (not buf or nl < 0) and not eof:
            nb = reader.read(chunk_size)
            if nb:
                buf += nb
                continue
            eof = True
            nl = buf.find(b"\n")
        if not buf:
            return
        if nl < 0:
            nl = len(buf)
        url, date, ctype, length = _parse_arc_header_line(buf[:nl])
        want = max(length, 0)
        body_start = nl + 1
        while len(buf) < body_start + want and not eof:
            nb = reader.read(chunk_size)
            if nb:
                buf += nb
            else:
                eof = True
        payload = buf[body_start: body_start + want]
        if strict and len(payload) < want:
            raise ParseError(
                "truncated ARC record at offset %d: declared %d, got %d"
                % (base, want, len(payload)))
        rtype = "filedesc" if url.startswith(b"filedesc:") else "response"
        if ctype is not None:
            ctype = ctype.split(b";")[0].strip() or None
        if rtype == "filedesc":
            payload = b""
        yield Record(
            filename=filename, record_idx=idx, offset=base,
            compressed_size=(body_start - 0) + want,
            record_type=rtype, url=url, date_raw=date, content_type=ctype,
            content_length_hdr=length, payload=payload,
            headers={"content-length": str(length)})
        idx += 1
        buf = buf[body_start + want:]
        base += body_start + want
        if not buf and eof:
            return


def stream_archive_records(f, filename: str, chunk_size: int = 1 << 20,
                           strict: bool = False):
    """Yield Records from an open binary file object with O(record) memory
    (gzip auto-detected, WARC/ARC auto-sniffed — same observable behavior
    as :func:`parse_archive_bytes`, which materializes the whole file).

    This is the kernel behind the path-distributing Spark source for
    multi-GB archives (sources/warc.py): the 2 GiB Arrow single-cell limit
    and O(file) executor memory of ``binaryFile`` never apply because file
    bytes stay on the executor-local read path.

    ``strict=True`` raises :class:`ParseError` on malformed/truncated
    input instead of skipping it (reference cdx_writer.py:702-705)."""
    head = f.read(chunk_size)
    if not head:
        return iter(())
    reader = _HeadReader(head, f)
    if head[:2] == _GZIP_MAGIC:
        members = _gzip_members_from(reader, chunk_size, strict=strict)
        try:
            first = next(members)
        except StopIteration:
            return iter(())
        import itertools
        rest = itertools.chain([first], members)
        if first[2][:64].startswith(b"WARC/"):
            return _iter_warc_compressed(rest, filename, strict=strict)
        return _iter_arc_compressed(rest, filename, strict=strict)
    if head[:64].startswith(b"WARC/"):
        return _iter_warc_raw(reader, filename, chunk_size, strict=strict)
    return _iter_arc_raw(reader, filename, chunk_size, strict=strict)


# ---------------------------------------------------------------- API ----

def parse_archive_bytes(data: bytes, filename: str,
                        strict: bool = False) -> list[Record]:
    """Parse a whole WARC/ARC file given as bytes (gzip auto-detected —
    mirrors the reference's ``open_archive(..., gzip='auto')``,
    cdx_writer.py:654).  ``strict=True`` raises :class:`ParseError` on
    malformed/truncated input (reference parity; default is lenient
    skip)."""
    if data[:2] == _GZIP_MAGIC:
        chunks = list(_gzip_members(data, strict=strict))
        head = chunks[0][2][:64] if chunks else b""
    else:
        chunks = [(0, None, data)]
        head = data[:64]
    if head.startswith(b"WARC/"):
        return _parse_warc_stream(chunks, filename, strict=strict)
    return _parse_arc_stream(chunks, filename, strict=strict)


def read_archive(path: str, filename: str | None = None,
                 strict: bool = False) -> list[Record]:
    with open(path, "rb") as f:
        data = f.read()
    if filename is None:
        filename = path
    return parse_archive_bytes(data, filename, strict=strict)
