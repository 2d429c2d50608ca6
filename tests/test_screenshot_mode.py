"""Screenshot-mode end-to-end pin (reference cdx_writer.py:284-286,
345-346,447-448,660-662: --screenshot-mode keeps only metadata records,
prefixes urlkey/url with http://web.archive.org/screenshot/, and takes the
mime from the record's own content-type).  The reference repo ships NO
screenshot fixture, so this synthesizes one and pins the full line for
both the kernel path and the Spark path."""

import base64
import hashlib
import zlib

from cdx_writer_spark.kernels.pipeline import make_cdx_lines
from cdx_writer_spark.kernels.warcrec import parse_archive_bytes


def _member(wtype: str, url: str, ctype: str, payload: bytes) -> bytes:
    rec = (f"WARC/1.0\r\nWARC-Type: {wtype}\r\nWARC-Target-URI: {url}\r\n"
           f"WARC-Date: 2024-01-01T00:00:00Z\r\nContent-Type: {ctype}\r\n"
           f"Content-Length: {len(payload)}\r\n\r\n").encode() \
        + payload + b"\r\n\r\n"
    co = zlib.compressobj(6, zlib.DEFLATED, 31)
    return co.compress(rec) + co.flush()


PNG_BYTES = b"\x89PNG\r\n\x1a\nfakescreenshotpayload"
M1 = _member("response", "http://example.com/Page", "application/http; msgtype=response",
             b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<html></html>")
M2 = _member("metadata", "http://example.com/Page", "image/jpeg", PNG_BYTES)
WARC_BYTES = M1 + M2

# NOTE: the urlkey's path goes through this repo's SURT kernel, which
# collapses consecutive slashes in the path (behavior pinned by the 37
# SURT goldens); the reference ships no screenshot fixture to pin the
# embedded-URL case against, so this golden pins OUR behavior.
EXPECTED_LINE = (
    "org,archive,web)/screenshot/http:/example.com/page "
    "20240101000000 "
    "http://web.archive.org/screenshot/http://example.com/Page "
    "image/jpeg - "
    + base64.b32encode(hashlib.sha1(PNG_BYTES).digest()).decode()
    + " - - " + str(len(M2)) + " " + str(len(M1)) + " screen.warc.gz")


def test_kernel_screenshot_mode_golden():
    records = parse_archive_bytes(WARC_BYTES, "screen.warc.gz")
    header, lines, stats = make_cdx_lines(records, "screen.warc.gz",
                                          screenshot_mode=True)
    assert header == " CDX N b a m s k r M S V g"
    assert lines == [EXPECTED_LINE]
    # both records were read; only the metadata record is emitted
    assert stats["num_records_processed"] == 2
    assert stats["num_records_included"] == 1
    assert stats["num_records_filtered"] == 0


def test_spark_screenshot_mode_matches_kernel(spark, tmp_path):
    from cdx_writer_spark.operators.cdx import cdx_fields, cdx_lines
    from cdx_writer_spark.sources.warc import read_warc_records
    path = tmp_path / "screen.warc.gz"
    path.write_bytes(WARC_BYTES)
    recs = read_warc_records(spark, str(path))
    out = cdx_lines(cdx_fields(recs, screenshot_mode=True), sort=True)
    got = [r["cdx_line"] for r in out.collect()]
    assert got == [EXPECTED_LINE]


def test_cli_screenshot_mode(tmp_path, capsys, monkeypatch):
    """--screenshot-mode end-to-end through the CLI (reference
    cdx_writer.py:733): same line the kernel and operator paths pin."""
    from cdx_writer_spark import cli
    path = tmp_path / "screen.warc.gz"
    path.write_bytes(WARC_BYTES)
    cli.main(["--screenshot-mode", "--sort", str(path)])
    out = capsys.readouterr().out.splitlines()
    assert out[0] == " CDX N b a m s k r M S V g"
    assert out[1:] == [EXPECTED_LINE]
