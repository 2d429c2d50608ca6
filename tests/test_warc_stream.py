"""Streaming large-WARC source: the incremental kernel must be
byte-identical to the batch parser on every reference fixture, must
stream with O(record) memory (records come out before the file is fully
read), and the Spark source must index a >2 GiB archive — the size class
the reference's large-WARC layer handles
(/root/reference/tests/test_large_warcs.py:7-27) and the old
binaryFile-based source could not (2 GiB single-cell Arrow limit)."""

import glob
import gzip
import hashlib
import io
import zlib

import pytest

from cdx_writer_spark.kernels.warcrec import (parse_archive_bytes,
                                              stream_archive_records)

FIXTURES = sorted(
    f for f in set(glob.glob("/root/reference/tests/*.warc")
                   + glob.glob("/root/reference/tests/*.arc")
                   + glob.glob("/root/reference/tests/*.warc.gz")
                   + glob.glob("/root/reference/tests/*.arc.gz"))
    if not f.endswith(".cdx.gz"))


def _key(r):
    return (r.record_idx, r.offset, r.compressed_size, r.record_type,
            r.url, r.date_raw, r.content_type, r.content_length_hdr,
            r.payload, tuple(sorted(r.headers.items())))


@pytest.mark.parametrize("chunk_size", [7, 1024, 1 << 20])
def test_stream_equals_batch_on_all_fixtures(chunk_size):
    assert len(FIXTURES) >= 30
    for path in FIXTURES:
        with open(path, "rb") as f:
            data = f.read()
        batch = [_key(r) for r in parse_archive_bytes(data, "x")]
        stream = [_key(r) for r in
                  stream_archive_records(io.BytesIO(data), "x",
                                         chunk_size=chunk_size)]
        assert stream == batch, path


class _CountingReader:
    def __init__(self, data):
        self._b = io.BytesIO(data)
        self.read_bytes = 0

    def read(self, n):
        out = self._b.read(n)
        self.read_bytes += len(out)
        return out


def _det_bytes(n: int, seed: bytes = b"s") -> bytes:
    out = bytearray()
    h = seed
    while len(out) < n:
        h = hashlib.sha256(h).digest()
        out += h
    return bytes(out[:n])


def _warc_member(payload: bytes, url: str, level: int = 0) -> bytes:
    body = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + payload)
    rec = (b"WARC/1.0\r\n"
           b"WARC-Type: response\r\n"
           b"WARC-Target-URI: " + url.encode() + b"\r\n"
           b"WARC-Date: 2024-01-01T00:00:00Z\r\n"
           b"Content-Type: application/http; msgtype=response\r\n"
           b"Content-Length: " + str(len(body)).encode() + b"\r\n\r\n"
           + body + b"\r\n\r\n")
    co = zlib.compressobj(level, zlib.DEFLATED, 31)
    return co.compress(rec) + co.flush()


def test_streaming_is_incremental():
    """First record must be yielded long before the file is fully read:
    the memory bound is O(record), not O(file)."""
    members = [_warc_member(_det_bytes(64 << 10), f"http://ex.com/{i}")
               for i in range(64)]
    data = b"".join(members)
    reader = _CountingReader(data)
    gen = stream_archive_records(reader, "big.warc.gz", chunk_size=64 << 10)
    first = next(gen)
    assert first.record_type == "response"
    assert reader.read_bytes < len(data) / 4, (
        f"read {reader.read_bytes} of {len(data)} bytes for 1st of 64 recs")
    rest = list(gen)
    assert len(rest) == 63


def test_uncompressed_streaming_is_incremental():
    rec = (b"WARC/1.0\r\nWARC-Type: metadata\r\n"
           b"WARC-Target-URI: http://ex.com/\r\n"
           b"WARC-Date: 2024-01-01T00:00:00Z\r\n"
           b"Content-Length: 1000\r\n\r\n" + _det_bytes(1000) + b"\r\n\r\n")
    data = rec * 50
    reader = _CountingReader(data)
    gen = stream_archive_records(reader, "x.warc", chunk_size=2048)
    next(gen)
    assert reader.read_bytes < len(data) / 4
    assert len(list(gen)) == 49


@pytest.fixture(scope="module")
def big_warc(tmp_path_factory):
    """~2.03 GiB .warc.gz: one 8 MiB stored-block member repeated 260x
    (gzip members are independent, so repetition is valid and cheap)."""
    member = _warc_member(_det_bytes(8 << 20), "http://big.example.com/x")
    path = tmp_path_factory.mktemp("bigwarc") / "big.warc.gz"
    n = 260
    with open(path, "wb") as f:
        for _ in range(n):
            f.write(member)
    size = path.stat().st_size
    assert size > (2 << 30), f"synthesized file only {size} bytes"
    return str(path), n, len(member)


def test_spark_source_indexes_multi_gb_warc(spark, big_warc):
    """End-to-end: the path-distributing Spark source streams a >2 GiB
    archive into CDX rows with exact offsets (old binaryFile path dies at
    2 GiB with an Arrow single-cell overflow)."""
    from pyspark.sql import functions as F
    from cdx_writer_spark.sources.warc import read_warc_records
    path, n, msize = big_warc
    recs = read_warc_records(spark, path).select(
        "record_idx", "offset", "compressed_size", "record_type")
    agg = recs.agg(
        F.count("*").alias("n"),
        F.sum("compressed_size").alias("total"),
        F.min("offset").alias("first_off"),
        F.max(F.col("offset") + F.col("compressed_size")).alias("end"),
        F.sum(F.when(F.col("record_type") == "response", 1)
              .otherwise(0)).alias("responses")).collect()[0]
    assert agg["n"] == n
    assert agg["responses"] == n
    assert agg["first_off"] == 0
    assert agg["total"] == n * msize
    assert agg["end"] == n * msize


def test_gzip_fixture_via_spark_source_matches_kernel(spark):
    """The Spark source and the pure kernel agree on a real fixture."""
    from cdx_writer_spark.sources.warc import read_warc_records
    path = "/root/reference/tests/wget_ia.warc.gz"
    with open(path, "rb") as f:
        kernel = [_key(r) for r in
                  stream_archive_records(f, "wget_ia.warc.gz")]
    rows = (read_warc_records(spark, path)
            .orderBy("record_idx").collect())
    assert len(rows) == len(kernel)
    for row, k in zip(rows, kernel):
        assert (row["record_idx"], row["offset"],
                row["compressed_size"]) == k[:3]


# ------------------------------------------------------- strict mode ----

def test_strict_mode_raises_on_truncated_gzip():
    from cdx_writer_spark.kernels.warcrec import ParseError
    member = _warc_member(_det_bytes(4096), "http://ex.com/a", level=6)
    data = member + member[: len(member) // 2]
    # lenient: parses what it can
    lenient = list(stream_archive_records(io.BytesIO(data), "x"))
    assert len(lenient) >= 1
    assert parse_archive_bytes(data, "x")  # batch lenient too
    with pytest.raises(ParseError):
        list(stream_archive_records(io.BytesIO(data), "x", strict=True))
    with pytest.raises(ParseError):
        parse_archive_bytes(data, "x", strict=True)


def test_strict_mode_raises_on_junk_tail():
    from cdx_writer_spark.kernels.warcrec import ParseError
    rec = (b"WARC/1.0\r\nWARC-Type: metadata\r\n"
           b"WARC-Target-URI: http://ex.com/\r\n"
           b"WARC-Date: 2024-01-01T00:00:00Z\r\n"
           b"Content-Length: 10\r\n\r\n" + b"0123456789" + b"\r\n\r\n")
    data = rec + b"NOT A WARC RECORD AT ALL"
    assert len(parse_archive_bytes(data, "x")) == 1  # lenient skips tail
    assert len(list(stream_archive_records(io.BytesIO(data), "x"))) == 1
    with pytest.raises(ParseError):
        parse_archive_bytes(data, "x", strict=True)
    with pytest.raises(ParseError):
        list(stream_archive_records(io.BytesIO(data), "x", strict=True))


def test_strict_mode_accepts_all_reference_fixtures():
    """Every reference fixture is structurally well-formed: strict parsing
    must yield exactly the lenient records."""
    for path in FIXTURES:
        with open(path, "rb") as f:
            data = f.read()
        lenient = [_key(r) for r in parse_archive_bytes(data, "x")]
        strict = [_key(r) for r in parse_archive_bytes(data, "x",
                                                       strict=True)]
        assert strict == lenient, path


def test_spark_source_strict_mode(spark, tmp_path):
    """strict=True threads through the Spark source: a corrupt archive
    fails the job instead of silently skipping the bad tail."""
    from cdx_writer_spark.sources.warc import read_warc_records
    good = _warc_member(_det_bytes(1024), "http://ex.com/ok")
    corrupt = tmp_path / "corrupt.warc.gz"
    corrupt.write_bytes(good + good[: len(good) // 2])
    # lenient: parses the intact record
    assert read_warc_records(spark, str(corrupt)).count() >= 1
    with pytest.raises(Exception) as ei:
        read_warc_records(spark, str(corrupt), strict=True).count()
    assert "truncated" in str(ei.value) or "ParseError" in str(ei.value)
