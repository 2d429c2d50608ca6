"""WARC/ARC → ``warc_records`` DataFrame source.

Spark-first shape (SURVEY.md §2.1 S1/S2): ``spark.read.format('binaryFile')``
scans archive files in parallel (one task per file — WARC gzip members are
not splittable mid-file, the same unit of parallelism the reference used:
one process per WARC), then an Arrow ``mapInPandas`` splits each file into
records with byte offsets / compressed sizes using the pure-Python kernel
``kernels.warcrec.parse_archive_bytes``.

The resulting envelope schema is FIXTURES.md §1.  Non-UTF-8-safe byte
fields (``url_raw``, ``payload``, ``content_type``) are ``binary`` so they
survive parquet round-trips losslessly.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

__all__ = ["WARC_RECORDS_SCHEMA", "read_warc_records", "records_to_rows"]

WARC_RECORDS_SCHEMA = T.StructType([
    T.StructField("filename", T.StringType()),
    T.StructField("record_idx", T.IntegerType()),
    T.StructField("offset", T.LongType()),
    T.StructField("compressed_size", T.LongType()),
    T.StructField("record_type", T.StringType()),
    T.StructField("url_raw", T.BinaryType()),
    T.StructField("date_raw", T.StringType()),
    T.StructField("content_type", T.BinaryType()),
    T.StructField("content_length_hdr", T.LongType()),
    T.StructField("payload", T.BinaryType()),
    T.StructField("payload_digest", T.StringType()),
    T.StructField("sfps", T.StringType()),          # WARC-Simple-Form-Province-Status
])


def records_to_rows(records) -> list[dict]:
    """kernels.warcrec.Record -> plain dicts matching WARC_RECORDS_SCHEMA."""
    rows = []
    for r in records:
        rows.append({
            "filename": r.filename,
            "record_idx": r.record_idx,
            "offset": r.offset,
            "compressed_size": r.compressed_size,
            "record_type": r.record_type,
            "url_raw": r.url,
            "date_raw": r.date_raw,
            "content_type": r.content_type,
            "content_length_hdr": r.content_length_hdr,
            "payload": r.payload,
            "payload_digest": r.get_header("WARC-Payload-Digest"),
            "sfps": r.get_header("WARC-Simple-Form-Province-Status"),
        })
    return rows


def read_warc_records(spark: SparkSession, path: str | list[str],
                      use_full_path: bool = False) -> DataFrame:
    """Scan archive file(s) into the warc_records envelope.

    ``use_full_path`` mirrors the reference's --use-full-path: keep the whole
    path in ``filename`` instead of the basename (cdx_writer.py:75-80)."""
    binary = spark.read.format("binaryFile").load(path)

    def split_files(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # import inside the task so executors resolve the shipped package
        from cdx_writer_spark.kernels.warcrec import parse_archive_bytes
        cols = [f.name for f in WARC_RECORDS_SCHEMA.fields]
        for pdf in batches:
            for path_, content in zip(pdf["path"], pdf["content"]):
                local = path_
                if local.startswith("file:"):
                    local = local[len("file:"):]
                name = local if use_full_path else os.path.basename(local)
                recs = parse_archive_bytes(bytes(content), name)
                rows = records_to_rows(recs)
                yield pd.DataFrame(rows, columns=cols) if rows else \
                    pd.DataFrame({c: [] for c in cols})

    return binary.select("path", "content").mapInPandas(
        split_files, WARC_RECORDS_SCHEMA)
