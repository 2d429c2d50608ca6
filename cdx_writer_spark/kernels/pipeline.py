"""Local (single-process) CDX pipeline over parsed records.

This is the reference's ``make_cdx`` loop (cdx_writer.py:638-712) expressed
as a pure function — the same filters / projections the Spark operators in
``cdx_writer_spark.operators.cdx`` run distributed.  Kept separate so the
golden fixtures can pin behavior without a JVM, and so the Spark pipeline
can be asserted equal to it.
"""

from __future__ import annotations

from .fields import CDX_DEFAULT_FORMAT, cdx_line, compute_fields
from .surt import surt
from .warcrec import Record, read_archive

__all__ = ["make_cdx_lines", "load_excludes", "make_cdx_for_file"]

ALLOWED_RECORD_TYPES = {"response", "revisit"}
DISALLOWED_CONTENT_TYPES = {b"text/dns"}


def load_excludes(text: str) -> list[str]:
    """SURT-canonicalize an exclude list (reference cdx_writer.py:82-93):
    skip blank lines, first whitespace token per line."""
    out = []
    for line in text.splitlines():
        if line.strip() == "":
            continue
        out.append(surt(line.split()[0]))
    return out


def make_cdx_lines(records: list[Record], warc_path: str, *,
                   fmt: str = CDX_DEFAULT_FORMAT, all_records: bool = False,
                   screenshot_mode: bool = False,
                   excludes: list[str] | None = None):
    """Returns (header_line, [cdx lines], stats dict) — the exact observable
    output of the reference CLI."""
    stats = {"num_records_processed": 0, "num_records_included": 0,
             "num_records_filtered": 0}
    lines: list[str] = []
    for rec in records:
        stats["num_records_processed"] += 1
        if screenshot_mode:
            if rec.record_type != "metadata":
                continue
        elif not all_records and (
                rec.record_type not in ALLOWED_RECORD_TYPES
                or rec.content_type in DISALLOWED_CONTENT_TYPES):
            continue
        if rec.content_length_hdr is not None and rec.content_length_hdr < 0:
            continue
        fields = compute_fields(rec, warc_path, screenshot_mode)
        if excludes and any(fields["N"].startswith(p) for p in excludes):
            stats["num_records_filtered"] += 1
            continue
        lines.append(cdx_line(fields, fmt))
        stats["num_records_included"] += 1
    header = " CDX " + fmt
    return header, lines, stats


def make_cdx_for_file(path: str, warc_path: str | None = None,
                      strict: bool = False, **kw):
    import os
    if warc_path is None:
        warc_path = os.path.basename(path)
    records = read_archive(path, filename=warc_path, strict=strict)
    return make_cdx_lines(records, warc_path, **kw)
