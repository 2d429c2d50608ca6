"""Structured Streaming transport for the CDX indexing pipeline.

The reference processes one archive file as a bounded single-pass stream
(cdx_writer.py:654-705); at fleet scale new WARCs land continuously, so the
natural Spark form is a file-source stream: each micro-batch is a set of
newly-arrived ``warc_records`` parquet files pushed through the SAME
declarative ``cdx_fields`` plan used in batch — zero operator changes,
because the CDX map is stateless per record (no watermark/state needed) and
shuffle-free (PLANS.md), so it runs in append mode at whatever rate files
arrive.  Exactly-once comes from the file-source + checkpoint contract
WITH a fault-tolerant (file/table) sink — :func:`run_cdx_stream_to_files`
is that path: a crashed run replays only uncommitted micro-batches and
the sink commits atomically per batch.  :func:`run_cdx_stream` (memory
sink) is a test/drain helper only: the in-memory table is not
fault-tolerant, so restarting it against an old checkpoint would skip
committed batches the empty table never held.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.cdx import cdx_fields, cdx_lines
from ..sources.warc import WARC_RECORDS_SCHEMA

__all__ = ["stream_warc_records", "stream_cdx_lines", "run_cdx_stream",
           "run_cdx_stream_to_files"]


def stream_warc_records(spark: SparkSession, path: str,
                        max_files_per_trigger: int = 8) -> DataFrame:
    """File-source stream over a directory where warc_records parquet files
    arrive (the output of the distributed WARC parse stage)."""
    return (spark.readStream.schema(WARC_RECORDS_SCHEMA)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(path))


def stream_cdx_lines(records: DataFrame, *, all_records: bool = False,
                     excludes: list[str] | None = None,
                     fmt: str = "N b a m s k r M S V g") -> DataFrame:
    """The batch CDX plan bound to a streaming input.  No sort (a global
    order is undefined on an unbounded stream — CDX convention sorting
    happens at file-assembly/compaction time, exactly like the reference's
    external Unix sort, cdx_writer.py:641)."""
    return cdx_lines(cdx_fields(records, all_records=all_records,
                                excludes=excludes), fmt=fmt, sort=False)


def run_cdx_stream(lines: DataFrame, checkpoint: str, name: str) -> None:
    """TEST/DRAIN HELPER: drain all currently-available input into a
    memory sink (append mode).  NOT exactly-once across restarts — the
    in-memory table is lost with the process while the checkpoint
    advances; use :func:`run_cdx_stream_to_files` for the durable path."""
    q = (lines.writeStream.format("memory").queryName(name)
         .outputMode("append")
         .option("checkpointLocation", checkpoint)
         .trigger(availableNow=True).start())
    q.awaitTermination()


def run_cdx_stream_to_files(lines: DataFrame, checkpoint: str,
                            out_dir: str) -> None:
    """Exactly-once production path: parquet file sink + checkpoint.
    Restarting after a crash replays only micro-batches whose commits are
    missing from the sink's own log — no row is lost or duplicated."""
    q = (lines.writeStream.format("parquet")
         .option("path", out_dir)
         .outputMode("append")
         .option("checkpointLocation", checkpoint)
         .trigger(availableNow=True).start())
    q.awaitTermination()
