"""Distributed == local: the Spark CDX pipeline must produce exactly the
lines the (golden-pinned) kernel pipeline produces, for every reference
fixture file, including excludes and stats parity."""

import glob
import os

from pyspark.sql import functions as F

from cdx_writer_spark.kernels.pipeline import (load_excludes, make_cdx_for_file)
from cdx_writer_spark.operators.cdx import cdx_fields, cdx_lines
from cdx_writer_spark.sources.warc import read_warc_records

FIXTURE_DIR = "/root/reference/tests"


def fixture_files():
    pats = ["*.warc.gz", "*.arc.gz", "*.warc", "*.arc"]
    out = []
    for p in pats:
        out += glob.glob(os.path.join(FIXTURE_DIR, p))
    return sorted(out)


def test_spark_cdx_matches_kernel_pipeline(spark):
    files = fixture_files()
    assert len(files) >= 30
    records = read_warc_records(spark, files)
    fields = cdx_fields(records, all_records=True)
    got = {}
    from cdx_writer_spark.operators.cdx import FIELD_COLUMNS
    cols = [FIELD_COLUMNS[f] for f in "N b a m s k r M S V g".split()]
    rows = (fields.withColumn("line", F.rtrim(F.concat_ws(" ", *cols)))
            .select("warc_name", "record_idx", "line")
            .collect())
    for r in sorted(rows, key=lambda r: (r["warc_name"], r["record_idx"])):
        got.setdefault(r["warc_name"], []).append(r["line"])

    for path in files:
        name = os.path.basename(path)
        _h, expected, _st = make_cdx_for_file(path, warc_path=name,
                                              all_records=True)
        assert got.get(name, []) == expected, f"mismatch for {name}"


def test_spark_excludes_and_stats(spark):
    path = os.path.join(FIXTURE_DIR, "uncompressed.arc")
    excludes = load_excludes("http://www.sueddeutsche.de\n\nhttp://art.rolo.vn/a/\n")
    records = read_warc_records(spark, path)
    flagged = cdx_fields(records, all_records=True, excludes=excludes,
                         keep_excluded_flag=True)
    agg = flagged.agg(
        F.count("*").alias("processed"),
        F.sum(F.when(F.col("excluded"), 1).otherwise(0)).alias("filtered"),
    ).collect()[0]
    assert agg["filtered"] == 2
    kept = [r["cdx_line"] for r in
            cdx_lines(flagged.filter(~F.col("excluded"))).collect()]
    _h, expected, stats = make_cdx_for_file(path, warc_path="uncompressed.arc",
                                            all_records=True, excludes=excludes)
    assert sorted(kept) == sorted(expected)
    assert stats["num_records_filtered"] == 2


def test_spark_exclude_anti_join_path(spark):
    """Big-list path: broadcast LEFT ANTI prefix join."""
    path = os.path.join(FIXTURE_DIR, "uncompressed.arc")
    records = read_warc_records(spark, path)
    ex_df = spark.createDataFrame(
        [("de,sueddeutsche)",), ("vn,rolo,art)/a",)], ["prefix"])
    fields = cdx_fields(records, all_records=True, excludes=ex_df)
    lines = sorted(r["urlkey"] for r in fields.select("urlkey").collect())
    assert lines == sorted([
        "filedesc://51_23_20110804181044_crawl101.arc.gz",
        "com,monsterindia,jobs)/details/9660976.html"])


def test_streaming_cdx_equals_batch(spark, tmp_path):
    """The CDX map bound to a Structured Streaming file source must emit
    exactly the batch pipeline's lines (stateless map => append mode)."""
    from cdx_writer_spark.streaming.cdx_stream import (run_cdx_stream,
                                                       stream_cdx_lines,
                                                       stream_warc_records)
    files = [os.path.join(FIXTURE_DIR, f) for f in
             ("uncompressed.arc", "uncompressed.warc", "wget_ia.warc.gz")]
    records = read_warc_records(spark, files)
    batch = sorted(r["cdx_line"] for r in
                   cdx_lines(cdx_fields(records, all_records=True)).collect())
    src = tmp_path / "warc_records_dir"
    # several files so the stream takes multiple micro-batches
    records.repartition(3).write.parquet(str(src))
    stream = stream_warc_records(spark, str(src), max_files_per_trigger=1)
    run_cdx_stream(stream_cdx_lines(stream, all_records=True),
                   str(tmp_path / "cdx_ckpt"), "stream_cdx_test")
    got = sorted(r["cdx_line"] for r in spark.table("stream_cdx_test").collect())
    assert got == batch


def test_cdx_stream_file_sink_exactly_once(spark, tmp_path):
    """run_cdx_stream_to_files: restarting the stream against the same
    checkpoint with no new input must not duplicate rows; with one new
    file it must append exactly that file's rows.  (The memory-sink
    runner is a drain helper and makes no such guarantee.)"""
    import shutil
    from cdx_writer_spark.operators.cdx import cdx_fields, cdx_lines
    from cdx_writer_spark.sources.warc import read_warc_records
    from cdx_writer_spark.streaming.cdx_stream import (
        run_cdx_stream_to_files, stream_cdx_lines, stream_warc_records)

    fixture = "/root/reference/tests/wget_ia.warc.gz"
    fixture2 = "/root/reference/tests/uncompressed.warc"
    src = tmp_path / "records_in"
    src.mkdir()
    out = str(tmp_path / "cdx_out")
    ckpt = str(tmp_path / "ckpt")

    def add_batch(df, name):
        stage = tmp_path / ("stage_" + name)
        df.write.parquet(str(stage))
        for i, part in enumerate(sorted(stage.glob("part-*.parquet"))):
            shutil.copy(part, src / f"{name}-{i}.parquet")

    recs1 = read_warc_records(spark, fixture)
    add_batch(recs1, "batch1")
    lines = stream_cdx_lines(stream_warc_records(spark, str(src)),
                             all_records=True)
    run_cdx_stream_to_files(lines, ckpt, out)
    first = sorted(r["cdx_line"] for r in spark.read.parquet(out).collect())
    batch1 = sorted(r["cdx_line"] for r in
                    cdx_lines(cdx_fields(recs1, all_records=True)).collect())
    assert first == batch1

    # restart, no new input: nothing replays
    run_cdx_stream_to_files(lines, ckpt, out)
    again = sorted(r["cdx_line"] for r in spark.read.parquet(out).collect())
    assert again == first

    # add a second file: exactly its rows append
    recs2 = read_warc_records(spark, fixture2)
    add_batch(recs2, "batch2")
    run_cdx_stream_to_files(lines, ckpt, out)
    final = sorted(r["cdx_line"] for r in spark.read.parquet(out).collect())
    batch2 = sorted(r["cdx_line"] for r in
                    cdx_lines(cdx_fields(recs2, all_records=True)).collect())
    assert final == sorted(first + batch2)
