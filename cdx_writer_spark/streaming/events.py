"""Structured Streaming transport for the engine's aggregation operators.

The reference is a bounded single-pass stream over one archive file
(SURVEY.md §2.9); its Spark generalization is: the same declarative
transformations bound to ``readStream`` with event-time watermarks.  The
batch forms live in plans/catalog.py (tumbling_window, sessionize) — these
are the streaming bindings, runnable with Trigger.AvailableNow over a
parquet directory (bounded replay ≡ the reference's single pass) or against
any real source (Kafka/files) unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

__all__ = ["EVENTS_SCHEMA", "stream_events", "windowed_counts",
           "run_available_now"]

EVENTS_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("props", T.StringType()),
])


def stream_events(spark: SparkSession, path: str,
                  max_files_per_trigger: int = 4) -> DataFrame:
    return (spark.readStream.schema(EVENTS_SCHEMA)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(path))


def windowed_counts(events: DataFrame, window: str = "1 hour",
                    watermark: str = "2 hours") -> DataFrame:
    """Tumbling event-time windows with late-data watermark — the streaming
    form of catalog.tumbling_window."""
    return (events
            .withWatermark("ts", watermark)
            .groupBy(F.window("ts", window).alias("win"), "event_type")
            .agg(F.count("*").alias("n_events"),
                 F.round(F.sum("value"), 4).alias("sum_value"))
            .select(F.date_format("win.start", "yyyy-MM-dd HH:mm:ss")
                    .alias("hour"), "event_type", "n_events", "sum_value"))


def run_available_now(result: DataFrame, checkpoint: str) -> list:
    """Execute a streaming query over all currently-available input
    (bounded replay), collect the final state from the memory sink."""
    name = "stream_out_" + str(abs(hash(checkpoint)) % 10**8)
    q = (result.writeStream.format("memory").queryName(name)
         .outputMode("complete")
         .option("checkpointLocation", checkpoint)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    spark = result.sparkSession
    return spark.table(name).collect()
