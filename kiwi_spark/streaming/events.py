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


SESSION_STATE_SCHEMA = "last_ts long, session_seq long, n_events long, sum_value double, session_start long"
SESSION_OUTPUT_SCHEMA = (
    "user_id long, session_seq long, session_start timestamp, "
    "session_end timestamp, n_events long, sum_value double"
)


def sessionize_stream(events: DataFrame, gap_minutes: int = 30,
                      watermark: str = "2 hours",
                      timeout: str = "processing") -> DataFrame:
    """Custom stateful streaming operator: per-user sessionization via
    applyInPandasWithState. Emits a row per CLOSED session (gap exceeded
    within a batch or state timeout); the open session stays in state.

    ``timeout="processing"`` closes idle sessions after the gap elapses in
    wall time (continuous streams). Use ``timeout="none"`` with
    ``trigger(availableNow=True)`` drains — a processing-time timeout makes
    availableNow spin empty micro-batches waiting for timers to fire.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_seconds = gap_minutes * 60
    use_timeout = timeout == "processing"

    def fn(key, pdfs, state: GroupState):
        (user_id,) = key
        rows = []
        if state.hasTimedOut:
            if state.exists:
                last_ts, seq, n, sv, start = state.get
                rows.append((user_id, seq, start, last_ts, n, sv))
                state.remove()
        else:
            if state.exists:
                last_ts, seq, n, sv, start = state.get
            else:
                last_ts, seq, n, sv, start = None, 0, 0, 0.0, None
            events_all = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
            for ts, value in zip(events_all["ts"], events_all["value"]):
                epoch = int(ts.timestamp())
                if last_ts is not None and epoch - last_ts > gap_seconds:
                    rows.append((user_id, seq, start, last_ts, n, sv))
                    seq, n, sv, start = seq + 1, 0, 0.0, None
                if start is None:
                    start = epoch
                last_ts = epoch
                n += 1
                sv = round(sv + float(value), 6)
            state.update((last_ts, seq, n, sv, start))
            if use_timeout:
                state.setTimeoutDuration(gap_seconds * 1000)
        if rows:
            yield pd.DataFrame(
                rows,
                columns=[
                    "user_id", "session_seq", "session_start", "session_end",
                    "n_events", "sum_value",
                ],
            ).astype({"session_start": "datetime64[s]", "session_end": "datetime64[s]"})

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=(
                GroupStateTimeout.ProcessingTimeTimeout
                if use_timeout
                else GroupStateTimeout.NoTimeout
            ),
        )
    )


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
