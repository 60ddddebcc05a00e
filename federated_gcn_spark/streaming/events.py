"""Structured Streaming over the events table.

The reference's only stream-like construct is its socket event loop
(fl_server.py:134-172) — orchestration, not analytics (SURVEY.md §2.8).
The engine still ships real stream processing: file-source streams with
event-time windows and watermarked late-data handling, the streaming twin
of plans.queries.events_tumbling (same aggregate, same bucketing).

ts has shipped both as parquet TIMESTAMP(NANOS) (epoch-nano BIGINT under
session.py's nanosAsLong) and TIMESTAMP(MICROS) (TIMESTAMP_NTZ); the
watermark needs a real timestamp column, derived adaptively from whichever
physical type the files carry (_event_time).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)

EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampNTZType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def _event_time(df: DataFrame) -> Column:
    """ts as a watermarkable TIMESTAMP, whatever the physical schema.

    Session tz is pinned UTC (session.py), so the NTZ → TIMESTAMP cast is
    deterministic and agrees with the epoch-nano integer path.
    """
    if dict(df.dtypes).get("ts") in ("bigint", "long"):
        return F.timestamp_micros(F.expr("ts div 1000"))
    return F.col("ts").cast("timestamp")


def read_events_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream over an events directory.

    Streaming sources need an explicit schema; derive it from the files
    already present (a footer-only batch read) so the stream matches
    whichever ts encoding the data carries, falling back to EVENTS_SCHEMA
    for an as-yet-empty directory.
    """
    try:
        schema = spark.read.parquet(path).schema
    except Exception:  # pragma: no cover - empty dir before first file
        schema = EVENTS_SCHEMA
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def tumbling_value_agg(
    stream: DataFrame,
    window: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Per (event_type, window): count + sum(value), late data bounded by
    the watermark. State size is O(active windows × types) — bounded, so
    this runs indefinitely at any input rate."""
    with_time = stream.withColumn("event_time", _event_time(stream))
    return (
        with_time.withWatermark("event_time", watermark)
        .groupBy(F.window("event_time", window).alias("win"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def session_value_agg(
    stream: DataFrame,
    gap: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Per-user session aggregation with a dynamic inactivity gap —
    the streaming twin of plans.queries.events_sessionize (which derives
    the same sessions with lag() in batch). session_window state closes
    once the watermark passes a session's end, so state stays bounded.
    Accepts a batch DataFrame too (watermark skipped) — the tests use
    that for stream↔batch equivalence."""
    with_time = stream.withColumn("event_time", _event_time(stream))
    if stream.isStreaming:
        with_time = with_time.withWatermark("event_time", watermark)
    return (
        with_time
        .groupBy(F.session_window("event_time", gap).alias("win"), F.col("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "user_id",
            "n_events",
            "total_value",
        )
    )


def run_available_now(result: DataFrame, query_name: str, timeout_sec: int = 120):
    """Drain all currently-available input into an in-memory sink and stop
    (the batch-equivalence harness used by tests)."""
    q = (
        result.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete" if result.isStreaming else "append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
    return q
