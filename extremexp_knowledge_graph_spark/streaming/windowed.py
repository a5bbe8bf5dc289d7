"""Watermarked event-time windowed aggregation (Structured Streaming).

The streaming form of the ``events_hourly`` batch query: tumbling
event-time windows over an event stream with a watermark bounding state for
late data. The reference has no streaming analytics at all (its only
"stream" is the file watcher, SURVEY.md A5); this is the operator a
continuously-ingesting KG/metrics pipeline needs so per-hour stats don't
require a batch rescan of the events table.

Design notes for scale:

* watermark + tumbling window → Spark drops window state once
  ``max(event_time) - watermark`` passes the window end; state size is
  O(active windows × event types), not O(events).
* the aggregation is a plain hash aggregate — partial aggregation happens
  map-side per micro-batch before the state-store shuffle.
* ``availableNow`` drains a backlog then stops (tests / backfill); omit it
  for a continuous query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
    ]
)


def windowed_event_counts(events: DataFrame, watermark: str = "2 hours", window: str = "1 hour") -> DataFrame:
    """Tumbling-window counts+sums per event_type; works on a streaming OR
    batch DataFrame (same plan — the batch run is the correctness oracle)."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def stream_events_hourly(
    spark: SparkSession,
    input_dir: str,
    out_path: str,
    checkpoint_dir: str,
    watermark: str = "2 hours",
    window: str = "1 hour",
    available_now: bool = True,
    max_files_per_trigger: int = 32,
):
    """File-source event stream → watermarked hourly aggregate → parquet.

    Append output mode: a window's row is emitted exactly once, when the
    watermark passes its end — the streaming contract that makes the sink
    idempotent without a merge. A window closes only when a LATER batch
    advances the watermark past its end, so a drained backlog holds back its
    tail windows until more data arrives — that is correct streaming
    semantics, not data loss (tests drive a second run to flush).
    Returns the StreamingQuery.
    """
    raw = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    agg = windowed_event_counts(raw, watermark, window)
    writer = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
