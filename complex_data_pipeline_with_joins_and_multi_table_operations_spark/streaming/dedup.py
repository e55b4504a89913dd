"""Streaming deduplication: exactly-once semantics over an at-least-once
event stream, via watermark-bounded state.

``dropDuplicates`` on a stream keeps every seen key in the state store
forever; ``dropDuplicatesWithinWatermark`` ages keys out once the
watermark passes them — the only sane form at 100 TB/day. The dedup key
is the event id (redelivery dedup); content-hash keys work identically
for document streams (add ``F.md5(col)`` before the call).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .events import read_events_stream


def dedup_events_stream(stream: DataFrame, delay: str = "1 hour") -> DataFrame:
    """Drop redelivered events whose duplicate arrives within the
    watermark delay. State size is bounded by (events/sec × delay)."""
    return stream.withWatermark("ts", delay).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def run_stream_dedup(
    spark: SparkSession,
    path: str,
    checkpoint: str,
    sink_table: str = "dedup_sink",
    delay: str = "1 hour",
) -> None:
    """Drain a (possibly duplicated) events backlog through the streaming
    dedup with Trigger.AvailableNow into a memory sink for inspection."""
    stream = read_events_stream(spark, path)
    q = (
        dedup_events_stream(stream, delay)
        .writeStream.format("memory")
        .queryName(sink_table)
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
