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
from pyspark.sql import functions as F

from .events import read_events_stream


def dedup_events_stream(stream: DataFrame, delay: str = "1 hour") -> DataFrame:
    """Drop redelivered events whose duplicate arrives within the
    watermark delay. State size is bounded by (events/sec × delay)."""
    return stream.withWatermark("ts", delay).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def dedup_documents_stream(
    stream: DataFrame,
    ts_col: str = "ingest_ts",
    delay: str = "24 hours",
) -> DataFrame:
    """Content-hash dedup for a DOCUMENT stream: the streaming twin of
    ``operators.dedup.exact_dedup_clusters`` for continuous ingestion —
    a re-crawled page arriving within the watermark delay is dropped
    before it reaches the corpus, so the batch dedup pass only has to
    handle re-appearances farther apart than the delay.

    The dedup key is the null-distinguishing content digest (the same
    key the batch collapse uses, so batch and streaming agree on what
    "identical" means); state is one digest per distinct text seen
    within the delay — bounded by (docs/sec × delay), aged out by the
    watermark, exactly the property that makes this viable at a
    100 TB/day ingest rate where ``dropDuplicates`` would accrete state
    forever."""
    keyed = stream.withColumn(
        "text_hash",
        F.concat(
            F.col("text").isNull().cast("int").cast("string"),
            F.md5(F.coalesce(F.col("text"), F.lit(""))),
        ),
    )
    return (
        keyed.withWatermark(ts_col, delay)
        .dropDuplicatesWithinWatermark(["text_hash"])
        .drop("text_hash")
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
