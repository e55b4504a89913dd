"""Structured Streaming over the events stream.

The reference is batch-only (SURVEY.md §2.8); this module extends the
surface with the streaming form of the same tumbling aggregation the
batch path exposes (operators.windows.tumbling_agg), so a user can run
the identical logical query over a live stream:

    readStream(parquet dir) → event-time window + watermark → sink

Design notes for scale:
- watermarking bounds state: late events beyond the watermark are
  dropped instead of growing the state store without bound;
- the aggregation is keyed on (window, event_type) — state partitions
  by key across executors exactly like the batch shuffle;
- Trigger.AvailableNow processes a backlog incrementally with the same
  code path as a 24/7 stream (used by the tests: deterministic, exits
  when caught up).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.aggregates import exact_avg, exact_sum


def read_events_stream(
    spark: SparkSession, path: str, schema=None, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream over an events parquet directory.

    Streaming sources need an explicit schema; infer it from a batch read
    of the same path when not supplied. The nanosecond-timestamp caveat
    from sources.load_events applies: read ns as long, rebuild µs NTZ.
    """
    import os

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    if schema is None:
        schema = spark.read.parquet(path).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    # the file stream source only accepts directories; a single-file input
    # streams from its parent directory with a glob filter on the name
    if os.path.isfile(path):
        reader = reader.option("pathGlobFilter", os.path.basename(path))
        path = os.path.dirname(path)
    raw = reader.parquet(path)
    if dict(raw.dtypes).get("ts") == "bigint":
        raw = raw.withColumn("ts_us", F.expr("ts DIV 1000"))
    else:
        raw = raw.withColumn("ts_us", F.unix_micros(F.col("ts").cast("timestamp")))
    # watermarks require TimestampType (LTZ) — NTZ event time is rejected
    # (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE). Run the session in UTC so the
    # LTZ wall clock matches the batch path's NTZ values.
    return raw.withColumn("ts", F.timestamp_micros(F.col("ts_us")))


def streaming_tumbling_agg(
    events: DataFrame, width: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Streaming tumbling-window aggregate — the streaming twin of
    operators.windows.tumbling_agg (same keys, same exact-decimal
    measures), with a watermark bounding late-event state."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            exact_sum("value", 2).alias("total_value"),
            exact_avg("value", 2).alias("avg_value"),
        )
        # NTZ output for parity with the batch tumbling_agg (UTC session)
        .select(
            F.col("w").getField("start").cast("timestamp_ntz").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
            "avg_value",
        )
    )


def run_events_stream(
    spark: SparkSession,
    source_path: str,
    checkpoint_dir: str,
    sink_table: str = "events_hourly_stream",
    width: str = "1 hour",
    watermark: str = "2 hours",
) -> None:
    """Process the full backlog with Trigger.AvailableNow into an
    in-memory sink table, then return. Complete output mode: each
    trigger emits the full updated aggregate (bounded by watermark)."""
    agg = streaming_tumbling_agg(
        read_events_stream(spark, source_path), width, watermark
    )
    q = (
        agg.writeStream.format("memory")
        .queryName(sink_table)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_stream_to_parquet(
    spark: SparkSession,
    events_path: str,
    out_dir: str,
    checkpoint: str,
) -> None:
    """Drain the stream into partitioned parquet via foreachBatch — the
    production sink pattern: each micro-batch is written with its batch id
    available for idempotent re-processing (a retried batch overwrites its
    own output instead of duplicating it). Structured Streaming's
    checkpoint + deterministic batch contents give end-to-end
    exactly-once for this sink."""

    def _write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(out_dir)
        )

    stream = read_events_stream(spark, events_path)
    q = (
        stream.writeStream.foreachBatch(_write_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_stream_view_purchase_join(
    views: DataFrame, purchases: DataFrame, within: str = "1 hour"
) -> DataFrame:
    """Stream-stream inner join: purchases matched to a preceding view by
    the same user within ``within``. Both sides are watermarked so the
    join state (buffered unmatched rows) is bounded — Spark drops a
    buffered view once the purchase-side watermark passes view_ts +
    within. The time-bound predicate is REQUIRED for streaming (an
    unbounded condition would mean infinite state retention).
    """
    v = (
        views.withWatermark("ts", within)
        .select(
            F.col("user_id").alias("v_user"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("view_ts"),
        )
    )
    p = (
        purchases.withWatermark("ts", within)
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        )
    )
    return v.join(
        p,
        (F.col("v_user") == F.col("p_user"))
        & (F.col("purchase_ts") > F.col("view_ts"))
        & (F.col("purchase_ts") <= F.col("view_ts") + F.expr(f"INTERVAL {within}")),
    )


def run_stream_stream_join(
    spark: SparkSession,
    events_path: str,
    checkpoint: str,
    sink_table: str = "ssj_sink",
    within: str = "1 hour",
) -> None:
    views = read_events_stream(spark, events_path).filter(
        F.col("event_type") == "view"
    )
    purchases = read_events_stream(spark, events_path).filter(
        F.col("event_type") == "purchase"
    )
    q = (
        stream_stream_view_purchase_join(views, purchases, within)
        .writeStream.format("memory")
        .queryName(sink_table)
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
