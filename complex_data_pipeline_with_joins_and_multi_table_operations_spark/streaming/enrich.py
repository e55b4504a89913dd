"""Stream-static enrichment: join a live event stream against a slowly
changing dimension table — the standard "attach user/account attributes
to the clickstream" shape.

Stream-static joins need no watermark and keep no state: each micro-batch
broadcast-hash-joins against the static side, which Spark re-plans per
batch (so a dim refresh lands on the next trigger). At 100 TB/day the
stream side never shuffles for this join as long as the dim broadcasts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .events import read_events_stream


def enrich_events_stream(stream: DataFrame, user_dim: DataFrame) -> DataFrame:
    """Left-join events to user attributes (unknown users pass through
    with null attributes — an inner join would silently drop them)."""
    dim = user_dim.select(
        F.col("c_custkey").alias("user_key"),
        F.col("c_mktsegment").alias("user_segment"),
        F.col("c_acctbal").alias("user_acctbal"),
    )
    return stream.join(
        F.broadcast(dim), stream["user_id"] == dim["user_key"], "left"
    ).drop("user_key")


def pit_enrich_events_stream(
    stream: DataFrame,
    scd2_dim: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts_us",
    attr_cols: list[str] | None = None,
) -> DataFrame:
    """Streaming point-in-time enrichment: each event picks up the SCD2
    dimension version effective at ITS OWN event time, not the current
    one — the difference matters whenever the stream replays history
    (backfill, reprocessing after an outage).

    The batch operator (operators/changes.py point_in_time_join) uses the
    union-sort shape, which a stream cannot (no global sort over an
    unbounded source). The streaming twin is the stream-static range
    join: versions broadcast per micro-batch, the range predicate
    selects at most one contiguous version per event, unmatched events
    pass through with nulls. Stateless — no watermark, no store; a dim
    refresh lands on the next trigger. Equality with the batch operator
    is asserted in tests/test_round4.py.
    """
    attr_cols = attr_cols or ["event_type"]
    d = scd2_dim.select(
        F.col(key).alias("__k"),
        "valid_from",
        "valid_to",
        *[F.col(c).alias(f"dim_{c}") for c in attr_cols],
    )
    cond = (
        (stream[key] == d["__k"])
        & (stream[ts_col] >= d["valid_from"])
        & (d["valid_to"].isNull() | (stream[ts_col] < d["valid_to"]))
    )
    return stream.join(F.broadcast(d), cond, "left").drop(
        "__k", "valid_from", "valid_to"
    )


def run_stream_enrich(
    spark: SparkSession,
    events_path: str,
    user_dim: DataFrame,
    checkpoint: str,
    sink_table: str = "enrich_sink",
) -> None:
    stream = read_events_stream(spark, events_path)
    q = (
        enrich_events_stream(stream, user_dim)
        .writeStream.format("memory")
        .queryName(sink_table)
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
