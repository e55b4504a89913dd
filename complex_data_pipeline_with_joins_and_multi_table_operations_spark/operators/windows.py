"""Window-function operators over the events table: sessionization,
top-n-per-group, tumbling time windows (batch form).

The reference has no window functions (SURVEY.md §2.8) — these extend the
surface for event/stream-shaped data. All are single-shuffle plans: one
exchange on the partition key, then window evaluation within partitions.

Timestamp discipline: the events parquet stores nanosecond timestamps,
which Spark cannot represent (µs max). The loader (sources) exposes both
``ts`` (timestamp_ntz, µs-truncated) and ``ts_us`` (exact integer
microseconds). All ordering and gap arithmetic uses ``ts_us`` so results
are engine-exact regardless of sub-microsecond precision.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """Split each user's event stream into sessions at inactivity gaps.

    Classic lag + cumulative-sum sessionization: a new session starts when
    the gap to the previous event exceeds ``gap_seconds``. One shuffle on
    user_id; both window functions share the same (partition, order) so
    Spark evaluates them in a single Window node.
    """
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    ts_sec = (F.col("ts_us") / F.lit(1_000_000)).cast("long")  # floor: ts_us >= 0
    sec = events.withColumn("ts_sec", ts_sec).withColumn(
        "new_session",
        F.when(
            F.lag("ts_sec").over(w).isNull()
            | ((F.col("ts_sec") - F.lag("ts_sec").over(w)) > gap_seconds),
            1,
        ).otherwise(0),
    )
    sess = sec.withColumn(
        "session_id",
        F.sum("new_session").over(
            Window.partitionBy("user_id").orderBy("ts_us", "event_id")
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    from .aggregates import exact_sum

    return sess.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        exact_sum("value", 2).alias("total_value"),
        F.min("ts_sec").alias("session_start_sec"),
        F.max("ts_sec").alias("session_end_sec"),
        (F.max("ts_sec") - F.min("ts_sec")).alias("duration_sec"),
    )


def top_n_per_group(
    df: DataFrame, group_col: str, order_col: str, tiebreak_col: str, n: int
) -> DataFrame:
    """row_number top-n within each group, deterministic via tie-break."""
    w = Window.partitionBy(group_col).orderBy(F.desc(order_col), tiebreak_col)
    return (
        df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= n)
        .withColumn("rn", F.col("rn").cast("int"))
    )


def sliding_agg(
    events: DataFrame, width: str = "1 hour", slide: str = "30 minutes"
) -> DataFrame:
    """Sliding-window aggregate: each event contributes to width/slide
    overlapping windows (F.window emits one row per covering window before
    the aggregation — the shuffle carries the small (window, type) partial
    aggregates, not the replicated events)."""
    from .aggregates import exact_sum

    return (
        events.groupBy(
            F.window("ts", width, slide).getField("start").alias("window_start"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            exact_sum("value", 2).alias("total_value"),
        )
    )


def session_window_agg(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Native session windows (F.session_window): consecutive events of a
    user merge while the gap to the previous event is < gap; a gap >= gap
    starts a new session. The built-in twin of :func:`sessionize` (which
    uses the explicit lag+cumsum formulation); both shuffle once on the
    session key. Works identically in Structured Streaming with a
    watermark for state expiry."""
    return (
        events.groupBy(F.session_window("ts", gap).alias("sw"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            # NTZ-pure epoch micros (unix_micros would route through the
            # session timezone)
            F.expr(
                "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', sw.start)"
            ).alias("session_start_us"),
            "n_events",
        )
    )


def moving_avg(events: DataFrame, frame_rows: int = 3) -> DataFrame:
    """Per-user trailing moving average over the last ``frame_rows`` events.

    Frame-bounded window (ROWS n-1 PRECEDING..CURRENT): computed with the
    exact-decimal sum over the frame so the average is bit-deterministic
    (see operators.aggregates docstring).
    """
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(-(frame_rows - 1), 0)
    )
    frame_sum = F.sum(F.col("value").cast("decimal(18,2)")).over(w).cast("double")
    frame_n = F.count("*").over(w)
    return events.select(
        "event_id",
        "user_id",
        "ts_us",
        "value",
        (frame_sum / frame_n).alias(f"mov_avg{frame_rows}"),
    )


def tumbling_agg(events: DataFrame, width: str = "1 hour") -> DataFrame:
    """Batch tumbling-window aggregate: (window_start, event_type) →
    count / sum / avg. Uses F.window so the same expression works in
    Structured Streaming (streaming/events.py reuses it)."""
    from .aggregates import exact_avg, exact_sum

    return (
        events.groupBy(
            F.window("ts", width).getField("start").alias("window_start"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            exact_sum("value", 2).alias("total_value"),
            exact_avg("value", 2).alias("avg_value"),
        )
    )
