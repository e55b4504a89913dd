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


def asof_last_view_before_purchase(events: DataFrame) -> DataFrame:
    """As-of join expressed as a window scan: for every purchase event,
    the most recent prior 'view' event of the same user.

    Spark has no native ASOF JOIN; the idiomatic composition sorts each
    user's stream once and carries the last-seen view timestamp forward
    with last(..., ignorenulls) — one shuffle on user_id, no self-join,
    no range explosion. (The equivalent as-of self-join would be a range
    join that Spark plans as a broadcast nested loop — quadratic per key.)
    """
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    view_ts = F.when(F.col("event_type") == "view", F.col("ts_us"))
    tagged = events.withColumn(
        "last_view_us", F.last(view_ts, ignorenulls=True).over(w)
    )
    return (
        tagged.filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            F.col("ts_us").alias("purchase_us"),
            "last_view_us",
            ((F.col("ts_us") - F.col("last_view_us")) / F.lit(1_000_000.0)).alias(
                "gap_seconds"
            ),
        )
    )


def quantity_range_join(lineitem: DataFrame, ranges: DataFrame) -> DataFrame:
    """Range (theta) join: classify each lineitem row by a bucket table
    with [lo, hi) bounds. The ranges side is tiny and broadcast, so the
    non-equi predicate evaluates as a broadcast nested loop over a
    handful of rows — the correct plan for dimension-sized range tables
    (for large range tables: bucket both sides on a coarse grid first to
    restore an equi prefix)."""
    joined = lineitem.join(
        F.broadcast(ranges),
        (F.col("l_quantity") >= F.col("lo")) & (F.col("l_quantity") < F.col("hi")),
        "left",
    )
    return joined.groupBy("bucket_name").agg(
        F.count("*").alias("n_rows"),
        F.sum(F.col("l_quantity").cast("long")).alias("total_qty"),
    )


def user_value_zscore(events: DataFrame) -> DataFrame:
    """Per-user z-score of event values, engine-deterministic: mean and
    variance derive from exact-decimal window sums (value and value² both
    live on fixed grids), so every engine computes bit-identical doubles
    before the final rounding."""
    w = Window.partitionBy("user_id")
    n = F.count("*").over(w)
    s = F.sum(F.col("value").cast("decimal(18,2)")).over(w).cast("double")
    # value has 2 decimals → value² lives on the 1e-4 grid
    ss = F.sum((F.col("value") * F.col("value")).cast("decimal(18,4)")).over(w).cast(
        "double"
    )
    mean = s / n
    var = (ss - (s * s) / n) / (n - 1)
    z = F.when(var > 0, (F.col("value") - mean) / F.sqrt(var)).otherwise(F.lit(0.0))
    return events.select(
        "event_id",
        "user_id",
        "value",
        F.round(mean, 6).alias("user_mean"),
        F.round(z, 6).alias("zscore"),
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
