"""Scalar column expressions (SURVEY.md §2.7).

Each helper returns a Column built purely from ``pyspark.sql.functions`` so
it stays inside whole-stage codegen — no Python UDFs in the hot path.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def duration_minutes(start: Column, end: Column) -> Column:
    """Elapsed minutes between two timestamps as double
    (reference IngestionJob.scala:61-62, operator D3)."""
    return (F.unix_timestamp(end) - F.unix_timestamp(start)) / F.lit(60.0)


def rate_per_hour(amount: Column, minutes: Column) -> Column:
    """``amount / (minutes/60)`` guarded by a typed-null branch
    (reference IngestionJob.scala:63-67, operator C1)."""
    return F.when(minutes > 0, amount / (minutes / F.lit(60.0))).otherwise(
        F.lit(None).cast("double")
    )


def bucket_by_ranges(
    key: Column, buckets: Sequence[tuple[int, int, str]], default: str
) -> Column:
    """Chained when/between bucketing (reference DimensionJob.scala:48-54,
    operators C2+F6). ``buckets`` is [(lo, hi, label), ...] inclusive."""
    expr: Column | None = None
    for lo, hi, label in buckets:
        cond = key.between(lo, hi)
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    assert expr is not None
    return expr.otherwise(F.lit(default))


def labeled_name(prefix: str, key: Column) -> Column:
    """``concat(lit(prefix), key)`` with the implicit int→string cast made
    explicit (reference DimensionJob.scala:47,55, operator St1)."""
    return F.concat(F.lit(prefix), key.cast("string"))


def is_weekend(date_col: Column) -> Column:
    """Spark dayofweek is 1=Sunday…7=Saturday; weekend = {1, 7}
    (reference DimensionJob.scala:88, operator C3 — returned as a plain
    boolean rather than when/otherwise, same non-null semantics)."""
    return F.dayofweek(date_col).isin(1, 7)
