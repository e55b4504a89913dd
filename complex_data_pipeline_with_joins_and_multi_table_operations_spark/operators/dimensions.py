"""Dimension builders (reference DimensionJob.scala; SURVEY.md §2 U1/U2/F5/
C2/St1 and S3/D4/D5/C3).

Two builders, mirroring the reference's two dimensions:

- :func:`build_entity_dim` — the location-dim analogue: harvest distinct
  keys from two fact columns (union + distinct), bucket them into named
  groups with a when-chain, synthesize display names.
- :func:`build_date_dim` — the date dimension. The reference collects
  min/max to the driver and loops ``spark.range`` (DimensionJob.scala:63-78);
  we use the pure-Spark ``sequence`` + ``explode`` form instead (SURVEY.md
  §7.3) — no driver round-trip, cluster-friendly at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import bucket_by_ranges, is_weekend, labeled_name

# Key-range buckets, same shape as the reference's borough bucketing
# (DimensionJob.scala:48-54: 1-50 / 51-100 / 101-150 / 151-200 / else).
DEFAULT_BUCKETS = [
    (1, 50, "Group A"),
    (51, 100, "Group B"),
    (101, 150, "Group C"),
    (151, 200, "Group D"),
]
DEFAULT_BUCKET_OTHER = "Group E"


def build_entity_dim(fact: DataFrame, key_a: str, key_b: str) -> DataFrame:
    """Synthesize a dimension from the distinct union of two fact key columns.

    Reference DimensionJob.scala:38-56: select pickup ids ∪ dropoff ids
    (positional union, U1) → distinct (U2) → not-null/non-zero filter (F5)
    → cast int → when-chain bucket (C2) → concat names (St1).
    """
    keys = (
        fact.select(F.col(key_a).alias("entity_id"))
        .union(fact.select(F.col(key_b).alias("entity_id")))
        .distinct()
        .filter(F.col("entity_id").isNotNull() & (F.col("entity_id") != 0))
        .withColumn("entity_id", F.col("entity_id").cast("int"))
    )
    return keys.select(
        "entity_id",
        labeled_name("Entity ", F.col("entity_id")).alias("entity_name"),
        bucket_by_ranges(
            F.col("entity_id"), DEFAULT_BUCKETS, DEFAULT_BUCKET_OTHER
        ).alias("entity_group"),
        labeled_name("Zone ", F.col("entity_id")).alias("entity_zone"),
    )


def build_date_dim(df: DataFrame, date_col: str) -> DataFrame:
    """Date spine covering [min(date_col), max(date_col)] with calendar
    attributes (reference DimensionJob.scala:63-90, idiomatic form).

    The aggregate produces one row; ``sequence`` + ``explode`` fans it back
    out executor-side. ``dayofweek`` keeps Spark's 1=Sunday…7=Saturday
    convention (DimensionJob.scala:87-88).
    """
    bounds = df.agg(
        F.min(F.to_date(date_col)).alias("lo"), F.max(F.to_date(date_col)).alias("hi")
    )
    spine = bounds.select(
        F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("full_date")
    )
    return spine.select(
        "full_date",
        F.col("full_date").alias("date_key"),
        F.year("full_date").alias("year"),
        F.quarter("full_date").alias("quarter"),
        F.month("full_date").alias("month"),
        F.dayofmonth("full_date").alias("day_of_month"),
        F.dayofweek("full_date").alias("day_of_week"),
        is_weekend(F.col("full_date")).alias("is_weekend"),
    )
