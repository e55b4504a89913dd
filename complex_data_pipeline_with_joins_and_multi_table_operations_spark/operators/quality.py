"""Data-quality validation (reference DataQualityJob.scala:26-41; SURVEY.md
§2.3 F8-F9, §5.1).

The reference counts: null pickup_borough, null dropoff_borough, and
out-of-range durations, then declares pass iff all three are zero. Here the
same checks run over the fact table's nation roles and quantity range —
and all three counts come back in ONE aggregation pass (the reference runs
three separate count jobs, each re-scanning the table; SURVEY.md §4.3.1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def quality_counts(
    fact: DataFrame,
    null_col_a: str = "supp_nation",
    null_col_b: str = "cust_nation",
    range_col: str = "quantity",
    range_lo: float = 0.0,
    range_hi: float = 1000.0,
) -> DataFrame:
    """One-row DataFrame of violation counts.

    - missing_a / missing_b: null dimension attributes introduced by the
      left-outer joins (F8; DataQualityJob.scala:31-32)
    - invalid_range: disjunctive out-of-range check (F9;
      DataQualityJob.scala:33-35)
    - total_rows and passed for the pass/fail verdict
      (DataQualityJob.scala:37-41)
    """
    a, b, r = F.col(null_col_a), F.col(null_col_b), F.col(range_col)
    return fact.agg(
        F.count("*").alias("total_rows"),
        F.count(F.when(a.isNull(), 1)).alias("missing_a"),
        F.count(F.when(b.isNull(), 1)).alias("missing_b"),
        F.count(F.when((r <= range_lo) | (r >= range_hi), 1)).alias("invalid_range"),
    ).select(
        "total_rows",
        "missing_a",
        "missing_b",
        "invalid_range",
        (
            (F.col("missing_a") + F.col("missing_b") + F.col("invalid_range")) == 0
        ).alias("passed"),
    )


def observed_quality(
    df: DataFrame,
    null_col_a: str = "supp_nation",
    null_col_b: str = "cust_nation",
    range_col: str = "quantity",
    range_lo: float = 0.0,
    range_hi: float = 1000.0,
):
    """Attach the DQ counters to the DataFrame as an Observation: the
    metrics are collected DURING whatever action consumes ``df`` (e.g.
    the table write) — zero extra scans, unlike the reference's separate
    count jobs (SURVEY.md §4.3.1: every logging count() re-ran the plan).

    Returns (df_with_observation, observation); read
    ``observation.get`` AFTER an action has run. At 100 TB this is the
    difference between validating for free and re-reading the table.
    """
    from pyspark.sql import Observation

    a, b, r = F.col(null_col_a), F.col(null_col_b), F.col(range_col)
    obs = Observation("dq")
    observed = df.observe(
        obs,
        F.count(F.lit(1)).alias("total_rows"),
        F.count(F.when(a.isNull(), 1)).alias("missing_a"),
        F.count(F.when(b.isNull(), 1)).alias("missing_b"),
        F.count(F.when((r <= range_lo) | (r >= range_hi), 1)).alias("invalid_range"),
    )
    return observed, obs
