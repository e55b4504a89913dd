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


def column_profile(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """(column, n_rows, n_nulls, n_distinct, vmin, vmax): the ANALYZE-
    style per-column profile every ingestion pipeline runs before
    trusting a new drop — null rates, cardinalities, numeric/date
    ranges — computed in ONE aggregation pass over ONE scan (the same
    single-pass discipline as quality_counts: k columns never mean k
    jobs).  vmin/vmax are doubles for numeric and date columns (dates
    as epoch days — a cross-engine-stable numeric; string formatting of
    doubles/timestamps is NOT engine-stable, so string columns profile
    nulls/cardinality only and range comes back NULL).

    100 TB note: n_distinct here is exact (count distinct compiles to
    one Expand + partial aggregation — k× the scan's rows through the
    shuffle, fine for profiling runs); swap in approx_count_distinct
    (HLL++, fixed memory, one pass) when profiling petabyte drops where
    the exact expand is not worth it — same output shape.
    """
    from pyspark.sql.types import (
        DateType,
        NumericType,
        TimestampNTZType,
        TimestampType,
    )

    cols = columns or df.columns
    aggs = []
    for c in cols:
        dt = df.schema[c].dataType
        # backtick-quote the reference: a bare dotted name would resolve
        # as a struct-field path
        col = F.col("`" + c.replace("`", "``") + "`")
        aggs.append(F.count(F.lit(1)).alias(f"{c}__rows"))
        aggs.append(F.sum(F.when(col.isNull(), 1).otherwise(0)).alias(f"{c}__nulls"))
        aggs.append(F.countDistinct(col).alias(f"{c}__distinct"))
        if isinstance(dt, NumericType):
            num = col.cast("double")
        elif isinstance(dt, DateType):
            num = F.datediff(col, F.lit("1970-01-01")).cast("double")
        elif isinstance(dt, (TimestampType, TimestampNTZType)):
            # whole epoch seconds (truncation is monotonic, so min/max
            # commute with it — and integer seconds are cross-engine
            # exact where fractional epoch() doubles are not); NTZ casts
            # through the UTC session timezone, matching DuckDB's
            # naive-as-UTC epoch()
            num = F.unix_timestamp(col.cast("timestamp")).cast("double")
        else:
            num = F.lit(None).cast("double")
        aggs.append(F.min(num).alias(f"{c}__min"))
        aggs.append(F.max(num).alias(f"{c}__max"))
    wide = df.agg(*aggs)
    # identifiers backtick-quoted (and name literals escaped) so columns
    # with dots/spaces/quotes profile like any other
    stack = ", ".join(
        "'{lit}', `{c}__rows`, `{c}__nulls`, `{c}__distinct`,"
        " `{c}__min`, `{c}__max`".format(lit=c.replace("'", "''"), c=c)
        for c in cols
    )
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {stack}) AS "
            "(column, n_rows, n_nulls, n_distinct, vmin, vmax)"
        )
    )
