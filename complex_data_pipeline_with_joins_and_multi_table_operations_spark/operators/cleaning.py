"""Ingest-stage cleaning + enrichment (reference IngestionJob.scala:45-68;
SURVEY.md §2.2 P1-P2, §2.3 F1-F3, §2.7 D1-D3/C1/M1).

The reference stages raw trips: lowercase-normalize column names, rename to
canonical names, drop rows null in key columns, apply conjunctive positive
filters, derive date/hour/duration/speed. Here the same operator chain runs
over the ``lineitem`` table (the testdata's fact-grained input).

Scale notes: every step is a narrow projection or a null-rejecting filter —
Catalyst pushes the filters into the parquet scan (PushedFilters) and prunes
unread columns, so this stage is a single pass with no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def normalize_columns(df: DataFrame) -> DataFrame:
    """Bulk lowercase rename (operator P1; reference IngestionJob.scala:45)."""
    return df.toDF(*[c.lower() for c in df.columns])


def rename_columns(df: DataFrame, mapping: dict[str, str]) -> DataFrame:
    """Targeted renames (operator P2; reference IngestionJob.scala:46-49)."""
    return df.withColumnsRenamed(mapping)


def clean_lineitem(lineitem: DataFrame) -> DataFrame:
    """Full ingest-parity chain over lineitem.

    Mirrors IngestionJob.scala:45-68 step for step:
      na.drop on key columns (F1) → conjunctive positive filters (F2) →
      derived date/hour (D1, D2) → derived monetary columns (M1, C1) →
      positive-derived filter (F3).
    """
    df = normalize_columns(lineitem)
    df = df.na.drop(subset=["l_shipdate", "l_quantity", "l_extendedprice"])
    df = df.filter(
        (F.col("l_quantity") > 0)
        & (F.col("l_extendedprice") > 0)
        & (F.col("l_discount") >= 0)
    )
    df = df.withColumn("ship_date", F.to_date("l_shipdate"))
    df = df.withColumn("ship_hour", F.hour("l_shipdate"))
    df = df.withColumn(
        "revenue", F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    )
    # typed-null guarded ratio (operator C1; IngestionJob.scala:63-67)
    df = df.withColumn(
        "unit_price",
        F.when(F.col("l_quantity") > 0, F.col("revenue") / F.col("l_quantity"))
        .otherwise(F.lit(None).cast("double")),
    )
    df = df.filter(F.col("revenue") > 0)
    return df.select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        "l_suppkey",
        "ship_date",
        "ship_hour",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_returnflag",
        "l_linestatus",
        "revenue",
        "unit_price",
    )
