"""Property checks for the semantic parity traps called out in SURVEY.md
§7.5.1: null-rejecting filters, left-join null introduction, dayofweek
convention, bucket boundaries, withColumn replacement, positional union.
"""

from __future__ import annotations

import datetime

from pyspark.sql import Row
from pyspark.sql import functions as F

from complex_data_pipeline_with_joins_and_multi_table_operations_spark.functions import (
    bucket_by_ranges,
    duration_minutes,
    is_weekend,
    rate_per_hour,
)
from complex_data_pipeline_with_joins_and_multi_table_operations_spark.operators import (
    cleaning,
    dimensions,
    fact,
    quality,
)


def test_comparison_filters_reject_nulls(spark):
    df = spark.createDataFrame(
        [(1.0,), (None,), (-1.0,), (0.0,)], "v double"
    ).filter(F.col("v") > 0)
    assert df.count() == 1  # nulls AND non-positives drop


def test_na_drop_subset(spark):
    df = spark.createDataFrame(
        [(1, None), (None, 2), (3, 4)], "a int, b int"
    )
    assert df.na.drop(subset=["a"]).count() == 2
    assert df.na.drop(subset=["a", "b"]).count() == 1


def test_left_join_introduces_nulls_counted_by_dq(spark):
    facts = spark.createDataFrame([(1, 10.0), (2, 10.0), (99, 10.0)], "k int, quantity double")
    dim = spark.createDataFrame([(1, "A"), (2, "B")], "k int, name string")
    joined = facts.join(dim.withColumnRenamed("k", "dk"), F.col("k") == F.col("dk"), "left")
    dq = quality.quality_counts(
        joined, null_col_a="name", null_col_b="name", range_col="quantity"
    ).head()
    assert dq.missing_a == 1 and dq.missing_b == 1
    assert not dq.passed


def test_dayofweek_sunday_is_one(spark):
    # 2024-01-07 was a Sunday
    row = spark.createDataFrame([("2024-01-07",)], "d string").select(
        F.dayofweek(F.to_date("d")).alias("dow"),
        is_weekend(F.to_date("d")).alias("we"),
    ).head()
    assert row.dow == 1 and row.we is True


def test_bucket_boundaries(spark):
    buckets = [(1, 50, "A"), (51, 100, "B")]
    df = spark.createDataFrame([(i,) for i in [1, 50, 51, 100, 101, 0]], "k int")
    got = {
        r.k: r.b
        for r in df.select(
            "k", bucket_by_ranges(F.col("k"), buckets, "other").alias("b")
        ).collect()
    }
    assert got == {1: "A", 50: "A", 51: "B", 100: "B", 101: "other", 0: "other"}


def test_duration_and_rate_typed_null(spark):
    df = spark.createDataFrame(
        [
            (datetime.datetime(2024, 1, 1, 0, 0), datetime.datetime(2024, 1, 1, 1, 30), 30.0),
            (datetime.datetime(2024, 1, 1, 0, 0), datetime.datetime(2024, 1, 1, 0, 0), 30.0),
        ],
        "a timestamp, b timestamp, dist double",
    ).select(
        duration_minutes(F.col("a"), F.col("b")).alias("mins"),
        rate_per_hour(F.col("dist"), duration_minutes(F.col("a"), F.col("b"))).alias("speed"),
    )
    rows = df.collect()
    assert rows[0].mins == 90.0 and abs(rows[0].speed - 20.0) < 1e-9
    assert rows[1].mins == 0.0 and rows[1].speed is None  # typed null, not NaN


def test_with_column_replaces_existing(spark):
    df = spark.createDataFrame([(1,)], "x int").withColumn("x", F.lit(5))
    assert df.columns == ["x"] and df.head().x == 5


def test_union_is_positional(spark):
    a = spark.createDataFrame([(1, "x")], "k int, v string")
    b = spark.createDataFrame([(2, "y")], "k int, v string")
    assert a.union(b).count() == 2


def test_clean_lineitem_schema_and_filters(cat):
    out = cleaning.clean_lineitem(cat.lineitem)
    assert "revenue" in out.columns and "unit_price" in out.columns
    bad = out.filter(
        (F.col("l_quantity") <= 0) | (F.col("revenue") <= 0) | F.col("ship_date").isNull()
    )
    assert bad.count() == 0


def test_entity_dim_covers_all_keys(cat):
    dim = dimensions.build_entity_dim(cat.lineitem, "l_partkey", "l_suppkey")
    n_parts = cat.lineitem.select("l_partkey").distinct().count()
    n_supps = cat.lineitem.select("l_suppkey").distinct().count()
    assert dim.count() <= n_parts + n_supps
    assert dim.filter(F.col("entity_group").isNull()).count() == 0


def test_date_dim_contiguous(cat):
    dd = dimensions.build_date_dim(cat.orders, "o_orderdate")
    lo, hi, n = dd.agg(
        F.min("full_date"), F.max("full_date"), F.count("*")
    ).head()
    assert (hi - lo).days + 1 == n  # no gaps, no dups


def test_fact_role_playing_dims(cat):
    f = fact.build_fact(cat.lineitem, cat.orders, cat.customer, cat.supplier, cat.nation)
    # both nation roles resolve independently from the same dim table
    row = f.filter(F.col("supp_nation").isNotNull() & F.col("cust_nation").isNotNull()).head()
    assert row is not None
    assert {"supp_nation", "cust_nation", "year", "is_weekend"} <= set(f.columns)


def test_fact_joins_are_broadcast(cat):
    f = fact.build_fact(cat.lineitem, cat.orders, cat.customer, cat.supplier, cat.nation)
    plan = f._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # dims must never shuffle the fact
