"""Tests for applyInPandas custom ops, skew-salted aggregation, and the
warehouse snapshot (time-travel) seam."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from complex_data_pipeline_with_joins_and_multi_table_operations_spark.operators import (
    custom,
)
from complex_data_pipeline_with_joins_and_multi_table_operations_spark.plans.pipeline import (
    Warehouse,
)
from complex_data_pipeline_with_joins_and_multi_table_operations_spark.sources import (
    Catalog,
)

SF_DIR = "/root/testdata/sf0.001"


def test_user_median_exact(spark):
    ev = spark.createDataFrame(
        [(1, 1, 1.0), (2, 1, 3.0), (3, 1, 100.0), (4, 2, 5.0), (5, 2, 7.0)],
        "event_id long, user_id long, value double",
    )
    rows = {r.user_id: r for r in custom.user_median_value(ev).collect()}
    assert rows[1].median_value == 3.0 and rows[1].n_events == 3
    assert rows[2].median_value == 6.0  # interpolated even-count median


def test_salted_agg_equals_direct(cat):
    """Salting must not change results — only the shuffle layout."""
    salted = custom.salted_event_type_agg(cat.events)
    direct = cat.events.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        (
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double") / F.count("*")
        ).alias("avg_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )
    assert salted.exceptAll(direct).count() == 0
    assert direct.exceptAll(salted).count() == 0


def test_salted_agg_plan_has_two_aggregations(cat):
    plan = custom.salted_event_type_agg(cat.events)._jdf.queryExecution().executedPlan().toString()
    # two-stage: partial on (event_type, salt), final on event_type
    assert plan.count("HashAggregate") >= 4  # 2 logical aggs x partial/final


def test_snapshot_time_travel(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    orders = Catalog(spark, SF_DIR).orders
    v1 = wh.write_snapshot(orders.limit(100), "orders_snap")
    v2 = wh.write_snapshot(orders.limit(250), "orders_snap")
    assert (v1, v2) == (1, 2)
    assert wh.read_snapshot("orders_snap", 1).count() == 100
    assert wh.read_snapshot("orders_snap").count() == 250  # latest
    assert wh.versions("orders_snap") == [1, 2]
    with pytest.raises(ValueError, match="no version 9"):
        wh.read_snapshot("orders_snap", 9)
    with pytest.raises(FileNotFoundError):
        wh.read_snapshot("never_written")
