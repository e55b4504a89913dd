"""Stateful streaming (applyInPandasWithState) and bucketed co-located
joins — the remaining scale-surface demonstrations."""

from __future__ import annotations

from pyspark.sql import functions as F

from complex_data_pipeline_with_joins_and_multi_table_operations_spark.sources import (
    Catalog,
)
from complex_data_pipeline_with_joins_and_multi_table_operations_spark.streaming import (
    run_running_totals,
)

SF_DIR = "/root/testdata/sf0.001"


def test_stateful_running_totals_equal_batch(spark, tmp_path):
    run_running_totals(
        spark,
        f"{SF_DIR}/events.parquet",
        str(tmp_path / "ckpt"),
        sink_table="rt_test",
    )
    # update-mode memory sink: last row per user is the final running total
    from pyspark.sql import Window

    sink = spark.table("rt_test")
    streamed = (
        sink.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("user_id").orderBy(F.desc("n_events"))
            ),
        )
        .filter(F.col("rn") == 1)
        .select("user_id", "n_events", "total_value_cents")
    )
    batch = (
        Catalog(spark, SF_DIR)
        .events.groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value") * 100).cast("long").alias("total_value_cents"),
        )
    )
    assert streamed.count() == batch.count()
    assert streamed.exceptAll(batch).count() == 0


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """Two tables bucketed+sorted on the join key join WITHOUT any
    Exchange: the co-location contract survives the write, which is the
    point of bucketing at 100 TB (the shuffle is paid once at write time,
    not on every join)."""
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    cat = Catalog(spark, SF_DIR)
    (
        cat.orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("b_orders")
    )
    (
        cat.lineitem.select("l_orderkey", "l_quantity", "l_extendedprice")
        .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("b_lineitem")
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("b_lineitem").join(
            spark.table("b_orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan  # co-located: no shuffle
        assert joined.count() == 6000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
