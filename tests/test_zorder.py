"""Z-order clustering (operators/zorder.py) + txlog file skipping: range
filters on EVERY clustered column must prune files, where a linear sort
only serves its leading column."""

from __future__ import annotations

from pyspark.sql import functions as F

from complex_data_pipeline_with_joins_and_multi_table_operations_spark.operators.zorder import (
    z_order,
)
from complex_data_pipeline_with_joins_and_multi_table_operations_spark.sources.txlog import (
    TableLog,
)

N_FILES = 16


def _two_dim_df(spark):
    # x walks 0..999 cyclically; y is a decorrelated shuffle of the same
    # domain — linear sort on x leaves y spanning [0,999] in every file
    return spark.range(100_000).select(
        (F.col("id") % 1000).alias("x"),
        ((F.col("id") * 7919) % 1000).alias("y"),
        F.col("id").alias("payload"),
    )


def _files_scanned(log, col, lo, hi):
    return len(log.read(filters=[(col, "between", (lo, hi))]).inputFiles())


def test_zorder_prunes_on_both_columns(spark, tmp_path):
    df = _two_dim_df(spark)
    zlog = TableLog(spark, str(tmp_path / "z"))
    zlog.write(z_order(df, ["x", "y"], N_FILES))
    lin_log = TableLog(spark, str(tmp_path / "lin"))
    lin_log.write(df.repartitionByRange(N_FILES, "x").sortWithinPartitions("x"))

    n_z = len(zlog.snapshot().files)
    n_lin = len(lin_log.snapshot().files)
    assert n_z >= N_FILES and n_lin >= N_FILES

    # leading column: both layouts prune
    assert _files_scanned(lin_log, "x", 0, 99) <= n_lin // 2
    assert _files_scanned(zlog, "x", 0, 99) <= n_z // 2
    # second column: linear sort reads EVERYTHING, z-order still prunes
    assert _files_scanned(lin_log, "y", 0, 99) == n_lin
    assert _files_scanned(zlog, "y", 0, 99) <= n_z // 2

    # and the pruned reads stay exact
    assert zlog.read(filters=[("y", "between", (0, 99))]).count() == 10_000
    assert zlog.read(filters=[("x", "between", (0, 99))]).count() == 10_000


def test_zorder_preserves_rows_and_handles_nulls(spark, tmp_path):
    df = spark.createDataFrame(
        [(None, 5, 1), (3, None, 2), (7, 7, 3), (0, 0, 4), (999, 999, 5)],
        ["x", "y", "payload"],
    )
    out = z_order(df, ["x", "y"], 2)
    assert sorted(r.payload for r in out.collect()) == [1, 2, 3, 4, 5]
    assert set(out.columns) == {"x", "y", "payload"}


def test_zorder_constant_column_degrades_gracefully(spark):
    df = spark.range(100).select(F.lit(7).alias("x"), F.col("id").alias("y"))
    out = z_order(df, ["x", "y"], 4)
    assert out.count() == 100
