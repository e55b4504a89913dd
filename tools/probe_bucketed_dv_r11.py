"""Round-11 SCALING probe: merge-on-read on a BUCKETED table at 15M rows.

Measures, against a 32-bucket(o_custkey) 15M-row orders table built from
/tmp/sf10 (the round-10 probe's layout):

1. point DELETE via='dv'   -> wall time, files_rewritten (expect 0: the
   commit is pure metadata), vs the round-10 CoW point delete (5.5 s,
   1/32 files rewritten)
2. point UPDATE via='dv'   -> wall time, files_rewritten (expect 0; one
   tiny bucket-tagged post-image file appends)
3. read_bucketed() co-bucketed join WITH live deletion vectors ->
   assert zero shuffle Exchange in the executed plan, measure the join
4. 100-key clause-mode MERGE via='dv' -> wall time, files_rewritten

Usage: python tools/probe_bucketed_dv_r11.py [sf10_dir] > probe.json
"""

from __future__ import annotations

import json
import os
import re
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10"
    from pyspark.sql import SparkSession, functions as F

    from complex_data_pipeline_with_joins_and_multi_table_operations_spark.sources.txlog import (
        TableLog,
    )

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    out: dict = {"sf_dir": sf_dir}
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    n = orders.count()
    out["rows"] = n

    root = tempfile.mkdtemp(prefix="bdv15m_") + "/t"
    log = TableLog(spark, root)
    t0 = time.time()
    log.write(
        orders.select("o_orderkey", "o_custkey", "o_totalprice"),
        bucket_by=(32, ["o_custkey"]),
        bloom_cols=["o_orderkey"],
    )
    out["write_bucketed_s"] = round(time.time() - t0, 2)
    n_files = len(log.snapshot().files)
    out["files"] = n_files

    key = orders.select(F.max("o_orderkey")).head()[0] - 5

    t0 = time.time()
    res = log.delete([("o_orderkey", "==", int(key))], via="dv")
    out["dv_point_delete_s"] = round(time.time() - t0, 2)
    out["dv_point_delete_files_rewritten"] = res["files_rewritten"]
    out["dv_positions"] = sum(len(v) for v in log.snapshot().dvs.values())
    out["active_files_unchanged"] = len(log.snapshot().files) == n_files

    t0 = time.time()
    res = log.update(
        [("o_orderkey", "==", int(key) - 10)],
        {"o_totalprice": "o_totalprice * 2"},
        via="dv",
    )
    out["dv_point_update_s"] = round(time.time() - t0, 2)
    out["dv_point_update_files_rewritten"] = res["files_rewritten"]

    # co-bucketed join with LIVE vectors: zero shuffle Exchange
    dim_root = tempfile.mkdtemp(prefix="bdv15m_dim_") + "/d"
    dim = TableLog(spark, dim_root)
    dim.write(
        orders.select("o_custkey").distinct().withColumn(
            "seg", F.pmod(F.col("o_custkey"), F.lit(7))
        ),
        bucket_by=(32, ["o_custkey"]),
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = log.read_bucketed().join(dim.read_bucketed(), "o_custkey")
        t0 = time.time()
        out["join_rows"] = j.count()
        out["bucketed_join_with_dvs_s"] = round(time.time() - t0, 2)
        plan = j._jdf.queryExecution().executedPlan().toString()
        out["join_shuffle_exchanges"] = len(
            re.findall(r"Exchange (hash|range)partitioning", plan)
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    src = (
        orders.orderBy(F.desc("o_orderkey"))
        .limit(100)
        .select(
            "o_orderkey",
            (F.col("o_totalprice") + 1).alias("o_totalprice"),
        )
    )
    t0 = time.time()
    res = log.merge(
        src,
        ["o_orderkey"],
        matched_clauses=[
            {
                "action": "update",
                "condition": None,
                "set": {"o_totalprice": "s.o_totalprice"},
            }
        ],
        insert=False,  # the probe source carries matched keys only
        via="dv",
    )
    out["dv_merge_100keys_s"] = round(time.time() - t0, 2)
    out["dv_merge_files_rewritten"] = res["files_rewritten"]
    out["dv_positions_total"] = sum(
        len(v) for v in log.snapshot().dvs.values()
    )
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
