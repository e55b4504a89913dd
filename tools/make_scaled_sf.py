"""Build a scaled-up copy of a test scale-factor directory by replicating
each table R times with disjoint key ranges — the scaling-curvature probe
BASELINE.md records (sf0.1 → sf1-equivalent without a data generator).

Replication semantics:
- fixed-cardinality dims (region, nation) copy through unchanged, as a
  real TPC-H scale-up would;
- every other table gets copy c's surrogate/foreign keys offset by
  c * KEY_STRIDE, so referential joins land inside the same copy and key
  uniqueness survives;
- value columns (text, embeddings, timestamps, amounts) are left intact:
  copies are exact content duplicates, which deliberately stresses the
  dedup/LSH operators with dup-heavy buckets — the realistic failure
  mode their caps exist for.

Usage: python tools/make_scaled_sf.py SRC_SF_DIR OUT_DIR REPLICAS
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

KEY_STRIDE = 10_000_000

# per-table key columns to offset per copy
OFFSET_KEYS = {
    "region": [],
    "nation": [],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def replicate(df: DataFrame, keys: list[str], replicas: int) -> DataFrame:
    if not keys:
        return df
    copies = df.withColumn(
        "_copy", F.explode(F.array(*[F.lit(i) for i in range(replicas)]))
    )
    for k in keys:
        copies = copies.withColumn(
            k, (F.col(k) + F.col("_copy") * F.lit(KEY_STRIDE)).cast("long")
        )
    return copies.drop("_copy")


def main() -> None:
    src, out, replicas = sys.argv[1], sys.argv[2], int(sys.argv[3])
    from complex_data_pipeline_with_joins_and_multi_table_operations_spark import (
        get_spark,
    )

    spark = get_spark("scale-up")
    spark.sparkContext.setLogLevel("ERROR")
    # events carries INT64 TIMESTAMP(NANOS); read it raw and write the
    # same shape so downstream loaders see the original layout
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    os.makedirs(out, exist_ok=True)
    for table, keys in OFFSET_KEYS.items():
        df = spark.read.parquet(os.path.join(src, f"{table}.parquet"))
        scaled = replicate(df, keys, replicas)
        if keys:
            # write a parallel file layout: the source tables are single
            # files, and replicate() preserves that — a 10× table in one
            # parquet file scans as ONE task (under maxPartitionBytes),
            # serializing every downstream query. 1-2 super-linear bench
            # ratios traced back to exactly this.
            scaled = scaled.repartition(max(replicas, 8))
        scaled.write.mode("overwrite").parquet(os.path.join(out, f"{table}.parquet"))
        print(f"{table}: {df.count()} -> {scaled.count()}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
