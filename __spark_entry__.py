"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from complex_data_pipeline_with_joins_and_multi_table_operations_spark.plans import (
    ORACLES,
    QUERIES,
)

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the denormalized star fact (role-playing nation dim
    joined twice + date dim) aggregated to the top-50 nation pairs —
    the reference pipeline's full physical repertoire in one plan
    (scan → broadcast joins ×3 → hash agg → TakeOrderedAndProject)."""
    return QUERIES["top_pairs"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+extensions)."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query — EVERY registry query
    since round 8, including the iterative/hash-seeded families
    (k-means, PQ, SimHash, hyperplane LSH: md5 is the shared hash,
    folds and exact-decimal sums the shared arithmetic) and the
    from-scratch sketches (KMV, HLL, CMS, gk_quantiles — approximate
    algorithms with exact oracles). approx_event_stats, the last
    rows-only row, is now COMPOSED from the oracled md5-HLL +
    GK-summary twins; the native HLL++/percentile_approx version lives
    in pytest (tests/test_round2.py) where its error bounds are
    asserted — native sketches are engine-internal and can never be
    hash-oracled."""
    return dict(ORACLES)
