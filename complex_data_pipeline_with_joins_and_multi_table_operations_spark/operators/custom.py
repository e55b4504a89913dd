"""Custom grouped/stateful operators — the escape hatch for semantics the
built-in operators can't express (SURVEY.md §7.4: only where built-ins
genuinely fall short, always Arrow-batched, never row-at-a-time Python).

Includes the skew-salting pattern for hot-key aggregation: at 100 TB a
groupBy on a low-cardinality key (5 event types) concentrates each key in
one reducer; salting fans each key across N partial groups and a second
cheap aggregation merges the partials. Results are identical because the
measures used are decomposable (count/sum → sum of partials, min/max →
min/max of partials).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIAN_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("median_value", DoubleType()),
    ]
)


def user_median_value(events: DataFrame) -> DataFrame:
    """Exact per-user median via applyInPandas (grouped-map pandas UDF).

    Exact median needs the whole group in memory — the canonical case for
    applyInPandas: Spark shuffles on the grouping key, ships each group as
    one Arrow batch, pandas/numpy computes, results come back as a
    DataFrame. Spark's built-in alternative (percentile_approx) trades
    exactness for streaming computation; this operator is the exact form.
    Interpolation for even group sizes is numpy's mean-of-middle-two —
    identical to ANSI/DuckDB median semantics.
    """

    def _median(pdf):
        # self-contained closure (workers can't import this package)
        import pandas as _pd

        return _pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "n_events": [len(pdf)],
                "median_value": [float(pdf["value"].median())],
            }
        )

    return events.select("user_id", "value").groupBy("user_id").applyInPandas(
        _median, schema=MEDIAN_SCHEMA
    )


SALT_BUCKETS = 16


def salted_event_type_agg(events: DataFrame, n_salts: int = SALT_BUCKETS) -> DataFrame:
    """Two-stage skew-safe aggregation on a hot low-cardinality key.

    Stage 1 groups on (event_type, salt) — salt derived deterministically
    from event_id so the result is reproducible — spreading each hot key
    over ``n_salts`` reducers; stage 2 merges the tiny partials. The
    measures decompose exactly: count = Σ partial counts, sum = Σ partial
    sums (exact-decimal, so re-association is lossless), min/max = over
    partial min/max.
    """
    salted = events.withColumn("salt", (F.col("event_id") % n_salts).cast("int"))
    partial = salted.groupBy("event_type", "salt").agg(
        F.count("*").alias("pc"),
        F.sum(F.col("value").cast("decimal(18,2)")).alias("ps"),
        F.min("value").alias("pmin"),
        F.max("value").alias("pmax"),
    )
    return partial.groupBy("event_type").agg(
        F.sum("pc").alias("n_events"),
        F.sum("ps").cast("double").alias("total_value"),
        (F.sum("ps").cast("double") / F.sum("pc")).alias("avg_value"),
        F.min("pmin").alias("min_value"),
        F.max("pmax").alias("max_value"),
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    n_salts: int = SALT_BUCKETS,
) -> DataFrame:
    """Skew-safe equi-join: a hot key on the LEFT (fact) side would send
    its entire partition to one reducer in a plain SortMergeJoin. Salting
    splits each left key into ``n_salts`` sub-keys and replicates each
    RIGHT row ``n_salts`` times — the shuffle then spreads a hot key over
    n_salts reducers at the cost of an n_salts× right-side blowup (use
    for right sides that are too big to broadcast but far smaller than
    the fact; AQE's skew-join handles the moderate cases without any of
    this).

    The salt carries a per-row unique component (partition id + row id),
    NOT a hash of the row's values: value-hash salting silently collapses
    back to one reducer exactly when the hot key's rows are identical
    (the classic boilerplate-duplicate corpus). The join OUTPUT is salt-
    independent — every salt value matches the same replicated right row
    — so nondeterminism in row ids never reaches the result.

    Semantics: plain inner equi-join (asserted equal in tests). Output
    drops the salt columns and the duplicate right key.
    """
    salted_left = left.withColumn(
        "_salt",
        F.pmod(
            F.xxhash64(F.spark_partition_id(), F.monotonically_increasing_id()),
            F.lit(n_salts),
        ),
    )
    salted_right = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = salted_left.join(
        salted_right,
        (salted_left[left_key] == salted_right[right_key])
        & (salted_left["_salt"] == salted_right["_salt"]),
    )
    return out.drop("_salt").drop(salted_right[right_key])
