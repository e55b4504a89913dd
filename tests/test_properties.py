"""Property-based checks (hypothesis) for the engine's determinism
contracts — the properties the DuckDB-oracle comparison relies on."""

from __future__ import annotations

from decimal import Decimal

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from complex_data_pipeline_with_joins_and_multi_table_operations_spark.functions import (
    bucket_by_ranges,
)
from complex_data_pipeline_with_joins_and_multi_table_operations_spark.operators.aggregates import (
    exact_sum,
)

# money-grid doubles: 2-decimal values as produced by the test tables
money = st.integers(min_value=-(10**7), max_value=10**7).map(lambda c: c / 100.0)


@settings(max_examples=5, deadline=None)
@given(st.lists(money, min_size=1, max_size=200), st.integers(1, 7))
def test_exact_sum_is_partitioning_invariant(spark, values, parts):
    """The exact-decimal sum must be bit-identical regardless of how rows
    are partitioned — the property that makes cross-engine hashes stable."""
    df = spark.createDataFrame([(v,) for v in values], "v double")
    a = df.coalesce(1).agg(exact_sum("v", 2).alias("s")).head().s
    b = df.repartition(parts).agg(exact_sum("v", 2).alias("s")).head().s
    expected = float(sum(Decimal(f"{v:.2f}") for v in values))
    assert a == b == expected


@settings(max_examples=5, deadline=None)
@given(st.lists(st.integers(-300, 300), min_size=1, max_size=50))
def test_bucket_by_ranges_matches_python(spark, keys):
    buckets = [(1, 50, "A"), (51, 100, "B"), (101, 200, "C")]

    def py_bucket(k):
        for lo, hi, label in buckets:
            if lo <= k <= hi:
                return label
        return "other"

    df = spark.createDataFrame([(k,) for k in keys], "k int")
    got = df.select(
        "k", bucket_by_ranges(F.col("k"), buckets, "other").alias("b")
    ).collect()
    for row in got:
        assert row.b == py_bucket(row.k)


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 10**6), st.integers(0, 3)), min_size=1, max_size=60
    )
)
def test_sessionize_against_python_model(spark, raw):
    """Session boundaries must match a sequential single-machine model."""
    from complex_data_pipeline_with_joins_and_multi_table_operations_spark.operators.windows import (
        sessionize,
    )

    rows = [
        (i, user, ts_sec * 1_000_000, 1.0, "e")
        for i, (ts_sec, user) in enumerate(raw)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts_us long, value double, event_type string"
    )
    got = {
        (r.user_id, r.session_id): r.n_events
        for r in sessionize(df, gap_seconds=100).collect()
    }

    # python model: per user, sorted by (ts, event_id), split at gap > 100
    model: dict[tuple[int, int], int] = {}
    by_user: dict[int, list[tuple[int, int]]] = {}
    for i, (ts_sec, user) in enumerate(raw):
        by_user.setdefault(user, []).append((ts_sec, i))
    for user, evs in by_user.items():
        evs.sort()
        sid, prev = 0, None
        for ts_sec, _ in evs:
            if prev is None or ts_sec - prev > 100:
                sid += 1
            model[(user, sid)] = model.get((user, sid), 0) + 1
            prev = ts_sec
    assert got == model
