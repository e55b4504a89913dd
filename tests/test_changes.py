"""Change-management operators (operators/changes.py) and heavy hitters
(operators/text.py top_terms / approx_top_terms)."""

from __future__ import annotations

from pyspark.sql import functions as F

from complex_data_pipeline_with_joins_and_multi_table_operations_spark.operators import (
    changes,
    text,
)


def test_scd2_collapses_runs_and_dates_versions(spark):
    ev = spark.createDataFrame(
        [
            # user 1: a,a,b,a — three versions (runs collapse, returns reopen)
            (1, 10, "a"), (1, 20, "a"), (1, 30, "b"), (1, 40, "a"),
            # user 2: single event — one current version
            (2, 10, "x"),
        ],
        ["uid", "ts", "val"],
    )
    out = changes.scd2_history(ev, "uid", "val", ["ts"]).collect()
    rows = {(r.uid, r.version_no): r for r in out}
    assert len(out) == 4
    a1 = rows[(1, 1)]
    assert (a1.val, a1.valid_from, a1.valid_to, a1.is_current) == ("a", 10, 30, False)
    b = rows[(1, 2)]
    assert (b.val, b.valid_from, b.valid_to) == ("b", 30, 40)
    a2 = rows[(1, 3)]
    assert (a2.val, a2.valid_from, a2.valid_to, a2.is_current) == ("a", 40, None, True)
    assert rows[(2, 1)].is_current


def test_scd2_null_attribute_is_a_version_not_a_change_storm(spark):
    ev = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, None), (1, 30, None), (1, 40, "a")],
        ["uid", "ts", "val"],
    )
    out = sorted(
        changes.scd2_history(ev, "uid", "val", ["ts"]).collect(),
        key=lambda r: r.version_no,
    )
    # null run collapses into ONE version (eqNullSafe), bounded both sides
    assert [(r.val, r.valid_from, r.valid_to) for r in out] == [
        ("a", 10, 20), (None, 20, 40), ("a", 40, None),
    ]


def test_scd2_single_shuffle_plan(spark):
    ev = spark.createDataFrame([(1, 10, "a")], ["uid", "ts", "val"])
    out = changes.scd2_history(ev, "uid", "val", ["ts"])
    # both Window passes share one Exchange on the key — the change-row
    # filter preserves the hash distribution
    plan = out._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    assert plan.count("Exchange") == 1


def test_merge_upsert_update_insert_delete_branches(spark):
    target = spark.createDataFrame(
        [(1, "old", 10.0), (2, "keep", 20.0), (3, "doomed", 30.0)],
        ["k", "status", "amount"],
    )
    source = spark.createDataFrame(
        [(1, "new", 11.0), (4, "ins", 40.0), (3, "del", 0.0)],
        ["k", "status", "amount"],
    )
    out = changes.merge_upsert(
        target, source, ["k"], delete_condition=F.col("status") == "del"
    )
    got = sorted((r.k, r.status, r.amount) for r in out.collect())
    # 1 updated, 2 untouched, 3 DELETED (matched + delete), 4 inserted
    assert got == [(1, "new", 11.0), (2, "keep", 20.0), (4, "ins", 40.0)]


def test_merge_partial_aggregates_equals_full_recompute(spark, cat):
    li = cat.lineitem
    keys = ["l_returnflag", "l_linestatus"]
    split = F.col("l_orderkey") % 3 == 0  # arbitrary history/delta split
    mk = lambda df: df.groupBy(*keys).agg(  # noqa: E731
        F.count("*").alias("cnt"),
        changes.exact_sum("l_extendedprice", 2).alias("l_extendedprice"),
    )
    merged = changes.merge_partial_aggregates(
        mk(li.filter(split)),
        li.filter(~split),
        keys,
        sum_cols={"l_extendedprice": 2},
    )
    full = mk(li)
    m = {tuple(r[k] for k in keys): (r.cnt, r.l_extendedprice) for r in merged.collect()}
    f = {tuple(r[k] for k in keys): (r.cnt, r.l_extendedprice) for r in full.collect()}
    assert m == f  # bit-identical: counts and exact-decimal sums


def test_approx_top_terms_misra_gries_bounds(spark):
    # skewed synthetic corpus with known exact counts
    docs = spark.createDataFrame(
        [(i, ("hot " * 50 + f"noise{i} " + "warm " * 10).strip()) for i in range(200)],
        ["doc_id", "text"],
    ).repartition(8)
    n_tokens = 200 * (50 + 1 + 10)
    capacity = 64
    approx = {r.term: r.n for r in text.approx_top_terms(docs, k=5, capacity=capacity).collect()}
    exact = {r.term: r.n for r in text.top_terms(docs, k=5).collect()}
    assert exact["hot"] == 10000 and exact["warm"] == 2000
    bound = n_tokens / capacity  # additive across per-partition summaries
    for term in ("hot", "warm"):
        # true frequency far above n/capacity ⇒ must survive, with counts
        # in [exact - n/capacity, exact]
        assert term in approx
        assert exact[term] - bound <= approx[term] <= exact[term]
    # summaries stay bounded: at most `capacity` rows per partition (k is
    # one above the ceiling so the limit can't mask an overflow; a huge k
    # would make TakeOrderedAndProject size its buffer by k and OOM)
    ceiling = 8 * capacity
    raw = text.approx_top_terms(docs, k=ceiling + 1, capacity=capacity)
    assert raw.count() <= ceiling


def test_top_terms_deterministic_tiebreak(spark):
    docs = spark.createDataFrame(
        [(1, "b a"), (2, "a b c")], ["doc_id", "text"]
    )
    out = [(r.term, r.n) for r in text.top_terms(docs, k=2).collect()]
    assert out == [("a", 2), ("b", 2)]  # equal counts → term order
