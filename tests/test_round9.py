"""Round-9 surface: the widened SQL DML WHERE grammar (IN / IS [NOT]
NULL / != / NOT) with its stats pruning — membership via min/max,
null tests via the exact per-file null counts the footer harvest
records — plus the pyds filter translation upgrade."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from complex_data_pipeline_with_joins_and_multi_table_operations_spark.sources.txlog import (
    TableLog,
    _may_match,
)


def _meta(lo, hi, nulls=0, rows=10, nulls_ok=True, pvals=None):
    return {
        "partition_values": pvals or {},
        "rows": rows,
        "stats": {
            "c": {"min": lo, "max": hi, "nulls": nulls, "nulls_ok": nulls_ok}
        },
    }


def test_may_match_new_ops_stats():
    m = _meta(10, 20)
    # membership: any value in [min,max] keeps the file
    assert _may_match(m, ("c", "in", (1, 15)))
    assert not _may_match(m, ("c", "in", (1, 2, 99)))
    assert not _may_match(m, ("c", "in", ()))
    # != skips only a min==max==val file (nulls never block the skip:
    # NULL != v is not TRUE either)
    assert _may_match(m, ("c", "!=", 15))
    pinned = _meta(7, 7, nulls=3)
    assert not _may_match(pinned, ("c", "!=", 7))
    assert _may_match(pinned, ("c", "!=", 8))
    # notin mirrors !=
    assert not _may_match(pinned, ("c", "notin", (7, 9)))
    assert _may_match(pinned, ("c", "notin", (8, 9)))
    assert _may_match(m, ("c", "notin", (7,)))


def test_may_match_null_ops():
    # exact null counts: isnull skips nulls==0, notnull skips all-null
    assert not _may_match(_meta(1, 5, nulls=0), ("c", "isnull", None))
    assert _may_match(_meta(1, 5, nulls=2), ("c", "isnull", None))
    assert _may_match(_meta(1, 5, nulls=2, rows=10), ("c", "notnull", None))
    assert not _may_match(
        _meta(None, None, nulls=10, rows=10), ("c", "notnull", None)
    )
    # unknown null counts (old logs / missing footer counts): keep
    assert _may_match(
        _meta(1, 5, nulls=0, nulls_ok=False), ("c", "isnull", None)
    )
    assert _may_match(
        _meta(None, None, nulls=10, nulls_ok=False), ("c", "notnull", None)
    )
    # column with no stats at all: keep
    assert _may_match({"partition_values": {}, "stats": {}}, ("c", "isnull", None))


def test_may_match_new_ops_partition_values():
    pm = {"partition_values": {"p": "3"}, "stats": {}}
    assert _may_match(pm, ("p", "in", (3, 9)))
    assert not _may_match(pm, ("p", "in", (4, 9)))
    assert _may_match(pm, ("p", "!=", 4))
    assert not _may_match(pm, ("p", "!=", 3))
    assert _may_match(pm, ("p", "notin", (4, 5)))
    assert not _may_match(pm, ("p", "notin", (3, 5)))
    assert not _may_match(pm, ("p", "isnull", None))
    assert _may_match(pm, ("p", "notnull", None))
    nulled = {"partition_values": {"p": None}, "stats": {}}
    assert _may_match(nulled, ("p", "isnull", None))
    assert not _may_match(nulled, ("p", "notnull", None))
    assert not _may_match(nulled, ("p", "in", (1, 2)))


def test_in_delete_prunes_files(spark, tmp_path):
    """A point IN-list DELETE on a partitioned table rewrites only the
    partitions holding listed values — first-class membership pruning,
    no between-collapse keeping every in-range file."""
    log = TableLog(spark, str(tmp_path / "t"))
    df = spark.createDataFrame(
        [(i, i % 8, i * 10) for i in range(80)], "k long, p long, v long"
    )
    log.write(df, partition_by=["p"])
    res = log.delete([("p", "in", (1, 6))])
    assert res["files_skipped"] >= 6  # p in {0,2,3,4,5,7} untouched
    assert res["rows_deleted"] == 20
    assert {r.p for r in log.read().collect()} == {0, 2, 3, 4, 5, 7}


def test_isnull_delete_prunes_null_free_files(spark, tmp_path):
    """IS NULL row ops skip files whose footer null count is zero —
    the null-count pruning path."""
    log = TableLog(spark, str(tmp_path / "t"))
    with_nulls = spark.createDataFrame(
        [(i, None if i % 2 == 0 else i) for i in range(10)],
        "k long, w long",
    ).coalesce(1)
    no_nulls = spark.createDataFrame(
        [(i, i) for i in range(100, 110)], "k long, w long"
    ).coalesce(1)
    log.write(with_nulls)
    log.write(no_nulls, mode="append")
    res = log.delete([("w", "isnull", None)])
    assert res["rows_deleted"] == 5
    assert res["files_skipped"] >= 1  # the null-free file never rewritten
    assert log.read().count() == 15
    # IS NOT NULL prunes the all-null file
    log2 = TableLog(spark, str(tmp_path / "t2"))
    all_null = spark.createDataFrame(
        [(i, None) for i in range(5)], "k long, w long"
    ).coalesce(1)
    log2.write(no_nulls)
    log2.write(all_null, mode="append")
    res2 = log2.delete([("w", "notnull", None)])
    assert res2["rows_deleted"] == 10
    assert res2["files_skipped"] >= 1
    assert log2.read().count() == 5


def test_sql_dml_in_null_grammar_end_to_end(spark, tmp_path):
    """DELETE/UPDATE through the SQL verb with the round-9 leaves:
    IN-list, IS [NOT] NULL, !=, NOT — results equal Spark-filter
    semantics including tri-state NULL handling."""
    from complex_data_pipeline_with_joins_and_multi_table_operations_spark.plans.pipeline import (
        TxLogWarehouse,
    )

    wh = TxLogWarehouse(spark, str(tmp_path / "wh"))
    rows = [
        (i, None if i % 4 == 0 else i % 5, f"u{i}") for i in range(40)
    ]
    wh.write_snapshot(
        spark.createDataFrame(rows, "k long, b long, s string"), "t"
    )
    wh.sql("DELETE FROM t WHERE k IN (1, 2, 3) OR b IS NULL")
    surviving = {r.k for r in wh.sql("SELECT k FROM t").collect()}
    assert surviving == {
        k for k, b, _ in rows if not (k in (1, 2, 3) or b is None)
    }
    wh.sql("UPDATE t SET s = 'hit' WHERE b != 2 AND k NOT IN (5, 6)")
    hit = {r.k for r in wh.sql("SELECT k FROM t WHERE s = 'hit'").collect()}
    want = {
        k
        for k, b, _ in rows
        if k in surviving and b is not None and b != 2 and k not in (5, 6)
    }
    assert hit == want
    # NOT over a leaf, and IS NOT NULL
    wh.sql("DELETE FROM t WHERE NOT k < 30 AND b IS NOT NULL")
    left = {r.k for r in wh.sql("SELECT k FROM t").collect()}
    assert left == {
        k for k, b, _ in rows if k in surviving and not (k >= 30 and b is not None)
    }


def test_pyds_translate_filters_round9():
    from pyspark.sql.datasource import (
        EqualTo,
        In,
        IsNotNull,
        IsNull,
        LessThan,
        Not,
    )

    from complex_data_pipeline_with_joins_and_multi_table_operations_spark.sources.pyds import (
        translate_filters,
    )

    got = translate_filters(
        [
            EqualTo(("a",), 1),
            In(("b",), (1, None, 3)),
            IsNull(("c",)),
            IsNotNull(("d",)),
            Not(EqualTo(("e",), 7)),
            Not(In(("f",), (1, 2))),
            Not(IsNull(("g",))),
            Not(LessThan(("h",), 4)),
        ]
    )
    assert got == [
        ("a", "==", 1),
        ("b", "in", (1, 3)),
        ("c", "isnull", None),
        ("d", "notnull", None),
        ("e", "!=", 7),
        ("f", "notin", (1, 2)),
        ("g", "notnull", None),
        ("h", ">=", 4),
    ]


def test_pyds_scan_prunes_and_matches_with_new_filters(spark, tmp_path):
    """format('txlog') scans with IN / IS NULL predicates: results match
    (Spark re-applies every filter — pruning is only I/O)."""
    from complex_data_pipeline_with_joins_and_multi_table_operations_spark.sources.pyds import (
        register_txlog,
    )

    register_txlog(spark)
    root = str(tmp_path / "t")
    log = TableLog(spark, root)
    rows = [(i, None if i % 3 == 0 else i * 2) for i in range(30)]
    log.write(spark.createDataFrame(rows, "k long, w long").repartition(4))
    df = spark.read.format("txlog").load(root)
    assert df.filter(F.col("k").isin(3, 7, 11)).count() == 3
    assert df.filter(F.col("w").isNull()).count() == 10
    assert df.filter(F.col("w").isNotNull() & (F.col("k") != 1)).count() == 19
