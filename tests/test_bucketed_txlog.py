"""Round-8 bucketed-table DDL surface (verdict task 9): bucketBy as a
first-class txlog table property — written through Spark's bucketed
writer, recorded in the commit log, surfaced in DESCRIBE DETAIL, and
readable as a session-catalog bucketed relation whose joins/aggregations
on the bucket key plan with ZERO Exchange (the shuffle is paid once at
write time — the 100 TB fact-join contract that
test_bucketed_join_has_no_shuffle demonstrated with throwaway catalog
tables, now a durable table format property)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from complex_data_pipeline_with_joins_and_multi_table_operations_spark.plans.pipeline import (
    TxLogWarehouse,
)
from complex_data_pipeline_with_joins_and_multi_table_operations_spark.sources.txlog import (
    TableLog,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _no_broadcast(spark):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    return prev


def test_bucketed_txlog_roundtrip_and_detail(spark, tmp_path):
    log = TableLog(spark, str(tmp_path / "t"))
    df = spark.createDataFrame(
        [(i, i % 7, f"v{i}") for i in range(200)], "k long, g long, s string"
    )
    v = log.write(df, bucket_by=(8, ["k"]), sort_by=["k"])
    assert v == 1
    snap = log.snapshot()
    assert snap.bucket_by == {"n": 8, "cols": ["k"], "sort": ["k"]}
    # plain read: values identical (bucketing is a physical property)
    assert sorted(r.k for r in log.read().collect()) == list(range(200))
    # bucketed read: same values, catalog-bucketed relation
    bdf = log.read_bucketed()
    assert sorted(r.k for r in bdf.collect()) == list(range(200))
    assert set(bdf.columns) == {"k", "g", "s"}
    # DESCRIBE DETAIL carries CLUSTERED BY
    wh = TxLogWarehouse(spark, str(tmp_path))
    d = wh.sql("DESCRIBE DETAIL t").head()
    assert list(d.clustered_by) == ["k"] and d.num_buckets == 8


def test_bucketed_txlog_join_has_no_shuffle(spark, tmp_path):
    """Two bucketed txlog tables co-bucketed on the join key join with
    no Exchange — the durable-table version of
    test_bucketed_join_has_no_shuffle."""
    a = TableLog(spark, str(tmp_path / "a"))
    b = TableLog(spark, str(tmp_path / "b"))
    a.write(
        spark.createDataFrame(
            [(i, i * 10) for i in range(500)], "k long, va long"
        ),
        bucket_by=(8, ["k"]),
        sort_by=["k"],
    )
    b.write(
        spark.createDataFrame(
            [(i, i * 100) for i in range(0, 500, 2)], "k long, vb long"
        ),
        bucket_by=(8, ["k"]),
        sort_by=["k"],
    )
    prev = _no_broadcast(spark)
    try:
        j = a.read_bucketed().join(b.read_bucketed(), "k")
        plan = _plan(j)
        assert "Exchange hashpartitioning" not in plan
        assert j.count() == 250
        # aggregation on the bucket key is exchange-free too
        g = a.read_bucketed().groupBy("k").agg(F.sum("va").alias("s"))
        assert "Exchange" not in _plan(g)
        assert g.count() == 500
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_txlog_row_level_dml_keeps_layout(spark, tmp_path):
    """Round 10: copy-on-write row-level DML works ON bucketed tables —
    rewritten candidates re-stage through the BUCKETED writer, so the
    mutated table still joins with zero Exchange; merge-on-read requests
    transparently take the CoW path (dv masks would put an anti-join on
    top of the bucketed scan and break its contract)."""
    log = TableLog(spark, str(tmp_path / "dml"))
    other = TableLog(spark, str(tmp_path / "dim"))
    n = 500
    df = spark.createDataFrame(
        [(i, i * 10) for i in range(n)], "k long, v long"
    )
    log.write(df.repartition(4), bucket_by=(4, ["k"]))
    other.write(
        spark.createDataFrame([(i, f"d{i}") for i in range(n)],
                              "k long, name string").repartition(4),
        bucket_by=(4, ["k"]),
    )
    log.delete([("k", "==", 1)])
    log.update([("k", "==", 2)], {"v": "v + 100000"})
    chg = spark.createDataFrame(
        [(3, -3), (n + 7, 777)], "k long, v long"
    )
    log.merge(chg, ["k"])
    snap = log.snapshot()
    assert snap.bucket_by == {"n": 4, "cols": ["k"], "sort": []}
    got = {r.k: r.v for r in log.read_bucketed().collect()}
    assert 1 not in got
    assert got[2] == 20 + 100000 and got[3] == -3 and got[n + 7] == 777
    # zero-Exchange co-bucketed join SURVIVES the mutations
    prev = _no_broadcast(spark)
    try:
        j = log.read_bucketed().join(other.read_bucketed(), "k")
        assert "Exchange hashpartitioning" not in _plan(j)
        assert j.count() == n - 1  # k=1 deleted; k=n+7 has no dim row
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    # merge-on-read on bucketed tables (round 11): vectors record, NO
    # host file rewrites — the CDC-trickle-into-bucketed-fact shape
    res = log.delete([("k", "==", 3)], via="dv")
    assert res["files_rewritten"] == 0
    assert sum(len(v) for v in log.snapshot().dvs.values()) >= 1
    log.update([("k", "==", 4)], {"v": "0"}, via="dv")
    log.merge(chg.filter("k = 3"), ["k"], via="dv")
    log.merge(
        chg, ["k"], via="dv",
        matched_clauses=[{"action": "update", "condition": None,
                          "set": {"v": "s.v"}}],
    )
    assert log.snapshot().bucket_by == {"n": 4, "cols": ["k"], "sort": []}
    got = {r.k: r.v for r in log.read_bucketed().collect()}
    assert got[4] == 0 and got[3] == -3
    # the zero-Exchange co-bucketed join SURVIVES live deletion vectors
    # (the broadcast anti-join mask preserves the bucketed scan's
    # output partitioning) — the round-11 plan contract
    assert sum(len(v) for v in log.snapshot().dvs.values()) >= 1
    prev = _no_broadcast(spark)
    try:
        j = log.read_bucketed().join(other.read_bucketed(), "k")
        assert "Exchange hashpartitioning" not in _plan(j)
        assert {r.k: r.v for r in j.collect()}[4] == 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_txlog_ddl_guards_still_refuse(spark, tmp_path):
    log = TableLog(spark, str(tmp_path / "t"))
    df = spark.createDataFrame([(1, 2)], "k long, v long")
    log.write(df, bucket_by=(4, ["k"]))
    # OPTIMIZE compacts THROUGH the bucketed writer (layout preserved)
    v_opt = log.optimize()
    snap_opt = log.snapshot()
    assert snap_opt.version == v_opt
    assert snap_opt.bucket_by == {"n": 4, "cols": ["k"], "sort": []}
    assert log.read_bucketed().count() == 1
    with pytest.raises(ValueError, match="bucket"):
        log.optimize(zorder_by=["v"])
    with pytest.raises(ValueError, match="bucket column"):
        log.rename_column("k", "k2")
    with pytest.raises(ValueError, match="bucket column"):
        log.drop_column("k")
    # a full overwrite may re-layout (bucketed -> plain or re-bucketed)
    v = log.write(df)
    assert log.snapshot().bucket_by == {}
    log.write(df, mode="append")  # plain table: appends work
    # RESTORE to the bucketed version round-trips the layout
    log.restore(1)
    assert log.snapshot().bucket_by == {"n": 4, "cols": ["k"], "sort": []}
    assert log.read_bucketed().count() == 1
    assert v  # silence lints


def test_bucketed_append_preserves_layout(spark, tmp_path):
    """Round 9 (verdict task 3): append to a bucketed table stages
    through the same bucketed writer, new files JOIN the existing bucket
    layout, and the co-bucketed join on the grown table still plans zero
    Exchange. Mismatched specs refuse; time travel and RESTORE stay
    version-exact."""
    log = TableLog(spark, str(tmp_path / "t"))
    other = TableLog(spark, str(tmp_path / "o"))
    df1 = spark.createDataFrame(
        [(i, i * 10) for i in range(300)], "k long, v long"
    )
    df2 = spark.createDataFrame(
        [(i, i * 10) for i in range(300, 500)], "k long, v long"
    )
    log.write(df1, bucket_by=(8, ["k"]), sort_by=["k"])
    v2 = log.write(df2, mode="append")
    assert v2 == 2
    snap = log.snapshot()
    assert snap.bucket_by == {"n": 8, "cols": ["k"], "sort": ["k"]}
    # values: plain and bucketed reads agree, all 500 rows
    assert sorted(r.k for r in log.read().collect()) == list(range(500))
    assert sorted(r.k for r in log.read_bucketed().collect()) == list(
        range(500)
    )
    # time travel: the pre-append snapshot still reads exactly 300 rows
    # through BOTH paths (the bucket view is per-version)
    assert log.read(1).count() == 300
    assert log.read_bucketed(version=1).count() == 300
    # the grown table still joins exchange-free against a co-bucketed twin
    other.write(
        spark.createDataFrame(
            [(i, i * 7) for i in range(0, 500, 2)], "k long, w long"
        ),
        bucket_by=(8, ["k"]),
        sort_by=["k"],
    )
    prev = _no_broadcast(spark)
    try:
        j = log.read_bucketed().join(other.read_bucketed(), "k")
        assert "Exchange hashpartitioning" not in _plan(j)
        assert j.count() == 250
        g = log.read_bucketed().groupBy("k").count()
        assert "Exchange" not in _plan(g) and g.count() == 500
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    # mismatched explicit specs refuse loudly
    with pytest.raises(ValueError, match="standing layout"):
        log.write(df2, mode="append", bucket_by=(4, ["k"]))
    with pytest.raises(ValueError, match="standing layout"):
        log.write(df2, mode="append", bucket_by=(8, ["v"]))
    with pytest.raises(ValueError, match="sort spec"):
        log.write(df2, mode="append", bucket_by=(8, ["k"]), sort_by=["v"])
    # matching explicit spec is accepted (idempotent declaration)
    v4 = log.write(
        spark.createDataFrame([(500, 0)], "k long, v long"),
        mode="append",
        bucket_by=(8, ["k"]),
        sort_by=["k"],
    )
    assert log.read_bucketed().count() == 501
    # bucketing an UNBUCKETED table via append refuses
    plain = TableLog(spark, str(tmp_path / "p"))
    plain.write(df1)
    with pytest.raises(ValueError, match="already be bucketed"):
        plain.write(df2, mode="append", bucket_by=(8, ["k"]))
    # OPTIMIZE compacts the multi-directory layout back to one directory
    v_opt = log.optimize()
    assert v_opt == v4 + 1
    assert log.read_bucketed().count() == 501
    assert log.snapshot().bucket_by == {"n": 8, "cols": ["k"], "sort": ["k"]}
    # RESTORE to the multi-directory version still reads bucketed
    log.restore(2)
    assert log.read_bucketed().count() == 500


def test_ctas_sql_with_and_without_bucketing(spark, tmp_path):
    """CREATE TABLE … AS SELECT through Warehouse.sql — plain, partitioned,
    and CLUSTERED BY … INTO n BUCKETS (txlog only; the base backend
    refuses the bucket clause loudly)."""
    from complex_data_pipeline_with_joins_and_multi_table_operations_spark.plans.pipeline import (
        Warehouse,
    )

    wh = TxLogWarehouse(spark, str(tmp_path / "wh"))
    wh.write_snapshot(
        spark.createDataFrame(
            [(i, i % 3, i * 10) for i in range(60)], "k long, g long, v long"
        ),
        "src",
    )
    r = wh.sql(
        "CREATE TABLE t1 AS SELECT k, v FROM src WHERE k < 30"
    ).head()
    assert r.operation == "CREATE TABLE AS" and r.version == 1
    assert wh.read_snapshot("t1").count() == 30
    r = wh.sql(
        "CREATE TABLE t2 CLUSTERED BY (k) SORTED BY (k) INTO 4 BUCKETS "
        "AS SELECT k, v FROM src"
    ).head()
    assert r.version == 1
    d = wh.sql("DESCRIBE DETAIL t2").head()
    assert list(d.clustered_by) == ["k"] and d.num_buckets == 4
    prev = _no_broadcast(spark)
    try:
        j = wh.read_bucketed("t2").groupBy("k").count()
        assert "Exchange" not in _plan(j) and j.count() == 60
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    # the SELECT runs through .sql(): time travel resolves inside CTAS
    wh.write_snapshot(
        spark.createDataFrame([(99, 0, 0)], "k long, g long, v long"), "src"
    )
    wh.sql("CREATE TABLE t3 AS SELECT k FROM src VERSION AS OF 1")
    assert wh.read_snapshot("t3").count() == 60
    # base backend: plain CTAS works, the bucket clause refuses
    base = Warehouse(spark, str(tmp_path / "base"))
    base.write_snapshot(spark.createDataFrame([(1,)], "k long"), "s")
    assert base.sql("CREATE TABLE b1 AS SELECT * FROM s").head().version == 1
    with pytest.raises(ValueError, match="txlog backend"):
        base.sql(
            "CREATE TABLE b2 CLUSTERED BY (k) INTO 2 BUCKETS "
            "AS SELECT * FROM s"
        )


def test_ctas_refuses_existing_table_unless_or_replace(spark, tmp_path):
    """Round 9 (ADVICE): a bare CTAS on an existing table must never
    clobber its data (Spark/Delta/Iceberg TableAlreadyExists semantics);
    CREATE OR REPLACE TABLE … AS is the explicit-overwrite form — on
    both backends."""
    from complex_data_pipeline_with_joins_and_multi_table_operations_spark.plans.pipeline import (
        Warehouse,
    )

    for wh in (
        TxLogWarehouse(spark, str(tmp_path / "tx")),
        Warehouse(spark, str(tmp_path / "base")),
    ):
        wh.write_snapshot(
            spark.createDataFrame([(i,) for i in range(5)], "k long"), "src"
        )
        wh.sql("CREATE TABLE t AS SELECT * FROM src WHERE k < 3")
        assert wh.read_snapshot("t").count() == 3
        with pytest.raises(ValueError, match="already exists"):
            wh.sql("CREATE TABLE t AS SELECT * FROM src")
        assert wh.read_snapshot("t").count() == 3  # untouched
        r = wh.sql("CREATE OR REPLACE TABLE t AS SELECT * FROM src").head()
        assert r.operation == "CREATE OR REPLACE TABLE AS"
        assert wh.read_snapshot("t").count() == 5


def test_pyds_writes_respect_bucket_layout(spark, tmp_path):
    """format('txlog') writes cannot silently break a bucketed layout:
    appends refuse (their files carry no bucket tags), and a DataSource
    overwrite RESETS bucket_by alongside the active set — stale layout
    metadata must never point read_bucketed at untagged files."""
    from complex_data_pipeline_with_joins_and_multi_table_operations_spark.sources.pyds import (
        register_txlog,
    )

    register_txlog(spark)
    root = str(tmp_path / "t")
    log = TableLog(spark, root)
    df = spark.createDataFrame([(1, 2)], "k long, v long")
    log.write(df, bucket_by=(4, ["k"]))
    with pytest.raises(Exception, match="bucket"):
        df.write.format("txlog").mode("append").save(root)
    assert log.snapshot().bucket_by  # nothing committed
    df.write.format("txlog").mode("overwrite").save(root)
    assert log.snapshot().bucket_by == {}
    with pytest.raises(ValueError, match="not bucketed"):
        log.read_bucketed()
    assert log.read().count() == 1


def test_bucketed_txlog_time_travel(spark, tmp_path):
    log = TableLog(spark, str(tmp_path / "t"))
    df1 = spark.createDataFrame([(i,) for i in range(10)], "k long")
    df2 = spark.createDataFrame([(i,) for i in range(20)], "k long")
    log.write(df1, bucket_by=(4, ["k"]))
    log.write(df2)  # plain overwrite drops the layout
    assert log.read_bucketed(version=1).count() == 10
    with pytest.raises(ValueError, match="not bucketed"):
        log.read_bucketed()
    assert log.read(1).count() == 10 and log.read().count() == 20


def test_trade_graph_composition_over_bucketed_edges(spark, tmp_path):
    """The trade_pagerank inner loop over a PERSISTED bucketed edge
    table: the per-round contribution join and the degree aggregation
    both plan with zero Exchange on the edge side — the cluster-scale
    shape graph.py's docstring points at."""
    from complex_data_pipeline_with_joins_and_multi_table_operations_spark.sources import (
        Catalog,
    )

    cat = Catalog(spark, "/root/testdata/sf0.001")
    pairs = (
        cat.orders.join(
            cat.lineitem, cat.orders.o_orderkey == cat.lineitem.l_orderkey
        )
        .select(
            (F.col("o_custkey") * 2).alias("c"),
            (F.col("l_suppkey") * 2 + 1).alias("s"),
        )
        .distinct()
    )
    log = TableLog(spark, str(tmp_path / "edges"))
    log.write(pairs, bucket_by=(8, ["c"]), sort_by=["c"])
    edges = log.read_bucketed()
    prev = _no_broadcast(spark)
    try:
        deg = edges.groupBy("c").agg(F.count(F.lit(1)).alias("outdeg"))
        assert "Exchange" not in _plan(deg)  # degree derivation: in place
        mass = deg.select("c", F.lit(1000).alias("mass"))
        contrib = (
            edges.join(deg, "c")
            .join(mass, "c")
            .select("s", F.expr("mass div outdeg").alias("contrib"))
        )
        # the edge relation is never exchanged: the only hash exchanges
        # in the plan may touch the node-sized mass side, not the scan
        plan = _plan(contrib)
        scan_side = plan.split("Scan parquet")[0]
        assert "Exchange hashpartitioning(c" not in scan_side
        assert contrib.count() == pairs.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
