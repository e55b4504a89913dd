"""Fixed-point integer PageRank: pure-Python reference parity,
partition invariance, mass conservation, and centrality sanity."""

from __future__ import annotations

from collections import Counter

from complex_data_pipeline_with_joins_and_multi_table_operations_spark.operators import (
    graph,
)


def _ref_pagerank(edges: list[tuple[str, str]], iters: int) -> dict[str, int]:
    edges = sorted(set(edges))
    outdeg = Counter(s for s, _ in edges)
    mass = {n: graph.SCALE for p in edges for n in p}
    for _ in range(iters):
        ins: Counter = Counter()
        for s, d in edges:
            ins[d] += mass[s] // outdeg[s]
        mass = {n: graph.TELEPORT + 17 * ins.get(n, 0) // 20 for n in mass}
    return mass


EDGES = [
    ("a", "b"),
    ("b", "a"),
    ("b", "c"),
    ("c", "a"),
    ("d", "a"),  # d is a source-only node; c->a makes a a hub
    ("a", "d"),
]


def test_pagerank_matches_python_reference(spark):
    df = spark.createDataFrame(EDGES + EDGES[:2], "src string, dst string")
    got = {r.node: r.mass for r in graph.pagerank(df, iters=4).collect()}
    assert got == _ref_pagerank(EDGES, 4)


def test_pagerank_is_partition_invariant(spark):
    df = spark.createDataFrame(EDGES, "src string, dst string")
    a = sorted(map(tuple, graph.pagerank(df, iters=3).collect()))
    b = sorted(map(tuple, graph.pagerank(df.repartition(7), iters=3).collect()))
    assert a == b


def test_pagerank_mass_is_bounded_and_hub_wins(spark):
    # star: every leaf points at the hub and back
    edges = [("hub", f"l{i}") for i in range(10)] + [
        (f"l{i}", "hub") for i in range(10)
    ]
    df = spark.createDataFrame(edges, "src string, dst string")
    out = {r.node: r.mass for r in graph.pagerank(df, iters=3).collect()}
    assert max(out, key=out.get) == "hub"
    # floors only ever LEAK mass; teleport injects a fixed floor
    assert sum(out.values()) <= len(out) * graph.SCALE
    assert min(out.values()) >= graph.TELEPORT


def test_trade_graph_pagerank_on_tpch(spark, cat):
    pr = graph.pagerank(
        graph.trade_graph(cat.orders, cat.lineitem), iters=2, edges_distinct=True
    )
    rows = pr.collect()
    suppliers = [r for r in rows if r.node % 2 == 1]
    customers = [r for r in rows if r.node % 2 == 0]
    assert suppliers and customers
    assert len({r.node for r in rows}) == len(rows)
    # suppliers are the scarce side of the bipartite walk: each carries
    # more mass than any customer on this corpus
    assert min(r.mass for r in suppliers) > max(r.mass for r in customers)


def test_trade_pagerank_bit_equals_generic_composition(spark, cat):
    """graph.trade_pagerank (the pairs-cached bipartite shape — one pair
    materialization at half the edge rows, degree-key node set) must be
    BIT-IDENTICAL to pagerank(trade_graph(...)) — same masses, not
    merely close, since the integer trajectory admits no tolerance."""
    generic = sorted(
        map(
            tuple,
            graph.pagerank(
                graph.trade_graph(cat.orders, cat.lineitem),
                iters=3,
                edges_distinct=True,
            ).collect(),
        )
    )
    fused = sorted(
        map(
            tuple,
            graph.trade_pagerank(cat.orders, cat.lineitem, iters=3).collect(),
        )
    )
    assert generic == fused


def test_damping_split_form_matches_naive_over_full_bigint_domain(spark):
    """The damping multiply in pagerank() uses the split form
    (x div 20)*17 + ((x mod 20)*17) div 20 so a hub's inbound mass can
    span the WHOLE BIGINT domain without 17*x overflowing (the naive
    form overflows once x passes 2^63/17). Verify the identity against
    exact Python integers up to 2^63-1."""
    from pyspark.sql import functions as F

    vals = [
        0,
        1,
        19,
        20,
        21,
        10**9,
        (2**63 - 1) // 17,
        (2**63 - 1) // 17 + 1,
        2**63 - 1,
    ]
    df = spark.createDataFrame([(v,) for v in vals], "insum long")
    got = {
        r.insum: r.d
        for r in df.select(
            "insum",
            F.expr("insum div 20 * 17 + (insum % 20) * 17 div 20").alias("d"),
        ).collect()
    }
    assert got == {v: 17 * v // 20 for v in vals}


def test_trade_pagerank_over_bucketed_index_bit_identical(spark, tmp_path):
    """Round 9 (verdict task 4): the persisted bucketed-edge composition
    must produce bit-identical masses to the fused form, and its
    per-round plan must never exchange the edge scan — the c-side join
    hashes only the node-sized mass relation and the per-customer sum
    aggregates on the bucket partitioning."""
    from complex_data_pipeline_with_joins_and_multi_table_operations_spark.operators import (
        graph,
    )
    from complex_data_pipeline_with_joins_and_multi_table_operations_spark.sources import (
        Catalog,
    )
    from complex_data_pipeline_with_joins_and_multi_table_operations_spark.sources.txlog import (
        TableLog,
    )

    cat = Catalog(spark, "/root/testdata/sf0.001")
    fused = {
        r.node: r.mass
        for r in graph.trade_pagerank(cat.orders, cat.lineitem, iters=3).collect()
    }
    e_root, s_root = graph.trade_edge_index_build(
        cat.orders, cat.lineitem, str(tmp_path / "idx"), n_buckets=8
    )
    over = {
        r.node: r.mass
        for r in graph.trade_pagerank_over_index(
            spark, e_root, s_root, iters=3
        ).collect()
    }
    assert over == fused
    # plan shape: the bucketed edge scan side is never hash-exchanged
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        edges = TableLog(spark, e_root).read_bucketed()
        from pyspark.sql import functions as F

        deg = edges.groupBy("c").agg(F.count(F.lit(1)).alias("n"))
        plan = deg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
