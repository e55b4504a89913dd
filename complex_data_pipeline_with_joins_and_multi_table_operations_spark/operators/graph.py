"""Iterative graph centrality — fixed-point integer PageRank.

Connected components (operators/dedup.py near_dup_clusters) gave the
engine its first iterative graph algorithm; this module adds the other
classic: PageRank, THE domain/source-quality signal of web-corpus
curation (a page's crawl priority and a domain's quality weight in
public pipelines both descend from it).

Numerics — why integers: a float PageRank needs a quantization grid to
be cross-engine bit-stable (the quantized-ln/sigmoid recipes).  Here we
go one better: ranks are integer MASS (``SCALE`` units per node at
t=0), the per-edge contribution is ``mass div outdeg`` (floor division,
identical on JVM/DuckDB/Python for non-negative integers), damping is
the exact rational 17/20 applied as ``(17 * insum) div 20``, and the
teleport term is the constant ``floor(0.15 * SCALE)`` per node.  Every
intermediate is a BIGINT — no float exists anywhere in the trajectory,
so the k-round fixed-point iteration is bit-deterministic BY
CONSTRUCTION and the DuckDB oracle unrolls it exactly
(plans/registry.py::_pagerank_sql).  Floors leak a little mass (and
dangling-node mass is dropped, the standard simplification); the total
stays bounded by N*SCALE — asserted in tests.

Scale shape: per iteration ONE join of the edge list against the
(node, mass) relation on src and ONE aggregate on dst — the same two
hash-partitionings every round, so at cluster scale the edge list is
repartitioned on src once and reused (we persist it); masses are a
node-sized relation.  k iterations = k joins, no driver-side state at
all (unlike k-means there is not even metadata to collect between
rounds — the loop is pure plan composition over a persisted edge
list, executed once at the end).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# 1e9 units of mass per node: a hub's inbound mass is bounded by the
# system total ~N*SCALE, so insum itself stays under 2^63 for graphs up
# to ~9e9 nodes (the damping multiply is overflow-free for ANY BIGINT
# insum — see the split-form expression in pagerank()); floor-division
# leakage is ~1e-9 relative per round.
SCALE = 1_000_000_000
TELEPORT = SCALE * 15 // 100  # floor(0.15 * SCALE)


def pagerank(
    edges: DataFrame,
    iters: int = 3,
    src: str = "src",
    dst: str = "dst",
    edges_distinct: bool = False,
) -> DataFrame:
    """(node, mass): fixed-point PageRank masses after ``iters`` rounds
    over the directed edge list (callers wanting an undirected walk
    union both directions first).  ``mass / SCALE`` is the familiar
    un-normalized rank; it is returned as an exact integer so results
    hash identically everywhere."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    if not edges_distinct:
        e = e.distinct()
    # e is consumed TWICE below (the outdeg aggregate and the weighted
    # join) — without this persist the whole upstream edge derivation
    # (for the trade graph: an orders⋈lineitem join plus a distinct)
    # executes once per consumer; measured ~35 s per execution at sf10
    e = e.persist()
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # everything each round touches is materialized ONCE: the weighted
    # edge list (the big relation — every iteration joins against it)
    # and the node set (node-sized); without these the upstream edge
    # derivation would re-run once per round per reference.  The edge
    # list persists PARTITIONED ON src so each round's join reuses the
    # cached partitioning and only the node-sized mass relation moves —
    # shuffling the edges once instead of once per iteration.
    ew = e.join(outdeg, "src").repartition("src").persist()
    nodes = (
        ew.select(F.col("src").alias("node"))
        .union(ew.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    try:
        mass = nodes.select("node", F.lit(SCALE).cast("long").alias("mass"))
        for _ in range(iters):
            insum = (
                ew.join(mass, ew.src == mass.node)
                .select(
                    F.col("dst").alias("node"),
                    F.expr("mass div outdeg").alias("contrib"),
                )
                .groupBy("node")
                .agg(F.sum("contrib").alias("insum"))
            )
            # damping = 17*insum div 20, computed in the split form
            # (insum div 20)*17 + ((insum mod 20)*17) div 20 — identical
            # for every non-negative insum (insum = 20q+r ⇒ both equal
            # 17q + 17r div 20) but overflow-free over the whole BIGINT
            # domain, where the naive 17*insum overflows once a hub's
            # inbound mass passes 2^63/17 (~5.4e8 nodes' worth of mass
            # on one node).
            mass = nodes.join(insum, "node", "left").select(
                "node",
                (
                    F.lit(TELEPORT)
                    + F.expr(
                        "coalesce(insum, 0L) div 20 * 17"
                        " + (coalesce(insum, 0L) % 20) * 17 div 20"
                    )
                ).alias("mass"),
            )
        # materialize while the persisted edge list is still alive; the
        # result is a node-sized relation
        out = mass.localCheckpoint(eager=True)
    finally:
        ew.unpersist()
        nodes.unpersist()
        e.unpersist()
    return out


def trade_graph(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """The customer↔supplier trade graph: an (undirected, so both edge
    directions) edge per distinct customer-supplier pair connected by a
    lineitem — node ids are BIGINTs ``2*custkey`` / ``2*suppkey + 1``
    (even = customer, odd = supplier: the key spaces cannot collide and
    the tens of millions of edge rows a scaled corpus produces shuffle
    on cheap integer hashes, not concatenated strings — measured ~2× on
    the sf10 probe).  Pairs are collapsed to distinct HERE (before the
    bidirectional union doubles them — the two directions cannot
    collide across the even/odd namespaces, so the union is distinct by
    construction: pass edges_distinct=True to :func:`pagerank`); the
    bipartite random walk makes supplier mass a demand-weighted
    importance and customer mass a breadth-of-sourcing score."""
    pairs = (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("c"),
            (F.col("l_suppkey") * 2 + 1).alias("s"),
        )
        .distinct()
    )
    return pairs.select(F.col("c").alias("src"), F.col("s").alias("dst")).union(
        pairs.select(F.col("s").alias("src"), F.col("c").alias("dst"))
    )


def _trade_pairs(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Distinct (c, s) trade pairs, hash(c)-partitioned with the
    distinct folded into the one exchange: the orders⋈lineitem pair
    derivation joins SHUFFLED-HASH (both sides are facts), the output
    exchanges ONCE on c, and the dropDuplicates aggregate runs
    exchange-free on top (hash(c) satisfies clustering by (c, s))."""
    joined = orders.hint("shuffle_hash").join(
        lineitem, orders.o_orderkey == lineitem.l_orderkey
    ).select(
        (F.col("o_custkey") * 2).alias("c"),
        (F.col("l_suppkey") * 2 + 1).alias("s"),
    )
    return joined.repartition("c").dropDuplicates(["c", "s"])


def trade_edge_index_build(
    orders: DataFrame,
    lineitem: DataFrame,
    root: str,
    n_buckets: int = 32,
) -> tuple[str, str]:
    """Persist the trade graph's per-round state as TABLES — the
    build-once/iterate-many split of :func:`trade_pagerank` (verdict-r8
    task 4): the (c, s, outdeg) edge cache lands as a txlog table
    BUCKETED BY c (sources/txlog.py bucketed layout), so every
    :func:`trade_pagerank_over_index` run gets the c→s join and the
    per-customer aggregation exchange-free ON DISK — the shuffle the
    in-memory form pays per run is paid once here, at index build. The
    supplier-degree relation (node-sized) lands as a plain table.
    Returns (edges_root, deg_s_root)."""
    import os

    from ..sources.txlog import TableLog

    spark = orders.sparkSession
    pc = _trade_pairs(orders, lineitem).persist()
    deg_c = pc.groupBy("c").agg(F.count(F.lit(1)).alias("outdeg"))
    a_edges = pc.join(deg_c.hint("shuffle_hash"), "c")
    deg_s = pc.groupBy("s").agg(F.count(F.lit(1)).alias("outdeg"))
    e_root = os.path.join(root, "edges")
    s_root = os.path.join(root, "deg_s")
    try:
        TableLog(spark, e_root).write(
            a_edges, bucket_by=(n_buckets, ["c"]), sort_by=["c"]
        )
        TableLog(spark, s_root).write(deg_s)
    finally:
        pc.unpersist()
    return e_root, s_root


def trade_pagerank_over_index(
    spark, edges_root: str, deg_s_root: str, iters: int = 3
) -> DataFrame:
    """:func:`trade_pagerank`'s fixed-point loop over the PERSISTED
    bucketed edge index (:func:`trade_edge_index_build`) — masses
    bit-identical to the fused form (the trajectory is pure BIGINT
    arithmetic over the same edge set; asserted in tests/test_graph.py).

    Plan shape per round: the bucketed scan of (c, s, outdeg) is never
    exchanged — the c→s join hashes only the node-sized mass relation
    against it, and the s→c per-customer sum aggregates in place on the
    bucket partitioning; the only edge-sized exchange left is the
    groupBy(s) map-side-combined toward supplier cardinality. At
    cluster scale this is the composition the in-memory form's
    docstring pointed at: pay the hash(c) shuffle once at write time,
    iterate exchange-free forever after."""
    from ..sources.txlog import TableLog

    a_edges = TableLog(spark, edges_root).read_bucketed().persist()
    deg_s = TableLog(spark, deg_s_root).read().persist()
    deg_c_nodes = a_edges.select(F.col("c").alias("node")).distinct()
    nodes = (
        deg_c_nodes.unionByName(deg_s.select(F.col("s").alias("node")))
        .persist()
    )
    try:
        mass = nodes.select("node", F.lit(SCALE).cast("long").alias("mass"))
        for _it in range(iters):
            ins_s = (
                a_edges.join(
                    mass.hint("shuffle_hash"), a_edges.c == mass.node
                )
                .select(
                    F.col("s").alias("node2"),
                    F.expr("mass div outdeg").alias("contrib"),
                )
                .groupBy("node2")
                .agg(F.sum("contrib").alias("insum"))
            )
            w_s = F.broadcast(
                mass.join(deg_s, mass.node == deg_s.s).select(
                    F.col("s").alias("ws_s"),
                    F.expr("mass div outdeg").alias("contrib"),
                )
            )
            ins_c = (
                a_edges.join(w_s, a_edges.s == F.col("ws_s"))
                .select(F.col("c").alias("node2"), "contrib")
                .groupBy("node2")
                .agg(F.sum("contrib").alias("insum"))
            )
            insum = ins_s.unionByName(ins_c).withColumnRenamed(
                "node2", "node"
            )
            mass = nodes.join(insum, "node", "left").select(
                "node",
                (
                    F.lit(TELEPORT)
                    + F.expr(
                        "coalesce(insum, 0L) div 20 * 17"
                        " + (coalesce(insum, 0L) % 20) * 17 div 20"
                    )
                ).alias("mass"),
            )
            # node-sized materialization per round (see trade_pagerank)
            mass = mass.localCheckpoint(eager=True)
        out = mass
    finally:
        a_edges.unpersist()
        deg_s.unpersist()
        nodes.unpersist()
    return out


def trade_pagerank(
    orders: DataFrame, lineitem: DataFrame, iters: int = 3
) -> DataFrame:
    """:func:`pagerank` over :func:`trade_graph`, restructured around the
    bipartite symmetry so every big relation moves through the minimum
    number of exchanges (round 8; hash-identical output, the unrolled
    SQL oracle plans/registry.py::_pagerank_sql unchanged):

    - the orders⋈lineitem pair derivation joins SHUFFLED-HASH (both
      sides are facts — SMJ would sort 60 M + 15 M rows at sf10 for a
      join that only needs the orderkey→custkey lookup);
    - the pair DISTINCT is folded into the direction repartition: the
      join output exchanges ONCE on c, and the (c, s) aggregate runs
      exchange-free on top (hash(c) satisfies clustering by (c, s)) —
      the separate distinct shuffle of the round-7 form disappears;
    - ONE edge cache ``A`` (c, s, outdeg_c — partitioned by c) serves
      BOTH walk directions. The c→s direction joins the node-sized mass
      relation shuffled-hash against the cache's own partitioning. The
      s→c direction exploits the bipartite asymmetry (TPC-H suppliers
      ≈ customers/15): the per-supplier contribution ``mass_s div
      deg_s`` is identical for every customer of that supplier, so it
      BROADCASTS as a supplier-sized relation and the per-customer sum
      aggregates IN PLACE on A's hash(c) partitioning — the round-7
      second edge cache (20.6 s of the 43 s sf10 wall), its
      repartition, AND that direction's 58 M-row contribution shuffle
      all disappear. (A graph whose both sides are huge keeps the
      generic :func:`pagerank` two-sided shape; the broadcast side here
      is supplier-count-sized, the side a 100 TB corpus keeps small.)
    - each round's mass materializes via localCheckpoint: the fixed
      point is DAG composition, and an unmaterialized mass_k is
      referenced twice per round — by round k+1 the plan re-executes
      mass_0's subtree 2^k times (measured as most of the round-7
      iteration cost).

    At cluster scale the same structure holds: the edge cache becomes a
    bucketed-by-c table (the zero-exchange SMJ path of
    test_bucketed_join_has_no_shuffle), making the per-round join AND
    the degree derivation exchange-free on disk, not just in cache.

    The fixed-point arithmetic (mass div outdeg contributions, 17/20
    damping in split overflow-free form, floor teleport — all BIGINT)
    is identical to :func:`pagerank`: bit-deterministic trajectory
    (sums regroup across the direction split; integer addition is
    order-free), unchanged oracle.
    """
    pc = _trade_pairs(orders, lineitem).persist()
    deg_c = pc.groupBy("c").agg(F.count(F.lit(1)).alias("outdeg"))
    # ONE eager job materializes BOTH caches (computing a_edges computes
    # and caches pc's partitions on the way; concurrent references inside
    # the job serialize per-partition on the block manager's write lock,
    # so nothing is computed twice) — the former extra pc.count() guard
    # paid a whole second job for the same effect.
    a_edges = pc.join(deg_c.hint("shuffle_hash"), "c").persist()
    a_edges.count()  # (c, s, outdeg) hash(c)
    # supplier degrees: node-sized output, the one by-s shuffle left
    deg_s = pc.groupBy("s").agg(F.count(F.lit(1)).alias("outdeg")).persist()
    # node set = the degree keys (every node of a bidirectional graph
    # has an out-edge; even/odd namespaces make the union distinct)
    nodes = (
        deg_c.select(F.col("c").alias("node"))
        .unionByName(deg_s.select(F.col("s").alias("node")))
        .persist()
    )
    # nodes and deg_s materialize lazily inside round 1 (off the still-
    # cached pc) — no extra synchronous jobs at plan build
    try:
        mass = nodes.select("node", F.lit(SCALE).cast("long").alias("mass"))
        for it in range(iters):
            # c→s: per-edge contribution, summed per supplier (the one
            # edge-sized shuffle per round; map-side combine collapses
            # toward supplier cardinality)
            ins_s = (
                a_edges.join(
                    mass.hint("shuffle_hash"), a_edges.c == mass.node
                )
                .select(
                    F.col("s").alias("node2"),
                    F.expr("mass div outdeg").alias("contrib"),
                )
                .groupBy("node2")
                .agg(F.sum("contrib").alias("insum"))
            )
            # s→c: one supplier-sized broadcast of mass_s div deg_s;
            # the per-customer sum aggregates on A's own partitioning
            w_s = F.broadcast(
                mass.join(deg_s, mass.node == deg_s.s).select(
                    F.col("s").alias("ws_s"),
                    F.expr("mass div outdeg").alias("contrib"),
                )
            )
            ins_c = (
                a_edges.join(w_s, a_edges.s == F.col("ws_s"))
                .select(F.col("c").alias("node2"), "contrib")
                .groupBy("node2")
                .agg(F.sum("contrib").alias("insum"))
            )
            insum = ins_s.unionByName(ins_c).withColumnRenamed("node2", "node")
            mass = nodes.join(insum, "node", "left").select(
                "node",
                (
                    F.lit(TELEPORT)
                    + F.expr(
                        "coalesce(insum, 0L) div 20 * 17"
                        " + (coalesce(insum, 0L) % 20) * 17 div 20"
                    )
                ).alias("mass"),
            )
            # node-sized materialization per round: without it mass_k is
            # referenced twice (both directions) and the DAG re-executes
            # earlier rounds exponentially
            mass = mass.localCheckpoint(eager=True)
        out = mass
    finally:
        pc.unpersist()
        a_edges.unpersist()
        deg_s.unpersist()
        nodes.unpersist()
    return out
