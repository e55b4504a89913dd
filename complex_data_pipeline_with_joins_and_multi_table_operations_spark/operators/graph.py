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


def trade_pagerank(
    orders: DataFrame, lineitem: DataFrame, iters: int = 3
) -> DataFrame:
    """:func:`pagerank` over :func:`trade_graph`, restructured around the
    bipartite symmetry so the expensive pair derivation materializes
    ONCE at HALF the rows (the round-7 sf10 fix: 60.5 s → 36.6 s
    measured, hash-identical output):

    - the distinct (customer, supplier) PAIR relation persists instead
      of the doubled bidirectional edge list — the orders⋈lineitem join
      plus its distinct run exactly once, and the cache holds |pairs|
      rows, not 2·|pairs|;
    - out-degrees per direction are two grouped counts over that cache
      (a customer's degree = its pair count = its out-degree in the
      bidirectional graph, and symmetrically for suppliers);
    - the node set is the UNION OF THE DEGREE KEYS — in a bidirectional
      graph every node has an out-edge, so this replaces the generic
      src∪dst distinct over 2·|edges| rows with a zero-extra-shuffle
      projection of two already-grouped relations (the even/odd key
      namespaces cannot collide, so the union is distinct by
      construction).

    The fixed-point iteration itself (mass div outdeg contributions,
    17/20 damping, floor teleport — all BIGINT) is identical to
    :func:`pagerank`, so the trajectory stays bit-deterministic and the
    unrolled SQL oracle (plans/registry.py::_pagerank_sql) is unchanged.
    """
    pairs = (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("c"),
            (F.col("l_suppkey") * 2 + 1).alias("s"),
        )
        .distinct()
        .persist()
    )
    deg_c = pairs.groupBy("c").agg(F.count(F.lit(1)).alias("outdeg"))
    deg_s = pairs.groupBy("s").agg(F.count(F.lit(1)).alias("outdeg"))
    ew = (
        pairs.join(deg_c, "c")
        .select(F.col("c").alias("src"), F.col("s").alias("dst"), "outdeg")
        .unionByName(
            pairs.join(deg_s, "s").select(
                F.col("s").alias("src"), F.col("c").alias("dst"), "outdeg"
            )
        )
        .repartition("src")
        .persist()
    )
    nodes = (
        deg_c.select(F.col("c").alias("node"))
        .unionByName(deg_s.select(F.col("s").alias("node")))
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
        out = mass.localCheckpoint(eager=True)
    finally:
        ew.unpersist()
        nodes.unpersist()
        pairs.unpersist()
    return out
