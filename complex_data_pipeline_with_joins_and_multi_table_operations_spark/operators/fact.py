"""Star-schema fact builder (reference FactJob.scala:39-74; SURVEY.md §2.4
J1-J3, §2.2 P3-P6).

The reference joins the trip table to the location dimension TWICE under
aliases ``pu``/``do`` (role-playing dimension) plus once to the date
dimension, all left-outer equi joins, then pins a wide projection with
qualified column references (FactJob.scala:55-74).

Here the role-playing dimension is ``nation``: the same table reaches the
fact through the supplier role and the customer role. All dimensions are
explicitly ``F.broadcast()``-ed — at 100 TB the fact side never shuffles
for these joins; each is a BroadcastHashJoin over the single fact scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import is_weekend
from .dimensions import build_date_dim


def build_fact(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    date_dim: DataFrame | None = None,
    derive_calendar_inline: bool = False,
) -> DataFrame:
    """Denormalized fact: lineitem enriched with both nation roles and the
    date dimension.

    Join shapes mirror FactJob.scala:
      J1: fact ← dim role 1 (supplier nation), left-outer equi
      J2: fact ← same dim role 2 (customer nation), left-outer equi,
          alias-disambiguated qualified projection
      J3: fact ← date dim on the date key, left-outer equi
    Filters are applied before the joins (FactJob.scala:47-54) — Catalyst
    would push them anyway, but the explicit order keeps plans readable.

    ``derive_calendar_inline=True`` computes the calendar attributes as
    direct functions of ship_date instead of joining the date-dim spine.
    Provably identical output (the spine is built from this column's own
    min..max, so the left join always matches), but it removes a whole
    lineitem scan (the spine's min/max aggregate) and a broadcast join
    from the plan — the fast path for ad-hoc fact queries. The join form
    remains the default for reference parity (J3) and for pipelines
    whose date dim carries non-derivable attributes (holidays, fiscal
    calendars).
    """
    if date_dim is None and not derive_calendar_inline:
        date_dim = build_date_dim(lineitem, "l_shipdate")

    li = (
        lineitem.withColumn("ship_date", F.to_date("l_shipdate"))
        # withColumn on an existing name REPLACES it (operator P6;
        # FactJob.scala:47-48 recomputes trip_duration_minutes)
        .withColumn("revenue", F.col("l_extendedprice") * (1 - F.col("l_discount")))
        .filter(
            (F.col("l_quantity") > 0)
            & (F.col("l_quantity") < 1000)
            & (F.col("l_extendedprice") > 0)
            & (F.col("revenue") > 0)
        )
    )

    supp_side = F.broadcast(
        supplier.join(
            nation.alias("sn"),
            supplier["s_nationkey"] == F.col("sn.n_nationkey"),
            "left",
        ).select(
            F.col("s_suppkey"),
            F.col("s_name").alias("supp_name"),
            F.col("sn.n_name").alias("supp_nation"),
        )
    )
    cust_side = F.broadcast(
        orders.join(
            F.broadcast(customer), orders["o_custkey"] == customer["c_custkey"], "left"
        )
        .join(
            nation.alias("cn"),
            customer["c_nationkey"] == F.col("cn.n_nationkey"),
            "left",
        )
        .select(
            F.col("o_orderkey"),
            F.col("o_orderdate"),
            F.col("o_orderpriority"),
            F.col("c_custkey").alias("cust_key"),
            F.col("c_mktsegment").alias("cust_segment"),
            F.col("cn.n_name").alias("cust_nation"),
        )
    )

    fact = li.join(
        supp_side, li["l_suppkey"] == supp_side["s_suppkey"], "left"
    ).join(cust_side, li["l_orderkey"] == cust_side["o_orderkey"], "left")

    if derive_calendar_inline:
        cal = [
            F.year("ship_date").alias("year"),
            F.quarter("ship_date").alias("quarter"),
            F.month("ship_date").alias("month"),
            F.dayofweek("ship_date").alias("day_of_week"),
            is_weekend(F.col("ship_date")).alias("is_weekend"),
        ]
    else:
        fact = fact.join(
            F.broadcast(date_dim.alias("dd")),
            li["ship_date"] == F.col("dd.date_key"),
            "left",
        )
        cal = [
            F.col("dd.year").alias("year"),
            F.col("dd.quarter").alias("quarter"),
            F.col("dd.month").alias("month"),
            F.col("dd.day_of_week").alias("day_of_week"),
            F.col("dd.is_weekend").alias("is_weekend"),
        ]

    return fact.select(
        F.col("l_orderkey").alias("orderkey"),
        F.col("l_linenumber").alias("linenumber"),
        F.col("ship_date"),
        *cal,
        F.col("l_quantity").alias("quantity"),
        F.col("l_extendedprice").alias("extendedprice"),
        F.col("l_discount").alias("discount"),
        F.col("revenue"),
        F.col("l_returnflag").alias("returnflag"),
        F.col("l_linestatus").alias("linestatus"),
        F.col("supp_name"),
        F.col("supp_nation"),
        F.col("cust_key"),
        F.col("cust_segment"),
        F.col("cust_nation"),
    )
