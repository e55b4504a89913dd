"""Z-order (Morton-code) clustering for multi-column data skipping.

A file-skipping store (sources/txlog.py, Iceberg, Delta) prunes a file
when its [min, max] range on a filtered column excludes the predicate.
Linear sort gives tight ranges on ONE column; every other column spans
its full domain in every file and never prunes. Z-ordering interleaves
the bits of several columns into one sort key (public technique: Morton
1966; the OPTIMIZE ZORDER BY of modern table formats), so each file
covers a small hyper-rectangle of the combined space — range predicates
on ANY of the clustered columns skip most files.

Pure DataFrame implementation: per-column min/max (one tiny aggregate,
broadcast back — no collect), fixed-point scale to ``bits``-wide ranks,
bit interleave as a codegen'd column expression, then a range
repartition + within-partition sort on the z-value. Cost at 100 TB is
one extra shuffle at write time — the classic trade: pay once on write,
skip forever on read.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_Z = "__zvalue"


def z_value(cols: list[str], mins: dict[str, Column], maxs: dict[str, Column],
            bits: int = 16) -> Column:
    """Morton code of ``cols``: each column min-max scaled to a ``bits``-wide
    integer rank, ranks bit-interleaved (column j contributes bit i to
    output position i*len(cols)+j). 64-bit budget: bits*len(cols) ≤ 63."""
    if bits * len(cols) > 63:
        raise ValueError(f"{bits} bits × {len(cols)} cols exceeds a long")
    top = (1 << bits) - 1
    ranks = []
    for c in cols:
        span = maxs[c] - mins[c]
        scaled = F.when(
            span > 0,
            ((F.col(c) - mins[c]) / span * top).cast("long"),
        ).otherwise(F.lit(0))
        # nulls sort first; clamp against float-edge overshoot
        ranks.append(F.coalesce(F.least(F.greatest(scaled, F.lit(0)), F.lit(top)),
                                F.lit(0)))
    parts = [
        F.shiftleft(F.shiftright(rank, i).bitwiseAND(F.lit(1)), i * len(cols) + j)
        for i in range(bits)
        for j, rank in enumerate(ranks)
    ]
    return reduce(lambda a, b: a.bitwiseOR(b), parts)


def z_order(df: DataFrame, cols: list[str], n_files: int, bits: int = 16) -> DataFrame:
    """Cluster ``df`` into ``n_files`` z-ordered partitions over ``cols``
    (numeric columns). Write the result with one file per partition (e.g.
    ``TableLog.write``) and range filters on any clustered column prune
    files via footer min/max stats.

    The min/max aggregate is a single 1-row broadcast join — Catalyst
    folds it into the scan stage; no driver round-trip.
    """
    stats = df.agg(
        *[F.min(c).alias(f"__min_{c}") for c in cols],
        *[F.max(c).alias(f"__max_{c}") for c in cols],
    )
    with_stats = df.crossJoin(F.broadcast(stats))
    mins = {c: F.col(f"__min_{c}") for c in cols}
    maxs = {c: F.col(f"__max_{c}") for c in cols}
    return (
        with_stats.withColumn(_Z, z_value(cols, mins, maxs, bits))
        .repartitionByRange(n_files, _Z)
        .sortWithinPartitions(_Z)
        .drop(_Z, *[f"__min_{c}" for c in cols], *[f"__max_{c}" for c in cols])
    )
