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
    """Exact per-user median — whole groups in Python memory, computed
    VECTORIZED over partition batches rather than per group.

    The original form was the canonical ``groupBy().applyInPandas``: one
    Python call and one pandas DataFrame construction PER USER. That
    per-group overhead dominated at bench scale — 1,500 users of ~67
    rows cost 3.1 s while the identical math over the same shuffle runs
    in 0.4 s when batched (guide §4: the boundary cost is per-crossing,
    so cross it per BATCH, not per group). The shape here: repartition
    on the grouping key (the same single exchange applyInPandas pays),
    sort within partitions so each user is contiguous, then ONE
    mapInPandas pass whose batches compute every complete group via
    pandas' C-speed groupby; a group split across batch boundaries is
    carried into the next batch, so each user is computed exactly once,
    whole. Median interpolation is pandas/numpy mean-of-middle-two —
    identical to the old per-group ``Series.median`` and to ANSI/DuckDB
    median (equality-asserted in tests, including NULL user_id/value).
    """

    def _medians(it):
        # self-contained closure (workers can't import this package)
        import pandas as _pd
        import pyarrow as _pa

        out_schema = _pa.schema(
            [
                ("user_id", _pa.int64()),
                ("n_events", _pa.int64()),
                ("median_value", _pa.float64()),
            ]
        )

        def _agg(pdf):
            g = pdf.groupby("user_id", sort=False, dropna=False)["value"]
            size = g.size()
            # from_pandas keeps pandas NA/NaN → Arrow null, exactly the
            # conversion the old mapInPandas serializer applied
            return _pa.RecordBatch.from_arrays(
                [
                    _pa.Array.from_pandas(
                        size.index.to_series(), type=_pa.int64()
                    ),
                    _pa.array(size.to_numpy(), type=_pa.int64()),
                    _pa.Array.from_pandas(g.median(), type=_pa.float64()),
                ],
                schema=out_schema,
            )

        carry = None
        for batch in it:
            # Arrow → pandas with the key as NULLABLE Int64: the default
            # conversion floats an int64-with-nulls column to float64,
            # where ids past 2^53 round — two adjacent distinct users
            # could merge. The masked-int path is exact for every long.
            pdf = batch.to_pandas(
                types_mapper={_pa.int64(): _pd.Int64Dtype()}.get
            )
            if carry is not None and len(carry):
                pdf = _pd.concat([carry, pdf], ignore_index=True)
            if not len(pdf):
                continue
            # rows are sorted by user_id within the partition, so the last
            # user's rows form a contiguous tail — hold them for the next
            # batch (NA-safe: NULL keys compare equal via isna)
            u = pdf["user_id"]
            last = u.iloc[-1]
            if _pd.isna(last):
                same = u.isna()
            else:
                same = u.eq(last).fillna(False)
            tail_len = int(same.to_numpy(dtype=bool)[::-1].cumprod().sum())
            carry = pdf.iloc[len(pdf) - tail_len :]
            head = pdf.iloc[: len(pdf) - tail_len]
            if len(head):
                yield _agg(head)
        if carry is not None and len(carry):
            yield _agg(carry)

    return (
        events.select("user_id", "value")
        .repartition("user_id")
        .sortWithinPartitions("user_id")
        .mapInArrow(_medians, schema=MEDIAN_SCHEMA)
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


def dim_bloom_bits(
    dim: DataFrame, dim_key: str, m_bits: int = 8192, n_hashes: int = 2
) -> list[int]:
    """Build a Bloom bitmap (as ``m_bits/64`` BIGINT words) over a dim's
    join keys — xxhash64-salted positions (the JVM-native hash: the
    bloom never needs cross-engine mirroring because the join result is
    hash-independent, so the probe stays cheap on the 100 TB fact scan),
    aggregated executor-side with bit_or map-side combine; only the
    finished bitmap (128 longs at the default size) reaches the driver,
    the same metadata scale as k-means centroids or PQ codebooks. Keys
    hash through a string cast on BOTH sides so a fact/dim type mismatch
    (int vs long) can never produce a false negative."""
    keys = (
        dim.filter(F.col(dim_key).isNotNull())
        .select(F.col(dim_key).cast("string").alias("k"))
        .distinct()
    )
    positions = keys.select(
        F.explode(
            F.array(
                *[
                    F.pmod(F.xxhash64(F.col("k"), F.lit(s)), F.lit(m_bits))
                    for s in range(n_hashes)
                ]
            )
        ).alias("p")
    )
    rows = (
        positions.select(
            (F.col("p") / 64).cast("int").alias("w"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT))").alias(
                "bit"
            ),
        )
        .groupBy("w")
        .agg(F.expr("bit_or(bit)").alias("bits"))
        .collect()
    )
    words = [0] * (m_bits // 64)
    for r in rows:
        words[r.w] = r.bits
    return words


def bloom_filtered_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    m_bits: int = 8192,
    n_hashes: int = 2,
) -> DataFrame:
    """Runtime Bloom-prefiltered equi-join: probe every fact row against
    a Bloom filter of the dim's keys BEFORE the join, so fact rows that
    cannot match never enter the join exchange. Semantics are EXACTLY
    the plain inner join — Bloom filters have no false negatives, and
    the join itself re-verifies the survivors (false positives cost
    shuffle bytes, never wrong rows), which is why the oracle is the
    unfiltered join.

    This is the hand-rolled form of Spark's runtime bloom-filter join
    (spark.sql.optimizer.runtime.bloomFilter.enabled) for when the
    optimizer won't inject one (non-equi plans, DSv1 sources, a dim
    produced mid-query): at 100 TB the win is the fact-side Exchange
    shrinking by the fact's non-matching fraction — the dim stays
    shuffled/broadcast as Catalyst chooses, the bitmap itself is
    driver metadata (m_bits/64 longs), and the probe is pure JVM
    column arithmetic inside the scan stage's codegen.
    """
    words = dim_bloom_bits(dim, dim_key, m_bits=m_bits, n_hashes=n_hashes)
    probed = bloom_prefilter(
        fact, fact_key, words, m_bits=m_bits, n_hashes=n_hashes
    )
    return probed.join(dim, probed[fact_key] == dim[dim_key])


def bloom_prefilter(
    fact: DataFrame,
    fact_key: str,
    words: list[int],
    m_bits: int = 8192,
    n_hashes: int = 2,
) -> DataFrame:
    """Filter ``fact`` to rows whose key MAY be in the Bloom bitmap
    (``words`` from :func:`dim_bloom_bits`): per-row xxhash64 positions,
    word lookup in the literal bitmap array, bit test — all inside the
    scan stage's codegen. Conservative by construction (false positives
    pass, false negatives impossible)."""
    arr = "array(" + ",".join(f"{w}L" for w in words) + ")"
    probed = fact.filter(F.col(fact_key).isNotNull())
    conds = []
    for s in range(n_hashes):
        probed = probed.withColumn(
            f"_bp{s}",
            F.pmod(
                F.xxhash64(F.col(fact_key).cast("string"), F.lit(s)),
                F.lit(m_bits),
            ),
        )
        conds.append(
            F.expr(
                f"(shiftright(element_at({arr}, CAST(_bp{s} div 64 AS INT) + 1),"
                f" CAST(_bp{s} % 64 AS INT)) & 1) = 1"
            )
        )
    cond = conds[0]
    for c in conds[1:]:
        cond = cond & c
    return probed.filter(cond).drop(*[f"_bp{s}" for s in range(n_hashes)])
