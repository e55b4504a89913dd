"""Summary-table aggregations + top-k (reference AggregationJob.scala:43-90;
SURVEY.md §2.5 A2-A4, §2.6 T1).

Each builder is a single groupBy → agg: Spark plans partial (map-side)
HashAggregate → exchange on the group keys → final HashAggregate, so at
100 TB the shuffle carries only partial aggregates, never raw fact rows.
Top-k goes through orderBy+limit which the planner turns into
TakeOrderedAndProject — no global sort.

Floating-point summation is not associative, so a double sum differs
across engines and across partition orderings — and rounding does NOT fix
it (money values live on a 10^-k grid, so sums land exactly on round-half
boundaries). The engine-exact pattern used here: cast monetary doubles to
DECIMAL on their value grid, sum exactly, cast the exact sum back to
double (one deterministic conversion). Averages divide two exact values —
also bit-deterministic. Integer-valued doubles sum as longs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def exact_sum(col: str | Column, scale: int) -> Column:
    """Exact grid-decimal sum of a double column, returned as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(18,{scale})")).cast("double")


def exact_avg(col: str | Column, scale: int) -> Column:
    """Exact-sum / count average: bit-deterministic across engines."""
    return exact_sum(col, scale) / F.count("*")


def agg_pair_daily(fact: DataFrame) -> DataFrame:
    """3-key grouped aggregate (A2; reference AggregationJob.scala:43-51):
    (ship_date, supp_nation, cust_nation) → count/sum/avg×2/sum-cast-long."""
    return fact.groupBy("ship_date", "supp_nation", "cust_nation").agg(
        F.count("*").alias("trip_count"),
        exact_sum("revenue", 4).alias("total_revenue"),
        exact_avg("quantity", 0).alias("avg_quantity"),
        exact_avg("discount", 2).alias("avg_discount"),
        F.sum(F.col("quantity").cast("long")).alias("total_quantity"),
    )


def agg_time(fact: DataFrame) -> DataFrame:
    """5-key grouped aggregate (A3; reference AggregationJob.scala:60-66):
    (year, quarter, month, day_of_week, is_weekend) → count/sum/avg."""
    return fact.groupBy("year", "quarter", "month", "day_of_week", "is_weekend").agg(
        F.count("*").alias("trip_count"),
        exact_sum("revenue", 4).alias("total_revenue"),
        exact_avg("revenue", 4).alias("avg_revenue"),
    )


def top_pairs(fact: DataFrame, k: int = 50) -> DataFrame:
    """2-key aggregate + top-k (A4+T1; reference AggregationJob.scala:76-85).

    Tie-break on the group keys after the measure so the top-k set is
    deterministic across engines (the reference orders on count alone)."""
    return (
        fact.groupBy("supp_nation", "cust_nation")
        .agg(
            F.count("*").alias("trip_count"),
            exact_avg("quantity", 0).alias("avg_quantity"),
            exact_avg("revenue", 4).alias("avg_revenue"),
        )
        .orderBy(F.desc("trip_count"), "supp_nation", "cust_nation")
        .limit(k)
    )


def global_minmax(df: DataFrame, col: str) -> DataFrame:
    """Global min/max aggregate (A1; reference DimensionJob.scala:63-66) —
    kept as a DataFrame, not .head(), so no driver round-trip."""
    return df.agg(F.min(col).alias("min_val"), F.max(col).alias("max_val"))


def approx_event_stats(events: DataFrame) -> DataFrame:
    """Sketch-based aggregates — the 100 TB path for cardinality and
    quantiles: HyperLogLog++ (approx_count_distinct, rsd=1%) and the
    Greenwald-Khanna quantile sketch (percentile_approx, accuracy 10000).
    Both are single-pass, fixed-memory, and mergeable across partitions
    (partial sketches combine in the map-side aggregate, so the shuffle
    carries sketch bytes, not rows). Approximate by design → no SQL
    oracle; error bounds vs exact are asserted in tests.
    """
    pa = F.percentile_approx("value", F.array(F.lit(0.5), F.lit(0.95)), 10000)
    return events.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.01).alias("approx_users"),
        F.element_at(pa, 1).alias("p50_value"),
        F.element_at(pa, 2).alias("p95_value"),
        F.count("*").alias("n_events"),
    )


def kmv_distinct(
    events: DataFrame, key_col: str = "user_id", k: int = 64
) -> DataFrame:
    """K-minimum-values distinct sketch per event_type — the
    CROSS-ENGINE-EXACT member of the sketch family: where HLL++
    (:func:`approx_event_stats`) is engine-specific and can only be
    bounds-tested, KMV's estimate is a pure function of md5, so DuckDB
    reproduces it bit-for-bit and the driver hash-checks an
    *approximate* algorithm exactly.

    Sketch: normalize md5(key)'s first 13 hex digits to u ∈ [0, 1)
    (52 bits — exact in a double), keep each group's k smallest DISTINCT
    u, estimate distinct ≈ (k-1) / u_(k) (the classic KMV estimator;
    groups with fewer than k distinct keys report their exact count).
    Mergeable by construction (the k smallest of a union is a function
    of each side's k smallest), fixed memory per group.

    Implementation is one distinct + one windowed rank per group —
    exact-deterministic for the oracle; a production variant at 100 TB
    replaces the rank with a partial-aggregate top-k accumulator, same
    estimate.  Error vs exact is bounded in tests (relative error
    concentrates around 1/sqrt(k-2) ≈ 13%% at k=64).
    """
    from pyspark.sql import Window

    u = (
        F.conv(F.substring(F.md5(F.col("k")), 1, 13), 16, 10).cast("double")
        / F.lit(float(16**13))
    )
    # NULL keys are excluded explicitly (a NULL u would sort FIRST in
    # Spark's window but LAST under DuckDB's default null order — the
    # one place the mirror could diverge)
    hashes = (
        events.filter(F.col(key_col).isNotNull())
        .select("event_type", F.col(key_col).cast("string").alias("k"))
        .distinct()
        .withColumn("u", u)
    )
    w = Window.partitionBy("event_type").orderBy("u", "k")
    ranked = hashes.withColumn("rn", F.row_number().over(w))
    return (
        ranked.groupBy("event_type")
        .agg(
            F.count("*").alias("n_seen"),
            F.max(F.when(F.col("rn") == k, F.col("u"))).alias("uk"),
        )
        .select(
            "event_type",
            F.when(F.col("uk").isNotNull(), F.round((k - 1) / F.col("uk"), 4))
            .otherwise(F.col("n_seen").cast("double"))
            .alias("kmv_distinct"),
        )
    )


def hll_distinct(events: DataFrame, key_col: str = "user_id") -> DataFrame:
    """From-scratch HyperLogLog per event_type (Flajolet et al. 2007,
    m = 256 registers) — the second CROSS-ENGINE-EXACT approximate
    sketch: every register is a pure function of md5 (bucket = the
    first 8 hash bits, rho = leading-zero count of the next 44 + 1 via
    the binary-string length both engines compute identically), the
    harmonic-mean denominator is an exact BIGINT (sum of
    ``1 << (45 - rho)`` — at most 256·2^45 < 2^53, so even its double
    image is exact), and the final estimate is one IEEE division of
    exact operands.  DuckDB rebuilds the identical sketch and the
    driver hash-checks an approximate algorithm exactly — the KMV
    move applied to the registers-and-harmonic-mean family that
    production HLL++ belongs to.

    Shape: one shuffle to (event_type, bucket) register maxima
    (map-side combine absorbs repeats), then a 256-row-per-group
    aggregate.  Registers merge by max, so sketches are mergeable
    across partitions/snapshots by construction.  Small-range
    correction (linear counting over empty registers) applies below
    2.5·m, with the quantized-ln recipe keeping the log cross-engine.
    """
    m = 256
    alpha = 0.7213 / (1.0 + 1.079 / m)  # standard bias constant, m >= 128
    h = F.md5(F.col("k"))
    bucket = F.conv(F.substring(h, 1, 2), 16, 10).cast("int")
    v = F.conv(F.substring(h, 3, 11), 16, 10).cast("long")
    rho = F.when(v == 0, F.lit(45)).otherwise(
        45 - F.length(F.conv(v.cast("string"), 10, 2))
    )
    regs = (
        events.filter(F.col(key_col).isNotNull())
        .select("event_type", F.col(key_col).cast("string").alias("k"))
        .select("event_type", bucket.alias("bucket"), rho.alias("rho"))
        .groupBy("event_type", "bucket")
        .agg(F.max("rho").alias("r"))
    )
    per_group = regs.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_used"),
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 45 - r)")).alias("s_used"),
    )
    zeros = F.lit(m) - F.col("n_used")
    s = F.col("s_used") + zeros.cast("long") * F.lit(1 << 45)
    raw = F.lit(alpha * m * m * float(1 << 45)) / s.cast("double")
    # linear counting below 2.5m when empty registers remain: the ln
    # argument m/V is a ratio of exact integers, identical in both
    # engines; round(,6) absorbs libm's last ulp
    linear = F.round(F.log(F.lit(float(m)) / zeros.cast("double")), 6) * m
    est = F.when((raw <= 2.5 * m) & (zeros > 0), linear).otherwise(raw)
    return per_group.select(
        "event_type",
        F.col("n_used").alias("hll_registers_used"),
        F.round(est, 4).alias("hll_distinct"),
    )


def gk_quantiles(events: DataFrame, value_col: str = "value", buckets: int = 32) -> DataFrame:
    """From-scratch mergeable quantile summary per event_type (the
    GK/KLL family's mergeable ε-summary form, Agarwal et al. 2012) —
    the third CROSS-ENGINE-EXACT approximate sketch, closing the last
    no-oracle gap in the sketch family: where the native
    ``percentile_approx`` (GK inside Spark, different algorithm inside
    DuckDB) can only be bounds-tested, this summary is a pure function
    of the data and md5, so DuckDB rebuilds it bit-for-bit and an
    APPROXIMATE quantile algorithm gets a full hash oracle.

    Construction (two-level, the production shape at 100 TB):

    1. *Shard* rows deterministically — md5(event_id)'s first hex digit
       gives 16 shards.  In production the shards ARE the physical
       partitions and step 2 is a map-side mapPartitions accumulator
       with O(buckets) memory; the md5 shard stands in so the oracle
       can reproduce partitioning exactly.
    2. *Summarize* each (group, shard): sort, assign row at rank rn the
       bucket j = ceil(rn·B / n_s) (equi-depth, B = ``buckets``), keep
       per bucket its upper boundary max(v) and weight count(*).  Rank
       error contributed per shard ≤ its bucket width ⌈n_s/B⌉.
    3. *Merge* summaries per group: re-aggregate by boundary value,
       cumulative-sum the weights, answer quantile q with the first
       boundary whose cumulative weight reaches ceil(q·n) — integer
       targets ((n+3) div 4, (n+1) div 2, (3n+3) div 4, (19n+19) div 20
       for q ∈ {.25, .5, .75, .95}) so no float crosses an engine.

    Total rank error ≤ Σ_s ⌈n_s/B⌉ ≈ n/B + shards (ε = 1/B = ~3 % at
    the default B=32), bounds-tested against exact quantiles.  Only
    16·B summary rows per group reach the merge shuffle; boundary
    values are SELECTed, never arithmetic on — doubles stay exact.
    Tie order among equal values cannot change any bucket's max or the
    merged cumulative picture, so row_number's tie nondeterminism is
    value-invisible.  The native-sketch engine twin
    (:func:`approx_event_stats`) stays rows-only by design.
    """
    from pyspark.sql import Window

    B = buckets
    shard = F.conv(
        F.substring(F.md5(F.col("event_id").cast("string")), 1, 1), 16, 10
    ).cast("int")
    base = events.filter(
        F.col(value_col).isNotNull() & F.col("event_id").isNotNull()
    ).select("event_type", F.col(value_col).alias("v"), shard.alias("shard"))
    w = Window.partitionBy("event_type", "shard").orderBy("v")
    wn = Window.partitionBy("event_type", "shard")
    summ = (
        base.withColumn("rn", F.row_number().over(w))
        .withColumn("ns", F.count("*").over(wn))
        .withColumn("j", F.expr(f"(rn * {B} + ns - 1) div ns"))
        .groupBy("event_type", "shard", "j")
        .agg(F.max("v").alias("bv"), F.count("*").alias("w"))
    )
    merged = summ.groupBy("event_type", "bv").agg(F.sum("w").alias("w"))
    wc = Window.partitionBy("event_type").orderBy("bv")
    wg = Window.partitionBy("event_type")
    cum = merged.withColumn("cum", F.sum("w").over(wc)).withColumn(
        "n", F.sum("w").over(wg)
    )
    return cum.groupBy("event_type").agg(
        F.max("n").alias("n_events"),
        F.min(F.when(F.expr("cum >= (n + 3) div 4"), F.col("bv"))).alias("q25"),
        F.min(F.when(F.expr("cum >= (n + 1) div 2"), F.col("bv"))).alias("q50"),
        F.min(F.when(F.expr("cum >= (3 * n + 3) div 4"), F.col("bv"))).alias(
            "q75"
        ),
        F.min(F.when(F.expr("cum >= (19 * n + 19) div 20"), F.col("bv"))).alias(
            "q95"
        ),
    )


def kmv_segment_overlap(events: DataFrame, key_col: str = "user_id", k: int = 64) -> DataFrame:
    """Sketch-based SET OPERATIONS across segments (the theta-sketch
    use case: audience overlap): for every pair of event types, estimate
    the union, intersection, and Jaccard of their distinct-user sets
    from k-minimum-values sketches alone — never from the raw sets.
    Fourth cross-engine-exact sketch: everything is a pure function of
    md5 (the :func:`kmv_distinct` fold), so DuckDB rebuilds the
    identical sketches and the driver hash-checks approximate set
    algebra exactly.

    Estimator (per unordered type pair a<b): θ = min(θ_a, θ_b) where
    θ_t is the k-th smallest distinct u of type t (1.0 when the type
    has fewer than k distinct keys — the sketch IS the set and the
    estimates below become exact). The sketch entries of each side
    below θ form uniform samples of the sets below θ, so
    est_union = |A'∪B'|/θ, est_intersect = |A'∩B'|/θ,
    est_jaccard = |A'∩B'|/|A'∪B'| (0 on an empty union). Error
    concentrates around 1/√(k−2) like the distinct estimate;
    bounds-tested against the exact overlaps.

    Scale shape: ONE distinct + windowed top-k builds every sketch in a
    pass (at 100 TB: a partial-aggregate k-min accumulator — sketches
    are mergeable by construction, the k smallest of a union is a
    function of each side's k smallest); the pair algebra then touches
    only T²·k sketch rows (T = segment count, k = 64), driver-free and
    independent of corpus size.
    """
    from pyspark.sql import Window

    u = (
        F.conv(F.substring(F.md5(F.col("k")), 1, 13), 16, 10).cast("double")
        / F.lit(float(16**13))
    )
    hashes = (
        events.filter(F.col(key_col).isNotNull())
        .select("event_type", F.col(key_col).cast("string").alias("k"))
        .distinct()
        .withColumn("u", u)
    )
    w = Window.partitionBy("event_type").orderBy("u", "k")
    sk = (
        hashes.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("event_type", "k", "u", "rn")
    )
    thetas = sk.groupBy("event_type").agg(
        F.when(F.max("rn") >= k, F.max("u")).otherwise(F.lit(1.0)).alias("theta")
    )
    pairs = (
        thetas.select(F.col("event_type").alias("type_a"), F.col("theta").alias("th_a"))
        .join(
            thetas.select(
                F.col("event_type").alias("type_b"), F.col("theta").alias("th_b")
            ),
            F.col("type_a") < F.col("type_b"),
        )
        .select("type_a", "type_b", F.least("th_a", "th_b").alias("theta"))
    )
    # sketch entries of each side below the pair's theta
    ea = pairs.join(
        sk.select(F.col("event_type").alias("type_a"), "k", "u"), "type_a"
    ).filter(F.col("u") < F.col("theta"))
    eb = pairs.join(
        sk.select(F.col("event_type").alias("type_b"), "k", "u"), "type_b"
    ).filter(F.col("u") < F.col("theta"))
    inter = (
        ea.join(eb.select("type_a", "type_b", "k"), ["type_a", "type_b", "k"])
        .groupBy("type_a", "type_b")
        .agg(F.count("*").alias("n_inter"))
    )
    uni = (
        ea.select("type_a", "type_b", "k")
        .unionByName(eb.select("type_a", "type_b", "k"))
        .distinct()
        .groupBy("type_a", "type_b")
        .agg(F.count("*").alias("n_union"))
    )
    return (
        pairs.join(uni, ["type_a", "type_b"], "left")
        .join(inter, ["type_a", "type_b"], "left")
        .select(
            "type_a",
            "type_b",
            F.round(
                F.coalesce(F.col("n_union"), F.lit(0)) / F.col("theta"), 4
            ).alias("est_union"),
            F.round(
                F.coalesce(F.col("n_inter"), F.lit(0)) / F.col("theta"), 4
            ).alias("est_intersect"),
            F.round(
                F.when(
                    F.coalesce(F.col("n_union"), F.lit(0)) > 0,
                    F.coalesce(F.col("n_inter"), F.lit(0)).cast("double")
                    / F.col("n_union"),
                ).otherwise(F.lit(0.0)),
                4,
            ).alias("est_jaccard"),
        )
    )
