"""Deterministic sampling operators for training-data pipelines.

Random sampling (df.sample) is seed-and-partitioning dependent — two runs
over different file splits draw different rows, which breaks re-runnable
pipelines and cross-engine oracles. Everything here derives the sampling
decision from a content hash (md5 — identical across Spark and DuckDB),
so the sample is a pure function of the data:

- :func:`hash_sample` — Bernoulli p% by hex-prefix threshold on
  md5(key): a scan-local filter, no shuffle, pushes down beautifully.
- :func:`quota_sample` — per-group cap (corpus balancing: at most N docs
  per (lang, source)), hash-ordered so the kept set is stable under
  re-partitioning. One shuffle on the group key; the per-group sort is
  bounded by the group size, and hot groups are exactly the ones the
  quota truncates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# 2-hex-digit threshold: rate ≈ t/256. Comparing the md5 PREFIX as a
# string is engine-portable (hex chars sort identically everywhere) and
# avoids hex→int casts that differ between SQL dialects.


def _hex_threshold(rate_pct: float) -> str | None:
    """2-hex threshold for rate_pct, or None when the rounded threshold
    reaches 256 — 'ff' would silently drop the 1/256 of keys whose prefix
    IS 'ff', so a (near-)full rate must bypass the compare entirely."""
    t = max(0, round(rate_pct / 100.0 * 256))
    return None if t >= 256 else format(t, "02x")


def hash_sample(df: DataFrame, key_col: str, rate_pct: float) -> DataFrame:
    """Deterministic ~``rate_pct``% Bernoulli sample: keep rows whose
    md5(key) hex prefix falls under the rate threshold. Granularity is
    1/256 ≈ 0.4%; the decision is per-key, so the same key is always in
    or always out — across runs, engines, and partitionings. A rate that
    rounds to full (≥ 99.8%) keeps every row."""
    thr = _hex_threshold(rate_pct)
    if thr is None:
        return df
    return df.filter(
        F.substring(F.md5(F.col(key_col).cast("string")), 1, 2) < F.lit(thr)
    )


def quota_sample(
    documents: DataFrame,
    group_cols: tuple[str, ...] = ("lang", "source"),
    per_group: int = 100,
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus balancing: keep at most ``per_group`` rows per group,
    chosen by md5-of-id order (a deterministic uniform draw within the
    group — NOT first-seen order, which would bias toward early files).

    The row_number window shuffles once on the group key; quota output
    is ≤ groups × per_group rows, so downstream stages are bounded no
    matter how skewed the corpus is toward one domain."""
    w = Window.partitionBy(*[F.col(c) for c in group_cols]).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        documents.withColumn("_qrank", F.row_number().over(w))
        .filter(F.col("_qrank") <= per_group)
        .drop("_qrank")
    )


def split_assign(
    df: DataFrame,
    key_col: str,
    weights: dict[str, float] | None = None,
) -> DataFrame:
    """Deterministic train/val/test assignment: each row's split is a
    pure function of md5(key), so membership is stable across runs,
    engines, partitionings, and incremental re-ingests (a re-crawled
    document lands in the same split it was in last month — the property
    that prevents eval leakage when the corpus is rebuilt).

    The first 4 hex chars of the digest (16 bits, 1/65536 granularity)
    are compared lexicographically against cumulative hex thresholds —
    no hex→int cast, so the same CASE expression runs anywhere. Pure
    projection: no shuffle, pushes past any downstream partitioning.
    """
    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    prefix = F.substring(F.md5(F.col(key_col).cast("string")), 1, 4)
    names = list(weights)
    cum = 0.0
    expr = None
    for name in names[:-1]:
        cum += weights[name]
        thr = format(min(65535, round(cum * 65536)), "04x")
        cond = prefix < F.lit(thr)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    split = F.lit(names[0]) if expr is None else expr.otherwise(names[-1])
    return df.withColumn("split", split)


def pack_sequences(
    documents: DataFrame,
    budget_tokens: int = 2048,
    id_col: str = "doc_id",
) -> DataFrame:
    """Assign each document to a fixed-token-budget training sequence
    (the concat-and-chunk packing step before an LLM training run):
    documents are laid out in deterministic md5(id) order, the running
    token total is computed, and a doc lands in the sequence where it
    starts — ``seq_id = floor(tokens_before / budget)`` with its offset
    inside that sequence.

    A naive global ``SUM() OVER (ORDER BY ...)`` serializes the corpus
    through ONE window partition. Instead: hash order is bucketed by the
    md5 prefix (256 uniform buckets), cumsum runs within buckets
    (parallel, bounded by corpus/256), and per-bucket totals — 256 rows
    — broadcast back as prefix offsets. Equivalent to the global cumsum
    because bucket order IS the global hash order's leading key. Same
    two-level structure as the curation token budget, proven there.
    """
    from .text import tokens_col

    h = F.md5(F.col(id_col).cast("string"))
    base = documents.select(
        F.col(id_col),
        h.alias("h"),
        F.substring(h, 1, 2).alias("bucket"),
        F.size(tokens_col(F.col("text"))).cast("long").alias("n_tokens"),
    )
    w_in = (
        Window.partitionBy("bucket")
        .orderBy("h", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    buckets = base.groupBy("bucket").agg(F.sum("n_tokens").alias("bucket_tokens"))
    w_b = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    prefix = buckets.select(
        F.col("bucket").alias("bk"),
        (F.sum("bucket_tokens").over(w_b) - F.col("bucket_tokens")).alias(
            "tokens_before_bucket"
        ),
    )
    return (
        base.withColumn("cum_in_bucket", F.sum("n_tokens").over(w_in))
        .join(F.broadcast(prefix), F.col("bucket") == F.col("bk"))
        .withColumn(
            "tokens_before",
            F.col("tokens_before_bucket") + F.col("cum_in_bucket") - F.col("n_tokens"),
        )
        .select(
            id_col,
            "n_tokens",
            (F.col("tokens_before") / budget_tokens).cast("long").alias("seq_id"),
            (F.col("tokens_before") % budget_tokens).cast("long").alias("seq_offset"),
        )
    )


def mixture_sample(
    documents: DataFrame,
    weights: dict[str, float],
    group_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic domain-mixture sampling: downsample each group so the
    kept corpus matches the target token ``weights`` (corpus assembly with
    fixed domain proportions). The achievable total is set by the binding
    group — T = min(group_tokens / weight) — and every group keeps
    ``min(1, weight·T / group_tokens)`` of its tokens; at least one group
    passes through whole, the rest shrink to proportion.

    All distributed: group token totals are one tiny aggregate, the
    binding constraint is a single-row broadcast, and the keep decision
    is the md5-prefix threshold compare from :func:`hash_sample` with a
    per-group 4-hex threshold — scan-local, deterministic across runs,
    engines, and partitionings. Groups without a target weight are
    dropped (explicit mixture, not passthrough).
    """
    from .text import tokens_col

    spark = documents.sparkSession
    wdf = spark.createDataFrame(
        [(k, float(v)) for k, v in weights.items()], f"{group_col} string, w double"
    )
    base = documents.withColumn(
        "_nt", F.size(tokens_col(F.col("text"))).cast("long")
    )
    gs = (
        base.groupBy(group_col)
        .agg(F.sum("_nt").alias("g_tokens"))
        .join(wdf, group_col)
    )
    t_bind = gs.select(
        F.min(F.col("g_tokens") / F.col("w")).alias("t_total")
    )
    rates = (
        gs.crossJoin(F.broadcast(t_bind))
        .select(
            group_col,
            F.least(
                F.lit(1.0), F.col("w") * F.col("t_total") / F.col("g_tokens")
            ).alias("keep_rate"),
        )
        .withColumn("thr_int", F.round(F.col("keep_rate") * 65536).cast("int"))
        .withColumn("thr", F.format_string("%04x", F.col("thr_int")))
    )
    # full-keep groups bypass the threshold compare on the ROUNDED integer,
    # not on keep_rate >= 1.0: a rate of exactly 1.0 — or within ~8e-6 of
    # it — rounds to 65536, which formats as the 5-char '10000'; 4-char hex
    # prefixes starting with a-f sort ABOVE '1', so such a group would
    # silently keep only ~1/16 of rows it should keep (nearly) all of
    return (
        base.join(F.broadcast(rates), group_col)
        .filter(
            (F.col("thr_int") >= 65536)
            | (F.substring(F.md5(F.col(id_col).cast("string")), 1, 4) < F.col("thr"))
        )
        .select(
            id_col,
            group_col,
            "lang",
            F.col("_nt").cast("int").alias("n_tokens"),
            F.round("keep_rate", 4).alias("keep_rate"),
        )
    )


def weighted_sample(
    documents: DataFrame,
    weight_col: str = "n_chars",
    per_group: int = 50,
    group_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Weighted sampling without replacement, per group (Efraimidis &
    Spirakis 2006, "algorithm A-ES"): keep each group's ``per_group``
    rows with the largest key ln(u)/w, where u is a deterministic
    uniform draw from md5(id) and w the row's weight. The kept set is
    a true w-proportional sample — a row with twice the weight is
    (exactly) twice as likely to beat any given rival — yet fully
    re-runnable: membership is a pure function of (id, weight), stable
    across runs, engines, partitionings and incremental re-ingests,
    the same property :func:`hash_sample` gives the unweighted case.
    Training-data use: token-budgeted corpus downsampling where longer
    (or higher-quality-weighted) documents should be proportionally
    likelier to survive, per source so no domain is squeezed out.

    Cross-engine determinism (the kmv_distinct recipe): u = (m + 0.5) /
    2^52 with m the first 13 md5 hex digits — exact in a double, never
    0 — then ln is QUANTIZED to the 1e-6 grid before the division
    (libm's last-ulp differences are absorbed by the grid; the quotient
    of two bit-identical doubles is bit-identical), and ties break on
    id. Rows with NULL or non-positive weight are excluded — their key
    is undefined (ln(u)/0) or order-inverted (negative w flips the
    negative ln), matching the "no mass, no chance" reading.

    Scale shape: one projection computes the key scan-side, one shuffle
    on the group key for the row_number window; output is bounded at
    groups x per_group rows. (At extreme per-group cardinality the
    window becomes a top-k accumulator, same as top_terms' note.)
    """
    m = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 13), 16, 10
    ).cast("double")
    u = (m + F.lit(0.5)) / F.lit(float(16**13))
    key = F.round(F.log(u), 6) / F.col(weight_col).cast("double")
    w = Window.partitionBy(group_col).orderBy(
        F.desc("samp_key"), F.col(id_col)
    )
    return (
        documents.filter(
            F.col(weight_col).isNotNull() & (F.col(weight_col) > 0)
        )
        .select(group_col, id_col, weight_col)
        .withColumn("samp_key", key)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= per_group)
        .drop("_rn", "samp_key")
    )
