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


def _hex_threshold(rate_pct: float) -> str:
    t = max(0, min(255, round(rate_pct / 100.0 * 256)))
    return format(t, "02x")


def hash_sample(df: DataFrame, key_col: str, rate_pct: float) -> DataFrame:
    """Deterministic ~``rate_pct``% Bernoulli sample: keep rows whose
    md5(key) hex prefix falls under the rate threshold. Granularity is
    1/256 ≈ 0.4%; the decision is per-key, so the same key is always in
    or always out — across runs, engines, and partitionings."""
    thr = _hex_threshold(rate_pct)
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
