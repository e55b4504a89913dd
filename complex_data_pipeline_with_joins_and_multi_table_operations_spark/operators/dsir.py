"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
public method): score every document in a raw pool by how much more
likely a TARGET-domain bag-of-hashed-ngrams model finds it than the
raw-pool model.  The modern pretraining move for "give me more data
that looks like my high-quality seed set" — the learned counterpart of
the heuristic quality filters, and cheaper than the classifier because
the "model" is two multinomial count vectors.

Formulation (the paper's hashed n-gram variant):

- features: word unigrams AND bigrams, hashed into ``buckets`` (B)
  cells via the engine's cross-engine md5 52-bit prefix;
- two add-1-smoothed multinomials over the cells — target (documents
  matching the caller's predicate) and raw (the WHOLE pool, target
  included: the paper scores the pool it resamples from);
- per-document log importance weight
  ``Σ_occurrences [ln p_t(b) − ln p_r(b)]``.

Determinism — one step past the lm.py recipe, fully INTEGER: each ln
term's argument is an exact integer (count+1 or total+B), and
``micro(v) = CAST(CAST(round(ln(v), 6) AS DECIMAL(28,14)) * 1e6 AS
BIGINT)`` lands the quantized log on an exact micro-unit integer (the
round-6 double sits within ~4e-15 of its 1e-6 grid point, so the
14-place decimal cast recovers the grid exactly — the lm.py argument).
Everything after is BIGINT arithmetic: the per-cell log-ratio is a
difference of four micro terms, the per-document weight a plain SUM —
no float exists past the four lns, so the output hashes identically on
any engine and any partitioning.

100 TB shape: one tokenize-explode pass (2 rows per token) → a
B-bounded count shuffle with map-side combine (the cell table is
``buckets`` rows — KB-sized metadata) → the log-ratio table broadcast
back onto the same exploded pass for the per-doc sum, which reuses the
scan's doc_id grouping.  Cost is two passes over corpus tokens and one
broadcast; nothing corpus-sized ever shuffles except the final per-doc
partial aggregates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .text import tokens_col

BUCKETS = 4096


def _micro_qln(v: Column) -> Column:
    """Quantized ln as an exact BIGINT count of 1e-6 units; ``v`` must
    be an exact-integer-valued expression so both engines hand libm the
    identical argument."""
    return (
        (F.round(F.log(v.cast("double")), 6).cast("decimal(28,14)") * 1000000)
        .cast("long")
    )


def _feature_occurrences(base: DataFrame, buckets: int) -> DataFrame:
    """(doc_id, _t, bucket): one row per unigram/bigram OCCURRENCE,
    hashed into its cell; the target flag travels WITH the explode so
    no join is needed to split the counts.  Summing per-occurrence
    (instead of joining doc-level count vectors) keeps the weight a
    plain integer sum."""
    toks = tokens_col(F.col("text"))
    n = F.size(toks)
    bigrams = F.zip_with(
        F.slice(toks, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    feats = F.concat(toks, bigrams)
    bucket = (
        F.conv(F.substring(F.md5(F.col("feat")), 1, 13), 16, 10).cast("long")
        % buckets
    )
    return base.select("doc_id", "_t", F.explode(feats).alias("feat")).select(
        "doc_id", "_t", bucket.alias("bucket")
    )


def ratio_table(
    documents: DataFrame,
    target: Column,
    buckets: int = BUCKETS,
) -> DataFrame:
    """(bucket, lr_micro): the per-cell log importance ratio — the
    entire DSIR "model" (B rows).  A cell unseen in training scores
    the constant ``micro(ln(nr+B)) − micro(ln(nt+B))`` (both counts
    smooth to 1); scorers coalesce misses to that value, which
    :func:`dsir_build` persists alongside the table."""
    base = documents.select("doc_id", "text", target.alias("_t"))
    occ = _feature_occurrences(base, buckets)
    cells = occ.groupBy("bucket").agg(
        F.sum(F.when(F.col("_t"), 1).otherwise(0)).alias("ct"),
        F.count(F.lit(1)).alias("cr"),
    )
    totals = cells.agg(F.sum("ct").alias("nt"), F.sum("cr").alias("nr"))
    # broadcast scalar bind (the sampling.py/text.py pattern)
    return cells.crossJoin(F.broadcast(totals)).select(
        "bucket",
        (
            _micro_qln(F.col("ct") + 1)
            - _micro_qln(F.col("cr") + 1)
            + _micro_qln(F.col("nr") + buckets)
            - _micro_qln(F.col("nt") + buckets)
        ).alias("lr_micro"),
    )


def _score(
    documents: DataFrame,
    lr: DataFrame,
    buckets: int,
    default_micro: Column | None = None,
) -> DataFrame:
    occ = _feature_occurrences(
        documents.select("doc_id", "text", F.lit(False).alias("_t")), buckets
    )
    joined = occ.join(F.broadcast(lr), "bucket", "left")
    contrib = (
        F.coalesce(F.col("lr_micro"), default_micro)
        if default_micro is not None
        else F.col("lr_micro")
    )
    return (
        joined.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            F.sum(contrib).alias("weight_micro"),
        )
        .select(
            "doc_id",
            "n_feats",
            "weight_micro",
            (F.col("weight_micro").cast("double") / 1000000.0).alias("weight"),
        )
    )


def dsir_weights(
    documents: DataFrame,
    target: Column,
    buckets: int = BUCKETS,
) -> DataFrame:
    """(doc_id, n_feats, weight_micro, weight): per-document DSIR log
    importance weight in exact micro-units (`weight` is the readable
    double, derived from the integer).  ``target`` is a boolean Column
    over the documents' columns selecting the target-domain seed set.
    Resample by weight (or weight + Gumbel noise, per the paper) to
    taste — the scoring is the distributed part.  Fused train-and-score
    (every cell the pool can hit exists in the table, so no default is
    needed); the production split is :func:`dsir_build` /
    :func:`dsir_weights_cached`."""
    return _score(documents, ratio_table(documents, target, buckets), buckets)


def dsir_build(
    documents: DataFrame,
    target: Column,
    root: str,
    buckets: int = BUCKETS,
) -> str:
    """Train-once half of the production split (the fifth persisted
    model after PQ, classifier, LM, tokenizer): commit the B-row ratio
    table and its metadata (buckets, the unseen-cell default) to
    transaction-log tables — re-deriving the seed set commits a new
    snapshot, ``versionAsOf`` pins old selections."""
    import os

    from ..sources.txlog import TableLog

    spark = documents.sparkSession
    lr = ratio_table(documents, target, buckets)
    base = documents.select("doc_id", "text", target.alias("_t"))
    occ = _feature_occurrences(base, buckets)
    totals = occ.agg(
        F.sum(F.when(F.col("_t"), 1).otherwise(0)).alias("nt"),
        F.count(F.lit(1)).alias("nr"),
    )
    default = totals.select(
        (
            _micro_qln(F.col("nr") + buckets) - _micro_qln(F.col("nt") + buckets)
        ).alias("default_micro")
    ).head()["default_micro"]
    TableLog(spark, os.path.join(root, "lr")).write(lr, mode="overwrite")
    TableLog(spark, os.path.join(root, "meta")).write(
        spark.createDataFrame(
            [(int(buckets), int(default))], "buckets long, default_micro long"
        ),
        mode="overwrite",
    )
    return root


def dsir_weights_cached(documents: DataFrame, root: str) -> DataFrame:
    """Score-many half: read the persisted ratio table back (BIGINTs
    round-trip parquet exactly, so scores over the training pool are
    bit-equal to the fused form — asserted in tests) and score any
    corpus scan-locally; cells the training pool never saw coalesce to
    the persisted smoothed default."""
    import os

    from ..sources.txlog import TableLog

    spark = documents.sparkSession
    lr = TableLog(spark, os.path.join(root, "lr")).read()
    meta = TableLog(spark, os.path.join(root, "meta")).read().head()
    return _score(
        documents,
        lr,
        int(meta["buckets"]),
        default_micro=F.lit(int(meta["default_micro"])),
    )
