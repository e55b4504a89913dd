"""End-to-end training-data curation: the composition a 100 TB
pretraining pipeline runs over a raw document corpus —

    quality filter → exact dedup → near-dup removal → token-budget cut

Each stage is one of this engine's tested operators (text.text_stats,
ngram blocking from dedup); this module only wires them together, so the
composition inherits their oracles and their scale properties.

Scale design notes:
- The token-budget cut is NOT a global ordered cumulative sum (a single
  sort task at corpus scale). quality_score has ≤ 11 distinct values, so
  the running total decomposes into a two-level cumsum: a per-tier prefix
  (a window over the ≤ 11-row tier summary, broadcast back) plus a
  within-tier cumsum (windows partitioned by tier → parallel, each
  bounded by its tier's size). The result is identical to the global
  ORDER BY quality DESC, doc_id cumsum — which is exactly what the SQL
  oracle runs.
- Near-dup removal keeps the lowest doc_id of each blocked Jaccard pair
  (greedy min-id keeper), implemented as a left-anti join against the
  pair list's doc_b side — no iterative connected components.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from . import dedup
from .text import quality_cols


def curate_documents(
    documents: DataFrame,
    min_quality: float = 0.8,
    jaccard_k: int = 3,
    jaccard_threshold: float = 0.5,
    token_budget: int | None = 20000,
) -> DataFrame:
    """Returns the curated document set with its running token total:
    (doc_id, lang, source, n_tokens, quality_score, cum_tokens)."""
    # quality inline on the scan (shared expressions with text_stats) —
    # no documents⋈text_stats self-join, so the corpus is read ONCE
    n_tokens, quality = quality_cols(F.col("text"))
    qualified = (
        documents.withColumn("n_tokens", n_tokens)
        .withColumn("quality_score", quality)
        .filter(F.col("quality_score") >= min_quality)
        .select("doc_id", "text", "lang", "source", "n_chars",
                "n_tokens", "quality_score")
    )

    # exact dedup: keep the lowest doc_id per content hash
    w_hash = Window.partitionBy(F.md5(F.coalesce("text", F.lit("")))).orderBy(
        "doc_id"
    )
    uniq = (
        qualified.withColumn("rn", F.row_number().over(w_hash))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )

    # near-dup removal: blocked n-gram Jaccard pairs → drop every doc_b.
    # uniq is exact-deduped above, so the pair stage skips its own
    # collapse-exact-first pass (three shuffles that would all be
    # singleton groups here)
    pairs = dedup.ngram_jaccard_pairs(
        uniq.select("doc_id", "text", "lang", "source", "n_chars"),
        k=jaccard_k,
        threshold=jaccard_threshold,
        assume_unique_texts=True,
    )
    drop_ids = pairs.select(F.col("doc_b").alias("drop_id")).distinct()
    kept = uniq.join(
        drop_ids, F.col("doc_id") == F.col("drop_id"), "left_anti"
    ).select("doc_id", "lang", "source", "n_tokens", "quality_score")

    # token budget: two-level cumsum ≡ global cumsum over
    # (quality DESC, doc_id) — see module docstring
    w_in_tier = (
        Window.partitionBy("quality_score")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tiers = kept.groupBy("quality_score").agg(
        F.sum("n_tokens").alias("tier_tokens")
    )
    w_tiers = (
        Window.orderBy(F.desc("quality_score"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tier_prefix = tiers.select(
        F.col("quality_score").alias("qs"),
        (F.sum("tier_tokens").over(w_tiers) - F.col("tier_tokens")).alias(
            "cum_before"
        ),
    )
    out = (
        kept.withColumn("cum_in_tier", F.sum("n_tokens").over(w_in_tier))
        .join(F.broadcast(tier_prefix), F.col("quality_score") == F.col("qs"))
        .withColumn(
            "cum_tokens", (F.col("cum_before") + F.col("cum_in_tier")).cast("bigint")
        )
        .select(
            "doc_id", "lang", "source", "n_tokens", "quality_score", "cum_tokens"
        )
    )
    if token_budget is not None:
        out = out.filter(F.col("cum_tokens") <= token_budget)
    return out


def rank_fusion_curation(
    documents: DataFrame,
    embeddings: DataFrame,
    per_group: int = 25,
    target_label: int = 0,
    cls_scores: DataFrame | None = None,
    ppl_scores: DataFrame | None = None,
) -> DataFrame:
    """Model-ensemble curation by Borda rank fusion — the multi-signal
    selection step of a DataComp/FineWeb-style pipeline: three
    INDEPENDENT quality models each rank every document within its
    (lang, source) slice, and the per-slice winners are the documents
    with the best summed rank. Signals: the distributed-GD logistic
    classifier's P(target-class | embedding) (classify.classifier_scores),
    the bigram-LM average log-probability (lm.perplexity_scores — higher
    = more fluent under the corpus LM), and the heuristic quality score
    (text.quality_cols). Rank fusion deliberately works in RANK space:
    the three scores live on incomparable scales (a probability, a
    log-prob, a 0-1 heuristic), and ranks are integers — so the fused
    ordering needs no cross-signal normalization and the whole output is
    integer-exact for the oracle (the float scores only ever feed
    row_number ORDER BYs, where the engine's quantized-score recipes
    already guarantee cross-engine bit-identical ordering; doc_id breaks
    ties).

    Joins are inner on doc_id (= vec_id: the embedding of that
    document): a document missing any signal — no bigrams, no embedding
    — can't be fairly fused and is excluded, mirrored by the oracle.

    Scale shape: each signal is its operator's own (probed) cost; fusion
    adds ONE shuffle on (lang, source) under which all four window
    functions run (same partitioning → one Exchange, asserted by the
    plan audit), output capped at slices × per_group. Hot slices at
    corpus scale take the pack_sequences two-level treatment; the
    per-slice form here matches quota_sample's granularity.

    ``cls_scores`` / ``ppl_scores`` accept pre-computed signal frames
    (classifier: ``(vec_id, score)``-shaped; LM: ``(doc_id, avg_logp)``)
    so the production path can fuse against persisted models instead of
    retraining both inside the query — see :func:`rank_fusion_cached`.
    """
    from . import classify, lm
    from .text import quality_cols as _qc

    if cls_scores is None:
        cls_scores = classify.classifier_scores(
            embeddings, target_label=target_label
        )
    cls = cls_scores.select(F.col("vec_id").alias("doc_id"), "score")
    if ppl_scores is None:
        # materialize the in-query-trained LM: inside this composition
        # the lazy double-training re-execution dominates (sf10 fused
        # 24.3 -> 14.2 s measured; see perplexity_scores' docstring for
        # why standalone scoring makes the opposite choice)
        ppl_scores = lm.perplexity_scores(documents, materialize_lm=True)
    ppl = ppl_scores.select("doc_id", "avg_logp")
    _, quality = _qc(F.col("text"))
    q = documents.select("doc_id", "lang", "source", quality.alias("quality"))
    joined = q.join(ppl, "doc_id").join(cls, "doc_id")
    slice_by = [F.col("lang"), F.col("source")]
    r_cls = F.row_number().over(
        Window.partitionBy(*slice_by).orderBy(F.desc("score"), F.col("doc_id"))
    )
    r_ppl = F.row_number().over(
        Window.partitionBy(*slice_by).orderBy(F.desc("avg_logp"), F.col("doc_id"))
    )
    r_q = F.row_number().over(
        Window.partitionBy(*slice_by).orderBy(F.desc("quality"), F.col("doc_id"))
    )
    ranked = (
        joined.withColumn("r_cls", r_cls)
        .withColumn("r_ppl", r_ppl)
        .withColumn("r_q", r_q)
        .withColumn("borda", F.col("r_cls") + F.col("r_ppl") + F.col("r_q"))
    )
    rn = F.row_number().over(
        Window.partitionBy(*slice_by).orderBy(F.col("borda"), F.col("doc_id"))
    )
    return (
        ranked.withColumn("_rn", rn)
        .filter(F.col("_rn") <= per_group)
        .select("lang", "source", "doc_id", "r_cls", "r_ppl", "r_q", "borda")
    )


def rank_fusion_cached(
    documents: DataFrame,
    embeddings: DataFrame,
    cls_root: str,
    lm_root: str,
    per_group: int = 25,
    target_label: int = 0,
) -> DataFrame:
    """:func:`rank_fusion_curation` against PERSISTED models — the
    production shape. The fused form retrains the GD classifier and the
    bigram LM on every invocation (deliberately, so the driver's hash
    check covers both training trajectories); here both models are read
    back from their transaction-log tables (``classify.model_build`` /
    ``lm.lm_build``) and the query only scores and fuses. Scores are
    bit-equal to the fused form (both cached scorers are — asserted in
    tests), ranks are integers over those scores, so the output is
    bit-identical: same oracle, and its hash check proves BOTH model
    round-trips through one composed query. At 100 TB this is the only
    sane shape — training amortizes across every curation run, and the
    per-run cost drops to three scans + one (lang, source) Exchange."""
    from . import classify, lm

    cls = classify.model_score(embeddings, cls_root, target_label=target_label)
    ppl = lm.perplexity_cached(documents, lm_root)
    return rank_fusion_curation(
        documents,
        embeddings,
        per_group=per_group,
        target_label=target_label,
        cls_scores=cls,
        ppl_scores=ppl,
    )
