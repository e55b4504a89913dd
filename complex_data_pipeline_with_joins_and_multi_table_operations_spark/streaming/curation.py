"""Continuous near-dedup ingest: a txlog commit tail driving exactly-once
corpus growth.

The batch operator (`operators/dedup.py::near_dedup_against_corpus`)
answers "which of these documents are new against the standing corpus" —
this module runs that decision CONTINUOUSLY: new document commits stream
out of a transaction-log landing table (`sources/pyds.py` readStream
tails the commit log exactly-once), each microbatch keeps only the
documents with no exact or near duplicate (shingle-set Jaccard ≥
threshold) in the curated corpus, and the survivors are appended to that
same corpus table under a Delta-style idempotent-writer token — a
microbatch replayed across a crash (foreachBatch's at-least-once seam)
cannot append twice.

This is the pretraining-ingest loop at its production shape: the corpus
only ever grows by appends, each ingest shuffles only the NEW slice's
band keys against the corpus signatures (the operator signatures the
corpus over distinct texts; at 100 TB a materialized signatures table
slots in via the operator's relation-shaped corpus argument), and the
whole history of what was admitted when is time-travelable through the
corpus table's own commit log.  Compare `streaming/incremental.py`,
which runs the same tail for summary maintenance — together they are
the reference's batch orchestration (IngestionJob → AggregationJob full
rebuilds) upgraded to an incremental, exactly-once pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.dedup import near_dedup_against_corpus
from ..sources.pyds import register_txlog
from ..sources.txlog import TableLog


def dedup_batch_into_corpus(
    spark: SparkSession,
    batch: DataFrame,
    corpus_root: str,
    k: int = 3,
    threshold: float = 0.5,
    txn: tuple[str, int] | None = None,
) -> int:
    """One ingest step: keep ``batch`` documents with no exact/near dup in
    the corpus table at ``corpus_root`` (created on first step — the
    first batch dedups against an empty corpus, which still collapses
    intra-batch exact duplicates to their min-id representative), append
    the survivors, and return the corpus version.  ``txn`` makes a
    replayed step a no-op.  Exposed separately from the stream loop so
    batch backfills reuse the identical decision (same math ⇒ same
    corpus)."""
    log = TableLog(spark, corpus_root)
    corpus = log.read() if log.exists() else batch.limit(0)
    # track the operator's internal persists and release them once the
    # append has consumed the plan — a stream runs this every microbatch,
    # and unreleased signature caches would accumulate for its lifetime
    persisted: list = []
    survivors = near_dedup_against_corpus(
        batch, corpus, k=k, threshold=threshold, persist_tracker=persisted
    )
    try:
        return log.write(survivors, mode="append", txn=txn)
    finally:
        for df in persisted:
            df.unpersist()


def run_incremental_curation(
    spark: SparkSession,
    source_root: str,
    corpus_root: str,
    checkpoint: str,
    k: int = 3,
    threshold: float = 0.5,
    timeout_s: int = 120,
) -> None:
    """Drain every unprocessed landing-table commit into the curated
    corpus, exactly once: ``readStream.format("txlog")`` tails the
    landing commit log from the checkpoint's high-water mark
    (availableNow → returns when caught up); each microbatch dedups via
    :func:`dedup_batch_into_corpus` with the checkpoint's batch id as
    the transaction token.  Call after each crawl drop, or leave a
    processingTime variant running — the checkpoint makes either
    schedule resume-safe."""
    register_txlog(spark)
    app_id = f"incremental-curation:{corpus_root}"

    def fold(batch: DataFrame, batch_id: int) -> None:
        dedup_batch_into_corpus(
            spark,
            batch,
            corpus_root,
            k=k,
            threshold=threshold,
            txn=(app_id, batch_id),
        )

    q = (
        spark.readStream.format("txlog")
        .load(source_root)
        .writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout_s):
        # same drain-budget contract as run_incremental_summary: never
        # return as if caught up while the query still runs
        q.stop()
        raise TimeoutError(
            f"incremental curation drain exceeded {timeout_s}s; stopped — "
            "completed microbatches are committed, re-run to resume from "
            "the checkpoint"
        )
