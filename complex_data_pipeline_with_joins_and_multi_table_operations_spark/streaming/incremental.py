"""Continuous incremental pipeline: a txlog commit tail driving exactly-once
summary maintenance.

This is the reference's five-batch-job orchestration
(IngestionJob → … → AggregationJob, each a full rebuild —
AggregationJob.scala:53-90 re-aggregates the whole fact every run)
upgraded to change data capture: new fact commits stream out of the
transaction log (`sources/pyds.py` readStream tails the commit log
exactly-once), each microbatch's PARTIAL aggregates fold into a standing
summary table (`operators/changes.py::merge_partial_aggregates` — counts
add, exact-decimal sums add), and the summary is itself a transaction-log
table whose commits carry a Delta-style idempotent-writer token, so a
microbatch replayed across a crash (foreachBatch's at-least-once seam)
cannot double-count. At 100 TB the difference is structural: the rebuild
re-shuffles the full history per refresh, the fold shuffles only the new
slice.

Appends stream; overwrites/replaces intentionally fail the tail (the
pyds guardrail) — full CDC with deletes is the BATCH feed
(`TableLog.table_changes` + `apply_changes_to_summary`), because a
rewritten history is precisely what a pure append tail must not silently
reinterpret.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.aggregates import exact_sum
from ..operators.changes import merge_partial_aggregates
from ..sources.pyds import register_txlog
from ..sources.txlog import TableLog


def fold_batch_into_summary(
    spark: SparkSession,
    batch: DataFrame,
    summary_root: str,
    keys: list[str],
    count_col: str = "cnt",
    sum_cols: dict[str, int] | None = None,
    txn: tuple[str, int] | None = None,
) -> int:
    """One fold step: aggregate ``batch`` to partial states and merge them
    into the summary table at ``summary_root`` (created on first fold),
    committing with ``txn`` for replay idempotence. Returns the summary
    table version. Exposed separately from the stream loop so batch
    backfills can reuse the identical fold (same math ⇒ same bits)."""
    import pyspark.sql.functions as F

    sum_cols = sum_cols or {}
    log = TableLog(spark, summary_root)
    if log.exists():
        summary = log.read()
        merged = merge_partial_aggregates(
            summary, batch, keys, count_col=count_col, sum_cols=sum_cols
        )
    else:
        merged = batch.groupBy(*keys).agg(
            F.count("*").alias(count_col),
            *[exact_sum(c, s).alias(c) for c, s in sum_cols.items()],
        )
    # the overwrite snapshots the read side's files before removing them
    # from the active set (they stay on disk for time travel), so the
    # lazy self-read is safe
    return log.write(merged, mode="overwrite", txn=txn)


def run_incremental_summary(
    spark: SparkSession,
    source_root: str,
    summary_root: str,
    checkpoint: str,
    keys: list[str],
    count_col: str = "cnt",
    sum_cols: dict[str, int] | None = None,
    timeout_s: int = 120,
) -> None:
    """Drain every unprocessed source commit into the summary, exactly
    once: ``readStream.format("txlog")`` tails the source commit log from
    the checkpoint's high-water mark (availableNow → returns when caught
    up), and each microbatch folds via :func:`fold_batch_into_summary`
    with the checkpoint's batch id as the transaction token. Call it
    after each ingest, or leave a processingTime variant running — the
    checkpoint makes either schedule resume-safe."""
    register_txlog(spark)
    app_id = f"incremental-summary:{summary_root}"

    def fold(batch: DataFrame, batch_id: int) -> None:
        fold_batch_into_summary(
            spark,
            batch,
            summary_root,
            keys,
            count_col=count_col,
            sum_cols=sum_cols,
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
        # a drain slower than the budget must not return as if caught up
        # (the caller would read a partial summary, and the still-running
        # query would collide with the next drain's checkpoint); stop it
        # — the txn token makes the interrupted microbatch safe to replay
        # — and say so
        q.stop()
        raise TimeoutError(
            f"incremental summary drain exceeded {timeout_s}s; stopped — "
            "completed microbatches are committed, re-run to resume from "
            "the checkpoint"
        )
