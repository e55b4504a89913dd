"""Continuous CDC apply: a stream of upsert/delete records merged into a
transaction-log table, exactly once.

This is the missing verb between the two existing continuous loops —
`streaming/incremental.py` folds ADDITIVE partials (aggregation
maintenance) and `streaming/curation.py` grows an append-only corpus;
neither can apply a keyed mutation stream (the classic CDC landing
pattern: a change stream of latest-row-wins records, some flagged
deleted, continuously materialized as a queryable table). With
``TableLog.merge`` this is one line per microbatch:

- each microbatch MERGEs into the target (matched update, unmatched
  insert, flagged delete — the merge_upsert semantics), with stats-based
  file pruning keeping the rewrite proportional to the touched keys, not
  the table;
- the merge commit carries the Delta-style idempotent-writer token
  (app id + microbatch id), so a microbatch replayed across a crash
  (foreachBatch's at-least-once seam) commits nothing the second time —
  exactly-once at the table;
- ONE caveat a correct CDC apply must own: if a single microbatch holds
  several changes for the same key, MERGE would see a duplicate-key
  source. The loop therefore collapses each batch to its LAST change per
  key first (by a caller-named ordering column — CDC feeds carry an
  LSN/commit timestamp). For a TIME-ORDERED feed (each batch's changes
  follow every earlier batch's — what a log tail delivers) this makes
  the apply batch-boundary invariant: slicing the stream at any
  boundaries yields the bit-identical table (tested). A feed that can
  deliver old changes in later batches takes ``out_of_order=True`` —
  the tombstone-retaining ``TableLog.merge_latest`` apply (WHEN MATCHED
  AND source.order >= target.order; deletes persist as flagged rows so
  a stale update can never resurrect a deleted key), invariant to
  ARBITRARY slicing (tested); its live view filters the flag.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.txlog import TableLog


def apply_changes_batch(
    spark: SparkSession,
    batch: DataFrame,
    target_root: str,
    keys: list[str],
    order_col: str,
    delete_col: str | None = None,
    txn: tuple[str, int] | None = None,
    out_of_order: bool = False,
    via: str = "cow",
) -> dict:
    """Apply one slice of a change stream: keep the last change per key
    (``order_col`` descending, ties broken by the change columns for
    determinism), then MERGE into the target — creating it on first
    apply. Exposed separately from the stream loop so batch backfills
    reuse the identical apply (same collapse, same merge, same bits)."""
    w = Window.partitionBy(*keys).orderBy(
        F.desc(order_col), *[F.desc(c) for c in batch.columns if c not in keys]
    )
    latest = (
        batch.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    log = TableLog(spark, target_root)
    if out_of_order:
        # tombstone-retaining apply (TableLog.merge_latest): the delete
        # flag IS a table column; readers filter it for the live view
        if not log.exists():
            v = log.write(latest, mode="overwrite", txn=txn)
            return {
                "version": v,
                "files_rewritten": 0,
                "rows_written": latest.count(),
            }
        return log.merge_latest(
            latest, keys, order_col, delete_col=delete_col, txn=txn, via=via
        )
    if not log.exists():
        cols = [c for c in latest.columns if c != delete_col]
        first = latest.select(*cols)
        if delete_col is not None:
            first = latest.filter(
                ~F.coalesce(F.col(delete_col), F.lit(False))
            ).select(*cols)
        v = log.write(first, mode="overwrite", txn=txn)
        return {"version": v, "files_rewritten": 0, "rows_written": first.count()}
    return log.merge(
        latest,
        keys,
        delete_condition=delete_col,
        txn=txn,
        # CDC semantics: a delete record for a key the table never had is
        # a no-op, not an insert (SQL MERGE's rule is the batch default)
        insert_unmatched_deletes=False,
        # via="dv": each microbatch appends only its changed rows and
        # deletion-vectors the superseded positions — the landing table
        # never rewrites host files between OPTIMIZE passes
        via=via,
    )


def run_cdc_apply(
    spark: SparkSession,
    source_stream: DataFrame,
    target_root: str,
    checkpoint: str,
    keys: list[str],
    order_col: str,
    delete_col: str | None = None,
    timeout_s: int = 120,
    out_of_order: bool = False,
    via: str = "cow",
) -> None:
    """Drain a change stream into the target table exactly once:
    availableNow trigger, per-microbatch :func:`apply_changes_batch`
    with the checkpoint's batch id as the idempotent-writer token.
    ``out_of_order=True`` switches to the tombstone-retaining
    merge_latest apply for feeds that can deliver old changes late."""
    app_id = f"cdc-apply:{target_root}"

    def apply(batch: DataFrame, batch_id: int) -> None:
        apply_changes_batch(
            spark,
            batch,
            target_root,
            keys,
            order_col,
            delete_col=delete_col,
            txn=(app_id, batch_id),
            out_of_order=out_of_order,
            via=via,
        )

    q = (
        source_stream.writeStream.foreachBatch(apply)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout_s):
        q.stop()
        raise TimeoutError(
            f"cdc apply exceeded {timeout_s}s; stopped — completed "
            "microbatches are committed, re-run to resume from the checkpoint"
        )
