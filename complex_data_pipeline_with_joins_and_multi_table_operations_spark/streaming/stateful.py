"""Custom stateful streaming operator via applyInPandasWithState.

Running per-user totals maintained across micro-batches: the canonical
custom-state shape (anything groupBy+agg can't express incrementally —
session carts, fraud counters, CDC merge state). State is partitioned by
the grouping key across executors and persisted in the state store
between triggers; at scale, state size is bounded by key cardinality,
not stream length.

The update function is fully self-contained (no module globals) so its
cloudpickled closure runs on workers regardless of the driving process's
PYTHONPATH — same rule as every pandas UDF in this engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

RUNNING_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value_cents", LongType()),
    ]
)
STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("cents", LongType())]
)


def running_user_totals(events: DataFrame) -> DataFrame:
    """Streaming running (count, total) per user.

    Totals accumulate in integer cents — exact, order-independent — so
    the final state equals the batch aggregate regardless of how rows are
    split across micro-batches.
    """

    def _update(key, pdfs, state):
        import pandas as _pd

        n, cents = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            cents += int(round(pdf["value"].sum() * 100))
        state.update((n, cents))
        yield _pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value_cents": [cents]}
        )

    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update,
            outputStructType=RUNNING_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf="NoTimeout",
        )
    )


def run_running_totals(
    spark: SparkSession,
    source_path: str,
    checkpoint_dir: str,
    sink_table: str = "user_running_totals",
    max_files_per_trigger: int | None = None,
) -> None:
    """Drive the stateful operator over a backlog with availableNow; the
    memory sink (update mode) receives one row per user per trigger —
    the latest row per user is the running total."""
    from .events import read_events_stream

    stream = read_events_stream(
        spark, source_path, max_files_per_trigger=max_files_per_trigger
    )
    q = (
        running_user_totals(stream)
        .writeStream.format("memory")
        .queryName(sink_table)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
