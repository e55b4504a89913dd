from .curation import dedup_batch_into_corpus, run_incremental_curation
from .dedup import dedup_documents_stream, dedup_events_stream, run_stream_dedup
from .enrich import enrich_events_stream, pit_enrich_events_stream, run_stream_enrich
from .events import run_events_stream, streaming_tumbling_agg
from .incremental import fold_batch_into_summary, run_incremental_summary
from .stateful import run_running_totals, running_user_totals
from .upsert import apply_changes_batch, run_cdc_apply

__all__ = [
    "apply_changes_batch",
    "dedup_batch_into_corpus",
    "dedup_documents_stream",
    "dedup_events_stream",
    "enrich_events_stream",
    "fold_batch_into_summary",
    "pit_enrich_events_stream",
    "run_incremental_curation",
    "run_stream_enrich",
    "run_events_stream",
    "run_cdc_apply",
    "run_incremental_summary",
    "run_running_totals",
    "run_stream_dedup",
    "running_user_totals",
    "streaming_tumbling_agg",
]
