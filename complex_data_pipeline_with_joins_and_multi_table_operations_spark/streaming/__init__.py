from .events import run_events_stream, streaming_tumbling_agg
from .stateful import run_running_totals, running_user_totals

__all__ = [
    "run_events_stream",
    "run_running_totals",
    "running_user_totals",
    "streaming_tumbling_agg",
]
