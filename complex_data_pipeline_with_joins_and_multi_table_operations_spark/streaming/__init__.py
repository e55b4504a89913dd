from .events import run_events_stream, streaming_tumbling_agg

__all__ = ["run_events_stream", "streaming_tumbling_agg"]
