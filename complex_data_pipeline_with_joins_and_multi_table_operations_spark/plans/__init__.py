from .registry import ORACLES, QUERIES, run_query

__all__ = ["ORACLES", "QUERIES", "run_query"]
