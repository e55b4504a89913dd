"""PySpark-native analytics engine with the capability surface of the
reference star-schema ETL pipeline (see SURVEY.md), extended with
LLM-data-pipeline operators (dedup, similarity search, text analysis,
multimodal plumbing) designed for 100 TB scale.

Everything is expressed through the Spark DataFrame API so Catalyst +
Tungsten pick the physical strategy; Python UDFs appear only where
built-in functions genuinely cannot express the semantics (and then as
Arrow-batched pandas UDFs).
"""

from .session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
