from . import (
    aggregates,
    cleaning,
    custom,
    dedup,
    dimensions,
    fact,
    multimodal,
    quality,
    similarity,
    text,
    windows,
)

__all__ = [
    "aggregates",
    "cleaning",
    "custom",
    "dedup",
    "dimensions",
    "fact",
    "multimodal",
    "quality",
    "similarity",
    "text",
    "windows",
]
