from . import (
    aggregates,
    cleaning,
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
    "dedup",
    "dimensions",
    "fact",
    "multimodal",
    "quality",
    "similarity",
    "text",
    "windows",
]
