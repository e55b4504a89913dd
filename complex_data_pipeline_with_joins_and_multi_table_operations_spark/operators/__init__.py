from . import (
    aggregates,
    cleaning,
    curation,
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
    "curation",
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
