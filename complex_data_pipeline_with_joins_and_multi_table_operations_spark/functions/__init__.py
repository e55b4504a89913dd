from .scalars import (
    bucket_by_ranges,
    duration_minutes,
    is_weekend,
    labeled_name,
    rate_per_hour,
)

__all__ = [
    "bucket_by_ranges",
    "duration_minutes",
    "is_weekend",
    "labeled_name",
    "rate_per_hour",
]
