from .io import (
    Catalog,
    append,
    overwrite_partitions,
    overwrite_table,
    read_csv,
    read_parquet_dir,
    read_table,
)
from .txlog import ConcurrentCommitError, TableLog

__all__ = [
    "Catalog",
    "ConcurrentCommitError",
    "TableLog",
    "append",
    "overwrite_partitions",
    "overwrite_table",
    "read_csv",
    "read_parquet_dir",
    "read_table",
]
