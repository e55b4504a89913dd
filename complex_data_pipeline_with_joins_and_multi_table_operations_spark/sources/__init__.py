from .io import (
    Catalog,
    append,
    overwrite_partitions,
    overwrite_table,
    read_csv,
    read_parquet_dir,
    read_table,
)

__all__ = [
    "Catalog",
    "append",
    "overwrite_partitions",
    "overwrite_table",
    "read_csv",
    "read_parquet_dir",
    "read_table",
]
