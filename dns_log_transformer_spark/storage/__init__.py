"""Storage-layout helpers: bucketing, partitioned writes, compaction."""

from dns_log_transformer_spark.storage.bucketing import (
    compact_files,
    dataset_file_stats,
    write_bucketed,
    write_partitioned,
)

__all__ = [
    "compact_files",
    "dataset_file_stats",
    "write_bucketed",
    "write_partitioned",
]
