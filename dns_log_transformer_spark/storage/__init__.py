"""Storage-layout helpers: bucketing and partitioned writes."""

from dns_log_transformer_spark.storage.bucketing import (
    write_bucketed,
    write_partitioned,
)

__all__ = ["write_bucketed", "write_partitioned"]
