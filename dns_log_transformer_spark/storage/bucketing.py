"""Bucketed & partitioned table layout.

At 100 TB the dominant cost of fact-fact joins (lineitem-orders) and
repeated keyed aggregations is the shuffle. Bucketing pre-shuffles the
data once at write time: both tables hash-clustered (and sorted) on the
join key into the same bucket count join with NO Exchange and NO Sort in
the plan — verified by tests/test_storage.py, which asserts the physical
plan is exchange-free.

Partitioned writes (`partitionBy`) are the other layout lever: partition
pruning turns predicates on the partition column into directory pruning
(zero I/O for excluded partitions).

The reference has no storage layer at all (syslog lines out,
/root/reference/app/app.py:253); this module exists for the engine's
analytics surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    path: str | None = None,
    sort: bool = True,
) -> None:
    """Persist ``df`` hash-clustered on ``bucket_cols``.

    Both sides of a future equi-join must use the same num_buckets (or an
    integer multiple) for the exchange-free plan. sort=True also orders
    within buckets, removing the Sort below a SortMergeJoin.
    """
    writer = df.write.mode("overwrite").format("parquet")
    if path is not None:
        writer = writer.option("path", path)
    writer = writer.bucketBy(num_buckets, *bucket_cols)
    if sort:
        writer = writer.sortBy(*bucket_cols)
    writer.saveAsTable(table)


def write_partitioned(
    df: DataFrame,
    table: str,
    partition_cols: list[str],
    path: str | None = None,
) -> None:
    """Persist ``df`` directory-partitioned on ``partition_cols`` so
    Catalyst prunes partitions for predicates on those columns. Choose
    low-cardinality columns (date, region) — one directory per value."""
    writer = df.write.mode("overwrite").format("parquet")
    if path is not None:
        writer = writer.option("path", path)
    writer.partitionBy(*partition_cols).saveAsTable(table)


def drop_table(spark: SparkSession, table: str) -> None:
    spark.sql(f"DROP TABLE IF EXISTS {table}")
