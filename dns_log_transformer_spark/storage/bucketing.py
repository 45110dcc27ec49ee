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
from pyspark.sql import functions as F


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


def dataset_file_stats(spark: SparkSession, path: str) -> tuple[int, int]:
    """(n_data_files, total_bytes) from the file listing only — no data
    read. Uses the Hadoop FileSystem API so it works on any supported
    scheme (local, HDFS, S3A), exactly what a compaction planner may
    touch at 100 TB: listing, never content."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    it = fs.listFiles(jpath, True)
    n, total = 0, 0
    while it.hasNext():
        f = it.next()
        name = f.getPath().getName()
        if not name.startswith("_") and not name.startswith("."):
            n += 1
            total += f.getLen()
    return n, total


def compact_files(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_cols: list[str] | None = None,
) -> dict:
    """Small-file compaction: rewrite a parquet dataset into
    ~target-size files.

    Streaming ingest produces one file per micro-batch x task; at scale
    a day of 30-second batches is ~100k tiny files per table and scans
    become open/footer-bound. The rewrite plans file count from the
    listing (ceil(bytes / target)), then either round-robin
    repartition(n) (even file sizes) or, with ``sort_cols``,
    repartitionByRange + sortWithinPartitions — re-clustering the data
    so parquet min/max row-group stats prune future scans.

    Writes to ``dst_path`` (never in place: readers of src are not
    disturbed; swapping the location is the caller's metastore/manifest
    operation). Returns before/after file stats.
    """
    n_before, total = dataset_file_stats(spark, src_path)
    n_out = max(1, -(-total // target_file_bytes))
    df = spark.read.parquet(src_path)
    if sort_cols:
        from pyspark.sql import functions as F

        cols = [F.col(c) for c in sort_cols]
        df = df.repartitionByRange(n_out, *cols).sortWithinPartitions(*cols)
    else:
        df = df.repartition(n_out)
    df.write.mode("overwrite").parquet(dst_path)
    n_after, total_after = dataset_file_stats(spark, dst_path)
    return {
        "files_before": n_before,
        "bytes_before": total,
        "planned_files": n_out,
        "files_after": n_after,
        "bytes_after": total_after,
    }


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    id_col: str = "doc_id",
    seed: int = 17,
) -> None:
    """Materialize a training-ready corpus as exactly ``n_shards``
    parquet shard directories (shard=K/part-*.parquet) with rows
    order-randomized by a seeded md5 key — the layout sharded data
    loaders consume.

    Shape at scale: shard id = md5-bucket of (seed, id) mod n_shards
    (uniform, deterministic, no skew); one repartition ON the shard
    column puts each shard in one task, and sortWithinPartitions on the
    shuffle key fixes intra-shard order, so the written bytes are
    reproducible end-to-end. Exactly one file per shard: a task holding
    several shards writes one file into each shard's directory.
    """
    from dns_log_transformer_spark.operators.corpus import hash_bucket

    keyed = df.withColumn("_shuf", hash_bucket(F.col(id_col), seed)).withColumn(
        "shard", (F.col("_shuf") % n_shards).cast("int")
    )
    (
        keyed.repartition(n_shards, F.col("shard"))
        .sortWithinPartitions("_shuf", id_col)
        .drop("_shuf")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )


def zorder_key(cols: list["Column"], bits: int = 16) -> "Column":
    """Z-order (Morton) interleave of ``cols`` as one sortable long.

    Each column is grid-normalized to ``bits`` bits by the caller (see
    :func:`compact_files_zorder`'s min/max width_bucket grid), then the
    bits interleave:
    key = sum over b of (col_i bit b) << (b * n_cols + i). Sorting on
    the interleaved key clusters rows so EVERY indexed column has
    locality within a file — parquet min/max row-group stats then prune
    scans filtered on ANY of the columns, where a lexicographic sort
    only prunes prefixes. Pure bit arithmetic, whole-stage codegen'd.
    """
    n = len(cols)
    if n * bits > 63:
        # the interleaved key must fit a signed long: 4+ columns at the
        # default 16 bits would shift past bit 63 and overflow LongType
        raise ValueError(
            f"zorder_key: {n} cols x {bits} bits = {n * bits} exceeds the "
            f"63 usable bits of a signed long; reduce bits to <= {63 // n}"
        )
    key = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(cols):
            bit = F.shiftright(c.cast("long"), b).bitwiseAND(F.lit(1))
            key = key + (bit.cast("long") * F.lit(1 << (b * n + i)).cast("long"))
    return key


def compact_files_zorder(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    zorder_cols: list[str],
    target_file_bytes: int = 128 * 1024 * 1024,
    bits: int = 16,
) -> dict:
    """Compaction with Z-order clustering (the Delta/Iceberg OPTIMIZE
    ZORDER BY pattern, public algorithm): grid-normalize each cluster
    column, interleave the bits into a Morton key, and range-partition +
    sort on that key. Multi-dimensional locality means min/max pruning
    works for filters on any clustered column, not just the leading sort
    column.

    Normalization is a min/max-anchored ``width_bucket`` grid: one tiny
    (2 values per column) aggregate plus pure per-row arithmetic — no
    global rank window (a no-partition ``percent_rank`` would serialize
    the corpus through one task, the exact seeded_shuffle-class flaw).
    Heavily skewed columns cluster better on sampled quantile boundaries
    (what Delta's range-partition ids use); min/max anchoring keeps this
    deterministic and dependency-free, and pruning still engages.
    """
    n_before, total = dataset_file_stats(spark, src_path)
    n_out = max(1, -(-total // target_file_bytes))
    df = spark.read.parquet(src_path)
    bounds = df.agg(
        *[
            f
            for c in zorder_cols
            for f in (
                F.min(F.col(c).cast("double")).alias(f"_lo_{c}"),
                F.max(F.col(c).cast("double")).alias(f"_hi_{c}"),
            )
        ]
    ).collect()[0]
    ranked = df
    rank_cols = []
    for c in zorder_cols:
        rc = f"_zr_{c}"
        lo, hi = bounds[f"_lo_{c}"], bounds[f"_hi_{c}"]
        span = (hi - lo) or 1.0
        cells = (1 << bits) - 1
        ranked = ranked.withColumn(
            rc,
            F.least(
                F.lit(cells).cast("long"),
                F.floor(
                    (F.col(c).cast("double") - F.lit(lo))
                    / F.lit(span)
                    * F.lit(cells + 1)
                ).cast("long"),
            ),
        )
        rank_cols.append(rc)
    keyed = ranked.withColumn(
        "_zkey", zorder_key([F.col(rc) for rc in rank_cols], bits)
    ).drop(*rank_cols)
    (
        keyed.repartitionByRange(n_out, F.col("_zkey"))
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(dst_path)
    )
    n_after, total_after = dataset_file_stats(spark, dst_path)
    return {
        "files_before": n_before,
        "bytes_before": total,
        "planned_files": n_out,
        "files_after": n_after,
        "bytes_after": total_after,
    }


def write_dedup_index(
    df: DataFrame,
    table: str,
    path: str | None = None,
    num_buckets: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Materialize the corpus's exact-dedup index: (content_md5 of
    normalized text, id), bucketed on the hash. The historical side of
    incremental ingestion — written once, grown by appends, and NEVER
    re-shuffled at delta-dedup time (see :func:`dedup_delta`)."""
    from dns_log_transformer_spark.operators.text import normalized

    idx = df.select(
        F.md5(F.encode(normalized(F.col(text_col)), "UTF-8")).alias("content_md5"),
        F.col(id_col).alias("first_id"),
    )
    write_bucketed(idx, table, ["content_md5"], num_buckets, path)


def dedup_delta(
    spark: SparkSession,
    delta: DataFrame,
    index_table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Incremental exact dedup: drop delta docs whose content already
    exists in the historical index — the daily-ingest pattern at corpus
    scale, where history is orders of magnitude larger than the delta.

    Scale shape: within-delta duplicates collapse FIRST (one
    map-side-combined min_by aggregation keeps the lowest-id full row
    per hash), then ONE left-anti join against the index, whose buckets
    are read IN PLACE — the plan's only Exchanges hash the (small)
    delta: once for the collapse, once into the index's bucket layout.
    100 TB of history is never shuffled per delta.

    Sizing rule: Spark declines the one-sided bucketed scan when
    spark.sql.shuffle.partitions exceeds the bucket count (it refuses to
    cap join parallelism at the buckets) — set shuffle partitions <=
    num_buckets for this join, and pick num_buckets ~ cluster cores at
    deploy time.
    """
    from dns_log_transformer_spark.operators.text import normalized

    cols = delta.columns
    hashed = delta.withColumn(
        "content_md5",
        F.md5(F.encode(normalized(F.col(text_col)), "UTF-8")),
    )
    first = (
        hashed.groupBy("content_md5")
        .agg(F.min_by(F.struct(*cols), F.col(id_col)).alias("_r"))
        .select("content_md5", "_r.*")
    )
    return first.join(
        spark.table(index_table), "content_md5", "left_anti"
    ).drop("content_md5")
