"""Streaming sketch-table maintenance: ``foreachBatch`` incremental
upkeep of FIXED-SIZE mergeable summaries — the streaming-native state
shape (linear sketches merge associatively, so per-batch update cost
and table size are O(sketch), independent of how much data has ever
flowed through).

Two summaries under ``table_path``, both rewritten whole per batch
because the WHOLE TABLE is bounded:

- ``cms/`` — the count-min counter grid over the token stream
  (depth x width rows, integer counts): new batch's partial grid adds
  cell-wise into the stored grid. CMS is linear, so the streamed grid
  is pinned EXACTLY equal (every cell) to the one-shot batch grid of
  the full feed under any batch split.
- ``sources/`` — per-source HyperLogLog sketches of distinct doc ids
  (``hll_sketch_agg`` binaries merged with ``hll_union``): register
  merge is max-based (associative + commutative), so the streamed
  estimate equals the one-shot batch estimate exactly.

Contrast with the other foreachBatch sinks (cdc/vector/near-dup
index): those maintain O(corpus) tables and spend their design on
touched-partition pruning; sketches need none of it — the read-back,
merge, and rewrite all cost O(grid). At 100 TB the grid is still
depth x width rows. The rewrite is read -> localCheckpoint -> full
overwrite (the checkpoint breaks the read-own-write cycle); the same
parquet non-atomicity caveat as cdc_sink applies between the two
tables.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from dns_log_transformer_spark.operators.sketches import (
    CMS_DEPTH,
    CMS_WIDTH,
    cms_counters,
)
from dns_log_transformer_spark.streaming.cdc_sink import _require_local_path


def read_cms(spark: SparkSession, table_path: str) -> DataFrame | None:
    """The accumulated counter grid: (j, h, c). None before any batch."""
    _require_local_path(table_path)
    p = os.path.join(table_path, "cms")
    return spark.read.parquet(p) if os.path.isdir(p) else None


def read_source_sketches(
    spark: SparkSession, table_path: str
) -> DataFrame | None:
    """Per-source distinct-doc estimates: (source, est_docs) from the
    accumulated HLL sketches. None before any batch."""
    _require_local_path(table_path)
    p = os.path.join(table_path, "sources")
    if not os.path.isdir(p):
        return None
    return spark.read.parquet(p).select(
        "source",
        F.hll_sketch_estimate("sk").cast("long").alias("est_docs"),
    )


def sketch_table_sink(
    docs: DataFrame,
    table_path: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> StreamingQuery:
    """Start the incremental sketch upkeep over a streaming DataFrame of
    (id, text, source) document rows. Returns the StreamingQuery."""
    _require_local_path(table_path)
    cms_path = os.path.join(table_path, "cms")
    src_path = os.path.join(table_path, "sources")

    def merge_batch(batch_df: DataFrame, epoch_id: int) -> None:  # noqa: ARG001
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession

        # CMS: batch partial grid + stored grid, summed cell-wise
        grid = cms_counters(batch_df, text_col, depth, width)
        if os.path.isdir(cms_path):
            grid = grid.unionByName(spark.read.parquet(cms_path))
        grid = (
            grid.groupBy("j", "h").agg(F.sum("c").alias("c")).localCheckpoint()
        )
        grid.write.mode("overwrite").parquet(cms_path)

        # HLL: batch per-source sketches unioned into the stored ones
        sk = batch_df.groupBy(source_col).agg(
            F.hll_sketch_agg(id_col).alias("sk")
        )
        if os.path.isdir(src_path):
            sk = sk.unionByName(spark.read.parquet(src_path))
        sk = (
            sk.groupBy(source_col)
            .agg(F.hll_union_agg("sk").alias("sk"))
            .localCheckpoint()
        )
        sk.write.mode("overwrite").parquet(src_path)

    return (
        docs.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
