"""Epoch-fenced incremental materialized-view maintenance: a
``foreachBatch`` sink that keeps a keyed aggregate table (the
materialized view SUM/COUNT a dashboard reads) current against a
stream of fact rows — with EXACTLY-ONCE aggregate semantics under
epoch replays.

Why fencing matters: ``foreachBatch`` is at-least-once — after a crash
the last epoch REPLAYS. An additive merge (read table, add batch,
rewrite — the CMS sink's shape) double-counts the replayed rows; the
Bloom sink survives only because bit-OR is idempotent. Counting
aggregates are NOT idempotent, so this sink makes the WRITE idempotent
instead of the merge: each epoch's partial aggregate lands in its own
``_epoch=N`` partition via dynamic partition overwrite — a replay of
epoch N overwrites ``_epoch=N`` with identical content, never touching
any other epoch. The read side merges partials across epochs (SUM of
SUMs, SUM of COUNTs — the map-side-combine algebra at the storage
layer).

Scale design:
- per-batch write cost is O(batch's distinct keys) — only the new
  epoch partition is written; the table is never read back during
  maintenance (contrast cdc_sink, which must read touched buckets);
- the read-side merge grows with the number of epochs, so
  ``compact_mv`` periodically folds all epoch partials into a single
  base partition (``_epoch=-1``) — after which reads cost O(keys).
  Compaction is the same read -> aggregate -> localCheckpoint ->
  overwrite cycle the sketch sinks use, plus a FENCE: it records the
  highest epoch it folded (``_FENCE`` json beside the partitions), and
  ``merge_epoch`` drops any epoch at or below the fence as a no-op —
  otherwise a replayed epoch whose partial was already folded into the
  base would double-count (partition overwrite only protects replays
  of epochs that still exist as partitions). The fence lands after
  the fold; a crash between the two leaves folded-but-unfenced epochs
  — the familiar parquet non-atomicity window, closed by the
  transactional table format a production deployment wraps this in
  (same caveat as cdc_sink).

Aggregates kept: per-key row count and exact integer sum (cents
discipline) — extend by adding more algebraic aggregates (min/max/
sumsq) to the same partial-merge pattern.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from dns_log_transformer_spark.streaming.cdc_sink import (
    _has_partitions,
    _require_local_path,
)


def _fence_path(table_path: str) -> str:
    return os.path.join(table_path, "_FENCE")


def _read_fence(table_path: str) -> int:
    """Highest epoch ever folded by compaction (-1 before any fold)."""
    p = _fence_path(table_path)
    if not os.path.exists(p):
        return -1
    import json

    with open(p) as f:
        return int(json.load(f)["folded_thru"])


def merge_epoch(
    batch_df: DataFrame,
    epoch_id: int,
    table_path: str,
    key_col: str,
    value_col: str,
) -> None:
    """Land one epoch's partial aggregate idempotently: the partial for
    ``_epoch=N`` is a pure function of the batch, and dynamic partition
    overwrite replaces exactly that partition — replaying the epoch
    rewrites identical content — and epochs at or below the compaction
    fence are dropped (their rows already live in the folded base).
    Public so tests (and backfills) can drive epochs directly."""
    _require_local_path(table_path)
    if int(epoch_id) <= _read_fence(table_path):
        return  # already folded into the base; a replay must no-op
    if batch_df.isEmpty():
        return
    partial = (
        batch_df.groupBy(F.col(key_col).alias("key"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum(F.col(value_col).cast("decimal(38,0)"))
            .cast("long")
            .alias("sum_val"),
        )
        .withColumn("_epoch", F.lit(int(epoch_id)))
    )
    (
        partial.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")  # writer-scoped
        .partitionBy("_epoch")
        .parquet(table_path)
    )


def read_mv(spark: SparkSession, table_path: str) -> DataFrame | None:
    """The merged view: (key, n_rows, sum_val) across all epoch
    partials (SUM of SUMs — the storage-layer map-side combine). None
    before any epoch has committed."""
    _require_local_path(table_path)
    if not _has_partitions(table_path, "_epoch="):
        return None
    return (
        spark.read.parquet(table_path)
        .groupBy("key")
        .agg(
            F.sum("n_rows").cast("long").alias("n_rows"),
            F.sum("sum_val").cast("long").alias("sum_val"),
        )
    )


def compact_mv(spark: SparkSession, table_path: str) -> None:
    """Fold every epoch partial into the single ``_epoch=-1`` base
    partition so read cost stops growing with epoch count, then advance
    the fence to the highest folded epoch. Whole-table overwrite
    (folded epochs must disappear in the same write, else a re-merge
    would double-count them); the fence file lands after the fold —
    see the module docstring for the non-atomicity window. The
    underscore-prefixed fence file is invisible to Spark's parquet
    reader (metadata-file convention), so reads need no filter."""
    import json

    _require_local_path(table_path)
    merged = read_mv(spark, table_path)
    if merged is None:
        return
    epochs = [
        int(e.split("=", 1)[1])
        for e in os.listdir(table_path)
        if e.startswith("_epoch=")
    ]
    # never move the fence backwards (an earlier fold's fence survives
    # a later compaction that found only the base partition)
    folded_thru = max(max(epochs), _read_fence(table_path))
    folded = merged.withColumn("_epoch", F.lit(-1)).localCheckpoint()
    folded.write.mode("overwrite").partitionBy("_epoch").parquet(table_path)
    with open(_fence_path(table_path), "w") as f:
        json.dump({"folded_thru": folded_thru}, f)


def mv_sink(
    facts: DataFrame,
    table_path: str,
    checkpoint_dir: str,
    key_col: str,
    value_col: str,
) -> StreamingQuery:
    """Start incremental view maintenance over a streaming DataFrame of
    fact rows. Returns the StreamingQuery."""
    _require_local_path(table_path)

    def _merge(batch_df: DataFrame, epoch_id: int) -> None:
        merge_epoch(batch_df, epoch_id, table_path, key_col, value_col)

    return (
        facts.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
