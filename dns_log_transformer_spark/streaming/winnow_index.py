"""Streaming winnow-anchor span-dedup index: ``foreachBatch``
incremental detection of variable-length repeated spans (boilerplate)
in a document stream against everything ingested so far — the
round-6 winnowing themes composed into the crawl-time shape of
streaming/neardup_index.py, with one structural difference: span
output is NOT monotone. A doc's spans GROW retroactively when a later
doc shares its anchors, so ``spans/`` is a maintained table (touched
partitions rewritten per batch, the vector_index recipe), not an
append-only log like the near-dup ``pairs/``.

Three materializations under ``table_path``:

- ``anchors/`` — every doc's winnowing anchors (doc, pos, fp),
  partitioned on ``_kb`` (hash bucket of doc id). Append-only;
  replayed doc ids are dropped against the touched ``_kb`` buckets.
  Appended LAST in the batch sequence — it doubles as the replay
  guard, so a crash anywhere earlier makes the whole batch re-run.
  The full write order is load-bearing: spans -> fpagg -> anchors.
  A replay after a crash between spans and fpagg still sees the
  pre-merge aggregate and re-derives the same prior-sole holders; a
  replay after fpagg can no longer identify them, but their spans
  already landed in the crashed run and the keep-side anti-join
  preserves them (crash-window pins in test_streaming).
- ``fpagg/`` — one row per distinct anchor fp with the (min, max) doc
  id ever seen holding it, partitioned on ``_fb`` (hash bucket of
  fp). ``mn != mx`` IS the shared-anchor predicate — exactly the
  one-shot operator's min/max aggregation (corpus.winnow_span_dedup
  step 2), maintained incrementally: min/max are mergeable AND
  idempotent, so replays re-merge harmlessly. Touched ``_fb``
  partitions only.
- ``spans/`` — the current span table (doc, span_start, span_len,
  n_anchors), partitioned on ``_kb``. Per batch, only AFFECTED docs
  are recomputed: batch docs holding a now-shared fp, plus the prior
  SOLE holder of each fp the batch just made shared (fpagg had
  mn == mx for it, so that one doc id is already in hand — no
  posting list needed). Affected docs' full anchor sets come from
  the batch plus their ``_kb`` anchor buckets; their spans are
  re-derived with the same ``merge_anchor_spans`` gaps-and-islands
  code path the batch operator uses, and the touched ``_kb`` span
  partitions are rewritten keep+new.

Per micro-batch the cost is O(batch anchors + touched buckets +
affected docs' anchors); nothing is ever O(corpus). Driver state is
bounded: touched-bucket id lists (<= n_buckets ints) and the
broadcast affected-doc id list (<= batch docs + batch-distinct fps).

Correctness contract (pinned in test_streaming): after EVERY batch,
``read_spans`` equals the one-shot ``corpus.winnow_span_dedup`` of all
docs ingested so far at the same (k, w, min_anchors) — the
mid-stream equality is the point: retroactive span growth on OLD docs
must land in the same batch that made their anchors shared.

Same honesty caveat as cdc_sink: parquet partition overwrites are not
transactional; a transactional table format is the production wrapper.
Sizing: ``n_buckets`` bounds the partition fan-out of all three tables
— size it so a typical batch touches a small fraction (thousands at
100 TB; the default 16 is fixture-scaled, same note as the near-dup
sink). The only per-batch cost that grows with store age is parquet
FILE accumulation inside touched partitions (measured: an identical
500-doc probe drifted 9.4 -> 14.2 s over ~11 batches to a 50k-doc
index, and a 4x-bucket control made it slower still — files, not
rows); ``streaming.compact.compact_store`` resets it offline
(4759 -> 48 files, probe back to ~1.8 s, spans row-identical —
PLANS.md r11).
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from dns_log_transformer_spark.operators.corpus import (
    hash_bucket,
    merge_anchor_spans,
)
from dns_log_transformer_spark.streaming.cdc_sink import (
    N_BUCKETS_DEFAULT,
    _has_partitions,
    _require_local_path,
)


def read_spans(spark: SparkSession, table_path: str) -> DataFrame | None:
    """The current span table: (doc_id, span_start, span_len,
    n_anchors) for every doc with a shared span. None before any
    batch has produced spans."""
    _require_local_path(table_path)
    spans = os.path.join(table_path, "spans")
    if not _has_partitions(spans, "_kb="):
        return None
    return spark.read.parquet(spans).drop("_kb")


def winnow_index_sink(
    docs: DataFrame,
    table_path: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    w: int = 4,
    min_anchors: int = 2,
    n_buckets: int = N_BUCKETS_DEFAULT,
    compact_max_files: int | None = None,
) -> StreamingQuery:
    """Start incremental span-dedup maintenance: ``docs`` is a
    streaming DataFrame of (id, text) rows; each micro-batch's anchors
    are folded into the index and every doc whose shared-anchor set
    changed has its spans recomputed. Returns the StreamingQuery.

    ``compact_max_files`` (optional) turns on SELF-compaction at the
    end of each batch — see neardup_index.neardup_index_sink; same
    trigger, same quiesced-by-construction safety."""
    _require_local_path(table_path)

    def merge_batch(batch_df: DataFrame, epoch_id: int) -> None:  # noqa: ARG001
        merge_docs_batch(
            batch_df,
            table_path,
            id_col=id_col,
            text_col=text_col,
            k=k,
            w=w,
            min_anchors=min_anchors,
            n_buckets=n_buckets,
            compact_max_files=compact_max_files,
        )

    return (
        docs.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def merge_docs_batch(
    batch_df: DataFrame,
    table_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    w: int = 4,
    min_anchors: int = 2,
    n_buckets: int = N_BUCKETS_DEFAULT,
    _fail_after: str | None = None,
    compact_max_files: int | None = None,
) -> None:
    """One micro-batch of the winnow index, public so tests and
    backfills can drive batches directly (the mv_sink.merge_epoch
    convention). ``_fail_after`` ('spans' | 'fpagg') injects a crash
    immediately after that write for the crash-window pins in
    test_streaming — the write order it probes is load-bearing."""
    _require_local_path(table_path)
    anchors_path = os.path.join(table_path, "anchors")
    fpagg_path = os.path.join(table_path, "fpagg")
    spans_path = os.path.join(table_path, "spans")

    def kb(col: Column) -> Column:
        return (hash_bucket(col, seed=0) % n_buckets).cast("int")

    def fb(col: Column) -> Column:
        return (hash_bucket(col, seed=2) % n_buckets).cast("int")

    if batch_df.isEmpty():
        return
    spark = batch_df.sparkSession
    from dns_log_transformer_spark.operators.text import (
        winnow_anchors_arrow,
    )

    # 1. anchors for the batch (within-batch id replays collapse),
    #    then drop ids already indexed (cross-batch replay) against
    #    ONLY the anchor-store buckets the batch ids hash to
    batch_docs = batch_df.dropDuplicates([id_col])
    anch_b = (
        winnow_anchors_arrow(
            batch_docs, id_col=id_col, text_col=text_col, k=k, w=w
        )
        .withColumn("_kb", kb(F.col(id_col)))
        .localCheckpoint()
    )
    if _has_partitions(anchors_path, "_kb="):
        seen_kb = [r["_kb"] for r in anch_b.select("_kb").distinct().collect()]
        seen = (
            spark.read.parquet(anchors_path)
            .filter(F.col("_kb").isin(seen_kb))
            .select(id_col)
            .distinct()
        )
        anch_b = anch_b.join(
            F.broadcast(seen), id_col, "left_anti"
        ).localCheckpoint()
    if anch_b.isEmpty():
        return

    # 2. merge the per-fp (min, max) doc aggregate — idempotent, so
    #    a replayed batch re-merges to the same values. Touched _fb
    #    partitions are read fully (their non-batch rows must
    #    survive the overwrite) and rewritten keep+merged.
    bfp = (
        anch_b.groupBy("fp")
        .agg(F.min(id_col).alias("mn"), F.max(id_col).alias("mx"))
        .withColumn("_fb", fb(F.col("fp")))
    )
    touched_fb = [r["_fb"] for r in bfp.select("_fb").distinct().collect()]
    old_t = None
    if _has_partitions(fpagg_path, "_fb="):
        old_t = (
            spark.read.parquet(fpagg_path)
            .filter(F.col("_fb").isin(touched_fb))
            .localCheckpoint()  # pinned BEFORE its files are overwritten
        )
    all_fp = bfp if old_t is None else old_t.unionByName(bfp)
    merged_part = (
        all_fp.groupBy("_fb", "fp")
        .agg(F.min("mn").alias("mn"), F.max("mx").alias("mx"))
        .localCheckpoint()
    )

    # 3. affected docs: batch docs holding a NOW-shared fp, plus
    #    the prior sole holder (old mn == mx) of each fp the batch
    #    just made shared
    shared_now = merged_part.filter(F.col("mn") != F.col("mx")).select("fp")
    aff = (
        anch_b.join(shared_now, "fp", "left_semi")
        .select(id_col)
        .distinct()
    )
    if old_t is not None:
        prior_sole = (
            old_t.filter(F.col("mn") == F.col("mx"))
            .join(shared_now, "fp", "left_semi")
            .select(F.col("mn").alias(id_col))
            .distinct()
        )
        aff = aff.unionByName(prior_sole).distinct()
    aff = aff.localCheckpoint()

    if not aff.isEmpty():
        # 4. recompute spans for the affected docs only: their full
        #    anchor sets (batch + their _kb store buckets) filtered
        #    to fps shared under the MERGED aggregate — derived from
        #    merged_part overlaid on the PRE-overwrite store (for
        #    fps in untouched partitions), never the updated store:
        #    the spans rewrite must land BEFORE the fpagg overwrite
        #    so a crash between them replays cleanly (see the write
        #    ordering note below); re-derived with the exact
        #    batch-operator islands code
        aff_kb = [
            r["_kb"]
            for r in aff.select(kb(F.col(id_col)).alias("_kb"))
            .distinct()
            .collect()
        ]
        aff_anch = anch_b.join(F.broadcast(aff), id_col, "left_semi").select(
            id_col, "pos", "fp"
        )
        if _has_partitions(anchors_path, "_kb="):
            old_anch = (
                spark.read.parquet(anchors_path)
                .filter(F.col("_kb").isin(aff_kb))
                .join(F.broadcast(aff), id_col, "left_semi")
                .select(id_col, "pos", "fp")
            )
            aff_anch = aff_anch.unionByName(old_anch)
        need_fb = [
            r["_fb"]
            for r in aff_anch.select(fb(F.col("fp")).alias("_fb"))
            .distinct()
            .collect()
        ]
        shared_fps = merged_part.filter(
            F.col("mn") != F.col("mx")
        ).select("fp")
        if _has_partitions(fpagg_path, "_fb="):
            # fps of affected docs living in partitions this batch
            # did NOT touch are unchanged — their status comes from
            # the store as it stands (still pre-overwrite)
            untouched_shared = (
                spark.read.parquet(fpagg_path)
                .filter(
                    F.col("_fb").isin(need_fb)
                    & ~F.col("_fb").isin(touched_fb)
                )
                .filter(F.col("mn") != F.col("mx"))
                .select("fp")
            )
            shared_fps = shared_fps.unionByName(untouched_shared)
        sa = aff_anch.join(shared_fps, "fp", "left_semi")
        new_spans = merge_anchor_spans(
            sa, id_col=id_col, k=k, min_anchors=min_anchors
        ).withColumn("_kb", kb(F.col(id_col)))
        if _has_partitions(spans_path, "_kb="):
            keep = (
                spark.read.parquet(spans_path)
                .filter(F.col("_kb").isin(aff_kb))
                .join(F.broadcast(aff), id_col, "left_anti")
            )
            new_spans = keep.unionByName(new_spans)
        new_spans = new_spans.localCheckpoint()
        new_spans.write.mode("overwrite").option(
            "partitionOverwriteMode", "dynamic"
        ).partitionBy("_kb").parquet(spans_path)
    if _fail_after == "spans":
        raise RuntimeError("injected crash after the spans write")

    # 5. WRITE ORDER IS LOAD-BEARING: spans (above) -> fpagg ->
    #    anchors. The anchors append is the replay guard, so a
    #    crash anywhere earlier re-runs the whole batch; the replay
    #    is only correct because (a) spans landed before fpagg —
    #    if it crashed in between, the replay still sees the
    #    PRE-merge fpagg and recomputes the same prior-sole
    #    holders; and (b) if it crashed after fpagg, the replay's
    #    prior-sole set is empty but those docs' spans were already
    #    written by the crashed run (and the keep-side anti-join
    #    preserves them).
    merged_part.write.mode("overwrite").option(
        "partitionOverwriteMode", "dynamic"
    ).partitionBy("_fb").parquet(fpagg_path)
    if _fail_after == "fpagg":
        raise RuntimeError("injected crash after the fpagg write")
    anch_b.write.mode("append").partitionBy("_kb").parquet(anchors_path)

    # 6. optional self-compaction (VERDICT r12 #4): strictly AFTER the
    #    anchors append — the replay guard — so a compaction crash
    #    replays nothing and loses nothing; the swap's crash window
    #    leaves a complete `.old` and the next run refuses loudly
    #    (compact.py). A cheap listdir when no threshold is crossed.
    if compact_max_files is not None:
        from dns_log_transformer_spark.streaming.compact import maybe_compact

        maybe_compact(
            batch_df.sparkSession, table_path, max_files=compact_max_files
        )

