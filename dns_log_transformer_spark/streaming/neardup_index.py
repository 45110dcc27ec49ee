"""Streaming near-dup index maintenance: ``foreachBatch`` incremental
MinHash-LSH deduplication of a document stream against everything
ingested so far — the production crawl-dedup shape (dedupe each new
crawl batch against the accumulated corpus WITHOUT rescanning it), the
text twin of the vector-index sink (streaming/vector_index.py).

Three materializations under ``table_path``:

- ``buckets/`` — the LSH band-bucket index, partitioned on ``_bb``
  (hash bucket of the (band, key) pair): one row per (doc, band) with
  the doc's band key. A new batch's candidate lookup reads ONLY the
  ``_bb`` partitions its own band keys hash into.
- ``shingles/`` — the verification store, partitioned on ``_kb`` (hash
  bucket of doc id): each doc's distinct shingle set, read back ONLY
  for the partner ids of surviving candidate pairs (their ``_kb``
  buckets), never the whole corpus.
- ``pairs/`` — append-only output: (doc_a, doc_b, jaccard) with
  jaccard >= threshold, doc_a < doc_b, emitted exactly once — in the
  micro-batch where the LATER of the two docs arrives.

Per micro-batch the cost is O(batch + matching bucket partitions +
candidate partners): shingling/signatures ride the batch scan, the
candidate equi-join touches the batch's ``_bb`` partitions of the
index, and verification re-joins shingles for surviving candidates
only. Nothing is ever O(corpus); the index tables are append-only
(documents are immutable — there is no re-embed/move case here, which
is why this sink needs no directory/tombstone machinery; replayed doc
ids are dropped against the shingle store so pairs never re-emit).

Correctness contract (pinned in test_streaming): streaming the corpus
in any batch split yields pairs/ EXACTLY equal to the one-shot batch
``dedup.minhash_lsh_pairs`` of the full corpus at the same parameters
— same bucketing, same exact-Jaccard verification, same rounding.
Hot buckets are bounded here too (ADVICE r7): each micro-batch drops
any (band, key) bucket whose ACCUMULATED occupancy (index + batch)
exceeds ``bucket_cap`` before the candidate join, so the per-bucket
fan-out never passes cap^2 — the same guard as the batch path's
``dedup.LSH_BUCKET_CAP``. Residual divergence from the one-shot: the
batch path excludes an over-cap bucket's pairs RETROACTIVELY (final
occupancy), while this sink keeps pairs emitted while the bucket was
still under the cap — append-only pairs/ cannot retract. ``read_pairs``
therefore matches the one-shot exactly only for corpora whose buckets
never cross the cap (the fixture's max is 18 vs cap 100; the crossing
case is pinned separately — no NEW pairs once over cap), while
``read_pairs_reconciled`` restores the retroactive semantics at READ
time by re-checking every pair against final bucket occupancy — the
read side of the store closes the divergence without retraction
machinery (pinned on a planted cap-crossing corpus in test_streaming).

Same honesty caveat as cdc_sink: parquet appends are not transactional
across the three tables; a transactional format is the production
wrapper. Sizing: ``n_buckets`` bounds the partition fan-out — size it
so a typical batch touches a small fraction (thousands at 100 TB;
the default 16 is fixture-scaled). The residual drift from parquet
file accumulation inside touched partitions is reset offline by
``streaming.compact.compact_store`` (measured on the winnow twin:
4759 -> 48 files, probe 14.2 -> 1.8 s — PLANS.md r11).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from dns_log_transformer_spark.operators import dedup
from dns_log_transformer_spark.operators.corpus import hash_bucket
from dns_log_transformer_spark.streaming.cdc_sink import (
    _has_partitions,
    N_BUCKETS_DEFAULT,
    _require_local_path,
)


def read_pairs(spark: SparkSession, table_path: str) -> DataFrame | None:
    """All near-dup pairs emitted so far: (doc_a, doc_b, jaccard).
    None if nothing has been written yet."""
    _require_local_path(table_path)
    pairs = os.path.join(table_path, "pairs")
    if not os.path.isdir(pairs):
        return None
    return spark.read.parquet(pairs)


def read_pairs_reconciled(
    spark: SparkSession,
    table_path: str,
    bucket_cap: int = dedup.LSH_BUCKET_CAP,
    id_col: str = "doc_id",
) -> DataFrame | None:
    """``read_pairs`` with the one-shot batch path's RETROACTIVE cap
    semantics restored at read time: a pair whose every shared
    (band, key) bucket ended up over ``bucket_cap`` (final occupancy,
    from the accumulated buckets/ store) is dropped — exactly the pairs
    the batch ``dedup.minhash_lsh_pairs`` would never have generated.
    This closes the append-only divergence on cap-crossing corpora
    (pairs emitted while a bucket was still under the cap) WITHOUT
    retraction machinery: pairs/ stays append-only, the report-side
    read filters.

    Cost: pairs x bands probe against the under-cap index — O(corpus
    band rows) for the occupancy count, O(|pairs| x bands) for the
    probe; a report-time path (the streaming corpus monitor's
    read_scorecard), never per-batch."""
    from dns_log_transformer_spark.operators.caching import persist_tracked

    pairs = read_pairs(spark, table_path)
    if pairs is None:
        return None
    buckets_path = os.path.join(table_path, "buckets")
    if not _has_partitions(buckets_path, "_bb="):
        return pairs
    # dropDuplicates before counting: buckets/ is append-only and a
    # crash between the buckets and shingles writes replays the batch,
    # appending its bucket rows a second time — duplicated rows would
    # permanently double that batch's occupancy counts and silently
    # mark (cap/2, cap] buckets heavy. (doc, band, key) is unique in a
    # consistent store, so the dedup is the idempotent read.
    # persisted: both probe sides (ka, kb) and the heavy-key aggregate
    # consume this frame (PLANS.md rule 4).
    kept = persist_tracked(
        dedup.drop_heavy_buckets(
            spark.read.parquet(buckets_path)
            .drop("_bb")
            .dropDuplicates([id_col, "band", "key"]),
            bucket_cap,
        )
    )
    ka = kept.select(F.col(id_col).alias("doc_a"), "band", "key")
    kb = kept.select(F.col(id_col).alias("doc_b"), "band", "key")
    # survives iff the two docs still share >= 1 under-cap bucket — the
    # batch path's "a pair is found if ANY shared band stays under the
    # cap" rule, evaluated against final occupancy
    return (
        pairs.join(ka, "doc_a")
        .join(kb, ["doc_b", "band", "key"], "left_semi")
        .select("doc_a", "doc_b", "jaccard")
        .distinct()
    )


def neardup_index_sink(
    docs: DataFrame,
    table_path: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    num_hashes: int = dedup.NUM_HASHES,
    num_bands: int = dedup.NUM_BANDS,
    n_buckets: int = N_BUCKETS_DEFAULT,
    bucket_cap: int = dedup.LSH_BUCKET_CAP,
    compact_max_files: int | None = None,
) -> StreamingQuery:
    """Start the incremental near-dup detection: ``docs`` is a streaming
    DataFrame of (id, text) document rows; each micro-batch is checked
    against the accumulated index and folded into it. Returns the
    StreamingQuery.

    ``compact_max_files`` (optional) turns on SELF-compaction: after a
    batch's writes land, sub-tables whose worst partition crossed the
    threshold are rewritten to one file per partition
    (streaming/compact.py maybe_compact — its advertised home: the end
    of the foreachBatch callback, where the writer is quiesced by
    construction because foreachBatch serializes batches). None (the
    default) keeps compaction a purely external ops concern."""
    _require_local_path(table_path)

    def merge_batch(batch_df: DataFrame, epoch_id: int) -> None:  # noqa: ARG001
        neardup_merge_batch(
            batch_df,
            table_path,
            id_col=id_col,
            text_col=text_col,
            n=n,
            threshold=threshold,
            num_hashes=num_hashes,
            num_bands=num_bands,
            n_buckets=n_buckets,
            bucket_cap=bucket_cap,
            compact_max_files=compact_max_files,
        )

    return (
        docs.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def neardup_merge_batch(
    batch_df: DataFrame,
    table_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    num_hashes: int = dedup.NUM_HASHES,
    num_bands: int = dedup.NUM_BANDS,
    n_buckets: int = N_BUCKETS_DEFAULT,
    bucket_cap: int = dedup.LSH_BUCKET_CAP,
    compact_max_files: int | None = None,
) -> None:
    """One micro-batch of the near-dup index, public so the streaming
    corpus monitor (streaming/corpus_monitor.py) and backfills can
    drive batches directly — the mv_sink.merge_epoch convention.
    ``compact_max_files``: see :func:`neardup_index_sink`."""
    _require_local_path(table_path)
    buckets_path = os.path.join(table_path, "buckets")
    shingles_path = os.path.join(table_path, "shingles")
    pairs_path = os.path.join(table_path, "pairs")
    if batch_df.isEmpty():
        return
    spark = batch_df.sparkSession

    # 1. shingle the batch (docs with no shingles can never pair);
    #    within-batch id replays collapse to one row
    sh_b = (
        dedup.with_shingles(batch_df, id_col, text_col, n)
        .filter(F.col("n_shingles") > 0)
        .dropDuplicates([id_col])
        .withColumn(
            "_kb", (hash_bucket(F.col(id_col), seed=0) % n_buckets).cast("int")
        )
        .localCheckpoint()
    )

    # 2. drop ids already indexed (cross-batch replay): anti-join
    #    against ONLY the shingle-store buckets the batch ids hash to
    if _has_partitions(shingles_path, "_kb="):
        seen_kb = [r["_kb"] for r in sh_b.select("_kb").distinct().collect()]
        seen = (
            spark.read.parquet(shingles_path)
            .filter(F.col("_kb").isin(seen_kb))
            .select(id_col)
        )
        sh_b = sh_b.join(F.broadcast(seen), id_col, "left_anti").localCheckpoint()
    if sh_b.isEmpty():
        return

    # 3. band buckets for the batch (the attested signature recipe)
    bk_b = (
        dedup.lsh_band_rows(sh_b, id_col, num_hashes, num_bands)
        .withColumn(
            "_bb",
            (
                hash_bucket(F.concat_ws(":", "band", "key"), seed=1)
                % n_buckets
            ).cast("int"),
        )
        .localCheckpoint()
    )

    # 4. candidates: batch band keys vs (touched index partitions +
    #    the batch itself); each unordered pair once, batch-side driven
    all_bk = bk_b
    if _has_partitions(buckets_path, "_bb="):
        touched_bb = [
            r["_bb"] for r in bk_b.select("_bb").distinct().collect()
        ]
        old_bk = spark.read.parquet(buckets_path).filter(
            F.col("_bb").isin(touched_bb)
        )
        # dropDuplicates on the UNION, not just the store read: a crash
        # between the buckets and shingles appends replays the batch
        # (the replay-drop keys on the SHINGLES store), so the store
        # already holds the replayed batch's bucket rows (prior-crash
        # append) AND bk_b carries them again in-flight — undeduped,
        # the occupancy count below would double every batch-touched
        # bucket during the replay, and (once re-appended) forever for
        # later batches. (doc, band, key) is unique in a consistent
        # history, so the dedup is the idempotent read; touched
        # partitions only, batch-bounded. Pairs are safe either way:
        # the write order below lands pairs/ FIRST, so a replayed
        # batch's pairs already exist — replays make pairs
        # at-least-once, deduplicated by every read path
        # (read_pairs_reconciled .distinct(), the set-based pins).
        all_bk = bk_b.unionByName(old_bk).dropDuplicates(
            [id_col, "band", "key"]
        )
    # per-batch hot-bucket bound (ADVICE r7): a bucket whose ACCUMULATED
    # occupancy (index + this batch) exceeds bucket_cap contributes no
    # candidates this batch — bounding the fan-out of the equi-join at
    # cap^2 per bucket, exactly the skew the batch-side LSH_BUCKET_CAP
    # guards. The count is exact: every row of a (band, key) bucket
    # hashes to the same _bb partition, and the batch touches it. Pairs
    # emitted in earlier batches while the bucket was still under the
    # cap are kept (pairs/ is append-only; retraction is out of scope),
    # which is the one residual divergence from the one-shot batch path
    # documented in the module docstring.
    heavy = dedup.heavy_bucket_keys(all_bk, bucket_cap)
    bk_probe = bk_b.join(F.broadcast(heavy), ["band", "key"], "left_anti")
    all_bk = all_bk.join(F.broadcast(heavy), ["band", "key"], "left_anti")
    cand = (
        bk_probe.select("band", "key", F.col(id_col).alias("_n"))
        .join(
            all_bk.select("band", "key", F.col(id_col).alias("_o")),
            ["band", "key"],
        )
        .filter(F.col("_n") != F.col("_o"))
        .select(
            F.least("_n", "_o").alias("doc_a"),
            F.greatest("_n", "_o").alias("doc_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
        .localCheckpoint()
    )

    # 5. verify exact Jaccard on candidates only; partner shingles
    #    come from the batch plus ONLY the partners' _kb buckets
    partners = (
        cand.select(F.col("doc_a").alias(id_col))
        .unionByName(cand.select(F.col("doc_b").alias(id_col)))
        .distinct()
        .withColumn(
            "_kb", (hash_bucket(F.col(id_col), seed=0) % n_buckets).cast("int")
        )
    )
    all_sh = sh_b.select(id_col, "shingles")
    if _has_partitions(shingles_path, "_kb="):
        partner_kb = [
            r["_kb"] for r in partners.select("_kb").distinct().collect()
        ]
        old_sh = (
            spark.read.parquet(shingles_path)
            .filter(F.col("_kb").isin(partner_kb))
            .join(F.broadcast(partners.select(id_col)), id_col, "left_semi")
            .select(id_col, "shingles")
        )
        all_sh = all_sh.unionByName(old_sh)
    verify = cand.join(
        all_sh.select(
            F.col(id_col).alias("doc_a"), F.col("shingles").alias("sh_a")
        ),
        "doc_a",
    ).join(
        all_sh.select(
            F.col(id_col).alias("doc_b"), F.col("shingles").alias("sh_b")
        ),
        "doc_b",
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    jac = inter.cast("double") / union.cast("double")
    out = (
        verify.withColumn("jaccard", F.round(jac, 4))
        .filter(jac >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )

    # 6. emit + fold the batch into the index (append-only: docs are
    #    immutable and replays were dropped in step 2)
    out.write.mode("append").parquet(pairs_path)
    bk_b.write.mode("append").partitionBy("_bb").parquet(buckets_path)
    sh_b.select(id_col, "shingles", "_kb").write.mode("append").partitionBy(
        "_kb"
    ).parquet(shingles_path)

    # 7. optional self-compaction (VERDICT r12 #4): AFTER every store
    #    write of this batch has landed, so a compaction crash can never
    #    lose batch data — the swap's own crash window leaves a complete
    #    `.old` (compact.py) and the NEXT batch's compaction refuses
    #    loudly rather than guessing. Threshold crossings are rare by
    #    construction (~every max_files batches per touched partition),
    #    so the steady-state per-batch cost is one listdir.
    if compact_max_files is not None:
        from dns_log_transformer_spark.streaming.compact import maybe_compact

        maybe_compact(spark, table_path, max_files=compact_max_files)

