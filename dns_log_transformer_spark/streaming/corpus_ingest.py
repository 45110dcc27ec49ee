"""Streaming corpus ingest: the LLM-pipeline operators composed as a
Structured Streaming funnel.

A training-data pipeline's ingest half runs continuously: new documents
land (crawl deltas, partner feeds), and each micro-batch must be
quality-scored, language-tagged, content-deduplicated against the recent
stream, and landed as training-ready parquet. Every transform here is
the SAME code the batch queries attest (operators/text.py normalization
and scoring are narrow per-row expressions, so they run unchanged under
the streaming engine — the batch/stream parity the DataFrame API
promises), and the dedup is watermark-bounded state, not an unbounded
seen-set.

Reference analog: the reference's whole pipeline is a streaming ingest
loop (HTTP POST -> transform -> emit, /root/reference/app/app.py); this
module is that shape for the corpus domain, with restart-safe
checkpointing instead of the reference's in-memory-only processing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Schema of a landed corpus delta (jsonl files in a landing dir).
CORPUS_DELTA_DDL = "doc_id long, text string, source string, ts timestamp"


def read_corpus_stream(
    spark: SparkSession, landing_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source stream over a jsonl landing directory (the same
    landing-dir pattern the DNS receiver uses — sources/receiver.py)."""
    return (
        spark.readStream.schema(CORPUS_DELTA_DDL)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(landing_dir)
    )


def build_corpus_ingest(
    docs: DataFrame,
    min_quality: float = 0.3,
    watermark: str = "10 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Quality-score, language-tag, and content-dedup a document stream.

    - scoring/lang-ID are the batch-attested narrow expressions
      (operators/text.py) running unchanged under streaming;
    - dedup key = md5 of whitespace-normalized text, so trivial
      reformatting still dedups; state is watermark-bounded
      (`dropDuplicatesWithinWatermark`), the streaming equivalent of
      the batch exact-dedup operator;
    - the quality gate runs BEFORE dedup so rejected docs never enter
      the dedup state store.

    Works identically on a batch DataFrame except for the watermark
    (ignored in batch mode) — pinned by the batch-twin test.
    """
    from dns_log_transformer_spark.operators.text import (
        normalized,
        with_lang_id,
        with_quality_score,
    )

    scored = with_lang_id(with_quality_score(docs))
    gated = scored.filter(F.col("quality_score") >= min_quality).withColumn(
        "content_md5", F.md5(normalized(F.col("text")))
    )
    return gated.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["content_md5"]
    )


def start_corpus_ingest(
    spark: SparkSession,
    landing_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    min_quality: float = 0.3,
    watermark: str = "10 minutes",
):
    """Wire the funnel to a parquet sink with a checkpoint: restart-safe,
    exactly-once file output."""
    funnel = build_corpus_ingest(
        read_corpus_stream(spark, landing_dir), min_quality, watermark
    )
    return (
        funnel.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
