"""The reference's full data path as one Structured Streaming pipeline.

Reference lifecycle (/root/reference/app/app.py:60-263): HTTP envelope ->
jsonschema validate -> per-record base64/JSON decode -> structural validate
-> BIND9 format (1 -> 1+N explode) -> syslog UDP emit, with invalid data
logged and dropped.

Streaming rebuild: landing-dir text stream -> the SAME batch transforms
(transforms/ is pure DataFrame -> DataFrame, so batch tests pin semantics
and the stream reuses them verbatim) -> three sinks (syslog / parquet
archive / quarantine). Checkpointing makes delivery at-least-once where
the reference is at-most-once (ack-before-processing, app/app.py:96-102);
``dedup_within_watermark`` on a record fingerprint makes it
effectively-once.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from dns_log_transformer_spark.streaming.sinks import (
    parquet_archive_sink,
    quarantine_sink,
    syslog_sink,
)
from dns_log_transformer_spark.streaming.source import read_firehose_stream
from dns_log_transformer_spark.transforms import (
    decode_records,
    explode_records,
    parse_envelope,
    split_valid_invalid,
    to_bind9_lines,
    with_client_hex,
)


def build_streaming_lines(
    raw: DataFrame,
    deterministic_ids: bool = False,
    dedup_watermark: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """raw envelope stream (column ``value``) -> (bind9 lines, quarantine).

    Identical composition to the batch path; streaming-legal throughout
    (stateless narrow ops only, except the optional watermarked dedup).

    dedup_watermark (e.g. '10 minutes'): drop records whose content
    fingerprint already appeared within the watermark — upgrades redelivery
    (at-least-once source) to effectively-once output.
    """
    env = parse_envelope(raw)
    records = explode_records(env)
    decoded = decode_records(records)
    valid, quarantine = split_valid_invalid(decoded)
    if dedup_watermark is not None:
        valid = (
            valid.withColumn("fp", F.md5(F.to_json(F.struct("requestId", "record_idx", "query_ts"))))
            .withWatermark("query_ts", dedup_watermark)
            .dropDuplicatesWithinWatermark(["fp"])
            .drop("fp")
        )
    seed = "record_idx" if deterministic_ids else None
    lines = to_bind9_lines(
        with_client_hex(valid, seed_col=seed),
        keep=["requestId", "record_idx"],
    )
    return lines, quarantine


def start_pipeline(
    spark: SparkSession,
    landing_dir: str,
    work_dir: str,
    syslog_host: str | None = None,
    syslog_port: int = 514,
    archive: bool = True,
    dedup_watermark: str | None = None,
    available_now: bool = False,
    deterministic_ids: bool = False,
) -> list[StreamingQuery]:
    """Wire source -> transforms -> sinks and start the queries.

    work_dir gets per-sink subdirs: checkpoints/ archive/ quarantine/.
    Each sink is its own StreamingQuery with its own checkpoint (Spark
    requires independent checkpoints; both re-read the cheap text source
    rather than sharing a hot exchange — source files are the cheap part,
    and this keeps each sink independently restartable). available_now=True drains
    everything currently in the landing dir then stops (tests, backfill).
    """
    raw = read_firehose_stream(spark, landing_dir)
    lines, quarantine = build_streaming_lines(
        raw, deterministic_ids=deterministic_ids, dedup_watermark=dedup_watermark
    )

    def _trigger(writer):
        return writer.trigger(availableNow=True) if available_now else writer

    queries: list[StreamingQuery] = []
    if syslog_host is not None:
        w = syslog_sink(
            lines, syslog_host, syslog_port, os.path.join(work_dir, "checkpoints", "syslog")
        )
        queries.append(_trigger(w).queryName("dns_syslog").start())
    if archive:
        w = parquet_archive_sink(
            lines,
            os.path.join(work_dir, "archive"),
            os.path.join(work_dir, "checkpoints", "archive"),
        )
        queries.append(_trigger(w).queryName("dns_archive").start())
        qw = quarantine_sink(
            quarantine.select(
                "requestId", "record_idx", "data", "reject_reason"
            ),
            os.path.join(work_dir, "quarantine"),
            os.path.join(work_dir, "checkpoints", "quarantine"),
        )
        queries.append(_trigger(qw).queryName("dns_quarantine").start())
    return queries
