"""Ingestion sources beyond the engine's file readers."""

from dns_log_transformer_spark.sources.receiver import FirehoseReceiver

__all__ = ["FirehoseReceiver"]
