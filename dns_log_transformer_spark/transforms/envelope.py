"""Firehose envelope parsing — reference app/app.py:60-105 (P1, P2).

The reference rejects a whole HTTP request when the envelope fails
jsonschema validation (app/app.py:79,88-93). Here an envelope is one row;
rejection is a row-level predicate, so a bad envelope never throws — it is
filtered (and can be routed to a dead-letter sink by the caller).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dns_log_transformer_spark.schemas import (
    FIREHOSE_ENVELOPE_SCHEMA,
    MAX_RECORD_DATA_CHARS,
    MAX_RECORDS_PER_REQUEST,
    MIN_RECORDS_PER_REQUEST,
)


def envelope_validity_predicate() -> Column:
    """The jsonschema constraints (app/app.py:35-58) as one boolean Column.

    - requestId required (string);
    - records required, 1 <= size <= 10000;
    - every record has `data` with length <= 1,365,336.
    """
    records = F.col("records")
    return (
        F.col("requestId").isNotNull()
        & records.isNotNull()
        & (F.size(records) >= MIN_RECORDS_PER_REQUEST)
        & (F.size(records) <= MAX_RECORDS_PER_REQUEST)
        & F.forall(
            records,
            lambda r: r["data"].isNotNull()
            & (F.length(r["data"]) <= MAX_RECORD_DATA_CHARS),
        )
    )


def parse_envelope(raw: DataFrame, json_col: str = "value") -> DataFrame:
    """Parse raw JSON strings into typed envelopes.

    ``raw`` has one row per Firehose HTTP request body (the streaming
    analog of `request.get_json()`, app/app.py:78). Output columns:
    requestId, timestamp, records, envelope_valid.
    """
    parsed = raw.select(
        F.from_json(F.col(json_col), FIREHOSE_ENVELOPE_SCHEMA).alias("env")
    )
    return parsed.select("env.*").withColumn(
        "envelope_valid", envelope_validity_predicate()
    )


def explode_records(envelopes: DataFrame) -> DataFrame:
    """Fan an accepted envelope out to one row per record (app/app.py:220).

    Keeps (requestId, record_idx) so downstream rows stay traceable to
    their delivery batch; posexplode preserves in-batch order as data.
    """
    valid = (
        envelopes.filter(F.col("envelope_valid"))
        if "envelope_valid" in envelopes.columns
        else envelopes
    )
    return valid.select(
        "requestId",
        F.posexplode("records").alias("record_idx", "record"),
    ).select("requestId", "record_idx", F.col("record.data").alias("data"))
