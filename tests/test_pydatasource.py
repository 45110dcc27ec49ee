"""firehose_synth custom Python DataSource (Spark 4 datasource API):
deterministic batch reads, pipeline integration, bounded streaming."""

from __future__ import annotations

import pytest

from dns_log_transformer_spark.sources import pydatasource
from dns_log_transformer_spark.transforms.bind9 import to_bind9_lines, with_client_hex
from dns_log_transformer_spark.transforms.decode import decode_records
from dns_log_transformer_spark.transforms.envelope import explode_records
from dns_log_transformer_spark.transforms.validate import split_valid_invalid


@pytest.fixture(autouse=True)
def _register(spark):
    pydatasource.register(spark)


def test_batch_read_deterministic(spark):
    opts = {"num_requests": "6", "records_per_request": "3", "seed": "11"}
    def load():
        r = spark.read.format("firehose_synth")
        for k, v in opts.items():
            r = r.option(k, v)
        return r.load()

    a, b = load(), load()
    assert a.count() == 6
    assert a.columns == ["requestId", "timestamp", "records"]
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    # every record payload is base64 of a JSON doc
    rows = a.collect()
    assert all(len(r["records"]) == 3 for r in rows)


def test_batch_through_dns_pipeline(spark):
    """Source -> explode -> decode -> validate -> BIND9 lines: corrupt
    records (invalid_every cadence) must route to quarantine, the rest
    must format — the full reference data path fed by the connector."""
    env = (
        spark.read.format("firehose_synth")
        .option("num_requests", 4)
        .option("records_per_request", 6)
        .option("invalid_every", 3)
        .load()
    )
    records = explode_records(env)
    total = records.count()
    assert total == 24
    valid, quarantine = split_valid_invalid(decode_records(records))
    n_valid, n_quar = valid.count(), quarantine.count()
    assert n_valid + n_quar == total
    assert n_quar == 8  # every 3rd of 24
    lines = to_bind9_lines(with_client_hex(valid, seed_col="record_idx"))
    # 1 query line per valid record + 1 reply per answer
    assert lines.count() >= n_valid
    assert lines.filter(lines.line.contains("route53resolver: ")).count() == lines.count()


def test_stream_bounded_and_exact(spark, tmp_path):
    """Streaming side: offsets advance batch_requests per trigger and
    stop at max_requests; the memory sink ends with exactly the bounded
    envelope set, regardless of trigger count."""
    q = (
        spark.readStream.format("firehose_synth")
        .option("batch_requests", 2)
        .option("max_requests", 6)
        .option("records_per_request", 2)
        .load()
        .writeStream.format("memory")
        .queryName("fh_synth_sink")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = spark.sql("SELECT * FROM fh_synth_sink")
    assert out.count() == 6
    ids = sorted(r["requestId"] for r in out.collect())
    assert ids == [f"req-7-{i:06d}" for i in range(6)]


def test_stream_restart_resumes_from_checkpoint(spark, tmp_path):
    """Exactly-once across restarts: a SECOND query over the same
    checkpoint gets a FRESH reader instance whose progress must be
    re-seeded from the offset log (the engine replays the last planned
    batch via partitions(start, end) before asking latestOffset for a
    new one). A reader that ignored the restored offset would plan an
    inverted/empty range and either stall or re-emit envelopes 0..N —
    this asserts the union of both runs is every envelope exactly once.

    This is the durable-resume semantic the reference's fire-and-forget
    ack cannot provide (/root/reference/app/app.py:96-102)."""
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def run(max_requests: int) -> None:
        q = (
            spark.readStream.format("firehose_synth")
            .option("batch_requests", 2)
            .option("max_requests", max_requests)
            .option("records_per_request", 2)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run(4)   # first life: envelopes 0..3 land, offset 4 checkpointed
    run(10)  # restart, fresh reader: must resume at 4, emit 4..9 only

    rows = spark.read.parquet(out).collect()
    ids = sorted(r["requestId"] for r in rows)
    assert ids == [f"req-7-{i:06d}" for i in range(10)], ids
