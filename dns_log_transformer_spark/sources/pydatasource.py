"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource`` API):
``firehose_synth`` — a deterministic synthetic generator of Kinesis
Firehose HTTP-endpoint envelopes, batch AND streaming.

Reference analog: the HTTP POST ingest surface
(/root/reference/app/app.py:60-102). Spark sources are pull-based, so
the push endpoint becomes a connector the engine reads; this DataSource
is that connector for tests/demos/load-drills, emitting the exact
envelope shape the receiver lands (requestId, timestamp,
records[].data base64-of-JSON) with a seeded, reproducible payload
stream — including a configurable corrupt-record cadence to exercise
the quarantine path (app/app.py:255-263 semantics).

Options
-------
num_requests          batch: total envelopes (default 8)
records_per_request   records per envelope (default 5)
num_partitions        batch parallelism (default 4)
invalid_every         every Nth record is corrupt JSON, 0 = never
                      (default 0)
seed                  payload seed (default 7)
batch_requests        streaming: envelopes per micro-batch (default 2)
max_requests          streaming: stop advancing offsets after this many
                      (default 8)
"""

from __future__ import annotations

import base64
import hashlib
import json

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

SCHEMA_DDL = "requestId string, timestamp long, records array<struct<data: string>>"


def _h(seed: int, *parts: object) -> int:
    raw = ":".join(str(p) for p in (seed, *parts)).encode()
    return int.from_bytes(hashlib.md5(raw).digest()[:6], "big")


def _record_json(seed: int, env_i: int, rec_j: int, invalid_every: int) -> str:
    """One Route53 record (field list: app/app.py:177-192), or corrupt
    JSON on the invalid cadence."""
    if invalid_every and (env_i * 10_007 + rec_j) % invalid_every == invalid_every - 1:
        return '{"not": "a dns record"'
    h = _h(seed, env_i, rec_j)
    n_answers = h % 3  # 0..2 answers; 0 exercises the qtype-default path
    answers = [
        {"Rdata": f"93.184.{(h >> 8) % 256}.{(h + a) % 256}", "Type": "A"}
        for a in range(n_answers)
    ]
    return json.dumps(
        {
            "version": "1.100000",
            "account_id": "123456789012",
            "region": "us-east-1",
            "vpc_id": f"vpc-{h % 100000:05d}",
            "query_timestamp": f"2021-02-04T17:{(h % 60):02d}:{((h >> 6) % 60):02d}Z",
            "query_name": f"host{h % 1000}.example.com.",
            "query_type": "A",
            "query_class": "IN",
            "rcode": "NOERROR",
            "answers": answers,
            "srcaddr": f"10.0.{(h >> 4) % 256}.{h % 256}",
            "srcport": str(1024 + h % 60000),
            "transport": "UDP",
            "srcids": {"instance": f"i-{h:012x}"},
        }
    )


def _envelope(seed: int, env_i: int, records_per_request: int, invalid_every: int):
    recs = [
        (
            base64.b64encode(
                _record_json(seed, env_i, j, invalid_every).encode()
            ).decode(),
        )
        for j in range(records_per_request)
    ]
    return (f"req-{seed}-{env_i:06d}", 1_612_461_115_000 + env_i, recs)


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class _Opts:
    def __init__(self, options: dict):
        self.seed = int(options.get("seed", 7))
        self.records_per_request = int(options.get("records_per_request", 5))
        self.invalid_every = int(options.get("invalid_every", 0))
        self.num_requests = int(options.get("num_requests", 8))
        self.num_partitions = int(options.get("num_partitions", 4))
        self.batch_requests = int(options.get("batch_requests", 2))
        self.max_requests = int(options.get("max_requests", 8))


class FirehoseSynthReader(DataSourceReader):
    def __init__(self, options: dict):
        self.o = _Opts(options)

    def partitions(self):
        n, p = self.o.num_requests, max(1, self.o.num_partitions)
        step = -(-n // p)
        return [
            _RangePartition(i, min(i + step, n)) for i in range(0, n, step)
        ]

    def read(self, partition: _RangePartition):
        o = self.o
        for i in range(partition.start, partition.end):
            yield _envelope(o.seed, i, o.records_per_request, o.invalid_every)


class FirehoseSynthStreamReader(DataSourceStreamReader):
    """Offset = next envelope index; each trigger advances by
    ``batch_requests`` until ``max_requests`` (bounded so tests and
    drills terminate; a live deployment would advance unboundedly).

    Restart semantics (the upgrade over the reference's at-most-once ack,
    /root/reference/app/app.py:96-102): a fresh reader instance must
    resume from the checkpointed offset, not ``initialOffset``. The
    engine replays the last offset-log batch through ``partitions(start,
    end)`` before asking ``latestOffset`` for a new one (the same
    contract pyspark's ``_SimpleStreamReaderWrapper.partitions``
    documents), so both ``partitions`` and ``commit`` fold the offsets
    they see into ``_cur`` and ``latestOffset`` only ever advances from
    the restored position — exactly-once across restarts, pinned by
    ``test_stream_restart_resumes_from_checkpoint``.
    """

    def __init__(self, options: dict):
        self.o = _Opts(options)
        self._cur = 0

    def _advance_to(self, index: int) -> None:
        self._cur = max(self._cur, index)

    def initialOffset(self):
        return {"index": 0}

    def latestOffset(self):
        # progress = the furthest offset this instance has seen, seeded
        # from checkpoint replay via partitions()/commit() on restart
        nxt = min(self._cur + self.o.batch_requests, self.o.max_requests)
        self._cur = nxt
        return {"index": nxt}

    def partitions(self, start: dict, end: dict):
        self._advance_to(end["index"])
        return [_RangePartition(start["index"], end["index"])]

    def read(self, partition: _RangePartition):
        o = self.o
        for i in range(partition.start, partition.end):
            yield _envelope(o.seed, i, o.records_per_request, o.invalid_every)

    def commit(self, end: dict) -> None:
        self._advance_to(end["index"])


class FirehoseSynthDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "firehose_synth"

    def schema(self) -> str:
        return SCHEMA_DDL

    def reader(self, schema):
        return FirehoseSynthReader(self.options)

    def streamReader(self, schema):
        return FirehoseSynthStreamReader(self.options)


def register(spark) -> None:
    """Idempotent registration of the connector on a session."""
    spark.dataSource.register(FirehoseSynthDataSource)
