"""HTTP receiver -> landing dir -> streaming pipeline, end to end —
the full reference data path (POST /endpoint through syslog-format
lines), with the receiver's gates mirroring app/app.py:60-102."""

from __future__ import annotations

import json
import os
import urllib.error
import urllib.request

from dns_log_transformer_spark.sources import FirehoseReceiver
from dns_log_transformer_spark.streaming import start_pipeline
from tests.test_transforms import envelope_json, expected_bind9_lines, make_record


def _post(url, data: bytes, content_type="application/json"):
    req = urllib.request.Request(url, data=data, headers={"Content-Type": content_type})
    try:
        with urllib.request.urlopen(req, timeout=10) as resp:
            return resp.status, json.loads(resp.read() or b"{}")
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read() or b"{}")


def test_receiver_to_pipeline(spark, tmp_path):
    landing = str(tmp_path / "landing")
    work = str(tmp_path / "work")
    rx = FirehoseReceiver(landing, host="127.0.0.1").start()
    try:
        base = f"http://127.0.0.1:{rx.port}"

        # health probe (app/app.py:265-267)
        with urllib.request.urlopen(f"{base}/health", timeout=10) as resp:
            assert resp.status == 200

        # content-type gate (app/app.py:69-74)
        code, body = _post(f"{base}/endpoint", b"x=1", "application/x-www-form-urlencoded")
        assert code == 400
        assert body["requestId"] == "unknown"
        assert "errorMessage" in body

        # malformed JSON body
        code, body = _post(f"{base}/endpoint", b"{not json")
        assert code == 400

        # a real Firehose batch: ack carries the requestId (app/app.py:99-102)
        rec = make_record()
        code, body = _post(
            f"{base}/endpoint", envelope_json([rec], request_id="req-42").encode()
        )
        assert code == 200
        assert body["requestId"] == "req-42"
        assert isinstance(body["timestamp"], int)

        # the acked batch is durably landed before the ack
        files = [f for f in os.listdir(landing) if not f.startswith(".")]
        assert len(files) == 1
    finally:
        rx.stop()

    queries = start_pipeline(
        spark, landing, work, available_now=True, deterministic_ids=True
    )
    for q in queries:
        q.awaitTermination(timeout=120)
    rows = spark.read.parquet(os.path.join(work, "archive")).orderBy("line_no").collect()
    assert [r["line"] for r in rows] == expected_bind9_lines(rec, "@0x000000000000")
