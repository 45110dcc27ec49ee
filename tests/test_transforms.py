"""Golden-output tests for the reference-parity transform core.

Strategy per SURVEY.md §5.1-5.2: hand-built Route53 records -> expected
BIND9 lines byte-for-byte (client-id injected deterministically), covering
0/1/N answers, null Rdata -> 'N/A', timestamp dialects, the qtype-from-
answers[0] quirk, and the rejection matrix of is_valid_dns_data
(/root/reference/app/app.py:175-217).
"""

from __future__ import annotations

import base64
import json
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from dns_log_transformer_spark.transforms import (
    decode_records,
    explode_records,
    parse_envelope,
    split_valid_invalid,
    to_bind9_lines,
    to_microsoft_dns_lines,
    with_client_hex,
)


def make_record(**overrides):
    """A fully-valid Route53 record (field list: app/app.py:177-192)."""
    rec = {
        "version": "1.100000",
        "account_id": "123456789012",
        "region": "us-east-1",
        "vpc_id": "vpc-0123456789abcdef0",
        "query_timestamp": "2021-02-04T17:51:55Z",
        "query_name": "example.com.",
        "query_type": "A",
        "query_class": "IN",
        "rcode": "NOERROR",
        "answers": [{"Rdata": "93.184.216.34", "Type": "A"}],
        "srcaddr": "10.0.0.1",
        "srcport": "53123",
        "transport": "UDP",
        "srcids": {"instance": "i-0abcd1234efgh5678"},
    }
    rec.update(overrides)
    return rec


def envelope_json(records, request_id="req-1"):
    """Firehose request body (app/app.py:35-58) with base64'd records."""
    return json.dumps(
        {
            "requestId": request_id,
            "timestamp": 1612461115000,
            "records": [
                {
                    "data": base64.b64encode(
                        (json.dumps(r) if isinstance(r, dict) else r).encode()
                    ).decode()
                }
                for r in records
            ],
        }
    )


def expected_bind9_lines(rec, client_hex):
    """Independent Python oracle for the BIND9 templates
    (app/app.py:146-173), used only by tests."""
    dt = datetime.strptime(rec["query_timestamp"], "%Y-%m-%dT%H:%M:%SZ")
    syslog_ts = dt.strftime("%b %d %H:%M:%S")
    bind9_ts = dt.strftime("%d-%b-%Y %H:%M:%S.000")
    qname = rec["query_name"]
    prefix = (
        f"{syslog_ts} {rec['vpc_id']} route53resolver: {bind9_ts} client "
        f"{client_hex} {rec['srcaddr']}#{rec['srcport']} ({qname}): "
    )
    qtype = rec["answers"][0]["Type"] if rec["answers"] else "A"
    lines = [prefix + f"query: {qname} IN {qtype} + (127.0.0.1)"]
    for a in rec["answers"]:
        rdata = a.get("Rdata") or "N/A"
        lines.append(prefix + f"reply: {qname} is {rdata}")
    return lines


def run_pipeline(spark, payloads):
    raw = spark.createDataFrame([(p,) for p in payloads], ["value"])
    env = parse_envelope(raw)
    recs = explode_records(env)
    decoded = decode_records(recs)
    valid, quarantine = split_valid_invalid(decoded)
    valid = with_client_hex(valid, seed_col="record_idx")
    lines = to_bind9_lines(valid, keep=["requestId", "record_idx", "client_hex"])
    return lines, quarantine


class TestBind9Golden:
    def test_one_answer(self, spark):
        rec = make_record()
        lines, _ = run_pipeline(spark, [envelope_json([rec])])
        rows = lines.orderBy("line_no").collect()
        hexid = rows[0]["client_hex"]
        assert [r["line"] for r in rows] == expected_bind9_lines(rec, hexid)
        assert [r["kind"] for r in rows] == ["query", "reply"]

    def test_zero_answers_defaults_type_A(self, spark):
        rec = make_record(answers=[], query_type="TXT")
        lines, _ = run_pipeline(spark, [envelope_json([rec])])
        rows = lines.collect()
        assert len(rows) == 1
        assert " IN A + (127.0.0.1)" in rows[0]["line"]  # app/app.py:157

    def test_qtype_from_first_answer_not_query_type(self, spark):
        # app/app.py:157 — output qtype is answers[0].Type
        rec = make_record(
            query_type="A",
            answers=[{"Rdata": "cname.example.com.", "Type": "CNAME"}],
        )
        lines, _ = run_pipeline(spark, [envelope_json([rec])])
        q = lines.filter("kind = 'query'").collect()[0]["line"]
        assert " IN CNAME + " in q

    def test_many_answers_order_and_shared_hex(self, spark):
        answers = [{"Rdata": f"10.0.0.{i}", "Type": "A"} for i in range(5)]
        rec = make_record(answers=answers)
        lines, _ = run_pipeline(spark, [envelope_json([rec])])
        rows = lines.orderBy("line_no").collect()
        assert len(rows) == 6  # 1 query + 5 replies (app/app.py:163-171)
        hexes = {r["line"].split(" client ")[1].split(" ")[0] for r in rows}
        assert len(hexes) == 1  # shared per record (app/app.py:154)
        for i, r in enumerate(rows[1:]):
            assert r["line"].endswith(f"is 10.0.0.{i}")

    def test_null_rdata_rejected(self, spark):
        # reference rejects an answer missing the Rdata key
        # (app/app.py:208-210); from_json maps missing-key to null, so a
        # null Rdata is the same condition here
        rec = make_record(answers=[{"Type": "A"}])
        lines, quarantine = run_pipeline(spark, [envelope_json([rec])])
        assert lines.count() == 0
        reason = quarantine.collect()[0]["reject_reason"]
        assert reason == "answer_missing_rdata_or_type"

    def test_timestamp_dialects(self, spark):
        rec = make_record(query_timestamp="2021-02-04T07:05:09Z")
        lines, _ = run_pipeline(spark, [envelope_json([rec])])
        line = lines.collect()[0]["line"]
        assert line.startswith("Feb 04 07:05:09 ")  # %b %d zero-padded
        assert " 04-Feb-2021 07:05:09.000 client " in line


class TestRejectionMatrix:
    @pytest.mark.parametrize("missing", ["version", "vpc_id", "srcaddr", "rcode"])
    def test_missing_scalar_field(self, spark, missing):
        rec = make_record()
        del rec[missing]
        lines, quarantine = run_pipeline(spark, [envelope_json([rec])])
        assert lines.count() == 0
        q = quarantine.collect()
        assert len(q) == 1
        assert q[0]["reject_reason"] == f"missing_or_invalid:{missing}"

    def test_missing_srcids_instance(self, spark):
        rec = make_record(srcids={"resolver_endpoint": "x"})
        lines, quarantine = run_pipeline(spark, [envelope_json([rec])])
        assert lines.count() == 0
        assert quarantine.collect()[0]["reject_reason"] == "srcids_missing_instance"

    def test_answer_missing_type(self, spark):
        rec = make_record(answers=[{"Rdata": "1.2.3.4"}])
        lines, quarantine = run_pipeline(spark, [envelope_json([rec])])
        assert lines.count() == 0
        assert quarantine.collect()[0]["reject_reason"] == "answer_missing_rdata_or_type"

    def test_bad_timestamp(self, spark):
        rec = make_record(query_timestamp="2021-02-04 17:51:55")
        lines, quarantine = run_pipeline(spark, [envelope_json([rec])])
        assert lines.count() == 0
        assert quarantine.collect()[0]["reject_reason"] == "bad_query_timestamp"

    def test_bad_base64_skipped_siblings_survive(self, spark):
        # app/app.py:255-256 — decode error skips that record only
        good = make_record()
        payload = json.dumps(
            {
                "requestId": "r",
                "records": [
                    {"data": "!!!not-base64!!!"},
                    {"data": base64.b64encode(json.dumps(good).encode()).decode()},
                ],
            }
        )
        lines, quarantine = run_pipeline(spark, [payload])
        assert lines.count() == 2  # good record: 1 query + 1 reply
        assert quarantine.collect()[0]["reject_reason"] == "decode_error"

    def test_non_json_record(self, spark):
        lines, quarantine = run_pipeline(spark, [envelope_json(["hello not json"])])
        assert lines.count() == 0
        assert quarantine.collect()[0]["reject_reason"] == "json_parse_error"


class TestEnvelope:
    def test_empty_records_rejected(self, spark):
        raw = spark.createDataFrame(
            [(json.dumps({"requestId": "r", "records": []}),)], ["value"]
        )
        env = parse_envelope(raw)
        assert env.filter("envelope_valid").count() == 0  # minItems:1

    def test_missing_request_id_rejected(self, spark):
        raw = spark.createDataFrame(
            [(json.dumps({"records": [{"data": "aGk="}]}),)], ["value"]
        )
        env = parse_envelope(raw)
        assert env.filter("envelope_valid").count() == 0

    def test_oversized_data_rejected(self, spark):
        raw = spark.createDataFrame(
            [(json.dumps({"requestId": "r", "records": [{"data": "A" * 1_365_340}]}),)],
            ["value"],
        )
        env = parse_envelope(raw)
        assert env.filter("envelope_valid").count() == 0  # maxLength 1365336


class TestMicrosoftFormat:
    def test_template(self, spark):
        rec = make_record()
        lines, _ = run_pipeline(spark, [envelope_json([rec])])
        raw = spark.createDataFrame([(envelope_json([rec]),)], ["value"])
        decoded = decode_records(explode_records(parse_envelope(raw)))
        valid, _ = split_valid_invalid(decoded)
        ms = to_microsoft_dns_lines(valid).collect()[0]["line"]
        # app/app.py:141-142 (double space after PACKET), :131 dd/MM/yyyy
        assert ms == (
            "04/02/2021 17:51:55 0D2C PACKET  0000000001ED00C0 UDP Snd "
            "10.0.0.1 53123 R Q [NOERROR A DR NOERROR] A (12)example.com.(0)"
        )
