"""Property-based tests (SURVEY.md §5.5).

The reference couples validation and formatting implicitly:
`is_valid_dns_data` passing guarantees `to_bind9_log_format` cannot
KeyError (/root/reference/app/app.py:229-251). The engine's analog:
any record the validity predicate accepts MUST format into exactly
1 + len(answers) non-null lines, and any record it rejects must land in
quarantine with a reason — across randomized record shapes.
"""

from __future__ import annotations

import json

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.test_transforms import envelope_json, make_record, run_pipeline

# field -> a generator of INVALID values for it (None = absent)
_scalar = st.sampled_from(
    [
        "version",
        "account_id",
        "region",
        "vpc_id",
        "query_name",
        "query_type",
        "query_class",
        "rcode",
        "srcaddr",
        "srcport",
        "transport",
    ]
)

record_strategy = st.fixed_dictionaries(
    {
        "mutate": st.sampled_from(["none", "drop_scalar", "null_scalar", "bad_ts", "drop_answer_type"]),
        "field": _scalar,
        "n_answers": st.integers(min_value=0, max_value=4),
        "null_rdata": st.booleans(),
        "qname": st.text(
            alphabet="abcdefghijklmnopqrstuvwxyz0123456789-.", min_size=1, max_size=30
        ),
    }
)


def build_record(spec) -> tuple[dict, bool]:
    """Returns (record, expected_valid)."""
    answers = [
        {"Rdata": None if spec["null_rdata"] else f"10.0.0.{i}", "Type": "A"}
        for i in range(spec["n_answers"])
    ]
    rec = make_record(answers=answers, query_name=spec["qname"] or "x.")
    if spec["mutate"] == "drop_scalar":
        del rec[spec["field"]]
        return rec, False
    if spec["mutate"] == "null_scalar":
        rec[spec["field"]] = None
        return rec, False
    if spec["mutate"] == "bad_ts":
        rec["query_timestamp"] = "04/02/2021 17:51"
        return rec, False
    # a null/missing Rdata in any answer is itself a rejection
    # (app/app.py:208-210) regardless of other mutations
    base_valid = not (spec["null_rdata"] and spec["n_answers"] > 0)
    if spec["mutate"] == "drop_answer_type":
        if not answers:
            return rec, base_valid  # nothing to drop
        rec["answers"] = [{"Rdata": "1.2.3.4"}] + answers[1:]
        return rec, False
    return rec, base_valid


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(specs=st.lists(record_strategy, min_size=1, max_size=5))
def test_valid_iff_formats(spark, specs):
    built = [build_record(s) for s in specs]
    payload = envelope_json([r for r, _ in built])
    lines, quarantine = run_pipeline(spark, [payload])

    expected_lines = sum(
        1 + len(rec["answers"]) for rec, ok in built if ok
    )
    expected_rejects = sum(1 for _, ok in built if not ok)

    line_rows = lines.collect()
    assert len(line_rows) == expected_lines
    assert all(r["line"] is not None and "None" not in r["line"].split("#")[0] for r in line_rows)
    assert quarantine.count() == expected_rejects
    if expected_rejects:
        assert all(
            r["reject_reason"] is not None for r in quarantine.collect()
        )
