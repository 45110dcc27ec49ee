"""Mechanical rotation-policy enforcement (round-5 VERDICT task 6).

The driver attests only the first 50 registered queries per round; the
registry's window rotation must guarantee no query's attestation goes
stale unnoticed. These tests turn the policy into code: every
registered query is either green within the trailing three driver
rounds or sits inside the upcoming round's window.

No SparkSession needed — the ledger reads the checked-in
CORRECTNESS_r*.json files and the registry's iteration order.
"""

from __future__ import annotations

import pytest

from dns_log_transformer_spark.ledger import current_source_hashes
from dns_log_transformer_spark.queries import ALL_QUERIES
from tools.ledger import FRESHNESS_ROUNDS, WINDOW_SIZE, audit, load_ledger, pack_window


def test_every_query_fresh_or_scheduled():
    report = audit(
        list(ALL_QUERIES), source_hashes=current_source_hashes(ALL_QUERIES)
    )
    assert not report["violations"], (
        "stale/changed/never-attested queries outside the driver window — "
        f"rotate them in: {report['violations']}"
    )


def test_window_prioritizes_unattested_queries():
    """Anything with NO green driver row ever must occupy a window slot
    — implemented code without driver evidence is the one debt class
    the bar calls out."""
    latest, _current = load_ledger()
    registered = list(ALL_QUERIES)
    window = set(registered[:WINDOW_SIZE])
    never = [n for n in registered if n not in latest]
    out = [n for n in never if n not in window]
    assert not out, f"never-attested queries left outside the window: {out}"


def test_registry_order_is_packer_output():
    """Since round 7 the driver window is derived, not hand-curated:
    the registry's first-WINDOW_SIZE iteration order must be exactly
    what the packer computes from the checked-in CORRECTNESS files
    (round-6 VERDICT task 2)."""
    registered = list(ALL_QUERIES)
    packed = pack_window(
        registered, source_hashes=current_source_hashes(ALL_QUERIES)
    )
    # pack_window is order-stable, so re-packing the already-packed
    # registry must return its own prefix
    assert registered[:WINDOW_SIZE] == packed


def test_packer_priority_and_capacity():
    """never-attested first, then stalest-first; capacity asserted."""
    latest, _current = load_ledger()
    registered = list(ALL_QUERIES)
    packed = pack_window(registered)
    rounds = [latest.get(n, 0) for n in packed]  # 0 = never attested
    assert rounds == sorted(rounds), "window not stalest-first"
    # everything left outside must be at least as fresh as the least
    # fresh windowed query
    outside_min = min(latest.get(n, 0) for n in registered[WINDOW_SIZE:])
    assert outside_min >= rounds[-1]
    # the capacity ceiling trips loudly instead of silently dropping
    # stale queries past the freshness floor
    too_many = [f"q_cap_{i}" for i in range((FRESHNESS_ROUNDS + 1) * WINDOW_SIZE + 1)]
    # RuntimeError, not AssertionError: the guard must survive -O (r12)
    with pytest.raises(RuntimeError, match="capacity"):
        pack_window(too_many)
    # more never-attested queries than window slots = a round that
    # registered too much; the packer refuses rather than silently
    # deferring a query's mandatory birth-round attestation
    too_new = [f"q_new_{i}" for i in range(WINDOW_SIZE + 1)]
    with pytest.raises(RuntimeError, match="never-attested"):
        pack_window(too_new)


def test_window_self_rotates_at_round_boundary(tmp_path):
    """The structural fix for round 6's red test: simulate the NEXT
    round's CORRECTNESS file landing (every current window slot goes
    green) and assert the derived window immediately re-rotates with
    ZERO violations — the hand-curation failure mode (a new correctness
    file stales the displaced cohort outside a frozen window) cannot
    recur."""
    import json
    import shutil

    from tools.ledger import REPO_ROOT

    for p in sorted(__import__("glob").glob(f"{REPO_ROOT}/CORRECTNESS_r*.json")):
        shutil.copy(p, tmp_path)
    registered = list(ALL_QUERIES)
    latest, current = load_ledger(str(tmp_path))
    # the upcoming round attests the current derived window
    green = {
        n: {"rows_match": True, "schema_match": True, "hash_match": True, "err": None}
        for n in registered[:WINDOW_SIZE]
    }
    with open(tmp_path / f"CORRECTNESS_r{current + 1:02d}.json", "w") as f:
        json.dump(green, f)
    repacked = pack_window(registered, repo_root=str(tmp_path))
    reordered = repacked + [n for n in registered if n not in set(repacked)]
    report = audit(reordered, repo_root=str(tmp_path))
    assert not report["violations"], report["violations"]
    # and the just-attested queries must have LEFT the window entirely —
    # with > WINDOW_SIZE staler queries registered, every slot goes to
    # the next-stalest cohort
    assert len(registered) >= 2 * WINDOW_SIZE
    assert not set(repacked) & set(registered[:WINDOW_SIZE])


def test_source_changed_query_preempts_stale_green(tmp_path):
    """VERDICT r10 #2: attestation freshness is keyed on CODE, not just
    time. A query whose source hash no longer matches its ATTEST_HASHES
    snapshot must pack FIRST (never-attested tier) even when its green
    driver row is the freshest on file — the row attests code that no
    longer exists — preempting merely time-stale green queries."""
    import json

    stale = [f"q_stale_{i}" for i in range(WINDOW_SIZE + 10)]
    registered = ["q_changed", *stale]
    with open(tmp_path / "CORRECTNESS_r01.json", "w") as f:
        json.dump({n: {"rows_match": True, "schema_match": True,
                       "hash_match": True, "err": None} for n in stale}, f)
    with open(tmp_path / "CORRECTNESS_r03.json", "w") as f:
        json.dump({"q_changed": {"rows_match": True, "schema_match": True,
                                 "hash_match": True, "err": None}}, f)
    hashes = {n: f"h_{n}" for n in registered}
    with open(tmp_path / "ATTEST_HASHES.json", "w") as f:
        json.dump(
            {n: {"round": 3 if n == "q_changed" else 1, "hash": h}
             for n, h in hashes.items()}, f)

    # unchanged code: q_changed is the freshest green -> NOT in window
    packed = pack_window(registered, repo_root=str(tmp_path),
                         source_hashes=dict(hashes))
    assert "q_changed" not in packed

    # its source changes: it must take the FIRST slot, ahead of every
    # stale-green query, despite holding the freshest green row
    hashes["q_changed"] = "h_edited"
    packed = pack_window(registered, repo_root=str(tmp_path),
                         source_hashes=hashes)
    assert packed[0] == "q_changed"

    # and the audit mirrors it: outside the window it is a violation,
    # not fresh, even though its green row is current-round
    reordered = packed + [n for n in registered if n not in set(packed)]
    report = audit(reordered, repo_root=str(tmp_path), source_hashes=hashes)
    assert "q_changed" in report["scheduled"]
    demoted = audit(registered[::-1], repo_root=str(tmp_path),
                    source_hashes=hashes)
    assert "q_changed" in demoted["violations"]


def test_packer_degrades_without_correctness_files(tmp_path):
    """ADVICE r7: with no CORRECTNESS_r*.json on disk (packaged
    install, partial checkout) pack_window must NOT raise at import
    time — it falls back to the registration-order prefix with a
    warning. The hard never-attested assertion still fires when
    correctness files exist (previous test)."""
    registered = [f"q_{i}" for i in range(WINDOW_SIZE + 25)]
    with pytest.warns(UserWarning, match="no CORRECTNESS"):
        packed = pack_window(registered, repo_root=str(tmp_path))
    assert packed == registered[:WINDOW_SIZE]


def test_ledger_reads_history():
    latest, current = load_ledger()
    assert current >= 5
    # spot-pin: queries green in r5's window per CORRECTNESS_r05.json
    assert latest.get("q_full_outer_yearly", 0) >= 5
    # emb_pq_codes was retired into emb_vector_codes in r10; the ledger
    # is history-keyed, so its old green rows remain readable
    assert latest.get("emb_pq_codes", 0) >= 5


def test_attest_report_builds():
    """The judge-facing rollup (tools/attest_report.py) must build from
    the same inputs the ledger enforces: every row carries window
    membership + oracle flag, and the summary's invariants hold."""
    from tools.attest_report import build_report

    rows, summary = build_report()
    assert summary["registered"] == len(rows)
    assert summary["oracle_backed"] == summary["registered"]
    assert summary["in_window"] == 50
    # never-attested queries must all sit inside the window (the other
    # ledger test's rule, restated through the report)
    assert all(r["window"] for r in rows if not r["latest_green"])


def test_snapshot_hashes_advances_only_latest_round_greens(tmp_path):
    """The round-start snapshot flow: only queries green in the LATEST
    driver round advance to (that round, current hash); older entries
    and never-green queries are untouched; a re-run is a no-op."""
    import json

    from dataclasses import dataclass

    from dns_log_transformer_spark.ledger import (
        load_attested_hashes,
        snapshot_hashes,
        source_hash,
    )

    @dataclass(frozen=True)
    class Q:
        fn: object
        oracle: str | None

    def f_a(spark, sf):  # pragma: no cover - hashed, never run
        return 1

    def f_b(spark, sf):  # pragma: no cover
        return 2

    queries = {"q_a": Q(fn=f_a, oracle="SELECT 1"),
               "q_b": Q(fn=f_b, oracle=None)}
    green = {"rows_match": True, "schema_match": True,
             "hash_match": True, "err": None}
    with open(tmp_path / "CORRECTNESS_r01.json", "w") as f:
        json.dump({"q_b": green}, f)
    with open(tmp_path / "CORRECTNESS_r02.json", "w") as f:
        json.dump({"q_a": green}, f)
    # pre-existing snapshot entry for q_b from its r01 attestation
    with open(tmp_path / "ATTEST_HASHES.json", "w") as f:
        json.dump({"q_b": {"round": 1, "hash": "old-b-hash"}}, f)

    updated = snapshot_hashes(repo_root=str(tmp_path), queries=queries)
    assert updated == ["q_a"]  # green in r02 (latest); q_b stays r01
    snap = load_attested_hashes(str(tmp_path))
    assert snap["q_a"] == source_hash(queries["q_a"])
    assert snap["q_b"] == "old-b-hash"  # NOT silently refreshed

    # idempotent within the round
    assert snapshot_hashes(repo_root=str(tmp_path), queries=queries) == []
