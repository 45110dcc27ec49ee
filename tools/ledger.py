"""Attestation-freshness ledger: which driver round last attested each
registered query green (derived from the CORRECTNESS_r0*.json files the
driver writes each round).

Makes the window-rotation policy mechanical instead of a hand-audited
comment block (round-5 VERDICT task 6): tests/test_ledger.py asserts
that every registered query is either freshly attested (green within
the trailing three driver rounds) or scheduled — sitting inside the
driver's first-``WINDOW_SIZE`` correctness window for the upcoming
round.

Run directly for a human-readable report:

    python tools/ledger.py
"""

from __future__ import annotations

import glob
import json
import os

WINDOW_SIZE = 50  # the driver checks the first 50 registered queries
FRESHNESS_ROUNDS = 3  # a green row older than this is stale

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def is_green(row: dict) -> bool:
    """A driver correctness row counts as green iff rows+schema match,
    the value hash matches (or was not computed — rows-only checks), and
    no error was recorded."""
    return bool(
        row.get("rows_match")
        and row.get("schema_match")
        and row.get("hash_match") in (True, None)
        and not row.get("err")
    )


def load_ledger(repo_root: str = REPO_ROOT) -> tuple[dict[str, int], int]:
    """Return ``(latest_green, current_round)``: per query, the highest
    driver round with a green row (queries with no green row ever are
    absent), and the highest round number any CORRECTNESS file records."""
    latest: dict[str, int] = {}
    current = 0
    for path in sorted(glob.glob(os.path.join(repo_root, "CORRECTNESS_r*.json"))):
        stem = os.path.basename(path).split("_r")[1].split(".")[0]
        try:
            rnd = int(stem)
        except ValueError:
            continue
        current = max(current, rnd)
        with open(path) as f:
            data = json.load(f)
        for name, row in data.items():
            if isinstance(row, dict) and is_green(row):
                latest[name] = max(latest.get(name, 0), rnd)
    return latest, current


def audit(registered: list[str], repo_root: str = REPO_ROOT) -> dict[str, list[str]]:
    """Classify every registered query for the UPCOMING driver round.

    - ``fresh``: latest green row within the trailing FRESHNESS_ROUNDS
      driver rounds (current-2 .. current) — nothing to do.
    - ``scheduled``: stale or never-green, but inside the first
      WINDOW_SIZE registry slots, so the upcoming round attests it.
    - ``violations``: stale or never-green AND outside the window —
      the rotation policy missed it; the test fails on these.
    """
    latest, current = load_ledger(repo_root)
    window = set(registered[:WINDOW_SIZE])
    out: dict[str, list[str]] = {"fresh": [], "scheduled": [], "violations": []}
    floor = current - FRESHNESS_ROUNDS + 1
    for name in registered:
        if latest.get(name, 0) >= floor:
            out["fresh"].append(name)
        elif name in window:
            out["scheduled"].append(name)
        else:
            out["violations"].append(name)
    return out


def main() -> None:
    from dns_log_transformer_spark.queries import ALL_QUERIES

    registered = list(ALL_QUERIES)
    latest, current = load_ledger()
    report = audit(registered)
    print(f"current driver round: r{current:02d}; registered: {len(registered)}")
    for bucket, names in report.items():
        print(f"{bucket}: {len(names)}")
        for n in names:
            tag = f"r{latest[n]:02d}" if n in latest else "never"
            if bucket != "fresh":
                print(f"  {n:40s} latest green: {tag}")


if __name__ == "__main__":
    import sys

    sys.path.insert(0, REPO_ROOT)
    main()
