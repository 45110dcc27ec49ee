"""Attestation-freshness ledger + mechanical window packer.

The external driver attests only the first ``WINDOW_SIZE`` registered
queries per round (CORRECTNESS_r0N.json). This module derives, from
those checked-in files alone, (a) which round last attested each query
green, and (b) the exact window the UPCOMING round should check:
never-attested queries first (a new operator must be attested in its
birth round), then stalest-green first.

Round-6 VERDICT task 2 made this mechanical for a reason: the previous
hand-curated window went red at every round boundary — the moment the
driver committed CORRECTNESS_r0N.json the freshness floor moved, the
displaced cohort became stale, and the repo was not pytest-green at
judgment time (round 6's single red test). ``queries/__init__.py`` now
calls :func:`pack_window` at import time, so the window re-derives
itself the instant a new correctness file lands and the audit is green
by construction whenever the registry fits the capacity bound below.

Capacity: with a 50-slot window and a 3-round freshness floor, at most
``FRESHNESS_ROUNDS * WINDOW_SIZE`` queries can be fresh and another
``WINDOW_SIZE`` can ride in the "scheduled" bucket — 200 registered
queries is a hard ceiling, enforced here (warn at 185).

Run ``python tools/ledger.py`` for a human-readable report.
"""

from __future__ import annotations

import glob
import hashlib
import inspect
import json
import os
import warnings

WINDOW_SIZE = 50  # the driver checks the first 50 registered queries
FRESHNESS_ROUNDS = 3  # a green row older than this is stale

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: Per-query source hash as of its latest driver-green round. A green
#: correctness row attests a specific IMPLEMENTATION, not a name — when
#: the code or oracle changes, the old green row is evidence about code
#: that no longer exists, so the packer must treat the query as
#: never-attested (VERDICT r10 #2: 9 of 12 consolidation-merged homes
#: kept stale-green rows and dodged re-attestation in their change
#: round). Snapshot with ``python tools/ledger.py --snapshot-hashes``
#: at ROUND START, before touching query code (the code on disk then is
#: exactly what the just-landed CORRECTNESS file attested).
HASH_FILE = "ATTEST_HASHES.json"


def source_hash(q) -> str:
    """sha256 over the query fn's source + its oracle SQL. Conservative
    by design: comment/docstring edits re-trigger attestation too.
    Known limit: the hash does NOT cover the transitive closure — an
    operator edited under an unchanged query fn slips through, so a
    round that touches operators/ must sentinel the queries built on
    them (the r11 bootstrap did this for the census homes); the pytest
    parity suite remains the backstop that sees every operator change."""
    try:
        src = inspect.getsource(q.fn)
    except (OSError, TypeError):  # builtins/interactive defs: no source
        src = repr(q.fn)
    return hashlib.sha256(
        (src + "\x00" + (q.oracle or "")).encode()
    ).hexdigest()


def current_source_hashes(queries: dict) -> dict[str, str]:
    """name -> hash for a registry of Query objects as found on disk."""
    return {n: source_hash(q) for n, q in queries.items()}


def load_attested_hashes(repo_root: str = REPO_ROOT) -> dict[str, str]:
    """name -> hash at last attestation, from the checked-in snapshot
    ({} when the snapshot file is absent, e.g. partial checkouts)."""
    path = os.path.join(repo_root, HASH_FILE)
    if not os.path.exists(path):
        return {}
    with open(path) as f:
        data = json.load(f)
    return {n: row["hash"] for n, row in data.items()}


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


def pack_window(
    registered: list[str],
    repo_root: str = REPO_ROOT,
    window_size: int = WINDOW_SIZE,
    source_hashes: dict[str, str] | None = None,
) -> list[str]:
    """Derive the upcoming round's attestation window mechanically.

    Priority order (stable within each tier by the caller's registration
    order, so the packing is deterministic):

    1. never-attested — implemented code without driver evidence is the
       one debt class the bar calls out; a new query MUST be attested in
       its birth round, so growth beyond ``window_size`` new queries per
       round is structurally impossible and asserted here. When
       ``source_hashes`` (the on-disk registry's current hashes) is
       given, a query whose hash no longer matches its ATTEST_HASHES
       snapshot joins this tier: its green row attests code that no
       longer exists (VERDICT r10 #2);
    2. stalest green first — the queries closest to falling past the
       freshness floor claim the remaining slots.
    """
    capacity = (FRESHNESS_ROUNDS + 1) * window_size
    if len(registered) > capacity:
        # real exception, not assert: python -O strips asserts, and an
        # overfull registry silently rotating past freshness is exactly
        # the policy breach this guard exists to refuse (ADVICE r11 class)
        raise RuntimeError(
            f"{len(registered)} registered queries exceed the rotation "
            f"capacity ceiling {capacity} (= ({FRESHNESS_ROUNDS}+1) windows); "
            "retire/merge queries before registering more"
        )
    if len(registered) > capacity - 15:
        warnings.warn(
            f"{len(registered)} registered queries approaching the "
            f"rotation capacity ceiling {capacity}",
            stacklevel=2,
        )
    latest, current = load_ledger(repo_root)
    if current == 0:
        # No CORRECTNESS_r*.json on disk at all (packaged install, partial
        # checkout): every query would count as never-attested and the
        # assertion below would make the whole package unimportable. Degrade
        # to the static registration-order window with a warning; the hard
        # audit lives in tests/test_ledger.py where a broken window SHOULD
        # fail (ADVICE r7).
        warnings.warn(
            "no CORRECTNESS_r*.json files found under "
            f"{repo_root}; falling back to registration-order window",
            stacklevel=2,
        )
        return registered[:window_size]
    order = {n: i for i, n in enumerate(registered)}
    snapshot = load_attested_hashes(repo_root) if source_hashes else {}
    if source_hashes is not None and not snapshot:
        # no ATTEST_HASHES.json (packaged install, partial checkout):
        # hash-freshness would mark EVERY query changed and trip the
        # window assert at import time — degrade to time-only freshness,
        # same contract as the missing-CORRECTNESS fallback above
        warnings.warn(
            f"no {HASH_FILE} snapshot under {repo_root}; "
            "falling back to time-only attestation freshness",
            stacklevel=2,
        )
        source_hashes = None

    def attested_as_is(n: str) -> bool:
        if n not in latest:
            return False
        if source_hashes is None:
            return True
        return snapshot.get(n) == source_hashes.get(n)

    never = [n for n in registered if not attested_as_is(n)]
    if len(never) > window_size:
        raise RuntimeError(  # not assert: must survive python -O
            f"{len(never)} never-attested (or source-changed) queries cannot "
            f"all fit the {window_size}-slot window; registry grew or "
            "changed too fast this round"
        )
    attested = sorted(
        (n for n in registered if attested_as_is(n)),
        key=lambda n: (latest[n], order[n]),
    )
    return (never + attested)[:window_size]


def audit(
    registered: list[str],
    repo_root: str = REPO_ROOT,
    source_hashes: dict[str, str] | None = None,
) -> dict[str, list[str]]:
    """Classify every registered query for the UPCOMING driver round.

    - ``fresh``: latest green row within the trailing FRESHNESS_ROUNDS
      driver rounds (current-2 .. current) — nothing to do. With
      ``source_hashes`` given, freshness additionally requires the
      query's current hash to match its ATTEST_HASHES snapshot: a green
      row for code that since changed attests nothing (VERDICT r10 #2).
    - ``scheduled``: stale, changed, or never-green, but inside the
      first WINDOW_SIZE registry slots, so the upcoming round attests it.
    - ``violations``: stale/changed/never-green AND outside the window —
      the rotation policy missed it; the test fails on these.
    """
    latest, current = load_ledger(repo_root)
    snapshot = load_attested_hashes(repo_root) if source_hashes else {}
    if source_hashes is not None and not snapshot:
        # same degrade as pack_window — and the same WARNING (ADVICE r11):
        # an operator auditing a partial checkout must see that
        # content-keyed freshness was silently disabled
        warnings.warn(
            f"no {HASH_FILE} snapshot under {repo_root}; "
            "auditing with time-only attestation freshness",
            stacklevel=2,
        )
        source_hashes = None
    window = set(registered[:WINDOW_SIZE])
    out: dict[str, list[str]] = {"fresh": [], "scheduled": [], "violations": []}
    floor = current - FRESHNESS_ROUNDS + 1
    for name in registered:
        unchanged = (
            source_hashes is None
            or snapshot.get(name) == source_hashes.get(name)
        )
        if unchanged and latest.get(name, 0) >= floor:
            out["fresh"].append(name)
        elif name in window:
            out["scheduled"].append(name)
        else:
            out["violations"].append(name)
    return out


def snapshot_hashes(
    repo_root: str = REPO_ROOT, queries: dict | None = None
) -> list[str]:
    """Refresh ATTEST_HASHES.json from the latest driver round — run at
    ROUND START, before touching any query code, so the hashes recorded
    are exactly the source the just-landed CORRECTNESS file attested.
    For every query green in the LATEST round, the snapshot entry is
    advanced to (that round, current source hash); other entries are
    left as they were. Idempotent: a re-run in the same round is a
    no-op. Returns the names whose entry was updated."""
    if queries is None:
        from dns_log_transformer_spark.queries import ALL_QUERIES

        queries = ALL_QUERIES
    latest, current = load_ledger(repo_root)
    cur = current_source_hashes(queries)
    path = os.path.join(repo_root, HASH_FILE)
    data: dict[str, dict] = {}
    if os.path.exists(path):
        with open(path) as f:
            data = json.load(f)
    updated = []
    for name, rnd in sorted(latest.items()):
        if name in cur and rnd == current and data.get(name, {}).get("round", -1) < current:
            data[name] = {"round": current, "hash": cur[name]}
            updated.append(name)
    with open(path, "w") as f:
        json.dump(dict(sorted(data.items())), f, indent=1, sort_keys=True)
        f.write("\n")
    return updated


def main() -> None:
    import sys

    from dns_log_transformer_spark.queries import ALL_QUERIES

    if "--snapshot-hashes" in sys.argv:
        updated = snapshot_hashes()
        print(f"snapshot advanced for {len(updated)} queries:")
        for n in updated:
            print(f"  {n}")
        return

    registered = list(ALL_QUERIES)
    latest, current = load_ledger()
    report = audit(registered, source_hashes=current_source_hashes(ALL_QUERIES))
    print(f"current driver round: r{current:02d}; registered: {len(registered)}")
    for bucket, names in report.items():
        print(f"{bucket}: {len(names)}")
        for n in names:
            tag = f"r{latest[n]:02d}" if n in latest else "never"
            if bucket != "fresh":
                print(f"  {n:40s} latest green: {tag}")
    print(f"\npacked window for r{current + 1:02d} (= registry order [:{WINDOW_SIZE}]):")
    for n in registered[:WINDOW_SIZE]:
        tag = f"r{latest[n]:02d}" if n in latest else "never"
        print(f"  {n:40s} latest green: {tag}")
