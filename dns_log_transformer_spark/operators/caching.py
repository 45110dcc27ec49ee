"""Session-lifetime cache registry for operator-internal persists.

Operators persist() intermediates that feed multiple consumers of the
SAME returned (lazy) plan — PLANS.md rule 4. The cache must outlive the
operator call (the plan has not executed yet), so the operator cannot
unpersist before returning; left alone, repeated calls accumulate
session-lifetime cached plans and storage memory (the round-3 ADVICE
finding). Ownership therefore transfers to the batch driver: every
operator-internal persist goes through :func:`persist_tracked`, and
drivers that run many queries in one session (bench.py, the
oracle-parity suite) call :func:`release_all` between queries.

Releasing is always correctness-neutral: unpersist only drops cached
blocks — a plan that still references the intermediate recomputes it.
Only latency can be affected, never results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_LIVE: list[DataFrame] = []


def persist_tracked(df: DataFrame) -> DataFrame:
    """persist() + register for later :func:`release_all`."""
    df = df.persist()
    _LIVE.append(df)
    return df


def release_all() -> int:
    """Unpersist every tracked cache (non-blocking); returns the count.

    Call between queries in long-lived sessions. Safe at any time —
    in-flight plans that still need a released intermediate recompute
    it from lineage.
    """
    n = 0
    while _LIVE:
        df = _LIVE.pop()
        try:
            df.unpersist()
        except Exception:
            pass  # session already stopped: nothing to release
        n += 1
    return n
