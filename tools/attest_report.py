"""One-stop attestation/performance report over the whole registry:
for every registered query — window membership for the upcoming driver
round, latest green driver round (from CORRECTNESS_r0*.json), and the
latest bench reading (BENCH_DETAIL_latest.json, per-query min-of-2).

The judge-facing rollup of what tools/ledger.py enforces mechanically:

    python tools/attest_report.py            # full table
    python tools/attest_report.py --summary  # counts only
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.ledger import WINDOW_SIZE, load_ledger  # noqa: E402


def build_report() -> tuple[list[dict], dict]:
    from dns_log_transformer_spark.queries import ALL_QUERIES

    latest, current = load_ledger()
    bench: dict[str, float] = {}
    bench_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_DETAIL_latest.json",
    )
    if os.path.exists(bench_path):
        with open(bench_path) as f:
            bench = json.load(f).get("queries", {})

    registered = list(ALL_QUERIES)
    rows = []
    for pos, name in enumerate(registered):
        rows.append(
            {
                "query": name,
                "window": pos < WINDOW_SIZE,
                "latest_green": latest.get(name),
                "bench_s": bench.get(name),
                "oracle": ALL_QUERIES[name].oracle is not None,
            }
        )
    summary = {
        "registered": len(registered),
        "oracle_backed": sum(1 for r in rows if r["oracle"]),
        "driver_attested_ever": sum(1 for r in rows if r["latest_green"]),
        "in_window": sum(1 for r in rows if r["window"]),
        "never_attested_in_window": sum(
            1 for r in rows if r["window"] and not r["latest_green"]
        ),
        "current_round": current,
        "bench_total_s": round(sum(v for v in bench.values()), 1)
        if bench
        else None,
    }
    return rows, summary


def main() -> None:
    rows, summary = build_report()
    if "--summary" not in sys.argv:
        print(f"{'query':42s} {'win':3s} {'green':5s} {'bench_s':>8s}")
        for r in rows:
            g = f"r{r['latest_green']:02d}" if r["latest_green"] else "-"
            b = f"{r['bench_s']:.3f}" if r["bench_s"] is not None else "-"
            w = "IN" if r["window"] else ""
            print(f"{r['query']:42s} {w:3s} {g:5s} {b:>8s}")
    for k, v in summary.items():
        print(f"{k}: {v}")


if __name__ == "__main__":
    main()
