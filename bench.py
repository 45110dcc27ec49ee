#!/usr/bin/env python
"""Benchmark: run every registered query at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print TWO JSON
lines:

1. a detail line with per-query seconds and rows-out:
     {"metric": "...", "value": total_sec, "unit": "sec",
      "queries": {name: sec, ...}, "rows": {name: rows_out, ...},
      "sf": 0.1}
2. a compact summary as the LAST line (no per-query maps, < 200 bytes)
   so a tail-capture of stdout always parses:
     {"metric": "...", "value": total_sec, "unit": "sec", "sf": 0.1,
      "n_queries": N}

Each query is forced end-to-end with the noop sink (full computation, no
driver-side collect — measures the engine, not result transfer).
Rows-out comes from a DataFrame ``observe()`` metric, so a run reports
per-query output cardinality without a second pass over the data.

Variance control (round-5): each query is timed ``SPARK_GRAFT_BENCH_PASSES``
times (default 3 since r11 — min-of-2 still let one contended pass pair
inflate a row, VERDICT r10 #4) and the detail line's per-query map
reports the MIN. The detail JSON also records loadavg at start/end so a
headline delta can be adjudicated against machine contention.
Since round 7 the headline ``value`` is the SUM OF PER-QUERY MINS —
the pass-1 sum swung 104.9-147.2 s (+-29%) across same-code round-6
runs while the min map stayed stable, making round-over-round headline
claims untrustworthy (VERDICT r6 task 5). The pass-1 sum is kept as
the secondary ``pass1_total`` field for cold-cost visibility;
pre-round-7 headlines are pass-1 sums, so compare across that boundary
via the detail maps.

Every run also persists its detail locally (the driver's artifact only
keeps a tail of stdout, which drops the per-query map once the registry
is large — round-3 lesson): the full detail line is written to
``BENCH_DETAIL_latest.json`` and appended to ``bench_history.jsonl``
with a UTC timestamp, so round-over-round per-query diffs never require
a re-run.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import Observation  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from dns_log_transformer_spark.operators.caching import release_all  # noqa: E402
from dns_log_transformer_spark.queries import ALL_QUERIES  # noqa: E402
from dns_log_transformer_spark.session import get_spark  # noqa: E402

METRIC = "sum of per-query min wall time (3 passes), all registered queries, noop sink"


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    # machine-contention evidence (VERDICT r10 #4): same-code headlines
    # spanned ~30% across six r10 runs; recording the 1/5/15-min load
    # averages at start AND end lets a later reader adjudicate whether a
    # delta was the code or the machine
    load_start = os.getloadavg()
    spark = get_spark("bench")

    only = [s for s in os.environ.get("SPARK_GRAFT_BENCH_FILTER", "").split(",") if s]

    # Untimed warm-up: the first execution of each engine path (codegen
    # compilation, shuffle service, Arrow/Python worker pool, parquet
    # footer cache) costs 3-5x its steady state, and WHICH query pays it
    # depends on registry ordering — so per-query numbers silently shift
    # whenever the registry grows (the q5/q6 "regression" of round 3 and
    # q7's in round 4 were both this). Exercise one exemplar of each
    # path before the clock starts; timings below are steady-state.
    # Filtered runs skip it: the quick-iteration loop shouldn't pay the
    # fixed exemplar queries, and its numbers are for relative comparison anyway.
    for wname in () if only else (
        "q1_pricing_summary",   # agg + codegen
        "q3_shipping_priority", # join machinery
        "q_window_native",      # window exec
        "text_token_stats",     # text fan-out
        "sim_topk_bruteforce",  # Arrow pandas-UDF worker pool
        "dedup_minhash_lsh",    # pyspark.ml NGram class load + persist path
        "q_distinct_and_percentiles",  # ObjectHashAggregate/percentile machinery
    ):
        if wname in ALL_QUERIES:
            ALL_QUERIES[wname].fn(spark, sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()
            release_all()

    # default 3 passes since r11: the r10 same-code band showed min-of-2
    # still lets one contended pass pair inflate a row (VERDICT r10 #4)
    passes = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "3")))
    timings: dict[str, float] = {}
    pass1: dict[str, float] = {}
    rows_out: dict[str, int] = {}
    for name, q in sorted(ALL_QUERIES.items()):
        if only and not any(s in name for s in only):
            continue
        per_pass: list[float] = []
        for _ in range(passes):
            # rebuild the plan each pass: build-time work (offsets maps,
            # codebook collects) re-runs, and release_all() below drops
            # operator caches so every pass pays its own cache builds
            df = q.fn(spark, sf_dir)
            obs = Observation()
            df = df.observe(obs, F.count(F.lit(1)).alias("rows_out"))
            t0 = time.perf_counter()
            df.write.mode("overwrite").format("noop").save()
            per_pass.append(round(time.perf_counter() - t0, 3))
            rows_out[name] = int(obs.get["rows_out"])
            # drop operator-internal caches so a 119-query session
            # doesn't accumulate session-lifetime storage (each query
            # re-creates what it needs; release is correctness-neutral)
            release_all()
        timings[name] = min(per_pass)
        pass1[name] = per_pass[0]

    total = round(sum(timings.values()), 3)
    pass1_total = round(sum(pass1.values()), 3)
    detail = {
        "metric": METRIC,
        "value": total,
        "unit": "sec",
        "pass1_total": pass1_total,
        "passes": passes,
        "loadavg_start": [round(x, 2) for x in load_start],
        "loadavg_end": [round(x, 2) for x in os.getloadavg()],
        # n_cpus = the SESSION's parallelism (local[$SPARK_GRAFT_CPUS]),
        # not the machine's core count: the driver re-runs the bench at a
        # lower core count to measure scaling, and r15's 8-core history
        # row said 32 because this recorded os.cpu_count() (VERDICT r15
        # #2) — that mislabel left the driver's scaling per_query empty.
        "n_cpus": spark.sparkContext.defaultParallelism,
        "n_cpus_machine": os.cpu_count(),
        "master": spark.sparkContext.master,
        "queries": timings,
        "rows": rows_out,
        "sf": sf,
    }
    print(json.dumps(detail))
    # persist the detail next to the repo (full runs only — a filtered
    # run would overwrite a complete detail file with a partial one)
    if not only:
        import datetime

        here = os.path.dirname(os.path.abspath(__file__))
        stamped = {
            "ts": datetime.datetime.now(datetime.timezone.utc).isoformat(
                timespec="seconds"
            ),
            **detail,
        }
        # clobber guard (VERDICT r12 #8, same policy as parity_sweep):
        # a committed, git-clean BENCH_DETAIL_latest.json is round-end
        # evidence — an ad-hoc run only overwrites it when the caller
        # says where to write (SPARK_GRAFT_BENCH_OUT, which may be the
        # default path to force). bench_history.jsonl is append-only
        # and always records the run regardless.
        from tools.artifacts import artifact_writable

        out = os.environ.get("SPARK_GRAFT_BENCH_OUT")
        target = out or os.path.join(here, "BENCH_DETAIL_latest.json")
        if out is None and not artifact_writable(target):
            print(
                f"NOT writing {target}: committed round-end record is "
                "git-clean - set SPARK_GRAFT_BENCH_OUT to overwrite "
                "(history still appended)",
                file=sys.stderr,
            )
        else:
            with open(target, "w") as f:
                json.dump(stamped, f, indent=1, sort_keys=True)
                f.write("\n")
        with open(os.path.join(here, "bench_history.jsonl"), "a") as f:
            f.write(json.dumps(stamped) + "\n")
    # compact summary LAST: a bounded tail of stdout must always contain
    # one complete, parseable JSON line (the detail line above can exceed
    # a tail-capture window once the registry is large)
    print(
        json.dumps(
            {
                "metric": METRIC,
                "value": total,
                "unit": "sec",
                "pass1_total": pass1_total,
                "sf": sf,
                "n_queries": len(timings),
            }
        )
    )


if __name__ == "__main__":
    main()
