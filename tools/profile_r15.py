#!/usr/bin/env python
"""Round-15 optimization profiler: per-query breakdown.

For each named query (or the top-N by the committed bench detail):
- build the plan (timed separately — bench's timed row excludes build),
- run the noop sink PASSES times (timed, min reported),
- count Spark jobs/stages/tasks and per-stage executor run time via the
  local UI REST API (run with SPARK_GRAFT_UI=1 to enable the UI),
- flag codegen fallbacks seen in the JVM log line buffer.

Usage:
  SPARK_GRAFT_UI=1 python tools/profile_r15.py dedup_blocking_tradeoff ...
  python tools/profile_r15.py --top 15
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PASSES = int(os.environ.get("SPARK_GRAFT_PROFILE_PASSES", "3"))


def _rest(url: str):
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read())


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf_dir = os.environ["SPARK_GRAFT_SF_DIR"]

    from dns_log_transformer_spark.operators.caching import release_all
    from dns_log_transformer_spark.queries import ALL_QUERIES
    from dns_log_transformer_spark.session import get_spark

    extra = {}
    if os.environ.get("SPARK_GRAFT_UI"):
        extra["spark.ui.enabled"] = "true"
    spark = get_spark("profile_r15", extra_conf=extra)
    sc = spark.sparkContext
    ui = sc.uiWebUrl  # None when UI disabled
    app_id = sc.applicationId

    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    if "--top" in sys.argv:
        n = int(sys.argv[sys.argv.index("--top") + 1])
        here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        detail = json.load(open(os.path.join(here, "BENCH_DETAIL_latest.json")))
        names = [
            k
            for k, _ in sorted(detail["queries"].items(), key=lambda kv: -kv[1])[:n]
        ]

    # warm-up (same exemplars as bench.py)
    for wname in (
        "q1_pricing_summary",
        "q3_shipping_priority",
        "q_window_native",
        "text_token_stats",
        "sim_topk_bruteforce",
        "dedup_minhash_lsh",
        "q_distinct_and_percentiles",
    ):
        if wname in ALL_QUERIES:
            ALL_QUERIES[wname].fn(spark, sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()
            release_all()

    out = {}
    for name in names:
        q = ALL_QUERIES[name]
        tracker = sc.statusTracker()
        jobs_before = set(tracker.getJobIdsForGroup(None) or [])
        stages_before = set()
        if ui:
            try:
                stages_before = {
                    (s["stageId"], s["attemptId"])
                    for s in _rest(f"{ui}/api/v1/applications/{app_id}/stages")
                }
            except Exception:
                pass
        build_times = []
        per_pass = []
        for _ in range(PASSES):
            t0 = time.perf_counter()
            df = q.fn(spark, sf_dir)
            t1 = time.perf_counter()
            df.write.mode("overwrite").format("noop").save()
            t2 = time.perf_counter()
            build_times.append(t1 - t0)
            per_pass.append(t2 - t1)
            release_all()
        rec = {
            "build_min": round(min(build_times), 3),
            "exec_min": round(min(per_pass), 3),
            "exec_all": [round(x, 3) for x in per_pass],
        }
        jobs_after = set(tracker.getJobIdsForGroup(None) or [])
        rec["n_jobs_total"] = (
            round(len(jobs_after - jobs_before) / PASSES, 1)
            if jobs_after
            else None
        )
        if ui:
            try:
                stages = _rest(f"{ui}/api/v1/applications/{app_id}/stages")
                new = [
                    s
                    for s in stages
                    if (s["stageId"], s["attemptId"]) not in stages_before
                    and s["status"] == "COMPLETE"
                ]
                rec["n_stages"] = round(len(new) / PASSES, 1)
                rec["n_tasks"] = round(
                    sum(s["numCompleteTasks"] for s in new) / PASSES, 1
                )
                rec["exec_run_ms"] = round(
                    sum(s.get("executorRunTime", 0) for s in new) / PASSES
                )
                # top stages by executor run time (one pass-averaged view)
                new.sort(key=lambda s: -s.get("executorRunTime", 0))
                rec["top_stages"] = [
                    {
                        "run_ms": s["executorRunTime"],
                        "tasks": s["numCompleteTasks"],
                        "name": s["name"][:80],
                    }
                    for s in new[:5]
                ]
            except Exception as e:
                rec["stage_err"] = repr(e)
        out[name] = rec
        print(name, json.dumps(rec), flush=True)

    print("TOTAL exec_min:", round(sum(r["exec_min"] for r in out.values()), 3))


if __name__ == "__main__":
    main()
