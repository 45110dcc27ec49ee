#!/usr/bin/env python
"""Dump the executed SQL plan's per-node metrics for named queries.

Runs each named query once (noop sink) with the UI enabled, then pulls
/api/v1/applications/{app}/sql?details=true and prints, for the largest
execution, every plan node with its interesting metrics (time-like ones
first). This maps wall-clock to OPERATORS, which the stage-level
profiler cannot (stage names are all `save at <unknown>` under AQE).

Usage: python tools/sqlmetrics_r16.py dedup_blocking_tradeoff ...
"""

from __future__ import annotations

import json
import os
import re
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _rest(url: str):
    with urllib.request.urlopen(url, timeout=20) as r:
        return json.loads(r.read())


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from dns_log_transformer_spark.operators.caching import release_all
    from dns_log_transformer_spark.queries import ALL_QUERIES
    from dns_log_transformer_spark.session import get_spark

    spark = get_spark("sqlmetrics_r16", extra_conf={"spark.ui.enabled": "true"})
    sc = spark.sparkContext
    ui = sc.uiWebUrl
    app_id = sc.applicationId

    for name in sys.argv[1:]:
        before = {e["id"] for e in _rest(f"{ui}/api/v1/applications/{app_id}/sql")}
        df = ALL_QUERIES[name].fn(spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()
        release_all()
        execs = [
            e
            for e in _rest(
                f"{ui}/api/v1/applications/{app_id}/sql?details=true&planDescription=false&length=1000"
            )
            if e["id"] not in before
        ]
        # the noop save is the biggest new execution; persists/broadcast
        # sub-executions are separate entries — print them all
        print(f"===== {name}: {len(execs)} executions =====")
        for e in sorted(execs, key=lambda x: -(x.get("duration") or 0)):
            print(f"-- exec {e['id']} duration={e.get('duration')}ms "
                  f"status={e.get('status')}")
            for node in e.get("nodes", []):
                ms = {}
                for m in node.get("metrics", []):
                    v = m.get("value", "")
                    # keep time totals and big row counts
                    if re.search(r"total time|time total|rows", m["name"]):
                        ms[m["name"]] = v
                interesting = {
                    k: v
                    for k, v in ms.items()
                    if re.search(r"\d", str(v))
                }
                if interesting:
                    print(f"   {node['nodeName'][:60]:60s} {interesting}")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
