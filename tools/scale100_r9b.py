"""100x EVENTS scaling for the sliding-distinct pair — the measurement
that makes the exact-vs-HLL trade visible: at 100x (100M events, ~100x
distinct users per window, window count fixed) the exact op must
shuffle every (window, user) pair into the two-phase distinct while the
HLL twin's second stage stays O(windows x registers).

Replicas offset event_id and user_id (distinct users per replica) and
keep ts unchanged (same time span, denser traffic — the realistic 100x
shape, and it keeps the window axis fixed so output stays comparable).
Method as in the PLANS.md table (tools/scale10_r6.timeq).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

from tools.scale10_r6 import DST, SRC, timeq  # noqa: E402

from dns_log_transformer_spark.session import get_spark  # noqa: E402

DST100 = "/root/repo/scratch/x100ev"

QUERIES = ("q_sliding_distinct",)  # r10: approx twin merged in


def build(spark) -> None:
    out_path = os.path.join(DST100, "events.parquet")
    if os.path.exists(out_path):
        return
    os.makedirs(DST100, exist_ok=True)
    from functools import reduce

    from pyspark.sql import functions as F

    ev = spark.read.parquet(os.path.join(SRC, "events.parquet"))
    reps = [
        ev.select(
            (F.col("event_id") + r * 100_000_000).alias("event_id"),
            "ts",
            (F.col("user_id") + r * 10_000_000).alias("user_id"),
            "event_type",
            "value",
            "props",
        )
        for r in range(100)
    ]
    reduce(lambda a, b: a.unionAll(b), reps).write.parquet(out_path)


def main() -> None:
    spark = get_spark("scale100_r9b")
    build(spark)
    for name in QUERIES:
        t1, n1 = timeq(spark, name, SRC)
        t10, n10 = timeq(spark, name, DST)
        t100, n100 = timeq(spark, name, DST100)
        print(
            f"{name}: 1x {t1:.2f}s ({n1}) | 10x {t10:.2f}s ({n10}) | "
            f"100x {t100:.2f}s ({n100}) | 10->100 ratio {t100 / t10:.1f}x"
        )


if __name__ == "__main__":
    main()
