"""10x input-scaling rows for the round-16 OPTIMIZATION changes plus
the r15 shapes VERDICT r15 #7 asked to cover (the dns-family and
q7/q_approx_percentiles rebalances: the split-count gate must NO-OP on
the well-split x10 replica scans — verified by plan, timed here).

Method identical to scale10_r6..r15opt (timeq: warm run, min-of-2 timed
.count(), per replica set). Run with SPARK_GRAFT_CPUS=8 for the c8 leg
of a c8/c32 scaling pair (VERDICT r15 #1: fixture-scale wall is
overhead-bound; a change only counts as parallelism if the 8-core leg
slows by more than the band).
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from tools.scale10_r6 import DST, SRC, timeq  # noqa: E402

from dns_log_transformer_spark.session import get_spark  # noqa: E402

QUERIES = (
    # r16 job-count/exchange fusions
    "dedup_blocking_audit",
    "dedup_blocking_tradeoff",
    "q_pagerank_trade",
    # r15 rebalance classes owed 10x rows (VERDICT r15 #7)
    "dns_quarantine_stats",
    "dns_reply_stats",
    "q7_nation_volume",
    "q_approx_percentiles",
)


def main():
    import os

    names = sys.argv[1:] or QUERIES
    spark = get_spark("scale10_r16")
    print(f"cpus={spark.sparkContext.defaultParallelism} "
          f"load={[round(x, 2) for x in os.getloadavg()]}")
    for name in names:
        t1, n1 = timeq(spark, name, SRC)
        t10, n10 = timeq(spark, name, DST)
        print(
            f"{name}: 1x {t1:.2f}s ({n1} rows) | 10x {t10:.2f}s ({n10} rows)"
            f" | ratio {t10 / t1:.1f}x",
            flush=True,
        )


if __name__ == "__main__":
    main()
