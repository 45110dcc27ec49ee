"""10x input-scaling measurement for the late round-5 additions
(PLANS.md method: distinct-content replication, warm session, min of 2
timed passes). Requires the scratch/x10 replica built by
tools/scale10_r5.py."""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from dns_log_transformer_spark.operators.caching import release_all
from dns_log_transformer_spark.queries import ALL_QUERIES
from dns_log_transformer_spark.session import get_spark

SRC = "/root/testdata/sf0.1"
DST = "/root/repo/scratch/x10"


def timeq(spark, name, sf_dir):
    q = ALL_QUERIES[name]
    q.fn(spark, sf_dir).count()
    release_all()
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        n = q.fn(spark, sf_dir).count()
        dt = time.perf_counter() - t0
        release_all()
        best = dt if best is None else min(best, dt)
    return best, n


def main():
    spark = get_spark("scale10c")
    for name in ("corpus_observed_ingest", "text_sentences"):
        t1, n1 = timeq(spark, name, SRC)
        t10, n10 = timeq(spark, name, DST)
        print(
            f"RESULT {name}: 1x {t1:.2f}s ({n1} rows) | 10x {t10:.2f}s "
            f"({n10} rows) | ratio {t10 / t1:.1f}x"
        )


if __name__ == "__main__":
    main()
