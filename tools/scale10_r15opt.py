"""10x input-scaling rows for the round-15 OPTIMIZATION changes: the
queries whose physical shape this round changed (the WARC pack
parallelism pin, the capstone gate fusion, the under-split-scan
rebalances on heavy scan-riding chains). Method identical to
scale10_r6..r15 (timeq: build+noop, warm, per replica set); confirms
the optimizations still scale across the first decade — the pin in
particular must not regress 10x, where the pack shuffle carries 10x
the blob bytes.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from tools.scale10_r6 import DST, SRC, timeq  # noqa: E402

from dns_log_transformer_spark.session import get_spark  # noqa: E402

QUERIES = (
    "corpus_warc_records",
    "corpus_warc_http",
    "corpus_warc_gz",
    "corpus_warcgz_to_shards",
    "mm_container_census",
    "dns_quarantine_stats",
    "q_unpivot_measures",
    # batch 6: flag-frame fusion of the prepare funnel (measured
    # 1x 2.74s / 10x 3.91s = 1.4x on the rebuilt x10 replica)
    "corpus_prepare_funnel",
)


def main():
    spark = get_spark("scale10_r15opt")
    for name in QUERIES:
        t1, n1 = timeq(spark, name, SRC)
        t10, n10 = timeq(spark, name, DST)
        print(
            f"{name}: 1x {t1:.2f}s ({n1} rows) | 10x {t10:.2f}s ({n10} rows)"
            f" | ratio {t10 / t1:.1f}x",
            flush=True,
        )


if __name__ == "__main__":
    main()
