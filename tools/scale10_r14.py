"""10x input-scaling rows for the round-14 PLANS.md table: the two
new queries (corpus_warc_gz, sim_matryoshka_tradeoff). Method
identical to scale10_r10..r13."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

from tools.scale10_r6 import DST, SRC, timeq  # noqa: E402

from dns_log_transformer_spark.session import get_spark  # noqa: E402

QUERIES = (
    "corpus_warc_gz",
    "sim_matryoshka_tradeoff",
    
)


def main():
    assert os.path.exists(f"{DST}/documents.parquet"), (
        "x10 replica set missing; run tools/scale10_r5.py first"
    )
    spark = get_spark("scale10_r14")
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
