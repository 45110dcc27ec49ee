"""10x input-scaling rows for the round-15 PLANS.md table: the three
new queries (sim_ivf_tradeoff, corpus_warcgz_files,
corpus_warcgz_to_shards). Method identical to scale10_r10..r14; pass
--x100 to additionally run the second decade against scratch/x100
(documents+embeddings replicas), which also backs the capstone's
X100-RAN-CLEAN broadcast adjudications with an executed run."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

from tools.scale10_r6 import DST, SRC, timeq  # noqa: E402

from dns_log_transformer_spark.session import get_spark  # noqa: E402

QUERIES = (
    "sim_ivf_tradeoff",
    "corpus_warcgz_files",
    "corpus_warcgz_to_shards",
)

DST100 = "/root/repo/scratch/x100"


def main():
    assert os.path.exists(f"{DST}/documents.parquet"), (
        "x10 replica set missing; run tools/scale10_r5.py first"
    )
    x100 = "--x100" in sys.argv and os.path.isdir(DST100)
    spark = get_spark("scale10_r15")
    for name in QUERIES:
        t1, n1 = timeq(spark, name, SRC)
        t10, n10 = timeq(spark, name, DST)
        line = (
            f"{name}: 1x {t1:.2f}s ({n1} rows) | 10x {t10:.2f}s ({n10} rows)"
            f" | ratio {t10 / t1:.1f}x"
        )
        if x100:
            t100, n100 = timeq(spark, name, DST100)
            line += f" | 100x {t100:.2f}s ({n100} rows)"
        print(line, flush=True)


if __name__ == "__main__":
    main()
