"""10x input-scaling measurement for the round-7 PLANS.md updates:
the rewritten q_rfm_segments (one global_rank pass) and the
basket-capped q_copurchase_pairs / q_link_prediction_aa.

Method identical to the existing table (PLANS.md): the scratch/x10
replica set built by scale10_r5.py/r5b.py (distinct content per replica
— vowel-rotated documents, rolled embeddings, offset ids), warm
session, per-query min-of-2 timed .count() after one untimed warm run.
Note: orders/lineitem ARE in the x10 replica set; customer/dims are
symlinks.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from tools.scale10_r6 import DST, SRC, timeq  # noqa: E402

from dns_log_transformer_spark.session import get_spark  # noqa: E402

QUERIES = (
    "q_rfm_segments",
    "q_copurchase_pairs",
    "q_link_prediction_aa",
)


def main():
    spark = get_spark("scale10_r7")
    for name in QUERIES:
        t1, n1 = timeq(spark, name, SRC)
        t10, n10 = timeq(spark, name, DST)
        print(
            f"{name}: 1x {t1:.2f}s ({n1} rows) | 10x {t10:.2f}s ({n10} rows)"
            f" | ratio {t10 / t1:.1f}x"
        )


if __name__ == "__main__":
    main()
