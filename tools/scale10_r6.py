"""10x input-scaling measurement for the round-6 PLANS.md rows:
corpus_winnow_span_dedup, sim_ivf_delta_index, emb_knn_label,
text_tfidf_topterms, text_char_entropy.

Method identical to the existing table (PLANS.md): the scratch/x10
replica set built by scale10_r5.py/r5b.py (distinct content per replica
— vowel-rotated documents, rolled embeddings, offset ids), warm
session, per-query min-of-2 timed .count() after one untimed warm run.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from dns_log_transformer_spark.operators.caching import release_all
from dns_log_transformer_spark.queries import ALL_QUERIES
from dns_log_transformer_spark.session import get_spark

SRC = "/root/testdata/sf0.1"
DST = "/root/repo/scratch/x10"

QUERIES = (
    "corpus_winnow_span_dedup",
    "sim_ivf_delta_index",
    "emb_knn_label",
    "text_tfidf_topterms",
    "text_char_entropy",
)


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
    import os

    for t in ("documents", "embeddings"):
        assert os.path.exists(f"{DST}/{t}.parquet"), (
            f"x10 replica set missing {t}; run tools/scale10_r5.py and "
            "tools/scale10_r5b.py first"
        )
    spark = get_spark("scale10_r6")
    for name in QUERIES:
        t1, n1 = timeq(spark, name, SRC)
        t10, n10 = timeq(spark, name, DST)
        print(
            f"{name}: 1x {t1:.2f}s ({n1} rows) | 10x {t10:.2f}s ({n10} rows)"
            f" | ratio {t10 / t1:.1f}x"
        )


if __name__ == "__main__":
    main()
