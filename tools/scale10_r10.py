"""10x input-scaling measurement for the round-10 PLANS.md rows: the
new mm_container_census plus the merged consolidation homes whose plans
changed this round (text_quality, q_sliding_distinct, q_approx_distinct,
q_rank_functions, text_bpe_apply, dedup_keep_best, text_fingerprint,
emb_vector_codes, mm_image_meta, corpus_bloom_verified_decon).

Method identical to the existing table (PLANS.md): the scratch/x10
replica set built by scale10_r5.py/r5b.py, warm session, per-query
min-of-2 timed .count() after one untimed warm run. emb_vector_codes
needs the r8 supplemental embeddings (documents-aligned id offsets are
NOT required — it reads embeddings only — but the stock x10 embeddings
are the right 10x input)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

from tools.scale10_r6 import DST, SRC, timeq  # noqa: E402

from dns_log_transformer_spark.session import get_spark  # noqa: E402

QUERIES = (
    "mm_container_census",
    "text_quality",
    "q_sliding_distinct",
    "q_approx_distinct",
    "q_rank_functions",
    "text_bpe_apply",
    "dedup_keep_best",
    "text_fingerprint",
    "emb_vector_codes",
    "mm_image_meta",
    "corpus_bloom_verified_decon",
)


def main():
    for t in ("documents", "embeddings"):
        assert os.path.exists(f"{DST}/{t}.parquet"), (
            f"x10 replica set missing {t}; run tools/scale10_r5.py and "
            "tools/scale10_r5b.py first"
        )
    spark = get_spark("scale10_r10")
    for name in QUERIES:
        t1, n1 = timeq(spark, name, SRC)
        t10, n10 = timeq(spark, name, DST)
        print(
            f"{name}: 1x {t1:.2f}s ({n1} rows) | 10x {t10:.2f}s ({n10} rows)"
            f" | ratio {t10 / t1:.1f}x"
        )


if __name__ == "__main__":
    main()
