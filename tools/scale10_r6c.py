"""10x input-scaling measurement for the last round-6 PLANS.md rows:
dedup_sorted_neighborhood, text_tfidf_cosine_rerank, q_key_skew_report,
q_ri_audit. Method identical to the existing table: distinct-content
x10 replicas (tools/scale10_r5.py + r5b.py builders), warm session,
per-query min-of-2 timed .count() after one untimed warm run."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from dns_log_transformer_spark.session import get_spark
from tools.scale10_r5 import build as build_base
from tools.scale10_r5b import build as build_big
from tools.scale10_r6 import DST, SRC, timeq

QUERIES = (
    "dedup_sorted_neighborhood",
    "text_tfidf_cosine_rerank",
    "q_key_skew_report",
    "q_ri_audit",
    "q_snapshot_drift",
    "q_join_size_estimate",
    "cdc_time_travel",
    "q_event_paths",
    "q_copurchase_pairs",
    "q_decayed_popularity",
    "q_cohort_retention",
    "q_target_encode_lofo",
    "q_ab_test_ztest",
    "q_link_prediction_aa",
    "q_rfm_segments",
    "text_bpe_apply",
)


def main():
    spark = get_spark("scale10_r6c")
    build_base(spark)
    build_big(spark)
    for name in QUERIES:
        t1, n1 = timeq(spark, name, SRC)
        t10, n10 = timeq(spark, name, DST)
        print(
            f"{name}: 1x {t1:.2f}s ({n1} rows) | 10x {t10:.2f}s ({n10} rows)"
            f" | ratio {t10 / t1:.1f}x"
        )


if __name__ == "__main__":
    main()
