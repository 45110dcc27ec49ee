"""10x input-scaling measurement for the round-8 + round-9 PLANS.md
rows (the discipline VERDICT r8 flagged as broken: the 8 round-8
queries shipped with no measured 10x ratio).

Method identical to the existing table (PLANS.md): the scratch/x10
replica set built by scale10_r5.py/r5b.py (distinct content per replica
— vowel-rotated documents, rolled embeddings, offset ids), warm
session, per-query min-of-2 timed .count() after one untimed warm run.

Two supplemental replicas are built under scratch/x10r8/ (symlinking
the rest of scratch/x10):

- ``embeddings.parquet`` — the stock x10 embeddings use 1e6 id offsets
  while documents use 1e7, so the emb_source_drift vec->doc join would
  silently collapse to replica 0; ids are remapped to the documents'
  offsets (k*1e7 + j), preserving content.
- ``part.parquet`` — part is a dim symlink in the stock set (1x), but
  q_skyline_pareto's first aggregation scans it; 10 replicas with
  offset p_partkey make the scan measurement real (skyline output is
  unchanged: replicas repeat the same (price, size) points).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

from tools.scale10_r6 import DST, SRC, timeq  # noqa: E402

from dns_log_transformer_spark.session import get_spark  # noqa: E402

DST_R8 = "/root/repo/scratch/x10r8"

#: query names; queries in NEEDS_R8_DIR below run their 10x pass
#: against the supplemental-replica dir, everything else against the
#: stock x10 set.
QUERIES = (
    # round 8
    "dedup_incremental_delta",
    "text_ngram_novelty",
    "corpus_prune_curve",
    "q_zorder_layout",
    "q_concurrent_intervals",
    "q_sliding_distinct",
    "q_skyline_pareto",
    "emb_dim_stats",
    # round 9
    "emb_source_drift",
    "mm_format_census",
    "emb_coverage_audit",
)
NEEDS_R8_DIR = {"emb_source_drift", "q_skyline_pareto", "emb_coverage_audit"}


def build_supplemental(spark) -> None:
    os.makedirs(DST_R8, exist_ok=True)
    for t in (
        "region nation customer supplier orders lineitem events documents"
    ).split():
        link = os.path.join(DST_R8, f"{t}.parquet")
        if not os.path.exists(link):
            os.symlink(os.path.join(DST, f"{t}.parquet"), link)
    emb_out = os.path.join(DST_R8, "embeddings.parquet")
    if not os.path.exists(emb_out):
        from pyspark.sql import functions as F

        emb = spark.read.parquet(os.path.join(DST, "embeddings.parquet"))
        emb.select(
            (
                F.floor(F.col("vec_id") / 1_000_000) * 10_000_000
                + F.col("vec_id") % 1_000_000
            ).alias("vec_id"),
            "embedding",
            "label",
        ).write.parquet(emb_out)
    part_out = os.path.join(DST_R8, "part.parquet")
    if not os.path.exists(part_out):
        from functools import reduce

        from pyspark.sql import functions as F

        part = spark.read.parquet(os.path.join(SRC, "part.parquet"))
        reps = [
            part.withColumn(
                "p_partkey", F.col("p_partkey") + 10_000_000 * k
            )
            for k in range(10)
        ]
        reduce(lambda a, b: a.unionByName(b), reps).write.parquet(part_out)


def main():
    for t in ("documents", "embeddings"):
        assert os.path.exists(f"{DST}/{t}.parquet"), (
            f"x10 replica set missing {t}; run tools/scale10_r5.py and "
            "tools/scale10_r5b.py first"
        )
    spark = get_spark("scale10_r8")
    build_supplemental(spark)
    for name in QUERIES:
        dst = DST_R8 if name in NEEDS_R8_DIR else DST
        t1, n1 = timeq(spark, name, SRC)
        t10, n10 = timeq(spark, name, dst)
        print(
            f"{name}: 1x {t1:.2f}s ({n1} rows) | 10x {t10:.2f}s ({n10} rows)"
            f" | ratio {t10 / t1:.1f}x"
        )


if __name__ == "__main__":
    main()
