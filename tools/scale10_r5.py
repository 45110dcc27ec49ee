"""10x input-scaling measurement for the two PLANS.md rows still missing
(round-4 verdict task 8): q_argmax_orders and corpus_prepare_funnel.

Method identical to the existing table (PLANS.md:140-144): replicate
sf0.1 inputs 10x with genuinely DISTINCT content (per-replica vowel
rotation of document text, id offsets, per-replica source suffix), warm
session, .count() on the full result.
"""

from __future__ import annotations

import os
import shutil
import time

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from dns_log_transformer_spark.operators.caching import release_all
from dns_log_transformer_spark.queries import ALL_QUERIES
from dns_log_transformer_spark.session import get_spark

SRC = "/root/testdata/sf0.1"
DST = "/root/repo/scratch/x10"

VOWELS = "aeiou"


def build(spark):
    if os.path.isdir(DST) and os.path.exists(f"{DST}/orders.parquet"):
        return
    os.makedirs(DST, exist_ok=True)
    # replicate documents with distinct text per replica: rotate vowels
    # by r positions (translate), offset ids, suffix sources
    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    reps = []
    for r in range(10):
        rot = VOWELS[r % 5 :] + VOWELS[: r % 5]
        reps.append(
            docs.select(
                (F.col("doc_id") + r * 10_000_000).alias("doc_id"),
                F.translate("text", VOWELS, rot).alias("text"),
                "lang",
                F.concat("source", F.lit(f"_r{r}")).alias("source"),
                "n_chars",
            )
        )
    out = reps[0]
    for d in reps[1:]:
        out = out.unionAll(d)
    out.write.mode("overwrite").parquet(f"{DST}/documents.parquet")

    orders = spark.read.parquet(f"{SRC}/orders.parquet")
    reps = []
    for r in range(10):
        reps.append(
            orders.select(
                (F.col("o_orderkey") + r * 100_000_000).alias("o_orderkey"),
                (F.col("o_custkey") + r * 10_000_000).alias("o_custkey"),
                "o_orderstatus",
                F.round(F.col("o_totalprice") + r * 0.07, 2).alias("o_totalprice"),
                "o_orderdate",
                "o_orderpriority",
            )
        )
    out = reps[0]
    for d in reps[1:]:
        out = out.unionAll(d)
    out.write.mode("overwrite").parquet(f"{DST}/orders.parquet")

    for t in (
        "customer",
        "supplier",
        "part",
        "lineitem",
        "events",
        "nation",
        "region",
        "embeddings",
    ):
        os.symlink(f"{SRC}/{t}.parquet", f"{DST}/{t}.parquet")


def timeq(spark, name, sf_dir):
    q = ALL_QUERIES[name]
    # warm once (untimed) so codegen/worker-pool startup doesn't bias
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
    spark = get_spark("scale10")
    build(spark)
    for name in ("q_argmax_orders", "corpus_prepare_funnel"):
        t1, n1 = timeq(spark, name, SRC)
        t10, n10 = timeq(spark, name, DST)
        print(
            f"{name}: 1x {t1:.2f}s ({n1} rows) | 10x {t10:.2f}s ({n10} rows) "
            f"| ratio {t10 / t1:.1f}x"
        )


if __name__ == "__main__":
    main()
