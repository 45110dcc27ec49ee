"""10x input-scaling measurement for the round-5 additions (PLANS.md
method: distinct-content replication, warm session, .count() of the full
result, min of 2 timed passes). Run tools/scale10_r5.py FIRST — it
builds the base scratch/x10 replica this script extends."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from dns_log_transformer_spark.operators.caching import release_all
from dns_log_transformer_spark.queries import ALL_QUERIES
from dns_log_transformer_spark.session import get_spark, read_table

SRC = "/root/testdata/sf0.1"
DST = "/root/repo/scratch/x10"


def build(spark):
    # replace the 1x symlinks with true 10x replicas for the tables the
    # round-5 queries scan
    for t in ("events", "lineitem", "embeddings"):
        p = f"{DST}/{t}.parquet"
        if os.path.islink(p):
            os.unlink(p)
        elif os.path.isdir(p):
            continue
    if not os.path.isdir(f"{DST}/events.parquet"):
        ev = read_table(spark, SRC, "events")
        out = None
        for r in range(10):
            d = ev.select(
                (F.col("event_id") + r * 100_000_000).alias("event_id"),
                "ts",
                (F.col("user_id") + r * 1_000_000).alias("user_id"),
                "event_type",
                "value",
                "props",
            )
            out = d if out is None else out.unionAll(d)
        out.write.mode("overwrite").parquet(f"{DST}/events.parquet")
    if not os.path.isdir(f"{DST}/lineitem.parquet"):
        li = spark.read.parquet(f"{SRC}/lineitem.parquet")
        out = None
        for r in range(10):
            d = li.select(
                (F.col("l_orderkey") + r * 100_000_000).alias("l_orderkey"),
                "l_partkey",
                (F.col("l_suppkey") + r * 10_000).alias("l_suppkey"),
                "l_linenumber",
                "l_quantity",
                "l_extendedprice",
                "l_discount",
                "l_tax",
                "l_returnflag",
                "l_linestatus",
                "l_shipdate",
            )
            out = d if out is None else out.unionAll(d)
        out.write.mode("overwrite").parquet(f"{DST}/lineitem.parquet")
    if not os.path.isdir(f"{DST}/embeddings.parquet"):
        emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
        out = None
        for r in range(10):
            rolled = (
                F.concat(
                    F.slice("embedding", r + 1, 64 - r),
                    F.slice("embedding", 1, r),
                )
                if r
                else F.col("embedding")
            )
            d = emb.select(
                (F.col("vec_id") + r * 1_000_000).alias("vec_id"),
                rolled.alias("embedding"),
                "label",
            )
            out = d if out is None else out.unionAll(d)
        out.write.mode("overwrite").parquet(f"{DST}/embeddings.parquet")


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
    spark = get_spark("scale10b")
    build(spark)
    for name in (
        "cdc_upsert_merge",
        "cdc_scd2_intervals",
        "q_cidr_enrich",
        "q_ewma_anomaly",
        "q_triangle_suppliers",
        "emb_vector_codes",
        "sim_int8_topk",
        "text_trigram_familiarity",
        "corpus_snapshot_diff",
        "dedup_keep_best",
    ):
        t1, n1 = timeq(spark, name, SRC)
        t10, n10 = timeq(spark, name, DST)
        print(
            f"RESULT {name}: 1x {t1:.2f}s ({n1} rows) | 10x {t10:.2f}s "
            f"({n10} rows) | ratio {t10 / t1:.1f}x"
        )


if __name__ == "__main__":
    main()
