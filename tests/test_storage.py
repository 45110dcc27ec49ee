"""Bucketing removes the join shuffle; partitioning prunes directories.

These tests assert on the PHYSICAL PLAN (not just results): the point of
the storage layout is the absence of Exchange/Sort operators and the
presence of partition pruning at scan time.
"""

from __future__ import annotations

import io
import contextlib

import pytest
from pyspark.sql import functions as F

from dns_log_transformer_spark.session import read_table
from dns_log_transformer_spark.storage import write_bucketed, write_partitioned
from dns_log_transformer_spark.storage.bucketing import drop_table
from tests.conftest import SF_SMOKE


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture()
def no_broadcast(spark):
    """Force shuffle-based joins so the test proves bucketing (not
    broadcast) removed the exchange."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_has_no_exchange(spark, tmp_path, no_broadcast):
    li = read_table(spark, SF_SMOKE, "lineitem")
    orders = read_table(spark, SF_SMOKE, "orders")
    try:
        write_bucketed(li, "li_b", ["l_orderkey"], 8, str(tmp_path / "li_b"))
        write_bucketed(orders, "ord_b", ["o_orderkey"], 8, str(tmp_path / "ord_b"))

        joined = spark.table("li_b").join(
            spark.table("ord_b"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = plan_of(joined)
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
        assert "SelectedBucketsCount: 8 out of 8" in plan

        # same join unbucketed DOES shuffle both sides (the baseline)
        base = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        assert "Exchange" in plan_of(base)

        # and the results agree
        assert joined.count() == base.count()
    finally:
        drop_table(spark, "li_b")
        drop_table(spark, "ord_b")


def test_partitioned_scan_prunes(spark, tmp_path):
    orders = read_table(spark, SF_SMOKE, "orders")
    try:
        write_partitioned(
            orders, "ord_p", ["o_orderstatus"], str(tmp_path / "ord_p")
        )
        q = spark.table("ord_p").filter(F.col("o_orderstatus") == "O")
        plan = plan_of(q)
        # partition filters appear as PartitionFilters, not data filters
        assert "PartitionFilters" in plan
        assert "o_orderstatus" in plan.split("PartitionFilters", 1)[1].split("]", 1)[0]
        expected = orders.filter(F.col("o_orderstatus") == "O").count()
        assert q.count() == expected
    finally:
        drop_table(spark, "ord_p")


def test_compact_files_reduces_count_preserves_rows(spark, tmp_path):
    """A fragmented dataset compacts to the planned file count with
    identical content; sort_cols re-clusters for min/max pruning."""
    from dns_log_transformer_spark.storage.bucketing import (
        compact_files,
        dataset_file_stats,
    )

    docs = read_table(spark, SF_SMOKE, "documents")
    src = str(tmp_path / "fragmented")
    docs.repartition(40).write.parquet(src)
    n_before, total = dataset_file_stats(spark, src)
    assert n_before == 40

    dst = str(tmp_path / "compacted")
    # target = whole dataset in ~2 files
    stats = compact_files(spark, src, dst, target_file_bytes=total // 2 + 1)
    assert stats["files_before"] == 40
    assert stats["files_after"] == stats["planned_files"] == 2
    before = {tuple(r) for r in docs.collect()}
    after = {tuple(r) for r in spark.read.parquet(dst).collect()}
    assert after == before

    # sorted variant: each output file's doc_id range is disjoint
    dst2 = str(tmp_path / "clustered")
    compact_files(
        spark, src, dst2, target_file_bytes=total // 2 + 1, sort_cols=["doc_id"]
    )
    ranges = (
        spark.read.parquet(dst2)
        .select("doc_id", F.input_file_name().alias("f"))
        .groupBy("f")
        .agg(F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi"))
        .collect()
    )
    spans = sorted((r["lo"], r["hi"]) for r in ranges)
    assert all(a[1] < b[0] for a, b in zip(spans, spans[1:]))


def test_write_training_shards(spark, tmp_path):
    """Exactly n shard dirs, one file each, all rows present exactly
    once, assignment deterministic across writes, sizes near-uniform."""
    import glob

    from dns_log_transformer_spark.storage.bucketing import write_training_shards

    docs = read_table(spark, SF_SMOKE, "documents")
    total = docs.count()
    out = str(tmp_path / "shards")
    write_training_shards(docs, out, n_shards=8)

    dirs = sorted(glob.glob(out + "/shard=*"))
    assert len(dirs) == 8
    for d in dirs:
        assert len(glob.glob(d + "/*.parquet")) == 1

    back = spark.read.parquet(out)
    assert back.count() == total
    assert sorted(r["doc_id"] for r in back.collect()) == sorted(
        r["doc_id"] for r in docs.collect()
    )
    sizes = [r["n"] for r in back.groupBy("shard").agg(F.count("*").alias("n")).collect()]
    assert min(sizes) > 0 and max(sizes) < 3 * total / 8

    write_training_shards(docs, str(tmp_path / "shards2"), n_shards=8)
    again = spark.read.parquet(str(tmp_path / "shards2"))
    a = {(r["doc_id"], r["shard"]) for r in back.collect()}
    b = {(r["doc_id"], r["shard"]) for r in again.collect()}
    assert a == b


def test_zorder_compaction_clusters_all_columns(spark, tmp_path):
    """Z-order vs lexicographic: after zorder compaction EVERY clustered
    column has per-file value locality (small min/max spans -> row-group
    pruning on any filtered column); a lexicographic sort only localizes
    the leading column."""
    import itertools

    from dns_log_transformer_spark.storage import bucketing

    src = str(tmp_path / "src")
    # two independent uniform columns
    rows = [(i, (i * 7919) % 10000, (i * 104729) % 10000) for i in range(20000)]
    spark.createDataFrame(rows, "id long, x long, y long").repartition(4).write.parquet(src)

    def file_spans(path, col):
        import glob
        import pyarrow.parquet as pq

        spans = []
        for f in glob.glob(f"{path}/part-*.parquet"):
            t = pq.read_table(f, columns=[col])
            vals = t.column(col).to_pylist()
            spans.append(max(vals) - min(vals))
        return spans

    zdst = str(tmp_path / "zorder")
    stats = bucketing.compact_files_zorder(
        spark, src, zdst, ["x", "y"], target_file_bytes=10_000, bits=8
    )
    assert stats["files_after"] >= 16

    lexdst = str(tmp_path / "lex")
    bucketing.compact_files(
        spark, src, lexdst, target_file_bytes=10_000, sort_cols=["x", "y"]
    )

    gspan = 10000
    z_x = sum(file_spans(zdst, "x")) / stats["files_after"]
    z_y = sum(file_spans(zdst, "y")) / stats["files_after"]
    lex_y = file_spans(lexdst, "y")
    lex_y_avg = sum(lex_y) / len(lex_y)
    # zorder: BOTH dims localized well below the global span (a Morton
    # range covers ~sqrt of each dim; quadrant-boundary files inflate the
    # average, hence 0.6 not sqrt(1/F))
    assert z_x < 0.6 * gspan and z_y < 0.6 * gspan, (z_x, z_y)
    # lexicographic: the trailing column stays ~global per file — the
    # pruning gap zorder exists to close
    assert lex_y_avg > 0.9 * gspan
    assert z_y < 0.7 * lex_y_avg


def test_incremental_dedup_against_bucketed_index(spark, tmp_path, no_broadcast):
    """Daily-ingest dedup: history's content index is bucketed on the
    hash, so the delta anti-join reads history IN PLACE — the plan's
    only hash Exchange is the delta side; 100 TB of history never
    re-shuffles per delta. Resubmitted content is dropped, within-delta
    dups collapse to the lowest id."""
    from dns_log_transformer_spark.storage import bucketing

    # Spark declines a one-sided bucketed scan when shuffle partitions
    # exceed the bucket count (it won't cap join parallelism at the
    # buckets); pin partitions = buckets, the sizing rule a real
    # deployment follows for index-side bucket joins
    saved_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")

    history = spark.createDataFrame(
        [(i, f"historic doc number {i}") for i in range(50)],
        "doc_id long, text string",
    )
    delta = spark.createDataFrame(
        [
            (100, "historic doc number 7"),        # resubmit -> dropped
            (101, "a genuinely new document"),
            (102, "A  genuinely   new document"),  # within-delta dup of 101
            (103, "another new one"),
        ],
        "doc_id long, text string",
    )
    try:
        bucketing.write_dedup_index(
            history, "dedup_idx", str(tmp_path / "idx"), num_buckets=8
        )
        out = bucketing.dedup_delta(spark, delta, "dedup_idx")
        assert sorted(r["doc_id"] for r in out.collect()) == [101, 103]

        from dns_log_transformer_spark.plans import physical_plan

        plan = physical_plan(bucketing.dedup_delta(spark, delta, "dedup_idx"), "simple")
        # the index scan must carry its bucket layout (no Exchange above it)
        assert "SelectedBucketsCount: 8 out of 8" in plan
        # both hash Exchanges are on the delta's tiny rows (within-delta
        # collapse + re-hash into the index's bucket layout); the index
        # relation itself is never under an Exchange (its scan carries
        # the SelectedBucketsCount marker asserted above)
        assert plan.count("Exchange hashpartitioning") <= 2
    finally:
        bucketing.drop_table(spark, "dedup_idx")
        spark.conf.set("spark.sql.shuffle.partitions", saved_parts)


def test_schema_evolution_merge_and_pruned_read(spark, tmp_path):
    """Schema evolution at the storage layer (a 100 TB table gains
    columns over its lifetime): a v2 writer appends rows with an extra
    column; mergeSchema reads see the union schema with NULLs
    backfilled for v1 rows, while a projection that only touches v1
    columns still prunes to exactly those columns (ReadSchema shows no
    v2 column — evolution must not tax old readers)."""
    from dns_log_transformer_spark.plans import physical_plan

    p = str(tmp_path / "evolving")
    v1 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, name string")
    v1.write.mode("overwrite").parquet(p)
    v2 = spark.createDataFrame(
        [(3, "c", 30)], "id long, name string, score int"
    )
    v2.write.mode("append").parquet(p)

    merged = spark.read.option("mergeSchema", "true").parquet(p)
    assert set(merged.columns) == {"id", "name", "score"}
    rows = {r["id"]: (r["name"], r["score"]) for r in merged.collect()}
    assert rows == {1: ("a", None), 2: ("b", None), 3: ("c", 30)}

    old_reader = merged.select("id", "name")
    plan = physical_plan(old_reader, "formatted")
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read_schema and "score" not in read_schema[0]


def test_dynamic_partition_pruning_reaches_fact_scan(spark, tmp_path):
    """Dynamic partition pruning — the mechanism that makes
    fact-vs-filtered-dim joins skip fact partitions at RUNTIME (at
    100 TB, the difference between scanning one year and scanning the
    decade): a fact table partitioned on the join key, joined to a dim
    whose selective filter is only known after planning, must compile a
    dynamicpruning expression INTO the fact scan's partition filters
    (fed by the reused broadcast), and the result must equal the
    statically-filtered scan."""
    from pyspark.sql import functions as F

    p = str(tmp_path / "fact_by_year")
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    (
        li.withColumn("ship_year", F.year("l_shipdate"))
        .write.mode("overwrite")
        .partitionBy("ship_year")
        .parquet(p)
    )
    fact = spark.read.parquet(p)
    years = [r["ship_year"] for r in fact.select("ship_year").distinct().collect()]
    target = sorted(years)[0]
    dim = spark.createDataFrame(
        [(y, "target" if y == target else "other") for y in years],
        "ship_year int, tag string",
    )
    joined = fact.join(dim, "ship_year").filter(F.col("tag") == "target")

    from dns_log_transformer_spark.plans import physical_plan

    plan = physical_plan(joined, "formatted")
    assert "dynamicpruning" in plan.lower(), plan[:2000]

    got = joined.count()
    want = fact.filter(F.col("ship_year") == target).count()
    assert got == want > 0


def test_parquet_aggregate_pushdown_answers_from_footers(spark):
    """Parquet aggregate pushdown (DSv2): COUNT/MIN/MAX over a bare
    scan are answered from file-footer statistics — at 100 TB the
    difference between a metadata read and a full-column scan. Pinned:
    the BatchScan carries the pushed aggregate, and the values equal
    the conventional aggregation's."""
    from pyspark.sql import functions as F

    saved_v1 = spark.conf.get("spark.sql.sources.useV1SourceList")
    try:
        spark.conf.set("spark.sql.parquet.aggregatePushdown", "true")
        spark.conf.set("spark.sql.sources.useV1SourceList", "")
        df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        agg = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.min("l_quantity").alias("lo"),
            F.max("l_quantity").alias("hi"),
        )
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "PushedAggregation" in plan
        got = agg.collect()[0]
    finally:
        spark.conf.set("spark.sql.sources.useV1SourceList", saved_v1)
        spark.conf.set("spark.sql.parquet.aggregatePushdown", "false")
    want = (
        spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("l_quantity").alias("lo"),
            F.max("l_quantity").alias("hi"),
        )
        .collect()[0]
    )
    assert (got["n"], got["lo"], got["hi"]) == (want["n"], want["lo"], want["hi"])
