"""As-of and bucketized range join operators vs naive reference joins."""

from __future__ import annotations

from pyspark.sql import functions as F

from dns_log_transformer_spark.operators.joins import asof_join, range_join_buckets


def test_asof_join_strict(spark):
    quotes = spark.createDataFrame(
        [
            ("A", 10, 1.0),
            ("A", 20, 2.0),
            ("A", 30, 3.0),
            ("B", 15, 9.0),
        ],
        ["sym", "ts", "px"],
    )
    trades = spark.createDataFrame(
        [
            ("A", 5),    # before any quote -> null
            ("A", 20),   # strict: quote at 20 NOT visible -> px 1.0
            ("A", 25),   # -> px 2.0
            ("A", 99),   # -> px 3.0
            ("B", 16),   # -> px 9.0
            ("C", 50),   # no quotes for key -> null
        ],
        ["sym", "ts"],
    )
    out = asof_join(trades, quotes, on="sym", left_ts="ts", right_ts="ts", strict=True)
    got = {(r["sym"], r["ts"]): r["px"] for r in out.collect()}
    assert got == {
        ("A", 5): None,
        ("A", 20): 1.0,
        ("A", 25): 2.0,
        ("A", 99): 3.0,
        ("B", 16): 9.0,
        ("C", 50): None,
    }


def test_asof_join_at_or_before(spark):
    quotes = spark.createDataFrame([("A", 10, 1.0), ("A", 20, 2.0)], ["sym", "ts", "px"])
    trades = spark.createDataFrame([("A", 20)], ["sym", "ts"])
    out = asof_join(trades, quotes, on="sym", strict=False)
    assert out.collect()[0]["px"] == 2.0


def test_range_join_matches_naive(spark):
    import random

    rng = random.Random(7)
    points = spark.createDataFrame(
        [(i, rng.randint(0, 1000)) for i in range(300)], ["pid", "x"]
    )
    intervals = spark.createDataFrame(
        [
            (j, s, s + rng.randint(1, 80))
            for j, s in ((j, rng.randint(0, 980)) for j in range(60))
        ],
        ["iid", "lo", "hi"],
    )
    fast = range_join_buckets(points, intervals, "x", "lo", "hi", bucket_width=64)
    naive = points.join(
        intervals, (F.col("x") >= F.col("lo")) & (F.col("x") < F.col("hi"))
    )
    a = {(r["pid"], r["iid"]) for r in fast.collect()}
    b = {(r["pid"], r["iid"]) for r in naive.collect()}
    assert a == b
    assert len(a) > 0


def test_range_join_is_equi_join_in_plan(spark):
    from dns_log_transformer_spark.plans import physical_plan

    points = spark.range(100).select(F.col("id").alias("pid"), (F.col("id") * 7 % 500).alias("x"))
    intervals = spark.range(20).select(
        F.col("id").alias("iid"), (F.col("id") * 25).alias("lo"), (F.col("id") * 25 + 30).alias("hi")
    )
    fast = range_join_buckets(points, intervals, "x", "lo", "hi", bucket_width=32)
    plan = physical_plan(fast, "simple")
    assert "NestedLoop" not in plan  # hash join on the bucket key, not O(n*m)


def test_range_join_ignores_inverted_intervals(spark):
    """end <= start must contribute nothing — without the pre-filter,
    sequence(start_bucket, end_bucket) DESCENDS and a dirty interval with
    end << start explodes into an unbounded run of spurious buckets."""
    points = spark.createDataFrame([(1, 50)], ["pid", "x"])
    intervals = spark.createDataFrame(
        [(1, 0, 100), (2, 100, 100), (3, 1_000_000, 0)], ["iid", "lo", "hi"]
    )
    out = range_join_buckets(points, intervals, "x", "lo", "hi", bucket_width=10)
    assert {(r["pid"], r["iid"]) for r in out.collect()} == {(1, 1)}
