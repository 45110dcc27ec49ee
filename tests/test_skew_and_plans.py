"""Salted aggregation/join equivalence + plan-helper sanity."""

from __future__ import annotations

from pyspark.sql import functions as F

from dns_log_transformer_spark import plans
from dns_log_transformer_spark.operators import skew
from dns_log_transformer_spark.session import read_table
from tests.conftest import SF_SMOKE


def test_salted_count_matches_plain(spark):
    li = read_table(spark, SF_SMOKE, "lineitem")
    plain = {
        (r["l_returnflag"],): r["n"]
        for r in li.groupBy("l_returnflag").agg(F.count("*").alias("n")).collect()
    }
    salted = {
        (r["l_returnflag"],): r["n"]
        for r in skew.salted_count(li, ["l_returnflag"], n_salts=8).collect()
    }
    assert salted == plain


def test_salted_sum_matches_plain(spark):
    li = read_table(spark, SF_SMOKE, "lineitem")
    plain = {
        r["l_returnflag"]: round(r["t"], 2)
        for r in li.groupBy("l_returnflag")
        .agg(F.sum("l_quantity").alias("t"))
        .collect()
    }
    salted = {
        r["l_returnflag"]: round(r["total"], 2)
        for r in skew.salted_sum(li, ["l_returnflag"], "l_quantity", n_salts=8).collect()
    }
    assert salted == plain


def test_salt_join_matches_plain(spark):
    li = read_table(spark, SF_SMOKE, "lineitem").select("l_orderkey", "l_quantity")
    orders = read_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    plain = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .count()
    )
    salted = (
        skew.salt_join(
            li.withColumnRenamed("l_orderkey", "k"),
            orders.withColumnRenamed("o_orderkey", "k"),
            "k",
            n_salts=4,
        )
        .groupBy("o_orderpriority")
        .count()
    )
    assert {
        (r["o_orderpriority"], r["count"]) for r in plain.collect()
    } == {(r["o_orderpriority"], r["count"]) for r in salted.collect()}


def test_plan_helpers_report_pushdown_and_broadcast(spark):
    li = read_table(spark, SF_SMOKE, "lineitem")
    part = read_table(spark, SF_SMOKE, "part")
    q = li.filter(F.col("l_quantity") < 10).join(
        F.broadcast(part), li.l_partkey == part.p_partkey
    )
    plans.assert_filter_pushed(q, "l_quantity")
    assert plans.has_broadcast_join(q)
    assert not plans.has_sort_merge_join(q)
    assert any("l_quantity" in s for s in plans.read_schemas(q))


def test_salt_join_rejects_small_side_preserving_how(spark):
    """right/full joins would emit each unmatched small-side row once per
    salt replica — must be refused, not silently duplicated."""
    import pytest

    df = spark.range(2).withColumnRenamed("id", "k")
    for how in ("right", "full_outer", "full"):
        with pytest.raises(ValueError, match="inner/left"):
            skew.salt_join(df, df, "k", how=how)
