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
