"""Shared fixtures: one SparkSession per test session (JVM startup is
~15 s — never per-test), plus fixture-table paths."""

from __future__ import annotations

import os

import pytest

from dns_log_transformer_spark.session import get_spark, load_tables

SF_SMOKE = os.environ.get("SPARK_GRAFT_SMOKE_DIR", "/root/testdata/sf0.001")
SF_ORACLE = os.environ.get("SPARK_GRAFT_ORACLE_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("dns_log_transformer_spark-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def tables(spark):
    """sf0.001 fixture tables registered as temp views."""
    return load_tables(spark, SF_SMOKE)
