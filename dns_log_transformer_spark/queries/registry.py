"""Query registry shared by __spark_entry__, tests and bench."""

from __future__ import annotations

import os
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB-runnable ANSI SQL, or None (rows-only check)
    doc: str = ""


ALL_QUERIES: dict[str, Query] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: register a (spark, sf_dir) -> DataFrame query."""

    def deco(fn):
        ALL_QUERIES[name] = Query(fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table (lazy parquet scan; Catalyst prunes/pushes)."""
    from dns_log_transformer_spark.session import read_table

    return read_table(spark, sf_dir, name)
