"""File-format coverage: the engine reads/writes parquet, ORC, JSON, CSV
with schema preservation — round-trip identity per format (the reference
has no file formats at all; this is the analytics-surface requirement)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dns_log_transformer_spark.session import read_table
from tests.conftest import SF_SMOKE


@pytest.mark.parametrize("fmt", ["parquet", "orc", "json", "csv"])
def test_round_trip(spark, tmp_path, fmt):
    src = read_table(spark, SF_SMOKE, "orders").limit(500)
    path = str(tmp_path / f"orders_{fmt}")
    writer = src.write.mode("overwrite").format(fmt)
    if fmt == "csv":
        writer = writer.option("header", True)
    writer.save(path)

    reader = spark.read.format(fmt)
    if fmt in ("json", "csv"):
        # schema-on-read sources get the declared schema (never inferred
        # in the engine: inference is an extra full scan and can drift)
        reader = reader.schema(src.schema)
    if fmt == "csv":
        reader = reader.option("header", True)
    back = reader.load(path)

    assert back.schema == src.schema
    assert back.count() == 500
    a = {tuple(r) for r in src.select("o_orderkey", "o_totalprice").collect()}
    b = {tuple(r) for r in back.select("o_orderkey", "o_totalprice").collect()}
    assert a == b
