"""Data-profiling operator: per-column quality stats in one declarative
pass per column.

A 100 TB ingest needs a cheap answer to "which columns are broken" before
any modeling — null rates, cardinality, value ranges. Reference analog:
none (the reference logs-and-drops per record, app/app.py:255-263); this
is the engine-level upgrade of that visibility.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """(col_name, n_nulls, n_distinct, min_str, max_str) per column.

    Shape at scale: one partial+final aggregate PER COLUMN, unioned —
    each scan is pruned to that single column (parquet columnar IO), and
    there is no multi-distinct Expand (which would multiply every input
    row by len(cols) — the q_distinct_and_percentiles lesson). min/max
    are cast to string AFTER aggregating so one schema fits all column
    types; distinct counts are exact (COUNT DISTINCT, nulls excluded).
    """
    parts = []
    for c in cols:
        parts.append(
            df.select(F.col(c)).agg(
                F.sum(F.col(c).isNull().cast("long")).cast("long").alias("n_nulls"),
                F.countDistinct(F.col(c)).cast("long").alias("n_distinct"),
                F.min(F.col(c)).cast("string").alias("min_str"),
                F.max(F.col(c)).cast("string").alias("max_str"),
            ).select(F.lit(c).alias("col_name"), "*")
        )
    return reduce(DataFrame.unionAll, parts)
