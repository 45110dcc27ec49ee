"""The batch analytics query surface.

Each query is registered as ``name -> Query(fn, oracle)`` where ``fn``
is ``(SparkSession, sf_dir) -> DataFrame`` and ``oracle`` is the ANSI-SQL
equivalent DuckDB runs on the same parquet tables (None for ops SQL can't
express — the driver then records a weaker rows-only check).

Column-name discipline: every computed column is aliased identically in
the DataFrame code and the oracle SQL — the correctness harness sorts
columns by name before hashing values.
"""

from dns_log_transformer_spark.queries.registry import ALL_QUERIES, Query, register

# importing the modules populates the registry
from dns_log_transformer_spark.queries import analytics  # noqa: E402,F401
from dns_log_transformer_spark.queries import dns_pipeline  # noqa: E402,F401
from dns_log_transformer_spark.queries import llm_ops  # noqa: E402,F401

__all__ = ["ALL_QUERIES", "Query", "register"]
