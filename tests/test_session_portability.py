"""Guard: the engine must work on a SparkSession it did NOT build.

Round-1 regression class: the driver's harness hands us its own session,
built without ``get_spark()``'s confs (notably
``spark.sql.legacy.parquet.nanosAsLong`` and the UTC session timezone).
Every query touching events.parquet (TIMESTAMP(NANOS)) died with
PARQUET_TYPE_ILLEGAL. ``read_table`` now sets the confs at runtime.

One JVM can't host two sessions with independent *static* confs, but both
confs involved are runtime-settable, so unsetting them on the shared
session reproduces the foreign-session condition exactly.
"""

from __future__ import annotations

import contextlib

import pytest

from dns_log_transformer_spark.session import read_table
from tests.conftest import SF_SMOKE


@contextlib.contextmanager
def _foreign_session(spark):
    """Strip the engine confs read_table depends on, restoring after."""
    saved = {}
    for key, default in [
        ("spark.sql.legacy.parquet.nanosAsLong", "false"),
        ("spark.sql.session.timeZone", "America/New_York"),
    ]:
        saved[key] = spark.conf.get(key, None)
        spark.conf.set(key, default)
    try:
        yield spark
    finally:
        for key, val in saved.items():
            if val is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, val)


def test_read_events_on_foreign_session(spark):
    with _foreign_session(spark) as s:
        df = read_table(s, SF_SMOKE, "events")
        assert dict(df.dtypes)["ts"] == "timestamp"
        assert df.limit(5).count() > 0
        # read_table must have healed the confs it needs
        assert s.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "true"
        assert s.conf.get("spark.sql.session.timeZone") == "UTC"


def test_entry_on_foreign_session(spark):
    import __spark_entry__ as e

    with _foreign_session(spark) as s:
        df = e.entry(s)
        rows = df.limit(10).collect()
        assert len(rows) > 0


def test_event_query_values_are_utc_on_foreign_session(spark):
    """Event-time bucketing must be UTC even if the caller's tz is not."""
    from dns_log_transformer_spark.queries import ALL_QUERIES

    q = ALL_QUERIES["q_event_time_buckets"].fn
    baseline = {tuple(r) for r in q(spark, SF_SMOKE).collect()}
    with _foreign_session(spark) as s:
        foreign = {tuple(r) for r in q(s, SF_SMOKE).collect()}
    assert foreign == baseline


def test_non_events_tables_unaffected(spark):
    with _foreign_session(spark) as s:
        df = read_table(s, SF_SMOKE, "lineitem")
        assert df.limit(1).count() == 1


def test_representative_queries_survive_foreign_session(spark):
    """One query per surface family runs identically on a session built
    without ANY engine confs — the driver's harness condition. Catches
    conf dependencies beyond the events/nanos class (timezone-sensitive
    date math, corpus hashing, pandas-UDF ops)."""
    from dns_log_transformer_spark.queries import ALL_QUERIES

    names = [
        "q1_pricing_summary",          # agg
        "q_date_functions",            # tz-sensitive date math
        "q_window_native",             # events + event-time window
        "dns_bind9_lines",             # full DNS pipeline
        "corpus_split",                # hash-derived corpus op
        "corpus_pack_sequences",       # applyInPandas op
        "emb_vector_codes",            # pandas-UDF embedding reps (lsh/int8/pq)
        "emb_kmeans",                  # iterative collect-per-round op
        "q_variant_props",             # VariantType extraction
        "q_profile_columns",           # per-column profiling aggs
    ]
    for name in names:
        q = ALL_QUERIES[name].fn
        baseline = {tuple(r) for r in q(spark, SF_SMOKE).collect()}
        with _foreign_session(spark) as s:
            foreign = {tuple(r) for r in q(s, SF_SMOKE).collect()}
        assert foreign == baseline, f"{name} diverges on a foreign session"
