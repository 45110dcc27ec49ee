"""The reference DNS pipeline as oracle-checkable batch queries.

The golden byte-level tests live in tests/test_transforms.py; these
entries additionally run the *same transform code* over the driver's
``events`` fixture (deterministically mapped to Route53-shaped records)
so the DuckDB oracle can verify the full format -> explode fan-out at
sf scale. Citations: templates /root/reference/app/app.py:146-173,
fan-out :163-171, client id :154.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dns_log_transformer_spark.queries.registry import register, table
from dns_log_transformer_spark.schemas import ANSWER_SCHEMA
from dns_log_transformer_spark.transforms import to_bind9_lines, to_microsoft_dns_lines

#: Deterministic events -> DNS-record mapping shared by the Spark side
#: and (re-expressed in SQL) the DuckDB oracle. n_answers = event_id % 3
#: exercises the 0-answer default-'A' path and the 1->1+N fan-out.


def _dns_records_from_events(ev: DataFrame) -> DataFrame:
    # The fixture events table scans as ONE parquet split (single row
    # group), serializing the heavy per-row formatting below behind one
    # task (r15 profile: the scan stage held ~90% of the query's
    # executor time). rebalance_for_fanout is scale-adaptive: it
    # round-robins the SLIM 4-column projection to core count only when
    # the scan is under-split; at warehouse scale (well-split scans) it
    # is a no-op, so no shuffle is added where the data is already
    # parallel (guide §2.5 input-skew / CLAUDE.md rule 7).
    from dns_log_transformer_spark.operators.text import rebalance_for_fanout

    ev = rebalance_for_fanout(ev.select("event_id", "ts", "user_id", "event_type"))
    n_ans = (F.col("event_id") % 3).cast("int")
    answers = F.when(
        n_ans > 0,
        F.transform(
            F.sequence(F.lit(0), n_ans - 1),
            lambda i: F.struct(
                F.concat(F.lit("93.184.216."), ((F.col("event_id") + i) % 256).cast("string")).alias("Rdata"),
                F.lit("A").alias("Type"),
            ),
        ),
    ).otherwise(F.array().cast(T.ArrayType(ANSWER_SCHEMA)))
    return ev.select(
        "event_id",
        F.date_trunc("second", F.col("ts")).alias("query_ts"),
        F.concat(F.lit("vpc-"), F.col("user_id").cast("string")).alias("vpc_id"),
        F.concat(F.col("event_type"), F.lit(".example.com.")).alias("query_name"),
        F.concat(F.lit("10.0.0."), F.col("user_id").cast("string")).alias("srcaddr"),
        (F.col("event_id") % 65536).cast("string").alias("srcport"),
        F.format_string("@0x%012x", F.col("event_id")).alias("client_hex"),
        answers.alias("answers"),
        F.col("event_type").alias("transport"),  # unused by bind9 path
        F.lit("NOERROR").alias("rcode"),
    )


#: Shared prefix of both line kinds, as DuckDB SQL (mirrors app.py:160,169).
_SQL_PREFIX = """
      strftime(qts, '%b %d %H:%M:%S') || ' ' || vpc_id || ' route53resolver: '
      || strftime(qts, '%d-%b-%Y %H:%M:%S') || '.000 client ' || hex || ' '
      || srcaddr || '#' || srcport || ' (' || qname || '): '
"""

_SQL_RECS = """
    WITH recs AS (
      SELECT event_id,
             date_trunc('second', ts)                          AS qts,
             'vpc-' || CAST(user_id AS VARCHAR)                AS vpc_id,
             event_type || '.example.com.'                     AS qname,
             '10.0.0.' || CAST(user_id AS VARCHAR)             AS srcaddr,
             CAST(event_id % 65536 AS VARCHAR)                 AS srcport,
             '@0x' || printf('%012x', event_id)                AS hex,
             CAST(event_id % 3 AS INT)                         AS n_ans,
             event_type                                        AS transport
      FROM events
    )
"""


@register(
    "dns_bind9_lines",
    oracle=_SQL_RECS
    + f"""
    , q AS (
      SELECT event_id, 0 AS line_no, 'query' AS kind,
             {_SQL_PREFIX} || 'query: ' || qname || ' IN A + (127.0.0.1)' AS line
      FROM recs
      UNION ALL
      SELECT event_id, CAST(i + 1 AS INT), 'reply',
             {_SQL_PREFIX} || 'reply: ' || qname || ' is 93.184.216.'
               || CAST((event_id + i) % 256 AS VARCHAR)
      FROM recs, UNNEST(range(CAST(n_ans AS BIGINT))) AS t(i)
    )
    SELECT event_id, line_no, kind, line FROM q
    """,
)
def dns_bind9_lines(spark: SparkSession, sf: str) -> DataFrame:
    """Full BIND9 formatting + 1->1+N explode over events-derived DNS
    records — the reference's core transform (app/app.py:146-173) at
    fixture scale, deterministic client ids for the oracle."""
    ev = table(spark, sf, "events")
    recs = _dns_records_from_events(ev)
    return to_bind9_lines(recs, keep=["event_id"])


@register(
    "dns_ms_lines",
    oracle=_SQL_RECS
    + """
    SELECT event_id,
           strftime(qts, '%d/%m/%Y %H:%M:%S')
           || ' 0D2C PACKET  0000000001ED00C0 ' || transport || ' Snd '
           || srcaddr || ' ' || srcport || ' R Q [NOERROR A DR NOERROR] A'
           || ' (' || CAST(LENGTH(qname) AS VARCHAR) || ')' || qname || '(0)' AS line
    FROM recs
    """,
)
def dns_ms_lines(spark: SparkSession, sf: str) -> DataFrame:
    """Microsoft DNS debug format (reference dead code, app/app.py:126-144)
    over the same deterministic records."""
    ev = table(spark, sf, "events")
    recs = _dns_records_from_events(ev)
    return to_microsoft_dns_lines(recs, keep=["event_id"])


@register(
    "dns_quarantine_stats",
    oracle="""
    SELECT CASE event_id % 5
             WHEN 0 THEN 'ok'
             WHEN 1 THEN 'missing_or_invalid:vpc_id'
             WHEN 2 THEN 'bad_query_timestamp'
             WHEN 3 THEN 'answer_missing_rdata_or_type'
             WHEN 4 THEN 'decode_error'
           END AS outcome,
           COUNT(*) AS n
    FROM events GROUP BY 1
    """,
)
def dns_quarantine_stats(spark: SparkSession, sf: str) -> DataFrame:
    """The validation/quarantine path (P5/P7, app/app.py:175-217,255-263)
    at fixture scale: records are deterministically corrupted by
    event_id % 5 (valid / missing field / bad timestamp / answer without
    Type / un-decodable base64), serialized to real base64 JSON payloads,
    and pushed through the actual decode -> validate split. The oracle
    states the expected classification; a mismatch means the pipeline
    mis-routed a record."""
    from dns_log_transformer_spark.operators.text import rebalance_for_fanout
    from dns_log_transformer_spark.transforms import decode_records

    # same under-split-scan fix as _dns_records_from_events: the JSON
    # serialize -> base64 -> decode -> validate chain is the pipeline's
    # per-row-heaviest path and must not run behind one scan task
    ev = rebalance_for_fanout(
        table(spark, sf, "events").select("event_id", "ts", "user_id", "event_type")
    )
    m = F.col("event_id") % 5
    rec = F.struct(
        F.lit("1.100000").alias("version"),
        F.lit("123456789012").alias("account_id"),
        F.lit("us-east-1").alias("region"),
        F.when(m != 1, F.concat(F.lit("vpc-"), F.col("user_id").cast("string"))).alias(
            "vpc_id"
        ),
        F.when(
            m == 2, F.lit("not-a-timestamp")
        ).otherwise(
            F.date_format(F.col("ts"), "yyyy-MM-dd'T'HH:mm:ss'Z'")
        ).alias("query_timestamp"),
        F.concat(F.col("event_type"), F.lit(".example.com.")).alias("query_name"),
        F.lit("A").alias("query_type"),
        F.lit("IN").alias("query_class"),
        F.lit("NOERROR").alias("rcode"),
        F.when(
            m == 3,
            F.array(F.struct(F.lit("1.2.3.4").alias("Rdata"), F.lit(None).cast("string").alias("Type"))),
        ).otherwise(
            F.array(F.struct(F.lit("93.184.216.34").alias("Rdata"), F.lit("A").alias("Type")))
        ).alias("answers"),
        F.lit("10.0.0.1").alias("srcaddr"),
        F.lit("53123").alias("srcport"),
        F.lit("UDP").alias("transport"),
        F.struct(F.lit("i-0abcd").alias("instance")).alias("srcids"),
    )
    payload = F.when(m == 4, F.lit("!!!not-base64!!!")).otherwise(
        F.base64(F.encode(F.to_json(rec, {"ignoreNullFields": "true"}), "UTF-8"))
    )
    from dns_log_transformer_spark.transforms.validate import (
        dns_validity_predicate,
        reject_reason,
    )

    records = ev.select(F.col("event_id"), payload.alias("data"))
    decoded = decode_records(records)
    # single-pass classification (the two-output split_valid_invalid is
    # byte-level covered by tests/test_transforms.py + streaming tests;
    # a stats query doesn't need two scans of the source)
    dns = F.col("dns")
    outcome = F.when(dns_validity_predicate(dns), F.lit("ok")).otherwise(
        reject_reason(dns, F.col("decoded"))
    )
    return decoded.select(outcome.alias("outcome")).groupBy("outcome").agg(
        F.count("*").alias("n")
    )


@register(
    "dns_reply_stats",
    oracle=_SQL_RECS
    + """
    SELECT vpc_id,
           COUNT(*)                       AS n_records,
           CAST(SUM(n_ans) AS BIGINT)     AS n_replies,
           CAST(SUM(n_ans + 1) AS BIGINT) AS n_lines
    FROM recs GROUP BY vpc_id
    """,
)
def dns_reply_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Analytics over the pipeline's own output shape: line fan-out per
    vpc — exercises explode + agg composition on transform output."""
    ev = table(spark, sf, "events")
    recs = _dns_records_from_events(ev)
    lines = to_bind9_lines(recs, keep=["event_id", "vpc_id"])
    return lines.groupBy("vpc_id").agg(
        F.count_distinct("event_id").alias("n_records"),
        F.sum(F.when(F.col("kind") == "reply", 1).otherwise(0)).alias("n_replies"),
        F.count("*").alias("n_lines"),
    )
