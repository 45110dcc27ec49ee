"""Round-14 additions (VERDICT r13 directives #3 and #6).

- ``corpus_warc_gz`` — WARC taken to the real container: ``.warc.gz``
  gzip-member framing (one member per record, members concatenated),
  gunzipped by ONE Arrow stage riding the scan and fed into the
  EXISTING attested byte walk;
- ``sim_matryoshka_tradeoff`` — the Matryoshka family's tuning query:
  recall-vs-cost per prefix width (d_small sweep) from one tagged pass,
  so "how small can the prefix be" is itself attested.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dns_log_transformer_spark.queries.registry import register, table
from dns_log_transformer_spark.queries.round13 import _MB_SUFFIX


def _warc_gz_oracle(per_blob: int = 2) -> str:
    # First-principles like the r13 byte-walk oracle: the expected rows
    # are CONSTRUCTED from the documents table (strlen = octets, md5
    # over UTF-8 bytes) — gunzip(gzip(record)) == record, so the walk
    # columns are the corpus_warc_http expectations re-keyed to the
    # member framing: one member per record (member_idx = the global
    # record ordinal, walk rec_idx = 0 within each member), every
    # fixture member clean (member_ok, zero leftovers). Neither DuckDB
    # nor the oracle ever runs gzip or the parser. ``per_blob`` must
    # match the pack's grouping (round-15's file-backed variant stages
    # larger mini-segments with the same oracle).
    from dns_log_transformer_spark.sources.warc import WARCINFO_PAYLOAD

    winfo = WARCINFO_PAYLOAD.replace("\r\n", "' || e'\\r\\n' || '")
    return rf"""
    WITH d AS (
      SELECT doc_id, text || '{_MB_SUFFIX}' AS body
      FROM documents WHERE text IS NOT NULL),
    e AS (
      SELECT doc_id,
             CAST(doc_id // {per_blob} AS BIGINT) AS blob_id,
             CAST(ROW_NUMBER() OVER (PARTITION BY doc_id // {per_blob}
                  ORDER BY doc_id) - 1 AS BIGINT) AS ord,
             body,
             'HTTP/1.1 200 OK' || e'\r\n'
               || 'Content-Type: text/html; charset=utf-8' || e'\r\n'
               || 'Content-Length: ' || strlen(body) || e'\r\n\r\n'
               || body AS http,
             'GET /doc/' || doc_id || ' HTTP/1.1' || e'\r\n'
               || 'Host: corpus.invalid' || e'\r\n\r\n' AS req
      FROM d),
    winfo AS (SELECT DISTINCT blob_id, '{winfo}' AS pl FROM e),
    rows_ AS (
      SELECT blob_id, CAST(0 AS BIGINT) AS member_idx,
             'warcinfo' AS warc_type, CAST(NULL AS BIGINT) AS doc_id,
             CAST(strlen(pl) AS BIGINT) AS content_length, TRUE AS ok,
             md5(pl) AS payload_md5,
             CAST(NULL AS BIGINT) AS http_status,
             CAST(NULL AS VARCHAR) AS http_content_type,
             CAST(NULL AS BIGINT) AS body_octets,
             CAST(NULL AS VARCHAR) AS body_md5
      FROM winfo
      UNION ALL
      SELECT blob_id, 1 + 2 * ord, 'request', doc_id,
             CAST(strlen(req) AS BIGINT), TRUE, md5(req),
             NULL, NULL, NULL, NULL
      FROM e
      UNION ALL
      SELECT blob_id, 2 + 2 * ord, 'response', doc_id,
             CAST(strlen(http) AS BIGINT), TRUE, md5(http),
             CAST(200 AS BIGINT), 'text/html; charset=utf-8',
             CAST(strlen(body) AS BIGINT), md5(body)
      FROM e)
    SELECT blob_id, member_idx, TRUE AS member_ok,
           CAST(0 AS BIGINT) AS gz_leftover,
           CAST(0 AS BIGINT) AS rec_idx,
           warc_type, doc_id, content_length, ok, payload_md5,
           http_status, http_content_type, body_octets, body_md5,
           CAST(0 AS BIGINT) AS blob_leftover
    FROM rows_
    """


@register("corpus_warc_gz", oracle=_warc_gz_oracle())
def corpus_warc_gz(spark: SparkSession, sf: str) -> DataFrame:
    """The WARC surface taken to the real container (VERDICT r13 #3):
    documents pack into ``.warc.gz``-layout blobs — ONE GZIP MEMBER PER
    RECORD, concatenated, exactly how Common Crawl segments frame
    records — then ``parse_warc_gz`` (one Arrow-batched ``mapInArrow``
    gunzip stage riding the scan, member boundaries from gzip framing
    via ``decompressobj.unused_data``, never from scanning for record
    magic) hands each member's decompressed bytes to the EXISTING
    attested byte walk (``parse_warc_http``, ``max_records=1``).

    The oracle is first-principles: expected rows constructed from the
    documents table (DuckDB ``strlen``/``md5``); neither gzip nor the
    parser ever runs on the oracle side — a framing bug in either layer
    lands as a value mismatch.

    Scale shape: pack is one groupBy shuffle (fixture side); parse is
    scan -> ONE Arrow stage -> codegen'd walk with NO shuffle anywhere
    — at 100 TB the gunzip stage reads real segment files and the walk
    is unchanged.
    """
    from dns_log_transformer_spark.sources import warc

    docs = table(spark, sf, "documents")
    blobs = warc.pack_warc_gz_blobs(docs, per_blob=2, body_suffix=_MB_SUFFIX)
    members = warc.parse_warc_gz(blobs)
    return warc.parse_warc_http(members, blob_col="rec_bytes", max_records=1)


_MT_SETTINGS: tuple[int, ...] = (8, 16, 32)
_MT_K = 5
_MT_PREFILTER = 20


def _matryoshka_tradeoff_oracle() -> str:
    # ONE definition of the swept widths/k/prefilter for both engines
    # (the round-13 tradeoff discipline); int8 code chain reused
    # verbatim from the attested _INT8_CODE_SQL.
    from dns_log_transformer_spark.operators.similarity import EMBEDDING_DIM
    from dns_log_transformer_spark.queries.advanced import _INT8_CODE_SQL

    dots = ",\n             ".join(
        f"CAST(list_sum(list_transform(list_zip(c.code[1:{d}], "
        f"q.q_code[1:{d}]), p -> CAST(p[1] AS BIGINT) * p[2])) AS BIGINT)"
        f" AS dot_{d}"
        for d in _MT_SETTINGS
    )
    cands = ",\n    ".join(
        f"""cand_{d} AS (
      SELECT query_id, vec_id FROM (
        SELECT query_id, vec_id, ROW_NUMBER() OVER (PARTITION BY query_id
               ORDER BY dot_{d} DESC, vec_id) AS prnk
        FROM pairs)
      WHERE prnk <= {_MT_PREFILTER})"""
        for d in _MT_SETTINGS
    )
    metrics = "\n      UNION ALL ".join(
        f"SELECT CAST({d} AS BIGINT) AS d_small, "
        f"(SELECT COUNT(*) FROM cand_{d} "
        f"JOIN full_topk USING (query_id, vec_id))::BIGINT AS n_hit"
        for d in _MT_SETTINGS
    )
    return rf"""
    WITH {_INT8_CODE_SQL},
    q AS (SELECT vec_id AS query_id, code AS q_code FROM codes
          WHERE vec_id % 50 = 0 AND vec_id < 2000),
    pairs AS (
      SELECT q.query_id, c.vec_id,
             {dots},
             CAST(list_sum(list_transform(list_zip(c.code, q.q_code),
                    p -> CAST(p[1] AS BIGINT) * p[2])) AS BIGINT) AS dot_f
      FROM codes c, q WHERE c.vec_id <> q.query_id),
    full_topk AS (
      SELECT query_id, vec_id FROM (
        SELECT query_id, vec_id, ROW_NUMBER() OVER (PARTITION BY query_id
               ORDER BY dot_f DESC, vec_id) AS rnk
        FROM pairs)
      WHERE rnk <= {_MT_K}),
    nq AS (SELECT COUNT(*)::BIGINT AS n_queries FROM q),
    {cands},
    m AS (
      {metrics})
    SELECT m.d_small,
           CAST((1000 * m.d_small) // {EMBEDDING_DIM} AS BIGINT)
             AS index_bytes_milli,
           nq.n_queries,
           m.n_hit,
           CAST((1000 * m.n_hit) // ({_MT_K} * nq.n_queries) AS BIGINT)
             AS recall_milli
    FROM m, nq
    """


@register("sim_matryoshka_tradeoff", oracle=_matryoshka_tradeoff_oracle())
def sim_matryoshka_tradeoff(spark: SparkSession, sf: str) -> DataFrame:
    """Recall-vs-cost per Matryoshka prefix width (VERDICT r13 #6): the
    "how small can the truncated index be" decision as ONE attested
    query — ``sim_matryoshka_rerank`` ships d_small=16; this row set
    shows what 8 and 32 would buy at the same prefilter, on the same
    query workload.

    One tagged pass (operators/similarity.py matryoshka_tradeoff): a
    single Arrow-batched UDF snapshots the int64 dot at every swept
    prefix boundary plus full width per (query, vector) pair; the truth
    top-k and every setting's candidate ranking read that one persisted
    pair frame. recall_milli = exact integer milli of |prefilter-kept
    true top-k| / (k * n_queries); index_bytes_milli is the cost axis
    (prefix bytes relative to full width).
    """
    from dns_log_transformer_spark.operators import similarity

    emb = table(spark, sf, "embeddings")
    queries = emb.filter((F.col("vec_id") % 50 == 0) & (F.col("vec_id") < 2000))
    return similarity.matryoshka_tradeoff(
        emb,
        queries,
        k=_MT_K,
        prefilter=_MT_PREFILTER,
        d_smalls=_MT_SETTINGS,
    )
