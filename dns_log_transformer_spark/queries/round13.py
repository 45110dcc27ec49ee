"""Round-13 additions.

Three §2.4 new-engine entries (VERDICT r12 directives #3, #6, #7; the
r13 window holds the owed r09 cohort with ~25 slots spare, so 3 new
homes pack comfortably first):

- ``corpus_warc_http`` — the byte-domain WARC surface: octet-counted
  Content-Length framing (multi-byte UTF-8 payloads on every record),
  WARC-Type extraction (warcinfo/request/response) and the HTTP
  header/payload split for response records — the columns a Common
  Crawl user actually selects on;
- ``sim_matryoshka_rerank`` — the operator the r12 Matryoshka probe
  gates: truncated-prefix int8 prefilter to N candidates, full-width
  exact rerank to top-k;
- ``dedup_blocking_tradeoff`` — the r12 blocking audit extended from
  report to recommendation: one row per (bands, rows-per-band) setting
  over the SAME shingle frame, so the banding tuning decision is
  itself attested.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dns_log_transformer_spark.queries.registry import register, table

#: Multi-byte suffix appended to every HTTP body (2-, 3- and 4-octet
#: UTF-8 sequences) — char count != octet count on EVERY record, the
#: case a character-framed parser gets wrong.
_MB_SUFFIX = " §é€\U0001f600"


def _warc_http_oracle() -> str:
    from dns_log_transformer_spark.sources.warc import WARCINFO_PAYLOAD

    winfo = WARCINFO_PAYLOAD.replace("\r\n", "' || e'\\r\\n' || '")
    return rf"""
    WITH d AS (
      SELECT doc_id, text || '{_MB_SUFFIX}' AS body
      FROM documents WHERE text IS NOT NULL),
    e AS (
      SELECT doc_id,
             CAST(doc_id // 2 AS BIGINT) AS blob_id,
             CAST(ROW_NUMBER() OVER (PARTITION BY doc_id // 2
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
      SELECT blob_id, CAST(0 AS BIGINT) AS rec_idx,
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
    SELECT *, CAST(0 AS BIGINT) AS blob_leftover FROM rows_
    """


@register("corpus_warc_http", oracle=_warc_http_oracle())
def corpus_warc_http(spark: SparkSession, sf: str) -> DataFrame:
    """Byte-domain WARC round trip with the real record-type surface
    (VERDICT r12 #3): documents pack into BINARY blobs — one warcinfo
    record, then per document a request record and a response record
    whose payload is a full HTTP response; ``Content-Length`` counts
    OCTETS (every body carries 2-/3-/4-octet UTF-8 sequences, so the
    character-framed walk this replaces would desynchronize on every
    single record) — then the unrolled octet-position walk recovers
    record types, ids, lengths, payload digests, and for responses the
    HTTP status, Content-Type, body octet count and body digest.

    The oracle is first-principles: it CONSTRUCTS the expected records
    from the documents table (DuckDB ``strlen`` = octets, ``md5`` over
    UTF-8 bytes) and never runs the parser — framing or walk bugs land
    as value mismatches, not as two parsers agreeing on a mistake.

    Scale shape: pack is one groupBy shuffle on blob_id; parse is pure
    codegen'd string arithmetic over the blob's ISO-8859-1 decoding
    (positions ARE octets), riding the scan — no shuffle, no Python.
    At 100 TB the parse side reads real WARC segments instead of packed
    fixtures; the walk is the same.
    """
    from dns_log_transformer_spark.sources import warc

    docs = table(spark, sf, "documents")
    blobs = warc.pack_warc_http_blobs(docs, per_blob=2, body_suffix=_MB_SUFFIX)
    return warc.parse_warc_http(blobs.select("blob_id", "blob"), max_records=5)


def _matryoshka_rerank_oracle() -> str:
    from dns_log_transformer_spark.queries.advanced import _INT8_CODE_SQL

    return rf"""
    WITH {_INT8_CODE_SQL},
    q AS (SELECT vec_id AS query_id, code AS q_code FROM codes
          WHERE vec_id % 50 = 0 AND vec_id < 2000),
    pre AS (
      SELECT q.query_id, c.vec_id,
             CAST(list_sum(list_transform(
                    list_zip(c.code[1:16], q.q_code[1:16]),
                    p -> CAST(p[1] AS BIGINT) * p[2])) AS BIGINT) AS dotp
      FROM codes c, q WHERE c.vec_id <> q.query_id),
    cand AS (
      SELECT query_id, vec_id FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
               ORDER BY dotp DESC, vec_id) AS prnk
        FROM pre)
      WHERE prnk <= 20),
    rer AS (
      SELECT cd.query_id, cd.vec_id,
             CAST(list_sum(list_transform(list_zip(c.code, q.q_code),
                    p -> CAST(p[1] AS BIGINT) * p[2])) AS BIGINT)
               AS dot_full
      FROM cand cd
      JOIN codes c USING (vec_id)
      JOIN q USING (query_id))
    SELECT query_id, vec_id, dot_full,
           CAST(rnk AS BIGINT) AS rnk
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                 ORDER BY dot_full DESC, vec_id) AS rnk
          FROM rer)
    WHERE rnk <= 5
    """


@register("sim_matryoshka_rerank", oracle=_matryoshka_rerank_oracle())
def sim_matryoshka_rerank(spark: SparkSession, sf: str) -> DataFrame:
    """Truncated-prefix retrieve, full-width rerank (VERDICT r12 #6):
    the retrieval operator the r12 ``emb_matryoshka_probe`` number
    gates. Stage 1 scans only the first-16-dim int8 prefix (the
    4x-smaller truncated index) to 20 candidates per query; stage 2
    reranks ONLY those candidate ids by the exact full-width int64 dot
    to top-5. Same fixed query workload as the probe and the rest of
    the ANN family (vec_id % 50 == 0, < 2000).

    Determinism: both stages exact integer dots over the same int8
    codes, ties on neighbor id — bit-reproducible, no float rounding.

    Scale shape (operators/similarity.py matryoshka_rerank_topk): the
    wide stage-1 frame carries 16 code bytes per row, not 64; stage 2
    is a broadcast candidate-id join back into the code scan — it
    never touches a non-candidate row.
    """
    from dns_log_transformer_spark.operators import similarity

    emb = table(spark, sf, "embeddings")
    queries = emb.filter((F.col("vec_id") % 50 == 0) & (F.col("vec_id") < 2000))
    return similarity.matryoshka_rerank_topk(
        emb, queries, k=5, prefilter=20, d_small=16
    )


# ONE definition of the swept band settings and the truth df-cap for
# BOTH engines (ADVICE r13): the oracle generator iterates these, and
# the Spark registration passes them explicitly — a default change in
# dedup.blocking_tradeoff cannot silently desynchronize the two sides.
TRADEOFF_BAND_SETTINGS: tuple[int, ...] = (2, 3, 4, 6)
TRADEOFF_DF_CAP = 100


def _blocking_tradeoff_oracle() -> str:
    # ONE definition everywhere: the signature chain and each setting's
    # band/candidate chain come from llm_ops (_MH_SIG_CTES /
    # _mh_band_cand_ctes — the same text _MH_PAIRS_CTES is built from),
    # and the truth chain is round12's _BLOCKING_TRUTH_CTES verbatim —
    # the attested audit's truth definition. A hash-family, cap or
    # truth-threshold change cannot desynchronize the sweep from the
    # audit it extends.
    from dns_log_transformer_spark.queries.llm_ops import (
        _MH_SIG_CTES,
        _mh_band_cand_ctes,
    )
    from dns_log_transformer_spark.queries.round12 import _BLOCKING_TRUTH_CTES

    # the truth chain hardcodes its df-cap (one definition, shared with
    # the audit); fail loudly here if the Spark-side constant ever
    # drifts from it instead of desynchronizing the engines
    assert f"COUNT(*) <= {TRADEOFF_DF_CAP}" in _BLOCKING_TRUTH_CTES, (
        "TRADEOFF_DF_CAP no longer matches round12._BLOCKING_TRUTH_CTES"
    )
    settings = TRADEOFF_BAND_SETTINGS
    per = ",\n    ".join(_mh_band_cand_ctes(b, f"_{b}") for b in settings)
    metrics = "\n      UNION ALL ".join(
        f"SELECT CAST({b} AS BIGINT) AS num_bands, "
        f"CAST({12 // b} AS BIGINT) AS rows_per_band, "
        f"(SELECT COUNT(*) FROM cand_{b})::BIGINT AS n_cand, "
        f"(SELECT COUNT(*) FROM cand_{b} JOIN truth USING (doc_a, doc_b))"
        f"::BIGINT AS n_hit"
        for b in settings
    )
    return rf"""
    WITH {_MH_SIG_CTES},
    {_BLOCKING_TRUTH_CTES},
    base AS (SELECT
      (SELECT COUNT(*) FROM sh WHERE len(s) > 0)::BIGINT AS n_docs,
      (SELECT COUNT(*) FROM truth)::BIGINT AS n_truth),
    {per},
    m AS (
      {metrics})
    SELECT m.num_bands, m.rows_per_band, base.n_docs,
           -- HUGEINT like the Spark side's decimal(38,0): BIGINT*BIGINT
           -- wraps past ~3e9 docs (the ADVICE r12 PMI class)
           CAST((CAST(n_docs AS HUGEINT) * (n_docs - 1)) // 2 AS BIGINT)
             AS n_possible_pairs,
           base.n_truth, m.n_cand, m.n_hit,
           CASE WHEN n_truth > 0
                THEN CAST((1000 * CAST(n_hit AS HUGEINT)) // n_truth
                     AS BIGINT)
           END AS pair_completeness_milli,
           CASE WHEN n_docs >= 2
                THEN CAST(1000 - (1000 * CAST(n_cand AS HUGEINT))
                          // ((CAST(n_docs AS HUGEINT) * (n_docs - 1)) // 2)
                     AS BIGINT)
           END AS reduction_ratio_milli,
           CASE WHEN n_cand > 0
                THEN CAST((1000 * CAST(n_hit AS HUGEINT)) // n_cand
                     AS BIGINT)
           END AS precision_milli
    FROM m, base
    """


@register("dedup_blocking_tradeoff", oracle=_blocking_tradeoff_oracle())
def dedup_blocking_tradeoff(spark: SparkSession, sf: str) -> DataFrame:
    """The banding tuning decision as an attested query (VERDICT r12
    #7): one row of Christen blocking metrics (pair completeness,
    reduction ratio, precision vs the df-capped exact-Jaccard truth at
    J >= 0.5) per (bands, rows-per-band) setting of the 12-hash MinHash
    family — 2x6 (s-curve midpoint ~0.89) through 6x2 (~0.41). The r12
    ``dedup_blocking_audit`` reports the shipped config's quality; this
    query answers "which config" — the decision
    tools/audit_bands_r12.py made by hand.

    Scale shape (operators/dedup.py blocking_tradeoff): shingles, the
    truth pair set and the band-independent signature frame are each
    computed ONCE and persisted (the ADVICE r12 hoist); per setting
    only the cheap banding explode, the capped candidate join and three
    1-row aggregates rerun. Ratios exact integer milli.
    """
    from dns_log_transformer_spark.operators import dedup

    docs = table(spark, sf, "documents")
    return dedup.blocking_tradeoff(
        docs,
        threshold=0.5,
        df_cap=TRADEOFF_DF_CAP,
        band_settings=TRADEOFF_BAND_SETTINGS,
    )
