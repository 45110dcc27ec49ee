"""Round-12 additions.

Four §2.4 new-engine entries (the ledger window holds the owed r08
cohort with ~20 slots spare, so 4 new homes pack comfortably first):

- ``text_pmi_collocations`` — PMI collocations ranked in the exact
  integer lift domain (log is monotone: ranking by PMI == ranking by
  N*c_xy/(c_x*c_y); no cross-libm float log in the attested output);
- ``dedup_blocking_audit`` — record-linkage QA of the MinHash-LSH
  blocking stage (pair completeness / reduction ratio / precision vs
  the exact-Jaccard truth pairs);
- ``corpus_warc_records`` — WARC-style record-framed archive framing:
  pack documents into Content-Length-framed blobs, parse them back with
  the unrolled Content-Length-driven walk, attest the round trip
  against first-principles expectations (the oracle never runs the
  parser — it states what a correct parse MUST recover);
- ``emb_matryoshka_probe`` — truncated-dimension retrieval quality:
  overlap@5 between the full-width and 16-dim-prefix int8 top-k lists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dns_log_transformer_spark.queries.registry import register, table


def _pmi_oracle() -> str:
    return r"""
    WITH base AS (
      SELECT CASE WHEN trim(text) IS NULL OR trim(text) = ''
             THEN CAST([] AS VARCHAR[])
             ELSE string_split_regex(lower(trim(text)), '\s+') END AS w
      FROM documents),
    bg AS (
      SELECT w[i+1] AS w1, w[i+2] AS w2
      FROM base, unnest(range(len(w) - 1)) AS t(i)
      WHERE len(w) >= 2),
    cxy AS (SELECT w1, w2, COUNT(*)::BIGINT AS c_xy FROM bg GROUP BY 1, 2),
    uni AS (
      SELECT u.tok AS w, COUNT(*)::BIGINT AS c
      FROM (SELECT unnest(w) AS tok FROM base) u GROUP BY 1),
    n AS (SELECT COALESCE(SUM(c_xy), 0)::BIGINT AS n_bigrams FROM cxy),
    sc AS (
      SELECT w1, w2, c_xy, a.c AS c_x, b.c AS c_y,
             -- denominator enters the product HUGEINT like the Spark
             -- side's decimal(38,0): BIGINT*BIGINT overflows loudly at
             -- the ~1e10 stopword marginals the numerator cast was
             -- added for (ADVICE r12)
             CAST((CAST(1000 AS HUGEINT) * n.n_bigrams * c_xy)
                  // (CAST(a.c AS HUGEINT) * b.c) AS BIGINT) AS lift_milli
      FROM cxy, n
      JOIN uni a ON a.w = w1
      JOIN uni b ON b.w = w2
      WHERE c_xy >= 3),
    rk AS (
      SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY w1
                 ORDER BY lift_milli DESC, w2) AS BIGINT) AS rk
      FROM sc)
    SELECT w1, w2, c_xy, c_x, c_y, lift_milli, rk FROM rk WHERE rk <= 3
    """


@register("text_pmi_collocations", oracle=_pmi_oracle())
def text_pmi_collocations(spark: SparkSession, sf: str) -> DataFrame:
    """Top-3 collocation partners per headword by pointwise mutual
    information over adjacent bigrams. The ranking key is the exact
    integer lift (1000 * N * c_xy) div (c_x * c_y) — log is monotone,
    so PMI order == lift order, and the attested score never touches a
    float log whose libm last-ulp could diverge between engines; the
    decimal(38,0) intermediate survives the corpus-scale numerator
    (N ~ 1e12 overflows int64 products). c_xy >= 3 noise-floors hapax
    pairs (PMI's classic failure mode).

    Scale shape (operators/text.py pmi_collocations): one tokenize scan
    persisted for both count aggs; vocabulary-keyed unigram join
    (shuffle, not broadcast — web vocab outgrows broadcast); 1-row N
    crossJoin; top-k window partitioned on the headword.
    """
    from dns_log_transformer_spark.operators import text

    docs = table(spark, sf, "documents")
    return text.pmi_collocations(docs, min_count=3, k=3)


#: The df_cap(100)-bounded exact-Jaccard TRUTH pair chain at J >= 0.5
#: as WITH-clause text over the shared ``sh`` shingle CTE — factored so
#: the r13 blocking-tradeoff oracle grades every band setting against
#: the IDENTICAL truth definition the attested audit uses.
_BLOCKING_TRUTH_CTES = """tp AS (SELECT doc_id, len(s) AS n, unnest(s) AS shingle FROM sh),
    rare AS (SELECT shingle FROM tp GROUP BY 1 HAVING COUNT(*) <= 100),
    p AS (SELECT tp.* FROM tp JOIN rare USING (shingle)),
    tpairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.n AS n_a, b.n AS n_b, COUNT(*) AS n_common
      FROM p a JOIN p b USING (shingle)
      WHERE a.doc_id < b.doc_id
      GROUP BY 1, 2, 3, 4),
    truth AS (
      SELECT doc_a, doc_b FROM tpairs
      WHERE n_common / (n_a + n_b - n_common) >= 0.5)"""


def _blocking_audit_oracle() -> str:
    # The candidate chain (shingles -> md5-half minhash -> bands ->
    # bucket cap -> cand) is llm_ops._MH_PAIRS_CTES verbatim — ONE
    # definition, so a future hash-family or cap change cannot
    # desynchronize the audit oracle from the candidate generator it
    # grades. Its unreferenced tail CTEs (v, dup_pairs) cost nothing:
    # DuckDB plans only referenced CTEs.
    from dns_log_transformer_spark.queries.llm_ops import _MH_PAIRS_CTES

    return rf"""
    WITH {_MH_PAIRS_CTES},
    {_BLOCKING_TRUTH_CTES},
    s AS (SELECT
      (SELECT COUNT(*) FROM sh WHERE len(s) > 0)::BIGINT AS n_docs,
      (SELECT COUNT(*) FROM truth)::BIGINT AS n_truth,
      (SELECT COUNT(*) FROM cand)::BIGINT AS n_cand,
      (SELECT COUNT(*) FROM cand JOIN truth USING (doc_a, doc_b))::BIGINT
        AS n_hit)
    SELECT n_docs,
           CAST((n_docs * (n_docs - 1)) // 2 AS BIGINT) AS n_possible_pairs,
           n_truth, n_cand, n_hit,
           CASE WHEN n_truth > 0
                THEN CAST((1000 * n_hit) // n_truth AS BIGINT)
           END AS pair_completeness_milli,
           CASE WHEN n_docs >= 2
                THEN CAST(1000 - (1000 * n_cand)
                          // ((n_docs * (n_docs - 1)) // 2) AS BIGINT)
           END AS reduction_ratio_milli,
           CASE WHEN n_cand > 0
                THEN CAST((1000 * n_hit) // n_cand AS BIGINT)
           END AS precision_milli
    FROM s
    """


@register("dedup_blocking_audit", oracle=_blocking_audit_oracle())
def dedup_blocking_audit(spark: SparkSession, sf: str) -> DataFrame:
    """Blocking-quality QA (Christen's record-linkage metrics): pair
    completeness, reduction ratio and precision of the MinHash-LSH
    candidate pairs against the df-capped exact-Jaccard truth pairs at
    J >= 0.5 — audited BELOW the 12-hash/4-band s-curve midpoint
    (~0.63) on purpose, the regime where banding misses real pairs.
    One row of corpus-level numbers a curation run gates on before
    trusting its dedup pass.

    Scale shape (operators/dedup.py blocking_audit): the shingle frame
    is shared by both sides (computed once, persisted); every metric is
    a 1-row aggregate; ratios are exact integer milli.
    """
    from dns_log_transformer_spark.operators import dedup

    docs = table(spark, sf, "documents")
    return dedup.blocking_audit(docs, threshold=0.5, df_cap=100)


_WARC_ORACLE = """
    WITH d AS (SELECT doc_id, text FROM documents WHERE text IS NOT NULL),
    r AS (
      SELECT doc_id,
             CAST(doc_id // 4 AS BIGINT) AS blob_id,
             CAST(length(text) AS BIGINT) AS content_length,
             md5(text) AS payload_md5,
             CAST(ROW_NUMBER() OVER (PARTITION BY doc_id // 4
                  ORDER BY doc_id) - 1 AS BIGINT) AS rec_idx,
             CAST(COUNT(*) OVER (PARTITION BY doc_id // 4) AS BIGINT)
               AS n_records
      FROM d)
    SELECT blob_id, n_records, rec_idx, doc_id, content_length,
           TRUE AS ok, payload_md5,
           CAST(0 AS BIGINT) AS blob_leftover
    FROM r
    """


@register("corpus_warc_records", oracle=_WARC_ORACLE)
def corpus_warc_records(spark: SparkSession, sf: str) -> DataFrame:
    """WARC-style archive framing round trip: pack documents into
    Content-Length-framed record blobs (4 records/blob), then recover
    every record with the unrolled Content-Length-driven walk
    (sources/warc.py). The oracle is first-principles: it computes what
    a correct parse MUST emit (ids, lengths, payload md5, ok = true,
    leftover = 0) straight from the documents table — so any framing
    or walk bug (off-by-one positions, payload-delimiter confusion,
    silent record truncation) lands as a value/row mismatch rather
    than two parsers agreeing on the same mistake.

    Scale shape: pack is one groupBy shuffle on blob_id; parse is pure
    codegen'd string arithmetic riding the scan (no shuffle, no
    Python); at 100 TB the parse side reads real archive files instead
    of packed fixtures — the walk is the same.
    """
    from dns_log_transformer_spark.sources import warc

    docs = table(spark, sf, "documents")
    blobs = warc.pack_warc_blobs(docs, per_blob=4)
    return warc.parse_warc_records(blobs, max_records=6)


def _matryoshka_oracle() -> str:
    from dns_log_transformer_spark.queries.advanced import _INT8_CODE_SQL

    return rf"""
    WITH {_INT8_CODE_SQL},
    q AS (SELECT vec_id AS query_id, code AS q_code FROM codes
          WHERE vec_id % 50 = 0 AND vec_id < 2000),
    sc AS (
      SELECT q.query_id, c.vec_id,
             CAST(list_sum(list_transform(list_zip(c.code, q.q_code),
                    p -> CAST(p[1] AS BIGINT) * p[2])) AS BIGINT)
               AS dot_full,
             CAST(list_sum(list_transform(
                    list_zip(c.code[1:16], q.q_code[1:16]),
                    p -> CAST(p[1] AS BIGINT) * p[2])) AS BIGINT)
               AS dot_trunc
      FROM codes c, q WHERE c.vec_id <> q.query_id),
    tf AS (
      SELECT query_id, vec_id,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY dot_full DESC, vec_id) AS rnk
      FROM sc),
    tff AS (SELECT * FROM tf WHERE rnk <= 5),
    tt AS (
      SELECT query_id, vec_id,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY dot_trunc DESC, vec_id) AS rnk
      FROM sc),
    ttf AS (SELECT * FROM tt WHERE rnk <= 5),
    ov AS (
      SELECT query_id, COUNT(*)::BIGINT AS n_overlap
      FROM tff JOIN ttf USING (query_id, vec_id) GROUP BY 1),
    fcsv AS (
      SELECT query_id,
             string_agg(CAST(vec_id AS VARCHAR), ',' ORDER BY rnk)
               AS top_full_csv
      FROM tff GROUP BY 1),
    tcsv AS (
      SELECT query_id,
             string_agg(CAST(vec_id AS VARCHAR), ',' ORDER BY rnk)
               AS top_trunc_csv
      FROM ttf GROUP BY 1)
    SELECT f.query_id, f.top_full_csv, t.top_trunc_csv,
           COALESCE(o.n_overlap, 0)::BIGINT AS n_overlap,
           (1000 * COALESCE(o.n_overlap, 0)) // 5 AS overlap_milli
    FROM fcsv f
    JOIN tcsv t USING (query_id)
    LEFT JOIN ov o USING (query_id)
    """


@register("emb_matryoshka_probe", oracle=_matryoshka_oracle())
def emb_matryoshka_probe(spark: SparkSession, sf: str) -> DataFrame:
    """Matryoshka truncation probe: per query, top-5 neighbors under the
    full 64-dim int8 dot product vs under the first-16-dim prefix, and
    their overlap — the retained-retrieval-quality number that decides
    whether a 4x-smaller truncated index is good enough (MRL-style
    embeddings order information by prefix; this measures it instead of
    assuming it). Fixed query workload (vec_id % 50 == 0, < 2000), the
    ANN-family convention.

    Determinism: both rankings are exact int64 dots over the SAME int8
    codes (prefix ranking slices the code), ties on neighbor id.

    Scale shape (operators/similarity.py matryoshka_probe): ONE
    broadcast-queries pair frame computes both dots in a single linear
    corpus scan; top-k frames are query-bounded, so overlap/CSV work is
    dimension-sized.
    """
    from dns_log_transformer_spark.operators import similarity

    emb = table(spark, sf, "embeddings")
    queries = emb.filter((F.col("vec_id") % 50 == 0) & (F.col("vec_id") < 2000))
    return similarity.matryoshka_probe(emb, queries, k=5, d_small=16)
