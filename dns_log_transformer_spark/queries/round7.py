"""Round-7 additions: the per-source corpus triage scorecard.

One query this round by design — the round-7 rotation budget is
consumed re-attesting the r3/r4 cohorts (see queries/__init__ and the
ledger packer), so the round deepens existing operators instead of
widening; this scorecard is the one composition VERDICT r6 ordered
(task 9): the view an LLM-data owner actually reads when deciding
which source to keep, re-crawl, or drop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dns_log_transformer_spark.queries.registry import register, table


def _scorecard_oracle() -> str:
    from dns_log_transformer_spark.queries.llm_ops import (
        _DECON_GRAM,
        _DECON_N,
        _MH_PAIRS_CTES,
        _SQL_NORM,
        _SQL_TOKENS,
    )

    return rf"""
    WITH {_MH_PAIRS_CTES},
    near AS (
      SELECT doc_a AS doc_id FROM dup_pairs
      UNION
      SELECT doc_b FROM dup_pairs),
    toks0 AS (SELECT doc_id, {_SQL_TOKENS} AS w FROM documents),
    dsh AS (
      SELECT doc_id,
             CASE WHEN len(w) >= {_DECON_N}
                  THEN list_distinct(list_transform(
                         range(len(w) - {_DECON_N - 1}), i -> {_DECON_GRAM}))
                  ELSE CAST([] AS VARCHAR[]) END AS s
      FROM toks0),
    bench AS (SELECT flatten(list(s)) AS bl FROM dsh WHERE doc_id % 97 = 0),
    contam AS (
      SELECT doc_id, len(list_intersect(s, b.bl)) > 0 AS is_cont
      FROM dsh, bench b),
    fp AS (SELECT doc_id, COALESCE(md5({_SQL_NORM}), '') AS f
           FROM documents),
    fcnt AS (SELECT f, COUNT(*) AS c FROM fp GROUP BY 1),
    exd AS (SELECT fp.doc_id, fcnt.c >= 2 AS is_exdup
            FROM fp JOIN fcnt USING (f))
    SELECT d.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN c.is_cont THEN 1 ELSE 0 END) AS BIGINT)
             AS n_contaminated,
           CAST(SUM(CASE WHEN e.is_exdup THEN 1 ELSE 0 END) AS BIGINT)
             AS n_exact_dup,
           CAST(SUM(CASE WHEN nr.doc_id IS NOT NULL THEN 1 ELSE 0 END)
             AS BIGINT) AS n_near_dup,
           ROUND(SUM(CASE WHEN c.is_cont THEN 1 ELSE 0 END) * 100.0
                 / COUNT(*), 4) AS contam_pct
    FROM documents d
    JOIN contam c USING (doc_id)
    JOIN exd e USING (doc_id)
    LEFT JOIN near nr USING (doc_id)
    GROUP BY d.source
    """


@register("corpus_source_scorecard", oracle=_scorecard_oracle())
def corpus_source_scorecard(spark: SparkSession, sf: str) -> DataFrame:
    """Per-source corpus triage scorecard — the drilldown an LLM-data
    owner reads to decide keep/re-crawl/drop per source: document
    count, EXACT benchmark-contamination count (through the Bloom
    pre-filter — the sketch changes the plan, not the answer),
    exact-duplicate docs (normalized-md5 fingerprint held by >= 2
    docs), and near-duplicate docs (member of any capped MinHash-LSH
    pair at jaccard >= 0.5).

    Composition of three individually-attested pipelines
    (corpus_bloom_verified_decon, text_fingerprint,
    dedup_minhash_lsh), assembled with per-doc flags and ONE
    conditional-agg groupBy(source) — the q_snapshot_drift shape,
    implemented by corpus.source_scorecard (shared with the streaming
    monitor's pin test). Scale: every stage is the attested operator's
    own bounded plan (join-free bitset probe + suspect-only verify;
    fingerprint window partitions on the high-cardinality hash; LSH is
    banded AND occupancy-capped); the assembly adds three doc-keyed
    equi-joins and a source-cardinality aggregate."""
    from dns_log_transformer_spark.operators import corpus
    from dns_log_transformer_spark.queries.llm_ops import (
        _BLOOM_K,
        _BLOOM_M,
        _DECON_N,
    )

    docs = table(spark, sf, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    return corpus.source_scorecard(
        docs, bench, n=_DECON_N, k=_BLOOM_K, m_bits=_BLOOM_M
    )
