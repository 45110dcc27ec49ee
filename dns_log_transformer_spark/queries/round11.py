"""Round-11 additions.

Kept small by design (VERDICT r10 #3: additions <= 3-4 so the window
re-attests the owed r07 cohort plus the 11 source-changed homes the new
content-keyed ledger packs first). The round's primary jobs were the
container-census descent, the attestation hash ledger, and the sink
scale curves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from dns_log_transformer_spark.queries.registry import register, table


def _containment_oracle() -> str:
    from dns_log_transformer_spark.queries.llm_ops import _SQL_SHINGLES

    return rf"""
    WITH {_SQL_SHINGLES},
    post AS (SELECT doc_id, len(s) AS n, unnest(s) AS shingle FROM sh),
    rare AS (SELECT shingle FROM post GROUP BY 1 HAVING COUNT(*) <= 100),
    p AS (SELECT post.* FROM post JOIN rare USING (shingle)),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.n AS n_a, b.n AS n_b, COUNT(*) AS n_common
      FROM p a JOIN p b USING (shingle)
      WHERE a.doc_id < b.doc_id
      GROUP BY 1, 2, 3, 4)
    SELECT doc_a, doc_b, n_common,
           ROUND(n_common / LEAST(n_a, n_b), 4) AS containment,
           ROUND(n_common / (n_a + n_b - n_common), 4) AS jaccard,
           CASE WHEN n_a <= n_b THEN doc_a ELSE doc_b END AS contained_doc
    FROM pairs
    WHERE n_common / LEAST(n_a, n_b) >= 0.8
    """


@register("dedup_containment", oracle=_containment_oracle())
def dedup_containment(spark: SparkSession, sf: str) -> DataFrame:
    """Asymmetric containment dedup (trigram shingles, containment =
    |A∩B| / min(|A|,|B|) >= 0.8): the subset-duplication detector
    symmetric Jaccard structurally misses — a doc engulfed verbatim in
    one 4x its size keeps containment ~1.0 while Jaccard falls to
    ~0.25, below any sane threshold. Emits the riding jaccard so the
    missed regime is visible per pair, and contained_doc (the smaller
    side) as the curation drop candidate.

    Scale shape: identical to dedup_ngram_jaccard — one inverted
    shingle index (persisted once, two consumers), one shuffle on
    shingle with the df_cap <= 100 skew guard, one on the pair key;
    the cap undercounts n_common identically on both engines, so
    containment is a deterministic lower bound
    (operators/dedup.py containment_pairs).
    """
    from dns_log_transformer_spark.operators import dedup

    docs = table(spark, sf, "documents")
    return dedup.containment_pairs(docs, threshold=0.8, df_cap=100)
