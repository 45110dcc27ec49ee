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


def _rake_oracle() -> str:
    from dns_log_transformer_spark.operators.text import EN_STOPWORDS

    sw = ", ".join(f"'{w}'" for w in EN_STOPWORDS)
    return rf"""
    WITH base AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS ws
      FROM documents WHERE trim(text) IS NOT NULL AND trim(text) <> ''),
    toks AS (
      SELECT doc_id, u.p[2] AS w, CAST(u.p[1] AS BIGINT) AS pos
      FROM (SELECT doc_id, unnest(list_zip(range(1, len(ws) + 1), ws)) AS p
            FROM base) u
      WHERE u.p[2] <> ''),
    ns AS (
      SELECT doc_id, w, pos,
             pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
      FROM toks WHERE w NOT IN ({sw})),
    ph AS (
      SELECT doc_id, grp, list(w ORDER BY pos) AS ws2,
             CAST(COUNT(*) AS BIGINT) AS n_words
      FROM ns GROUP BY 1, 2),
    phf AS (
      SELECT doc_id, grp, array_to_string(ws2, ' ') AS phrase, n_words, ws2
      FROM ph WHERE n_words <= 8),
    occ AS (SELECT doc_id, grp, n_words, unnest(ws2) AS w FROM phf),
    wstat AS (
      SELECT w, COUNT(*) AS freq, SUM(n_words) AS degree FROM occ GROUP BY 1),
    wsc AS (SELECT w, (1000 * degree) // freq AS wscore FROM wstat),
    psc AS (
      SELECT o.doc_id, o.grp, CAST(SUM(wscore) AS BIGINT) AS score_milli
      FROM occ o JOIN wsc USING (w) GROUP BY 1, 2),
    pp AS (
      SELECT DISTINCT p.doc_id, p.phrase, p.n_words, s.score_milli
      FROM phf p JOIN psc s ON s.doc_id = p.doc_id AND s.grp = p.grp),
    ranked AS (
      SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
                 ORDER BY score_milli DESC, phrase) AS BIGINT) AS rk
      FROM pp)
    SELECT doc_id, phrase, n_words, score_milli, rk
    FROM ranked WHERE rk <= 3
    """


@register("text_rake_keyphrases", oracle=_rake_oracle())
def text_rake_keyphrases(spark: SparkSession, sf: str) -> DataFrame:
    """Top-3 RAKE keyphrases per document — the classic unsupervised
    keyphrase extractor (candidate phrases = maximal non-stopword runs;
    word score = corpus degree/frequency; phrase score = sum of member
    word scores), complementing tf-idf's single-term salience with
    multi-word phrases. Scores live in the integer-milli domain
    ((1000 * degree) div freq per word) so the cross-engine hash cannot
    drift on float fold order; ties break on phrase text.

    Scale shape (operators/text.py rake_keyphrases): one doc-id shuffle
    shared by the islands window and both per-run aggregations, one
    vocabulary-keyed word-stats aggregation joined back on the word,
    top-k window partitioned by doc id.
    """
    from dns_log_transformer_spark.operators import text

    docs = table(spark, sf, "documents")
    return text.rake_keyphrases(docs, max_words=8, k=3)
