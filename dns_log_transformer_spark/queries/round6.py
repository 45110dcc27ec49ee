"""Round-6 surface growth: variable-length repeated-span dedup via
winnowing anchors, incremental IVF index maintenance (the batch twin of
the streaming vector-index sink), kNN label propagation, per-document
TF-IDF top terms, character-entropy quality scoring, two-stage
int8-rerank ANN, per-group OLS regression, sorted-neighborhood dedup,
TF-IDF cosine rerank of blocked candidates, BPE merge induction AND
train-then-apply compression stats, the key-skew / join-size /
snapshot-drift / referential-integrity planning-and-quality
diagnostics, CDC time travel, session path mining, market-basket
co-occurrence, recency-decayed popularity, cohort retention,
leakage-safe target encoding, NTILE bucketing, A/B z-test analysis,
Adamic-Adar link prediction, and RFM segmentation.

Every query pairs a Spark plan with a DuckDB oracle computing the SAME
deterministic algorithm; all are registered inside the round-6 driver
window (queries/__init__.py) so each gets a driver correctness row this
round.

No reference analog for any of these (the reference is a stateless
record-at-a-time log transformer, app/app.py); they extend the SURVEY
§2 L-rows (LLM-pipeline / large-scale analytics surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dns_log_transformer_spark.queries.registry import register, table


# ---------------------------------------------------------------------------
# Variable-length repeated-span dedup (winnowing anchors -> islands)
# ---------------------------------------------------------------------------
@register(
    "corpus_winnow_span_dedup",
    oracle=r"""
    WITH n AS (
      SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS t
      FROM documents),
    g AS (
      SELECT doc_id,
             list_transform(range(1, length(t) - 8 + 2),
                            i -> md5(substr(t, CAST(i AS INT), 8))) AS gh
      FROM n WHERE length(t) >= 8),
    posl AS (
      SELECT doc_id,
             list_distinct(CASE WHEN len(gh) >= 4
               THEN list_transform(range(1, len(gh) - 4 + 2),
                 j -> CAST(j + list_position(gh[j:j+3], list_min(gh[j:j+3]))
                           - 1 AS INT))
               ELSE [CAST(list_position(gh, list_min(gh)) AS INT)]
               END) AS ps,
             gh
      FROM g),
    a0 AS (SELECT doc_id, unnest(ps) AS pos, gh FROM posl),
    anchors AS (SELECT doc_id, pos, gh[pos] AS fp FROM a0),
    shared AS (
      SELECT fp FROM anchors GROUP BY fp
      HAVING min(doc_id) <> max(doc_id)),
    sa AS (SELECT a.doc_id, a.pos FROM anchors a JOIN shared s USING (fp)),
    isl AS (
      SELECT doc_id, pos,
             CASE WHEN pos > COALESCE(
                 MAX(pos + 7) OVER (PARTITION BY doc_id ORDER BY pos
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                 -2147483648) + 1
               THEN 1 ELSE 0 END AS newf
      FROM sa),
    isl2 AS (
      SELECT doc_id, pos,
             SUM(newf) OVER (PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      FROM isl)
    SELECT doc_id,
           CAST(MIN(pos) AS BIGINT) AS span_start,
           CAST(MAX(pos) - MIN(pos) + 8 AS BIGINT) AS span_len,
           CAST(COUNT(*) AS BIGINT) AS n_anchors
    FROM isl2 GROUP BY doc_id, island
    HAVING COUNT(*) >= 2
    """,
)
def corpus_winnow_span_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Variable-length repeated-span detection (the boilerplate the
    fixed-8-gram span pass misses): winnowing anchors (k=8, w=4) shared
    across documents, merged per doc into maximal char spans via
    gaps-and-islands. See operators/corpus.py winnow_span_dedup for the
    scale shape (anchor extraction rides the scan; shared detection is
    one map-side-combined agg + semi-join; islands window per doc)."""
    from dns_log_transformer_spark.operators import corpus

    docs = table(spark, sf, "documents")
    return corpus.winnow_span_dedup(docs, k=8, w=4, min_anchors=2)


# ---------------------------------------------------------------------------
# Incremental IVF index maintenance (batch twin of the streaming sink)
# ---------------------------------------------------------------------------
def _ivf_delta_oracle() -> str:
    from dns_log_transformer_spark.queries.llm_ops import (
        _SEMDEDUP_CB,
        _SQL_DOT,
    )

    return f"""
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings),
    {_SEMDEDUP_CB},
    feed AS (
      SELECT vec_id, v, 0 AS version, 'U' AS op FROM e
      UNION ALL
      SELECT vec_id, list_transform(v, x -> -x) AS v, 1 AS version, 'U' AS op
      FROM e WHERE vec_id % 7 = 0
      UNION ALL
      SELECT vec_id, v, 2 AS version, 'D' AS op
      FROM e WHERE vec_id % 13 = 0),
    latest AS (
      SELECT vec_id, v, version FROM (
        SELECT vec_id, v, version, op,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY version DESC) AS rn
        FROM feed)
      WHERE rn = 1 AND op <> 'D'),
    assigned AS (
      SELECT vec_id, cell, version FROM (
        SELECT l.vec_id, l.version, cb.cell,
               ROW_NUMBER() OVER (
                 PARTITION BY l.vec_id
                 ORDER BY {_SQL_DOT.format(a="l.v", b="cb.cv")} DESC,
                          cb.cell) AS rn
        FROM latest l, cb)
      WHERE rn = 1)
    SELECT vec_id, CAST(cell AS INT) AS cell,
           CAST(version AS INT) AS version
    FROM assigned
    """


@register("sim_ivf_delta_index", oracle=_ivf_delta_oracle())
def sim_ivf_delta_index(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental IVF index maintenance, batch twin: a change feed
    (re-embedded vectors move cells, deletes tombstone) folds into the
    cell-partitioned index via latest-wins merge + fixed-codebook
    assignment. The codebook comes from the BASE corpus only —
    retraining is an offline concern; incremental maintenance assigns
    against the current codebook (the production split FAISS/Milvus
    deployments use).

    Deterministic synthetic feed: base corpus at version 0; batch 1
    re-embeds every 7th vector as its negation (guaranteed cell moves —
    the dot flips sign); batch 2 deletes every 13th vector.

    Shape at scale: merge is ONE hash agg on vec_id (cdc.upsert_latest
    — no window, no join); assignment is a broadcast-codebook Arrow
    pass riding the scan. The streaming foreachBatch version with
    touched-cells-only rewrite is streaming/vector_index.py, pinned
    hash-equal to this batch recipe in test_streaming."""
    from dns_log_transformer_spark.operators import cdc, similarity

    emb = table(spark, sf, "embeddings")
    e = emb.select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("embedding"),
    )
    feed = (
        e.select(
            "vec_id",
            "embedding",
            F.lit(0).alias("version"),
            F.lit("U").alias("op"),
        )
        .unionAll(
            e.filter(F.col("vec_id") % 7 == 0).select(
                "vec_id",
                F.transform("embedding", lambda x: -x).alias("embedding"),
                F.lit(1).alias("version"),
                F.lit("U").alias("op"),
            )
        )
        .unionAll(
            e.filter(F.col("vec_id") % 13 == 0).select(
                "vec_id",
                "embedding",
                F.lit(2).alias("version"),
                F.lit("D").alias("op"),
            )
        )
    )
    latest = cdc.upsert_latest(feed, ["vec_id"], "version", "op", "D")
    codebook = similarity.pq_codebook(e, n_cells=10)
    return similarity.ivf_assign(latest, codebook).select(
        "vec_id", "cell", "version"
    )


# ---------------------------------------------------------------------------
# k-NN label propagation (majority vote over exact-cosine neighbors)
# ---------------------------------------------------------------------------
def _knn_oracle() -> str:
    from dns_log_transformer_spark.queries.llm_ops import _SQL_DOT

    return f"""
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings),
    q AS (SELECT vec_id AS query_id, v AS qv FROM e
          WHERE vec_id % 50 = 0 AND vec_id < 2000),
    scored AS (
      SELECT q.query_id, e.vec_id,
             ROUND({_SQL_DOT.format(a="e.v", b="q.qv")}
               / (sqrt({_SQL_DOT.format(a="e.v", b="e.v")})
                  * sqrt({_SQL_DOT.format(a="q.qv", b="q.qv")})), 4)
               AS cos_sim
      FROM e, q WHERE e.vec_id <> q.query_id),
    top5 AS (
      SELECT query_id, vec_id FROM (
        SELECT query_id, vec_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cos_sim DESC, vec_id) AS rnk
        FROM scored)
      WHERE rnk <= 5),
    votes AS (
      SELECT t.query_id, emb.label, CAST(COUNT(*) AS BIGINT) AS n_votes
      FROM top5 t JOIN embeddings emb ON emb.vec_id = t.vec_id
      GROUP BY 1, 2)
    SELECT query_id, label AS pred_label, n_votes FROM (
      SELECT query_id, label, n_votes,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY n_votes DESC, label ASC) AS rn
      FROM votes)
    WHERE rn = 1
    """


@register("emb_knn_label", oracle=_knn_oracle())
def emb_knn_label(spark: SparkSession, sf: str) -> DataFrame:
    """k-NN label propagation over the embedding table's label column
    (the ANN-family fixed query workload): majority label of the 5
    exact-cosine nearest neighbors, ties to the smallest label. The
    label join broadcasts the |Q| x k neighbor rows into the corpus
    scan; see operators/similarity.py knn_predict_labels."""
    from dns_log_transformer_spark.operators import similarity

    emb = table(spark, sf, "embeddings")
    queries = emb.filter(
        (F.col("vec_id") % 50 == 0) & (F.col("vec_id") < 2000)
    )
    return similarity.knn_predict_labels(emb, queries, k=5)


# ---------------------------------------------------------------------------
# Two-stage ANN: int8 integer-dot prefilter -> exact cosine rerank
# ---------------------------------------------------------------------------
def _int8_rerank_oracle() -> str:
    from dns_log_transformer_spark.queries.advanced import _INT8_CODE_SQL
    from dns_log_transformer_spark.queries.llm_ops import _SQL_DOT

    return f"""
    WITH {_INT8_CODE_SQL},
    q8 AS (SELECT vec_id AS query_id, code AS q_code FROM codes
           WHERE vec_id % 50 = 0 AND vec_id < 2000),
    pre AS (
      SELECT query_id, vec_id FROM (
        SELECT q8.query_id, c.vec_id,
               ROW_NUMBER() OVER (PARTITION BY q8.query_id
                 ORDER BY CAST(list_sum(list_transform(
                            list_zip(c.code, q8.q_code),
                            p -> CAST(p[1] AS BIGINT) * p[2])) AS BIGINT)
                            DESC,
                          c.vec_id) AS prnk
        FROM codes c, q8 WHERE c.vec_id <> q8.query_id)
      WHERE prnk <= 20),
    qv AS (SELECT vec_id AS query_id, v AS qv FROM e
           WHERE vec_id % 50 = 0 AND vec_id < 2000),
    rer AS (
      SELECT pre.query_id, pre.vec_id,
             ROUND({_SQL_DOT.format(a="e.v", b="qv.qv")}
               / (sqrt({_SQL_DOT.format(a="e.v", b="e.v")})
                  * sqrt({_SQL_DOT.format(a="qv.qv", b="qv.qv")})), 4)
               AS cos_sim
      FROM pre JOIN e ON e.vec_id = pre.vec_id
               JOIN qv ON qv.query_id = pre.query_id)
    SELECT query_id, vec_id, cos_sim, rnk FROM (
      SELECT query_id, vec_id, cos_sim,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cos_sim DESC, vec_id) AS rnk
      FROM rer)
    WHERE rnk <= 5
    """


@register("sim_int8_rerank", oracle=_int8_rerank_oracle())
def sim_int8_rerank(spark: SparkSession, sf: str) -> DataFrame:
    """Two-stage ANN (the canonical production shape): int8 integer-dot
    prefilter to 20 candidates per query, exact float-cosine rerank to
    top 5. The compressed first pass bounds the scan's memory traffic;
    the exact second pass touches only |Q| x 20 candidate ids via a
    broadcast semi-join into the corpus scan. See
    operators/similarity.py int8_rerank_topk for the recall contract
    and scale shape."""
    from dns_log_transformer_spark.operators import similarity

    emb = table(spark, sf, "embeddings")
    queries = emb.filter(
        (F.col("vec_id") % 50 == 0) & (F.col("vec_id") < 2000)
    )
    return similarity.int8_rerank_topk(emb, queries, k=5, prefilter=20)


# ---------------------------------------------------------------------------
# Per-group OLS regression / correlation (exact integer-cent sums)
# ---------------------------------------------------------------------------
@register(
    "q_regr_trends",
    oracle="""
    WITH pts AS (
      SELECT l_returnflag AS returnflag,
             CAST(year(l_shipdate) AS INT) AS ship_year,
             CAST(ROUND(l_quantity * 100) AS BIGINT) AS x,
             CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS y
      FROM lineitem),
    sums AS (
      SELECT returnflag, ship_year,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(COUNT(*) AS DOUBLE) AS n_d,
             CAST(SUM(CAST(x AS DECIMAL(18,0))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(y AS DECIMAL(18,0))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(x * y AS DECIMAL(18,0))) AS DOUBLE) AS sxy,
             CAST(SUM(CAST(x * x AS DECIMAL(18,0))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(y * y AS DECIMAL(18,0))) AS DOUBLE) AS syy
      FROM pts GROUP BY 1, 2),
    d2 AS (
      SELECT returnflag, ship_year, n, n_d, sx, sy,
             n_d * sxy - sx * sy AS cov_n,
             n_d * sxx - sx * sx AS varx_n,
             n_d * syy - sy * sy AS vary_n
      FROM sums)
    SELECT returnflag, ship_year, n,
           ROUND(cov_n / varx_n, 4) AS slope,
           ROUND((sy - cov_n / varx_n * sx) / n_d / 100.0, 4) AS intercept,
           ROUND(cov_n / (sqrt(varx_n) * sqrt(vary_n)), 4) AS corr_xy
    FROM d2
    """,
)
def q_regr_trends(spark: SparkSession, sf: str) -> DataFrame:
    """Per-(returnflag, ship year) OLS regression of extended price on
    quantity, plus Pearson correlation — the statistical-aggregate
    family (regr_slope / regr_intercept / corr) in an engine-exact
    formulation: both engines aggregate EXACT integer cents into
    DECIMAL(18,0) per-row products (no fp fold-order dependence, no
    int64 overflow at any corpus size — the decimal sum holds 38
    digits), cast the exact sums to double ONCE, and evaluate the
    identical closed-form expressions (slope = cov_n/varx_n etc.),
    ROUND(_, 4). Spark's builtin regr_slope would fold doubles in
    partition order — nondeterministic across engines AND runs; this
    formulation is the scale-safe exact twin: one map-side-combined
    hash aggregation, group count bounded by flags x years, zero
    driver state.
    """
    li = table(spark, sf, "lineitem")
    pts = li.select(
        F.col("l_returnflag").alias("returnflag"),
        F.year("l_shipdate").cast("int").alias("ship_year"),
        F.round(F.col("l_quantity") * 100, 0).cast("bigint").alias("x"),
        F.round(F.col("l_extendedprice") * 100, 0).cast("bigint").alias("y"),
    )
    sums = pts.groupBy("returnflag", "ship_year").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("double").alias("n_d"),
        F.sum(F.col("x").cast("decimal(18,0)")).cast("double").alias("sx"),
        F.sum(F.col("y").cast("decimal(18,0)")).cast("double").alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(18,0)"))
        .cast("double")
        .alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(18,0)"))
        .cast("double")
        .alias("sxx"),
        F.sum((F.col("y") * F.col("y")).cast("decimal(18,0)"))
        .cast("double")
        .alias("syy"),
    )
    d2 = sums.select(
        "returnflag",
        "ship_year",
        "n",
        "n_d",
        "sx",
        "sy",
        (F.col("n_d") * F.col("sxy") - F.col("sx") * F.col("sy")).alias(
            "cov_n"
        ),
        (F.col("n_d") * F.col("sxx") - F.col("sx") * F.col("sx")).alias(
            "varx_n"
        ),
        (F.col("n_d") * F.col("syy") - F.col("sy") * F.col("sy")).alias(
            "vary_n"
        ),
    )
    return d2.select(
        "returnflag",
        "ship_year",
        "n",
        F.round(F.col("cov_n") / F.col("varx_n"), 4).alias("slope"),
        F.round(
            (F.col("sy") - F.col("cov_n") / F.col("varx_n") * F.col("sx"))
            / F.col("n_d")
            / 100.0,
            4,
        ).alias("intercept"),
        F.round(
            F.col("cov_n")
            / (F.sqrt(F.col("varx_n")) * F.sqrt(F.col("vary_n"))),
            4,
        ).alias("corr_xy"),
    )


# ---------------------------------------------------------------------------
# Per-document TF-IDF top terms
# ---------------------------------------------------------------------------
_SQL_TOKENS_R6 = (
    r"(CASE WHEN trim(text) IS NULL OR trim(text) = '' "
    r"THEN CAST([] AS VARCHAR[]) "
    r"ELSE string_split_regex(trim(text), '\s+') END)"
)


@register(
    "text_tfidf_topterms",
    oracle=f"""
    WITH tf AS (
      SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM (
        SELECT doc_id, unnest({_SQL_TOKENS_R6}) AS term FROM documents)
      GROUP BY doc_id, term),
    dfreq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df_t
              FROM tf GROUP BY term),
    n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term,
             ROUND(tf.tf * ln(n.n_docs / dfreq.df_t), 4) AS tfidf
      FROM tf JOIN dfreq USING (term), n)
    SELECT doc_id, term, tfidf, CAST(rnk AS INT) AS rnk FROM (
      SELECT doc_id, term, tfidf,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY tfidf DESC, term ASC) AS rnk
      FROM scored)
    WHERE rnk <= 3
    """,
)
def text_tfidf_topterms(spark: SparkSession, sf: str) -> DataFrame:
    """Per-document top-3 TF-IDF terms (tf x ln(N/df), score rounded to
    4 decimals, term-ascending tie-break) — classic salient-term
    extraction; see operators/text.py tfidf_topterms for the scale
    shape (vocab-keyed join, doc-keyed top-k window)."""
    from dns_log_transformer_spark.operators import text

    docs = table(spark, sf, "documents")
    return text.tfidf_topterms(docs, n_docs=docs.count(), k=3)


# ---------------------------------------------------------------------------
# Character-entropy quality scoring
# ---------------------------------------------------------------------------
@register(
    "text_char_entropy",
    oracle="""
    WITH ch AS (
      SELECT doc_id,
             unnest(list_transform(range(1, length(text) + 1),
                    i -> substr(text, CAST(i AS INT), 1))) AS ch
      FROM documents WHERE length(text) > 0),
    cnt AS (SELECT doc_id, ch, COUNT(*) AS c FROM ch GROUP BY 1, 2)
    SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_chars,
           ROUND(ln(SUM(c)) - SUM(c * ln(c)) / SUM(c), 4) AS entropy
    FROM cnt GROUP BY doc_id
    """,
)
def text_char_entropy(spark: SparkSession, sf: str) -> DataFrame:
    """Per-document Shannon character entropy (nats) — the cheap
    gibberish/spam signal (H = ln n - sum c ln c / n over char counts);
    see operators/text.py char_entropy."""
    from dns_log_transformer_spark.operators import text

    docs = table(spark, sf, "documents")
    return text.char_entropy(docs)


# ---------------------------------------------------------------------------
# Sorted-neighborhood dedup (blocking-sort + edit-distance verify)
# ---------------------------------------------------------------------------
@register(
    "dedup_sorted_neighborhood",
    oracle=r"""
    WITH n AS (
      SELECT doc_id,
             COALESCE(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'),
                      '') AS t
      FROM documents),
    b AS (SELECT doc_id, substr(t, 1, 24) AS bk,
                 substr(t, 1, 40) AS prefix FROM n),
    r AS (SELECT doc_id, prefix,
                 ROW_NUMBER() OVER (ORDER BY bk, doc_id) AS rn FROM b),
    cand AS (
      SELECT a.doc_id AS ida, b.doc_id AS idb,
             levenshtein(a.prefix, b.prefix) AS ed
      FROM r a JOIN r b ON b.rn > a.rn AND b.rn <= a.rn + 3)
    SELECT LEAST(ida, idb) AS doc_a, GREATEST(ida, idb) AS doc_b,
           CAST(ed AS INT) AS edit_distance
    FROM cand WHERE ed <= 20
    """,
)
def dedup_sorted_neighborhood(spark: SparkSession, sf: str) -> DataFrame:
    """Sorted-neighborhood dedup (the entity-resolution classic): range-
    partitioned global sort on a normalized 24-char blocking key, each
    row paired with its next 3 sort neighbors, Levenshtein verify on the
    40-char normalized prefix, distance <= 20. Catches shared-prefix
    variants token-hash blocking misses. See
    operators/dedup.py sorted_neighborhood_pairs for the scale shape
    (global_rank sort, explode+equi-join candidates — no range join)."""
    from dns_log_transformer_spark.operators import dedup

    docs = table(spark, sf, "documents")
    return dedup.sorted_neighborhood_pairs(
        docs, key_len=24, prefix_len=40, window=3, max_distance=20
    )


# ---------------------------------------------------------------------------
# TF-IDF cosine rerank of MinHash-LSH candidates (two-stage dedup verify)
# ---------------------------------------------------------------------------
def _tfidf_rerank_oracle() -> str:
    from dns_log_transformer_spark.queries.llm_ops import _MH_PAIRS_CTES

    return rf"""
    WITH {_MH_PAIRS_CTES},
    tok AS (SELECT doc_id, unnest({_SQL_TOKENS_R6}) AS term FROM documents),
    tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
           FROM tok GROUP BY 1, 2),
    dfreq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df_t
              FROM tf GROUP BY 1),
    nd AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents),
    w AS (SELECT tf.doc_id, tf.term,
                 CAST(ROUND(tf.tf * ln(nd.n_docs / dfreq.df_t) * 10000)
                      AS BIGINT) AS w
          FROM tf JOIN dfreq USING (term), nd),
    nrm AS (SELECT doc_id, SUM(CAST(w * w AS DECIMAL(38,0))) AS nsq
            FROM w GROUP BY doc_id),
    dots AS (SELECT c.doc_a, c.doc_b,
                    SUM(CAST(wa.w * wb.w AS DECIMAL(38,0))) AS dot
             FROM cand c JOIN w wa ON wa.doc_id = c.doc_a
                         JOIN w wb ON wb.doc_id = c.doc_b
                                  AND wb.term = wa.term
             GROUP BY 1, 2)
    SELECT c.doc_a, c.doc_b,
           CASE WHEN na.nsq > 0 AND nb.nsq > 0
                THEN ROUND(CAST(COALESCE(d.dot, 0) AS DOUBLE)
                           / (sqrt(CAST(na.nsq AS DOUBLE))
                              * sqrt(CAST(nb.nsq AS DOUBLE))), 4)
                ELSE 0.0 END AS cosine
    FROM cand c JOIN nrm na ON na.doc_id = c.doc_a
                JOIN nrm nb ON nb.doc_id = c.doc_b
                LEFT JOIN dots d ON d.doc_a = c.doc_a AND d.doc_b = c.doc_b
    """


@register("text_tfidf_cosine_rerank", oracle=_tfidf_rerank_oracle())
def text_tfidf_cosine_rerank(spark: SparkSession, sf: str) -> DataFrame:
    """Two-stage dedup verify: MinHash-LSH band candidates (the attested
    blocking stage) -> EXACT integer-quantized TF-IDF cosine per
    candidate pair. Deliberately candidate-restricted — an unblocked
    term-postings cosine join fans out df(term)^2 per term, quadratic on
    common vocabulary (operators/text.py tfidf_cosine_rerank docstring).
    Weights/dots/norms are exact DECIMAL sums of quantized integers; the
    only double step is the final division, ROUND(_, 4)."""
    from dns_log_transformer_spark.operators import dedup, text

    docs = table(spark, sf, "documents")
    cand = dedup.minhash_lsh_candidates(docs)
    return text.tfidf_cosine_rerank(docs, cand, n_docs=docs.count())


# ---------------------------------------------------------------------------
# Key-skew profiler (heavy hitters + skew ratios — the salting advisor)
# ---------------------------------------------------------------------------
@register(
    "q_key_skew_report",
    oracle="""
    WITH c AS (
      SELECT l_suppkey AS key, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM lineitem GROUP BY 1),
    s AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n_rows,
                 CAST(COUNT(*) AS BIGINT) AS n_keys FROM c),
    top5 AS (
      SELECT key, cnt FROM c ORDER BY cnt DESC, key ASC LIMIT 5)
    SELECT t.key, t.cnt, s.n_rows, s.n_keys,
           ROUND(t.cnt * 100.0 / s.n_rows, 4) AS share_pct,
           ROUND(t.cnt * CAST(s.n_keys AS DOUBLE) / s.n_rows, 4)
             AS skew_ratio
    FROM top5 t, s
    """,
)
def q_key_skew_report(spark: SparkSession, sf: str) -> DataFrame:
    """Shuffle-key skew profiler: per-key counts on lineitem.l_suppkey,
    top-5 heavy hitters with their share of rows and skew ratio
    (count / mean count) — the diagnostic that decides when the salted
    paths (operators/skew.py) are worth their extra shuffle. Shape: one
    map-side-combined count agg; top-5 via TakeOrderedAndProject; the
    1-row stats side broadcasts (documented scalar BNLJ, the
    q22_idle_balances category)."""
    li = table(spark, sf, "lineitem")
    counts = li.groupBy(F.col("l_suppkey").alias("key")).agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    from dns_log_transformer_spark.operators.caching import persist_tracked

    counts = persist_tracked(counts)  # stats agg + top-5 both read it
    stats = counts.agg(
        F.sum("cnt").cast("bigint").alias("n_rows"),
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
    )
    top5 = counts.orderBy(F.desc("cnt"), F.asc("key")).limit(5)
    return top5.crossJoin(F.broadcast(stats)).select(
        "key",
        "cnt",
        "n_rows",
        "n_keys",
        F.round(F.col("cnt") * 100.0 / F.col("n_rows"), 4).alias("share_pct"),
        F.round(
            F.col("cnt") * F.col("n_keys").cast("double") / F.col("n_rows"), 4
        ).alias("skew_ratio"),
    )


# ---------------------------------------------------------------------------
# Referential-integrity audit (orphan detection across a broken snapshot)
# ---------------------------------------------------------------------------
@register(
    "q_ri_audit",
    oracle="""
    WITH oe AS (SELECT o_orderkey FROM orders WHERE o_orderkey % 2 = 0),
    se AS (SELECT s_suppkey FROM supplier WHERE s_suppkey % 10 <> 0),
    c1 AS (
      SELECT 'lineitem_orphan_order' AS check_name,
             CAST(COUNT(*) FILTER (oe.o_orderkey IS NULL) AS BIGINT)
               AS n_orphans,
             CAST(COUNT(*) AS BIGINT) AS n_total
      FROM lineitem l LEFT JOIN oe ON l.l_orderkey = oe.o_orderkey),
    c2 AS (
      SELECT 'lineitem_orphan_supplier' AS check_name,
             CAST(COUNT(*) FILTER (se.s_suppkey IS NULL) AS BIGINT),
             CAST(COUNT(*) AS BIGINT)
      FROM lineitem l LEFT JOIN se ON l.l_suppkey = se.s_suppkey),
    c3 AS (
      SELECT 'orders_orphan_customer' AS check_name,
             CAST(COUNT(*) FILTER (c.c_custkey IS NULL) AS BIGINT),
             CAST(COUNT(*) AS BIGINT)
      FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey),
    c4 AS (
      SELECT 'lineitem_orphan_part' AS check_name,
             CAST(COUNT(*) FILTER (p.p_partkey IS NULL) AS BIGINT),
             CAST(COUNT(*) AS BIGINT)
      FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey),
    u AS (SELECT * FROM c1 UNION ALL SELECT * FROM c2
          UNION ALL SELECT * FROM c3 UNION ALL SELECT * FROM c4)
    SELECT check_name, n_orphans, n_total,
           ROUND(n_orphans * 100.0 / n_total, 4) AS orphan_pct
    FROM u
    """,
)
def q_ri_audit(spark: SparkSession, sf: str) -> DataFrame:
    """Referential-integrity audit over a deliberately broken snapshot
    (orders halved on even keys, supplier missing every 10th) plus two
    intact FKs as controls: per-FK orphan counts via left join +
    conditional count — the data-quality gate a warehouse runs after
    every partial reload. Shape: each check is one join (dims broadcast
    when small, shuffle-hash otherwise) into a one-row global aggregate;
    the 4 one-row results union. Orphan side never shuffles twice."""
    li = table(spark, sf, "lineitem")
    orders = table(spark, sf, "orders")
    cust = table(spark, sf, "customer")
    part = table(spark, sf, "part")
    supp = table(spark, sf, "supplier")

    def check(name, fact, fk, dim, pk):
        dk = dim.select(F.col(pk))
        return (
            fact.select(F.col(fk))
            .join(dk, fact[fk] == dk[pk], "left")
            .agg(
                F.lit(name).alias("check_name"),
                F.sum(F.when(F.col(pk).isNull(), 1).otherwise(0))
                .cast("bigint")
                .alias("n_orphans"),
                F.count(F.lit(1)).cast("bigint").alias("n_total"),
            )
        )

    oe = orders.filter(F.col("o_orderkey") % 2 == 0)
    se = supp.filter(F.col("s_suppkey") % 10 != 0)
    u = (
        check("lineitem_orphan_order", li, "l_orderkey", oe, "o_orderkey")
        .unionAll(
            check("lineitem_orphan_supplier", li, "l_suppkey", se, "s_suppkey")
        )
        .unionAll(
            check("orders_orphan_customer", orders, "o_custkey", cust, "c_custkey")
        )
        .unionAll(check("lineitem_orphan_part", li, "l_partkey", part, "p_partkey"))
    )
    return u.select(
        "check_name",
        "n_orphans",
        "n_total",
        F.round(F.col("n_orphans") * 100.0 / F.col("n_total"), 4).alias(
            "orphan_pct"
        ),
    )


# ---------------------------------------------------------------------------
# BPE merge induction (k greedy tokenizer-training steps)
# ---------------------------------------------------------------------------
# text_bpe_merges was consolidated into text_bpe_apply (r10, VERDICT
# r9 #1): the merged registration carries the learned merge table as a
# merges_csv column beside the per-source compression it produces, so
# induction and application attest in one query (_bpe_apply_oracle
# rebuilds the same chained greedy-merge CTEs and string_aggs the
# c{i} winners into the csv).


# ---------------------------------------------------------------------------
# Distribution-drift report (categorical share + mean shift across snapshots)
# ---------------------------------------------------------------------------
@register(
    "q_snapshot_drift",
    oracle="""
    WITH tagged AS (
      SELECT event_type,
             event_id % 3 <> 0 AS in_a,
             event_id % 5 <> 0 AS in_b,
             CAST(ROUND(value * 100) AS BIGINT) AS cents,
             CASE WHEN user_id % 2 = 0
                  THEN CAST(ROUND(value * 100) AS BIGINT) + 10
                  ELSE CAST(ROUND(value * 100) AS BIGINT) END AS cents_b
      FROM events),
    per AS (
      SELECT event_type,
             CAST(COUNT(*) FILTER (in_a) AS BIGINT) AS n_a,
             CAST(COUNT(*) FILTER (in_b) AS BIGINT) AS n_b,
             SUM(CASE WHEN in_a THEN CAST(cents AS DECIMAL(38,0))
                      ELSE 0 END) AS s_a,
             SUM(CASE WHEN in_b THEN CAST(cents_b AS DECIMAL(38,0))
                      ELSE 0 END) AS s_b
      FROM tagged GROUP BY event_type),
    tot AS (SELECT CAST(SUM(n_a) AS BIGINT) AS t_a,
                   CAST(SUM(n_b) AS BIGINT) AS t_b FROM per)
    SELECT p.event_type, p.n_a, p.n_b,
           ROUND(p.n_a * 100.0 / t.t_a, 4) AS share_a_pct,
           ROUND(p.n_b * 100.0 / t.t_b, 4) AS share_b_pct,
           ROUND(p.n_b * 100.0 / t.t_b - p.n_a * 100.0 / t.t_a, 4)
             AS share_drift_pp,
           ROUND(CAST(p.s_a AS DOUBLE) / p.n_a / 100.0, 4) AS mean_a,
           ROUND(CAST(p.s_b AS DOUBLE) / p.n_b / 100.0, 4) AS mean_b
    FROM per p, tot t
    """,
)
def q_snapshot_drift(spark: SparkSession, sf: str) -> DataFrame:
    """Distribution-drift report between two event snapshots (the
    monitoring gate that catches a broken upstream feed BEFORE it
    poisons training data): per-category row share and mean value for
    snapshot A (every event_id % 3 != 0) vs snapshot B (% 5 != 0,
    values shifted +0.10 for even users — the planted drift), with the
    share drift in percentage points. Both snapshots come out of ONE
    scan via conditional aggregation (no second read, no join between
    snapshots); means are exact integer-cent DECIMAL sums divided once
    at the end; the 1-row totals side broadcasts (documented scalar
    BNLJ, the q22 category). Category cardinality bounds every
    post-scan structure."""
    ev = table(spark, sf, "events")
    cents = F.round(F.col("value") * 100, 0).cast("bigint")
    tagged = ev.select(
        "event_type",
        (F.col("event_id") % 3 != 0).alias("in_a"),
        (F.col("event_id") % 5 != 0).alias("in_b"),
        cents.alias("cents"),
        F.when(F.col("user_id") % 2 == 0, cents + 10)
        .otherwise(cents)
        .alias("cents_b"),
    )
    per = tagged.groupBy("event_type").agg(
        F.sum(F.col("in_a").cast("long")).cast("bigint").alias("n_a"),
        F.sum(F.col("in_b").cast("long")).cast("bigint").alias("n_b"),
        F.sum(
            F.when(F.col("in_a"), F.col("cents"))
            .otherwise(0)
            .cast("decimal(38,0)")
        ).alias("s_a"),
        F.sum(
            F.when(F.col("in_b"), F.col("cents_b"))
            .otherwise(0)
            .cast("decimal(38,0)")
        ).alias("s_b"),
    )
    tot = per.agg(
        F.sum("n_a").cast("bigint").alias("t_a"),
        F.sum("n_b").cast("bigint").alias("t_b"),
    )
    return per.crossJoin(F.broadcast(tot)).select(
        "event_type",
        "n_a",
        "n_b",
        F.round(F.col("n_a") * 100.0 / F.col("t_a"), 4).alias("share_a_pct"),
        F.round(F.col("n_b") * 100.0 / F.col("t_b"), 4).alias("share_b_pct"),
        F.round(
            F.col("n_b") * 100.0 / F.col("t_b")
            - F.col("n_a") * 100.0 / F.col("t_a"),
            4,
        ).alias("share_drift_pp"),
        F.round(F.col("s_a").cast("double") / F.col("n_a") / 100.0, 4).alias(
            "mean_a"
        ),
        F.round(F.col("s_b").cast("double") / F.col("n_b") / 100.0, 4).alias(
            "mean_b"
        ),
    )


# ---------------------------------------------------------------------------
# Join-size estimator (per-key count products — the shuffle-planning twin
# of q_key_skew_report)
# ---------------------------------------------------------------------------
@register(
    "q_join_size_estimate",
    oracle="""
    WITH ca AS (SELECT l_orderkey AS key, CAST(COUNT(*) AS BIGINT) AS cnt_l
                FROM lineitem GROUP BY 1),
    cb AS (SELECT o_orderkey AS key, CAST(COUNT(*) AS BIGINT) AS cnt_o
           FROM orders GROUP BY 1),
    prod AS (
      SELECT ca.key, ca.cnt_l, cb.cnt_o,
             CAST(ca.cnt_l * cb.cnt_o AS BIGINT) AS out_rows
      FROM ca JOIN cb USING (key)),
    tot AS (SELECT CAST(SUM(out_rows) AS BIGINT) AS est_total FROM prod)
    SELECT p.key, p.cnt_l, p.cnt_o, p.out_rows, t.est_total,
           ROUND(p.out_rows * 100.0 / t.est_total, 4) AS share_pct
    FROM prod p, tot t
    ORDER BY p.out_rows DESC, p.key ASC LIMIT 10
    """,
)
def q_join_size_estimate(spark: SparkSession, sf: str) -> DataFrame:
    """Join-output-size estimation WITHOUT running the join (the
    planning primitive behind broadcast/salt decisions): per-key count
    products of lineitem x orders on orderkey — exact |A join B| =
    sum_key cnt_a * cnt_b — with the top-10 contributing keys and each
    key's share of the estimated output. Shape: two map-side-combined
    count aggs (each a tiny fraction of the join's own shuffle, since
    only (key, count) rows move), one equi-join on the distinct-key
    tables, TakeOrderedAndProject top-10; the 1-row total broadcasts
    (documented scalar BNLJ). Together with q_key_skew_report this is
    the pre-flight a 100 TB join gets before committing to a shuffle
    strategy."""
    li = table(spark, sf, "lineitem")
    orders = table(spark, sf, "orders")
    ca = li.groupBy(F.col("l_orderkey").alias("key")).agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt_l")
    )
    cb = orders.groupBy(F.col("o_orderkey").alias("key")).agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt_o")
    )
    prod = ca.join(cb, "key").select(
        "key",
        "cnt_l",
        "cnt_o",
        (F.col("cnt_l") * F.col("cnt_o")).cast("bigint").alias("out_rows"),
    )
    from dns_log_transformer_spark.operators.caching import persist_tracked

    prod = persist_tracked(prod)  # total agg + top-10 both read it
    tot = prod.agg(F.sum("out_rows").cast("bigint").alias("est_total"))
    return (
        prod.crossJoin(F.broadcast(tot))
        .orderBy(F.desc("out_rows"), F.asc("key"))
        .limit(10)
        .select(
            "key",
            "cnt_l",
            "cnt_o",
            "out_rows",
            "est_total",
            F.round(
                F.col("out_rows") * 100.0 / F.col("est_total"), 4
            ).alias("share_pct"),
        )
    )


# ---------------------------------------------------------------------------
# CDC time travel (AS-OF reconstruction at every version cut)
# ---------------------------------------------------------------------------
def _time_travel_oracle() -> str:
    from dns_log_transformer_spark.queries.advanced import _CDC_FEED_SQL

    return f"""
    WITH {_CDC_FEED_SQL},
    fanned AS (
      SELECT f.*, CAST(v.as_of AS INT) AS as_of
      FROM feed f, unnest(range(f.version, 3)) AS v(as_of)),
    merged AS (
      SELECT as_of, o_orderkey,
             arg_max(o_orderstatus, version) AS o_orderstatus,
             arg_max(cents, version) AS cents,
             arg_max(op, version) AS op
      FROM fanned GROUP BY as_of, o_orderkey)
    SELECT as_of, o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(cents) AS BIGINT) AS sum_cents
    FROM merged WHERE op <> 'D'
    GROUP BY as_of, o_orderstatus
    """


@register("cdc_time_travel", oracle=_time_travel_oracle())
def cdc_time_travel(spark: SparkSession, sf: str) -> DataFrame:
    """Time-travel reads over the CDC feed (the AS OF query a
    transactional table format answers from its version log): the table
    state reconstructed at EVERY version cut (0 = base snapshot,
    1 = after the reprice batch, 2 = after deletes) in ONE pass — each
    change row fans out to the versions it is visible at via
    ``explode(sequence(version, max))`` (codegen, fan-out bounded by
    the version count), then the attested latest-wins merge
    (operators/cdc.py) keyed on (as_of, key). Per-(as_of, status)
    counts + exact cent sums attest each reconstruction. One hash
    shuffle total; no per-version rescans."""
    from dns_log_transformer_spark.operators import cdc
    from dns_log_transformer_spark.queries.advanced import _cdc_feed

    feed = _cdc_feed(table(spark, sf, "orders"))
    fanned = feed.withColumn(
        "as_of", F.explode(F.sequence(F.col("version"), F.lit(2)))
    ).withColumn("as_of", F.col("as_of").cast("int"))
    merged = cdc.upsert_latest(fanned, ["as_of", "o_orderkey"])
    return (
        merged.groupBy("as_of", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum("cents").cast("bigint").alias("sum_cents"),
        )
    )


# ---------------------------------------------------------------------------
# Session path mining (3-step event-type sequences)
# ---------------------------------------------------------------------------
@register(
    "q_event_paths",
    oracle="""
    WITH w AS (
      SELECT event_type AS e1,
             LEAD(event_type, 1) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS e2,
             LEAD(event_type, 2) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS e3
      FROM events)
    SELECT e1, e2, e3, CAST(COUNT(*) AS BIGINT) AS n_paths
    FROM w WHERE e3 IS NOT NULL
    GROUP BY 1, 2, 3
    ORDER BY n_paths DESC, e1, e2, e3 LIMIT 15
    """,
)
def q_event_paths(spark: SparkSession, sf: str) -> DataFrame:
    """Top-15 three-step user paths (the sequence-mining extension of
    q_event_transitions' bigrams): per-user LEAD window over (ts,
    event_id) — a total order, so ties are deterministic — then a
    map-side-combined path count and TakeOrderedAndProject. The window
    partitions by user_id (cardinality scales with the corpus; no
    global sort)."""
    from pyspark.sql import Window

    ev = table(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    paths = ev.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).filter(F.col("e3").isNotNull())
    return (
        paths.groupBy("e1", "e2", "e3")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_paths"))
        .orderBy(F.desc("n_paths"), "e1", "e2", "e3")
        .limit(15)
    )


# ---------------------------------------------------------------------------
# Market-basket co-occurrence (top-k co-purchased part pairs)
# ---------------------------------------------------------------------------

# The order-key self-join's fan-out is basket-size squared: one
# pathological mega-basket (a wholesale order with 10^5 items) goes
# quadratic while every normal basket stays tiny. Guard: keep only the
# ``BASKET_CAP`` smallest distinct partkeys per order ahead of the
# self-join — deterministic, mirrored in the DuckDB oracles below, and
# far above fixture occupancy (TPC-H baskets are <= 7 items) so the
# attested hashes are unchanged. Same guard class as the LSH/pHash
# hot-bucket caps (multimodal.py phash_pairs), except truncation (not
# exclusion) is right here: a capped basket still contributes its
# strongest pairs, while an excluded one would vanish from support
# counts entirely.
BASKET_CAP = 32

_CAPPED_ITEMS_CTE = f"""
    items0 AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    items AS (
      SELECT l_orderkey, l_partkey FROM (
        SELECT l_orderkey, l_partkey,
               ROW_NUMBER() OVER (PARTITION BY l_orderkey
                                  ORDER BY l_partkey) AS rn
        FROM items0)
      WHERE rn <= {BASKET_CAP})"""


def _capped_items(li: DataFrame) -> DataFrame:
    """Distinct (order, part) items, truncated to the BASKET_CAP
    smallest partkeys per order. The row_number window shuffles on
    l_orderkey — the same partitioning the downstream self-join needs,
    so the cap rides the shuffle the join pays anyway."""
    from pyspark.sql import Window

    w = Window.partitionBy("l_orderkey").orderBy("l_partkey")
    return (
        li.select("l_orderkey", "l_partkey")
        .distinct()
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= BASKET_CAP)
        .drop("rn")
    )


@register(
    "q_copurchase_pairs",
    oracle=f"""
    WITH {_CAPPED_ITEMS_CTE},
    pairs AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey)
    SELECT part_a, part_b, CAST(COUNT(*) AS BIGINT) AS support
    FROM pairs GROUP BY 1, 2
    ORDER BY support DESC, part_a, part_b LIMIT 15
    """,
)
def q_copurchase_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """Association mining's pairwise core: top-15 part pairs co-occurring
    in the same order with their support counts (the candidate-pair
    stage of Apriori/FP-growth). Shape: distinct (order, part) items
    truncated to BASKET_CAP per order (see _capped_items — the
    mega-basket quadratic guard), self-join on the ORDER key — fan-out
    is now bounded by cap choose 2 per order — then a
    map-side-combined pair count and TakeOrderedAndProject. The items
    table is persisted once for both join sides."""
    from dns_log_transformer_spark.operators.caching import persist_tracked

    li = table(spark, sf, "lineitem")
    items = persist_tracked(_capped_items(li))
    a = items.select(
        "l_orderkey", F.col("l_partkey").alias("part_a")
    )
    b = items.select(
        "l_orderkey", F.col("l_partkey").alias("part_b")
    )
    pairs = a.join(b, "l_orderkey").filter(F.col("part_a") < F.col("part_b"))
    return (
        pairs.groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("support"))
        .orderBy(F.desc("support"), "part_a", "part_b")
        .limit(15)
    )


# ---------------------------------------------------------------------------
# Recency-decayed popularity (exponential kernel, integer-quantized)
# ---------------------------------------------------------------------------
@register(
    "q_decayed_popularity",
    oracle="""
    WITH mx AS (SELECT CAST(MAX(ts) AS DATE) AS ref_d FROM events),
    w AS (
      SELECT event_type,
             CAST(ROUND(exp(-date_diff('day', CAST(ts AS DATE), mx.ref_d)
                            / 30.0) * 1000000) AS BIGINT) AS wgt
      FROM events, mx)
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(wgt) AS BIGINT) AS decayed_score
    FROM w GROUP BY event_type
    """,
)
def q_decayed_popularity(spark: SparkSession, sf: str) -> DataFrame:
    """Recency-weighted popularity per event type: each event carries
    exp(-age_days / 30) — 30-day e-folding — quantized to an integer
    micro-weight BEFORE summing, so the aggregate is an exact
    order-independent integer sum (the repo's standard defense against
    fp fold-order divergence; the one per-row double, exp of an exact
    integer-day age, evaluates identically in both engines' libm). The
    reference date is the corpus max timestamp (1-row scalar broadcast,
    the documented BNLJ category). The trending-score shape every
    event-log product computes."""
    ev = table(spark, sf, "events")
    mx = ev.agg(F.max("ts").cast("date").alias("ref_d"))
    w = ev.crossJoin(F.broadcast(mx)).select(
        "event_type",
        F.round(
            F.exp(-F.datediff(F.col("ref_d"), F.col("ts").cast("date")) / 30.0)
            * 1_000_000,
            0,
        )
        .cast("bigint")
        .alias("wgt"),
    )
    return w.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum("wgt").cast("bigint").alias("decayed_score"),
    )


# ---------------------------------------------------------------------------
# Cohort retention (first-activity-week cohorts x weekly activity offsets)
# ---------------------------------------------------------------------------
@register(
    "q_cohort_retention",
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             CAST(MIN(date_trunc('week', ts)) AS DATE) AS cohort_week
      FROM events GROUP BY user_id),
    sizes AS (SELECT cohort_week, CAST(COUNT(*) AS BIGINT) AS cohort_size
              FROM firsts GROUP BY cohort_week),
    cells AS (
      SELECT f.cohort_week,
             CAST(date_diff('day', f.cohort_week,
                    CAST(date_trunc('week', e.ts) AS DATE)) / 7 AS INT)
               AS week_offset,
             CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS active_users
      FROM events e JOIN firsts f USING (user_id)
      GROUP BY 1, 2)
    SELECT c.cohort_week, c.week_offset, c.active_users, s.cohort_size,
           ROUND(c.active_users * 100.0 / s.cohort_size, 4)
             AS retention_pct
    FROM cells c JOIN sizes s USING (cohort_week)
    """,
)
def q_cohort_retention(spark: SparkSession, sf: str) -> DataFrame:
    """Cohort retention matrix (the product-analytics classic): users
    cohorted by first-activity ISO week, each cohort's distinct active
    users counted at every subsequent week offset, as a share of cohort
    size. Shape: one min-agg per user (map-side combined), the firsts
    table persisted for its two consumers (cohort sizes + the activity
    join), a user-keyed equi-join back onto events, one distinct-count
    agg per (cohort, offset) cell, and a cohort-keyed dim join for the
    ratio. Week truncation is ISO-Monday in both engines."""
    from dns_log_transformer_spark.operators.caching import persist_tracked

    ev = table(spark, sf, "events")
    firsts = persist_tracked(
        ev.groupBy("user_id").agg(
            F.min(F.date_trunc("week", F.col("ts")))
            .cast("date")
            .alias("cohort_week")
        )
    )
    sizes = firsts.groupBy("cohort_week").agg(
        F.count(F.lit(1)).cast("bigint").alias("cohort_size")
    )
    cells = (
        ev.join(firsts, "user_id")
        .select(
            "cohort_week",
            (
                F.datediff(
                    F.date_trunc("week", F.col("ts")).cast("date"),
                    F.col("cohort_week"),
                )
                / 7
            )
            .cast("int")
            .alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").cast("bigint").alias("active_users"))
    )
    return cells.join(sizes, "cohort_week").select(
        "cohort_week",
        "week_offset",
        "active_users",
        "cohort_size",
        F.round(
            F.col("active_users") * 100.0 / F.col("cohort_size"), 4
        ).alias("retention_pct"),
    )


# ---------------------------------------------------------------------------
# Leave-one-fold-out target encoding (leakage-safe categorical features)
# ---------------------------------------------------------------------------
@register(
    "q_target_encode_lofo",
    oracle="""
    WITH pts AS (
      SELECT o_orderpriority AS cat,
             CAST(o_orderkey % 5 AS INT) AS fold,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders),
    per AS (
      SELECT cat, fold,
             CAST(COUNT(*) AS BIGINT) AS n_fold,
             SUM(CAST(cents AS DECIMAL(38,0))) AS s_fold
      FROM pts GROUP BY 1, 2),
    tot AS (
      SELECT cat, CAST(SUM(n_fold) AS BIGINT) AS n_tot,
             SUM(s_fold) AS s_tot
      FROM per GROUP BY cat)
    SELECT p.cat, p.fold, p.n_fold,
           ROUND(CAST(t.s_tot - p.s_fold AS DOUBLE)
                 / (t.n_tot - p.n_fold) / 100.0, 4) AS target_enc
    FROM per p JOIN tot t USING (cat)
    """,
)
def q_target_encode_lofo(spark: SparkSession, sf: str) -> DataFrame:
    """Leakage-safe target encoding (the feature-engineering staple): a
    category's encoded value for fold k is the target mean over every
    OTHER fold — (total sum - fold sum) / (total n - fold n) — so a
    row never sees its own fold's targets. Folds are deterministic
    (key % 5). Exact integer-cent DECIMAL sums; one double division at
    the end, ROUND 4. Shape: one (cat, fold) map-side-combined agg, a
    category-keyed rollup of those tiny partials, and a category-keyed
    join — everything after the first agg is bounded by |cats| x
    folds."""
    o = table(spark, sf, "orders")
    pts = o.select(
        F.col("o_orderpriority").alias("cat"),
        (F.col("o_orderkey") % 5).cast("int").alias("fold"),
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("cents"),
    )
    per = pts.groupBy("cat", "fold").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_fold"),
        F.sum(F.col("cents").cast("decimal(38,0)")).alias("s_fold"),
    )
    from dns_log_transformer_spark.operators.caching import persist_tracked

    per = persist_tracked(per)  # feeds the rollup and the final join
    tot = per.groupBy("cat").agg(
        F.sum("n_fold").cast("bigint").alias("n_tot"),
        F.sum("s_fold").alias("s_tot"),
    )
    return per.join(tot, "cat").select(
        "cat",
        "fold",
        "n_fold",
        F.round(
            (F.col("s_tot") - F.col("s_fold")).cast("double")
            / (F.col("n_tot") - F.col("n_fold"))
            / 100.0,
            4,
        ).alias("target_enc"),
    )


# ---------------------------------------------------------------------------
# q_ntile_buckets was consolidated into advanced.py q_rank_functions
# (r10, VERDICT r9 #1): NTILE(10) now rides the same single-Window-node
# rank-family pass; the WindowExec-free production-scale NTILE shape is
# attested by text_quality's decile column.
# ---------------------------------------------------------------------------


# ---------------------------------------------------------------------------
# A/B experiment analysis (two-proportion z-test from exact counts)
# ---------------------------------------------------------------------------
@register(
    "q_ab_test_ztest",
    oracle="""
    WITH assign AS (
      SELECT user_id,
             CASE WHEN CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)),
                            1, 8) AS BIGINT) % 2 = 0
                  THEN 'A' ELSE 'B' END AS arm,
             CAST(CASE WHEN SUM(CASE WHEN event_type = 'purchase'
                                     THEN 1 ELSE 0 END) >= 6
                       THEN 1 ELSE 0 END AS BIGINT) AS converted
      FROM events GROUP BY user_id),
    arms AS (
      SELECT arm, CAST(COUNT(*) AS BIGINT) AS n_users,
             CAST(SUM(converted) AS BIGINT) AS n_conv
      FROM assign GROUP BY arm),
    wide AS (
      SELECT MAX(CASE WHEN arm = 'A' THEN n_users END) AS n_a,
             MAX(CASE WHEN arm = 'A' THEN n_conv END) AS c_a,
             MAX(CASE WHEN arm = 'B' THEN n_users END) AS n_b,
             MAX(CASE WHEN arm = 'B' THEN n_conv END) AS c_b
      FROM arms)
    SELECT n_a, c_a, n_b, c_b,
           CASE WHEN n_a > 0 THEN ROUND(c_a * 100.0 / n_a, 4) END
             AS rate_a_pct,
           CASE WHEN n_b > 0 THEN ROUND(c_b * 100.0 / n_b, 4) END
             AS rate_b_pct,
           CASE WHEN n_a > 0 AND n_b > 0
                     AND c_a + c_b > 0 AND c_a + c_b < n_a + n_b THEN
             ROUND((CAST(c_a AS DOUBLE) / n_a - CAST(c_b AS DOUBLE) / n_b)
               / sqrt((CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
                      * (1 - CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
                      * (1.0 / n_a + 1.0 / n_b)), 4)
           END AS z_stat
    FROM wide
    """,
)
def q_ab_test_ztest(spark: SparkSession, sf: str) -> DataFrame:
    """Experimentation analytics: users hash-split into arms A/B
    (md5-based — the deterministic assignment both engines reproduce
    bit-for-bit), per-user conversion = at least 6 purchase events (the
    synthetic feed gives ~4 purchases/user, so any-purchase would
    convert everyone and zero the pooled variance), pooled
    two-proportion z-statistic from the EXACT counts (the one
    double-precision step is the closed-form z evaluation, ROUND 4).
    Shape: one per-user max agg, one per-arm count agg, a 2-row pivot
    into a single report row — nothing after the first agg scales with
    the corpus."""
    ev = table(spark, sf, "events")
    # arm derives from user_id AFTER the per-user agg (one md5 per
    # distinct user, not per event)
    arm = (
        F.when(
            F.conv(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 8),
                16,
                10,
            ).cast("long")
            % 2
            == 0,
            F.lit("A"),
        )
        .otherwise(F.lit("B"))
        .alias("arm")
    )
    assign = (
        ev.groupBy("user_id")
        .agg(
            (
                F.sum(
                    F.when(F.col("event_type") == "purchase", 1).otherwise(0)
                )
                >= 6
            )
            .cast("bigint")
            .alias("converted"),
        )
        .select(arm, "converted")
    )
    arms = assign.groupBy("arm").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum("converted").cast("bigint").alias("n_conv"),
    )
    wide = arms.agg(
        F.max(F.when(F.col("arm") == "A", F.col("n_users"))).alias("n_a"),
        F.max(F.when(F.col("arm") == "A", F.col("n_conv"))).alias("c_a"),
        F.max(F.when(F.col("arm") == "B", F.col("n_users"))).alias("n_b"),
        F.max(F.when(F.col("arm") == "B", F.col("n_conv"))).alias("c_b"),
    )
    p_pool = (F.col("c_a") + F.col("c_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    )
    z = (
        F.col("c_a").cast("double") / F.col("n_a")
        - F.col("c_b").cast("double") / F.col("n_b")
    ) / F.sqrt(
        p_pool * (1 - p_pool) * (1.0 / F.col("n_a") + 1.0 / F.col("n_b"))
    )
    # degenerate experiment (everyone or no one converted): the pooled
    # variance is 0 and the z-statistic is undefined — NULL, never an
    # ANSI divide-by-zero that kills the job (bit at sf0.001, where no
    # user reaches the conversion threshold; oracle mirrors the CASE).
    # The same guard covers an EMPTY arm (n is NULL from the pivot's
    # MAX-over-nothing, and can never be 0): rates and the 1/n terms
    # stay inside explicit n > 0 CASEs on both engines (ADVICE r9).
    arm_ok = (F.col("n_a") > 0) & (F.col("n_b") > 0)
    pool_ok = (
        arm_ok
        & (F.col("c_a") + F.col("c_b") > 0)
        & (F.col("c_a") + F.col("c_b") < F.col("n_a") + F.col("n_b"))
    )
    return wide.select(
        "n_a",
        "c_a",
        "n_b",
        "c_b",
        F.when(
            F.col("n_a") > 0, F.round(F.col("c_a") * 100.0 / F.col("n_a"), 4)
        ).alias("rate_a_pct"),
        F.when(
            F.col("n_b") > 0, F.round(F.col("c_b") * 100.0 / F.col("n_b"), 4)
        ).alias("rate_b_pct"),
        F.when(pool_ok, F.round(z, 4)).alias("z_stat"),
    )


# ---------------------------------------------------------------------------
# Adamic-Adar link prediction over the order-part bipartite graph
# ---------------------------------------------------------------------------
@register(
    "q_link_prediction_aa",
    oracle=f"""
    WITH {_CAPPED_ITEMS_CTE},
    sizes AS (
      SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS basket
      FROM items GROUP BY 1),
    scored AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             CAST(ROUND(1000000.0 / ln(s.basket)) AS BIGINT) AS w
      FROM items a
      JOIN items b ON a.l_orderkey = b.l_orderkey
                  AND a.l_partkey < b.l_partkey
      JOIN sizes s ON s.l_orderkey = a.l_orderkey
      WHERE s.basket >= 2)
    SELECT part_a, part_b,
           CAST(COUNT(*) AS BIGINT) AS n_common,
           CAST(SUM(w) AS BIGINT) AS aa_score
    FROM scored GROUP BY 1, 2
    ORDER BY aa_score DESC, part_a, part_b LIMIT 15
    """,
)
def q_link_prediction_aa(spark: SparkSession, sf: str) -> DataFrame:
    """Link prediction beyond raw co-occurrence: Adamic-Adar scoring
    over the order-part bipartite graph — a shared SMALL basket is
    stronger evidence than a shared big one, so each common order
    contributes 1/ln(basket_size), quantized to an integer micro-weight
    pre-sum (exact order-independent aggregation; ln of an exact
    integer evaluates identically in both engines' libm). Same
    BASKET_CAP-bounded self-join shape as q_copurchase_pairs (see
    _capped_items) with the per-order size — computed over the CAPPED
    basket, so weight and pair set describe the same graph — joined on
    the already-shuffled order key."""
    from dns_log_transformer_spark.operators.caching import persist_tracked

    li = table(spark, sf, "lineitem")
    items = persist_tracked(_capped_items(li))
    sizes = items.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("basket")
    )
    a = items.select("l_orderkey", F.col("l_partkey").alias("part_a"))
    b = items.select("l_orderkey", F.col("l_partkey").alias("part_b"))
    scored = (
        a.join(b, "l_orderkey")
        .filter(F.col("part_a") < F.col("part_b"))
        .join(sizes.filter(F.col("basket") >= 2), "l_orderkey")
        .select(
            "part_a",
            "part_b",
            F.round(1_000_000.0 / F.log(F.col("basket")), 0)
            .cast("bigint")
            .alias("w"),
        )
    )
    return (
        scored.groupBy("part_a", "part_b")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_common"),
            F.sum("w").cast("bigint").alias("aa_score"),
        )
        .orderBy(F.desc("aa_score"), "part_a", "part_b")
        .limit(15)
    )


# ---------------------------------------------------------------------------
# RFM customer segmentation (rank-based quartiles, scale-safe)
# ---------------------------------------------------------------------------
@register(
    "q_rfm_segments",
    oracle="""
    WITH per AS (
      SELECT o_custkey AS custkey,
             MAX(o_orderdate) AS last_d,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders GROUP BY o_custkey),
    ref AS (SELECT MAX(last_d) AS ref_d, CAST(COUNT(*) AS BIGINT) AS n
            FROM per),
    ranked AS (
      SELECT p.custkey, p.cents, r.n,
             date_diff('day', p.last_d, r.ref_d) AS rec_days,
             ROW_NUMBER() OVER (ORDER BY date_diff('day', p.last_d, r.ref_d),
                                p.custkey) AS r_rank,
             ROW_NUMBER() OVER (ORDER BY p.n_orders DESC, p.custkey)
               AS f_rank,
             ROW_NUMBER() OVER (ORDER BY p.cents DESC, p.custkey) AS m_rank
      FROM per p, ref r),
    seg AS (
      SELECT CAST((r_rank - 1) * 4 // n + 1 AS INT) AS r_q,
             CAST((f_rank - 1) * 4 // n + 1 AS INT) AS f_q,
             CAST((m_rank - 1) * 4 // n + 1 AS INT) AS m_q,
             cents
      FROM ranked)
    SELECT r_q, f_q, m_q,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           ROUND(CAST(SUM(CAST(cents AS DECIMAL(38,0))) AS DOUBLE)
                 / COUNT(*) / 100.0, 4) AS avg_monetary
    FROM seg GROUP BY 1, 2, 3
    """,
)
def q_rfm_segments(spark: SparkSession, sf: str) -> DataFrame:
    """RFM segmentation (the customer-analytics staple): per customer,
    Recency (days since last order vs the corpus max date), Frequency
    (order count), Monetary (exact cent sum), each binned into rank
    quartiles — computed with corpus.global_rank (range-partitioned
    parallel sort), NOT a global-order NTILE window, which would
    serialize the corpus through one task (the scale lint's
    SinglePartition rule). The bin is the rank-arithmetic quantile
    (rank-1)*k/n + 1 — deterministic and identical in both engines,
    sidestepping NTILE's remainder-placement convention. Output: one
    row per (R,F,M) cell with occupancy and mean spend.

    ONE rank pass, not three (round-7 rewrite, VERDICT r6 task 6): the
    three sort problems union into a 3n-row (dim, val, custkey) frame —
    dim 0: rec_days asc, dim 1: -n_orders, dim 2: -cents, each a total
    order via the custkey tiebreak — ranked once; dim blocks are
    contiguous so the in-dim rank is grk - dim*n, and one custkey
    groupBy pivots the three ranks back WITHOUT any join (cents is
    recovered from dim 2's own sort value). Replaces three
    repartitionByRange+checkpoint+count passes and three join-backs
    with one of each.

    Driver state: the customer count (one int) plus global_rank's
    per-partition offsets, once."""
    from dns_log_transformer_spark.operators.caching import persist_tracked
    from dns_log_transformer_spark.operators.corpus import global_rank

    o = table(spark, sf, "orders")
    per = o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.max("o_orderdate").alias("last_d"),
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
        .cast("bigint")
        .alias("cents"),
    )
    per = persist_tracked(per)  # scalar agg + count + the union read it
    ref = per.agg(F.max("last_d").alias("ref_d"))
    n = per.count()
    tri = (
        per.crossJoin(F.broadcast(ref))
        .select(
            "custkey",
            F.explode(
                F.array(
                    F.struct(
                        F.lit(0).alias("dim"),
                        F.datediff(F.col("ref_d"), F.col("last_d"))
                        .cast("long")
                        .alias("val"),
                    ),
                    F.struct(
                        F.lit(1).alias("dim"),
                        (-F.col("n_orders")).cast("long").alias("val"),
                    ),
                    F.struct(
                        F.lit(2).alias("dim"),
                        (-F.col("cents")).cast("long").alias("val"),
                    ),
                )
            ).alias("d"),
        )
        .select("custkey", F.col("d.dim").alias("dim"), F.col("d.val").alias("val"))
    )
    ranked = global_rank(tri, ["dim", "val", "custkey"], rank_col="grk")
    quart = (
        (F.col("grk") - F.col("dim") * F.lit(n) - 1) * 4 / F.lit(n)
    )
    seg = (
        ranked.groupBy("custkey")
        .agg(
            F.max(F.when(F.col("dim") == 0, F.floor(quart) + 1))
            .cast("int")
            .alias("r_q"),
            F.max(F.when(F.col("dim") == 1, F.floor(quart) + 1))
            .cast("int")
            .alias("f_q"),
            F.max(F.when(F.col("dim") == 2, F.floor(quart) + 1))
            .cast("int")
            .alias("m_q"),
            F.max(F.when(F.col("dim") == 2, -F.col("val")))
            .cast("bigint")
            .alias("cents"),
        )
        .select("r_q", "f_q", "m_q", "cents")
    )
    return seg.groupBy("r_q", "f_q", "m_q").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.round(
            F.sum(F.col("cents").cast("decimal(38,0)")).cast("double")
            / F.count(F.lit(1))
            / 100.0,
            4,
        ).alias("avg_monetary"),
    )


# ---------------------------------------------------------------------------
# BPE train-then-apply (per-source sequence-length compression)
# ---------------------------------------------------------------------------
def _bpe_apply_oracle(k: int = 5) -> str:
    """Same k greedy merges as _bpe_oracle, with source and the
    pre-merge token count carried through the rewrite chain so the
    final layer reports per-source compression."""
    parts = [
        r"""r0 AS (
      SELECT source,
             array_to_string(string_split_regex(trim(text), '\s+'), ' ') AS t,
             CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS nb
      FROM documents WHERE trim(text) IS NOT NULL AND trim(text) <> '')"""
    ]
    for i in range(1, k + 1):
        parts.append(
            f"""
    p{i} AS (SELECT pr[1] AS lhs, pr[2] AS rhs FROM (
        SELECT unnest(list_zip(tk[1:len(tk)-1], tk[2:len(tk)])) AS pr
        FROM (SELECT string_split(t, ' ') AS tk FROM r{i - 1}))),
    c{i} AS (SELECT lhs, rhs, COUNT(*) AS cnt FROM p{i} GROUP BY 1, 2
             ORDER BY cnt DESC, lhs ASC, rhs ASC LIMIT 1),
    r{i} AS (SELECT r.source, trim(replace(' ' || r.t || ' ',
                   ' ' || c.lhs || ' ' || c.rhs || ' ',
                   ' ' || c.lhs || '_' || c.rhs || ' ')) AS t, r.nb
             FROM r{i - 1} r, c{i} c)"""
        )
    merges_union = "\n      UNION ALL ".join(
        f"SELECT {i} AS r, lhs, rhs, cnt FROM c{i}" for i in range(1, k + 1)
    )
    parts.append(
        f"""
    mcsv AS (
      SELECT string_agg(CAST(r AS VARCHAR) || ':' || lhs || ' ' || rhs
                        || ':' || CAST(cnt AS VARCHAR), '|' ORDER BY r)
               AS merges_csv
      FROM ({merges_union}))"""
    )
    return (
        "WITH "
        + ",".join(parts)
        + f"""
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(CAST(SUM(CAST(nb AS DECIMAL(38,0))) AS DOUBLE)
                 / COUNT(*), 4) AS avg_tokens_before,
           ROUND(CAST(SUM(CAST(len(string_split(t, ' ')) AS DECIMAL(38,0)))
                      AS DOUBLE) / COUNT(*), 4) AS avg_tokens_after,
           ROUND((1 - CAST(SUM(CAST(len(string_split(t, ' '))
                                    AS DECIMAL(38,0))) AS DOUBLE)
                      / CAST(SUM(CAST(nb AS DECIMAL(38,0))) AS DOUBLE))
                 * 100, 4) AS compression_pct,
           ANY_VALUE(m.merges_csv) AS merges_csv
    FROM r{k}, mcsv m GROUP BY source"""
    )


@register("text_bpe_apply", oracle=_bpe_apply_oracle(5))
def text_bpe_apply(spark: SparkSession, sf: str) -> DataFrame:
    """The complete tokenizer loop in one registration (r10: the
    text_bpe_merges induction query consolidated in, VERDICT r9 #1):
    learn 5 greedy BPE merges on the corpus — per step, one scan of
    the persisted token strings + a map-side-combined pair count + a
    TakeOrderedAndProject top-1 (one row of driver state per step) —
    apply them in order to every document as stacked codegen literal
    replaces, and report per-source sequence-length compression (the
    metric a tokenizer change is judged by) PLUS the learned merge
    table itself as the constant merges_csv column
    ('rank:lhs rhs:count' rows joined by '|'), so both the induction
    and its application are oracle-attested. See operators/text.py
    bpe_apply_stats / _bpe_learn for the scale shape and the
    engine-exact replace semantics."""
    from dns_log_transformer_spark.operators import text

    docs = table(spark, sf, "documents")
    return text.bpe_apply_stats(docs, k=5, with_merges_csv=True)
