"""LLM-data-pipeline operators as oracle-checked queries.

Each entry wraps an operator from ``operators/`` and pairs it with DuckDB
SQL that re-implements the *same deterministic algorithm* (same md5-based
hashes, same fold order for floats), so a hash-match means the Spark
implementation computes the declared semantics — not merely "returns
rows". Oracles with repetitive structure (minhash signatures, simhash
bits) are generated programmatically below to keep the two sides in
lockstep.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from dns_log_transformer_spark.operators.caching import persist_tracked
from dns_log_transformer_spark.operators import (
    corpus,
    dedup,
    multimodal,
    similarity,
    sketches,
    text,
)
from dns_log_transformer_spark.queries.registry import register, table

# ---------------------------------------------------------------------------
# Shared SQL fragments (mirror operators/text.py exactly)
# ---------------------------------------------------------------------------

# empty/whitespace-only text must be [] on BOTH sides: DuckDB's
# string_split_regex('') yields [''] (len 1) where Spark's tokens() guard
# yields [] — mirror the guard here
_SQL_TOKENS = (
    r"(CASE WHEN trim(text) IS NULL OR trim(text) = '' "
    r"THEN CAST([] AS VARCHAR[]) "
    r"ELSE string_split_regex(trim(text), '\s+') END)"
)
_SQL_NORM = r"regexp_replace(lower(trim(text)), '\s+', ' ', 'g')"
_SQL_SHINGLES = rf"""
  toks AS (SELECT doc_id, {_SQL_TOKENS} AS w FROM documents),
  sh AS (
    SELECT doc_id,
           list_distinct(list_transform(range(len(w) - 2),
             i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) AS s
    FROM toks WHERE len(w) >= 3)
"""


def _in_list(words: tuple[str, ...]) -> str:
    return ", ".join(f"'{w}'" for w in words)


# Quality-score recipe shared by text_quality (which since r10 also
# carries the decile/classifier columns) and corpus_token_budget
# (mirrors operators/text.py with_quality_score) —
# ONE definition so a blend tweak cannot drift a subset of oracles.
# Both fragments are .format()-ed into oracles at module import.
_QUALITY_RAW_SQL = rf"""
      SELECT doc_id, source,
             CAST(LENGTH(text) AS BIGINT) AS n_chars_m,
             CAST(len({_SQL_TOKENS}) AS BIGINT) AS n_tokens,
             LENGTH(regexp_replace(text, '[^A-Za-z]', '', 'g'))::DOUBLE
               / LENGTH(text) AS alpha_ratio_raw,
             len(list_filter({_SQL_TOKENS},
                 t -> t IN ({_in_list(text.EN_STOPWORDS)})))::DOUBLE
               / len({_SQL_TOKENS}) AS sw_ratio_raw
      FROM documents"""
_QUALITY_SCORE_EXPR = (
    "ROUND(0.4 * alpha_ratio_raw"
    " + 0.4 * LEAST(sw_ratio_raw * 5, 1.0)"
    " + 0.2 * LEAST(n_tokens / 100.0, 1.0), 4)"
)


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------


@register(
    "text_token_stats",
    oracle=rf"""
    SELECT doc_id,
           CAST(len({_SQL_TOKENS}) AS BIGINT) AS n_tokens,
           CAST(len(regexp_extract_all(text, '{text.BPE_TOKEN_RE}')) AS BIGINT)
             AS n_bpe_tokens
    FROM documents
    """,
)
def text_token_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Whitespace + BPE-ish token counts per document."""
    docs = table(spark, sf, "documents")
    return text.with_token_counts(docs).select("doc_id", "n_tokens", "n_bpe_tokens")


#: feature-hash buckets / weight span for the linear classifier column
#: of the merged text_quality (mirrors operators/text.py).
_QC_BUCKETS = text.QC_BUCKETS
_QC_SPAN = text.QC_WEIGHT_SPAN


@register(
    "text_quality",
    oracle=rf"""
    WITH q AS ({_QUALITY_RAW_SQL}),
    scored AS (
      SELECT doc_id, source, n_chars_m, n_tokens,
             ROUND(alpha_ratio_raw, 4) AS alpha_ratio,
             ROUND(sw_ratio_raw, 4)    AS stopword_ratio,
             {_QUALITY_SCORE_EXPR} AS quality_score
      FROM q),
    d AS (
      SELECT doc_id,
             CAST(ntile(10) OVER (PARTITION BY source
                                  ORDER BY quality_score, doc_id)
               AS BIGINT) AS decile
      FROM scored),
    toked AS (
      SELECT doc_id, unnest({_SQL_TOKENS}) AS tok FROM documents),
    feat AS (
      SELECT doc_id,
             CAST('0x' || substr(md5(tok), 1, 8) AS BIGINT) % {_QC_BUCKETS}
               AS f
      FROM toked),
    weighted AS (
      SELECT doc_id,
             CAST('0x' || substr(md5('w:' || CAST(f AS VARCHAR)), 1, 8)
               AS BIGINT) % {_QC_SPAN} - {_QC_SPAN // 2} AS w
      FROM feat),
    clf AS (
      SELECT doc_id,
             CAST(SUM(w) AS BIGINT) AS clf_margin,
             ROUND(CAST(SUM(w) AS DOUBLE) / COUNT(*), 4) AS clf_score,
             SUM(w) > 0 AS clf_keep
      FROM weighted GROUP BY doc_id)
    SELECT s.doc_id, s.source, s.n_chars_m, s.n_tokens, s.alpha_ratio,
           s.stopword_ratio, s.quality_score, d.decile,
           c.clf_margin, c.clf_score, c.clf_keep
    FROM scored s
    JOIN d USING (doc_id)
    LEFT JOIN clf c USING (doc_id)
    """,
)
def text_quality(spark: SparkSession, sf: str) -> DataFrame:
    """Per-document quality suite — r10 consolidation of the former
    text_quality / text_quality_deciles / text_quality_classifier trio
    (VERDICT r9 #1: one scoring recipe, three registration shells)
    into ONE per-doc frame carrying all three curation signals:

    - heuristic stats + blended score (length/alpha/stopword recipe,
      operators/text.py with_quality_score);
    - per-source quality DECILE — the select-the-top-X%-by-score step,
      assigned per doc, which is strictly stronger attestation than the
      old per-(source, decile) occupancy rollup. NOT an
      ``ntile(10).over(partitionBy(source))`` window: "source" has
      single-digit cardinality and terabyte-scale members on a real
      corpus, and a hash-partitioned window sorts each source's entire
      corpus in ONE task. ``grouped_rank`` range-partitions the full
      (source, score, doc_id) key and ``ntile_from_rank`` reproduces
      the SQL-standard NTILE allocation exactly, so the window-NTILE
      oracle agrees bit-for-bit (plan guard in test_skew_and_plans);
    - fastText-style linear classifier margin/score/keep over hashed
      unigram features with exact integer margins
      (operators/text.py quality_classifier; left join — a token-less
      doc has no classifier row but keeps its heuristic stats).

    Scale shape: one projection pass (heuristics), one range-partition
    rank (decile), one token fan-out + (id) agg (classifier), assembled
    by two id-keyed equi-joins on the unique doc key."""
    docs = table(spark, sf, "documents")
    scored = text.with_quality_score(docs).select(
        "doc_id", "source", "n_chars_m", "n_tokens", "alpha_ratio",
        "stopword_ratio", "quality_score",
    )
    ranked = corpus.grouped_rank(
        scored, "source", ["quality_score", "doc_id"],
        rank_col="_r", count_col="_n",
    )
    with_dec = ranked.select(
        "doc_id", "source", "n_chars_m", "n_tokens", "alpha_ratio",
        "stopword_ratio", "quality_score",
        corpus.ntile_from_rank(F.col("_r"), F.col("_n"), 10).alias("decile"),
    )
    clf = text.quality_classifier(docs).select(
        "doc_id",
        F.col("margin").alias("clf_margin"),
        F.col("score").alias("clf_score"),
        F.col("keep").alias("clf_keep"),
    )
    return with_dec.join(clf, "doc_id", "left")


_LANG_SCORES_SQL = ",\n".join(
    f"           len(list_filter({_SQL_TOKENS}, t -> t IN"
    f" ({_in_list(ws)})))::BIGINT AS score_{lang}"
    for lang, ws in text.LANG_STOPWORDS.items()
)
_LANG_PRED_SQL = "CASE WHEN greatest(score_en, score_es, score_fr, score_de) = 0 THEN 'und' " + " ".join(
    f"WHEN score_{lang} = greatest(score_en, score_es, score_fr, score_de) THEN '{lang}'"
    for lang in text.LANG_PRIORITY
) + " END"


@register(
    "text_lang_id",
    oracle=f"""
    WITH s AS (
      SELECT doc_id,
{_LANG_SCORES_SQL}
      FROM documents)
    SELECT doc_id, score_en, score_es, score_fr, score_de,
           {_LANG_PRED_SQL} AS lang_pred
    FROM s
    """,
)
def text_lang_id(spark: SparkSession, sf: str) -> DataFrame:
    """Stopword-membership language ID with deterministic tie-break."""
    docs = table(spark, sf, "documents")
    return text.with_lang_id(docs).select(
        "doc_id", "score_en", "score_es", "score_fr", "score_de", "lang_pred"
    )


def _simhash_sql() -> tuple[str, str]:
    # token hash = first 8 md5 hex chars as an int, bit b votes +-1
    # (mirrors operators/dedup.py simhash's conv(substr(md5,1,8),16,10)).
    votes = ",\n".join(
        "      SUM(((CAST('0x' || substr(md5(tok), 1, 8) AS BIGINT) "
        f">> {bit}) & 1) * 2 - 1) AS s{bit}"
        for bit in range(dedup.SIMHASH_BITS)
    )
    pack = " + ".join(
        f"CASE WHEN s{bit} > 0 THEN CAST({1 << bit} AS BIGINT) ELSE 0 END"
        for bit in range(dedup.SIMHASH_BITS)
    )
    return votes, pack


_SH_VOTES, _SH_PACK = _simhash_sql()


@register(
    "text_fingerprint",
    oracle=f"""
    WITH fp AS (
      SELECT doc_id,
             md5({_SQL_NORM})                AS fingerprint,
             substr(md5({_SQL_NORM}), 1, 16) AS fingerprint64
      FROM documents),
    toks AS (
      SELECT doc_id, unnest(list_distinct({_SQL_TOKENS})) AS tok
      FROM documents),
    v AS (
      SELECT doc_id,
{_SH_VOTES}
      FROM toks GROUP BY doc_id),
    sh AS (SELECT doc_id, {_SH_PACK} AS simhash FROM v)
    SELECT fp.doc_id, fp.fingerprint, fp.fingerprint64, sh.simhash
    FROM fp LEFT JOIN sh USING (doc_id)
    """,
)
def text_fingerprint(spark: SparkSession, sf: str) -> DataFrame:
    """Per-document content hashes, both families in one frame (r10:
    text_simhash consolidated in, VERDICT r9 #1 — two per-doc hashing
    shells over the same documents scan):

    - ``fingerprint`` / ``fingerprint64``: md5 of whitespace-normalized
      text — the EXACT-dup key (a single changed byte flips it);
    - ``simhash``: 32-bit SimHash from per-token md5 bit votes
      (operators/dedup.py simhash) — the NEAR-dup key
      dedup_simhash_pairs band-joins on (a few changed tokens flip a
      few bits).

    Shape: the fingerprint is a per-row projection; the simhash is a
    token fan-out + (id) aggregation; one id-keyed LEFT join assembles
    the frame — LEFT because a zero-token document (empty/whitespace
    text) produces no simhash row but must keep its fingerprint row
    exactly as the pre-merge registration did (code-review r10: an
    inner join silently dropped those docs on both engines, so parity
    could never catch it)."""
    docs = table(spark, sf, "documents")
    fp = text.with_fingerprint(docs).select(
        "doc_id", "fingerprint", "fingerprint64"
    )
    return fp.join(dedup.simhash(docs), "doc_id", "left")


@register(
    "text_sentences",
    oracle="""
    WITH segs AS (
      SELECT doc_id, trim(s) AS sentence,
             row_number() OVER (PARTITION BY doc_id ORDER BY i) - 1 AS rn
      FROM (SELECT doc_id, u.s, u.i
            FROM (SELECT doc_id,
                         unnest(string_split(text, '.')) AS s,
                         generate_subscripts(string_split(text, '.'), 1) AS i
                  FROM documents) u)
      WHERE trim(s) <> '')
    SELECT doc_id, CAST(rn AS INT) AS sent_no, sentence FROM segs
    """,
)
def text_sentences(spark: SparkSession, sf: str) -> DataFrame:
    """Sentence segmentation via a Python UDTF (LATERAL table function —
    the 1->N row surface with arbitrary Python logic), oracle-replayed
    with string_split + ordinality."""
    docs = table(spark, sf, "documents")
    return text.sentences(docs)


@register(
    "text_winnow",
    oracle=r"""
    WITH n AS (
      SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS t
      FROM documents),
    g AS (
      SELECT doc_id,
             list_transform(range(1, length(t) - 8 + 2),
                            i -> md5(substr(t, CAST(i AS INT), 8))) AS gh
      FROM n WHERE length(t) >= 8)
    SELECT doc_id, unnest(fps) AS fp FROM (
      SELECT doc_id,
             list_distinct(CASE WHEN len(gh) >= 4
               THEN list_transform(range(1, len(gh) - 4 + 2),
                                   j -> list_min(gh[j:j+3]))
               ELSE [list_min(gh)] END) AS fps
      FROM g)
    """,
)
def text_winnow(spark: SparkSession, sf: str) -> DataFrame:
    """Winnowing (rolling k-gram hash, window-min selection) document
    fingerprints — the partial-overlap detector (k=8 chars, w=4)."""
    docs = table(spark, sf, "documents")
    return text.winnow_fingerprints(docs, k=8, w=4)


# ---------------------------------------------------------------------------
# Dedup
# ---------------------------------------------------------------------------


@register(
    "dedup_exact",
    oracle=f"""
    SELECT md5({_SQL_NORM}) AS fingerprint,
           COUNT(*)         AS n_docs,
           MIN(doc_id)      AS keep_id
    FROM documents GROUP BY 1
    """,
)
def dedup_exact(spark: SparkSession, sf: str) -> DataFrame:
    """Exact dedup groups by normalized-content hash."""
    docs = table(spark, sf, "documents")
    return dedup.exact_dup_groups(docs)


@register(
    "dedup_ngram_jaccard",
    oracle=rf"""
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
           ROUND(n_common / (n_a + n_b - n_common), 4) AS jaccard
    FROM pairs
    WHERE n_common / (n_a + n_b - n_common) >= 0.6
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf: str) -> DataFrame:
    """Exact trigram-Jaccard >= 0.6 pairs via inverted shingle index
    (df-capped at 100 docs per shingle — the skew guard)."""
    docs = table(spark, sf, "documents")
    return dedup.ngram_jaccard_pairs(docs, threshold=0.6, df_cap=100)


def _minhash_sig_sql(num_bands: int = dedup.NUM_BANDS) -> tuple[str, str]:
    # Kirsch-Mitzenmacher family, mirroring operators/dedup.py
    # minhash_signatures: one md5 per shingle, h1/h2 = the two 48-bit hex
    # halves, h_j = h1 + j*h2 (exact BIGINT arithmetic in both engines).
    # ``num_bands`` parameterizes the banding text (the r13 tradeoff
    # oracle sweeps it); the signature CTE is band-independent.
    sigs = ",\n".join(
        f"      MIN(h1 + {j} * h2) AS m{j}" for j in range(dedup.NUM_HASHES)
    )
    rows = dedup.NUM_HASHES // num_bands
    bands = "\n      UNION ALL ".join(
        f"SELECT doc_id, {k} AS band, "
        + " || '_' || ".join(f"CAST(m{k * rows + r} AS VARCHAR)" for r in range(rows))
        + " AS key FROM sig"
        for k in range(num_bands)
    )
    return sigs, bands


_MH_SIGS, _MH_BANDS = _minhash_sig_sql()

#: Band-INDEPENDENT prefix of the minhash chain (shingles -> posting ->
#: md5-half hashes -> signature) as WITH-clause text: shared by
#: ``_MH_PAIRS_CTES`` below and the r13 blocking-tradeoff oracle, which
#: sweeps band settings over this one signature CTE exactly like the
#: engine side hoists ``minhash_signatures`` out of its settings loop.
_MH_SIG_CTES = rf"""{_SQL_SHINGLES},
    post AS (SELECT doc_id, unnest(s) AS x FROM sh WHERE len(s) > 0),
    hashed AS (
      SELECT doc_id,
             CAST('0x' || substr(md5(x), 1, 12) AS BIGINT)  AS h1,
             CAST('0x' || substr(md5(x), 13, 12) AS BIGINT) AS h2
      FROM post),
    sig AS (
      SELECT doc_id,
{_MH_SIGS}
      FROM hashed GROUP BY doc_id)"""


def _mh_band_cand_ctes(num_bands: int = dedup.NUM_BANDS, suffix: str = "") -> str:
    """bands/bandsc/cand WITH-clause text over the shared ``sig`` CTE,
    for ``num_bands`` bands, CTE names suffixed so several settings can
    coexist in one statement (the tradeoff sweep). suffix='' at the
    default banding reproduces the attested ``_MH_PAIRS_CTES`` section
    byte-for-byte — ONE definition of the candidate chain."""
    _, bands = _minhash_sig_sql(num_bands)
    return rf"""bands{suffix} AS (
      {bands}),
    bandsc{suffix} AS (
      SELECT band, key, doc_id FROM (
        SELECT band, key, doc_id,
               COUNT(*) OVER (PARTITION BY band, key) AS _c
        FROM bands{suffix})
      WHERE _c <= {dedup.LSH_BUCKET_CAP}),
    cand{suffix} AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bandsc{suffix} a JOIN bandsc{suffix} b USING (band, key)
      WHERE a.doc_id < b.doc_id)"""


@register(
    "dedup_minhash_lsh",
    oracle=rf"""
    WITH {_SQL_SHINGLES},
    post AS (SELECT doc_id, unnest(s) AS x FROM sh WHERE len(s) > 0),
    hashed AS (
      SELECT doc_id,
             CAST('0x' || substr(md5(x), 1, 12) AS BIGINT)  AS h1,
             CAST('0x' || substr(md5(x), 13, 12) AS BIGINT) AS h2
      FROM post),
    sig AS (
      SELECT doc_id,
{_MH_SIGS}
      FROM hashed GROUP BY doc_id),
    bands AS (
      {_MH_BANDS}),
    bandsc AS (
      SELECT band, key, doc_id FROM (
        SELECT band, key, doc_id,
               COUNT(*) OVER (PARTITION BY band, key) AS _c
        FROM bands)
      WHERE _c <= {dedup.LSH_BUCKET_CAP}),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bandsc a JOIN bandsc b USING (band, key)
      WHERE a.doc_id < b.doc_id),
    v AS (
      SELECT doc_a, doc_b,
             len(list_intersect(x.s, y.s)) AS i,
             len(x.s) AS na, len(y.s) AS nb
      FROM cand JOIN sh x ON x.doc_id = doc_a JOIN sh y ON y.doc_id = doc_b)
    SELECT doc_a, doc_b, ROUND(i / (na + nb - i), 4) AS jaccard
    FROM v WHERE i / (na + nb - i) >= 0.5
    """,
)
def dedup_minhash_lsh(spark: SparkSession, sf: str) -> DataFrame:
    """MinHash(12)-LSH(4 bands) candidates — hot band buckets excluded
    at LSH_BUCKET_CAP, mirrored in the oracle — verified at
    Jaccard >= 0.5. The oracle rebuilds the identical hash arithmetic
    in SQL."""
    docs = table(spark, sf, "documents")
    return dedup.minhash_lsh_pairs(docs, threshold=0.5)


#: The minhash pair derivation as reusable WITH-clause text (shared by
#: the pairs query above and the connected-components query below).
_MH_PAIRS_CTES = rf"""{_MH_SIG_CTES},
    {_mh_band_cand_ctes()},
    v AS (
      SELECT doc_a, doc_b,
             len(list_intersect(x.s, y.s)) AS i,
             len(x.s) AS na, len(y.s) AS nb
      FROM cand JOIN sh x ON x.doc_id = doc_a JOIN sh y ON y.doc_id = doc_b),
    dup_pairs AS (
      SELECT doc_a, doc_b FROM v WHERE i / (na + nb - i) >= 0.5)"""


@register(
    "dedup_components",
    oracle=rf"""
    WITH RECURSIVE {_MH_PAIRS_CTES},
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM dup_pairs
      UNION ALL
      SELECT doc_b, doc_a FROM dup_pairs),
    nodes AS (SELECT DISTINCT src AS doc_id FROM edges),
    reach(a, b) AS (
      SELECT doc_id, doc_id FROM nodes
      UNION
      SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src)
    SELECT a AS doc_id, MIN(b) AS component FROM reach GROUP BY a
    """,
)
def dedup_components(spark: SparkSession, sf: str) -> DataFrame:
    """Duplicate clusters: connected components over the MinHash-LSH
    near-dup pairs via iterative min-label propagation (driver loop +
    convergence check — the 'iterative algorithm' shape). The oracle
    computes the same components with a recursive transitive-closure CTE
    — feasible for DuckDB at oracle scale, quadratic-in-component-size,
    which is exactly why the engine side iterates instead."""
    docs = table(spark, sf, "documents")
    pairs = dedup.minhash_lsh_pairs(docs, threshold=0.5)
    return dedup.connected_components(pairs)


# dedup_keep_list was consolidated into advanced.py dedup_keep_best
# (r10, VERDICT r9 #1): the merged per-doc frame carries the min-id
# keep_id/is_kept_min beside the quality-elected best_id/is_kept.


# text_simhash was consolidated into text_fingerprint (r10, VERDICT
# r9 #1): the merged per-doc frame carries the exact-dup md5 key and
# the near-dup SimHash side by side (_simhash_sql moved above the
# text_fingerprint registration it now feeds).


def _simhash_pairs_oracle(bucket_cap: int = None) -> str:
    """The banded + occupancy-capped pair derivation, parametrized so
    tests can run a BINDING cap (the attested default never binds at
    parity scale) against dedup.simhash_pairs on the same data."""
    cap = dedup.SIMHASH_BUCKET_CAP if bucket_cap is None else bucket_cap
    return rf"""
    WITH toks AS (
      SELECT doc_id, unnest(list_distinct({_SQL_TOKENS})) AS tok
      FROM documents),
    v AS (
      SELECT doc_id,
{_SH_VOTES}
      FROM toks GROUP BY doc_id),
    sh AS (SELECT doc_id, {_SH_PACK} AS simhash FROM v),
    bands AS (
      SELECT doc_id, simhash, CAST(t.band AS INT) AS band,
             (simhash >> CAST(8 * t.band AS INT)) & 255 AS key
      FROM sh, range(4) t(band)),
    bandsc AS (
      SELECT doc_id, simhash, band, key FROM (
        SELECT doc_id, simhash, band, key,
               COUNT(*) OVER (PARTITION BY band, key) AS _c
        FROM bands)
      WHERE _c <= {cap})
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
    FROM bandsc a JOIN bandsc b USING (band, key)
    WHERE a.doc_id < b.doc_id
      AND bit_count(xor(a.simhash, b.simhash)) <= 3
    """


@register("dedup_simhash_pairs", oracle=_simhash_pairs_oracle())
def dedup_simhash_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """SimHash near-dup pairs (Hamming <= 3) via byte-band join —
    pigeonhole-exact for <= 3 bit flips wherever the per-(band, key)
    occupancy cap (SIMHASH_BUCKET_CAP, far above every fixture's max
    occupancy, so attested results ARE the exact set) does not bind;
    the oracle replays the identical banding, cap, and verification."""
    docs = table(spark, sf, "documents")
    return dedup.simhash_pairs(docs, max_hamming=3)


# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------

_SQL_DOT = "list_sum(list_transform(list_zip({a}, {b}), p -> p[1] * p[2]))"

_SEMDEDUP_CELLS = 10


def _ivf_cb_cte(cells_expr) -> str:
    """Codebook CTE: per-cell per-dim rounded mean (same recipe
    emb_centroids attests), re-assembled into an ordered array per
    cell. ``cells_expr`` is the SQL cell count — a literal, or the
    data-dependent ``auto_n_cells`` scalar subquery."""
    return f"""
    cb AS (
      SELECT cell, list(c ORDER BY dim) AS cv FROM (
        SELECT CAST(vec_id % {cells_expr} AS INT) AS cell,
               CAST(u.p[1] AS INT) AS dim,
               ROUND(AVG(u.p[2]), 4) AS c
        FROM (
          SELECT vec_id,
                 unnest(list_zip(range(len(embedding)),
                        list_transform(embedding, x -> CAST(x AS DOUBLE))))
                   AS p
          FROM embeddings) u
        GROUP BY 1, 2)
      GROUP BY cell)
"""


_SEMDEDUP_CB = _ivf_cb_cte(_SEMDEDUP_CELLS)

#: similarity.auto_n_cells(count, floor=10) as SQL — libm sqrt is
#: correctly rounded, so both engines derive the identical cell count.
_AUTO_CELLS_SQL = (
    "(SELECT GREATEST(10, CAST(FLOOR(SQRT(COUNT(*)) + 0.5) AS INT))"
    " FROM embeddings)"
)

_IVF_AUTO_CB = _ivf_cb_cte(_AUTO_CELLS_SQL)



@register(
    "sim_topk_bruteforce",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings),
    q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id % 50 = 0 AND vec_id < 2000),
    scored AS (
      SELECT q.query_id, e.vec_id,
             ROUND({_SQL_DOT.format(a='e.v', b='q.qv')}
               / (sqrt({_SQL_DOT.format(a='e.v', b='e.v')})
                  * sqrt({_SQL_DOT.format(a='q.qv', b='q.qv')})), 4) AS cos_sim
      FROM e, q WHERE e.vec_id <> q.query_id)
    SELECT query_id, vec_id, cos_sim, rnk FROM (
      SELECT query_id, vec_id, cos_sim,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cos_sim DESC, vec_id) AS rnk
      FROM scored)
    WHERE rnk <= 5
    """,
)
def sim_topk_bruteforce(spark: SparkSession, sf: str) -> DataFrame:
    """Exact cosine top-5 for a FIXED query workload (every 50th of the
    first 2000 vectors — the whole ANN family pins the query side so
    corpus growth scales the scan, never the query x corpus product;
    broadcast queries x corpus; ranking on rounded cosine with id
    tie-break)."""
    emb = table(spark, sf, "embeddings")
    queries = emb.filter((F.col("vec_id") % 50 == 0) & (F.col("vec_id") < 2000))
    return similarity.brute_force_topk(emb, queries, k=5)


def _plane_literal(p: int, num_planes: int = similarity.NUM_PLANES) -> str:
    planes = similarity.lsh_planes(num_planes)
    return "[" + ", ".join(str(x) for x in planes[p]) + "]"


def _lsh_key_sql(num_planes: int) -> str:
    return " + ".join(
        f"CASE WHEN {_SQL_DOT.format(a='v', b=_plane_literal(p, num_planes))} > 0"
        f" THEN {1 << p} ELSE 0 END"
        for p in range(num_planes)
    )


_LSH_KEY_SQL = _lsh_key_sql(similarity.NUM_PLANES)


# sim_lsh_buckets was consolidated into advanced.py emb_vector_codes
# (r10, VERDICT r9 #1): the lsh_key column rides the merged per-vector
# representation frame; _LSH_KEY_SQL stays the shared oracle fragment.


_ANN_PLANES = 8  # 256 buckets: scaled so sf0.01's 500 vectors collide


@register(
    "sim_ann_lsh_topk",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings),
    keyed AS (
      SELECT vec_id, v, CAST({_lsh_key_sql(_ANN_PLANES)} AS INT) AS lsh_key FROM e),
    q AS (
      SELECT query_id, qv, unnest([lsh_key,
             {', '.join(f'xor(lsh_key, {1 << p})' for p in range(_ANN_PLANES))}
             ]) AS lsh_key
      FROM (SELECT vec_id AS query_id, v AS qv, lsh_key
            FROM keyed WHERE vec_id % 50 = 0 AND vec_id < 2000)),
    scored AS (
      SELECT q.query_id, k.vec_id,
             ROUND({_SQL_DOT.format(a='k.v', b='q.qv')}
               / (sqrt({_SQL_DOT.format(a='k.v', b='k.v')})
                  * sqrt({_SQL_DOT.format(a='q.qv', b='q.qv')})), 4) AS cos_sim
      FROM keyed k JOIN q USING (lsh_key)
      WHERE k.vec_id <> q.query_id)
    SELECT query_id, vec_id, cos_sim, rnk FROM (
      SELECT query_id, vec_id, cos_sim,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cos_sim DESC, vec_id) AS rnk
      FROM scored)
    WHERE rnk <= 5
    """,
)
def sim_ann_lsh_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Approximate top-5 via LSH bucket equi-join (the 100 TB path — no
    cross join), with planes scaled to the corpus (8 planes = 256
    buckets) and Hamming-1 multi-probe on the query side so the row is
    non-vacuous: at sf0.01 (500 vectors, 10 queries) every query ranks
    real candidates. The oracle rebuilds the bucket keys from literal
    planes (the sim_lsh_buckets recipe), unnests the same probe set, and
    ranks within buckets exactly."""
    emb = table(spark, sf, "embeddings")
    queries = emb.filter((F.col("vec_id") % 50 == 0) & (F.col("vec_id") < 2000))
    return similarity.ann_topk_lsh(
        emb, queries, k=5, num_planes=_ANN_PLANES, probe_bits=1
    )


@register(
    "sim_ann_ivf_topk",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings),
    {{_IVF_CB}},
    corpus_cell AS (
      SELECT vec_id, v, cell FROM (
        SELECT e.vec_id, e.v, cb.cell,
               ROW_NUMBER() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY {_SQL_DOT.format(a='e.v', b='cb.cv')} DESC,
                          cb.cell) AS rn
        FROM e, cb)
      WHERE rn = 1),
    probes AS (
      SELECT query_id, qv, cell FROM (
        SELECT e.vec_id AS query_id, e.v AS qv, cb.cell,
               ROW_NUMBER() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY {_SQL_DOT.format(a='e.v', b='cb.cv')} DESC,
                          cb.cell) AS rn
        FROM e, cb
        WHERE e.vec_id % 50 = 0 AND e.vec_id < 2000)
      WHERE rn <= 2),
    scored AS (
      SELECT p.query_id, c.vec_id,
             ROUND({_SQL_DOT.format(a='c.v', b='p.qv')}
               / (sqrt({_SQL_DOT.format(a='c.v', b='c.v')})
                  * sqrt({_SQL_DOT.format(a='p.qv', b='p.qv')})), 4) AS cos_sim
      FROM corpus_cell c JOIN probes p USING (cell)
      WHERE c.vec_id <> p.query_id)
    SELECT query_id, vec_id, cos_sim, rnk FROM (
      SELECT query_id, vec_id, cos_sim,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cos_sim DESC, vec_id) AS rnk
      FROM scored)
    WHERE rnk <= 5
    """.replace("{_IVF_CB}", _IVF_AUTO_CB),
)
def sim_ann_ivf_topk(spark: SparkSession, sf: str) -> DataFrame:
    """IVF approximate top-5 (1 averaging step over deterministic seed
    cells, centroids rounded to 4 decimals; queries probe their 2
    nearest cells by the same dim-ordered dot fold the oracle uses;
    exact cosine + top-k within the probed cells). Cell count
    auto-scales ~sqrt(corpus) — similarity.auto_n_cells, mirrored by
    the oracle's scalar subquery — so per-query probed candidates grow
    as sqrt(n), not linearly (the round-6 10x table's documented
    knob, closed in round 7)."""
    emb = table(spark, sf, "embeddings")
    queries = emb.filter((F.col("vec_id") % 50 == 0) & (F.col("vec_id") < 2000))
    return similarity.ann_topk_ivf(emb, queries, k=5, n_cells=None, n_probe=2)


@register(
    "emb_neardup_pairs",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND({_SQL_DOT.format(a='a.v', b='b.v')}
             / (sqrt({_SQL_DOT.format(a='a.v', b='a.v')})
                * sqrt({_SQL_DOT.format(a='b.v', b='b.v')})), 4) AS cos_sim
    FROM e a, e b
    WHERE a.vec_id < b.vec_id
      AND {_SQL_DOT.format(a='a.v', b='b.v')}
          / (sqrt({_SQL_DOT.format(a='a.v', b='a.v')})
             * sqrt({_SQL_DOT.format(a='b.v', b='b.v')})) >= 0.4
    """,
)
def emb_neardup_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (>= 0.4 on this corpus — the
    fixtures plant no true dups; threshold chosen to yield rows)."""
    emb = table(spark, sf, "embeddings")
    return similarity.embedding_neardup_pairs(emb, threshold=0.4)


@register(
    "emb_centroids",
    oracle="""
    SELECT CAST(vec_id % 10 AS INT)  AS grp,
           CAST(u.p[1] AS INT)       AS dim,
           ROUND(AVG(u.p[2]), 4)     AS centroid
    FROM (
      SELECT vec_id,
             unnest(list_zip(range(len(embedding)),
                             list_transform(embedding, x -> CAST(x AS DOUBLE)))) AS p
      FROM embeddings) u
    GROUP BY 1, 2
    """,
)
def emb_centroids(spark: SparkSession, sf: str) -> DataFrame:
    """Per-group embedding centroids via grouped-map applyInPandas (the
    IVF coarse-quantizer step); flat (grp, dim, centroid) output."""
    emb = table(spark, sf, "embeddings")
    return similarity.embedding_centroids(emb, n_groups=10)


# ---------------------------------------------------------------------------
# Multimodal
# ---------------------------------------------------------------------------


# mm_image_meta moved to advanced.py as the merged meta + aHash
# profile registration (r10: mm_phash64 consolidated in, VERDICT r9
# #1 — one Arrow decode pass instead of two).


@register(
    "mm_resize",
    oracle="""
    SELECT doc_id,
           CAST(224 AS INT) AS width,
           CAST(224 AS INT) AS height,
           CAST(octet_length(encode(text)) AS BIGINT) AS src_bytes,
           CAST(LEAST(CAST(784 AS BIGINT),
                CAST(ceil(octet_length(encode(text))::DOUBLE
                     / greatest(octet_length(encode(text)) // 784, 1)) AS BIGINT))
             AS BIGINT) AS resized_bytes
    FROM documents
    """,
)
def mm_resize(spark: SparkSession, sf: str) -> DataFrame:
    """Image resize through the real mapInPandas binary plumbing (pixel
    op stubbed as a deterministic byte down-sample: every ceil(n/784)-th
    byte, capped at 224*224/64 = 784). Oracle checks the output geometry
    and byte counts."""
    docs = table(spark, sf, "documents")
    out = multimodal.resize_images(docs, target=(224, 224))
    src = multimodal.attach_blob(table(spark, sf, "documents")).select(
        "doc_id", F.octet_length("blob").cast("long").alias("src_bytes")
    )
    return out.join(src, "doc_id").select(
        "doc_id",
        "width",
        "height",
        "src_bytes",
        F.octet_length("resized").cast("long").alias("resized_bytes"),
    )


@register(
    "mm_frame_offsets",
    oracle="""
    SELECT doc_id, CAST(i AS INT) AS frame_idx,
           CAST(floor(i * octet_length(encode(text)) / 4) AS BIGINT)
             AS byte_offset
    FROM documents, UNNEST(range(4)) AS t(i)
    """,
)
def mm_frame_offsets(spark: SparkSession, sf: str) -> DataFrame:
    """Frame-sampling fan-out (1 -> 4 deterministic byte offsets)."""
    docs = table(spark, sf, "documents")
    return multimodal.frame_offsets(docs, n_frames=4)


# ---------------------------------------------------------------------------
# Corpus preparation (operators/corpus.py): split / shuffle / sample /
# redact / pack — the dataset-assembly half of a training pipeline
# ---------------------------------------------------------------------------

# DuckDB mirror of corpus.hash_bucket(col, seed)
def _sql_bucket(expr: str, seed: int) -> str:
    return (
        f"CAST('0x' || substr(md5('{seed}:' || CAST({expr} AS VARCHAR)), 1, 8) "
        "AS BIGINT) % 10000"
    )


@register(
    "corpus_split",
    oracle=f"""
    SELECT doc_id,
           CASE WHEN {_sql_bucket('doc_id', 42)} < 9000 THEN 'train'
                WHEN {_sql_bucket('doc_id', 42)} < 9500 THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    """,
)
def corpus_split(spark: SparkSession, sf: str) -> DataFrame:
    """Hash-stable train/val/test assignment (90/5/5): survives
    reprocessing and insertion, unlike row-number splits."""
    docs = table(spark, sf, "documents")
    return corpus.with_split(docs, seed=42).select("doc_id", "split")


@register(
    "corpus_shuffle",
    oracle="""
    SELECT doc_id,
           CAST(ROW_NUMBER() OVER (
             ORDER BY md5('42:' || CAST(doc_id AS VARCHAR)), doc_id
           ) AS BIGINT) AS shuffle_rank
    FROM documents
    """,
)
def corpus_shuffle(spark: SparkSession, sf: str) -> DataFrame:
    """Seeded global shuffle fixing a reproducible training order."""
    docs = table(spark, sf, "documents")
    return corpus.seeded_shuffle(docs, seed=42).select("doc_id", "shuffle_rank")


#: Mixing rates per source, derived from the source index so both sides
#: compute them identically: src0 -> 0.25, src1 -> 0.5, src2 -> 0.75,
#: src3 -> 1.0, src4 -> 0.25, ...
_MIX_RATES = {f"src{i}": (i % 4 + 1) / 4 for i in range(20)}


@register(
    "corpus_weighted_sample",
    oracle=f"""
    SELECT doc_id, source
    FROM documents
    WHERE {_sql_bucket('doc_id', 7)} <
          CASE {' '.join(f"WHEN source = '{s}' THEN {int(r * 10000)}"
                         for s, r in sorted(_MIX_RATES.items()))}
          ELSE 0 END
    """,
)
def corpus_weighted_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic per-source Bernoulli sampling at training-blend
    rates; same ids survive every run."""
    docs = table(spark, sf, "documents")
    return corpus.weighted_sample(docs, _MIX_RATES, seed=7).select(
        "doc_id", "source"
    )


# The synthetic corpus is plain words, so the redaction query plants PII
# deterministically by doc_id % 4 (none / email / ip / all three) before
# scrubbing — the oracle builds the identical text and re-runs the same
# pattern chain with RE2.
_PII_SUFFIX_SQL = """
      CASE doc_id % 4
        WHEN 1 THEN ' mail u' || CAST(doc_id AS VARCHAR) || '@ex.org now'
        WHEN 2 THEN ' from 10.1.' || CAST(doc_id % 256 AS VARCHAR) || '.7 port 53'
        WHEN 3 THEN ' u' || CAST(doc_id AS VARCHAR)
             || '@ex.org at 10.1.' || CAST(doc_id % 256 AS VARCHAR)
             || '.7 acct 900123456' || CAST(doc_id % 10 AS VARCHAR)
        ELSE ''
      END
"""


@register(
    "corpus_pii_redact",
    oracle=rf"""
    WITH planted AS (
      SELECT doc_id, text || {_PII_SUFFIX_SQL} AS t0 FROM documents),
    s1 AS (
      SELECT doc_id,
             CAST(len(regexp_extract_all(t0,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{{2,}}')) AS BIGINT)
               AS n_email,
             regexp_replace(t0,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{{2,}}',
               '<EMAIL>', 'g') AS t1
      FROM planted),
    s2 AS (
      SELECT doc_id, n_email,
             CAST(len(regexp_extract_all(t1,
               '\b[0-9]{{1,3}}\.[0-9]{{1,3}}\.[0-9]{{1,3}}\.[0-9]{{1,3}}\b'))
               AS BIGINT) AS n_ipv4,
             regexp_replace(t1,
               '\b[0-9]{{1,3}}\.[0-9]{{1,3}}\.[0-9]{{1,3}}\.[0-9]{{1,3}}\b',
               '<IP>', 'g') AS t2
      FROM s1),
    s3 AS (
      SELECT doc_id, n_email, n_ipv4,
             CAST(len(regexp_extract_all(t2, '[0-9]{{9,}}')) AS BIGINT)
               AS n_longnum,
             regexp_replace(t2, '[0-9]{{9,}}', '<NUM>', 'g') AS t3
      FROM s2)
    SELECT doc_id, n_email, n_ipv4, n_longnum,
           CAST(LENGTH(t3) AS BIGINT) AS redacted_len,
           md5(t3) AS redacted_md5
    FROM s3
    """,
)
def corpus_pii_redact(spark: SparkSession, sf: str) -> DataFrame:
    """PII scrub (email -> IPv4 -> long-number, sequential) over text
    with deterministically planted PII; output counts + a redacted-text
    hash so the oracle checks the scrubbed bytes, not just the counts."""
    docs = table(spark, sf, "documents")
    m = F.col("doc_id") % 4
    did = F.col("doc_id").cast("string")
    suffix = (
        F.when(m == 1, F.concat(F.lit(" mail u"), did, F.lit("@ex.org now")))
        .when(
            m == 2,
            F.concat(
                F.lit(" from 10.1."),
                (F.col("doc_id") % 256).cast("string"),
                F.lit(".7 port 53"),
            ),
        )
        .when(
            m == 3,
            F.concat(
                F.lit(" u"),
                did,
                F.lit("@ex.org at 10.1."),
                (F.col("doc_id") % 256).cast("string"),
                F.lit(".7 acct 900123456"),
                (F.col("doc_id") % 10).cast("string"),
            ),
        )
        .otherwise(F.lit(""))
    )
    planted = docs.select(
        "doc_id", F.concat(F.col("text"), suffix).alias("text")
    )
    out = corpus.pii_redact(planted)
    return out.select(
        "doc_id",
        "n_email",
        "n_ipv4",
        "n_longnum",
        F.length("redacted").cast("long").alias("redacted_len"),
        F.md5(F.encode(F.col("redacted"), "UTF-8")).alias("redacted_md5"),
    )


_PACK_BUDGET = 64
_PACK_SHARDS = 8


@register(
    "corpus_pack_sequences",
    oracle=rf"""
    WITH RECURSIVE d AS (
      SELECT doc_id,
             doc_id % {_PACK_SHARDS} AS shard,
             CAST(len({_SQL_TOKENS}) AS BIGINT) AS tokens,
             ROW_NUMBER() OVER (
               PARTITION BY doc_id % {_PACK_SHARDS} ORDER BY doc_id) AS rn
      FROM documents),
    p(shard, rn, doc_id, bin_in_shard, tokens, acc) AS (
      SELECT shard, rn, doc_id, CAST(0 AS BIGINT), tokens, tokens
      FROM d WHERE rn = 1
      UNION ALL
      SELECT d.shard, d.rn, d.doc_id,
             CASE WHEN p.acc > 0 AND p.acc + d.tokens > {_PACK_BUDGET}
                  THEN p.bin_in_shard + 1 ELSE p.bin_in_shard END,
             d.tokens,
             CASE WHEN p.acc > 0 AND p.acc + d.tokens > {_PACK_BUDGET}
                  THEN d.tokens ELSE p.acc + d.tokens END
      FROM p JOIN d ON d.shard = p.shard AND d.rn = p.rn + 1)
    SELECT doc_id, shard, bin_in_shard, tokens FROM p
    """,
)
def corpus_pack_sequences(spark: SparkSession, sf: str) -> DataFrame:
    """Next-fit token packing into budget-sized (64-token) training
    sequences, sharded for parallelism (packing is order-dependent, so
    the shard is the determinism unit). Oracle replays the same walk as
    a recursive CTE."""
    docs = table(spark, sf, "documents")
    with_toks = text.with_token_counts(docs).select("doc_id", "n_tokens")
    return corpus.pack_sequences(
        with_toks, budget=_PACK_BUDGET, n_shards=_PACK_SHARDS
    )


@register(
    "corpus_capped_per_source",
    oracle="""
    WITH ranked AS (
      SELECT doc_id, source,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY md5('13:' || CAST(doc_id AS VARCHAR)), doc_id
             ) AS BIGINT) AS sample_rank
      FROM documents)
    SELECT doc_id, source, sample_rank FROM ranked WHERE sample_rank <= 10
    """,
)
def corpus_capped_per_source(spark: SparkSession, sf: str) -> DataFrame:
    """At most 10 docs per source, hash-uniform and deterministic — the
    per-key cap a blend applies to over-represented sources."""
    docs = table(spark, sf, "documents")
    return corpus.capped_sample_per_source(docs, k=10, seed=13).select(
        "doc_id", "source", "sample_rank"
    )


_CHUNK_SIZE, _CHUNK_STRIDE = 32, 24


@register(
    "corpus_chunk_windows",
    oracle=rf"""
    WITH toked AS (
      SELECT doc_id, {_SQL_TOKENS} AS w, len({_SQL_TOKENS}) AS n
      FROM documents),
    starts AS (
      SELECT doc_id, w,
             CAST(s AS BIGINT) AS chunk_start,
             CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY s) - 1
               AS BIGINT) AS chunk_no
      FROM toked, UNNEST(range(0, greatest(n - 1, 0) + 1, {_CHUNK_STRIDE}))
        AS t(s)
      WHERE n > 0)
    SELECT doc_id, chunk_no, chunk_start,
           CAST(len(w[chunk_start + 1 : chunk_start + {_CHUNK_SIZE}]) AS BIGINT)
             AS n_chunk_tokens,
           array_to_string(w[chunk_start + 1 : chunk_start + {_CHUNK_SIZE}], ' ')
             AS chunk_text
    FROM starts
    """,
)
def corpus_chunk_windows(spark: SparkSession, sf: str) -> DataFrame:
    """Sliding 32-token windows every 24 tokens (8-token overlap) — the
    context-length chunking step; narrow posexplode, no shuffle."""
    docs = table(spark, sf, "documents")
    return corpus.chunk_windows(docs, size=_CHUNK_SIZE, stride=_CHUNK_STRIDE)


# ---------------------------------------------------------------------------
# Benchmark decontamination + repetition filters
# ---------------------------------------------------------------------------

_DECON_N = 8  # word n-gram width for contamination matching

_DECON_GRAM = " || ' ' || ".join(f"w[i+{j}]" for j in range(1, _DECON_N + 1))


_DECON_ORACLE = rf"""
    WITH toked AS (SELECT doc_id, {_SQL_TOKENS} AS w FROM documents),
    sh AS (
      SELECT doc_id,
             CASE WHEN len(w) >= {_DECON_N}
                  THEN list_distinct(list_transform(
                         range(len(w) - {_DECON_N - 1}), i -> {_DECON_GRAM}))
                  ELSE CAST([] AS VARCHAR[]) END AS s
      FROM toked),
    bench AS (SELECT flatten(list(s)) AS bl FROM sh WHERE doc_id % 97 = 0),
    stats AS (
      SELECT doc_id,
             CAST(len(s) AS BIGINT) AS n_shingles,
             CAST(len(list_intersect(s, b.bl)) AS BIGINT) AS n_hits
      FROM sh, bench b)
    SELECT doc_id, n_shingles, n_hits,
           CASE WHEN n_shingles > 0
                THEN ROUND(n_hits * 1.0 / n_shingles, 4) ELSE 0.0 END
             AS contam_frac,
           n_hits > 0 AS is_contaminated
    FROM stats
    """


@register("corpus_decontaminate", oracle=_DECON_ORACLE)
def corpus_decontaminate(spark: SparkSession, sf: str) -> DataFrame:
    """Benchmark decontamination: every ~97th doc poses as the held-out
    eval set; any training doc sharing an 8-gram with it is flagged (the
    GPT-3/Llama contamination rule). Benchmark shingle set is broadcast;
    the corpus is never shuffled on the shingle key."""
    docs = table(spark, sf, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    return corpus.decontaminate(docs, bench, n=_DECON_N)


# Source-overlap matrix: per-source MinHash signatures (same KM hash
# family as the doc-level signatures) compared pairwise; the oracle
# rebuilds all 64 per-source minima and the exact match count.
_OVERLAP_H = 64
_OVERLAP_SIG_SQL = ",\n".join(
    f"             min(h1 + {j} * h2) AS m{j}" for j in range(_OVERLAP_H)
)
_OVERLAP_MATCH_SQL = " + ".join(
    f"CASE WHEN a.m{j} = b.m{j} THEN 1 ELSE 0 END" for j in range(_OVERLAP_H)
)


@register(
    "corpus_source_overlap",
    oracle=rf"""
    WITH toks AS (SELECT source, {_SQL_TOKENS} AS w FROM documents),
    sh AS (
      SELECT source,
             list_distinct(list_transform(range(len(w) - 2),
               i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) AS s
      FROM toks WHERE len(w) >= 3),
    posting AS (SELECT source, unnest(s) AS x FROM sh),
    hp AS (SELECT source,
             CAST('0x' || substr(md5(x), 1, 12) AS BIGINT)  AS h1,
             CAST('0x' || substr(md5(x), 13, 12) AS BIGINT) AS h2
           FROM posting),
    sig AS (SELECT source,
{_OVERLAP_SIG_SQL}
            FROM hp GROUP BY source)
    SELECT a.source AS source_a, b.source AS source_b,
           CAST({_OVERLAP_MATCH_SQL} AS BIGINT) AS n_sig_matches,
           ROUND(({_OVERLAP_MATCH_SQL}) / {_OVERLAP_H}.0, 4) AS est_jaccard
    FROM sig a JOIN sig b ON a.source < b.source
    """,
)
def corpus_source_overlap(spark: SparkSession, sf: str) -> DataFrame:
    """Which sources are re-scrapes of each other: pairwise Jaccard
    estimated from 64-long per-source MinHash signatures — one min-agg
    over the corpus, then a #sources^2 signature comparison that never
    touches the shingle sets again."""
    from dns_log_transformer_spark.operators.profile import source_overlap

    docs = table(spark, sf, "documents")
    return source_overlap(docs, num_hashes=_OVERLAP_H)


# Bloom-filter decontamination: the oracle rebuilds the EXACT bitset
# (same md5 h1/h2 halves, same (h1 + j*h2) % m positions, same 64-bit
# word packing) and probes it with the same coalesce(bit, false)
# semantics for sub-n-token docs, so a hash match attests the whole
# sketch, not just the flag. r10: the probe-stage columns merged into
# corpus_bloom_verified_decon's output (VERDICT r9 #1), so ONE
# registration attests the bitset, the probe counts, AND the verified
# exact flags it must not change.
_BLOOM_K = 4
_BLOOM_M = 1 << 16

_BLOOM_VERIFIED_ORACLE = rf"""
    WITH toked AS (SELECT doc_id, {_SQL_TOKENS} AS w FROM documents),
    sh AS (
      SELECT doc_id,
             CASE WHEN len(w) >= {_DECON_N}
                  THEN list_distinct(list_transform(
                         range(len(w) - {_DECON_N - 1}), i -> {_DECON_GRAM}))
                  ELSE CAST([] AS VARCHAR[]) END AS s
      FROM toked),
    bench AS (
      SELECT DISTINCT unnest(s) AS x FROM sh WHERE doc_id % 97 = 0),
    bhash AS (
      SELECT CAST('0x' || substr(md5(x), 1, 12) AS BIGINT)  AS h1,
             CAST('0x' || substr(md5(x), 13, 12) AS BIGINT) AS h2
      FROM bench),
    bpos AS (
      SELECT (h1 + j * h2) % {_BLOOM_M} AS p
      FROM bhash, range({_BLOOM_K}) t(j)),
    words AS (
      -- 63 bits per word (see operators/sketches.py _WORD_BITS): DuckDB's
      -- checked << rejects shifting into the sign bit
      SELECT p // 63 AS w,
             bit_or(1::BIGINT << CAST(p % 63 AS INT)) AS bits
      FROM bpos GROUP BY 1),
    posting AS (
      SELECT doc_id, len(s) AS n_shingles,
             unnest(CASE WHEN len(s) = 0
                         THEN [CAST(NULL AS VARCHAR)] ELSE s END) AS shingle
      FROM sh),
    phash AS (
      SELECT doc_id, n_shingles, shingle,
             CAST('0x' || substr(md5(shingle), 1, 12) AS BIGINT)  AS h1,
             CAST('0x' || substr(md5(shingle), 13, 12) AS BIGINT) AS h2
      FROM posting),
    probes AS (
      SELECT doc_id, n_shingles, shingle, j,
             (h1 + j * h2) % {_BLOOM_M} AS p
      FROM phash, range({_BLOOM_K}) t(j)),
    perbit AS (
      SELECT pr.doc_id, pr.n_shingles, pr.shingle, pr.j,
             COALESCE(((w.bits >> CAST(pr.p % 63 AS INT)) & 1) = 1, FALSE)
               AS bit_hit
      FROM probes pr LEFT JOIN words w ON w.w = pr.p // 63),
    pershingle AS (
      SELECT doc_id, n_shingles, shingle,
             bool_and(bit_hit) AS hit
      FROM perbit GROUP BY doc_id, n_shingles, shingle),
    perdoc AS (
      SELECT doc_id, n_shingles,
             CAST(SUM(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT)
               AS n_maybe_hits
      FROM pershingle GROUP BY doc_id, n_shingles),
    benchl AS (SELECT flatten(list(s)) AS bl FROM sh WHERE doc_id % 97 = 0),
    stats AS (
      SELECT doc_id,
             CAST(len(s) AS BIGINT) AS n_shingles,
             CAST(len(list_intersect(s, b.bl)) AS BIGINT) AS n_hits
      FROM sh, benchl b)
    SELECT s.doc_id, s.n_shingles,
           p.n_maybe_hits,
           p.n_maybe_hits > 0 AS maybe_contaminated,
           s.n_hits,
           CASE WHEN s.n_shingles > 0
                THEN ROUND(s.n_hits * 1.0 / s.n_shingles, 4) ELSE 0.0 END
             AS contam_frac,
           s.n_hits > 0 AS is_contaminated
    FROM stats s JOIN perdoc p USING (doc_id)
    """


# corpus_bloom_decontaminate was consolidated into
# corpus_bloom_verified_decon (r10, VERDICT r9 #1): the merged output
# carries the probe-stage columns beside the verified exact flags.
@register("corpus_bloom_verified_decon", oracle=_BLOOM_VERIFIED_ORACLE)
def corpus_bloom_verified_decon(spark: SparkSession, sf: str) -> DataFrame:
    """Exact decontamination through a Bloom pre-filter, with the
    probe stage ATTESTED in the same row (r10: the standalone
    corpus_bloom_decontaminate registration consolidated in):

    - ``n_maybe_hits`` / ``maybe_contaminated``: the k-bit-test probe
      against the fixed 8 KB bitset riding the corpus scan — the oracle
      rebuilds the EXACT bitset (same md5 halves, same probe positions,
      same 63-bit word packing), so a hash match attests the whole
      sketch, not just the flags;
    - ``n_hits`` / ``contam_frac`` / ``is_contaminated``: the verified
      exact values — only maybe-contaminated suspects pay the exact
      verification join (no false negatives, so clean docs emit
      zero-hit rows straight from the sketch stage), and the sketch
      must change the PLAN, not these answers (the one-sided-error
      containment n_maybe_hits >= n_hits is now visible row-by-row,
      and still pinned in test_sketches.py)."""
    docs = table(spark, sf, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    return corpus.bloom_verified_decontaminate(
        docs, bench, n=_DECON_N, k=_BLOOM_K, m_bits=_BLOOM_M,
        with_probe_stats=True,
    )


_REPETITION_ORACLE = rf"""
    WITH toked AS (SELECT doc_id, {_SQL_TOKENS} AS w FROM documents),
    base AS (
      SELECT doc_id,
             CAST(len(w) AS BIGINT) AS n_tokens,
             CAST(len(array_to_string(w, ' ')) AS BIGINT) AS n_chars,
             CAST(len(list_distinct(w)) AS BIGINT) AS n_distinct
      FROM toked),
    g2 AS (
      SELECT doc_id, unnest(list_transform(range(len(w) - 1),
               i -> w[i+1] || ' ' || w[i+2])) AS gram
      FROM toked WHERE len(w) >= 2),
    c2 AS (SELECT doc_id, gram, count(*) AS cnt FROM g2 GROUP BY doc_id, gram),
    top2 AS (
      SELECT doc_id, gram AS top2_gram, cnt AS top2_count
      FROM (SELECT doc_id, gram, cnt,
                   ROW_NUMBER() OVER (PARTITION BY doc_id
                                      ORDER BY cnt DESC, gram DESC) AS rn
            FROM c2)
      WHERE rn = 1),
    g5 AS (
      SELECT doc_id, unnest(list_transform(range(len(w) - 4),
               i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' ||
                    w[i+4] || ' ' || w[i+5])) AS gram
      FROM toked WHERE len(w) >= 5),
    c5 AS (
      SELECT doc_id, CAST(sum(cnt * len(gram)) AS BIGINT) AS dup5_chars
      FROM (SELECT doc_id, gram, count(*) AS cnt FROM g5 GROUP BY doc_id, gram)
      WHERE cnt > 1 GROUP BY doc_id),
    stats AS (
      SELECT b.doc_id, b.n_tokens,
             CASE WHEN b.n_tokens > 0
                  THEN ROUND((b.n_tokens - b.n_distinct) * 1.0 / b.n_tokens, 4)
                  ELSE 0.0 END AS dup_word_frac,
             t.top2_gram,
             CAST(COALESCE(t.top2_count, 0) AS BIGINT) AS top2_count,
             CASE WHEN b.n_chars > 0
                  THEN ROUND(COALESCE(t.top2_count, 0)
                             * len(COALESCE(t.top2_gram, '')) * 1.0
                             / b.n_chars, 4)
                  ELSE 0.0 END AS top2_char_frac,
             CASE WHEN b.n_chars > 0
                  THEN ROUND(COALESCE(c.dup5_chars, 0) * 1.0 / b.n_chars, 4)
                  ELSE 0.0 END AS dup5_char_frac
      FROM base b
      LEFT JOIN top2 t ON t.doc_id = b.doc_id
      LEFT JOIN c5 c ON c.doc_id = b.doc_id)
    SELECT *, (top2_char_frac > 0.15 OR dup5_char_frac > 0.30)
             AS flag_repetitive
    FROM stats
    """


@register("text_repetition", oracle=_REPETITION_ORACLE)
def text_repetition(spark: SparkSession, sf: str) -> DataFrame:
    """Gopher-style repetition stats + drop flag per document (dup-word
    fraction, top-2-gram character fraction, duplicated-5-gram character
    fraction)."""
    docs = table(spark, sf, "documents")
    return text.repetition_stats(docs)


@register(
    "corpus_prepare_funnel",
    oracle=rf"""
    WITH dec AS ({_DECON_ORACLE}),
    rep AS ({_REPETITION_ORACLE}),
    tok AS (SELECT doc_id, CAST(len({_SQL_TOKENS}) AS BIGINT) AS n_tokens
            FROM documents),
    s1 AS (SELECT MIN(doc_id) AS doc_id FROM documents
           GROUP BY md5({_SQL_NORM})),
    s2 AS (SELECT s1.doc_id FROM s1 JOIN dec USING (doc_id)
           WHERE NOT dec.is_contaminated),
    s3 AS (SELECT s2.doc_id FROM s2 JOIN rep USING (doc_id)
           WHERE NOT rep.flag_repetitive),
    sp AS (SELECT doc_id,
                  CASE WHEN {_sql_bucket('doc_id', 42)} < 9000 THEN 'train'
                       WHEN {_sql_bucket('doc_id', 42)} < 9500 THEN 'val'
                       ELSE 'test' END AS split
           FROM s3)
    SELECT 'raw' AS stage, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens FROM tok
    UNION ALL
    SELECT 'dedup', CAST(COUNT(*) AS BIGINT), CAST(SUM(n_tokens) AS BIGINT)
    FROM s1 JOIN tok USING (doc_id)
    UNION ALL
    SELECT 'decontaminated', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(n_tokens) AS BIGINT)
    FROM s2 JOIN tok USING (doc_id)
    UNION ALL
    SELECT 'clean', CAST(COUNT(*) AS BIGINT), CAST(SUM(n_tokens) AS BIGINT)
    FROM s3 JOIN tok USING (doc_id)
    UNION ALL
    SELECT 'split:' || split, CAST(COUNT(*) AS BIGINT),
           CAST(SUM(n_tokens) AS BIGINT)
    FROM sp JOIN tok USING (doc_id) GROUP BY split
    """,
)
def corpus_prepare_funnel(spark: SparkSession, sf: str) -> DataFrame:
    """End-to-end corpus preparation as one attested pipeline — the
    funnel a real training-data run ships: exact dedup (keep min-id per
    normalized-content hash) -> benchmark decontamination (drop any doc
    sharing an 8-gram with the held-out set) -> repetition filter (drop
    Gopher-flagged docs) -> deterministic train/val/test split. Output is
    the doc/token funnel per stage plus per-split totals.

    Shape at scale (r15 optimization): ONE per-doc flag frame — n_tokens
    plus the three stage predicates, assembled with one left semi-ish
    join per attested flag operator — feeds ONE conditional aggregate
    (stack() unpivots the 4 funnel stages) and the per-split aggregate.
    Replaces the r7 shape's five separate join+agg branches (each stage
    set re-joined against a persisted token frame); stage semantics are
    identical: dedup = keep-set membership, decontaminated = kept AND
    NOT contaminated, clean = that AND NOT repetitive. The flag frame is
    persisted because both aggregates consume it (PLANS.md rule 4).
    """
    docs = table(spark, sf, "documents").select("doc_id", "text")
    toks = text.with_token_counts(docs).select("doc_id", "n_tokens")
    keep = dedup.exact_dup_groups(docs).select(
        F.col("keep_id").alias("doc_id"), F.lit(True).alias("_kept")
    )
    dec = corpus.decontaminate(
        docs, docs.filter(F.col("doc_id") % 97 == 0), n=_DECON_N
    ).select("doc_id", "is_contaminated")
    rep = text.repetition_stats(docs).select("doc_id", "flag_repetitive")

    c_dedup = F.coalesce(F.col("_kept"), F.lit(False))
    c_decon = c_dedup & ~F.col("is_contaminated")
    c_clean = c_decon & ~F.col("flag_repetitive")
    flags = persist_tracked(
        toks.join(keep, "doc_id", "left")
        .join(dec, "doc_id")
        .join(rep, "doc_id")
        .select(
            "doc_id",
            "n_tokens",
            c_dedup.alias("c_dedup"),
            c_decon.alias("c_decon"),
            c_clean.alias("c_clean"),
        )
    )

    def _stage(cond, tag: str):
        return [
            F.count(F.when(cond, True)).cast("long").alias(f"{tag}_d"),
            F.sum(F.when(cond, F.col("n_tokens")))
            .cast("long")
            .alias(f"{tag}_t"),
        ]

    funnel = flags.agg(
        *_stage(F.lit(True), "raw"),
        *_stage(F.col("c_dedup"), "dd"),
        *_stage(F.col("c_decon"), "dc"),
        *_stage(F.col("c_clean"), "cl"),
    ).select(
        F.expr(
            "stack(4, 'raw', raw_d, raw_t, 'dedup', dd_d, dd_t,"
            " 'decontaminated', dc_d, dc_t, 'clean', cl_d, cl_t)"
            " AS (stage, n_docs, n_tokens)"
        )
    )
    per_split = (
        corpus.with_split(flags.filter(F.col("c_clean")))
        .groupBy("split")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
        )
        .select(
            F.concat(F.lit("split:"), F.col("split")).alias("stage"),
            "n_docs",
            "n_tokens",
        )
    )
    return funnel.unionAll(per_split)


@register(
    "emb_semantic_dedup",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings),
    {_SEMDEDUP_CB},
    assigned AS (
      SELECT vec_id, v, cell FROM (
        SELECT e.vec_id, e.v, cb.cell,
               ROW_NUMBER() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY {_SQL_DOT.format(a='e.v', b='cb.cv')}
                          / sqrt({_SQL_DOT.format(a='cb.cv', b='cb.cv')})
                          DESC, cb.cell) AS rn
        FROM e, cb)
      WHERE rn = 1)
    SELECT cell, id_a, id_b, cos_sim FROM (
      SELECT a.cell, a.vec_id AS id_a, b.vec_id AS id_b,
             ROUND({_SQL_DOT.format(a='a.v', b='b.v')}
               / (sqrt({_SQL_DOT.format(a='a.v', b='a.v')})
                  * sqrt({_SQL_DOT.format(a='b.v', b='b.v')})), 4) AS cos_sim
      FROM assigned a JOIN assigned b
        ON a.cell = b.cell AND a.vec_id < b.vec_id)
    WHERE cos_sim >= 0.4
    """,
)
def emb_semantic_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """SemDeDup: assign every vector to its nearest seed centroid, then
    exact-cosine near-dup pairs within each cell only — the clustering
    scale path (pairs bounded by cell size, never corpus-wide)."""
    emb = table(spark, sf, "embeddings")
    return similarity.semantic_dedup_pairs(
        emb, n_cells=_SEMDEDUP_CELLS, threshold=0.4
    )


_SQL_L2 = "list_sum(list_transform(list_zip({a}, {b}), p -> (p[1]-p[2])*(p[1]-p[2])))"


@register(
    "emb_kmeans",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings),
    c0 AS (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS cell,
             v AS c
      FROM e ORDER BY vec_id LIMIT 8),
    a1 AS (
      SELECT vec_id, cell FROM (
        SELECT e.vec_id, c0.cell,
               ROW_NUMBER() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY {_SQL_L2.format(a='e.v', b='c0.c')}, c0.cell) AS rn
        FROM e, c0)
      WHERE rn = 1),
    m1 AS (
      SELECT cell, CAST(p[1] AS INT) AS dim, ROUND(AVG(p[2]), 4) AS cd
      FROM (
        SELECT a1.cell,
               unnest(list_zip(range(len(e.v)), e.v)) AS p
        FROM a1 JOIN e USING (vec_id))
      GROUP BY 1, 2),
    c1u AS (SELECT cell, list(cd ORDER BY dim) AS c FROM m1 GROUP BY cell),
    c1 AS (
      SELECT c0.cell, COALESCE(c1u.c, c0.c) AS c
      FROM c0 LEFT JOIN c1u USING (cell)),
    a2 AS (
      SELECT vec_id, cell FROM (
        SELECT e.vec_id, c1.cell,
               ROW_NUMBER() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY {_SQL_L2.format(a='e.v', b='c1.c')}, c1.cell) AS rn
        FROM e, c1)
      WHERE rn = 1),
    m2 AS (
      SELECT cell, CAST(p[1] AS INT) AS dim, ROUND(AVG(p[2]), 4) AS cd
      FROM (
        SELECT a2.cell,
               unnest(list_zip(range(len(e.v)), e.v)) AS p
        FROM a2 JOIN e USING (vec_id))
      GROUP BY 1, 2),
    c2u AS (SELECT cell, list(cd ORDER BY dim) AS c FROM m2 GROUP BY cell),
    c2 AS (
      SELECT c1.cell, COALESCE(c2u.c, c1.c) AS c
      FROM c1 LEFT JOIN c2u USING (cell))
    SELECT vec_id, cell FROM (
      SELECT e.vec_id, c2.cell,
             ROW_NUMBER() OVER (
               PARTITION BY e.vec_id
               ORDER BY {_SQL_L2.format(a='e.v', b='c2.c')}, c2.cell) AS rn
      FROM e, c2)
    WHERE rn = 1
    ORDER BY vec_id
    """,
)
def emb_kmeans(spark: SparkSession, sf: str) -> DataFrame:
    """Two Lloyd iterations of k-means (k=8) over the embeddings table;
    int-only (vec_id, cell) output. The oracle unrolls both iterations in
    SQL with the identical deterministic rules (lowest-id init, in-order
    L2 fold, lowest-cell tie-break, 4-decimal centroid rounding)."""
    emb = table(spark, sf, "embeddings")
    return similarity.kmeans_assign(emb, k=8, n_iter=2)


@register(
    "mm_blob_digest",
    oracle="""
    SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS digest
    FROM documents
    """,
)
def mm_blob_digest(spark: SparkSession, sf: str) -> DataFrame:
    """Content-addressing over binary payloads through mapInArrow (the
    zero-copy Arrow batch surface; operators/multimodal.py). The blob is
    the utf-8 encoding of text, so DuckDB's md5(text) hashes the same
    bytes."""
    docs = table(spark, sf, "documents")
    return multimodal.blob_digest(docs)


@register(
    "corpus_vocab_topk",
    oracle=f"""
    WITH toks AS (
      SELECT unnest({_SQL_TOKENS}) AS token FROM documents)
    SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM toks
    GROUP BY token
    ORDER BY cnt DESC, token
    LIMIT 200
    """,
)
def corpus_vocab_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Global vocabulary statistics — the corpus-wide token histogram a
    BPE/tokenizer training run starts from. explode -> partial+final
    count (map-side combine collapses each partition to its distinct
    tokens before the shuffle, so the exchange carries vocabulary-sized
    data, not corpus-sized) -> global top-k via sort+limit (Spark plans
    TakeOrderedAndProject: per-partition heaps, no full sort)."""
    docs = table(spark, sf, "documents")
    return (
        docs.select(F.explode(text.tokens(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").cast("long").alias("cnt"))
        .orderBy(F.col("cnt").desc(), "token")
        .limit(200)
    )


# ---------------------------------------------------------------------------
# Round-3 additions: span-level exact dedup (C4), DSIR importance
# weights, temperature-balanced source sampling
# ---------------------------------------------------------------------------

_SPAN_TOKENS = 8


@register(
    "corpus_span_dedup",
    oracle=rf"""
    WITH toked AS (
      SELECT doc_id, {_SQL_TOKENS} AS w, len({_SQL_TOKENS}) AS n
      FROM documents),
    spans AS (
      SELECT doc_id,
             CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY s) - 1
               AS BIGINT) AS span_idx,
             array_to_string(w[s + 1 : s + {_SPAN_TOKENS}], ' ') AS span_text
      FROM toked, UNNEST(range(0, greatest(n - 1, 0) + 1, {_SPAN_TOKENS}))
        AS t(s)
      WHERE n > 0),
    flagged AS (
      SELECT doc_id, span_idx, span_text,
             ROW_NUMBER() OVER (PARTITION BY span_text
                                ORDER BY doc_id, span_idx) = 1 AS kept
      FROM spans)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_spans,
           CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           COALESCE(array_to_string(
             list(CASE WHEN kept THEN span_text END ORDER BY span_idx)
               FILTER (WHERE kept), ' '), '') AS kept_text
    FROM flagged
    GROUP BY doc_id
    """,
)
def corpus_span_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """C4-style duplicate-span removal: corpus-wide first occurrence of
    each 8-token span survives; per-doc span survival + surviving text.
    Map-side-combined first-occurrence agg, no window over span keys."""
    docs = table(spark, sf, "documents")
    return corpus.span_dedup(docs, span_tokens=_SPAN_TOKENS)


@register(
    "corpus_dsir_weights",
    oracle=f"""
    WITH toked AS (
      SELECT doc_id, lang = 'en' AS is_target, {_SQL_TOKENS} AS w
      FROM documents),
    grams AS (
      SELECT doc_id, is_target,
             CAST('0x' || substr(md5(w[i] || ' ' || w[i + 1]), 1, 8) AS BIGINT)
               % {corpus.DSIR_BUCKETS} AS f
      FROM toked, UNNEST(range(1, len(w))) AS t(i)
      WHERE len(w) >= 2),
    hist AS (
      SELECT f,
             SUM(CASE WHEN is_target THEN 1 ELSE 0 END) AS t_cnt,
             COUNT(*) AS r_cnt
      FROM grams GROUP BY f)
    SELECT g.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(SUM(h.t_cnt + 1) AS BIGINT) AS target_mass,
           CAST(SUM(h.r_cnt + 1) AS BIGINT) AS raw_mass,
           ROUND(CAST(SUM(h.t_cnt + 1) AS DOUBLE)
                 / CAST(SUM(h.r_cnt + 1) AS DOUBLE), 4) AS weight
    FROM grams g JOIN hist h USING (f)
    GROUP BY g.doc_id
    """,
)
def corpus_dsir_weights(spark: SparkSession, sf: str) -> DataFrame:
    """DSIR importance weights with English docs as the target domain:
    hashed-bigram histograms (target vs raw), per-doc target-likeness as
    a ratio of exact integer masses. Histograms map-side-combine to 1024
    rows and broadcast; the corpus never shuffles on the feature key."""
    docs = table(spark, sf, "documents")
    return corpus.dsir_weights(docs, target_filter=F.col("lang") == "en")


_TEMP_TOTAL = 120


@register(
    "corpus_temperature_sample",
    oracle=f"""
    WITH counts AS (
      SELECT source, COUNT(*) AS n FROM documents GROUP BY source),
    srt AS (
      SELECT source, n, CAST(ROUND(sqrt(n), 6) AS DECIMAL(20,6)) AS s
      FROM counts),
    quota AS (
      SELECT source,
             GREATEST(1, CAST(floor({_TEMP_TOTAL}
               * CAST(s AS DOUBLE)
               / CAST((SELECT SUM(s) FROM srt) AS DOUBLE)) AS BIGINT))
               AS q
      FROM srt),
    ranked AS (
      SELECT d.*,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY d.source
               ORDER BY md5('29:' || CAST(d.doc_id AS VARCHAR)), d.doc_id)
               AS BIGINT) AS sample_rank
      FROM documents d)
    SELECT r.doc_id, r.text, r.lang, r.source, r.n_chars, r.sample_rank
    FROM ranked r JOIN quota q USING (source)
    WHERE r.sample_rank <= q.q
    """,
)
def corpus_temperature_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Temperature-balanced (alpha=0.5) source mixing: each source's
    quota is proportional to sqrt of its row count; quota-many docs per
    source selected by seeded hash rank through the skew-immune
    pre-filter (no full-source sorts)."""
    docs = table(spark, sf, "documents")
    return corpus.temperature_sample(docs, total=_TEMP_TOTAL)


# text_quality_classifier was consolidated into text_quality (r10,
# VERDICT r9 #1) — the classifier columns ride the merged per-doc frame.


_BM25_TERMS = ("spark", "join", "window")


@register(
    "text_bm25_topk",
    oracle=f"""
    WITH toked AS (
      SELECT doc_id, {_SQL_TOKENS} AS w, len({_SQL_TOKENS}) AS _len
      FROM documents),
    hits AS (
      SELECT doc_id,
             {', '.join(
                 f"CAST(SUM(CASE WHEN tok = '{t}' THEN 1 ELSE 0 END) AS BIGINT)"
                 f" AS tf_{i}" for i, t in enumerate(_BM25_TERMS))}
      FROM (SELECT doc_id, unnest(w) AS tok FROM toked)
      WHERE tok IN {_BM25_TERMS!r}
      GROUP BY doc_id),
    consts AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(_len) AS BIGINT) AS tot_len
      FROM toked),
    dfs AS (
      SELECT {', '.join(
          f"CAST(SUM(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS BIGINT)"
          f" AS df_{i}" for i in range(len(_BM25_TERMS)))}
      FROM hits)
    SELECT t.doc_id,
           ROUND(
             {' + '.join(
                 f"ln((n_docs - df_{i} + 0.5) / (df_{i} + 0.5) + 1.0)"
                 f" * (CAST(tf_{i} AS DOUBLE) * (1.2 + 1)"
                 f" / (CAST(tf_{i} AS DOUBLE) + 1.2 * (1 - 0.75 + 0.75"
                 f" * t._len / (CAST(tot_len AS DOUBLE) / n_docs))))"
                 for i in range(len(_BM25_TERMS)))},
             4) AS score,
           {', '.join(f"h.tf_{i}" for i in range(len(_BM25_TERMS)))}
    FROM toked t
    JOIN hits h USING (doc_id), consts, dfs
    ORDER BY score DESC, t.doc_id
    LIMIT 20
    """,
)
def text_bm25_topk(spark: SparkSession, sf: str) -> DataFrame:
    """BM25 top-20 for a fixed 3-term query: exact-integer tf/df, one
    broadcast constants row, explicit ordered score expression (no float
    aggregation fold), TakeOrderedAndProject top-k."""
    docs = table(spark, sf, "documents")
    return text.bm25_topk(docs, terms=_BM25_TERMS, k=20)


_HE_DIM = text.HASH_EMBED_DIM


@register(
    "text_hashed_embedding",
    oracle=f"""
    WITH toked AS (
      SELECT doc_id, unnest({_SQL_TOKENS}) AS tok FROM documents),
    hashed AS (
      SELECT doc_id,
             CAST('0x' || substr(md5(tok), 1, 8) AS BIGINT) AS h
      FROM toked),
    cells AS (
      SELECT doc_id, CAST(h % {_HE_DIM} AS INT) AS d,
             CAST(SUM(((h // 1048576) % 2) * 2 - 1) AS BIGINT) AS v
      FROM hashed GROUP BY 1, 2),
    gathered AS (
      SELECT doc_id, list(d ORDER BY d) AS ds, list(v ORDER BY d) AS vs
      FROM cells GROUP BY doc_id)
    SELECT doc_id,
           array_to_string(
             list_transform(range({_HE_DIM}),
               i -> CAST(COALESCE(vs[list_position(ds, CAST(i AS INT))], 0)
                         AS VARCHAR)),
             ',') AS embedding_csv
    FROM gathered
    """,
)
def text_hashed_embedding(spark: SparkSession, sf: str) -> DataFrame:
    """Feature-hashed bag-of-words doc embeddings (signed 64-dim integer
    vectors) — text-to-vector without a model, feeding the ANN family at
    the same (id, embedding) interface.

    The driver-facing projection serializes the vector to one
    comma-joined string column (``embedding_csv``): the harness
    canonicalizes results with a raw ``DataFrame.sort_values`` over all
    columns, which cannot sort list cells. ANN consumers use the
    array-returning ``text.hashed_embedding`` operator directly (see
    ``dedup_text_embedding_lsh``). ``array_join`` over a whole-array
    cast keeps serialization codegen'd — no per-element lambda."""
    docs = table(spark, sf, "documents")
    emb = text.hashed_embedding(docs)
    return emb.select(
        "doc_id",
        F.array_join(F.col("embedding").cast("array<string>"), ",").alias(
            "embedding_csv"
        ),
    )


_HE_SQL = f"""
    he AS (
      SELECT doc_id,
             list_transform(range({_HE_DIM}),
                            i -> CAST(COALESCE(
                              vs[list_position(ds, CAST(i AS INT))], 0)
                              AS DOUBLE)) AS v
      FROM (
        SELECT doc_id, list(d ORDER BY d) AS ds, list(v ORDER BY d) AS vs
        FROM (
          SELECT doc_id, CAST(h % {_HE_DIM} AS INT) AS d,
                 CAST(SUM(((h // 1048576) % 2) * 2 - 1) AS BIGINT) AS v
          FROM (
            SELECT doc_id,
                   CAST('0x' || substr(md5(tok), 1, 8) AS BIGINT) AS h
            FROM (SELECT doc_id, unnest({_SQL_TOKENS}) AS tok FROM documents))
          GROUP BY 1, 2)
        GROUP BY doc_id))
"""


_LSH_BUCKET_CAP = 100  # skew guard: buckets with more members skip the pair join


@register(
    "dedup_text_embedding_lsh",
    oracle=f"""
    WITH {_HE_SQL},
    keyed AS (
      SELECT doc_id, v, CAST({_lsh_key_sql(24)} AS INT) AS lsh_key FROM he),
    kept AS (
      SELECT doc_id, v, lsh_key FROM (
        SELECT doc_id, v, lsh_key,
               COUNT(*) OVER (PARTITION BY lsh_key) AS _c
        FROM keyed)
      WHERE _c <= {_LSH_BUCKET_CAP}),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             ROUND({_SQL_DOT.format(a='a.v', b='b.v')}
               / (sqrt({_SQL_DOT.format(a='a.v', b='a.v')})
                  * sqrt({_SQL_DOT.format(a='b.v', b='b.v')})), 4) AS cos_sim
      FROM kept a JOIN kept b
        ON a.lsh_key = b.lsh_key AND a.doc_id < b.doc_id)
    SELECT id_a, id_b, cos_sim FROM pairs WHERE cos_sim >= 0.8
    """,
)
def dedup_text_embedding_lsh(spark: SparkSession, sf: str) -> DataFrame:
    """Cross-family composition: text -> feature-hashed embeddings ->
    LSH buckets -> within-bucket exact cosine pairs >= 0.8. The
    embedding-space near-dup path run entirely from raw text with no
    trained model — every stage's math is independently oracle-attested
    (text_hashed_embedding, sim_lsh_buckets), and this query attests the
    composition end-to-end.

    Skew guard (the ngram_jaccard df_cap analogue): buckets holding more
    than ``_LSH_BUCKET_CAP`` members are excluded from the pair join —
    at corpus scale one hot LSH key (typically identical/near-identical
    content, which no hyperplane can split) would otherwise become a
    single quadratic join partition. Oversized buckets are exact-dup
    territory; route them through ``dedup_exact`` instead. The cap is a
    per-key window count, so it shuffles on the SAME lsh_key the pair
    join uses — no extra join and no driver-side key list."""
    docs = table(spark, sf, "documents")
    emb = text.hashed_embedding(docs).select(
        F.col("doc_id").alias("vec_id"),
        F.col("embedding").cast("array<double>").alias("embedding"),
    )
    # persist BEFORE the window/self-join fan-out so tokenize+md5+matmul
    # runs once; ownership: the cache backs the returned (lazy) DataFrame,
    # released on session end / eviction (see PLANS.md persist ownership).
    keyed = persist_tracked(
        similarity.with_norm(
            similarity.with_lsh_bucket(emb, num_planes=24), "embedding"
        )
    )
    kept = (
        keyed.withColumn(
            "_c", F.count("*").over(W.partitionBy("lsh_key"))
        )
        .filter(F.col("_c") <= _LSH_BUCKET_CAP)
        .drop("_c")
    )
    a = kept.select(
        "lsh_key",
        F.col("vec_id").alias("id_a"),
        F.col("embedding").alias("_va"),
        F.col("nrm").alias("_na"),
    )
    b = kept.select(
        "lsh_key",
        F.col("vec_id").alias("id_b"),
        F.col("embedding").alias("_vb"),
        F.col("nrm").alias("_nb"),
    )
    cos = similarity.dot_pd(F.col("_va"), F.col("_vb")) / (
        F.col("_na") * F.col("_nb")
    )
    return (
        a.join(b, "lsh_key")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.round(cos, 4).alias("cos_sim"))
        .filter(F.col("cos_sim") >= 0.8)
    )


# ---------------------------------------------------------------------------
# Product quantization + count-min sketch (round 4)
# ---------------------------------------------------------------------------

_PQ_CELLS = similarity.PQ_CELLS
_PQ_M = similarity.PQ_SUBSPACES

# codebook CTE: the _SEMDEDUP_CB recipe at 16 cells (per-cell per-dim
# rounded mean over the deterministic seed partition)
_PQ_CB = f"""
    cb AS (
      SELECT cell, list(c ORDER BY dim) AS cv FROM (
        SELECT CAST(vec_id % {_PQ_CELLS} AS INT) AS cell,
               CAST(u.p[1] AS INT) AS dim,
               ROUND(AVG(u.p[2]), 4) AS c
        FROM (
          SELECT vec_id,
                 unnest(list_zip(range(len(embedding)),
                        list_transform(embedding, x -> CAST(x AS DOUBLE))))
                   AS p
          FROM embeddings) u
        GROUP BY 1, 2)
      GROUP BY cell)
"""

# per (vec, subspace) nearest cell: squared-L2 over the subspace dims,
# folded dim-by-dim (list_sum), ties to the lowest cell
_PQ_CODES = f"""
    codes AS (
      SELECT vec_id, sub, cell FROM (
        SELECT e.vec_id, s.sub, cb.cell,
               ROW_NUMBER() OVER (
                 PARTITION BY e.vec_id, s.sub
                 ORDER BY list_sum(list_transform(range({64 // _PQ_M}),
                           d -> (e.v[s.sub*{64 // _PQ_M} + d + 1]
                                 - cb.cv[s.sub*{64 // _PQ_M} + d + 1])
                              * (e.v[s.sub*{64 // _PQ_M} + d + 1]
                                 - cb.cv[s.sub*{64 // _PQ_M} + d + 1]))),
                          cb.cell) AS rn
        FROM e, range({_PQ_M}) s(sub), cb)
      WHERE rn = 1)
"""


# emb_pq_codes was consolidated into advanced.py emb_vector_codes
# (r10, VERDICT r9 #1): the pq_csv column rides the merged per-vector
# representation frame; _PQ_CB/_PQ_CODES stay the shared oracle CTEs
# (sim_pq_adc_topk and the merged oracle both build on them).


@register(
    "sim_pq_adc_topk",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings),
    {_PQ_CB},
    {_PQ_CODES},
    q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id % 50 = 0 AND vec_id < 2000),
    subsc AS (
      SELECT q.query_id, c.vec_id, c.sub,
             list_sum(list_transform(range({64 // _PQ_M}),
                      d -> q.qv[c.sub*{64 // _PQ_M} + d + 1]
                           * cb.cv[c.sub*{64 // _PQ_M} + d + 1])) AS ds
      FROM codes c JOIN cb USING (cell), q
      WHERE c.vec_id <> q.query_id),
    scored AS (
      SELECT query_id, vec_id,
             ROUND(list_sum(list(ds ORDER BY sub)), 4) AS adc_score
      FROM subsc GROUP BY 1, 2)
    SELECT query_id, vec_id, adc_score, rnk FROM (
      SELECT query_id, vec_id, adc_score,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY adc_score DESC, vec_id) AS rnk
      FROM scored)
    WHERE rnk <= 5
    """,
)
def sim_pq_adc_topk(spark: SparkSession, sf: str) -> DataFrame:
    """PQ asymmetric-distance top-5: the corpus is scanned as m-byte
    codes, each query carries a precomputed (subspace x cell) LUT, and
    scoring is m table lookups per candidate — the IVF-PQ memory path.
    The oracle rebuilds codes and LUT dots from the same rounded
    codebook and folds subspaces in the same order."""
    emb = table(spark, sf, "embeddings")
    queries = emb.filter((F.col("vec_id") % 50 == 0) & (F.col("vec_id") < 2000))
    return similarity.pq_adc_topk(emb, queries, k=5, m=_PQ_M, n_cells=_PQ_CELLS)


_CMS_D = sketches.CMS_DEPTH
_CMS_W = sketches.CMS_WIDTH


def _cms_h_sql(tok: str, j: int) -> str:
    return (
        f"CAST(CAST('0x' || substr(md5('{j}:' || {tok}), 1, 8) AS BIGINT)"
        f" % {_CMS_W} AS INT)"
    )


@register(
    "sketch_cms_topk",
    oracle=f"""
    WITH inst AS (
      SELECT unnest({_SQL_TOKENS}) AS tok FROM documents),
    hashed AS (
      SELECT j, CASE j
        {' '.join(f"WHEN {j} THEN {_cms_h_sql('tok', j)}" for j in range(_CMS_D))}
        END AS h
      FROM inst, range({_CMS_D}) t(j)),
    counters AS (SELECT j, h, COUNT(*) AS c FROM hashed GROUP BY 1, 2),
    cand AS (SELECT DISTINCT tok FROM inst),
    probes AS (
      SELECT tok, j, CASE j
        {' '.join(f"WHEN {j} THEN {_cms_h_sql('tok', j)}" for j in range(_CMS_D))}
        END AS h
      FROM cand, range({_CMS_D}) t(j)),
    est AS (
      SELECT p.tok, MIN(c.c) AS est
      FROM probes p JOIN counters c USING (j, h) GROUP BY p.tok)
    SELECT tok, est FROM est ORDER BY est DESC, tok LIMIT 20
    """,
)
def sketch_cms_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Count-min-sketch heavy hitters: token frequencies estimated from
    a fixed 4x64 counter grid (the shuffle carries the GRID, never the
    vocabulary), top-20 by estimate. Estimates are upper bounds — the
    over-estimate property and the bounded grid are pinned by
    tests/test_sketches.py."""
    docs = table(spark, sf, "documents")
    return sketches.cms_topk(docs, k=20)


# ---------------------------------------------------------------------------
# Hybrid retrieval: BM25 (lexical) + hashed-embedding cosine (semantic),
# fused with reciprocal-rank fusion (round 4)
# ---------------------------------------------------------------------------

_RRF_K0 = 60  # the standard RRF dampening constant (Cormack et al. 2009)
_RRF_N = 50  # candidates taken from each retriever before fusion


@register(
    "text_hybrid_rrf",
    oracle=f"""
    WITH toked AS (
      SELECT doc_id, {_SQL_TOKENS} AS w, len({_SQL_TOKENS}) AS _len
      FROM documents),
    hits AS (
      SELECT doc_id,
             {', '.join(
                 f"CAST(SUM(CASE WHEN tok = '{t}' THEN 1 ELSE 0 END) AS BIGINT)"
                 f" AS tf_{i}" for i, t in enumerate(_BM25_TERMS))}
      FROM (SELECT doc_id, unnest(w) AS tok FROM toked)
      WHERE tok IN {_BM25_TERMS!r}
      GROUP BY doc_id),
    consts AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(_len) AS BIGINT) AS tot_len
      FROM toked),
    dfs AS (
      SELECT {', '.join(
          f"CAST(SUM(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS BIGINT)"
          f" AS df_{i}" for i in range(len(_BM25_TERMS)))}
      FROM hits),
    lex AS (
      SELECT t.doc_id,
             ROUND(
               {' + '.join(
                   f"ln((n_docs - df_{i} + 0.5) / (df_{i} + 0.5) + 1.0)"
                   f" * (CAST(tf_{i} AS DOUBLE) * (1.2 + 1)"
                   f" / (CAST(tf_{i} AS DOUBLE) + 1.2 * (1 - 0.75 + 0.75"
                   f" * t._len / (CAST(tot_len AS DOUBLE) / n_docs))))"
                   for i in range(len(_BM25_TERMS)))},
               4) AS score
      FROM toked t
      JOIN hits h USING (doc_id), consts, dfs
      ORDER BY score DESC, t.doc_id
      LIMIT {_RRF_N}),
    lexr AS (
      SELECT doc_id,
             CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT)
               AS lex_rank
      FROM lex),
    {_HE_SQL},
    qtok AS (
      SELECT unnest(string_split_regex(
               trim('{' '.join(_BM25_TERMS)}'), '\\s+')) AS tok),
    qh AS (
      SELECT CAST('0x' || substr(md5(tok), 1, 8) AS BIGINT) AS h FROM qtok),
    qcells AS (
      SELECT CAST(h % {_HE_DIM} AS INT) AS d,
             CAST(SUM(((h // 1048576) % 2) * 2 - 1) AS BIGINT) AS v
      FROM qh GROUP BY 1),
    qvec AS (
      SELECT list_transform(range({_HE_DIM}),
               i -> CAST(COALESCE(
                 vs[list_position(ds, CAST(i AS INT))], 0) AS DOUBLE)) AS q
      FROM (SELECT list(d ORDER BY d) AS ds, list(v ORDER BY d) AS vs
            FROM qcells)),
    sem AS (
      SELECT doc_id,
             list_sum(list_transform(range({_HE_DIM}),
                                     i -> v[i+1] * q[i+1]))  AS dot,
             list_sum(list_transform(range({_HE_DIM}),
                                     i -> v[i+1] * v[i+1]))  AS n2d,
             list_sum(list_transform(range({_HE_DIM}),
                                     i -> q[i+1] * q[i+1]))  AS n2q
      FROM he, qvec),
    semtop AS (
      SELECT doc_id, dot / (sqrt(n2d) * sqrt(n2q)) AS cos
      FROM sem WHERE n2d > 0 AND dot <> 0
      ORDER BY cos DESC, doc_id
      LIMIT {_RRF_N}),
    semr AS (
      SELECT doc_id,
             CAST(row_number() OVER (ORDER BY cos DESC, doc_id) AS BIGINT)
               AS sem_rank
      FROM semtop)
    SELECT COALESCE(l.doc_id, s.doc_id) AS doc_id,
           ROUND(COALESCE(1.0 / ({_RRF_K0} + l.lex_rank), 0)
                 + COALESCE(1.0 / ({_RRF_K0} + s.sem_rank), 0), 6)
             AS rrf_score,
           l.lex_rank AS lex_rank,
           s.sem_rank AS sem_rank
    FROM lexr l FULL JOIN semr s ON l.doc_id = s.doc_id
    ORDER BY rrf_score DESC, doc_id
    LIMIT 20
    """,
)
def text_hybrid_rrf(spark: SparkSession, sf: str) -> DataFrame:
    """Hybrid search: top-20 documents for the fixed query by
    reciprocal-rank fusion of a lexical retriever (BM25) and a semantic
    retriever (hashed-embedding cosine), rrf = sum 1/(k0 + rank) — the
    standard two-tower fusion recipe.

    Shape at scale: each retriever produces its candidate list with a
    distributed TakeOrderedAndProject top-N; ranking and fusion then
    touch only 2N rows (parameter-bounded, so the unpartitioned
    row_number windows and the full-outer fusion join are
    constant-size regardless of corpus scale). The semantic scorer is
    an explicit integer dot/norm expression over the 64 array slots —
    exact int64 arithmetic until the final divide, so both engines rank
    identically.
    """
    from pyspark.sql import Window

    docs = table(spark, sf, "documents")

    # lexical candidates: BM25 top-N (rounded score, doc_id tiebreak)
    lex = text.bm25_topk(docs, terms=_BM25_TERMS, k=_RRF_N).select(
        "doc_id", "score"
    )
    lex_r = lex.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.desc("score"), F.asc("doc_id")))
        .cast("long")
        .alias("lex_rank"),
    )

    # semantic candidates: cosine against the query's hashed embedding.
    # The query vector comes from the SAME operator (one-row job at
    # build time — the single-source-of-truth for the hash recipe).
    qrow = spark.createDataFrame(
        [(0, " ".join(_BM25_TERMS))], "doc_id long, text string"
    )
    qvec = [int(x) for x in text.hashed_embedding(qrow).collect()[0]["embedding"]]
    n2q = sum(x * x for x in qvec)

    emb = text.hashed_embedding(docs)
    e = lambda i: F.try_element_at(F.col("embedding"), F.lit(i + 1))  # noqa: E731
    dot = None
    for i, qx in enumerate(qvec):
        if qx == 0:
            continue  # zero terms can't change the exact integer sum
        t = e(i) * F.lit(qx)
        dot = t if dot is None else dot + t
    n2d = None
    for i in range(_HE_DIM):
        t = e(i) * e(i)
        n2d = t if n2d is None else n2d + t
    scored = emb.select(
        "doc_id",
        (dot if dot is not None else F.lit(0)).cast("long").alias("_dot"),
        n2d.cast("long").alias("_n2d"),
    )
    cos = F.col("_dot").cast("double") / (
        F.sqrt(F.col("_n2d").cast("double")) * F.sqrt(F.lit(float(n2q)))
    )
    sem_top = (
        scored.filter((F.col("_n2d") > 0) & (F.col("_dot") != 0))
        .select("doc_id", cos.alias("cos"))
        .orderBy(F.desc("cos"), F.asc("doc_id"))
        .limit(_RRF_N)
    )
    sem_r = sem_top.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.desc("cos"), F.asc("doc_id")))
        .cast("long")
        .alias("sem_rank"),
    )

    fused = lex_r.join(sem_r, "doc_id", "full")
    rrf = F.round(
        F.coalesce(F.lit(1.0) / (F.lit(_RRF_K0) + F.col("lex_rank")), F.lit(0.0))
        + F.coalesce(F.lit(1.0) / (F.lit(_RRF_K0) + F.col("sem_rank")), F.lit(0.0)),
        6,
    )
    return (
        fused.select(
            "doc_id", rrf.alias("rrf_score"), "lex_rank", "sem_rank"
        )
        .orderBy(F.desc("rrf_score"), F.asc("doc_id"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Token-budgeted selection + contrastive negative pairs (round 4)
# ---------------------------------------------------------------------------

_BUDGET_TOKENS = 1500


@register(
    "corpus_token_budget",
    oracle=rf"""
    WITH q AS ({_QUALITY_RAW_SQL}),
    scored AS (
      SELECT doc_id, source, n_tokens,
             {_QUALITY_SCORE_EXPR} AS quality_score
      FROM q),
    sel AS (
      SELECT source, doc_id, quality_score, n_tokens,
             CAST(SUM(n_tokens) OVER (
               PARTITION BY source
               ORDER BY quality_score DESC, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum_tokens
      FROM scored)
    SELECT source, doc_id, quality_score, n_tokens, cum_tokens
    FROM sel WHERE cum_tokens <= {_BUDGET_TOKENS}
    """,
)
def corpus_token_budget(spark: SparkSession, sf: str) -> DataFrame:
    """Best-first per-source selection under a fixed token budget — the
    mixture-filling step between quality scoring and shard writing: one
    per-source cumulative-sum window (unique order key, reproducible
    cut), one filter, no joins."""
    docs = table(spark, sf, "documents")
    return corpus.token_budget_select(docs, budget_tokens=_BUDGET_TOKENS)


_NEG_K = 4


@register(
    "corpus_negative_pairs",
    oracle=rf"""
    WITH rk AS (
      SELECT doc_id,
             CAST(ROW_NUMBER() OVER (ORDER BY doc_id) AS BIGINT) AS _rk
      FROM documents),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
    probes AS (
      SELECT r.doc_id, r._rk, t.j, n.n,
             (CAST('0x' || substr(md5(CAST(t.j AS VARCHAR) || ':'
                    || CAST(r.doc_id AS VARCHAR)), 1, 12) AS BIGINT)
              % n.n) + 1 AS p0
      FROM rk r, n, range({_NEG_K}) t(j)),
    remap AS (
      SELECT doc_id, CAST(j AS INT) AS j,
             CASE WHEN p0 = _rk THEN (p0 % n) + 1 ELSE p0 END AS _prk
      FROM probes)
    SELECT m.doc_id, m.j, b.doc_id AS neg_id
    FROM remap m JOIN rk b ON b._rk = m._prk
    """,
)
def corpus_negative_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """k deterministic contrastive negatives per doc: ids densify with
    the parallel global_rank, partners are md5-derived ranks
    (self-collisions remap), materialized by one equi-join on the
    partner rank — k rows per doc through the shuffle, never n^2."""
    docs = table(spark, sf, "documents")
    return corpus.negative_pairs(docs, k=_NEG_K)


# ---------------------------------------------------------------------------
# Boilerplate score: per-doc fraction of shingles shared with other docs
# ---------------------------------------------------------------------------
@register(
    "corpus_boilerplate",
    oracle=rf"""
    WITH {_SQL_SHINGLES},
    posting AS (SELECT doc_id, unnest(s) AS x FROM sh),
    dfreq AS (SELECT x, CAST(COUNT(*) AS BIGINT) AS df FROM posting GROUP BY x),
    per_doc AS (
      SELECT p.doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_shingles,
             CAST(SUM(CASE WHEN d.df > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_shared
      FROM posting p JOIN dfreq d ON d.x = p.x
      GROUP BY p.doc_id)
    SELECT doc_id, n_shingles, n_shared,
           ROUND(n_shared * 1.0 / n_shingles, 4) AS boilerplate_frac
    FROM per_doc
    """,
)
def corpus_boilerplate(spark: SparkSession, sf: str) -> DataFrame:
    """Boilerplate screen: fraction of each doc's distinct 3-grams that
    appear in ANY other document (operators/dedup.py boilerplate_scores
    — the ngram_jaccard posting-index shape with a document-frequency
    consumer)."""
    docs = table(spark, sf, "documents")
    return dedup.boilerplate_scores(docs)
