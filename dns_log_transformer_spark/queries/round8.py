"""Round-8 additions: incremental-crawl delta triage, first-occurrence
novelty, the quality prune-retention curve, a z-order data-layout
diagnostic, a distributed interval sweep, exact sliding-window distinct
counts, a bounded-domain skyline, and an embedding-health audit.

Each query is the Spark-first expression of an operation a 100 TB
training-data pipeline runs routinely; every oracle computes the SAME
deterministic algorithm in DuckDB (PLANS.md discipline: identical
aliases, explicit floors, ROUND(_, 4) on the one fp step).
"""

from __future__ import annotations

import datetime as _dt
import functools
import operator

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dns_log_transformer_spark.queries.registry import register, table

# ---------------------------------------------------------------------------
# dedup_incremental_delta — new-crawl-batch triage against the corpus
# ---------------------------------------------------------------------------

#: synthetic id offset for the "re-crawled URL, new id, same bytes" rows.
#: Fixture invariant (ADVICE r8): every real doc_id must stay BELOW this
#: offset or the is_new predicate silently reclassifies it — max doc_id
#: is 4,999 at sf0.1 / ~50k at sf1 (TESTDATA.md scaling), and the
#: scratch/x10 replica set offsets ids by 1e7 per replica (max ~9e7,
#: which overflowed the original 1e6 offset — hence 1e12, far above any
#: scale-up this repo runs while well inside int64).
#: tests/test_round8.py::test_recrawl_offset_clears_fixture_ids pins the
#: invariant against every shipped sf directory.
_RECRAWL_OFFSET = 10**12


def _delta_oracle() -> str:
    from dns_log_transformer_spark.queries.llm_ops import (
        _MH_PAIRS_CTES,
        _SQL_NORM,
    )

    # the shared MinHash recipe verbatim, retargeted at the delta
    # union (old corpus + new batch incl. re-crawled copies) — ONE
    # definition of the pipeline, so a recipe tweak cannot drift this
    # oracle from the dedup_* family. The retarget must hit EXACTLY the
    # shingle CTE's one source mention; a recipe edit that adds another
    # 'FROM documents' would be rewritten silently (ADVICE r8), so fail
    # loudly here instead.
    n_mentions = _MH_PAIRS_CTES.count("FROM documents")
    if n_mentions != 1:
        raise AssertionError(
            "dedup_incremental_delta oracle retarget expects exactly one "
            f"'FROM documents' in _MH_PAIRS_CTES, found {n_mentions} — "
            "parameterize the new mention instead of relying on replace()"
        )
    mh = _MH_PAIRS_CTES.replace("FROM documents", "FROM alldocs")
    norm = _SQL_NORM
    return rf"""
    WITH alldocs AS (
      SELECT doc_id, text FROM documents WHERE doc_id % 5 <> 0
      UNION ALL
      SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0
      UNION ALL
      SELECT doc_id + {_RECRAWL_OFFSET} AS doc_id, text
      FROM documents WHERE doc_id % 50 = 1),
    {mh},
    fp AS (SELECT doc_id, COALESCE(md5({norm}), '') AS f FROM alldocs),
    oldfp AS (SELECT DISTINCT f FROM fp
              WHERE doc_id < {_RECRAWL_OFFSET} AND doc_id % 5 <> 0),
    exact AS (SELECT fp.doc_id FROM fp JOIN oldfp USING (f)
              WHERE doc_id >= {_RECRAWL_OFFSET} OR doc_id % 5 = 0),
    nearp AS (
      SELECT doc_a AS nid FROM dup_pairs
      WHERE (doc_a >= {_RECRAWL_OFFSET} OR doc_a % 5 = 0)
        AND doc_b < {_RECRAWL_OFFSET} AND doc_b % 5 <> 0
      UNION
      SELECT doc_b FROM dup_pairs
      WHERE (doc_b >= {_RECRAWL_OFFSET} OR doc_b % 5 = 0)
        AND doc_a < {_RECRAWL_OFFSET} AND doc_a % 5 <> 0)
    SELECT n.doc_id,
           CASE WHEN e.doc_id IS NOT NULL THEN 'exact_dup'
                WHEN p.nid IS NOT NULL THEN 'near_dup'
                ELSE 'novel' END AS status
    FROM (SELECT doc_id FROM alldocs
          WHERE doc_id >= {_RECRAWL_OFFSET} OR doc_id % 5 = 0) n
    LEFT JOIN exact e ON e.doc_id = n.doc_id
    LEFT JOIN (SELECT DISTINCT nid FROM nearp) p ON p.nid = n.doc_id
    ORDER BY n.doc_id
    """


@register("dedup_incremental_delta", oracle=_delta_oracle())
def dedup_incremental_delta(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental crawl-batch dedup triage — the BATCH twin of the
    streaming near-dup index (streaming/neardup_index.py): a new batch
    of documents (modelled as the doc_id % 5 == 0 docs plus re-crawled
    copies of the % 50 == 1 docs under fresh synthetic ids — the
    "same URL fetched again" shape) is classified against the existing
    corpus as exact_dup (normalized-md5 fingerprint already held by an
    existing doc), near_dup (capped MinHash-LSH pair with an existing
    doc at jaccard >= 0.5), or novel.

    Scale shape — the candidate join is NEW x OLD only: band rows are
    built over the union (so hot-bucket occupancy is counted exactly
    as the one-shot does), then split by side BEFORE the join — the
    old x old fan-out, the overwhelming bulk at 100 TB where the batch
    is a sliver of the corpus, is never generated. Exact dups are a
    fingerprint semi-join; both stages reuse the attested machinery
    (text.with_fingerprint, dedup.lsh_band_rows + the shared occupancy
    cap)."""
    from dns_log_transformer_spark.operators import dedup, text
    from dns_log_transformer_spark.operators.caching import persist_tracked

    docs = table(spark, sf, "documents").select("doc_id", "text")
    old = docs.filter(F.col("doc_id") % 5 != 0)
    recrawl = docs.filter(F.col("doc_id") % 50 == 1).select(
        (F.col("doc_id") + _RECRAWL_OFFSET).alias("doc_id"), "text"
    )
    new_b = docs.filter(F.col("doc_id") % 5 == 0).unionByName(recrawl)
    alldocs = old.unionByName(new_b)
    is_new = (F.col("doc_id") >= _RECRAWL_OFFSET) | (F.col("doc_id") % 5 == 0)

    # near-dup: band over the UNION (occupancy = one-shot semantics),
    # then candidates strictly new-side x old-side
    sh = persist_tracked(
        dedup.with_shingles(alldocs).filter(F.col("n_shingles") > 0)
    )
    kept = dedup.drop_heavy_buckets(
        persist_tracked(dedup.lsh_band_rows(sh)), dedup.LSH_BUCKET_CAP
    )
    cand = (
        kept.filter(is_new)
        .select("band", "key", F.col("doc_id").alias("_n"))
        .join(
            kept.filter(~is_new).select(
                "band", "key", F.col("doc_id").alias("_o")
            ),
            ["band", "key"],
        )
        .select("_n", "_o")
        .dropDuplicates()
    )
    inter = F.size(F.array_intersect("sh_n", "sh_o"))
    union = F.size("sh_n") + F.size("sh_o") - inter
    near = (
        cand.join(
            sh.select(F.col("doc_id").alias("_n"), F.col("shingles").alias("sh_n")),
            "_n",
        )
        .join(
            sh.select(F.col("doc_id").alias("_o"), F.col("shingles").alias("sh_o")),
            "_o",
        )
        .filter(inter.cast("double") / union.cast("double") >= 0.5)
        .select(F.col("_n").alias("doc_id"))
        .distinct()
        .withColumn("_near", F.lit(True))
    )

    # exact: fingerprint semi-join against the existing corpus
    fp = text.with_fingerprint(alldocs, text_col="text").select(
        "doc_id", F.coalesce("fingerprint", F.lit("")).alias("_f")
    )
    exact = (
        fp.filter(is_new)
        .join(fp.filter(~is_new).select("_f").distinct(), "_f", "left_semi")
        .select("doc_id")
        .withColumn("_exact", F.lit(True))
    )

    return (
        new_b.select("doc_id")
        .join(exact, "doc_id", "left")
        .join(near, "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.col("_exact"), F.lit("exact_dup"))
            .when(F.col("_near"), F.lit("near_dup"))
            .otherwise(F.lit("novel"))
            .alias("status"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# text_ngram_novelty — first-occurrence novelty per document
# ---------------------------------------------------------------------------


def _novelty_oracle() -> str:
    from dns_log_transformer_spark.queries.llm_ops import _SQL_SHINGLES

    return rf"""
    WITH {_SQL_SHINGLES},
    post AS (SELECT doc_id, unnest(s) AS g FROM sh),
    firsts AS (SELECT g, MIN(doc_id) AS first_doc FROM post GROUP BY g),
    per AS (
      SELECT p.doc_id, COUNT(*) AS n_grams,
             SUM(CASE WHEN f.first_doc = p.doc_id THEN 1 ELSE 0 END) AS n_novel
      FROM post p JOIN firsts f USING (g) GROUP BY p.doc_id)
    SELECT d.doc_id,
           CAST(COALESCE(per.n_grams, 0) AS BIGINT) AS n_grams,
           CAST(COALESCE(per.n_novel, 0) AS BIGINT) AS n_novel,
           CASE WHEN COALESCE(per.n_grams, 0) > 0
                THEN ROUND(per.n_novel / per.n_grams, 4) ELSE 0.0 END AS novelty
    FROM documents d LEFT JOIN per USING (doc_id)
    ORDER BY d.doc_id
    """


@register("text_ngram_novelty", oracle=_novelty_oracle())
def text_ngram_novelty(spark: SparkSession, sf: str) -> DataFrame:
    """Per-document novelty: the fraction of a doc's distinct word
    trigrams whose FIRST corpus occurrence (minimum doc_id) is the doc
    itself — the memorization/freshness signal curation uses to order
    or down-weight late exact-ish content that near-dup thresholds
    miss.

    Scale shape: one shingle explode, a map-side-combined MIN per gram
    (one row per gram survives the shuffle), and a gram-keyed join
    back whose build side is that one-row-per-gram frame — hot grams
    skew only the probe side, which AQE splits. No windows, no
    self-join."""
    from dns_log_transformer_spark.operators import dedup
    from dns_log_transformer_spark.operators.caching import persist_tracked

    docs = table(spark, sf, "documents")
    post = persist_tracked(
        dedup.with_shingles(docs)
        .select("doc_id", F.explode("shingles").alias("g"))
    )
    firsts = post.groupBy("g").agg(F.min("doc_id").alias("first_doc"))
    per = (
        post.join(firsts, "g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum((F.col("first_doc") == F.col("doc_id")).cast("long")).alias(
                "n_novel"
            ),
        )
    )
    return (
        docs.select("doc_id")
        .join(per, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce("n_novel", F.lit(0)).cast("long").alias("n_novel"),
            F.when(
                F.coalesce("n_grams", F.lit(0)) > 0,
                F.round(F.col("n_novel") / F.col("n_grams"), 4),
            )
            .otherwise(F.lit(0.0))
            .alias("novelty"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# corpus_prune_curve — tokens retained per quality threshold
# ---------------------------------------------------------------------------

_PRUNE_THRESHOLDS = [0.0, 0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]


def _prune_curve_oracle() -> str:
    from dns_log_transformer_spark.queries.llm_ops import (
        _QUALITY_RAW_SQL,
        _QUALITY_SCORE_EXPR,
    )

    ths = ", ".join(str(t) for t in _PRUNE_THRESHOLDS)
    return rf"""
    WITH q AS ({_QUALITY_RAW_SQL}),
    scored AS (SELECT doc_id, n_tokens, {_QUALITY_SCORE_EXPR} AS score FROM q),
    th AS (SELECT unnest([{ths}]) AS threshold),
    kept AS (
      SELECT th.threshold,
             CAST(SUM(CASE WHEN s.score >= th.threshold THEN 1 ELSE 0 END)
               AS BIGINT) AS n_docs_kept,
             CAST(SUM(CASE WHEN s.score >= th.threshold THEN s.n_tokens
                      ELSE 0 END) AS BIGINT) AS n_tokens_kept
      FROM scored s, th GROUP BY 1),
    tot AS (SELECT COUNT(*) AS td, SUM(n_tokens) AS tt FROM scored)
    SELECT threshold, n_docs_kept, n_tokens_kept,
           ROUND(n_docs_kept * 100.0 / tot.td, 4) AS pct_docs,
           ROUND(n_tokens_kept * 100.0 / tot.tt, 4) AS pct_tokens
    FROM kept, tot ORDER BY threshold
    """


@register("corpus_prune_curve", oracle=_prune_curve_oracle())
def corpus_prune_curve(spark: SparkSession, sf: str) -> DataFrame:
    """Quality prune-retention curve: for each score threshold on a
    fixed grid, how many documents and tokens survive `score >= t` —
    the "what does pruning at X actually cost me" table read before
    committing a corpus filter, over the SHARED quality recipe
    (text.with_quality_score, the text_quality family's one
    definition).

    Scale shape: score once per doc, fan each doc out to the 10-row
    broadcast threshold dimension (a 10x 1:1 generate, no shuffle),
    ONE conditional aggregation, then a 1-row totals broadcast for the
    percentages (the q_snapshot_drift scalar pattern; BNLJ documented
    scale-bounded)."""
    from dns_log_transformer_spark.operators import text

    docs = table(spark, sf, "documents")
    scored = text.with_quality_score(docs).select(
        "doc_id", "n_tokens", F.col("quality_score").alias("score")
    )
    th = spark.range(1).select(
        F.explode(
            F.array(*[F.lit(t) for t in _PRUNE_THRESHOLDS])
        ).alias("threshold")
    )
    kept = (
        scored.crossJoin(F.broadcast(th))
        .groupBy("threshold")
        .agg(
            F.sum((F.col("score") >= F.col("threshold")).cast("long"))
            .cast("long")
            .alias("n_docs_kept"),
            F.sum(
                F.when(
                    F.col("score") >= F.col("threshold"), F.col("n_tokens")
                ).otherwise(F.lit(0))
            )
            .cast("long")
            .alias("n_tokens_kept"),
        )
    )
    tot = scored.agg(
        F.count(F.lit(1)).alias("td"), F.sum("n_tokens").alias("tt")
    )
    return (
        kept.crossJoin(F.broadcast(tot))
        .select(
            "threshold",
            "n_docs_kept",
            "n_tokens_kept",
            F.round(F.col("n_docs_kept") * 100.0 / F.col("td"), 4).alias(
                "pct_docs"
            ),
            F.round(F.col("n_tokens_kept") * 100.0 / F.col("tt"), 4).alias(
                "pct_tokens"
            ),
        )
        .orderBy("threshold")
    )


# ---------------------------------------------------------------------------
# q_zorder_layout — Morton-key clustering vs 1D sort vs hash layout
# ---------------------------------------------------------------------------

_Z_EPOCH = _dt.date(1995, 1, 1)
_Z_DAY_DIV = 10  # 8-bit date bucket: days since epoch / 10
_Z_PRED_D_LO = (_dt.date(1996, 1, 1) - _Z_EPOCH).days // _Z_DAY_DIV
_Z_PRED_D_HI = (_dt.date(1996, 12, 31) - _Z_EPOCH).days // _Z_DAY_DIV
_Z_PRED_Q_LO = (5 - 1) * 5
_Z_PRED_Q_HI = (15 - 1) * 5


def _z_interleave_sql(x: str, y: str) -> str:
    """16-bit Morton interleave of two 8-bit values, as portable
    shift/mask arithmetic (identical text runs on DuckDB; the Spark
    side composes the same terms with F.shiftleft/bitwiseAND)."""
    return " + ".join(
        f"((({x} >> {i}) & 1) << {2 * i}) + ((({y} >> {i}) & 1) << {2 * i + 1})"
        for i in range(8)
    )


@register(
    "q_zorder_layout",
    oracle=rf"""
    WITH base AS (
      SELECT l_orderkey,
             LEAST(255, GREATEST(0, CAST(datediff('day', DATE '1995-01-01',
               l_shipdate) // {_Z_DAY_DIV} AS BIGINT))) AS x,
             LEAST(255, CAST((l_quantity - 1) * 5 AS BIGINT)) AS y,
             (l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
              AND l_quantity BETWEEN 5 AND 15) AS m
      FROM lineitem),
    assigned AS (
      SELECT x, y, m,
             ({_z_interleave_sql("x", "y")}) >> 8 AS f_z,
             x AS f_lin,
             l_orderkey % 256 AS f_hash
      FROM base),
    u AS (
      SELECT 'zorder' AS layout, f_z AS f, x, y, m FROM assigned
      UNION ALL SELECT 'linear_date', f_lin, x, y, m FROM assigned
      UNION ALL SELECT 'hash', f_hash, x, y, m FROM assigned),
    files AS (
      SELECT layout, f, COUNT(*) AS n_rows,
             MIN(x) AS min_x, MAX(x) AS max_x,
             MIN(y) AS min_y, MAX(y) AS max_y,
             SUM(CASE WHEN m THEN 1 ELSE 0 END) AS n_match
      FROM u GROUP BY 1, 2)
    SELECT layout,
           CAST(COUNT(*) AS BIGINT) AS n_files,
           CAST(SUM(CASE WHEN max_x >= {_Z_PRED_D_LO} AND min_x <= {_Z_PRED_D_HI}
                    AND max_y >= {_Z_PRED_Q_LO} AND min_y <= {_Z_PRED_Q_HI}
                    THEN 1 ELSE 0 END) AS BIGINT) AS files_scanned,
           CAST(SUM(CASE WHEN max_x >= {_Z_PRED_D_LO} AND min_x <= {_Z_PRED_D_HI}
                    AND max_y >= {_Z_PRED_Q_LO} AND min_y <= {_Z_PRED_Q_HI}
                    THEN n_rows ELSE 0 END) AS BIGINT) AS rows_scanned,
           CAST(SUM(n_match) AS BIGINT) AS n_matching
    FROM files GROUP BY layout ORDER BY layout
    """,
)
def q_zorder_layout(spark: SparkSession, sf: str) -> DataFrame:
    """Data-layout diagnostic: assign every lineitem row to a file
    under three clustering policies — 16-bit Morton (z-order) key over
    (shipdate bucket, quantity bucket), a 1D shipdate sort, and a hash
    layout — then measure, from per-file min/max zone maps, how many
    files and rows a fixed 2D predicate (a TPC-H q6-style
    date-range + quantity-band) would scan under each. The query that
    answers "is re-clustering this table worth it" BEFORE paying the
    rewrite; on the fixture z-order scans ~12 of 256 files vs 38
    (date-sorted) and 256 (hash) for identical results.

    Scale shape: pure per-row bit arithmetic (whole-stage codegen), a
    1:3 layout explode, and two hash aggregations — no joins, no
    windows, no data-dependent scalars (the quantization domains are
    fixed constants)."""
    li = table(spark, sf, "lineitem")
    x = F.least(
        F.lit(255),
        F.greatest(
            F.lit(0),
            F.floor(
                F.datediff(F.col("l_shipdate"), F.lit("1995-01-01"))
                / _Z_DAY_DIV
            ),
        ),
    ).cast("long")
    y = F.least(
        F.lit(255), ((F.col("l_quantity") - 1) * 5).cast("long")
    ).cast("long")
    m = (
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
        & F.col("l_quantity").between(5, 15)
    )
    base = li.select(
        F.col("l_orderkey"), x.alias("x"), y.alias("y"), m.alias("m")
    )
    z = functools.reduce(
        operator.add,
        [
            F.shiftleft(F.shiftright(F.col("x"), i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(
                F.shiftright(F.col("y"), i).bitwiseAND(F.lit(1)), 2 * i + 1
            )
            for i in range(8)
        ],
    )
    layouts = F.explode(
        F.array(
            F.struct(
                F.lit("zorder").alias("layout"),
                F.shiftright(z, 8).alias("f"),
            ),
            F.struct(
                F.lit("linear_date").alias("layout"), F.col("x").alias("f")
            ),
            F.struct(
                F.lit("hash").alias("layout"),
                (F.col("l_orderkey") % 256).alias("f"),
            ),
        )
    )
    u = base.select("x", "y", "m", layouts.alias("lf")).select(
        F.col("lf.layout").alias("layout"), F.col("lf.f").alias("f"),
        "x", "y", "m",
    )
    files = u.groupBy("layout", "f").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("x").alias("min_x"),
        F.max("x").alias("max_x"),
        F.min("y").alias("min_y"),
        F.max("y").alias("max_y"),
        F.sum(F.col("m").cast("long")).alias("n_match"),
    )
    hit = (
        (F.col("max_x") >= _Z_PRED_D_LO)
        & (F.col("min_x") <= _Z_PRED_D_HI)
        & (F.col("max_y") >= _Z_PRED_Q_LO)
        & (F.col("min_y") <= _Z_PRED_Q_HI)
    )
    return (
        files.groupBy("layout")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_files"),
            F.sum(hit.cast("long")).cast("long").alias("files_scanned"),
            F.sum(F.when(hit, F.col("n_rows")).otherwise(F.lit(0)))
            .cast("long")
            .alias("rows_scanned"),
            F.sum("n_match").cast("long").alias("n_matching"),
        )
        .orderBy("layout")
    )


# ---------------------------------------------------------------------------
# q_concurrent_intervals — peak concurrently-open orders per year
# ---------------------------------------------------------------------------


@register(
    "q_concurrent_intervals",
    oracle="""
    WITH iv AS (
      SELECT o.o_orderkey, CAST(o.o_orderdate AS DATE) AS s,
             CAST(MAX(l.l_shipdate) AS DATE) + 1 AS e
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      GROUP BY 1, 2),
    deltas AS (
      SELECT s AS d, COUNT(*)::BIGINT AS delta FROM iv GROUP BY 1
      UNION ALL
      SELECT e, -COUNT(*)::BIGINT FROM iv GROUP BY 1),
    byd AS (SELECT d, SUM(delta) AS delta FROM deltas GROUP BY 1),
    run AS (SELECT d, SUM(delta) OVER (ORDER BY d) AS conc FROM byd),
    run2 AS (SELECT d, conc,
                    MAX(conc) OVER (PARTITION BY year(d)) AS ymax FROM run)
    SELECT CAST(year(d) AS INT) AS yr,
           CAST(MAX(conc) AS BIGINT) AS peak_open,
           MIN(CASE WHEN conc = ymax THEN d END) AS peak_date
    FROM run2 GROUP BY 1 ORDER BY 1
    """,
)
def q_concurrent_intervals(spark: SparkSession, sf: str) -> DataFrame:
    """Peak concurrently-open orders per year (an order is open from
    its order date until the day after its last lineitem ships) — the
    classic interval sweep: +1/-1 boundary events, prefix-summed over
    time.

    Scale shape — a GLOBAL running sum with NO single-partition
    window: boundary deltas collapse to one row per date (bounded
    domain), per-year carry-in offsets come from a triangular join
    over the tiny year dimension (tens of rows, broadcast; BNLJ
    documented scale-bounded), and the running sum itself partitions
    by year — the textbook two-level scan (block-local prefix +
    block offsets) expressed in DataFrame ops."""
    orders = table(spark, sf, "orders")
    li = table(spark, sf, "lineitem")
    iv = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", F.col("o_orderdate").cast("date").alias("s"))
        .agg(F.date_add(F.max("l_shipdate").cast("date"), 1).alias("e"))
    )
    deltas = iv.groupBy(F.col("s").alias("d")).agg(
        F.count(F.lit(1)).cast("long").alias("delta")
    ).unionByName(
        iv.groupBy(F.col("e").alias("d")).agg(
            (-F.count(F.lit(1))).cast("long").alias("delta")
        )
    )
    byd = (
        deltas.groupBy("d")
        .agg(F.sum("delta").alias("delta"))
        .withColumn("yr", F.year("d"))
    )
    ytot = byd.groupBy("yr").agg(F.sum("delta").alias("ydelta"))
    offs = (
        ytot.alias("a")
        .join(ytot.alias("b"), F.col("b.yr") < F.col("a.yr"), "left")
        .groupBy(F.col("a.yr").alias("yr"))
        .agg(F.coalesce(F.sum("b.ydelta"), F.lit(0)).alias("off"))
    )
    wrun = (
        Window.partitionBy("yr")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = byd.join(F.broadcast(offs), "yr").withColumn(
        "conc", F.sum("delta").over(wrun) + F.col("off")
    )
    run2 = run.withColumn(
        "ymax", F.max("conc").over(Window.partitionBy("yr"))
    )
    return (
        run2.groupBy(F.col("yr").cast("int").alias("yr"))
        .agg(
            F.max("conc").cast("long").alias("peak_open"),
            F.min(F.when(F.col("conc") == F.col("ymax"), F.col("d"))).alias(
                "peak_date"
            ),
        )
        .orderBy("yr")
    )


# ---------------------------------------------------------------------------
# q_sliding_distinct — exact distinct users per sliding hour
# ---------------------------------------------------------------------------


#: HLL relative standard deviation for the sketch column; the
#: attestation bound is 5x this plus a small-count floor — far outside
#: plausible sketch error (measured max rel err 5.0% at sf0.1; the
#: floor absorbs linear-counting variance on 2-28-user windows at
#: sf0.01, which reaches ~18%).
_SLIDING_HLL_RSD = 0.02


@register(
    "q_sliding_distinct",
    oracle="""
    WITH e AS (
      SELECT user_id,
             time_bucket(INTERVAL 15 MINUTE, ts) - k * INTERVAL 15 MINUTE AS ws
      FROM events, unnest([0, 1, 2, 3]) AS t(k))
    SELECT ws,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users_exact,
           TRUE AS hll_ok
    FROM e GROUP BY ws ORDER BY ws
    """,
)
def q_sliding_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """Sliding 1-hour window (15-minute slide) over events — r10
    consolidation of the q_sliding_native / q_sliding_distinct /
    q_sliding_distinct_approx shells (VERDICT r9 #1) into ONE window
    aggregate carrying all three signals per window: total events
    (the F.window sliding count), EXACT distinct users, and the HLL
    sketch attested against that exact count.

    Distinct-over-sliding-window is the aggregation window frames
    cannot express (no COUNT(DISTINCT) over a frame in any engine); the
    scalable answer is the window EXPLODE: each event lands in exactly
    len/slide = 4 windows via F.window, and distinct is a two-phase
    hash aggregation per window — never a sorted frame. The oracle
    replays the same epoch-aligned fan-out arithmetically.

    Plan shape (the r9 dedup-first rewrite, kept): (window, user)
    pairs dedupe FIRST in a map-side-combined hash aggregate that
    CARRIES per-pair event counts — the same shuffle the exact
    distinct pays anyway — then one row per pair feeds all three
    aggregates: n_events = sum of pair counts, n_users_exact = count
    of pairs, and the HLL partials hash one row per pair instead of
    every exploded event (measured 2.75 s -> 0.79 s at sf0.1 for the
    HLL half; the mixed distinct/non-distinct Expand disappears).
    HLL++ registers are fixed-size and MERGEABLE — per-window state is
    O(registers) regardless of cardinality — which is why the sketch
    column is the variant a 100 TB pipeline actually alerts on, with
    the exact count computed beside it in the same aggregation.
    Sketch internals differ by engine, so the oracle-comparable output
    is the exact count plus an in-bounds flag (the q_approx_percentiles
    pattern): |hll - exact| <= max(5 * rsd * exact, 5)."""
    ev = table(spark, sf, "events")
    deduped = ev.groupBy(
        F.window("ts", "1 hour", "15 minutes").alias("w"), "user_id"
    ).agg(F.count(F.lit(1)).alias("_n_pair"))
    # count(user_id), not count(1), for the distinct: a NULL user forms
    # its own dedup group but must not count — COUNT(DISTINCT) and the
    # HLL both ignore NULLs (latent on the shipped fixtures, which have
    # none; pinned by the oracle the moment nullable data appears).
    # n_events sums ALL pair counts including the NULL-user group,
    # matching the oracle's COUNT(*).
    agg = deduped.groupBy("w").agg(
        F.sum("_n_pair").cast("long").alias("n_events"),
        F.count("user_id").cast("long").alias("n_users_exact"),
        F.approx_count_distinct("user_id", _SLIDING_HLL_RSD).alias("_hll"),
    )
    bound = F.greatest(
        F.lit(5.0) * _SLIDING_HLL_RSD * F.col("n_users_exact"), F.lit(5.0)
    )
    return agg.select(
        F.col("w.start").alias("ws"),
        "n_events",
        "n_users_exact",
        (
            F.abs(F.col("_hll") - F.col("n_users_exact")).cast("double")
            <= bound
        ).alias("hll_ok"),
    ).orderBy("ws")


# ---------------------------------------------------------------------------
# q_skyline_pareto — pareto frontier via bounded-domain inversion
# ---------------------------------------------------------------------------


@register(
    "q_skyline_pareto",
    oracle="""
    SELECT p_partkey, p_retailprice, p_size
    FROM part a
    WHERE NOT EXISTS (
      SELECT 1 FROM part b
      WHERE b.p_retailprice <= a.p_retailprice AND b.p_size >= a.p_size
        AND (b.p_retailprice < a.p_retailprice OR b.p_size > a.p_size))
    ORDER BY p_retailprice, p_partkey
    """,
)
def q_skyline_pareto(spark: SparkSession, sf: str) -> DataFrame:
    """Skyline / pareto frontier of parts: minimize p_retailprice,
    maximize p_size — no other part is at-least-as-good on both axes
    and strictly better on one.

    Scale shape — bounded-domain inversion instead of the naive
    quadratic NOT EXISTS the oracle runs (fine at oracle scale,
    impossible at 100 TB) and instead of a global price-ordered RANGE
    window (a single-partition sort): p_size has a tiny domain
    (1..50), so ONE map-side-combined min-price-per-size aggregation
    collapses the table to <= 50 points, the frontier threshold
    fm(s) = min price among strictly larger sizes is a triangular
    join over those points (BNLJ documented scale-bounded), and
    membership is a broadcast join back: a part is on the skyline iff
    it HOLDS its size's min price and no larger size matches it.
    Equal (price, size) twins are both kept — neither strictly
    dominates."""
    part = table(spark, sf, "part")
    mp = part.groupBy("p_size").agg(F.min("p_retailprice").alias("m"))
    fm = (
        mp.alias("a")
        .join(mp.alias("b"), F.col("b.p_size") > F.col("a.p_size"), "left")
        .groupBy(F.col("a.p_size").alias("p_size"), F.col("a.m").alias("m"))
        .agg(F.min("b.m").alias("fm"))
    )
    return (
        part.join(F.broadcast(fm), "p_size")
        .filter(
            (F.col("p_retailprice") == F.col("m"))
            & (F.col("fm").isNull() | (F.col("fm") > F.col("p_retailprice")))
        )
        .select("p_partkey", "p_retailprice", "p_size")
        .orderBy("p_retailprice", "p_partkey")
    )


# ---------------------------------------------------------------------------
# emb_dim_stats — embedding-health audit per dimension
# ---------------------------------------------------------------------------


@register(
    "emb_dim_stats",
    oracle="""
    WITH v AS (
      -- dim count derives from the data (len(embedding)) exactly as the
      -- Spark side's posexplode does, so a fixture dimension change
      -- cannot diverge the two sides (ADVICE r8)
      SELECT i AS dim, CAST(embedding[i+1] AS DOUBLE) AS val
      FROM embeddings, unnest(range(len(embedding))) AS t(i))
    SELECT CAST(dim AS INT) AS dim,
           ROUND(AVG(val), 4) AS mean_val,
           ROUND(STDDEV_SAMP(val), 4) AS std_val,
           ROUND(MIN(val), 4) AS min_val,
           ROUND(MAX(val), 4) AS max_val,
           CAST(SUM(CASE WHEN ABS(val) < 0.001 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_near_zero
    FROM v GROUP BY dim ORDER BY dim
    """,
)
def emb_dim_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Embedding-health audit: per-dimension mean / std / min / max
    and a near-zero occupancy count — the table that catches dead
    dimensions, collapsed encoders, and un-normalized batches before
    an ANN index is built over them.

    Scale shape: one posexplode (1:64 generate riding the scan) into
    one map-side-combined aggregation on a 64-value key; every
    statistic is a streaming combiner, nothing is collected. The one
    fp caveat: mean/std fold order differs across engines, absorbed
    by ROUND(_, 4) on O(0.1) values (PLANS.md rule 5)."""
    emb = table(spark, sf, "embeddings")
    v = emb.select(F.posexplode("embedding").alias("dim", "v")).select(
        F.col("dim").cast("int").alias("dim"),
        F.col("v").cast("double").alias("val"),
    )
    return (
        v.groupBy("dim")
        .agg(
            F.round(F.avg("val"), 4).alias("mean_val"),
            F.round(F.stddev_samp("val"), 4).alias("std_val"),
            F.round(F.min("val"), 4).alias("min_val"),
            F.round(F.max("val"), 4).alias("max_val"),
            F.sum((F.abs("val") < 0.001).cast("long"))
            .cast("long")
            .alias("n_near_zero"),
        )
        .orderBy("dim")
    )
