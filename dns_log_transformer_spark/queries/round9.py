"""Round-9 additions: the HLL sliding-distinct twin (the variant a
100 TB pipeline actually runs), a per-source embedding drift monitor
(the gate that catches an encoder change poisoning an ANN index), a
byte-level multimodal format census (magic-number sniff + header-
parsed dimensions — real in this sandbox, no image library), and a
per-source embedding coverage audit (the third leg of the
ANN-preflight triad).

Kept deliberately small (four registrations, within the <=5 budget
VERDICT r8 #4 set): the rotation ledger's capacity ceiling is
approached at +8/round, and the r9/r10 windows are mostly
re-attestation of the r5/r6 cohorts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dns_log_transformer_spark.queries.registry import register, table

# ---------------------------------------------------------------------------
# q_sliding_distinct_approx was consolidated into round8.py
# q_sliding_distinct (r10, VERDICT r9 #1): the merged window aggregate
# computes the sliding event count, the exact distinct, and the
# 5-sigma-attested HLL column out of ONE dedup-first shuffle.
# ---------------------------------------------------------------------------


# ---------------------------------------------------------------------------
# emb_source_drift — per-source mean-vector distance across two snapshots
# ---------------------------------------------------------------------------

#: planted drift: snapshot B shifts dimension 0 of even-id vectors by
#: +0.05 (50_000 micro-units) — the "encoder change poisoned one
#: source's embeddings" shape the monitor must surface.
_DRIFT_MICRO = 50_000


@register(
    "emb_source_drift",
    oracle=f"""
    WITH j AS (
      SELECT e.vec_id, d.source, e.embedding
      FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id),
    v AS (
      SELECT vec_id, source, i AS dim,
             CAST(ROUND(CAST(embedding[i+1] AS DOUBLE) * 1000000)
               AS BIGINT) AS micro
      FROM j, unnest(range(len(embedding))) AS t(i)),
    t AS (
      SELECT source, dim,
             SUM(CASE WHEN vec_id % 3 <> 0 THEN micro ELSE 0 END) AS s_a,
             SUM(CASE WHEN vec_id % 7 <> 0 THEN micro +
                   (CASE WHEN vec_id % 2 = 0 AND dim = 0
                         THEN {_DRIFT_MICRO} ELSE 0 END)
                 ELSE 0 END) AS s_b,
             SUM(CASE WHEN vec_id % 3 <> 0 THEN 1 ELSE 0 END) AS c_a,
             SUM(CASE WHEN vec_id % 7 <> 0 THEN 1 ELSE 0 END) AS c_b
      FROM v GROUP BY 1, 2),
    d2 AS (SELECT source, dim, c_a, c_b,
                  CAST(s_b * c_a - s_a * c_b AS HUGEINT) AS d
           FROM t),
    agg AS (
      SELECT source, MAX(c_a) AS n_a, MAX(c_b) AS n_b,
             SUM(d * d) AS ss, MAX(ABS(d)) AS mx
      FROM d2 GROUP BY 1
      HAVING MAX(c_a) > 0 AND MAX(c_b) > 0)
    SELECT a.source,
           CAST(a.n_a AS BIGINT) AS n_a,
           CAST(a.n_b AS BIGINT) AS n_b,
           ROUND(SQRT(CAST(a.ss AS DOUBLE))
                 / (a.n_a * a.n_b * 1000000.0), 4) AS l2_mean_dist,
           ROUND(CAST(a.mx AS DOUBLE)
                 / (a.n_a * a.n_b * 1000000.0), 4) AS max_dim_shift,
           CAST(MIN(CASE WHEN ABS(d2.d) = a.mx THEN d2.dim END) AS INT)
             AS top_dim
    FROM agg a JOIN d2 ON d2.source = a.source
    GROUP BY a.source, a.n_a, a.n_b, a.ss, a.mx
    ORDER BY a.source
    """,
)
def emb_source_drift(spark: SparkSession, sf: str) -> DataFrame:
    """Per-source embedding drift between two corpus snapshots —
    snapshot A (vec_id % 3 != 0) vs snapshot B (% 7 != 0, with a
    planted +0.05 shift on dimension 0 of even-id vectors): the
    monitoring gate that catches an encoder change or a broken
    normalization poisoning one source's vectors BEFORE an ANN index
    is rebuilt over them. Reports the L2 distance between the two
    per-source mean vectors, the largest single-dimension shift, and
    which dimension it is.

    Exact-arithmetic discipline (PLANS.md rule 5): values quantize to
    integer micro-units at the scan, per-(source, dim) snapshot sums
    are exact integer conditional aggregates out of ONE explode pass
    (no second read, no join between snapshots — the q_snapshot_drift
    shape), and the cross-snapshot difference is cleared of
    denominators (d = s_b*c_a - s_a*c_b) so squaring/summing stays in
    DECIMAL(38,0) (HUGEINT in the oracle) — order-independent,
    engine-exact; the single fp step is the final sqrt/divide,
    ROUND(_, 4).

    Scale shape: embeddings equi-join documents on id (source lookup),
    one posexplode into a map-side-combined (source, dim) aggregate —
    at most sources x dims rows survive the shuffle; everything after
    operates on that tiny frame (persisted: the argmax join-back reads
    it twice)."""
    from dns_log_transformer_spark.operators.caching import persist_tracked

    emb = table(spark, sf, "embeddings")
    docs = table(spark, sf, "documents").select(
        F.col("doc_id").alias("vec_id"), "source"
    )
    v = (
        emb.join(docs, "vec_id")
        .select("vec_id", "source", F.posexplode("embedding").alias("dim", "_e"))
        .select(
            "vec_id",
            "source",
            "dim",
            F.round(F.col("_e").cast("double") * 1_000_000, 0)
            .cast("bigint")
            .alias("micro"),
        )
    )
    in_a = F.col("vec_id") % 3 != 0
    in_b = F.col("vec_id") % 7 != 0
    micro_b = F.col("micro") + F.when(
        (F.col("vec_id") % 2 == 0) & (F.col("dim") == 0),
        F.lit(_DRIFT_MICRO),
    ).otherwise(F.lit(0))
    t = v.groupBy("source", "dim").agg(
        F.sum(F.when(in_a, F.col("micro")).otherwise(F.lit(0))).alias("s_a"),
        F.sum(F.when(in_b, micro_b).otherwise(F.lit(0))).alias("s_b"),
        F.sum(in_a.cast("long")).alias("c_a"),
        F.sum(in_b.cast("long")).alias("c_b"),
    )
    d2 = persist_tracked(
        t.select(
            "source",
            "dim",
            "c_a",
            "c_b",
            # all four operands enter DECIMAL(38,0) BEFORE the multiply:
            # s reaches n * 1e6 micro-units per (source, dim), so a LONG
            # s*c product overflows int64 around ~3M docs per source and
            # ANSI mode would kill the job (ADVICE r9). In decimal the
            # exact path holds to ~3e6 docs/source per snapshot (d^2
            # stays under 38 digits); past that, widen the micro-unit
            # quantum before raising precision.
            (
                F.col("s_b").cast("decimal(38,0)")
                * F.col("c_a").cast("decimal(38,0)")
                - F.col("s_a").cast("decimal(38,0)")
                * F.col("c_b").cast("decimal(38,0)")
            )
            .cast("decimal(38,0)")
            .alias("d"),
        )
    )
    agg = (
        d2.groupBy("source")
        .agg(
            F.max("c_a").cast("long").alias("n_a"),
            F.max("c_b").cast("long").alias("n_b"),
            F.sum(F.col("d") * F.col("d")).alias("ss"),
            F.max(F.abs("d")).alias("mx"),
        )
        # a source with an empty snapshot has no drift defined (and the
        # fixture's source = id % 20 assignment makes % 5 snapshots
        # empty for four sources — hence the coprime % 7 predicate);
        # the guard keeps the division total either way
        .filter((F.col("n_a") > 0) & (F.col("n_b") > 0))
    )
    denom = F.col("n_a") * F.col("n_b") * F.lit(1_000_000.0)
    return (
        agg.join(d2.select("source", "dim", "d"), "source")
        .groupBy("source", "n_a", "n_b", "ss", "mx")
        .agg(
            F.min(
                F.when(F.abs("d") == F.col("mx"), F.col("dim"))
            )
            .cast("int")
            .alias("top_dim")
        )
        .select(
            "source",
            "n_a",
            "n_b",
            F.round(F.sqrt(F.col("ss").cast("double")) / denom, 4).alias(
                "l2_mean_dist"
            ),
            F.round(F.col("mx").cast("double") / denom, 4).alias(
                "max_dim_shift"
            ),
            "top_dim",
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# mm_format_census — byte-level multimodal format census
# ---------------------------------------------------------------------------


@register(
    "mm_format_census",
    oracle="""
    WITH m AS (
      SELECT doc_id,
             CASE doc_id % 4 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
                  WHEN 2 THEN 'gif' ELSE 'bmp' END AS format,
             -- a jpeg whose deep preface (2 + id%16 segments before
             -- SOF) exceeds the 12-step walk parses NO dims: the walk
             -- covers marker indexes 0..11, so SOF index 2 + id%16
             -- is reachable iff id%16 <= 9 (multimodal.synth_image_blob)
             doc_id % 4 = 1 AND doc_id % 16 >= 10 AS unparsed,
             16 + doc_id % 240 AS w,
             16 + (doc_id // 4) % 224 AS h,
             CASE doc_id % 4
               WHEN 0 THEN 29
               WHEN 1 THEN 27 + (16 + doc_id % 8) + (4 + doc_id % 5)
                          + 4 * (doc_id % 16)
               WHEN 2 THEN 10
               ELSE 26 END + 10 + n_chars % 100 AS n_bytes
      FROM documents)
    SELECT format,
           CAST(COUNT(*) AS BIGINT) AS n_images,
           CAST(SUM(CASE WHEN unparsed THEN 1 ELSE 0 END) AS BIGINT)
             AS n_unparsed,
           CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
           CAST(MIN(CASE WHEN NOT unparsed THEN w END) AS INT) AS min_w,
           CAST(MAX(CASE WHEN NOT unparsed THEN w END) AS INT) AS max_w,
           CAST(MIN(CASE WHEN NOT unparsed THEN h END) AS INT) AS min_h,
           CAST(MAX(CASE WHEN NOT unparsed THEN h END) AS INT) AS max_h,
           CAST(SUM(CASE WHEN NOT unparsed THEN w * h END) AS BIGINT)
             AS total_pixels
    FROM m GROUP BY format ORDER BY format
    """,
)
def mm_format_census(spark: SparkSession, sf: str) -> DataFrame:
    """Multimodal ingest census from RAW BYTES: per image format, how
    many payloads, total bytes, dimension ranges, and total pixels —
    the first report over a crawled binary corpus, run before any
    decode budget is spent. The Spark side must actually PARSE the
    payloads (magic-number sniff; PNG IHDR / GIF logical-screen / BMP
    DIB fixed-offset dims; a real JPEG marker-segment walk to SOF —
    operators/multimodal.py sniff_image_meta, pure codegen byte
    arithmetic, no image library and no UDF); the fixture payloads are
    synthesized spec-true from (doc_id, n_chars) so the DuckDB oracle
    states every expected value arithmetically — a parse bug cannot
    cancel out, because the oracle never touches the bytes.

    Scale shape: synth + sniff are shuffle-free per-row projections
    riding the scan; the census is ONE map-side-combined aggregation
    on a tiny format key."""
    from dns_log_transformer_spark.operators import multimodal

    docs = table(spark, sf, "documents").select("doc_id", "n_chars")
    blobs = multimodal.synth_image_blob(docs)
    meta = multimodal.sniff_image_meta(blobs)
    # n_unparsed makes partial parses LOUD (ADVICE r9): the fixture
    # plants jpegs whose preface exceeds the SOF walk (id % 16 >= 10),
    # and the dimension stats aggregate PARSED rows only — min/max/sum
    # ignore the null dims on both engines, and the census reports how
    # many payloads were excluded instead of silently shrinking.
    return (
        meta.groupBy("format")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_images"),
            F.sum((~F.col("dims_parsed")).cast("long"))
            .cast("long")
            .alias("n_unparsed"),
            F.sum("n_bytes").cast("long").alias("total_bytes"),
            F.min("width").cast("int").alias("min_w"),
            F.max("width").cast("int").alias("max_w"),
            F.min("height").cast("int").alias("min_h"),
            F.max("height").cast("int").alias("max_h"),
            F.sum(F.col("width").cast("long") * F.col("height"))
            .cast("long")
            .alias("total_pixels"),
        )
        .orderBy("format")
    )


# ---------------------------------------------------------------------------
# emb_coverage_audit — per-source embedding coverage before an index build
# ---------------------------------------------------------------------------


@register(
    "emb_coverage_audit",
    oracle="""
    WITH v AS (
      SELECT DISTINCT vec_id FROM embeddings WHERE vec_id % 3 <> 0)
    SELECT d.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN v.vec_id IS NOT NULL THEN 1 ELSE 0 END)
             AS BIGINT) AS n_covered,
           ROUND(SUM(CASE WHEN v.vec_id IS NOT NULL THEN 1 ELSE 0 END)
                 * 100.0 / COUNT(*), 4) AS coverage_pct
    FROM documents d LEFT JOIN v ON v.vec_id = d.doc_id
    GROUP BY 1 ORDER BY 1
    """,
)
def emb_coverage_audit(spark: SparkSession, sf: str) -> DataFrame:
    """Per-source embedding coverage of the CURRENT snapshot (vec_id %
    3 != 0, the A-snapshot convention shared with emb_source_drift) —
    the third leg of the ANN-preflight triad: dimensions healthy
    (emb_dim_stats), no encoder drift (emb_source_drift), and COVERAGE
    complete (this query): a source whose docs silently lack vectors
    is invisible to every downstream similarity/dedup/retrieval path,
    which is a data-loss bug no index metric will ever surface.

    Scale shape: one distinct projection of the vector ids, one
    id-keyed left equi-join (both sides shuffle on the uniform id key
    — no skew by construction), one map-side-combined conditional agg
    on the source key."""
    docs = table(spark, sf, "documents").select("doc_id", "source")
    v = (
        table(spark, sf, "embeddings")
        .filter(F.col("vec_id") % 3 != 0)
        .select(F.col("vec_id").alias("doc_id"))
        .distinct()
        .withColumn("_has", F.lit(True))
    )
    return (
        docs.join(v, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.coalesce("_has", F.lit(False)).cast("long"))
            .cast("long")
            .alias("n_covered"),
            F.round(
                F.sum(F.coalesce("_has", F.lit(False)).cast("long"))
                * 100.0
                / F.count(F.lit(1)),
                4,
            ).alias("coverage_pct"),
        )
        .orderBy("source")
    )
