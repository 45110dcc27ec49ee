"""Round-5 surface growth: CDC/SCD2 merge, CIDR enrichment, EWMA
anomaly detection, degree-oriented triangle counting, and int8 scalar
quantization — pipeline shapes a 100 TB corpus/analytics deployment
hits that the earlier modules did not yet cover.

Every query pairs a Spark plan with a DuckDB oracle computing the SAME
deterministic algorithm (integer-exact arithmetic wherever a float fold
could diverge), registered AFTER the round-5 driver window (these get
their first driver rows in round 6; test_oracle_parity attests them at
sf0.01 every session meanwhile).

No reference analog for any of these (the reference is a stateless
record-at-a-time log transformer, app/app.py); they extend the SURVEY
§2 L-rows (LLM-pipeline / large-scale analytics surface).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dns_log_transformer_spark.operators import cdc, graph, similarity
from dns_log_transformer_spark.operators.caching import persist_tracked
from dns_log_transformer_spark.queries.registry import register, table


# ---------------------------------------------------------------------------
# CDC latest-wins merge (Delta/Hudi MERGE INTO semantics, engine-neutral)
# ---------------------------------------------------------------------------
# Deterministic synthetic change feed derived from orders: the base
# snapshot is version 0; batch 1 re-prices every 3rd order (+5.00);
# batch 2 deletes every 11th order. Both sides derive the feed with the
# same arithmetic, so the merge itself is what the hash attests.
_CDC_FEED_SQL = """
  feed AS (
    SELECT o_orderkey, o_orderstatus,
           CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
           0 AS version, 'U' AS op
    FROM orders
    UNION ALL
    SELECT o_orderkey, o_orderstatus,
           CAST(ROUND(o_totalprice * 100) AS BIGINT) + 500 AS cents,
           1 AS version, 'U' AS op
    FROM orders WHERE o_orderkey % 3 = 0
    UNION ALL
    SELECT o_orderkey, o_orderstatus, CAST(0 AS BIGINT) AS cents,
           2 AS version, 'D' AS op
    FROM orders WHERE o_orderkey % 11 = 0)
"""


def _cdc_feed(o: DataFrame) -> DataFrame:
    """The deterministic synthetic change feed behind _CDC_FEED_SQL:
    base snapshot at version 0, every 3rd key repriced (+5.00) at
    version 1, every 11th key deleted at version 2. Shared by
    cdc_upsert_merge and cdc_time_travel (queries/round6.py)."""
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    base = o.select(
        "o_orderkey",
        "o_orderstatus",
        cents.alias("cents"),
        F.lit(0).alias("version"),
        F.lit("U").alias("op"),
    )
    reprice = o.filter(F.col("o_orderkey") % 3 == 0).select(
        "o_orderkey",
        "o_orderstatus",
        (cents + 500).alias("cents"),
        F.lit(1).alias("version"),
        F.lit("U").alias("op"),
    )
    deletes = o.filter(F.col("o_orderkey") % 11 == 0).select(
        "o_orderkey",
        "o_orderstatus",
        F.lit(0).cast("long").alias("cents"),
        F.lit(2).alias("version"),
        F.lit("D").alias("op"),
    )
    return base.unionAll(reprice).unionAll(deletes)


@register(
    "cdc_upsert_merge",
    oracle=f"""
    WITH {_CDC_FEED_SQL},
    merged AS (
      SELECT o_orderkey,
             arg_max(o_orderstatus, version) AS o_orderstatus,
             arg_max(cents, version) AS cents,
             arg_max(op, version) AS op,
             arg_max(version, version) AS version
      FROM feed GROUP BY o_orderkey)
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(cents) AS BIGINT) AS sum_cents,
           CAST(SUM(CASE WHEN version > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_from_delta
    FROM merged WHERE op <> 'D'
    GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def cdc_upsert_merge(spark: SparkSession, sf: str) -> DataFrame:
    """Latest-wins CDC merge (MERGE INTO semantics): base snapshot +
    reprice batch + delete batch -> one row per surviving key, then a
    compact per-status attestation (counts + exact cent sums + how many
    rows the delta won).

    Shape at scale: the feed union is scan-parallel; the merge is ONE
    hash shuffle with max_by partial aggregation (operators/cdc.py) —
    no window, no join, tombstones dropped post-argmax so a late delete
    beats an early upsert.
    """
    merged = cdc.upsert_latest(
        _cdc_feed(table(spark, sf, "orders")), ["o_orderkey"]
    )
    return (
        merged.groupBy("o_orderstatus")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.sum("cents").cast("long").alias("sum_cents"),
            F.sum((F.col("version") > 0).cast("long")).alias("n_from_delta"),
        )
        .orderBy("o_orderstatus")
    )


# ---------------------------------------------------------------------------
# SCD2 validity intervals from an observation stream
# ---------------------------------------------------------------------------
@register(
    "cdc_scd2_intervals",
    oracle="""
    WITH obs AS (
      SELECT user_id, event_type AS attr,
             CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec, event_id
      FROM events),
    runs AS (
      SELECT user_id, attr, ts_sec, event_id,
             LAG(attr) OVER w AS prev
      FROM obs WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec, event_id)),
    changes AS (
      SELECT user_id, attr, ts_sec, event_id FROM runs
      WHERE prev IS NULL OR prev <> attr)
    SELECT user_id, attr,
           ts_sec AS valid_from_sec,
           LEAD(ts_sec) OVER w2 AS valid_to_sec,
           (LEAD(ts_sec) OVER w2 IS NULL) AS is_current
    FROM changes
    WINDOW w2 AS (PARTITION BY user_id ORDER BY ts_sec, event_id)
    """,
)
def cdc_scd2_intervals(spark: SparkSession, sf: str) -> DataFrame:
    """Type-2 SCD history: each user's event_type observations collapse
    into validity intervals (consecutive repeats merge; a change closes
    the open interval — valid_to exclusive, null = current).

    Windows partition per user (cardinality scales with data; no
    low-cardinality sort). Timestamps as epoch seconds, event_id
    tie-break: integer-exact and totally ordered on both engines.
    """
    ev = table(spark, sf, "events").select(
        "user_id",
        F.col("event_type").alias("attr"),
        "ts",
        "event_id",
    )
    out = cdc.scd2_intervals(
        ev,
        key_col="user_id",
        attr_col="attr",
        ts_col=F.col("ts").cast("long"),
        tiebreak_col="event_id",
    )
    return out.select(
        "user_id",
        "attr",
        F.col("valid_from").alias("valid_from_sec"),
        F.col("valid_to").alias("valid_to_sec"),
        "is_current",
    )


# ---------------------------------------------------------------------------
# CIDR-block enrichment: range lookup as an aligned-prefix equi-join
# ---------------------------------------------------------------------------
# Synthetic IPv4 per event (deterministic hash spread over 10.0.0.0/8)
# and a nation-derived dim of /13-aligned blocks. Alignment is the
# scale trick: a range join against ALIGNED blocks is an equi-join on
# ip >> 19 — no binary search, no O(n x blocks) nested loop, and the
# dim broadcasts.
_IP_SQL = "CAST(167772160 + ((user_id * 2654435761) % 16777216) AS BIGINT)"


@register(
    "q_cidr_enrich",
    oracle=f"""
    WITH ev AS (
      SELECT event_id, user_id, {_IP_SQL} AS ip FROM events),
    blocks AS (
      SELECT n_name,
             CAST(167772160 + n_nationkey * 524288 AS BIGINT) AS ip_start,
             CAST(167772160 + (n_nationkey + 1) * 524288 - 1 AS BIGINT) AS ip_end
      FROM nation),
    tagged AS (
      SELECT ev.event_id, ev.user_id, ev.ip, b.n_name
      FROM ev LEFT JOIN blocks b
        ON ev.ip >= b.ip_start AND ev.ip <= b.ip_end)
    SELECT COALESCE(n_name, 'UNROUTED') AS block_name,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(MIN(ip) AS BIGINT) AS min_ip,
           CAST(MAX(ip) AS BIGINT) AS max_ip
    FROM tagged GROUP BY COALESCE(n_name, 'UNROUTED')
    """,
)
def q_cidr_enrich(spark: SparkSession, sf: str) -> DataFrame:
    """Route each event's (synthetic) client IP to its CIDR block — the
    DNS-domain enrichment join (resolver logs -> network owner).

    The oracle states it as the general range join (BETWEEN start/end);
    the Spark plan exploits /13 ALIGNMENT: both sides compute
    ``prefix = ip >> 19`` and the lookup becomes a broadcast EQUI-join —
    the plan a 100 TB log scan needs (pure hash probe riding the scan;
    a BETWEEN theta-join would be a broadcast nested loop over every
    row). Unmatched prefixes fall out of the left join as 'UNROUTED'.
    """
    ev = table(spark, sf, "events").select(
        "event_id",
        "user_id",
        (
            F.lit(167772160).cast("long")
            + (F.col("user_id") * F.lit(2654435761)) % F.lit(16777216)
        ).alias("ip"),
    )
    # /13 blocks (2^19 addresses) are aligned: prefix = ip_start >> 19
    # = 167772160/524288 + n_nationkey = 320 + n_nationkey (exact ints)
    blocks = table(spark, sf, "nation").select(
        "n_name",
        (F.lit(320) + F.col("n_nationkey")).cast("long").alias("prefix"),
    )
    tagged = ev.withColumn(
        "prefix", F.expr("CAST(ip div 524288 AS LONG)")
    ).join(F.broadcast(blocks), "prefix", "left")
    return (
        tagged.groupBy(
            F.coalesce("n_name", F.lit("UNROUTED")).alias("block_name")
        )
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
            F.min("ip").cast("long").alias("min_ip"),
            F.max("ip").cast("long").alias("max_ip"),
        )
    )


# ---------------------------------------------------------------------------
# EWMA anomaly screen: integer-exact trailing-weighted baseline
# ---------------------------------------------------------------------------
_EWMA_LAGS = 8  # weights 2^7 .. 2^0 over the previous 8 events


def _ewma_sql() -> str:
    terms = " + ".join(
        f"COALESCE(LAG(cents, {j}) OVER w * {1 << (_EWMA_LAGS - j)}, 0)"
        for j in range(1, _EWMA_LAGS + 1)
    )
    wsum = " + ".join(
        f"(CASE WHEN LAG(cents, {j}) OVER w IS NOT NULL"
        f" THEN {1 << (_EWMA_LAGS - j)} ELSE 0 END)"
        for j in range(1, _EWMA_LAGS + 1)
    )
    return f"""
    WITH ev AS (
      SELECT event_id, user_id,
             CAST(ROUND(value * 100) AS BIGINT) AS cents,
             CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec
      FROM events),
    scored AS (
      SELECT event_id, user_id, cents,
             CAST({terms} AS BIGINT) AS ewma_scaled,
             CAST({wsum} AS BIGINT) AS wsum
      FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec, event_id))
    SELECT event_id, user_id, cents, ewma_scaled, wsum
    FROM scored
    WHERE wsum > 0 AND cents * wsum > 3 * ewma_scaled
    """


@register("q_ewma_anomaly", oracle=_ewma_sql())
def q_ewma_anomaly(spark: SparkSession, sf: str) -> DataFrame:
    """Per-user spend-spike screen: flag an event whose value exceeds 3x
    its exponentially-weighted trailing baseline (halving weights over
    the previous 8 events).

    All integer arithmetic — cents x power-of-two weights — so the
    threshold compare is exact on both engines (a float EWMA recurrence
    would accumulate fold-order drift). The window is 8 LAG columns
    (pure JVM codegen, one per-user sort); partition cardinality =
    users, which scales with the data.
    """
    ev = table(spark, sf, "events").select(
        "event_id",
        "user_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        F.col("ts").cast("long").alias("ts_sec"),
    )
    w = W.partitionBy("user_id").orderBy(F.asc("ts_sec"), F.asc("event_id"))
    ewma = sum(
        F.coalesce(
            F.lag("cents", j).over(w) * F.lit(1 << (_EWMA_LAGS - j)),
            F.lit(0).cast("long"),
        )
        for j in range(1, _EWMA_LAGS + 1)
    )
    wsum = sum(
        F.when(
            F.lag("cents", j).over(w).isNotNull(), F.lit(1 << (_EWMA_LAGS - j))
        ).otherwise(F.lit(0))
        for j in range(1, _EWMA_LAGS + 1)
    )
    return (
        ev.select(
            "event_id",
            "user_id",
            "cents",
            ewma.cast("long").alias("ewma_scaled"),
            wsum.cast("long").alias("wsum"),
        )
        .filter(
            (F.col("wsum") > 0)
            & (F.col("cents") * F.col("wsum") > 3 * F.col("ewma_scaled"))
        )
    )


# ---------------------------------------------------------------------------
# Triangle counting on the co-supplier graph
# ---------------------------------------------------------------------------
@register(
    "q_triangle_suppliers",
    oracle="""
    WITH li AS (
      SELECT l_orderkey, l_suppkey FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-01-01 00:00:00'),
    e AS (
      SELECT DISTINCT l1.l_suppkey AS a, l2.l_suppkey AS b
      FROM li l1 JOIN li l2
        ON l1.l_orderkey = l2.l_orderkey AND l1.l_suppkey < l2.l_suppkey),
    nodes AS (
      SELECT COUNT(DISTINCT x) AS n_nodes FROM (
        SELECT a AS x FROM e UNION SELECT b FROM e)),
    tri AS (
      SELECT COUNT(*) AS n_triangles
      FROM e e1 JOIN e e2 ON e1.a = e2.a AND e1.b < e2.b
                JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b)
    SELECT CAST(n_nodes AS BIGINT) AS n_nodes,
           CAST((SELECT COUNT(*) FROM e) AS BIGINT) AS n_edges,
           CAST(n_triangles AS BIGINT) AS n_triangles
    FROM nodes, tri
    """,
)
def q_triangle_suppliers(spark: SparkSession, sf: str) -> DataFrame:
    """Count triangles in the supplier co-occurrence graph (edge =
    two suppliers sharing an order) — the community-density primitive.

    The oracle states the textbook id-ordered 3-way join; the Spark
    plan uses the degree-ordered orientation (operators/graph.py:
    triangle_count), which bounds wedge fan-out at m^1.5 regardless of
    skew — the difference between finishing and not when one hub
    supplier touches every order. Edge build is persisted: it feeds the
    degree agg, the orientation join, and the closing-edge probe.

    The graph is the ONE-YEAR co-occurrence subgraph: the fixture's
    random supplier assignment makes the all-time graph near-complete
    (453k of 500k possible edges at sf0.1 — sum(deg^2) ~ 8e8 wedges,
    a dense-workload artifact, not a plan property), while windowed
    co-occurrence is the form community analyses actually query. The
    shipdate predicate pushes to the parquet scan.
    """
    li = (
        table(spark, sf, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
        )
        .select("l_orderkey", "l_suppkey")
    )
    l2 = li.select(
        F.col("l_orderkey"), F.col("l_suppkey").alias("r_suppkey")
    )
    edges = persist_tracked(
        li.join(l2, "l_orderkey")
        .filter(F.col("l_suppkey") < F.col("r_suppkey"))
        .select(
            F.col("l_suppkey").alias("a"), F.col("r_suppkey").alias("b")
        )
        .distinct()
    )
    return graph.triangle_count(edges)


# ---------------------------------------------------------------------------
# Int8 scalar quantization: calibration attestation + quantized top-k
# ---------------------------------------------------------------------------
_INT8_DIM = similarity.EMBEDDING_DIM
_INT8_CODE_SQL = f"""
  e AS (
    SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
    FROM embeddings),
  bounds AS (
    SELECT i, MIN(v[i]) AS mn, MAX(v[i]) AS mx
    FROM e, generate_series(1, {_INT8_DIM}) AS g(i)
    GROUP BY i),
  cal AS (
    SELECT list(mn ORDER BY i) AS mns, list(mx ORDER BY i) AS mxs
    FROM bounds),
  codes AS (
    SELECT vec_id,
           list_transform(generate_series(1, {_INT8_DIM}),
             i -> CASE WHEN mxs[i] = mns[i] THEN -127
                  ELSE GREATEST(-127, LEAST(127,
                         CAST(ROUND((v[i] - mns[i]) * 254.0
                                    / (mxs[i] - mns[i])) AS INT) - 127))
                  END) AS code
    FROM e, cal)
"""


def _vector_codes_oracle() -> str:
    """Merged per-vector representation oracle: the int8 CTEs (local),
    the PQ codebook/code CTEs and the literal-plane LSH key (imported
    from llm_ops — fully loaded first by queries/__init__), sharing ONE
    ``e`` base CTE. The PQ code CTE is renamed codes -> pqc so the two
    recipes' CTEs coexist."""
    from dns_log_transformer_spark.queries.llm_ops import (
        _LSH_KEY_SQL,
        _PQ_CB,
        _PQ_CODES,
    )

    pqc = _PQ_CODES.replace("codes AS (", "pqc AS (", 1)
    # the rename must actually take, or a future _PQ_CODES edit would
    # silently collide with the int8 recipe's 'codes' CTE (ADVICE r10)
    if "codes AS (" in pqc:  # not assert: oracle text guard must survive -O
        raise RuntimeError("_PQ_CODES no longer opens 'codes AS ('")
    return f"""
    WITH {_INT8_CODE_SQL},
    i8 AS (
      SELECT vec_id,
             array_to_string(code, ',') AS int8_csv,
             CAST(list_sum(code) AS BIGINT) AS int8_sum
      FROM codes),
    {_PQ_CB},
    {pqc},
    pq AS (
      SELECT vec_id,
             array_to_string(list(CAST(cell AS VARCHAR) ORDER BY sub), ',')
               AS pq_csv
      FROM pqc GROUP BY vec_id),
    lsh AS (
      SELECT vec_id, CAST({_LSH_KEY_SQL} AS INT) AS lsh_key FROM e)
    SELECT i8.vec_id, i8.int8_csv, i8.int8_sum, pq.pq_csv, lsh.lsh_key
    FROM i8 JOIN pq USING (vec_id) JOIN lsh USING (vec_id)
    """


@register("emb_vector_codes", oracle=_vector_codes_oracle())
def emb_vector_codes(spark: SparkSession, sf: str) -> DataFrame:
    """Per-vector compressed representations, all three families in ONE
    Arrow pipeline over one scan (r10 consolidation of emb_int8_codes +
    emb_pq_codes + sim_lsh_buckets, VERDICT r9 #1 — three per-vec
    projection shells over the same embeddings scan):

    - ``int8_csv`` / ``int8_sum``: scalar int8 quantization (global
      per-dim min/max calibration -> 254 levels -> [-127, 127]) — 4x
      smaller vectors ahead of ANN; the checksum is the exact slot-sum;
    - ``pq_csv``: product-quantization codes (nearest codebook cell per
      8-dim subspace by L2) — the 32x-compressed form a billion-vector
      index actually stores;
    - ``lsh_key``: random-hyperplane LSH bucket key (numpy matmul in a
      pandas UDF; literal-plane SQL folds in the oracle).

    Plan shape: calibration is a 64-group aggregation and the codebook
    is bounded driver state regardless of corpus size; the three
    encoders then CHAIN as keep_cols-threaded Arrow projections riding
    one scan — zero joins, zero shuffles on the Spark side (the oracle
    joins its three CTEs; the engine never does).

    Driver-facing projection: code arrays serialize to CSV so the
    harness canonicalizer can sort the output — the array-returning
    operators stay internal (round-4 lesson)."""
    emb = table(spark, sf, "embeddings")
    mns, mxs = similarity.int8_bounds(emb)
    cb = similarity.pq_codebook(emb, n_cells=similarity.PQ_CELLS)
    keyed = similarity.with_lsh_bucket(emb)
    i8 = similarity.int8_encode(
        emb=keyed, mns=mns, mxs=mxs, keep_cols=("lsh_key", "embedding")
    ).withColumnRenamed("code", "_i8")
    coded = similarity.pq_encode(
        i8, cb, m=similarity.PQ_SUBSPACES, keep_cols=("lsh_key", "_i8")
    )
    return coded.select(
        "vec_id",
        F.array_join(F.col("_i8").cast("array<string>"), ",").alias(
            "int8_csv"
        ),
        # explicit slot-sum over the fixed 64 dims (PLANS.md rule 3:
        # no interpreted higher-order-function lambda in a hot path)
        sum(
            F.col("_i8").getItem(i).cast("long")
            for i in range(similarity.EMBEDDING_DIM)
        ).alias("int8_sum"),
        F.array_join(F.col("code").cast("array<string>"), ",").alias(
            "pq_csv"
        ),
        "lsh_key",
    )


@register(
    "sim_int8_topk",
    oracle=f"""
    WITH {_INT8_CODE_SQL},
    q AS (SELECT vec_id AS query_id, code AS q_code FROM codes
          WHERE vec_id % 50 = 0 AND vec_id < 2000),
    scored AS (
      SELECT q.query_id, c.vec_id,
             CAST(list_sum(list_transform(list_zip(c.code, q.q_code),
                    p -> CAST(p[1] AS BIGINT) * p[2])) AS BIGINT) AS dot_q
      FROM codes c, q WHERE c.vec_id <> q.query_id)
    SELECT query_id, vec_id, dot_q, rnk FROM (
      SELECT query_id, vec_id, dot_q,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY dot_q DESC, vec_id) AS rnk
      FROM scored)
    WHERE rnk <= 5
    """,
)
def sim_int8_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Top-5 neighbors by integer dot product in the int8-quantized
    space (fixed query workload, ANN-family convention). Integer
    scoring is bit-reproducible — no ROUND/fold-order discipline needed
    — and the compressed codes cut the scan's memory traffic 4x; plan
    shape = the exact brute-force baseline (broadcast queries, linear
    corpus scan, windowed top-k)."""
    emb = table(spark, sf, "embeddings")
    queries = emb.filter(
        (F.col("vec_id") % 50 == 0) & (F.col("vec_id") < 2000)
    )
    return similarity.int8_topk(emb, queries, k=5)


# ---------------------------------------------------------------------------
# Character-trigram familiarity: reference-LM-style quality proxy
# ---------------------------------------------------------------------------
_TRI_REF_FILTER = "doc_id % 19 = 0"
_TRI_SQL = r"""
  norm AS (
    SELECT doc_id,
           regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS n
    FROM documents),
  tri AS (
    SELECT doc_id,
           list_distinct(list_transform(
             range(GREATEST(length(n) - 2, 0)),
             i -> substr(n, CAST(i + 1 AS INT), 3))) AS t
    FROM norm),
  ref AS (
    SELECT DISTINCT unnest(t) AS g FROM tri WHERE {ref_filter}),
  ex AS (SELECT doc_id, unnest(t) AS g FROM tri WHERE len(t) > 0),
  known AS (
    SELECT ex.doc_id, COUNT(ref.g) AS n_known
    FROM ex LEFT JOIN ref USING (g) GROUP BY ex.doc_id)
"""


@register(
    "text_trigram_familiarity",
    oracle=f"""
    WITH {_TRI_SQL.format(ref_filter=_TRI_REF_FILTER)}
    SELECT t.doc_id,
           CAST(len(t.t) AS BIGINT) AS n_tri,
           CAST(k.n_known AS BIGINT) AS n_known,
           ROUND(CAST(k.n_known AS DOUBLE) / len(t.t), 4) AS familiarity
    FROM tri t JOIN known k USING (doc_id)
    WHERE len(t.t) > 0
    """,
)
def text_trigram_familiarity(spark: SparkSession, sf: str) -> DataFrame:
    """Reference-corpus familiarity score — the n-gram-LM quality-proxy
    shape (KenLM-style filtering) without a model: what fraction of a
    document's distinct character trigrams appear anywhere in a trusted
    reference slice (every 19th doc here; a curated corpus in
    production).

    Scale shape: the reference trigram vocabulary is bounded by
    alphabet^3 — a DIMENSION regardless of corpus size — so membership
    is a broadcast hash join riding the exploded scan; per-doc trigram
    sets come from one Arrow-batched pass. Counting known vs total per
    doc is a map-side-combinable aggregation. Exact integer counts; the
    single float division is rounded identically on both engines.
    """
    from dns_log_transformer_spark.operators import text as text_ops

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def tri_set(n: pd.Series) -> pd.Series:
        return n.map(
            lambda s: sorted({s[i : i + 3] for i in range(len(s) - 2)})
            if s is not None
            else []
        )

    docs = table(spark, sf, "documents").select("doc_id", "text")
    tri = persist_tracked(
        text_ops.rebalance_for_fanout(docs)
        .select(
            "doc_id", tri_set(text_ops.normalized(F.col("text"))).alias("t")
        )
        .filter(F.size("t") > 0)
    )
    ref = (
        tri.filter(F.expr(_TRI_REF_FILTER))
        .select(F.explode("t").alias("g"))
        .distinct()
    )
    ex = tri.select("doc_id", F.explode("t").alias("g"))
    known = (
        ex.join(F.broadcast(ref), "g", "left_semi")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_known"))
    )
    return (
        tri.join(known, "doc_id", "left")
        .select(
            "doc_id",
            F.size("t").cast("long").alias("n_tri"),
            F.coalesce("n_known", F.lit(0)).cast("long").alias("n_known"),
            F.round(
                F.coalesce("n_known", F.lit(0)) / F.size("t"), 4
            ).alias("familiarity"),
        )
    )


# ---------------------------------------------------------------------------
# Corpus snapshot diff: added / removed / changed / unchanged churn report
# ---------------------------------------------------------------------------
_SNAP_SQL = """
  a AS (
    SELECT doc_id, md5(text) AS h, length(text) AS nc
    FROM documents WHERE doc_id % 29 <> 0),
  b AS (
    SELECT doc_id,
           md5(CASE WHEN doc_id % 7 = 0 THEN text || ' [rev2]'
                    ELSE text END) AS h,
           length(CASE WHEN doc_id % 7 = 0 THEN text || ' [rev2]'
                       ELSE text END) AS nc
    FROM documents WHERE doc_id % 31 <> 0)
"""


@register(
    "corpus_snapshot_diff",
    oracle=f"""
    WITH {_SNAP_SQL},
    j AS (
      SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
             CASE WHEN a.doc_id IS NULL THEN 'added'
                  WHEN b.doc_id IS NULL THEN 'removed'
                  WHEN a.h <> b.h THEN 'changed'
                  ELSE 'unchanged' END AS status,
             COALESCE(b.nc, a.nc) AS nc
      FROM a FULL OUTER JOIN b USING (doc_id))
    SELECT status, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(nc) AS BIGINT) AS n_chars
    FROM j GROUP BY status
    """,
)
def corpus_snapshot_diff(spark: SparkSession, sf: str) -> DataFrame:
    """Churn report between two corpus snapshots (the data-versioning
    primitive: what did this crawl/refresh add, remove, or edit?).
    Snapshots are derived deterministically from the fixture (A drops
    every 29th doc, B drops every 31st and revises every 7th).

    Shape at scale: ONE full-outer hash join on doc_id comparing
    content hashes — no content comparison beyond the 128-bit digest,
    no window. At 100 TB both sides would be bucketed/Z-ordered on
    doc_id (storage/bucketing.py), turning the exchange into a
    co-located sort-merge.
    """
    docs = table(spark, sf, "documents").select("doc_id", "text")
    a = docs.filter(F.col("doc_id") % 29 != 0).select(
        "doc_id",
        F.md5("text").alias("h_a"),
        F.length("text").cast("long").alias("nc_a"),
    )
    rev = F.when(
        F.col("doc_id") % 7 == 0, F.concat("text", F.lit(" [rev2]"))
    ).otherwise(F.col("text"))
    b = (
        docs.filter(F.col("doc_id") % 31 != 0)
        .select("doc_id", rev.alias("_t"))
        .select(
            "doc_id",
            F.md5("_t").alias("h_b"),
            F.length("_t").cast("long").alias("nc_b"),
        )
    )
    j = a.join(b, "doc_id", "full_outer").select(
        F.when(F.col("h_a").isNull(), F.lit("added"))
        .when(F.col("h_b").isNull(), F.lit("removed"))
        .when(F.col("h_a") != F.col("h_b"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
        .alias("status"),
        F.coalesce("nc_b", "nc_a").alias("nc"),
    )
    return j.groupBy("status").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("nc").cast("long").alias("n_chars"),
    )


# ---------------------------------------------------------------------------
# Quality-aware dedup survivor selection
# ---------------------------------------------------------------------------
def _keep_best_oracle() -> str:
    from dns_log_transformer_spark.queries.llm_ops import (
        _MH_PAIRS_CTES,
        _QUALITY_RAW_SQL,
        _QUALITY_SCORE_EXPR,
    )

    skey = (
        "CAST(ROUND(scored.quality_score * 10000) AS BIGINT)"
        " * 1000000000000 - allc.doc_id"
    )
    return rf"""
    WITH RECURSIVE {_MH_PAIRS_CTES},
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM dup_pairs
      UNION ALL
      SELECT doc_b, doc_a FROM dup_pairs),
    nodes AS (SELECT DISTINCT src AS doc_id FROM edges),
    reach(a, b) AS (
      SELECT doc_id, doc_id FROM nodes
      UNION
      SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src),
    comp AS (SELECT a AS doc_id, MIN(b) AS component FROM reach GROUP BY a),
    q AS ({_QUALITY_RAW_SQL}),
    scored AS (
      SELECT doc_id, {_QUALITY_SCORE_EXPR} AS quality_score FROM q),
    allc AS (
      SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS component
      FROM documents d LEFT JOIN comp c USING (doc_id)),
    best AS (
      SELECT component, arg_max(allc.doc_id, {skey}) AS best_id
      FROM allc JOIN scored ON allc.doc_id = scored.doc_id
      GROUP BY component)
    SELECT allc.doc_id,
           allc.component AS keep_id,
           allc.doc_id = allc.component AS is_kept_min,
           best.best_id,
           allc.doc_id = best.best_id AS is_kept
    FROM allc JOIN best USING (component)
    """


@register("dedup_keep_best", oracle=_keep_best_oracle())
def dedup_keep_best(spark: SparkSession, sf: str) -> DataFrame:
    """Dedup survivor election, BOTH shipped policies in one per-doc
    frame (r10: dedup_keep_list consolidated in, VERDICT r9 #1 — the
    two shells shared the pairs -> components -> full-corpus join-back
    pipeline and differed only in the elected survivor):

    - ``keep_id`` / ``is_kept_min``: the cluster's canonical MIN doc id
      (docs outside any cluster keep themselves) — the join-key
      artifact a corpus dedup ships for downstream `WHERE is_kept` /
      keep_id joins;
    - ``best_id`` / ``is_kept``: the HIGHEST-quality member (min
      doc_id tiebreak) — the policy real curation elects (drop the
      boilerplate copy, keep the clean one).

    Composition: MinHash-LSH pairs -> connected components (both
    already attested) -> left join back to the full corpus (singletons
    must survive) -> one max_by per component over a packed
    (score, -id) int64 key — argmax replaces the join-back-on-max
    idiom, so survivor election costs ONE extra hash aggregation on
    component ids, and the min-id policy is free (it IS the component
    id the left join already carries).
    """
    from dns_log_transformer_spark.operators import dedup, text as text_ops

    docs = table(spark, sf, "documents")
    pairs = dedup.minhash_lsh_pairs(docs, threshold=0.5)
    comp = dedup.connected_components(pairs)
    scored = text_ops.with_quality_score(docs).select(
        "doc_id", "quality_score"
    )
    allc = persist_tracked(
        docs.select("doc_id")
        .join(comp, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("component", "doc_id").alias("component"),
        )
    )
    skey = (
        F.round(F.col("quality_score") * 10000).cast("long")
        * F.lit(1_000_000_000_000)
        - F.col("doc_id")
    )
    best = (
        allc.join(scored, "doc_id")
        .groupBy("component")
        .agg(F.max_by("doc_id", skey).alias("best_id"))
    )
    return allc.join(best, "component").select(
        "doc_id",
        F.col("component").alias("keep_id"),
        (F.col("doc_id") == F.col("component")).alias("is_kept_min"),
        "best_id",
        (F.col("doc_id") == F.col("best_id")).alias("is_kept"),
    )


# ---------------------------------------------------------------------------
# Perceptual-hash (aHash) multimodal near-dup
# ---------------------------------------------------------------------------
def _phash_band_sql(k: int) -> str:
    terms = " + ".join(
        f"(CASE WHEN p[{k * 16 + i + 1}] * 64 > total"
        f" THEN {1 << i} ELSE 0 END)"
        for i in range(16)
    )
    return f"CAST({terms} AS INT)"


# pixels = 64 evenly-spaced character samples (code point % 16) — the
# locality-preserving thumbnail stand-in (operators/multimodal.py:
# fake_pixels); bit i of the hash = pixel_i clears the image mean,
# compared in exact integers
_PHASH_PX = """
  px AS (
    SELECT doc_id,
           list_transform(range(64),
             i -> CASE WHEN length(text) = 0 THEN 0
                  ELSE ord(substr(text,
                         CAST(floor(i * length(text) / 64) + 1 AS INT),
                         1)) % 16 END) AS p
    FROM {src})"""
_PHASH_BANDS = """
  ph AS (
    SELECT doc_id, {b0} AS b0, {b1} AS b1, {b2} AS b2, {b3} AS b3
    FROM (SELECT doc_id, p, list_sum(p) AS total FROM px))""".format(
    b0=_phash_band_sql(0),
    b1=_phash_band_sql(1),
    b2=_phash_band_sql(2),
    b3=_phash_band_sql(3),
)
_PHASH_CTES = _PHASH_PX.format(src="documents") + "," + _PHASH_BANDS

#: deterministic 're-encoded copy' plant: the fixture corpus has no
#: byte-near payloads (verified: min pairwise Hamming 14), so the pairs
#: query unions a same-length one-character edit of every 13th doc —
#: the same-image-different-encode scenario the operator exists to
#: catch. 38 of the 39 plants land within Hamming 3 (one at 4 — missed
#: honestly; the threshold is the contract, not recall).
_PHASH_PLANT = """
  blobs AS (
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + 10000000 AS doc_id,
           substr(text, 1, 10) || 'Z' || substr(text, 12) AS text
    FROM documents WHERE doc_id % 13 = 0 AND length(text) > 12)"""


@register(
    "mm_image_meta",
    oracle=f"""
    WITH {_PHASH_CTES}
    SELECT d.doc_id,
           CAST(octet_length(encode(d.text)) AS BIGINT) AS n_bytes,
           CAST(octet_length(encode(d.text)) % 640 AS INT) AS width,
           CAST(d.doc_id % 480 AS INT) AS height,
           CAST(3 AS INT) AS channels,
           ph.b0, ph.b1, ph.b2, ph.b3
    FROM documents d JOIN ph USING (doc_id)
    """,
)
def mm_image_meta(spark: SparkSession, sf: str) -> DataFrame:
    """Per-image metadata AND the 64-bit perceptual average-hash in one
    frame (r10: mm_phash64 consolidated in, VERDICT r9 #1 — the two
    shells each paid a full mapInPandas decode over the same payloads;
    a real census decodes once):

    - n_bytes/width/height/channels through the real mapInPandas binary
      plumbing (decoder stubbed deterministically — no image libs
      here; the REAL byte-level header parse is sniff_image_meta /
      mm_format_census);
    - b0..b3: the aHash emitted as four 16-bit band ints, the join-ready
      form mm_phash_pairs band-joins on — bit i = 1 iff pixel_i clears
      the image mean, compared in exact integers (pixel*64 > sum), over
      the locality-preserving character-sample thumbnail stand-in.

    ONE Arrow pass (operators/multimodal.py image_profile), no shuffle,
    no join on the Spark side — the oracle joins its two CTEs; the
    engine never does."""
    from dns_log_transformer_spark.operators import multimodal

    docs = table(spark, sf, "documents")
    return multimodal.image_profile(docs)


@register(
    "mm_phash_pairs",
    oracle=f"""
    WITH {_PHASH_PLANT},
    {_PHASH_PX.format(src="blobs")},
    {_PHASH_BANDS},
    bands AS (
      SELECT doc_id, band, key FROM (
        SELECT doc_id, unnest([0, 1, 2, 3]) AS band,
               unnest([b0, b1, b2, b3]) AS key
        FROM ph)),
    eligible AS (
      SELECT doc_id, band, key FROM (
        SELECT doc_id, band, key,
               COUNT(*) OVER (PARTITION BY band, key) AS _c
        FROM bands)
      WHERE _c <= 100),
    cand AS (
      SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
      FROM eligible x JOIN eligible y
        ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id),
    pairs AS (
      SELECT c.doc_a, c.doc_b,
             CAST(bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1))
                + bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3))
               AS INT) AS hamming
      FROM cand c JOIN ph a ON a.doc_id = c.doc_a
                  JOIN ph b ON b.doc_id = c.doc_b)
    SELECT doc_a, doc_b, hamming FROM pairs WHERE hamming <= 3
    """,
)
def mm_phash_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """Perceptual near-dup image pairs (aHash Hamming <= 3) — the
    multimodal dedup step (pHash/PDQ-style) at the banded-join scale
    shape: <= 3 bit flips leave at least one of the 4 16-bit bands
    intact (pigeonhole), so candidates come from an equi-join on
    (band, value). The oracle computes the SAME algorithm including the
    hot-bucket occupancy cap (buckets over 100 members excluded from
    candidate generation — the skew guard), so engine and oracle agree
    at ANY scale, not just while the fixture stays under the cap. The
    corpus is augmented with planted same-length one-character edits
    (the re-encode scenario; see _PHASH_PLANT) because the raw fixture
    has no byte-near payloads."""
    from dns_log_transformer_spark.operators import multimodal

    docs = table(spark, sf, "documents").select("doc_id", "text")
    planted = docs.filter(
        (F.col("doc_id") % 13 == 0) & (F.length("text") > 12)
    ).select(
        (F.col("doc_id") + 10000000).alias("doc_id"),
        F.concat(
            F.substring("text", 1, 10),
            F.lit("Z"),
            F.expr("substring(text, 12)"),
        ).alias("text"),
    )
    return multimodal.phash_pairs(docs.unionAll(planted), max_hamming=3)


# ---------------------------------------------------------------------------
# Skew salting, driver-attested (operators/skew.py)
# ---------------------------------------------------------------------------
@register(
    "q_salted_skew_agg",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             AS total
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_salted_skew_agg(spark: SparkSession, sf: str) -> DataFrame:
    """Two-phase salted aggregation on the WORST skew case — a 3-value
    grouping key, where a plain hash agg funnels the entire table
    through 3 reducers. Salting spreads each hot key over 16 subkeys;
    the second shuffle carries 16 rows per key. Values are exact
    integer cents, so the salted two-phase sum is bit-equal to the
    oracle's single GROUP BY regardless of combine order (the random
    salt can shift only fp folds, never integer sums)."""
    from dns_log_transformer_spark.operators import skew

    li = table(spark, sf, "lineitem").select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
    )
    return skew.salted_sum(li, ["l_returnflag"], "cents", n_salts=16)


@register(
    "q_salted_join_enrich",
    oracle="""
    WITH dim AS (
      SELECT DISTINCT l_returnflag,
             CAST(ord(l_returnflag) AS BIGINT) AS factor
      FROM lineitem)
    SELECT l.l_returnflag,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                    * d.factor) AS BIGINT) AS weighted_cents
    FROM lineitem l JOIN dim d USING (l_returnflag)
    GROUP BY l.l_returnflag
    """,
)
def q_salted_join_enrich(spark: SparkSession, sf: str) -> DataFrame:
    """Salted replicate-join against a hot 3-key build side — the
    explicit fallback when the dimension cannot broadcast and AQE's
    skew split does not apply (aggregation-free enrichment scans).
    The small side is replicated once per salt, the fact side salts
    its key, and the hot key's rows spread over 16 partitions; result
    is bit-equal to the oracle's plain join (exact-integer weights)."""
    from dns_log_transformer_spark.operators import skew

    li = table(spark, sf, "lineitem").select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
    )
    dim = li.select("l_returnflag").distinct().select(
        "l_returnflag",
        F.ascii("l_returnflag").cast("long").alias("factor"),
    )
    joined = skew.salt_join(li, dim, "l_returnflag", n_salts=16)
    return joined.groupBy("l_returnflag").agg(
        F.sum(F.col("cents") * F.col("factor")).cast("long").alias("weighted_cents")
    )


# ---------------------------------------------------------------------------
# Data-quality expectations audit (Great-Expectations-style, one pass)
# ---------------------------------------------------------------------------
@register(
    "corpus_expectations",
    oracle="""
    WITH checks AS (
      SELECT
        CAST(COUNT(*) AS BIGINT) AS n_rows,
        CAST(COUNT(*) - COUNT(text) AS BIGINT) AS null_text,
        CAST(COUNT(*) - COUNT(DISTINCT doc_id) AS BIGINT) AS dup_ids,
        CAST(SUM(CASE WHEN n_chars <> LENGTH(text) THEN 1 ELSE 0 END)
          AS BIGINT) AS bad_n_chars,
        CAST(SUM(CASE WHEN lang NOT IN ('en','de','fr','es','unk')
                 THEN 1 ELSE 0 END) AS BIGINT) AS bad_lang,
        CAST(SUM(CASE WHEN LENGTH(text) = 0 THEN 1 ELSE 0 END)
          AS BIGINT) AS empty_text
      FROM documents)
    SELECT u.expectation, u.violations,
           (u.violations = 0) AS passed, c.n_rows
    FROM checks c,
         (SELECT 'text_not_null' AS expectation, null_text AS violations
            FROM checks
          UNION ALL SELECT 'doc_id_unique', dup_ids FROM checks
          UNION ALL SELECT 'n_chars_consistent', bad_n_chars FROM checks
          UNION ALL SELECT 'lang_in_domain', bad_lang FROM checks
          UNION ALL SELECT 'text_not_empty', empty_text FROM checks) u
    """,
)
def corpus_expectations(spark: SparkSession, sf: str) -> DataFrame:
    """Expectation-suite audit (the Great-Expectations/dbt-test shape):
    five invariants — non-null text, unique ids, n_chars==length(text),
    lang within domain, non-empty text — checked in ONE scan as
    conditional aggregates (no per-check pass, no join), then unpivoted
    to a (expectation, violations, passed) report. The audit a corpus
    ingest runs before promoting a snapshot.

    count(DISTINCT doc_id) is the one non-combinable agg; Spark splits
    it into its own partial via expand — still a single scan."""
    d = table(spark, sf, "documents")
    checks = d.agg(
        F.count("*").cast("long").alias("n_rows"),
        (F.count("*") - F.count("text")).cast("long").alias("null_text"),
        (F.count("*") - F.countDistinct("doc_id"))
        .cast("long")
        .alias("dup_ids"),
        F.sum(
            (F.col("n_chars") != F.length("text")).cast("long")
        ).alias("bad_n_chars"),
        F.sum(
            (~F.col("lang").isin("en", "de", "fr", "es", "unk")).cast("long")
        ).alias("bad_lang"),
        F.sum((F.length("text") == 0).cast("long")).alias("empty_text"),
    )
    report = checks.select(
        "n_rows",
        F.expr(
            "stack(5,"
            " 'text_not_null', null_text,"
            " 'doc_id_unique', dup_ids,"
            " 'n_chars_consistent', bad_n_chars,"
            " 'lang_in_domain', bad_lang,"
            " 'text_not_empty', empty_text)"
        ).alias("expectation", "violations"),
    )
    return report.select(
        "expectation",
        F.col("violations").cast("long").alias("violations"),
        (F.col("violations") == 0).alias("passed"),
        "n_rows",
    )


# ---------------------------------------------------------------------------
# Event-transition matrix (first-order Markov counts per event bigram)
# ---------------------------------------------------------------------------
@register(
    "q_event_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             LEAD(event_type) OVER (
               PARTITION BY user_id
               ORDER BY CAST(floor(epoch(ts)) AS BIGINT), event_id
             ) AS next_type
      FROM events)
    SELECT event_type AS from_type, next_type AS to_type,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM seq WHERE next_type IS NOT NULL
    GROUP BY event_type, next_type
    """,
)
def q_event_transitions(spark: SparkSession, sf: str) -> DataFrame:
    """First-order transition counts over per-user event sequences (the
    Markov-matrix / next-event-prediction feature): one per-user window
    pairs each event with its successor, then a |types|^2-bounded count
    aggregation. One shuffle on user_id, one on the (tiny) type pair;
    event_id breaks timestamp ties so both engines sequence
    identically."""
    ev = table(spark, sf, "events").select(
        "user_id",
        "event_type",
        F.col("ts").cast("long").alias("ts_sec"),
        "event_id",
    )
    w = W.partitionBy("user_id").orderBy(F.asc("ts_sec"), F.asc("event_id"))
    return (
        ev.withColumn("next_type", F.lead("event_type").over(w))
        .filter(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
        .agg(F.count("*").cast("long").alias("n"))
    )


# ---------------------------------------------------------------------------
# Remaining rank-function family: dense_rank / percent_rank / cume_dist
# ---------------------------------------------------------------------------
@register(
    "q_rank_functions",
    oracle="""
    WITH o AS (
      SELECT o_orderkey, o_orderpriority,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders),
    ranked AS (
      SELECT o_orderkey, o_orderpriority, cents,
             CAST(RANK() OVER w AS BIGINT) AS rnk,
             CAST(DENSE_RANK() OVER w AS BIGINT) AS drnk,
             ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
             ROUND(CUME_DIST() OVER w, 6) AS cume,
             CAST(NTILE(10) OVER w AS INT) AS decile
      FROM o WINDOW w AS (PARTITION BY o_orderpriority
                          ORDER BY cents, o_orderkey))
    SELECT o_orderkey, o_orderpriority, cents, rnk, drnk, pct_rank, cume,
           decile
    FROM ranked WHERE o_orderkey % 17 = 0
    """,
)
def q_rank_functions(spark: SparkSession, sf: str) -> DataFrame:
    """The full window rank family in ONE window pass: rank,
    dense_rank, percent_rank, cume_dist, and NTILE(10) equi-frequency
    deciles (r10: q_ntile_buckets consolidated in, VERDICT r9 #1 —
    NTILE rides the SAME per-priority sort as the other four, so the
    plan must still carry a single Window node). Ordering key
    (cents, orderkey) is total, so ranks and bucket boundaries are
    deterministic; the two ratio functions divide exact integers and
    are rounded identically on both engines. Output sampled to every
    17th order AFTER ranking (the filter must not perturb the frame).

    The partition key (orderpriority) has bounded cardinality with
    members that scale — the same caveat the old q_ntile_buckets
    carried; the production-scale NTILE shape (range-partitioned
    grouped_rank + ntile_from_rank, no WindowExec) is attested by
    text_quality's decile column and plan-pinned in
    test_skew_and_plans.
    """
    o = table(spark, sf, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    w = W.partitionBy("o_orderpriority").orderBy(
        F.asc("cents"), F.asc("o_orderkey")
    )
    return (
        o.select(
            "o_orderkey",
            "o_orderpriority",
            "cents",
            F.rank().over(w).cast("long").alias("rnk"),
            F.dense_rank().over(w).cast("long").alias("drnk"),
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 6).alias("cume"),
            F.ntile(10).over(w).cast("int").alias("decile"),
        )
        .filter(F.col("o_orderkey") % 17 == 0)
    )


# ---------------------------------------------------------------------------
# IVF-PQ with residual encoding (the composition the base ops point to)
# ---------------------------------------------------------------------------
def _ivfpq_oracle() -> str:
    from dns_log_transformer_spark.queries.llm_ops import (
        _SEMDEDUP_CB,
        _SQL_DOT,
    )

    d_sub = 64 // similarity.PQ_SUBSPACES
    return f"""
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings),
    {_SEMDEDUP_CB},
    corpus_cell AS (
      SELECT vec_id, v, cell FROM (
        SELECT e.vec_id, e.v, cb.cell,
               ROW_NUMBER() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY {_SQL_DOT.format(a='e.v', b='cb.cv')} DESC,
                          cb.cell) AS rn
        FROM e, cb)
      WHERE rn = 1),
    resid AS (
      SELECT cc.vec_id, cc.cell,
             list_transform(range(64), d -> cc.v[d + 1] - cb.cv[d + 1]) AS r
      FROM corpus_cell cc JOIN cb USING (cell)),
    pqcb AS (
      SELECT pcell, list(c ORDER BY dim) AS pcv FROM (
        SELECT CAST(vec_id % {similarity.PQ_CELLS} AS INT) AS pcell,
               CAST(u.p[1] AS INT) AS dim,
               ROUND(AVG(u.p[2]), 4) AS c
        FROM (
          SELECT vec_id, unnest(list_zip(range(len(r)), r)) AS p
          FROM resid) u
        GROUP BY 1, 2)
      GROUP BY pcell),
    codes AS (
      SELECT vec_id, cell, sub, pcell FROM (
        SELECT rs.vec_id, rs.cell, s.sub, pqcb.pcell,
               ROW_NUMBER() OVER (
                 PARTITION BY rs.vec_id, s.sub
                 ORDER BY list_sum(list_transform(range({d_sub}),
                     d -> (rs.r[s.sub*{d_sub} + d + 1]
                           - pqcb.pcv[s.sub*{d_sub} + d + 1])
                        * (rs.r[s.sub*{d_sub} + d + 1]
                           - pqcb.pcv[s.sub*{d_sub} + d + 1]))),
                   pqcb.pcell) AS rn
        FROM resid rs, range({similarity.PQ_SUBSPACES}) s(sub), pqcb)
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
    qdc AS (
      SELECT p.query_id, p.qv, p.cell,
             {_SQL_DOT.format(a='p.qv', b='cb.cv')} AS qc
      FROM probes p JOIN cb USING (cell)),
    subsc AS (
      SELECT q.query_id, c.vec_id, q.qc, c.sub,
             list_sum(list_transform(range({d_sub}),
                 d -> q.qv[c.sub*{d_sub} + d + 1]
                      * pqcb.pcv[c.sub*{d_sub} + d + 1])) AS ds
      FROM codes c
      JOIN qdc q ON q.cell = c.cell AND c.vec_id <> q.query_id
      JOIN pqcb ON pqcb.pcell = c.pcell),
    scored AS (
      SELECT query_id, vec_id,
             ROUND(MIN(qc) + list_sum(list(ds ORDER BY sub)), 4)
               AS adc_score
      FROM subsc GROUP BY query_id, vec_id)
    SELECT query_id, vec_id, adc_score, rnk FROM (
      SELECT query_id, vec_id, adc_score,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY adc_score DESC, vec_id) AS rnk
      FROM scored)
    WHERE rnk <= 5
    """


@register("sim_ivfpq_topk", oracle=_ivfpq_oracle())
def sim_ivfpq_topk(spark: SparkSession, sf: str) -> DataFrame:
    """IVF-PQ residual top-5 — the production ANN memory layout the PQ
    and IVF docstrings both point to: coarse cell + m residual codes
    per corpus vector; queries probe 2 of 10 coarse cells and score
    candidates as dot(q, coarse centroid) + ADC(residual). Candidates
    come from an equi-join on the probed cell (never the full corpus);
    the oracle rebuilds coarse assignment, residuals, the residual PQ
    codebook, codes, and the two-term score with identical fold
    orders."""
    emb = table(spark, sf, "embeddings")
    queries = emb.filter(
        (F.col("vec_id") % 50 == 0) & (F.col("vec_id") < 2000)
    )
    return similarity.ivfpq_adc_topk(emb, queries, k=5)


# ---------------------------------------------------------------------------
# Observed ingest: metrics ride the landing write (df.observe surface)
# ---------------------------------------------------------------------------
@register(
    "corpus_observed_ingest",
    oracle="""
    WITH m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS rows_seen,
             CAST(SUM(CASE WHEN text IS NOT NULL AND LENGTH(text) >= 200
                               AND lang IN ('en','de','fr','es')
                           THEN 1 ELSE 0 END) AS BIGINT) AS rows_kept,
             CAST(COALESCE(SUM(LENGTH(text)), 0) AS BIGINT) AS chars_seen,
             CAST(SUM(CASE WHEN lang NOT IN ('en','de','fr','es')
                      THEN 1 ELSE 0 END) AS BIGINT) AS dropped_lang
      FROM documents)
    SELECT u.metric, u.value FROM (
      SELECT 'rows_seen' AS metric, rows_seen AS value FROM m
      UNION ALL SELECT 'rows_kept', rows_kept FROM m
      UNION ALL SELECT 'chars_seen', chars_seen FROM m
      UNION ALL SELECT 'dropped_lang', dropped_lang FROM m) u
    """,
)
def corpus_observed_ingest(spark: SparkSession, sf: str) -> DataFrame:
    """Quality-gated landing write with observability counters riding
    the SAME action via ``df.observe`` (``CollectMetrics`` node +
    ``pyspark.sql.Observation``) — no second scan, no separate audit
    job. The keep-gate (non-null text, >=200 chars, Latin-script
    language set) is applied ABOVE the observe node so the counters see
    every input row — rows_kept/dropped_lang count what the gate keeps
    and drops;
    the kept corpus lands in the noop sink (the real sink's stand-in).

    The oracle replays the same aggregates declaratively — attesting
    that metrics collected across executor parallelism equal the
    single-pass SQL truth.
    """
    from dns_log_transformer_spark.operators import profile

    docs = table(spark, sf, "documents")
    latin = ("en", "de", "fr", "es")
    keep = (
        F.col("text").isNotNull()
        & (F.length("text") >= 200)
        & F.col("lang").isin(*latin)
    )
    return profile.observed_write(
        docs,
        keep,
        {
            "rows_seen": F.count(F.lit(1)).cast("long"),
            "rows_kept": F.sum(keep.cast("long")).cast("long"),
            "chars_seen": F.coalesce(
                F.sum(F.length("text")), F.lit(0)
            ).cast("long"),
            "dropped_lang": F.sum(
                (~F.col("lang").isin(*latin)).cast("long")
            ).cast("long"),
        },
    )
