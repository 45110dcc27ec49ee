"""Round-15 additions (VERDICT r14 directives #1, #3, #4).

- ``sim_ivf_tradeoff`` — IVF's tuning query: recall-vs-cost per probed
  cell count at the auto-scaled n_cells, one tagged pass against the
  brute-force truth (the blocking_tradeoff / matryoshka pattern on the
  knob an ANN operator tunes first);
- ``corpus_warcgz_files`` — real ``.warc.gz`` FILES read from disk via
  ``spark.read.format("binaryFile")`` into the attested gz-member
  split + byte walk (the last layer between disk and the stack);
- ``corpus_warcgz_to_shards`` — the north-star capstone: blobs ->
  member split -> payload text -> quality gates -> exact + near dedup
  -> decontamination -> token packing, one funnel row per stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dns_log_transformer_spark.queries.registry import register, table
from dns_log_transformer_spark.queries.round13 import _MB_SUFFIX

_IVF_T_PROBES: tuple[int, ...] = (1, 2, 4, 8)
_IVF_T_K = 5


def _ivf_tradeoff_oracle() -> str:
    # ONE definition of the swept settings/k for both engines (the
    # tradeoff-family drift discipline, ADVICE r13); codebook CTE,
    # cell assignment and probe ranking reuse the exact SQL
    # sim_ann_ivf_topk attests (_IVF_AUTO_CB + the ROW_NUMBER dot
    # ranking); the truth CTE is sim_topk_bruteforce's recipe.
    from dns_log_transformer_spark.queries.llm_ops import _IVF_AUTO_CB, _SQL_DOT

    max_probe = max(_IVF_T_PROBES)
    settings = ", ".join(str(p) for p in _IVF_T_PROBES)
    return f"""
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings),
    {_IVF_AUTO_CB},
    corpus_cell AS (
      SELECT vec_id, cell FROM (
        SELECT e.vec_id, cb.cell,
               ROW_NUMBER() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY {_SQL_DOT.format(a='e.v', b='cb.cv')} DESC,
                          cb.cell) AS rn
        FROM e, cb)
      WHERE rn = 1),
    cell_sizes AS (
      SELECT cell, COUNT(*)::BIGINT AS n_in_cell FROM corpus_cell GROUP BY cell),
    qv AS (SELECT vec_id AS query_id, v AS qv FROM e
           WHERE vec_id % 50 = 0 AND vec_id < 2000),
    probes AS (
      SELECT query_id, cell, CAST(rn AS BIGINT) AS probe_rank FROM (
        SELECT q.query_id, cb.cell,
               ROW_NUMBER() OVER (
                 PARTITION BY q.query_id
                 ORDER BY {_SQL_DOT.format(a='q.qv', b='cb.cv')} DESC,
                          cb.cell) AS rn
        FROM qv q, cb)
      WHERE rn <= {max_probe}),
    truth AS (
      SELECT query_id, vec_id FROM (
        SELECT q.query_id, e.vec_id,
               ROW_NUMBER() OVER (PARTITION BY q.query_id
                 ORDER BY ROUND({_SQL_DOT.format(a='e.v', b='q.qv')}
                   / (sqrt({_SQL_DOT.format(a='e.v', b='e.v')})
                      * sqrt({_SQL_DOT.format(a='q.qv', b='q.qv')})), 4) DESC,
                 e.vec_id) AS rnk
        FROM e, qv q WHERE e.vec_id <> q.query_id)
      WHERE rnk <= {_IVF_T_K}),
    settings AS (SELECT CAST(unnest([{settings}]) AS BIGINT) AS n_probe),
    truth_rank AS (
      SELECT t.query_id, t.vec_id, p.probe_rank
      FROM truth t
      JOIN corpus_cell c ON t.vec_id = c.vec_id
      LEFT JOIN probes p ON p.query_id = t.query_id AND p.cell = c.cell),
    hits AS (
      SELECT s.n_probe,
             (COUNT(*) FILTER (WHERE tr.probe_rank <= s.n_probe))::BIGINT
               AS n_hit
      FROM settings s CROSS JOIN truth_rank tr GROUP BY s.n_probe),
    scanned AS (
      SELECT s.n_probe,
             COALESCE(SUM(p.n_in_cell)
               FILTER (WHERE p.probe_rank <= s.n_probe), 0)::BIGINT
               AS n_scanned
      FROM settings s
      CROSS JOIN (SELECT p.query_id, p.probe_rank, cs.n_in_cell
                  FROM probes p JOIN cell_sizes cs USING (cell)) p
      GROUP BY s.n_probe),
    nq AS (SELECT COUNT(*)::BIGINT AS n_queries FROM qv),
    nc AS (SELECT COUNT(*)::BIGINT AS n_corpus FROM e)
    SELECT s.n_probe, nq.n_queries,
           COALESCE(h.n_hit, 0) AS n_hit,
           CAST((1000 * COALESCE(h.n_hit, 0))
             // ({_IVF_T_K} * nq.n_queries) AS BIGINT) AS recall_milli,
           COALESCE(sc.n_scanned, 0) AS n_scanned,
           CAST((1000 * COALESCE(sc.n_scanned, 0))
             // (nq.n_queries * nc.n_corpus) AS BIGINT) AS scanned_milli
    FROM settings s
    LEFT JOIN hits h USING (n_probe)
    LEFT JOIN scanned sc USING (n_probe), nq, nc
    """


_WGZ_FILES_PER_BLOB = 64  # mini-segments: ~2x64+1 members per file
_WGZ_STAGE_ROOT = "/root/repo/spark-warehouse/warcgz_files"


def _warcgz_files_oracle() -> str:
    from dns_log_transformer_spark.queries.round14 import _warc_gz_oracle

    return _warc_gz_oracle(per_blob=_WGZ_FILES_PER_BLOB)


@register("corpus_warcgz_files", oracle=_warcgz_files_oracle())
def corpus_warcgz_files(spark: SparkSession, sf: str) -> DataFrame:
    """Real ``.warc.gz`` FILES read from disk (VERDICT r14 #3): the
    documents pack is staged ONCE per fixture as actual files — one
    bounded mini-segment per {per_blob} documents, the Common Crawl
    segment shape — then ``spark.read.format("binaryFile")`` feeds the
    attested gz-member split (``parse_warc_gz``) and byte walk
    (``parse_warc_http``). Same first-principles oracle as
    ``corpus_warc_gz`` (documents strlen/md5 — the file layer must add
    NOTHING to the values; blob_id round-trips through the filename).

    Staging is executor-side and atomic (``stage_warc_gz_files``; a
    ``_SUCCESS`` marker gates reuse, so the write happens once per
    fixture per machine — a real user's segments already exist). Plan
    contract (pinned in tests/test_round15.py): the scan is the
    binaryFile source, parse path = scan -> ONE Arrow stage -> codegen
    walk, zero shuffles. Memory bounding at 100 TB is documented at
    :func:`read_warc_gz_files`: binaryFile rows are whole files, so
    segments stay at archive-standard bounded sizes (or are pre-chunked
    on member boundaries — gzip framing makes byte-offset chunking
    safe).
    """
    import os

    from dns_log_transformer_spark.sources import warc

    stage_dir = os.path.join(
        _WGZ_STAGE_ROOT, os.path.basename(os.path.normpath(sf))
    )
    if not os.path.isfile(os.path.join(stage_dir, "_SUCCESS")):
        docs = table(spark, sf, "documents")
        blobs = warc.pack_warc_gz_blobs(
            docs, per_blob=_WGZ_FILES_PER_BLOB, body_suffix=_MB_SUFFIX
        )
        warc.stage_warc_gz_files(blobs, stage_dir)
    members = warc.parse_warc_gz(warc.read_warc_gz_files(spark, stage_dir))
    return warc.parse_warc_http(members, blob_col="rec_bytes", max_records=1)


@register("sim_ivf_tradeoff", oracle=_ivf_tradeoff_oracle())
def sim_ivf_tradeoff(spark: SparkSession, sf: str) -> DataFrame:
    """IVF's tuning query (VERDICT r14 #4): one recall-vs-cost row per
    probed-cell count (n_probe in {1,2,4,8} at the auto-scaled
    ~sqrt(n) cell count) — ``sim_ann_ivf_topk`` ships n_probe=2; this
    row set shows what deeper probing buys and what it costs, from ONE
    tagged pass (the probe RANK is the tag: a setting reaches exactly
    the cells ranked <= n_probe, so assignment and the brute-force
    truth each run once; see operators/similarity.py ivf_tradeoff for
    why no per-setting candidate re-ranking is needed). recall_milli =
    exact integer milli of retrieved true top-k pairs; scanned_milli =
    the cost axis, the fraction of corpus rows a query's probes read.
    """
    from dns_log_transformer_spark.operators import similarity

    emb = table(spark, sf, "embeddings")
    queries = emb.filter((F.col("vec_id") % 50 == 0) & (F.col("vec_id") < 2000))
    return similarity.ivf_tradeoff(
        emb, queries, k=_IVF_T_K, n_probes=_IVF_T_PROBES
    )
