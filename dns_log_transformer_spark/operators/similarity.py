"""Similarity search over embedding columns (array<float>).

Two paths, per the standard ANN playbook:
- brute-force cosine top-k — the exact baseline: broadcast the (small)
  query set against the corpus, one pass, window top-k per query. Scales
  linearly in corpus size; right answer for <= a few thousand queries.
- random-hyperplane LSH — the scale path: 16 signed projections bucket
  each vector into a 16-bit key; candidates share a bucket, so search is
  an equi-join instead of a cross join. Projection is a numpy matmul in
  an Arrow-batched pandas UDF (the one place Python beats SQL here).

Dot products are a *sequential left fold in array order* on both engines
so floats match bit-for-bit: DuckDB's list_sum folds left-to-right, and
the Spark side reproduces that exact order two ways — `dot` as a Catalyst
zip_with+aggregate fold (reference semantics, interpreted => slow), and
`dot_pd` as an Arrow pandas UDF that vectorizes ACROSS rows while looping
dims IN ORDER (`acc += a[:, d] * b[:, d]`), i.e. the identical fp
operation sequence per pair at numpy speed (~50x). The hot paths use
dot_pd; `dot` remains as the pure-SQL statement of the semantics.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T

EMBEDDING_DIM = 64
NUM_PLANES = 16


def _bc(value):
    """sc.broadcast for codebook-sized state captured by pandas UDFs.

    A codebook embedded directly in a UDF closure is serialized into
    every task; at k ~ sqrt(n) cells on a real corpus that is megabytes
    per task. A broadcast ships it once per executor and the closure
    carries only the handle."""
    from pyspark.sql import SparkSession

    sess = SparkSession.getActiveSession()
    return sess.sparkContext.broadcast(value)


def _as_double(col: Column) -> Column:
    return col.cast("array<double>")


def _round_half_up(x: np.ndarray, decimals: int = 4) -> np.ndarray:
    """Round half AWAY FROM ZERO, matching DuckDB ROUND (and Spark
    F.round) on doubles — np.round is banker's (half-even), which flips
    values landing on a .5 midpoint at the target decimal (0.00025 ->
    0.0002 instead of DuckDB's 0.0003) and would break oracle parity.
    Verified against DuckDB ROUND on midpoint probes either side of 0."""
    scale = 10.0**decimals
    return np.copysign(np.floor(np.abs(x) * scale + 0.5), x) / scale


def dot(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product (deterministic fp order)."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


@F.pandas_udf(T.DoubleType())
def dot_pd(a: pd.Series, b: pd.Series) -> pd.Series:
    """Batch dot product with the same fp result as `dot`: float64
    multiply-adds applied dimension-by-dimension in array order (the
    vectorization is across rows, so each pair's summation order is the
    sequential fold both Catalyst's aggregate() and DuckDB's list_sum
    use)."""
    am = np.vstack(a.to_numpy()).astype(np.float64)
    bm = np.vstack(b.to_numpy()).astype(np.float64)
    acc = np.zeros(am.shape[0], dtype=np.float64)
    for d in range(am.shape[1]):
        acc = acc + am[:, d] * bm[:, d]
    return pd.Series(acc)


def with_norm(df: DataFrame, vec_col: str = "embedding", out: str = "nrm") -> DataFrame:
    """Precompute each vector's L2 norm ONCE (not once per pair — at n^2
    pair count that is the difference between 2 and 6 folds per pair)."""
    return df.withColumn(out, F.sqrt(dot_pd(F.col(vec_col), F.col(vec_col))))


def brute_force_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Exact cosine top-k: corpus x broadcast(queries) -> cosine ->
    row_number <= k. Ranking uses the cosine *rounded to 4 decimals* with
    the candidate id as tie-break — a total order both engines agree on
    (raw float ranks could flip on last-bit differences).

    ``keep_cols``: extra CORPUS columns carried through scoring and the
    top-k window (narrow payloads only — they ride every scored row
    through the per-query shuffle). Cheaper than joining them back for
    consumers like the k-NN label vote, which would otherwise pay a
    second full corpus scan for a |Q| x k lookup (r10, the
    emb_knn_label bench triage).

    Output: (query_id, vec_id, cos_sim, rnk[, *keep_cols]).
    """
    q = with_norm(queries, vec_col, "q_nrm").select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"), "q_nrm"
    )
    c = with_norm(emb.select(id_col, vec_col, *keep_cols), vec_col)
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            id_col,
            F.round(
                dot_pd(F.col(vec_col), F.col("q_vec")) / (F.col("nrm") * F.col("q_nrm")),
                4,
            ).alias("cos_sim"),
            *keep_cols,
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc(id_col))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", id_col, "cos_sim", "rnk", *keep_cols)
    )


def lsh_planes(num_planes: int = NUM_PLANES, dim: int = EMBEDDING_DIM) -> list[list[int]]:
    """Deterministic ±1 hyperplanes: sign p,i = parity of the first hex
    nibble of md5('<p>_<i>'). Engine-independent, so the DuckDB oracle can
    inline the same planes as literals."""
    return [
        [
            1 if int(hashlib.md5(f"{p}_{i}".encode()).hexdigest()[0], 16) % 2 == 0 else -1
            for i in range(dim)
        ]
        for p in range(num_planes)
    ]


def with_lsh_bucket(
    emb: DataFrame,
    num_planes: int = NUM_PLANES,
    dim: int = EMBEDDING_DIM,
    vec_col: str = "embedding",
) -> DataFrame:
    """Adds ``lsh_key``: bit p = 1 iff dot(vec, plane_p) > 0, packed into
    an int. Vectorized: one numpy (batch x dim) @ (dim x planes) matmul
    per Arrow batch — the pandas-UDF fast path, ~100x a per-row UDF."""
    planes = np.array(lsh_planes(num_planes, dim), dtype=np.float64).T  # dim x p
    weights = (1 << np.arange(num_planes)).astype(np.int64)

    @F.pandas_udf(T.IntegerType())
    def bucket(v: pd.Series) -> pd.Series:
        mat = np.vstack(v.to_numpy()).astype(np.float64)  # batch x dim
        bits = (mat @ planes) > 0  # batch x planes
        return pd.Series((bits @ weights).astype(np.int32))

    return emb.withColumn("lsh_key", bucket(F.col(vec_col)))


def ann_topk_lsh(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = NUM_PLANES,
    dim: int = EMBEDDING_DIM,
    probe_bits: int = 0,
) -> DataFrame:
    """Approximate top-k: candidates = corpus vectors in the query's LSH
    bucket (equi-join on lsh_key — no cross join), then exact cosine +
    window top-k within candidates. This is the 100 TB shape (bucket
    join ~ O(n)).

    Recall tuning: ``probe_bits=b`` enables multi-probe — each query
    probes its own bucket PLUS every bucket within Hamming distance b
    (single- and double-bit flips), i.e. the buckets a vector lands in
    when one or two hyperplane decisions are marginal. Probes explode
    ONLY the (small) query side — the corpus keeps one bucket per vector
    and the join stays an equi-join, so cost is sum(C(num_planes, i))
    probe rows per query (9 at b=1, 37 at b=2 with 8 planes), not a
    corpus blow-up. Deeper probing (distance 3+) grows combinatorially;
    prefer fewer planes instead. Norms are computed before the probe
    explode (once per query, not once per probe).

    Measured recall@5 vs brute force on the sf0.1 fixtures (random
    embeddings, worst case) at 8 planes: 0.025 exact-bucket -> 0.12 at
    probe_bits=1 -> 0.325 at probe_bits=2; floors pinned by
    tests/test_ann.py (bit-deterministic, not statistical).
    """
    if probe_bits not in (0, 1, 2):
        raise ValueError("probe_bits must be 0 (exact), 1, or 2 (Hamming<=2)")
    c = with_norm(with_lsh_bucket(emb, num_planes, dim, vec_col), vec_col)
    q0 = with_norm(with_lsh_bucket(queries, num_planes, dim, vec_col), vec_col, "q_nrm")
    if probe_bits >= 1:
        masks = [0] + [1 << p for p in range(num_planes)]
        if probe_bits == 2:
            masks += [
                (1 << p) | (1 << r)
                for p in range(num_planes)
                for r in range(p + 1, num_planes)
            ]
        probes = F.array(
            *[F.col("lsh_key").bitwiseXOR(F.lit(m)) for m in masks]
        )
        q0 = q0.select(
            id_col, vec_col, "q_nrm", F.explode(probes).alias("probe_key")
        ).withColumnRenamed("probe_key", "lsh_key")
    q = q0.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        "q_nrm",
        "lsh_key",
    )
    scored = (
        c.join(q, "lsh_key")
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            id_col,
            F.round(
                dot_pd(F.col(vec_col), F.col("q_vec")) / (F.col("nrm") * F.col("q_nrm")),
                4,
            ).alias("cos_sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc(id_col))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", id_col, "cos_sim", "rnk")
    )


def embedding_centroids(
    emb: DataFrame,
    n_groups: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-group embedding centroid via grouped-map ``applyInPandas`` —
    the IVF coarse-quantizer building block (assign -> average). One
    numpy mean per group, Arrow both ways; rows are sorted by id inside
    the UDF so float summation order is deterministic for the oracle.

    Output: (grp, dim, centroid) — one row per group x dimension, the
    flat shape both engines hash identically.
    """

    def centroid(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col)
        mat = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
        mean = mat.mean(axis=0)
        return pd.DataFrame(
            {
                "grp": pdf["grp"].iloc[0],
                "dim": np.arange(mat.shape[1], dtype=np.int32),
                "centroid": _round_half_up(mean, 4),
            }
        )

    return (
        emb.withColumn("grp", (F.col(id_col) % n_groups).cast("int"))
        .groupBy("grp")
        .applyInPandas(centroid, "grp int, dim int, centroid double")
    )


def _require_rows(rows: list, op: str) -> list:
    """Clear empty-input contract for the codebook-learning family: ops
    that LEARN parameters from data (seed centroids, k-means, PQ) raise
    a descriptive error on an empty corpus instead of an opaque numpy
    one; pure transforms elsewhere return empty results instead."""
    if not rows:
        raise ValueError(f"{op}: input has no rows (cannot build a codebook)")
    return rows


def auto_n_cells(n_rows: int, floor: int = 10) -> int:
    """The IVF sizing rule: ``n_cells ~ sqrt(n)`` (half-up rounded,
    floored at ``floor``) keeps per-cell occupancy AND per-query probed
    candidates both growing as sqrt(corpus) instead of one of them
    linearly — the standard FAISS guidance. Deterministic and cheap to
    mirror in SQL (``GREATEST(floor, CAST(FLOOR(SQRT(COUNT(*)) + 0.5)
    AS INT))``): libm sqrt is correctly rounded, so both engines pick
    the identical count. Callers pass ``n_cells=None`` to opt in."""
    import math

    return max(floor, int(math.floor(math.sqrt(n_rows) + 0.5)))


def centroid_vectors(
    emb: DataFrame,
    n_cells: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(cell, centroid array<double>) codebook — deterministic seed
    partition (id % n_cells) + per-cell mean via applyInPandas. One
    k-means-style averaging step; production IVF would iterate, the
    plumbing is identical."""

    def centroid(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col)
        mat = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
        return pd.DataFrame(
            {"cell": [int(pdf["cell"].iloc[0])], "centroid": [mat.mean(axis=0)]}
        )

    return (
        emb.withColumn("cell", (F.col(id_col) % n_cells).cast("int"))
        .groupBy("cell")
        .applyInPandas(centroid, "cell int, centroid array<double>")
    )


def _cell_assigner(codebook: list[tuple[int, np.ndarray]], n_probe: int):
    """pandas UDF factory: vector -> its n_probe nearest cells (by dot
    with the broadcast codebook — O(cells) driver-side state, standard
    IVF practice; the corpus itself never leaves the executors).

    Scores accumulate dimension-by-dimension in array order (the same
    sequential fold as dot_pd / DuckDB list_sum — a BLAS matmul's
    blocked fp order would differ in the last ulp and could flip probe
    choices near ties against the oracle); ties order by lowest cell id
    (stable argsort == ORDER BY score DESC, cell ASC)."""
    cells = np.array([c for c, _ in codebook])
    order0 = np.argsort(cells)
    bc = _bc(
        (
            cells[order0],
            np.vstack([v for _, v in codebook]).astype(np.float64)[order0],
        )
    )

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def probe_cells(v: pd.Series) -> pd.Series:
        cells, mat = bc.value
        vecs = np.vstack(v.to_numpy()).astype(np.float64)
        scores = np.zeros((vecs.shape[0], mat.shape[0]), dtype=np.float64)
        for d in range(vecs.shape[1]):
            scores = scores + np.outer(vecs[:, d], mat[:, d])
        order = np.argsort(-scores, axis=1, kind="stable")[:, :n_probe]
        return pd.Series([cells[row].astype("int32").tolist() for row in order])

    return probe_cells


def ann_topk_ivf(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int | None = 10,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_iters: int = 0,
) -> DataFrame:
    """IVF approximate top-k: corpus vectors live in their single nearest
    cell; each query probes its n_probe nearest cells; exact cosine +
    window top-k run inside the probed cells only (an equi-join on cell —
    ~n_probe/n_cells of the corpus per query instead of all of it).

    ``n_cells=None`` auto-scales to :func:`auto_n_cells` (~sqrt(n), one
    cheap count job) so per-cell work stays flat as the corpus grows —
    the documented fix for the fixed-cell 10x readings in PLANS.md.

    ``train_iters > 0`` refines the seed codebook with that many Lloyd
    rounds (:func:`kmeans_codebook`) before building the index — tighter
    cells, same query plan.

    Measured recall@5 vs brute force on the sf0.1 fixtures (random
    embeddings, worst case): 0.39 @ n_probe=2, 0.69 @ n_probe=5, 0.91 @
    n_probe=8 of 10 cells; 2 Lloyd rounds lift n_probe=2 to 0.47.
    Floors pinned by tests/test_ann.py (bit-deterministic).

    Output: (query_id, vec_id, cos_sim, rnk).
    """
    if n_cells is None:
        n_cells = auto_n_cells(emb.count())
    if train_iters > 0:
        codebook = list(
            enumerate(kmeans_codebook(emb, n_cells, train_iters, id_col, vec_col))
        )
    else:
        # seed codebook = pq_codebook's recipe (ONE definition of the
        # 4-decimal HALF_UP rounding that keeps oracles bit-identical)
        cells0, mat0 = pq_codebook(emb, n_cells, id_col, vec_col)
        codebook = [(int(c), mat0[i]) for i, c in enumerate(cells0)]
    assign1 = _cell_assigner(codebook, 1)
    assignp = _cell_assigner(codebook, n_probe)

    c = with_norm(emb.select(id_col, vec_col), vec_col).withColumn(
        "cell", F.element_at(assign1(F.col(vec_col)), 1)
    )
    q = with_norm(queries.select(id_col, vec_col), vec_col, "q_nrm").select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        "q_nrm",
        F.explode(assignp(F.col(vec_col))).alias("cell"),
    )
    scored = (
        c.join(q, "cell")
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            id_col,
            F.round(
                dot_pd(F.col(vec_col), F.col("q_vec")) / (F.col("nrm") * F.col("q_nrm")),
                4,
            ).alias("cos_sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc(id_col))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", id_col, "cos_sim", "rnk")
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ): compress vectors to m small codes, search via
# asymmetric distance (ADC) — the memory-side scale lever (Jégou et al. 2011)
# ---------------------------------------------------------------------------

PQ_SUBSPACES = 8
PQ_CELLS = 16


def pq_codebook(
    emb: DataFrame,
    n_cells: int = PQ_CELLS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[np.ndarray, np.ndarray]:
    """(cells, centroids) for PQ: the deterministic seed-partition
    centroids (id % n_cells, per-dim mean rounded to 4 decimals — the
    recipe the SemDeDup/IVF oracles already attest). Production PQ
    trains one codebook per subspace with k-means; the seed codebook
    keeps every downstream decision oracle-reproducible while the
    plumbing (slice -> nearest-cell per subspace) is identical.

    Driver state: n_cells x dim doubles — codebook-sized, like IVF.
    """
    rows = _require_rows(
        centroid_vectors(emb, n_cells, id_col, vec_col)
        .select(
            "cell",
            F.transform("centroid", lambda x: F.round(x, 4)).alias("centroid"),
        )
        .collect(),
        "pq_codebook",
    )
    rows.sort(key=lambda r: r["cell"])
    cells = np.array([r["cell"] for r in rows], dtype=np.int32)
    mat = np.vstack([np.array(r["centroid"], dtype=np.float64) for r in rows])
    return cells, mat


def pq_encode(
    emb: DataFrame,
    codebook: tuple[np.ndarray, np.ndarray],
    m: int = PQ_SUBSPACES,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(id, code array<int> of length m): each vector's subvector s maps
    to its nearest codebook cell by squared L2 over that subspace's dims.

    This is the 32x compression that makes billion-vector search fit in
    memory: m bytes of code per vector instead of dim floats; the full
    vectors never need to be co-resident with the index again. One
    broadcast-codebook pandas UDF pass, no shuffle.

    Determinism for the oracle: per-subspace distances accumulate
    dimension-by-dimension in array order (the list_sum fold), ties
    break to the lowest cell (stable argmin == ORDER BY dist, cell).
    """
    cells, mat = codebook
    dim = mat.shape[1]
    if dim % m:
        raise ValueError(f"pq_encode: dim {dim} not divisible by m={m}")
    d_sub = dim // m
    bc = _bc((cells, mat))

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def encode(v: pd.Series) -> pd.Series:
        cells, mat = bc.value
        X = np.vstack(v.to_numpy()).astype(np.float64)
        n = X.shape[0]
        codes = np.empty((n, m), dtype=np.int32)
        for s in range(m):
            D = np.zeros((n, mat.shape[0]), dtype=np.float64)
            for d in range(s * d_sub, (s + 1) * d_sub):
                diff = X[:, d][:, None] - mat[:, d][None, :]
                D = D + diff * diff
            codes[:, s] = cells[np.argmin(D, axis=1)]
        return pd.Series(list(codes))

    return emb.select(
        F.col(id_col),
        *[F.col(c) for c in keep_cols],
        encode(F.col(vec_col)).alias("code"),
    )


def pq_adc_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    m: int = PQ_SUBSPACES,
    n_cells: int = PQ_CELLS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Asymmetric-distance top-k: the corpus is its PQ CODES only; each
    query precomputes an (m x n_cells) inner-product lookup table
    against the codebook, and a document's score is the m-term sum of
    table lookups — dim multiply-adds per (query, doc) collapse to m
    additions over data 32x smaller than the raw vectors. Linear scan
    over codes x broadcast(query LUTs); at corpus scale the scan rides
    inside an IVF cell (IVF-PQ), same plumbing.

    Determinism: LUT entries fold dimension-by-dimension in array
    order; the score folds subspaces in order s=0..m-1 (mirrored in the
    oracle as list_sum over sub-ordered lists); ranking is on the
    4-decimal-rounded score with id tie-break.

    Measured recall@5 vs brute force on the sf0.1 fixtures: 0.125 (50x
    chance) — random vectors under a seed codebook are the quantization
    worst case; floor pinned by tests/test_ann.py. Trained codebooks
    and IVF-PQ residual encoding are the production recall levers.

    Output: (query_id, vec_id, adc_score, rnk).
    """
    codebook = pq_codebook(emb, n_cells, id_col, vec_col)
    cells, mat = codebook
    if len(cells) != n_cells or not np.array_equal(cells, np.arange(n_cells)):
        raise ValueError("pq_adc_topk: codebook cells must be dense 0..n_cells-1")
    dim = mat.shape[1]
    d_sub = dim // m
    bc = _bc(mat)

    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def lut(v: pd.Series) -> pd.Series:
        mat = bc.value
        X = np.vstack(v.to_numpy()).astype(np.float64)
        n = X.shape[0]
        out = np.zeros((n, m * n_cells), dtype=np.float64)
        for s in range(m):
            for ci in range(n_cells):
                acc = np.zeros(n, dtype=np.float64)
                for d in range(s * d_sub, (s + 1) * d_sub):
                    acc = acc + X[:, d] * mat[ci, d]
                out[:, s * n_cells + ci] = acc
        return pd.Series(list(out))

    @F.pandas_udf(T.DoubleType())
    def adc(code: pd.Series, lut_col: pd.Series) -> pd.Series:
        C = np.vstack(code.to_numpy())
        L = np.vstack(lut_col.to_numpy())
        acc = np.zeros(C.shape[0], dtype=np.float64)
        for s in range(m):  # subspace-ordered fold, mirrors list_sum
            acc = acc + L[np.arange(C.shape[0]), s * n_cells + C[:, s]]
        return pd.Series(acc)

    codes = pq_encode(emb, codebook, m, id_col, vec_col)
    q = queries.select(
        F.col(id_col).alias("query_id"), lut(F.col(vec_col)).alias("_lut")
    )
    scored = (
        codes.crossJoin(F.broadcast(q))
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            id_col,
            F.round(adc(F.col("code"), F.col("_lut")), 4).alias("adc_score"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("adc_score"), F.asc(id_col))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", id_col, "adc_score", "rnk")
    )


def plan_blocks(n_vectors: int, block_rows: int = 4096, min_blocks: int = 8) -> int:
    """Pick the row-block count for the exact all-pairs tiling.

    Each block is packed into ONE row (collect_list of ids + vectors), so
    block size is the binding constraint, not block count:
    - a block row is ~block_rows x dim x 8 bytes (2 MB at dim=64) — far
      under Spark's 2 GB row/column limits at any corpus size;
    - a tile materializes a block_rows^2 float64 matrix (128 MB at the
      4096 default) per task.
    Blocks therefore scale WITH the corpus (n / block_rows) instead of a
    fixed count whose per-block size grows unboundedly; min_blocks keeps
    enough tiles for parallelism on small corpora.
    """
    import math

    return max(min_blocks, math.ceil(max(n_vectors, 1) / block_rows))


def embedding_neardup_pairs(
    emb: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_rows: int = 4096,
) -> DataFrame:
    """Embedding-cosine near-dup pairs >= threshold — exact, via blocked
    matrix products: vectors are grouped into n_blocks row-blocks, the
    B(B+1)/2 block pairs fan out as rows, and each task computes its
    (n/B x n/B) cosine tile with numpy. Arrow moves each vector B times
    (not once per pair), and the tile accumulates dimension-by-dimension
    in array order (`C += a[:,d] (x) b[:,d]`) so every pair's dot product
    is the same sequential fold the DuckDB oracle's list_sum performs —
    bit-identical results at matmul speed.

    Still O(n^2) work by definition (exact all-pairs); the LSH/IVF paths
    are the sub-quadratic alternatives at corpus scale.

    Block count is derived from the corpus size (see ``plan_blocks``) so
    a packed block row stays ~block_rows vectors regardless of n — the
    count() here is one cheap extra job against O(n^2) tile work.
    Output: (id_a, id_b, cos_sim).
    """
    n_blocks = plan_blocks(emb.count(), block_rows=block_rows)
    packed = (
        emb.select(
            (F.col(id_col) % n_blocks).cast("int").alias("blk"),
            F.col(id_col).alias("vid"),
            _as_double(F.col(vec_col)).alias("v"),
        )
        .groupBy("blk")
        .agg(
            F.collect_list("vid").alias("ids"),
            F.collect_list("v").alias("vecs"),
        )
    )
    a = packed.select(
        F.col("blk").alias("blk_a"), F.col("ids").alias("ids_a"), F.col("vecs").alias("vecs_a")
    )
    b = packed.select(
        F.col("blk").alias("blk_b"), F.col("ids").alias("ids_b"), F.col("vecs").alias("vecs_b")
    )
    tiles = a.crossJoin(b).filter(F.col("blk_a") <= F.col("blk_b"))

    def tile_pairs(batches):
        for pdf in batches:
            out_a, out_b, out_c = [], [], []
            for _, row in pdf.iterrows():
                ids_a = np.asarray(row["ids_a"], dtype=np.int64)
                ids_b = np.asarray(row["ids_b"], dtype=np.int64)
                va = np.vstack(row["vecs_a"]).astype(np.float64)
                vb = np.vstack(row["vecs_b"]).astype(np.float64)
                dim = va.shape[1]
                dots = np.zeros((len(ids_a), len(ids_b)), dtype=np.float64)
                na = np.zeros(len(ids_a), dtype=np.float64)
                nb = np.zeros(len(ids_b), dtype=np.float64)
                for d in range(dim):  # sequential fold order per pair
                    dots = dots + np.outer(va[:, d], vb[:, d])
                    na = na + va[:, d] * va[:, d]
                    nb = nb + vb[:, d] * vb[:, d]
                cos = dots / np.outer(np.sqrt(na), np.sqrt(nb))
                if row["blk_a"] == row["blk_b"]:
                    # diagonal tile: both sides hold the same ids — keep
                    # each unordered pair once via the id order
                    mask = (ids_a[:, None] < ids_b[None, :]) & (cos >= threshold)
                else:
                    # off-diagonal tile: ids interleave across blocks (blk
                    # = id % B), so a pair may sit in either orientation;
                    # the tile itself is unique (blk_a < blk_b), emit all
                    # qualifying cells normalized to (min, max)
                    mask = cos >= threshold
                ai, bi = np.nonzero(mask)
                pa, pb = ids_a[ai], ids_b[bi]
                out_a.append(np.minimum(pa, pb))
                out_b.append(np.maximum(pa, pb))
                out_c.append(_round_half_up(cos[ai, bi], 4))
            yield pd.DataFrame(
                {
                    "id_a": np.concatenate(out_a) if out_a else [],
                    "id_b": np.concatenate(out_b) if out_b else [],
                    "cos_sim": np.concatenate(out_c) if out_c else [],
                }
            )

    return tiles.mapInPandas(tile_pairs, "id_a bigint, id_b bigint, cos_sim double")


# ---------------------------------------------------------------------------
# Semantic dedup (SemDeDup-style: cluster, then dedup within cluster)
# ---------------------------------------------------------------------------


def _nearest_cell(codebook: list[tuple[int, np.ndarray]]):
    """pandas UDF: vector -> single nearest cell by cosine against the
    broadcast codebook. Scores accumulate dimension-by-dimension in array
    order (the same sequential fold as `dot`/DuckDB list_sum) so the
    assignment — including its fp behavior near ties — is reproducible by
    the oracle; exact ties break toward the lowest cell id (np.argmax
    first-match == ORDER BY score DESC, cell ASC)."""
    cells = np.array([c for c, _ in codebook])
    order = np.argsort(cells)
    cells = cells[order]
    mat = np.vstack([v for _, v in codebook]).astype(np.float64)[order]
    cnorm = np.zeros(mat.shape[0], dtype=np.float64)
    for d in range(mat.shape[1]):
        cnorm = cnorm + mat[:, d] * mat[:, d]
    bc = _bc((cells, mat, np.sqrt(cnorm)))

    @F.pandas_udf(T.IntegerType())
    def nearest(v: pd.Series) -> pd.Series:
        cells, mat, cnorm = bc.value
        vecs = np.vstack(v.to_numpy()).astype(np.float64)
        scores = np.zeros((vecs.shape[0], mat.shape[0]), dtype=np.float64)
        for d in range(vecs.shape[1]):
            scores = scores + np.outer(vecs[:, d], mat[:, d])
        scores = scores / cnorm  # |v| is constant per row: argmax unchanged
        return pd.Series(cells[np.argmax(scores, axis=1)].astype("int32"))

    return nearest


def semantic_dedup_pairs(
    emb: DataFrame,
    n_cells: int = 10,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): cluster the corpus, then enumerate
    near-duplicate pairs ONLY within each cluster — the clustering-based
    scale path for embedding dedup (vs the hash-based LSH path).

    Codebook = per-cell mean of a deterministic seed partition
    (id % n_cells), rounded to 4 decimals so both engines continue from
    bit-identical centroids. Assignment is one broadcast-codebook pandas
    UDF pass (O(cells) driver state, corpus never collected); the pair
    join shuffles on the cell key only.

    Scale: within-cell pairs are (n/c)^2 * c = n^2/c — grow n_cells with
    the corpus (SemDeDup uses ~sqrt(n) clusters) to bound cell size, and
    the clusters a real run uses come from k-means; the seed-partition
    codebook keeps this deterministic for the oracle while exercising
    the identical plan shape.

    Output: (cell, id_a, id_b, cos_sim >= threshold).
    """
    codebook_df = centroid_vectors(emb, n_cells, id_col, vec_col).select(
        "cell", F.transform("centroid", lambda x: F.round(x, 4)).alias("centroid")
    )
    codebook = [
        (int(r["cell"]), np.array(r["centroid"], dtype=np.float64))
        for r in _require_rows(codebook_df.collect(), "semantic_dedup_pairs")
    ]
    assigned = emb.select(
        F.col(id_col),
        _as_double(F.col(vec_col)).alias("_v"),
        _nearest_cell(codebook)(F.col(vec_col)).alias("cell"),
    )

    # Within-cell pairs as ONE grouped gram matrix per cell instead of a
    # cell self-join: the join shuffles every vector twice, re-derives
    # the assignment UDF on both sides, and materializes m^2 pair rows
    # carrying two 64-dim arrays each before computing cosine. Here each
    # vector shuffles once and only qualifying (id_a, id_b, cos) rows
    # materialize. fp parity with the oracle is preserved because the
    # gram matrix accumulates dimension-by-dimension in array order
    # (acc += outer(V[:,d], V[:,d]) — per pair the identical sequential
    # fold as dot_pd/list_sum), norms come off its diagonal (same fold
    # as dot(a,a)), and the denominator is one multiply per pair. The
    # group-fits-in-a-worker bound is the same cell-size bound the pair
    # join's (cell) shuffle partition already imposed — and the SemDeDup
    # contract (cells ~sqrt(n)) is what bounds cells.
    def cell_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col)
        ids = pdf[id_col].to_numpy()
        V = np.vstack(pdf["_v"].to_numpy()).astype(np.float64)
        m = V.shape[0]
        gram = np.zeros((m, m), dtype=np.float64)
        for d in range(V.shape[1]):
            col = V[:, d]
            gram = gram + np.outer(col, col)
        nrm = np.sqrt(np.diag(gram))
        cos = _round_half_up(gram / np.outer(nrm, nrm), 4)
        ia, ib = np.triu_indices(m, k=1)
        keep = cos[ia, ib] >= threshold
        return pd.DataFrame(
            {
                "cell": np.full(int(keep.sum()), pdf["cell"].iloc[0]),
                "id_a": ids[ia[keep]],
                "id_b": ids[ib[keep]],
                "cos_sim": cos[ia, ib][keep],
            }
        )

    return assigned.groupBy("cell").applyInPandas(
        cell_pairs, "cell int, id_a long, id_b long, cos_sim double"
    )


def _argmin_assigner(codebook: list[np.ndarray]):
    """pandas UDF factory: vector -> index of the nearest centroid by
    squared L2, accumulated dimension-by-dimension in array order (the
    same sequential fold DuckDB's list_sum uses, so assignment decisions
    are bit-reproducible for the oracle). Ties resolve to the lowest
    cell (np.argmin first occurrence)."""
    bc = _bc([np.asarray(c, dtype=np.float64) for c in codebook])

    @F.pandas_udf(T.IntegerType())
    def assign(v: pd.Series) -> pd.Series:
        cents = bc.value
        vecs = np.vstack(v.to_numpy()).astype(np.float64)
        dists = np.empty((vecs.shape[0], len(cents)), dtype=np.float64)
        for ci, c in enumerate(cents):
            acc = np.zeros(vecs.shape[0], dtype=np.float64)
            for d in range(vecs.shape[1]):
                diff = vecs[:, d] - c[d]
                acc = acc + diff * diff
            dists[:, ci] = acc
        return pd.Series(np.argmin(dists, axis=1).astype("int32"))

    return assign


def kmeans_codebook(
    emb: DataFrame,
    k: int = 8,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[np.ndarray]:
    """Run ``n_iter`` Lloyd rounds and return the trained codebook
    (index = cell id).

    Scale shape: the codebook (k x dim doubles) is the ONLY driver-side
    state — the IVF-codebook pattern; the corpus never leaves the
    executors. Each round is one narrow assignment pass plus one
    posexplode + partial/final average (a single shuffle on (cell, dim),
    k*dim result rows), so lineage stays flat across rounds — every
    round's plan reads `emb` directly with a fresh broadcast codebook,
    no iterative plan nesting (cf. PLANS.md on iterative lineage).

    Deterministic for the DuckDB oracle: init = the k lowest-id vectors;
    squared-L2 folded in array order; argmin ties -> lowest cell;
    updated centroids rounded to 4 decimals; empty cells keep their
    previous centroid.
    """
    # NOTE: deliberately NOT rebalance_for_fanout'd — measured 3x SLOWER
    # when applied here (24.9s vs 7.9s cold at sf0.1): per-row compute is
    # small (64 dims x k cells), so 32-way pandas-UDF worker spin-up
    # dominates; real multi-file corpora scan well-split anyway.
    e = emb.select(id_col, _as_double(F.col(vec_col)).alias("v"))
    init = e.orderBy(id_col).limit(k).collect()
    codebook = [np.asarray(r["v"], dtype=np.float64) for r in init]
    if not codebook:
        raise ValueError("kmeans_codebook: input has no rows")
    k = len(codebook)  # corpus smaller than k -> one cell per vector
    for _ in range(n_iter):
        assigned = e.withColumn("cell", _argmin_assigner(codebook)(F.col("v")))
        # DECIMAL sum (exact, combine-order-independent) instead of
        # F.avg over doubles: partial-aggregation merge order is
        # nondeterministic, and a mean landing near a 0.00005 boundary
        # could flip the 4-decimal rounding run-to-run (the q7/q15
        # precedent, PLANS.md rule 5). |x| <= ~1 so decimal(27,14)
        # holds ~1e13 rows per (cell, dim) without overflow.
        stats = (
            assigned.select("cell", F.posexplode("v").alias("dim", "x"))
            .groupBy("cell", "dim")
            .agg(
                F.round(
                    F.sum(F.col("x").cast("decimal(27,14)")).cast("double")
                    / F.count("x"),
                    4,
                ).alias("cd")
            )
            .collect()
        )
        upd: dict[int, np.ndarray] = {}
        for r in stats:
            upd.setdefault(r["cell"], np.zeros(len(codebook[0])))[r["dim"]] = r["cd"]
        codebook = [upd.get(i, codebook[i]) for i in range(k)]
    return codebook


def kmeans_assign(
    emb: DataFrame,
    k: int = 8,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Lloyd's k-means over an embedding column; returns the final
    (id, cell) assignment against the trained codebook (see
    :func:`kmeans_codebook` for the scale/determinism contract)."""
    codebook = kmeans_codebook(emb, k, n_iter, id_col, vec_col)
    e = emb.select(id_col, _as_double(F.col(vec_col)).alias("v"))
    return (
        e.withColumn("cell", _argmin_assigner(codebook)(F.col("v")))
        .select(id_col, "cell")
    )


# ---------------------------------------------------------------------------
# Scalar (int8) quantization: 4x smaller vectors, integer-exact scoring
# ---------------------------------------------------------------------------
def knn_predict_labels(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """k-NN label propagation: each query takes the majority label of
    its k exact-cosine nearest neighbors — the standard weak-labeling /
    dataset-audit pass (predict a label for unlabeled or held-out
    points from their neighborhood).

    Composition of attested pieces: :func:`brute_force_topk` supplies
    the deterministic neighbor set (rounded cosine, id tie-break) and
    CARRIES the neighbor's label through the top-k (keep_cols — one
    corpus scan total; the r9 shape re-scanned the corpus and joined
    the broadcast |Q| x k neighbor rows back just to fetch k labels
    per query, which benched at ~1.4-1.6 s vs ~1.0 s for this form);
    the vote is two bounded aggregations over |Q| x k rows. Vote ties:
    highest count, then smallest label (max_by on
    struct(n_votes, -label) — a total order).

    Output: (query_id, pred_label, n_votes).
    """
    nn = brute_force_topk(
        emb, queries, k, id_col, vec_col, keep_cols=(label_col,)
    )
    votes = nn.groupBy("query_id", label_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_votes")
    )
    best = votes.groupBy("query_id").agg(
        F.max_by(
            F.struct(F.col(label_col).alias("lab"), F.col("n_votes")),
            F.struct(F.col("n_votes"), (-F.col(label_col)).alias("_neg")),
        ).alias("_w")
    )
    return best.select(
        "query_id",
        F.col("_w.lab").alias("pred_label"),
        F.col("_w.n_votes").alias("n_votes"),
    )


def ivf_assign(
    emb: DataFrame,
    codebook: tuple[np.ndarray, np.ndarray],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Attach each vector's single nearest coarse cell (``cell`` int
    column) against a FIXED codebook — the incremental-index-maintenance
    primitive: codebook (re)training is an offline batch concern, while
    new/changed vectors assign against the current codebook in one
    broadcast-codebook Arrow pass that rides the scan (no shuffle, no
    driver state beyond n_cells x dim doubles). Used by the batch
    delta-index query (sim_ivf_delta_index) and the streaming vector
    index sink (streaming/vector_index.py). Deterministic: dim-ordered
    dot fold, ties to the lowest cell id (same rule as ann_topk_ivf)."""
    cells, mat = codebook
    assign1 = _cell_assigner(
        [(int(c), mat[i]) for i, c in enumerate(cells)], 1
    )
    return emb.withColumn(
        "cell", F.element_at(assign1(_as_double(F.col(vec_col))), 1)
    )


def int8_bounds(
    emb: DataFrame, vec_col: str = "embedding"
) -> tuple[list[float], list[float]]:
    """Global per-dimension (min, max) calibration for int8 quantization.

    posexplode -> groupBy(dim): dim cardinality is the vector width (64),
    so the shuffle carries 64 groups of map-side-combined partials no
    matter the corpus size; driver state is 2 x dim doubles (bounded).
    """
    rows = _require_rows(
        emb.select(F.posexplode(_as_double(F.col(vec_col))).alias("_dim", "_x"))
        .groupBy("_dim")
        .agg(F.min("_x").alias("mn"), F.max("_x").alias("mx"))
        .collect(),
        "int8_bounds",
    )
    mns = [0.0] * len(rows)
    mxs = [0.0] * len(rows)
    for r in rows:
        mns[r["_dim"]] = r["mn"]
        mxs[r["_dim"]] = r["mx"]
    return mns, mxs


def _int8_encoder(mns: list[float], mxs: list[float]):
    mn = np.asarray(mns, dtype=np.float64)
    rng = np.asarray(mxs, dtype=np.float64) - mn
    safe = np.where(rng == 0.0, 1.0, rng)

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def encode(v: pd.Series) -> pd.Series:
        x = np.vstack(v.to_numpy()).astype(np.float64)
        # (x - mn) * 254 / range, round HALF-UP, shift to [-127, 127];
        # constant dims quantize to code 0 (numerator is 0 there).
        # Clamp: vectors OUTSIDE the calibration bounds (queries not
        # drawn from the corpus) must still produce int8-range codes or
        # the documented |dot| <= 127^2*dim exactness bound breaks.
        q = _round_half_up((x - mn) * 254.0 / safe, 0).astype(np.int64) - 127
        q = np.clip(q, -127, 127)
        return pd.Series(list(q.astype(np.int32)))

    return encode


def int8_encode(
    emb: DataFrame,
    mns: list[float],
    mxs: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Quantize each vector to an ``array<int>`` of int8-range codes
    using broadcast-in-closure calibration bounds (2 x dim doubles).
    Arrow-batched; one pass, no shuffle. ``keep_cols`` ride through
    (the pq_encode convention) so representation pipelines can chain
    encoders without a join."""
    enc = _int8_encoder(mns, mxs)
    return emb.select(
        id_col,
        *[F.col(c) for c in keep_cols],
        enc(_as_double(F.col(vec_col))).alias("code"),
    )


def int8_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k by integer dot product in the quantized space: calibrate on
    the corpus, encode corpus + queries with the SAME bounds, score via
    exact int64 dot products (codes fit comfortably: |dot| <= 127^2*dim).

    Integer scoring makes the ranking bit-reproducible across engines —
    the float-cosine family needs ROUND(_, 4) + fold-order discipline;
    here every intermediate is exact. Plan shape = brute_force_topk:
    broadcast the (fixed, small) query side, linear corpus scan, per-query
    top-k via window on the bounded candidate set.
    """
    mns, mxs = int8_bounds(emb, vec_col)
    c = int8_encode(emb, mns, mxs, id_col, vec_col)
    q = int8_encode(queries, mns, mxs, id_col, vec_col).select(
        F.col(id_col).alias("query_id"), F.col("code").alias("q_code")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            id_col,
            dot_pd(F.col("code"), F.col("q_code")).cast("long").alias("dot_q"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("dot_q"), F.asc(id_col))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", id_col, "dot_q", "rnk")
    )


def int8_rerank_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    prefilter: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Two-stage retrieve-then-rerank — the canonical production ANN
    shape (every FAISS/ScaNN deployment): a CHEAP first pass over
    compressed codes narrows each query to ``prefilter`` candidates,
    then an exact float-cosine pass over only those candidates fixes
    the quantization-induced ranking errors near the top.

    Stage 1 scores int8 codes by exact integer dot (bit-reproducible,
    no rounding discipline needed) and keeps the top ``prefilter`` per
    query (integer ties to the lowest id — a total order both engines
    agree on). Stage 2 re-reads the corpus for ONLY the |Q| x prefilter
    candidate ids (a broadcast semi-join into the scan — the full
    vectors never travel through the stage-1 shuffle; at 100 TB
    carrying 64 int8 codes instead of 64 float64s through the wide
    stage is the point) and ranks by exact cosine, ROUND(_, 4) + id
    tie-break, the brute-force family's determinism contract.

    Recall contract: stage 2 can only REORDER stage-1 survivors, so
    recall@k(rerank) >= the agreement of int8 top-``prefilter`` with
    the exact top-k — with prefilter >> k the quantized prefilter
    almost always retains the true neighbors it merely mis-ranked
    (pinned vs plain int8 top-k in tests/test_ann.py).

    Output: (query_id, vec_id, cos_sim, rnk), rnk 1..k per query.
    """
    mns, mxs = int8_bounds(emb, vec_col)
    c = int8_encode(emb, mns, mxs, id_col, vec_col)
    q8 = int8_encode(queries, mns, mxs, id_col, vec_col).select(
        F.col(id_col).alias("query_id"), F.col("code").alias("q_code")
    )
    pre = (
        c.crossJoin(F.broadcast(q8))
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            id_col,
            dot_pd(F.col("code"), F.col("q_code")).cast("long").alias("_dot8"),
        )
    )
    wpre = W.partitionBy("query_id").orderBy(F.desc("_dot8"), F.asc(id_col))
    cand = (
        pre.withColumn("_prnk", F.row_number().over(wpre))
        .filter(F.col("_prnk") <= prefilter)
        .select("query_id", id_col)
    )
    qv = with_norm(queries, vec_col, "q_nrm").select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"), "q_nrm"
    )
    cv = with_norm(emb.select(id_col, vec_col), vec_col)
    rer = (
        cv.join(F.broadcast(cand), id_col)
        .join(F.broadcast(qv), "query_id")
        .select(
            "query_id",
            id_col,
            F.round(
                dot_pd(F.col(vec_col), F.col("q_vec"))
                / (F.col("nrm") * F.col("q_nrm")),
                4,
            ).alias("cos_sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc(id_col))
    return (
        rer.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", id_col, "cos_sim", "rnk")
    )


def ivfpq_adc_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 10,
    n_probe: int = 2,
    m: int = PQ_SUBSPACES,
    pq_cells: int = PQ_CELLS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ with residual encoding — the composition both base
    operators' docstrings name as the production path (Jégou et al.
    2011; the billion-vector memory layout): the corpus lives as
    (coarse cell, m residual codes); a query probes its n_probe
    nearest coarse cells and scores candidates as

        score(v) ~ dot(q, c_cell(v)) + sum_s LUT_q[s][code_s(v)]

    i.e. the coarse-centroid dot plus the ADC estimate of
    dot(q, v - c_cell(v)). Residual quantization is what lifts PQ's
    recall: residuals are centered near zero, so the same 4-bit-per-
    subspace budget spends its cells on the part of the vector the
    coarse index has not already explained.

    Shape at scale: candidates come from an equi-join on the probed
    cell (~n_probe/n_cells of the codes, never the corpus); the scan
    touches m-byte codes; both codebooks and every query LUT broadcast.
    Determinism mirrors the attested pieces bit-for-bit: seed-partition
    codebooks rounded to 4 decimals, dim-ordered dot folds, sub-ordered
    ADC fold, ROUND(score, 4) with id tie-break.

    Measured recall@5 on the sf0.1 fixtures: 0.075 @ n_probe=2, 0.100
    @ n_probe=5 (floors + probe monotonicity pinned, tests/test_ann.py).
    The residual trick shows NO lift over plain PQ (0.125) on these
    RANDOM vectors — coarse centroids of random data are ~0, so
    residual ~= original and the composition only adds IVF's candidate
    restriction. That is the honest worst case. On CLUSTERED
    embeddings — the workload the operator exists for — the coarse
    stage absorbs the cluster mean, residual magnitudes shrink, and the
    same 4-bit budget quantizes far tighter (the published IVF-PQ
    result): pinned at recall@5 0.23 vs plain PQ's 0.14 on a seeded
    8-blob fixture at equal code budget
    (test_ivfpq_residual_lift_on_clustered_embeddings).

    Output: (query_id, vec_id, adc_score, rnk).
    """
    # coarse codebook + assignment (the attested IVF recipe)
    cells0, cmat = pq_codebook(emb, n_cells, id_col, vec_col)
    if len(cells0) != n_cells or not np.array_equal(cells0, np.arange(n_cells)):
        # cmat is indexed by raw cell id below (residual + q_dot_c UDFs);
        # a sparse id space would mis-index or crash opaquely
        raise ValueError(
            "ivfpq_adc_topk: coarse codebook cells must be dense 0..n_cells-1"
        )
    codebook = [(int(c), cmat[i]) for i, c in enumerate(cells0)]
    assign1 = _cell_assigner(codebook, 1)
    assignp = _cell_assigner(codebook, n_probe)
    bc_c = _bc(cmat)

    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def residual(v: pd.Series, cell: pd.Series) -> pd.Series:
        cmat = bc_c.value
        X = np.vstack(v.to_numpy()).astype(np.float64)
        R = X - cmat[cell.to_numpy()]
        return pd.Series(list(R))

    from dns_log_transformer_spark.operators.caching import persist_tracked

    # persisted: the assign+residual chain feeds BOTH the residual-
    # codebook collect (an action inside pq_codebook) and the encode
    # pass — without the persist the corpus is scanned and assigned
    # twice (PLANS.md rule 4)
    corpus = persist_tracked(
        emb.select(id_col, _as_double(F.col(vec_col)).alias("_v"))
        .withColumn("cell", F.element_at(assign1(F.col("_v")), 1))
        .withColumn("_r", residual(F.col("_v"), F.col("cell")))
    )
    # PQ codebook trained on RESIDUALS (same seed-partition recipe)
    pq_cb = pq_codebook(corpus.select(id_col, "_r"), pq_cells, id_col, "_r")
    pcells, pmat = pq_cb
    if len(pcells) != pq_cells or not np.array_equal(
        pcells, np.arange(pq_cells)
    ):
        # the LUT is laid out s * pq_cells + cell and adc() indexes it by
        # raw code — sparse residual cells would silently read wrong slots
        raise ValueError(
            "ivfpq_adc_topk: residual codebook cells must be dense "
            "0..pq_cells-1"
        )
    codes = pq_encode(corpus, pq_cb, m, id_col, "_r", keep_cols=("cell",))
    dim = pmat.shape[1]
    d_sub = dim // m
    bc_p = _bc(pmat)

    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def lut(v: pd.Series) -> pd.Series:
        pmat = bc_p.value
        X = np.vstack(v.to_numpy()).astype(np.float64)
        n = X.shape[0]
        out = np.zeros((n, m * pq_cells), dtype=np.float64)
        for s in range(m):
            for ci in range(pq_cells):
                acc = np.zeros(n, dtype=np.float64)
                for d in range(s * d_sub, (s + 1) * d_sub):
                    acc = acc + X[:, d] * pmat[ci, d]
                out[:, s * pq_cells + ci] = acc
        return pd.Series(list(out))

    @F.pandas_udf(T.DoubleType())
    def q_dot_c(v: pd.Series, cell: pd.Series) -> pd.Series:
        cmat = bc_c.value
        X = np.vstack(v.to_numpy()).astype(np.float64)
        C = cmat[cell.to_numpy()]
        acc = np.zeros(X.shape[0], dtype=np.float64)
        for d in range(X.shape[1]):
            acc = acc + X[:, d] * C[:, d]
        return pd.Series(acc)

    @F.pandas_udf(T.DoubleType())
    def adc(code: pd.Series, lut_col: pd.Series) -> pd.Series:
        C = np.vstack(code.to_numpy())
        L = np.vstack(lut_col.to_numpy())
        acc = np.zeros(C.shape[0], dtype=np.float64)
        for s in range(m):  # subspace-ordered fold, mirrors list_sum
            acc = acc + L[np.arange(C.shape[0]), s * pq_cells + C[:, s]]
        return pd.Series(acc)

    q = (
        queries.select(
            F.col(id_col).alias("query_id"),
            _as_double(F.col(vec_col)).alias("_qv"),
        )
        .withColumn("_lut", lut(F.col("_qv")))
        .withColumn("cell", F.explode(assignp(F.col("_qv"))))
        .withColumn("_qc", q_dot_c(F.col("_qv"), F.col("cell")))
        .select("query_id", "cell", "_qc", "_lut")
    )
    scored = (
        codes.join(F.broadcast(q), "cell")
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            id_col,
            F.round(
                F.col("_qc") + adc(F.col("code"), F.col("_lut")), 4
            ).alias("adc_score"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("adc_score"), F.asc(id_col))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", id_col, "adc_score", "rnk")
    )


def matryoshka_probe(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    d_small: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Matryoshka/truncated-dimension retrieval probe: how much of the
    full-dimension top-k survives when the index stores only the first
    ``d_small`` dimensions? Per query: the top-k neighbor lists under
    the full-width int8 dot product AND under the ``d_small``-prefix
    dot product, plus their overlap — the number a deployment reads
    before deciding the truncated (4x-smaller, 4x-faster-scan) index is
    good enough. Matryoshka-trained embedding families order
    information by prefix, so overlap@k IS the retained retrieval
    quality at the memory budget.

    Determinism: both rankings are exact int64 dot products over the
    SAME int8 codes (one calibration; the prefix ranking just slices
    the code), ties broken on neighbor id — bit-reproducible across
    engines, no float cosine discipline needed.

    Shape at scale: one broadcast-queries pair frame computes BOTH dots
    in a single linear corpus scan (persisted: two windowed top-k
    consumers); the top-k frames are query-count-bounded, so the
    overlap join and CSV aggregations are dimension-sized work. Same
    plan family as :func:`int8_topk`.

    Output: (query_id, top_full_csv, top_trunc_csv, n_overlap,
    overlap_milli), ids in rank order.
    """
    from dns_log_transformer_spark.operators.caching import persist_tracked

    mns, mxs = int8_bounds(emb, vec_col)
    c = int8_encode(emb, mns, mxs, id_col, vec_col)
    q = int8_encode(queries, mns, mxs, id_col, vec_col).select(
        F.col(id_col).alias("query_id"), F.col("code").alias("q_code")
    )
    scored = persist_tracked(
        c.crossJoin(F.broadcast(q))
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            id_col,
            dot_pd(F.col("code"), F.col("q_code"))
            .cast("long")
            .alias("dot_full"),
            dot_pd(
                F.slice(F.col("code"), 1, d_small),
                F.slice(F.col("q_code"), 1, d_small),
            )
            .cast("long")
            .alias("dot_trunc"),
        )
    )

    def _topk(metric: str) -> DataFrame:
        w = W.partitionBy("query_id").orderBy(F.desc(metric), F.asc(id_col))
        return (
            scored.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k)
            .select("query_id", id_col, "rnk")
        )

    top_f = persist_tracked(_topk("dot_full"))
    top_t = persist_tracked(_topk("dot_trunc"))

    def _csv(df: DataFrame, out: str) -> DataFrame:
        return df.groupBy("query_id").agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("rnk", id_col))),
                    lambda s: s[id_col].cast("string"),
                ),
                ",",
            ).alias(out)
        )

    ov = (
        top_f.join(top_t, ["query_id", id_col])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_overlap"))
    )
    n_ov = F.coalesce(F.col("n_overlap"), F.lit(0).cast("long"))
    milli = ((n_ov * 1000 - (n_ov * 1000) % k) / k).cast("long")
    return (
        _csv(top_f, "top_full_csv")
        .join(_csv(top_t, "top_trunc_csv"), "query_id")
        .join(ov, "query_id", "left")
        .select(
            "query_id",
            "top_full_csv",
            "top_trunc_csv",
            n_ov.alias("n_overlap"),
            milli.alias("overlap_milli"),
        )
    )


def matryoshka_rerank_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    prefilter: int = 20,
    d_small: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The operator the r12 Matryoshka probe gates (VERDICT r12 #6):
    two-stage retrieval where stage 1 scans only the first ``d_small``
    int8 dimensions (the 4x-smaller truncated index) to ``prefilter``
    candidates per query, and stage 2 reranks ONLY those candidates by
    the exact full-width int64 dot. ``emb_matryoshka_probe`` measures
    whether the prefix retains retrieval quality; this is the retrieval
    path that cashes the measurement in — prefix-quality losses are
    repaired by the rerank whenever the true neighbor survived the
    prefilter (recall contract pinned in tests/test_round13.py: rerank
    recall@k >= prefix-only recall@k against the full-width ranking).

    Determinism: both stages are exact integer dots over the SAME int8
    codes (one calibration), ties to the lowest neighbor id — the
    int8 family's bit-reproducibility contract, no float discipline.

    Shape at scale (the int8_rerank_topk discipline): the stage-1 scan
    SELECTS the d_small prefix before the broadcast-queries pair frame,
    so the wide stage carries 16 code bytes per row, not 64 — at 100 TB
    that IS the truncated index; stage 2 re-reads codes for only the
    |Q| x prefilter candidate ids via a broadcast join into the scan
    (never through the stage-1 shuffle), and every downstream frame is
    query-count-bounded.

    Output: (query_id, vec_id, dot_full, rnk), rnk 1..k per query.
    """
    mns, mxs = int8_bounds(emb, vec_col)
    c = int8_encode(emb, mns, mxs, id_col, vec_col)
    q8 = int8_encode(queries, mns, mxs, id_col, vec_col).select(
        F.col(id_col).alias("query_id"), F.col("code").alias("q_code")
    )
    q_pre = q8.select(
        "query_id", F.slice("q_code", 1, d_small).alias("_q_pre")
    )
    pre = (
        c.select(id_col, F.slice("code", 1, d_small).alias("_pre"))
        .crossJoin(F.broadcast(q_pre))
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            id_col,
            dot_pd(F.col("_pre"), F.col("_q_pre")).cast("long").alias("_dotp"),
        )
    )
    wpre = W.partitionBy("query_id").orderBy(F.desc("_dotp"), F.asc(id_col))
    cand = (
        pre.withColumn("_prnk", F.row_number().over(wpre))
        .filter(F.col("_prnk") <= prefilter)
        .select("query_id", id_col)
    )
    rer = (
        c.join(F.broadcast(cand), id_col)
        .join(F.broadcast(q8), "query_id")
        .select(
            "query_id",
            id_col,
            dot_pd(F.col("code"), F.col("q_code")).cast("long").alias("dot_full"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("dot_full"), F.asc(id_col))
    return (
        rer.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", id_col, "dot_full", "rnk")
    )


def matryoshka_tradeoff(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    prefilter: int = 20,
    d_smalls: tuple[int, ...] = (8, 16, 32),
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The Matryoshka family's tuning query (VERDICT r13 #6): one row of
    recall-vs-cost per prefix width, so the "how small can the
    truncated index be" decision — ``sim_matryoshka_rerank`` ships
    d_small=16 — is itself attested, the same promotion
    ``dedup_blocking_tradeoff`` gave the banding choice.

    ONE tagged pass (the blocking_tradeoff trick): every (query,
    corpus-vector) pair is scored ONCE by a single Arrow-batched pandas
    UDF that accumulates the int64 dot dimension-by-dimension and
    snapshots it at every swept prefix boundary plus full width —
    nested prefixes mean the wide sweep costs one full-width dot, not
    one dot per setting. The exact full-width top-k (the truth) comes
    from the same pair frame; per-setting candidate ranking runs as one
    window keyed (d_small, query_id) over the tagged explode of the
    snapshot array. Recall@k of the rerank path equals the fraction of
    true top-k ids surviving the prefilter (stage 2 reranks candidates
    by the exact full dot, so every surviving true neighbor lands in
    its exact position; ties on id as everywhere in the int8 family).

    Output, one row per setting: (d_small, index_bytes_milli =
    1000*d_small/dim — the truncated index's storage/scan cost relative
    to full width, the tradeoff's cost axis), n_queries, n_hit (true
    top-k ids the prefilter kept, summed over queries), recall_milli
    (exact integer milli of n_hit / (k * n_queries)).

    Scale shape: pair frame is the probe's broadcast-queries scan
    (|corpus| x |Q|, the measurement query's documented cost); every
    downstream frame is query-count- or settings-bounded. The UDF's
    int64 accumulation is exact (|code| <= 127, 64 dims — far inside
    int64), so both engines agree bit-for-bit.
    """
    from dns_log_transformer_spark.operators.caching import persist_tracked

    bounds = tuple(sorted(set(int(d) for d in d_smalls)))
    if not bounds or bounds[-1] > EMBEDDING_DIM:
        raise ValueError(f"d_smalls {d_smalls} must be within 1..{EMBEDDING_DIM}")

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def prefix_dots(a: pd.Series, b: pd.Series) -> pd.Series:
        am = np.vstack(a.to_numpy()).astype(np.int64)
        bm = np.vstack(b.to_numpy()).astype(np.int64)
        acc = np.zeros(am.shape[0], dtype=np.int64)
        snaps = []
        want = set(bounds)
        for d in range(am.shape[1]):
            acc = acc + am[:, d] * bm[:, d]
            if d + 1 in want:
                snaps.append(acc.copy())
        snaps.append(acc.copy())  # full width, last slot
        mat = np.stack(snaps, axis=1)
        return pd.Series(list(mat))

    mns, mxs = int8_bounds(emb, vec_col)
    c = int8_encode(emb, mns, mxs, id_col, vec_col)
    q8 = int8_encode(queries, mns, mxs, id_col, vec_col).select(
        F.col(id_col).alias("query_id"), F.col("code").alias("q_code")
    )
    pairs = persist_tracked(
        c.crossJoin(F.broadcast(q8))
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            id_col,
            prefix_dots(F.col("code"), F.col("q_code")).alias("_dots"),
        )
    )
    wf = W.partitionBy("query_id").orderBy(
        F.desc(F.col("_dots")[len(bounds)]), F.asc(id_col)
    )
    full_topk = (
        pairs.withColumn("_frnk", F.row_number().over(wf))
        .filter(F.col("_frnk") <= k)
        .select("query_id", id_col)
    )
    tagged = pairs.select(
        "query_id",
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).cast("long").alias("d_small"),
                        F.col("_dots")[i].alias("_dotp"),
                    )
                    for i, d in enumerate(bounds)
                ]
            )
        ).alias("s"),
    ).select("query_id", id_col, "s.d_small", "s._dotp")
    wc = W.partitionBy("d_small", "query_id").orderBy(
        F.desc("_dotp"), F.asc(id_col)
    )
    cand = (
        tagged.withColumn("_prnk", F.row_number().over(wc))
        .filter(F.col("_prnk") <= prefilter)
        .select("d_small", "query_id", id_col)
    )
    hits = (
        cand.join(full_topk, ["query_id", id_col])
        .groupBy("d_small")
        .agg(F.count(F.lit(1)).cast("long").alias("n_hit"))
    )
    nq = queries.agg(F.count(F.lit(1)).cast("long").alias("n_queries"))
    settings = emb.sparkSession.createDataFrame(
        [(int(d),) for d in bounds], "d_small long"
    )
    denom = F.col("n_queries") * k
    hit1000 = F.col("n_hit") * 1000
    return (
        settings.join(F.broadcast(hits), "d_small", "left")
        .na.fill({"n_hit": 0})
        .crossJoin(F.broadcast(nq))
        .select(
            "d_small",
            ((F.col("d_small") * 1000 - (F.col("d_small") * 1000) % EMBEDDING_DIM)
             / EMBEDDING_DIM).cast("long").alias("index_bytes_milli"),
            "n_queries",
            "n_hit",
            ((hit1000 - hit1000 % denom) / denom).cast("long").alias(
                "recall_milli"
            ),
        )
    )


def ivf_tradeoff(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_probes: tuple[int, ...] = (1, 2, 4, 8),
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF's tuning query (VERDICT r14 #4): recall-vs-cost per probed
    cell count, at the auto-scaled cell count (:func:`auto_n_cells`),
    from ONE tagged pass — the blocking_tradeoff / matryoshka_tradeoff
    pattern applied to the knob an ANN operator tunes first.

    The tag is the PROBE RANK: each query's cells are ranked once by
    the codebook dot (``_cell_assigner`` at the largest swept n_probe —
    the same dim-ordered fold :func:`ann_topk_ivf` attests), so a
    corpus vector in a query's rank-r cell is reachable by exactly the
    settings with ``n_probe >= r``. No per-setting assignment or
    ranking ever re-runs.

    Recall needs NO candidate re-ranking: :func:`ann_topk_ivf` ranks
    probed candidates by the identical (rounded-cosine, id) total order
    as :func:`brute_force_topk`, and ranking a SUBSET preserves
    relative order — so a true top-k neighbor is retrieved iff its
    cell is probed. recall@k per setting = the fraction of brute-force
    top-k pairs whose corpus cell sits within the query's first
    n_probe probes (exact integer milli).

    The cost axis is the fraction of the corpus a query scans:
    ``n_scanned`` sums probed-cell occupancies over queries (a row is
    counted as read even when the self-filter later drops it — scan
    cost is reads), ``scanned_milli`` = exact integer milli of
    n_scanned / (n_queries * corpus size). n_probe = n_cells would put
    every setting at recall 1000 / scanned 1000: the brute-force
    diagonal this curve exists to beat.

    Scale shape: the one corpus x queries pair frame is the truth pass
    (brute_force_topk's documented broadcast-queries scan — the
    measurement query's cost, |corpus| x |Q| with Q
    parameter-bounded); the assignment pass is one codebook UDF over
    the corpus scan; everything downstream is settings- or
    query-count-bounded (explicit broadcasts, adjudicated BOUNDED).

    Output, one row per setting: (n_probe, n_queries, n_hit,
    recall_milli, n_scanned, scanned_milli).
    """
    from dns_log_transformer_spark.operators.caching import persist_tracked

    settings_t = tuple(sorted(set(int(p) for p in n_probes)))
    if not settings_t or settings_t[0] < 1:
        raise ValueError(f"n_probes {n_probes} must be positive")
    max_probe = settings_t[-1]
    n_cells = auto_n_cells(emb.count())
    cells0, mat0 = pq_codebook(emb, n_cells, id_col, vec_col)
    codebook = [(int(c), mat0[i]) for i, c in enumerate(cells0)]
    assign1 = _cell_assigner(codebook, 1)
    assignp = _cell_assigner(codebook, max_probe)

    # corpus -> single nearest cell; consumed by cell sizes AND the
    # truth-pair cell lookup (persist: one assignment pass, rule 4)
    c = persist_tracked(
        emb.select(id_col, vec_col)
        .withColumn("cell", F.element_at(assign1(F.col(vec_col)), 1))
        .select(id_col, "cell")
    )
    cell_sizes = c.groupBy("cell").agg(
        F.count(F.lit(1)).cast("long").alias("n_in_cell")
    )
    # each query's probe ranking, ONCE at the widest setting
    probes = persist_tracked(
        queries.select(
            F.col(id_col).alias("query_id"),
            F.posexplode(assignp(F.col(vec_col))).alias("_pos", "cell"),
        ).select(
            "query_id", "cell", (F.col("_pos") + 1).cast("long").alias("probe_rank")
        )
    )
    truth = brute_force_topk(emb, queries, k=k).select("query_id", id_col)
    truth_rank = (
        c.join(F.broadcast(truth), id_col)
        .join(F.broadcast(probes), ["query_id", "cell"], "left")
        .select("query_id", id_col, "probe_rank")
    )
    settings_arr = F.array(*[F.lit(p).cast("long") for p in settings_t])
    # tag each truth pair / probed cell with every setting deep enough
    # to reach it (NULL probe_rank -> comparison NULL -> filtered out)
    hits = (
        truth_rank.select(F.explode(settings_arr).alias("n_probe"), "probe_rank")
        .filter(F.col("n_probe") >= F.col("probe_rank"))
        .groupBy("n_probe")
        .agg(F.count(F.lit(1)).cast("long").alias("n_hit"))
    )
    scanned = (
        cell_sizes.join(F.broadcast(probes), "cell")
        .select(
            F.explode(settings_arr).alias("n_probe"), "probe_rank", "n_in_cell"
        )
        .filter(F.col("n_probe") >= F.col("probe_rank"))
        .groupBy("n_probe")
        .agg(F.sum("n_in_cell").cast("long").alias("n_scanned"))
    )
    nq = queries.agg(F.count(F.lit(1)).cast("long").alias("n_queries"))
    nc = emb.agg(F.count(F.lit(1)).cast("long").alias("n_corpus"))
    settings = emb.sparkSession.createDataFrame(
        [(int(p),) for p in settings_t], "n_probe long"
    )
    hit1000 = F.col("n_hit") * 1000
    scan1000 = F.col("n_scanned") * 1000
    rdenom = F.col("n_queries") * k
    sdenom = F.col("n_queries") * F.col("n_corpus")
    return (
        settings.join(F.broadcast(hits), "n_probe", "left")
        .join(F.broadcast(scanned), "n_probe", "left")
        .na.fill({"n_hit": 0, "n_scanned": 0})
        .crossJoin(F.broadcast(nq))
        .crossJoin(F.broadcast(nc))
        .select(
            "n_probe",
            "n_queries",
            "n_hit",
            ((hit1000 - hit1000 % rdenom) / rdenom).cast("long").alias(
                "recall_milli"
            ),
            "n_scanned",
            ((scan1000 - scan1000 % sdenom) / sdenom).cast("long").alias(
                "scanned_milli"
            ),
        )
    )
