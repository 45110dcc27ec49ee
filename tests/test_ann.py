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


def test_ivf_every_query_answered(spark):
    emb = read_table(spark, SF_SMOKE, "embeddings")
    queries = emb.filter(F.col("vec_id") % 20 == 0)
    res = similarity.ann_topk_ivf(emb, queries, k=5, n_cells=8, n_probe=2)
    got = _topk_sets(res)
    assert set(got) == {r["vec_id"] for r in queries.collect()}
    assert all(len(v) == 5 for v in got.values())
