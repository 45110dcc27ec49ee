"""Operator-library edge cases: empty inputs, degenerate parameters.

At 100 TB an 'empty' input is routine (a partition predicate that
matches nothing, a first-run benchmark set) — operators must return
empty/identity results, never throw."""

from __future__ import annotations

from pyspark.sql import functions as F

from dns_log_transformer_spark.operators import corpus, dedup, similarity
from dns_log_transformer_spark.operators.profile import profile_columns
from dns_log_transformer_spark.session import read_table
from tests.conftest import SF_SMOKE


def _empty_docs(spark):
    return spark.createDataFrame([], "doc_id long, text string")


def test_dedup_ops_on_empty_input(spark):
    empty = _empty_docs(spark)
    assert dedup.ngram_jaccard_pairs(empty).count() == 0
    assert dedup.minhash_lsh_pairs(empty).count() == 0
    assert dedup.simhash_pairs(empty).count() == 0
    assert dedup.exact_dup_groups(empty).count() == 0


def test_kmeans_more_cells_than_rows(spark):
    emb = read_table(spark, SF_SMOKE, "embeddings").limit(5)
    out = similarity.kmeans_assign(emb, k=8, n_iter=1)
    rows = out.collect()
    assert len(rows) == 5
    # codebook truncates to the 5 available seeds; cells stay in range
    assert all(0 <= r["cell"] < 5 for r in rows)


def test_profile_on_empty_table(spark):
    empty = spark.createDataFrame([], "a long, b string")
    rows = {r["col_name"]: r for r in profile_columns(empty, ["a", "b"]).collect()}
    assert set(rows) == {"a", "b"}
    for r in rows.values():
        assert r["n_distinct"] == 0 and r["min_str"] is None and r["max_str"] is None


def test_decontaminate_empty_benchmark(spark):
    docs = read_table(spark, SF_SMOKE, "documents")
    empty = _empty_docs(spark)
    out = corpus.decontaminate(docs, empty)
    assert out.count() == docs.count()
    assert out.filter(F.col("is_contaminated")).count() == 0
