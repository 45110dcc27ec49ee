"""Empty-input contract: a partition-pruned or fully-filtered slice of
a 100 TB table is legitimately EMPTY, and every operator must either
return an empty (schema-stable) result or fail with a DESCRIPTIVE error.

Policy pinned here:
- pure transforms / aggregations / joins / sketches return 0+ rows;
- codebook-LEARNING ops (seed centroids, k-means, PQ) raise ValueError
  with a "input has no rows" message — you cannot learn parameters from
  nothing, and an opaque numpy shape error would surface instead.

A representative exemplar per family keeps the matrix fast; the full
115-query sweep was run once out-of-band with identical results.
"""

from __future__ import annotations

import glob
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod
from tests.conftest import SF_SMOKE

# one exemplar per family (scan/agg/join/window/set/sessionize/dns/
# dedup/sketch/similarity/text/corpus/storage-adjacent)
REPRESENTATIVE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q_rolling_hour",
    "q_gapfill_buckets",
    "q_event_funnel",
    "q_argmax_orders",
    "q_global_rank",
    "q_approx_distinct",  # merged: HLL++ check + datasketches partials
    "q_unpivot_measures",
    "q_approx_percentiles",
    "q_recursive_months",
    "q_pagerank_trade",
    "dns_bind9_lines",
    "dns_quarantine_stats",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash_pairs",
    "sketch_cms_topk",
    "sim_topk_bruteforce",
    "sim_ann_lsh_topk",
    "text_quality",  # merged quality suite (stats + deciles + classifier)
    "text_bm25_topk",
    "text_hybrid_rrf",
    "corpus_bloom_verified_decon",
    "corpus_source_overlap",
    "corpus_token_budget",
    "corpus_negative_pairs",
    "corpus_shuffle",
    "corpus_temperature_sample",
    # round-5 families
    "cdc_upsert_merge",
    "cdc_scd2_intervals",
    "q_cidr_enrich",
    "q_ewma_anomaly",
    "q_triangle_suppliers",
    "q_event_transitions",
    "q_rank_functions",
    "q_salted_skew_agg",
    "q_salted_join_enrich",
    "corpus_expectations",
    "corpus_snapshot_diff",
    "text_trigram_familiarity",
    "mm_phash_pairs",
    "mm_container_census",  # byte-census family exemplar (r10)
    "dedup_keep_best",
    "corpus_observed_ingest",
    # round-6 families
    "dedup_sorted_neighborhood",  # global_rank's empty-partition path
    "text_tfidf_cosine_rerank",  # empty corpus -> empty candidates
    "text_bpe_apply",  # zero merges learned -> empty stats, stable schema
    "q_key_skew_report",
    "q_ri_audit",
    "q_snapshot_drift",
    "q_join_size_estimate",
    "cdc_time_travel",
    "q_event_paths",
    "corpus_winnow_span_dedup",
    "q_regr_trends",
    "text_char_entropy",
    # round-12 families
    "text_pmi_collocations",  # empty corpus -> no bigrams, stable schema
    "dedup_blocking_audit",  # 1 metrics row of zeros + NULL ratios
    "corpus_warc_records",  # zero blobs packed -> zero records parsed
    # round-13 families
    "corpus_warc_http",  # byte-domain walk over zero blobs
    "dedup_blocking_tradeoff",  # 4 settings rows of zeros + NULL ratios
]

# the learning ops: clear ValueError by contract
LEARNERS = [
    "emb_matryoshka_probe",  # int8 calibration learns from the corpus (r12)
    "sim_matryoshka_rerank",  # same int8 calibration (r13)
    "emb_kmeans",
    "emb_vector_codes",  # merged int8/pq/lsh representation learner
    "emb_semantic_dedup",
    "sim_ann_ivf_topk",
    "sim_pq_adc_topk",
    # round-5 learners: int8 calibration and the IVF-PQ coarse codebook
    # learn from the corpus
    "sim_int8_topk",
    "sim_ivfpq_topk",
    # round-6 learners: the int8 rerank's calibration and the delta
    # index's coarse codebook learn from the corpus
    "sim_int8_rerank",
    "sim_ivf_delta_index",
]


@pytest.fixture(scope="module")
def empty_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("sfempty")
    for f in glob.glob(os.path.join(SF_SMOKE, "*.parquet")):
        t = os.path.basename(f)
        duckdb.sql(
            f"COPY (SELECT * FROM read_parquet('{f}') LIMIT 0) "
            f"TO '{d}/{t}' (FORMAT PARQUET)"
        )
    return str(d)


@pytest.mark.parametrize("name", REPRESENTATIVE)
def test_runs_empty(spark, empty_dir, name):
    qs = entry_mod.queries()
    n = qs[name](spark, empty_dir).count()
    assert n >= 0  # completing without an exception is the contract


@pytest.mark.parametrize("name", LEARNERS)
def test_learners_raise_clearly(spark, empty_dir, name):
    qs = entry_mod.queries()
    with pytest.raises(ValueError, match="input has no rows"):
        qs[name](spark, empty_dir).count()
