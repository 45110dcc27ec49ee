"""The batch analytics query surface.

Each query is registered as ``name -> Query(fn, oracle)`` where ``fn``
is ``(SparkSession, sf_dir) -> DataFrame`` and ``oracle`` is the ANSI-SQL
equivalent DuckDB runs on the same parquet tables (None for ops SQL can't
express — the driver then records a weaker rows-only check).

Column-name discipline: every computed column is aliased identically in
the DataFrame code and the oracle SQL — the correctness harness sorts
columns by name before hashing values.
"""

from dns_log_transformer_spark.queries.registry import ALL_QUERIES, Query, register

# importing the modules populates the registry
from dns_log_transformer_spark.queries import analytics  # noqa: E402,F401
from dns_log_transformer_spark.queries import dns_pipeline  # noqa: E402,F401
from dns_log_transformer_spark.queries import llm_ops  # noqa: E402,F401
from dns_log_transformer_spark.queries import advanced  # noqa: E402,F401
from dns_log_transformer_spark.queries import round6  # noqa: E402,F401

# The external correctness harness checks the first 50 registered
# queries in iteration order; _WINDOW pins exactly which 50 those are.
#
# Round-6 rotation policy (mechanically enforced by tests/test_ledger.py
# against tools/ledger.py — every registered query must be green within
# the trailing three driver rounds OR inside this window):
# IN — (a) all 19 round-5 additions, which have NEVER had a driver
# correctness row (they were registered past the round-5 window by the
# documented deferral; this is the debt VERDICT r5 ordered paid first);
# (b) the three r4-greens whose code changed in round 5
# (text_quality_deciles rewrite, q_pagerank_trade cache fix,
# q_argmax_orders tiebreak fix) — each change is oracle-hash-preserving
# per the parity suite, but the bar wants driver rows on current code;
# (c) all 21 queries whose latest green row is round 3 — the stalest
# attestations, which would violate the 3-round freshness floor at r6;
# (d) the remaining slots go to new round-6 queries (never attested)
# and, if any are left, the stalest r4 greens.
# OUT — everything green in r4/r5 with unchanged code: the parity suite
# (driver-canonicalizer twin included) re-attests all registered
# queries against DuckDB at sf0.01 every pytest session.
_WINDOW = [
    # (a) round-5 additions — first driver rows
    "cdc_upsert_merge",
    "cdc_scd2_intervals",
    "q_cidr_enrich",
    "q_ewma_anomaly",
    "q_triangle_suppliers",
    "emb_int8_codes",
    "sim_int8_topk",
    "sim_ivfpq_topk",
    "text_trigram_familiarity",
    "corpus_snapshot_diff",
    "dedup_keep_best",
    "mm_phash64",
    "mm_phash_pairs",
    "q_salted_skew_agg",
    "q_salted_join_enrich",
    "corpus_expectations",
    "q_event_transitions",
    "q_rank_functions",
    "corpus_observed_ingest",
    # (b) code changed while out of window (deciles/pagerank/argmax in
    # round 5; q2's plan rewrite — semi-join pushdown + window min — in
    # round 6, oracle-hash-preserving per the parity suite)
    "text_quality_deciles",
    "q_pagerank_trade",
    "q_argmax_orders",
    "q2_min_cost_supplier",
    # (c) stalest attestations (latest green: round 3). Nineteen of
    # the 21 r3-greens (q_scalar_functions, q_date_functions,
    # q_ship_within_week, q_customer_order_counts, q_event_time_buckets,
    # q_customers_without_orders, q_above_customer_avg, q_grouping_sets,
    # q_cube_returnflag, q12_priority_lines, q14_promo_revenue,
    # q13_order_distribution, q10_returned_items, q15_top_supplier,
    # q17_small_quantity, q19_disjunctive, q4_order_priority,
    # q8_market_share, q_customer_running_totals — the
    # lowest-risk single-join/single-table queries) yielded their slots
    # to the later round-6 additions below and to q2's (b) slot:
    # never-attested and code-changed beat stale-green; the displaced
    # nineteen keep their r3 rows and rotate into the r7 window when
    # the floor moves past them.
    "q9_product_profit",
    "q_sessionize_events",
    # (d) new round-6 queries fill the rest (never-attested beats the
    # stale-r4-green fillers that briefly held the last two slots —
    # those stay fresh outside the window until the r7 rotation)
    "corpus_winnow_span_dedup",
    "sim_ivf_delta_index",
    "emb_knn_label",
    "text_tfidf_topterms",
    "text_char_entropy",
    "sim_int8_rerank",
    "q_regr_trends",
    "dedup_sorted_neighborhood",
    "text_tfidf_cosine_rerank",
    "q_key_skew_report",
    "q_ri_audit",
    "text_bpe_merges",
    "q_snapshot_drift",
    "q_join_size_estimate",
    "cdc_time_travel",
    "q_event_paths",
    "q_copurchase_pairs",
    "q_decayed_popularity",
    "q_cohort_retention",
    "q_target_encode_lofo",
    "q_ntile_buckets",
    "q_ab_test_ztest",
    "q_link_prediction_aa",
    "q_rfm_segments",
    "text_bpe_apply",
]


def _reorder() -> None:
    assert len(_WINDOW) == 50, f"driver window must be exactly 50, got {len(_WINDOW)}"
    missing = [n for n in _WINDOW if n not in ALL_QUERIES]
    assert not missing, f"window names not registered: {missing}"
    ordered = {n: ALL_QUERIES[n] for n in _WINDOW}
    ordered.update({n: q for n, q in ALL_QUERIES.items() if n not in ordered})
    ALL_QUERIES.clear()
    ALL_QUERIES.update(ordered)


_reorder()

__all__ = ["ALL_QUERIES", "Query", "register"]
