"""Static-broadcast adjudication record (VERDICT r13 #1).

Every STATICALLY planned BroadcastHashJoin /
BroadcastNestedLoopJoin in every registered query's plan must
appear here with a one-line bounded-by-construction rationale
— plans.broadcast_lint fails the parity suite (pytest AND
tools/parity_sweep.py) on any unlisted or rationale-less
broadcast, so a new corpus x corpus join cannot land green on
the gate fixtures and fail only at production scale (the
rule-12 class, previously caught only by hand-running
tools/bhj_sweep_r13.py at x100).

AQE runtime broadcast conversions are deliberately NOT listed:
they are re-decided from MEASURED sizes at every scale and
cannot pick a corpus-sized build side at corpus scale (see
plans.broadcast_sigs).

Regenerate with tools/gen_broadcast_allowlist.py — existing
rationales are preserved, new signatures arrive empty and the
lint rejects empty rationales, so regeneration cannot launder
an unadjudicated broadcast.
"""

BROADCAST_ALLOWLIST: dict[str, dict[str, str]] = {
    'corpus_bloom_verified_decon': {
        'BroadcastHashJoin [doc_id], [doc_id], Inner, BuildRight, false':
            "X100-RAN-CLEAN: corpus-scaled build side the static planner still broadcasts at x100, where the query EXECUTED clean (tools/bhj_sweep_r13.py r13/r14: all flagged queries ran, no OOM). Two decades validated; merge pin deferred (it also blocks AQE's runtime-measured conversions, +20-51% measured r14) — re-run the bhj sweep after touching this site and pin on demonstrated build/spill pain (the posting self-join precedent)",
        'BroadcastHashJoin [shingle], [shingle], LeftOuter, BuildRight, false':
            "X100-RAN-CLEAN: corpus-scaled build side the static planner still broadcasts at x100, where the query EXECUTED clean (tools/bhj_sweep_r13.py r13/r14: all flagged queries ran, no OOM). Two decades validated; merge pin deferred (it also blocks AQE's runtime-measured conversions, +20-51% measured r14) — re-run the bhj sweep after touching this site and pin on demonstrated build/spill pain (the posting self-join precedent)",
    },
    'corpus_boilerplate': {
        'BroadcastHashJoin [_x], [_x], Inner, BuildRight, false':
            "X100-RAN-CLEAN: corpus-scaled build side the static planner still broadcasts at x100, where the query EXECUTED clean (tools/bhj_sweep_r13.py r13/r14: all flagged queries ran, no OOM). Two decades validated; merge pin deferred (it also blocks AQE's runtime-measured conversions, +20-51% measured r14) — re-run the bhj sweep after touching this site and pin on demonstrated build/spill pain (the posting self-join precedent)",
    },
    'corpus_capped_per_source': {
        'BroadcastHashJoin [source], [source], LeftOuter, BuildRight, false':
            'BOUNDED: per-group aggregate/spine over a bounded key domain (flags, priorities, buckets, calendar spine, source catalog, CIDR table, synthetic key domain) — rows <= domain size, independent of corpus scale',
    },
    'corpus_decontaminate': {
        'BroadcastHashJoin [shingle], [shingle], LeftOuter, BuildRight, false':
            "X100-RAN-CLEAN: corpus-scaled build side the static planner still broadcasts at x100, where the query EXECUTED clean (tools/bhj_sweep_r13.py r13/r14: all flagged queries ran, no OOM). Two decades validated; merge pin deferred (it also blocks AQE's runtime-measured conversions, +20-51% measured r14) — re-run the bhj sweep after touching this site and pin on demonstrated build/spill pain (the posting self-join precedent)",
    },
    'corpus_dsir_weights': {
        'BroadcastHashJoin [_f], [_f], Inner, BuildRight, false':
            'BOUNDED: incremental-delta side — bounded by the NEW batch, not the accumulated corpus (batch-bounded delta class)',
    },
    'corpus_negative_pairs': {
        'BroadcastHashJoin [_prk], [_prk], Inner, BuildLeft, false':
            "X100-RAN-CLEAN: corpus-scaled build side the static planner still broadcasts at x100, where the query EXECUTED clean (tools/bhj_sweep_r13.py r13/r14: all flagged queries ran, no OOM). Two decades validated; merge pin deferred (it also blocks AQE's runtime-measured conversions, +20-51% measured r14) — re-run the bhj sweep after touching this site and pin on demonstrated build/spill pain (the posting self-join precedent)",
    },
    'corpus_prepare_funnel': {
        'BroadcastHashJoin [doc_id], [doc_id], Inner, BuildRight, false':
            "X100-RAN-CLEAN: corpus-scaled build side the static planner still broadcasts at x100, where the query EXECUTED clean (tools/bhj_sweep_r13.py r13/r14: all flagged queries ran, no OOM). Two decades validated; merge pin deferred (it also blocks AQE's runtime-measured conversions, +20-51% measured r14) — re-run the bhj sweep after touching this site and pin on demonstrated build/spill pain (the posting self-join precedent)",
        'BroadcastHashJoin [doc_id], [doc_id], LeftOuter, BuildRight, false':
            "X100-RAN-CLEAN: corpus-scaled build side the static planner still broadcasts at x100, where the query EXECUTED clean (tools/bhj_sweep_r13.py r13/r14: all flagged queries ran, no OOM). Two decades validated; merge pin deferred (it also blocks AQE's runtime-measured conversions, +20-51% measured r14) — re-run the bhj sweep after touching this site and pin on demonstrated build/spill pain (the posting self-join precedent)",
        'BroadcastHashJoin [shingle], [shingle], LeftOuter, BuildRight, false':
            "X100-RAN-CLEAN: corpus-scaled build side the static planner still broadcasts at x100, where the query EXECUTED clean (tools/bhj_sweep_r13.py r13/r14: all flagged queries ran, no OOM). Two decades validated; merge pin deferred (it also blocks AQE's runtime-measured conversions, +20-51% measured r14) — re-run the bhj sweep after touching this site and pin on demonstrated build/spill pain (the posting self-join precedent)",
    },
    'corpus_prune_curve': {
        'BroadcastNestedLoopJoin BuildRight, Cross':
            'BOUNDED: crossJoin of a 1-row/bounded frame (scalar aggregates, settings frames, query workloads) — the documented bounded-domain BNLJ class',
    },
    'corpus_source_overlap': {
        'BroadcastNestedLoopJoin BuildRight, Inner, (source_a < source_b)':
            'BOUNDED: bounded-domain BroadcastNestedLoopJoin — 1-row scalar aggregates, settings/spine frames or per-bounded-group extrema (the scale_lint BNLJ_DOCUMENTED class)',
    },
    'corpus_source_scorecard': {
        'BroadcastHashJoin [band, key], [band, key], Inner, BuildRight, (doc_a < doc_b), false':
            'X100-FLIPS: corpus-scaled build side whose size estimate tracks the input — the static planner flips this site to sort-merge by the x100 replica scale (plan probe); the broadcast appears only at gate-fixture sizes where it is genuinely optimal',
        'BroadcastHashJoin [band, key], [band, key], LeftAnti, BuildRight, false':
            'BOUNDED: heavy-bucket key list — <= n_rows/bucket_cap keys by construction (occupancy-cap aggregate)',
        'BroadcastHashJoin [doc_id], [doc_id], Inner, BuildLeft, false':
            'X100-FLIPS: corpus-scaled build side whose size estimate tracks the input — the static planner flips this site to sort-merge by the x100 replica scale (plan probe); the broadcast appears only at gate-fixture sizes where it is genuinely optimal',
        'BroadcastHashJoin [doc_id], [doc_id], Inner, BuildRight, false':
            "X100-RAN-CLEAN: corpus-scaled build side the static planner still broadcasts at x100, where the query EXECUTED clean (tools/bhj_sweep_r13.py r13/r14: all flagged queries ran, no OOM). Two decades validated; merge pin deferred (it also blocks AQE's runtime-measured conversions, +20-51% measured r14) — re-run the bhj sweep after touching this site and pin on demonstrated build/spill pain (the posting self-join precedent)",
        'BroadcastHashJoin [shingle], [shingle], LeftOuter, BuildRight, false':
            "X100-RAN-CLEAN: corpus-scaled build side the static planner still broadcasts at x100, where the query EXECUTED clean (tools/bhj_sweep_r13.py r13/r14: all flagged queries ran, no OOM). Two decades validated; merge pin deferred (it also blocks AQE's runtime-measured conversions, +20-51% measured r14) — re-run the bhj sweep after touching this site and pin on demonstrated build/spill pain (the posting self-join precedent)",
    },
    'corpus_span_dedup': {
        'BroadcastHashJoin [span_text], [span_text], Inner, BuildRight, false':
            "X100-RAN-CLEAN: corpus-scaled build side the static planner still broadcasts at x100, where the query EXECUTED clean (tools/bhj_sweep_r13.py r13/r14: all flagged queries ran, no OOM). Two decades validated; merge pin deferred (it also blocks AQE's runtime-measured conversions, +20-51% measured r14) — re-run the bhj sweep after touching this site and pin on demonstrated build/spill pain (the posting self-join precedent)",
    },
    'corpus_temperature_sample': {
        'BroadcastHashJoin [source], [source], Inner, BuildRight, (sample_rank <= _quota), false':
            'BOUNDED: per-group aggregate/spine over a bounded key domain (flags, priorities, buckets, calendar spine, source catalog, CIDR table, synthetic key domain) — rows <= domain size, independent of corpus scale',
        'BroadcastHashJoin [source], [source], LeftOuter, BuildRight, false':
            'BOUNDED: per-group aggregate/spine over a bounded key domain (flags, priorities, buckets, calendar spine, source catalog, CIDR table, synthetic key domain) — rows <= domain size, independent of corpus scale',
    },
    'corpus_warcgz_to_shards': {
        'BroadcastHashJoin [doc_id], [doc_id], Inner, BuildRight, false':
            "X100-RAN-CLEAN: corpus-scaled build side the static planner still broadcasts at x100, where the query EXECUTED clean (tools/bhj_sweep_r13.py r13/r14: all flagged queries ran, no OOM). Two decades validated; merge pin deferred (it also blocks AQE's runtime-measured conversions, +20-51% measured r14) — re-run the bhj sweep after touching this site and pin on demonstrated build/spill pain (the posting self-join precedent)",
        'BroadcastHashJoin [doc_id], [doc_id], LeftOuter, BuildRight, false':
            "X100-RAN-CLEAN: corpus-scaled build side the static planner still broadcasts at x100, where the query EXECUTED clean (tools/bhj_sweep_r13.py r13/r14: all flagged queries ran, no OOM). Two decades validated; merge pin deferred (it also blocks AQE's runtime-measured conversions, +20-51% measured r14) — re-run the bhj sweep after touching this site and pin on demonstrated build/spill pain (the posting self-join precedent)",
        'BroadcastHashJoin [shingle], [shingle], LeftOuter, BuildRight, false':
            "X100-RAN-CLEAN: corpus-scaled build side the static planner still broadcasts at x100, where the query EXECUTED clean (tools/bhj_sweep_r13.py r13/r14: all flagged queries ran, no OOM). Two decades validated; merge pin deferred (it also blocks AQE's runtime-measured conversions, +20-51% measured r14) — re-run the bhj sweep after touching this site and pin on demonstrated build/spill pain (the posting self-join precedent)",
    },
    'corpus_winnow_span_dedup': {
        'BroadcastHashJoin [fp], [fp], LeftSemi, BuildRight, false':
            "X100-RAN-CLEAN: corpus-scaled build side the static planner still broadcasts at x100, where the query EXECUTED clean (tools/bhj_sweep_r13.py r13/r14: all flagged queries ran, no OOM). Two decades validated; merge pin deferred (it also blocks AQE's runtime-measured conversions, +20-51% measured r14) — re-run the bhj sweep after touching this site and pin on demonstrated build/spill pain (the posting self-join precedent)",
    },
    'dedup_blocking_audit': {
        'BroadcastHashJoin [band, key], [band, key], Inner, BuildRight, (doc_a < doc_b), false':
            'X100-FLIPS: corpus-scaled build side whose size estimate tracks the input — the static planner flips this site to sort-merge by the x100 replica scale (plan probe); the broadcast appears only at gate-fixture sizes where it is genuinely optimal',
        'BroadcastHashJoin [band, key], [band, key], LeftAnti, BuildRight, false':
            'BOUNDED: heavy-bucket key list — <= n_rows/bucket_cap keys by construction (occupancy-cap aggregate)',
        'BroadcastNestedLoopJoin BuildRight, Cross':
            'BOUNDED: crossJoin of a 1-row/bounded frame (scalar aggregates, settings frames, query workloads) — the documented bounded-domain BNLJ class',
    },
    'dedup_blocking_tradeoff': {
        'BroadcastHashJoin [num_bands, band, key], [num_bands, band, key], Inner, BuildRight, (doc_a < doc_b), false':
            'X100-FLIPS: corpus-scaled build side whose size estimate tracks the input — the static planner flips this site to sort-merge by the x100 replica scale (plan probe); the broadcast appears only at gate-fixture sizes where it is genuinely optimal',
        'BroadcastHashJoin [num_bands, band, key], [num_bands, band, key], LeftAnti, BuildRight, false':
            'BOUNDED: heavy-bucket key list — <= n_rows/bucket_cap keys by construction (occupancy-cap aggregate)',
        'BroadcastHashJoin [num_bands], [num_bands], LeftOuter, BuildRight, false':
            'BOUNDED: per-setting metric counts — one row per swept band setting',
        'BroadcastNestedLoopJoin BuildRight, Cross':
            'BOUNDED: crossJoin of a 1-row/bounded frame (scalar aggregates, settings frames, query workloads) — the documented bounded-domain BNLJ class',
    },
    'dedup_incremental_delta': {
        'BroadcastHashJoin [_f], [_f], LeftSemi, BuildRight, false':
            'BOUNDED: incremental-delta side — bounded by the NEW batch, not the accumulated corpus (batch-bounded delta class)',
        'BroadcastHashJoin [_n], [_n], Inner, BuildRight, false':
            'BOUNDED: incremental-delta side — bounded by the NEW batch, not the accumulated corpus (batch-bounded delta class)',
        'BroadcastHashJoin [_o], [_o], Inner, BuildRight, ((cast(size(array_intersect(sh_n, sh_o), false) as double) / cast(((size(sh_n, false) + size(sh_o, false)) - size(array_intersect(sh_n, sh_o), false)) ':
            'BOUNDED: incremental-delta side — bounded by the NEW batch, not the accumulated corpus (batch-bounded delta class)',
        'BroadcastHashJoin [band, key], [band, key], Inner, BuildRight, false':
            'X100-FLIPS: corpus-scaled build side whose size estimate tracks the input — the static planner flips this site to sort-merge by the x100 replica scale (plan probe); the broadcast appears only at gate-fixture sizes where it is genuinely optimal',
        'BroadcastHashJoin [band, key], [band, key], LeftAnti, BuildRight, false':
            'BOUNDED: heavy-bucket key list — <= n_rows/bucket_cap keys by construction (occupancy-cap aggregate)',
        'BroadcastHashJoin [doc_id], [doc_id], LeftOuter, BuildRight, false':
            "X100-RAN-CLEAN: corpus-scaled build side the static planner still broadcasts at x100, where the query EXECUTED clean (tools/bhj_sweep_r13.py r13/r14: all flagged queries ran, no OOM). Two decades validated; merge pin deferred (it also blocks AQE's runtime-measured conversions, +20-51% measured r14) — re-run the bhj sweep after touching this site and pin on demonstrated build/spill pain (the posting self-join precedent)",
    },
    'dedup_keep_best': {
        'BroadcastHashJoin [doc_id], [doc_id], Inner, BuildRight, false':
            "X100-RAN-CLEAN: corpus-scaled build side the static planner still broadcasts at x100, where the query EXECUTED clean (tools/bhj_sweep_r13.py r13/r14: all flagged queries ran, no OOM). Two decades validated; merge pin deferred (it also blocks AQE's runtime-measured conversions, +20-51% measured r14) — re-run the bhj sweep after touching this site and pin on demonstrated build/spill pain (the posting self-join precedent)",
    },
    'dedup_minhash_lsh': {
        'BroadcastHashJoin [band, key], [band, key], Inner, BuildRight, (doc_a < doc_b), false':
            'X100-FLIPS: corpus-scaled build side whose size estimate tracks the input — the static planner flips this site to sort-merge by the x100 replica scale (plan probe); the broadcast appears only at gate-fixture sizes where it is genuinely optimal',
        'BroadcastHashJoin [band, key], [band, key], LeftAnti, BuildRight, false':
            'BOUNDED: heavy-bucket key list — <= n_rows/bucket_cap keys by construction (occupancy-cap aggregate)',
    },
    'dedup_simhash_pairs': {
        'BroadcastHashJoin [band, key], [band, key], Inner, BuildRight, ((doc_a < doc_b) AND (bit_count((h_a ^ h_b)) <= 3)), false':
            "X100-RAN-CLEAN: corpus-scaled build side the static planner still broadcasts at x100, where the query EXECUTED clean (tools/bhj_sweep_r13.py r13/r14: all flagged queries ran, no OOM). Two decades validated; merge pin deferred (it also blocks AQE's runtime-measured conversions, +20-51% measured r14) — re-run the bhj sweep after touching this site and pin on demonstrated build/spill pain (the posting self-join precedent)",
        'BroadcastHashJoin [band, key], [band, key], LeftAnti, BuildRight, false':
            'BOUNDED: heavy-bucket key list — <= n_rows/bucket_cap keys by construction (occupancy-cap aggregate)',
    },
    'dedup_sorted_neighborhood': {
        'BroadcastHashJoin [_rn_b], [_rn_b], Inner, BuildRight, (levenshtein(_prefix_a, _prefix_b, None) <= 20), false':
            "X100-RAN-CLEAN: corpus-scaled build side the static planner still broadcasts at x100, where the query EXECUTED clean (tools/bhj_sweep_r13.py r13/r14: all flagged queries ran, no OOM). Two decades validated; merge pin deferred (it also blocks AQE's runtime-measured conversions, +20-51% measured r14) — re-run the bhj sweep after touching this site and pin on demonstrated build/spill pain (the posting self-join precedent)",
    },
    'dedup_text_embedding_lsh': {
        'BroadcastHashJoin [lsh_key], [lsh_key], Inner, BuildRight, (id_a < id_b), false':
            "X100-RAN-CLEAN: corpus-scaled build side the static planner still broadcasts at x100, where the query EXECUTED clean (tools/bhj_sweep_r13.py r13/r14: all flagged queries ran, no OOM). Two decades validated; merge pin deferred (it also blocks AQE's runtime-measured conversions, +20-51% measured r14) — re-run the bhj sweep after touching this site and pin on demonstrated build/spill pain (the posting self-join precedent)",
    },
    'emb_coverage_audit': {
        'BroadcastHashJoin [doc_id], [doc_id], LeftOuter, BuildRight, false':
            "X100-RAN-CLEAN: corpus-scaled build side the static planner still broadcasts at x100, where the query EXECUTED clean (tools/bhj_sweep_r13.py r13/r14: all flagged queries ran, no OOM). Two decades validated; merge pin deferred (it also blocks AQE's runtime-measured conversions, +20-51% measured r14) — re-run the bhj sweep after touching this site and pin on demonstrated build/spill pain (the posting self-join precedent)",
    },
    'emb_knn_label': {
        'BroadcastNestedLoopJoin BuildRight, Cross, NOT (vec_id = query_id)':
            'BOUNDED: crossJoin of a 1-row/bounded frame (scalar aggregates, settings frames, query workloads) — the documented bounded-domain BNLJ class',
    },
    'emb_matryoshka_probe': {
        'BroadcastNestedLoopJoin BuildRight, Cross, NOT (vec_id = query_id)':
            'BOUNDED: crossJoin of a 1-row/bounded frame (scalar aggregates, settings frames, query workloads) — the documented bounded-domain BNLJ class',
    },
    'emb_neardup_pairs': {
        'BroadcastNestedLoopJoin BuildRight, Cross, (blk_a <= blk_b)':
            'BOUNDED: crossJoin of a 1-row/bounded frame (scalar aggregates, settings frames, query workloads) — the documented bounded-domain BNLJ class',
    },
    'emb_source_drift': {
        'BroadcastHashJoin [vec_id], [vec_id], Inner, BuildRight, false':
            'BOUNDED: rerank candidate-id side — |queries| x k ids by construction (prefilter output), independent of corpus size',
    },
    'mm_phash_pairs': {
        'BroadcastHashJoin [band, key], [band, key], Inner, BuildRight, (doc_id < doc_id), false':
            'X100-FLIPS: corpus-scaled build side whose size estimate tracks the input — the static planner flips this site to sort-merge by the x100 replica scale (plan probe); the broadcast appears only at gate-fixture sizes where it is genuinely optimal',
        'BroadcastHashJoin [doc_a], [doc_a], Inner, BuildRight, false':
            'X100-FLIPS: corpus-scaled build side whose size estimate tracks the input — the static planner flips this site to sort-merge by the x100 replica scale (plan probe); the broadcast appears only at gate-fixture sizes where it is genuinely optimal',
        'BroadcastHashJoin [doc_b], [doc_b], Inner, BuildRight, ((((bit_count((a0 ^ c0)) + bit_count((a1 ^ c1))) + bit_count((a2 ^ c2))) + bit_count((a3 ^ c3))) <= 3), false':
            'X100-FLIPS: corpus-scaled build side whose size estimate tracks the input — the static planner flips this site to sort-merge by the x100 replica scale (plan probe); the broadcast appears only at gate-fixture sizes where it is genuinely optimal',
    },
    'mm_resize': {
        'BroadcastHashJoin [doc_id], [doc_id], Inner, BuildRight, false':
            "X100-RAN-CLEAN: corpus-scaled build side the static planner still broadcasts at x100, where the query EXECUTED clean (tools/bhj_sweep_r13.py r13/r14: all flagged queries ran, no OOM). Two decades validated; merge pin deferred (it also blocks AQE's runtime-measured conversions, +20-51% measured r14) — re-run the bhj sweep after touching this site and pin on demonstrated build/spill pain (the posting self-join precedent)",
    },
    'q10_returned_items': {
        'BroadcastHashJoin [c_nationkey], [n_nationkey], Inner, BuildRight, false':
            'SCAN-FED: build side is a scan/projection with parquet file-size statistics — accurate at every scale, the planner re-decides and flips to shuffle when the table outgrows the threshold',
        'BroadcastHashJoin [l_orderkey], [o_orderkey], Inner, BuildRight, false':
            'SCAN-FED: build side is a scan/projection with parquet file-size statistics — accurate at every scale, the planner re-decides and flips to shuffle when the table outgrows the threshold',
        'BroadcastHashJoin [o_custkey], [c_custkey], Inner, BuildRight, false':
            'SCAN-FED: build side is a scan/projection with parquet file-size statistics — accurate at every scale, the planner re-decides and flips to shuffle when the table outgrows the threshold',
    },
    'q11_important_parts': {
        'BroadcastNestedLoopJoin BuildRight, Inner, (cast((part_value * 1250) as decimal(38,6)) > total)':
            'BOUNDED: bounded-domain BroadcastNestedLoopJoin — 1-row scalar aggregates, settings/spine frames or per-bounded-group extrema (the scale_lint BNLJ_DOCUMENTED class) — comparison against a broadcast 1-row total',
    },
    'q12_priority_lines': {
        'BroadcastHashJoin [l_orderkey], [o_orderkey], Inner, BuildRight, false':
            'SCAN-FED: build side is a scan/projection with parquet file-size statistics — accurate at every scale, the planner re-decides and flips to shuffle when the table outgrows the threshold',
    },
    'q13_order_distribution': {
        'BroadcastHashJoin [c_custkey], [o_custkey], LeftOuter, BuildRight, false':
            'SCAN-FED: build side is a scan/projection with parquet file-size statistics — accurate at every scale, the planner re-decides and flips to shuffle when the table outgrows the threshold',
    },
    'q14_promo_revenue': {
        'BroadcastHashJoin [l_partkey], [p_partkey], Inner, BuildRight, false':
            'SCAN-FED: build side is a scan/projection with parquet file-size statistics — accurate at every scale, the planner re-decides and flips to shuffle when the table outgrows the threshold',
    },
    'q15_top_supplier': {
        'BroadcastHashJoin [knownfloatingpointnormalized(normalizenanandzero(total_revenue))], [knownfloatingpointnormalized(normalizenanandzero(m))], Inner, BuildRight, false':
            'BOUNDED: per-group extremum frame — one row per bounded group domain (argmax/skyline pattern)',
        'BroadcastHashJoin [l_suppkey], [s_suppkey], Inner, BuildRight, false':
            'SCAN-FED: build side is a scan/projection with parquet file-size statistics — accurate at every scale, the planner re-decides and flips to shuffle when the table outgrows the threshold',
    },
    'q16_supplier_count': {
        'BroadcastHashJoin [l_partkey], [p_partkey], Inner, BuildRight, false':
            'SCAN-FED: build side is a scan/projection with parquet file-size statistics — accurate at every scale, the planner re-decides and flips to shuffle when the table outgrows the threshold',
        'BroadcastHashJoin [l_suppkey], [s_suppkey], LeftAnti, BuildRight, false':
            'SCAN-FED: build side is a scan/projection with parquet file-size statistics — accurate at every scale, the planner re-decides and flips to shuffle when the table outgrows the threshold',
    },
    'q17_small_quantity': {
        'BroadcastHashJoin [l_partkey], [l_partkey], Inner, BuildRight, (l_quantity < half_avg), false':
            'SCAN-FED: build side is a scan/projection with parquet file-size statistics — accurate at every scale, the planner re-decides and flips to shuffle when the table outgrows the threshold',
        'BroadcastHashJoin [l_partkey], [p_partkey], Inner, BuildRight, false':
            'SCAN-FED: build side is a scan/projection with parquet file-size statistics — accurate at every scale, the planner re-decides and flips to shuffle when the table outgrows the threshold',
    },
    'q18_large_orders': {
        'BroadcastHashJoin [o_custkey], [c_custkey], Inner, BuildRight, false':
            'SCAN-FED: build side is a scan/projection with parquet file-size statistics — accurate at every scale, the planner re-decides and flips to shuffle when the table outgrows the threshold',
        'BroadcastHashJoin [o_orderkey], [l_orderkey], Inner, BuildLeft, false':
            'SCAN-FED: build side is a scan/projection with parquet file-size statistics — accurate at every scale, the planner re-decides and flips to shuffle when the table outgrows the threshold',
    },
    'q19_disjunctive': {
        'BroadcastHashJoin [l_partkey], [p_partkey], Inner, BuildRight, ((((p_brand = Brand) AND ((l_quantity >= 1.0) AND (l_quantity <= 11.0))) OR ((p_brand = Brand) AND ((l_quantity >= 10.0) AND (l_quantity ':
            'SCAN-FED: build side is a scan/projection with parquet file-size statistics — accurate at every scale, the planner re-decides and flips to shuffle when the table outgrows the threshold',
    },
    'q20_heavy_shippers': {
        'BroadcastHashJoin [l_partkey], [p_partkey], LeftSemi, BuildRight, false':
            'SCAN-FED: build side is a scan/projection with parquet file-size statistics — accurate at every scale, the planner re-decides and flips to shuffle when the table outgrows the threshold',
        'BroadcastHashJoin [s_suppkey], [l_suppkey], LeftSemi, BuildRight, false':
            'SCAN-FED: build side is a scan/projection with parquet file-size statistics — accurate at every scale, the planner re-decides and flips to shuffle when the table outgrows the threshold',
    },
    'q21_sole_returner': {
        'BroadcastHashJoin [l_orderkey], [l_orderkey], LeftAnti, BuildRight, NOT (l_suppkey = l_suppkey), false':
            'SCAN-FED: build side is a scan/projection with parquet file-size statistics — accurate at every scale, the planner re-decides and flips to shuffle when the table outgrows the threshold',
        'BroadcastHashJoin [l_orderkey], [l_orderkey], LeftSemi, BuildRight, NOT (l_suppkey = l_suppkey), false':
            'SCAN-FED: build side is a scan/projection with parquet file-size statistics — accurate at every scale, the planner re-decides and flips to shuffle when the table outgrows the threshold',
        'BroadcastHashJoin [l_orderkey], [o_orderkey], Inner, BuildRight, false':
            'SCAN-FED: build side is a scan/projection with parquet file-size statistics — accurate at every scale, the planner re-decides and flips to shuffle when the table outgrows the threshold',
        'BroadcastHashJoin [l_suppkey], [s_suppkey], Inner, BuildRight, false':
            'SCAN-FED: build side is a scan/projection with parquet file-size statistics — accurate at every scale, the planner re-decides and flips to shuffle when the table outgrows the threshold',
    },
    'q22_idle_balances': {
        'BroadcastHashJoin [c_custkey], [o_custkey], LeftAnti, BuildRight, false':
            'SCAN-FED: build side is a scan/projection with parquet file-size statistics — accurate at every scale, the planner re-decides and flips to shuffle when the table outgrows the threshold',
        'BroadcastNestedLoopJoin BuildRight, Inner, ((bal_dec * cast(cnt as decimal(20,0))) > cast(total as decimal(38,6)))':
            'BOUNDED: bounded-domain BroadcastNestedLoopJoin — 1-row scalar aggregates, settings/spine frames or per-bounded-group extrema (the scale_lint BNLJ_DOCUMENTED class) — comparison against a broadcast 1-row total',
    },
    'q2_min_cost_supplier': {
        'BroadcastHashJoin [l_partkey], [p_partkey], Inner, BuildRight, false':
            'SCAN-FED: build side is a scan/projection with parquet file-size statistics — accurate at every scale, the planner re-decides and flips to shuffle when the table outgrows the threshold',
        'BroadcastHashJoin [l_partkey], [p_partkey], LeftSemi, BuildRight, false':
            'SCAN-FED: build side is a scan/projection with parquet file-size statistics — accurate at every scale, the planner re-decides and flips to shuffle when the table outgrows the threshold',
        'BroadcastHashJoin [l_suppkey], [s_suppkey], Inner, BuildRight, false':
            'SCAN-FED: build side is a scan/projection with parquet file-size statistics — accurate at every scale, the planner re-decides and flips to shuffle when the table outgrows the threshold',
        'BroadcastHashJoin [s_nationkey], [n_nationkey], Inner, BuildRight, false':
            'SCAN-FED: build side is a scan/projection with parquet file-size statistics — accurate at every scale, the planner re-decides and flips to shuffle when the table outgrows the threshold',
    },
    'q3_shipping_priority': {
        'BroadcastHashJoin [l_orderkey], [o_orderkey], Inner, BuildRight, false':
            'SCAN-FED: build side is a scan/projection with parquet file-size statistics — accurate at every scale, the planner re-decides and flips to shuffle when the table outgrows the threshold',
        'BroadcastHashJoin [o_custkey], [c_custkey], Inner, BuildRight, false':
            'SCAN-FED: build side is a scan/projection with parquet file-size statistics — accurate at every scale, the planner re-decides and flips to shuffle when the table outgrows the threshold',
    },
    'q4_order_priority': {
        'BroadcastHashJoin [o_orderkey], [l_orderkey], LeftSemi, BuildRight, (l_shipdate > o_orderdate), false':
            'SCAN-FED: build side is a scan/projection with parquet file-size statistics — accurate at every scale, the planner re-decides and flips to shuffle when the table outgrows the threshold',
    },
    'q5_region_supplier_volume': {
        'BroadcastHashJoin [l_orderkey], [o_orderkey], Inner, BuildRight, false':
            'SCAN-FED: build side is a scan/projection with parquet file-size statistics — accurate at every scale, the planner re-decides and flips to shuffle when the table outgrows the threshold',
        'BroadcastHashJoin [l_suppkey, c_nationkey], [s_suppkey, s_nationkey], Inner, BuildRight, false':
            'SCAN-FED: build side is a scan/projection with parquet file-size statistics — accurate at every scale, the planner re-decides and flips to shuffle when the table outgrows the threshold',
        'BroadcastHashJoin [n_regionkey], [r_regionkey], Inner, BuildRight, false':
            'SCAN-FED: build side is a scan/projection with parquet file-size statistics — accurate at every scale, the planner re-decides and flips to shuffle when the table outgrows the threshold',
        'BroadcastHashJoin [o_custkey], [c_custkey], Inner, BuildRight, false':
            'SCAN-FED: build side is a scan/projection with parquet file-size statistics — accurate at every scale, the planner re-decides and flips to shuffle when the table outgrows the threshold',
        'BroadcastHashJoin [s_nationkey], [n_nationkey], Inner, BuildRight, false':
            'SCAN-FED: build side is a scan/projection with parquet file-size statistics — accurate at every scale, the planner re-decides and flips to shuffle when the table outgrows the threshold',
    },
    'q7_nation_volume': {
        'BroadcastHashJoin [c_nationkey], [cn_key], Inner, BuildRight, NOT (supp_nation = cust_nation), false':
            'SCAN-FED: build side is a scan/projection with parquet file-size statistics — accurate at every scale, the planner re-decides and flips to shuffle when the table outgrows the threshold',
        'BroadcastHashJoin [l_orderkey], [o_orderkey], Inner, BuildRight, false':
            'SCAN-FED: build side is a scan/projection with parquet file-size statistics — accurate at every scale, the planner re-decides and flips to shuffle when the table outgrows the threshold',
        'BroadcastHashJoin [l_suppkey], [s_suppkey], Inner, BuildRight, false':
            'SCAN-FED: build side is a scan/projection with parquet file-size statistics — accurate at every scale, the planner re-decides and flips to shuffle when the table outgrows the threshold',
        'BroadcastHashJoin [o_custkey], [c_custkey], Inner, BuildRight, false':
            'SCAN-FED: build side is a scan/projection with parquet file-size statistics — accurate at every scale, the planner re-decides and flips to shuffle when the table outgrows the threshold',
        'BroadcastHashJoin [s_nationkey], [sn_key], Inner, BuildRight, false':
            'SCAN-FED: build side is a scan/projection with parquet file-size statistics — accurate at every scale, the planner re-decides and flips to shuffle when the table outgrows the threshold',
    },
    'q8_market_share': {
        'BroadcastHashJoin [c_nationkey], [n_nationkey], Inner, BuildRight, false':
            'SCAN-FED: build side is a scan/projection with parquet file-size statistics — accurate at every scale, the planner re-decides and flips to shuffle when the table outgrows the threshold',
        'BroadcastHashJoin [l_orderkey], [o_orderkey], Inner, BuildRight, false':
            'SCAN-FED: build side is a scan/projection with parquet file-size statistics — accurate at every scale, the planner re-decides and flips to shuffle when the table outgrows the threshold',
        'BroadcastHashJoin [l_suppkey], [s_suppkey], Inner, BuildRight, false':
            'SCAN-FED: build side is a scan/projection with parquet file-size statistics — accurate at every scale, the planner re-decides and flips to shuffle when the table outgrows the threshold',
        'BroadcastHashJoin [n_regionkey], [r_regionkey], Inner, BuildRight, false':
            'SCAN-FED: build side is a scan/projection with parquet file-size statistics — accurate at every scale, the planner re-decides and flips to shuffle when the table outgrows the threshold',
        'BroadcastHashJoin [o_custkey], [c_custkey], Inner, BuildRight, false':
            'SCAN-FED: build side is a scan/projection with parquet file-size statistics — accurate at every scale, the planner re-decides and flips to shuffle when the table outgrows the threshold',
        'BroadcastHashJoin [s_nationkey], [n_nationkey], Inner, BuildRight, false':
            'SCAN-FED: build side is a scan/projection with parquet file-size statistics — accurate at every scale, the planner re-decides and flips to shuffle when the table outgrows the threshold',
    },
    'q9_product_profit': {
        'BroadcastHashJoin [l_orderkey], [o_orderkey], Inner, BuildRight, false':
            'SCAN-FED: build side is a scan/projection with parquet file-size statistics — accurate at every scale, the planner re-decides and flips to shuffle when the table outgrows the threshold',
        'BroadcastHashJoin [l_partkey, l_suppkey], [l_partkey, l_suppkey], Inner, BuildRight, false':
            'SCAN-FED: build side is a scan/projection with parquet file-size statistics — accurate at every scale, the planner re-decides and flips to shuffle when the table outgrows the threshold',
        'BroadcastHashJoin [l_partkey], [p_partkey], Inner, BuildRight, false':
            'SCAN-FED: build side is a scan/projection with parquet file-size statistics — accurate at every scale, the planner re-decides and flips to shuffle when the table outgrows the threshold',
        'BroadcastHashJoin [l_partkey], [p_partkey], LeftSemi, BuildRight, false':
            'SCAN-FED: build side is a scan/projection with parquet file-size statistics — accurate at every scale, the planner re-decides and flips to shuffle when the table outgrows the threshold',
        'BroadcastHashJoin [l_suppkey], [s_suppkey], Inner, BuildRight, false':
            'SCAN-FED: build side is a scan/projection with parquet file-size statistics — accurate at every scale, the planner re-decides and flips to shuffle when the table outgrows the threshold',
        'BroadcastHashJoin [s_nationkey], [n_nationkey], Inner, BuildRight, false':
            'SCAN-FED: build side is a scan/projection with parquet file-size statistics — accurate at every scale, the planner re-decides and flips to shuffle when the table outgrows the threshold',
    },
    'q_approx_distinct': {
        'BroadcastHashJoin [o_orderstatus], [o_orderstatus], Inner, BuildRight, false':
            'BOUNDED: per-group aggregate/spine over a bounded key domain (flags, priorities, buckets, calendar spine, source catalog, CIDR table, synthetic key domain) — rows <= domain size, independent of corpus scale',
    },
    'q_bitmap_distinct': {
        'BroadcastHashJoin [l_returnflag], [l_returnflag], Inner, BuildRight, false':
            'BOUNDED: per-group aggregate/spine over a bounded key domain (flags, priorities, buckets, calendar spine, source catalog, CIDR table, synthetic key domain) — rows <= domain size, independent of corpus scale',
    },
    'q_cidr_enrich': {
        'BroadcastHashJoin [prefix], [prefix], LeftOuter, BuildRight, false':
            'BOUNDED: per-group aggregate/spine over a bounded key domain (flags, priorities, buckets, calendar spine, source catalog, CIDR table, synthetic key domain) — rows <= domain size, independent of corpus scale',
    },
    'q_cohort_retention': {
        'BroadcastHashJoin [cohort_week], [cohort_week], Inner, BuildRight, false':
            'BOUNDED: per-group aggregate/spine over a bounded key domain (flags, priorities, buckets, calendar spine, source catalog, CIDR table, synthetic key domain) — rows <= domain size, independent of corpus scale',
        'BroadcastHashJoin [user_id], [user_id], Inner, BuildRight, false':
            'EVENTS-AGG: per-user aggregate over the events scan — estimate tracks the scan (the SCAN-FED mechanism); the x100 replica set carries no events table, so the x100 probe is pending (tools/gen_broadcast_allowlist.py reports the skip on every regeneration)',
    },
    'q_concurrent_intervals': {
        'BroadcastHashJoin [o_orderkey], [l_orderkey], Inner, BuildLeft, false':
            'SCAN-FED: build side is a scan/projection with parquet file-size statistics — accurate at every scale, the planner re-decides and flips to shuffle when the table outgrows the threshold',
        'BroadcastHashJoin [yr], [yr], Inner, BuildRight, false':
            'BOUNDED: per-group aggregate/spine over a bounded key domain (flags, priorities, buckets, calendar spine, source catalog, CIDR table, synthetic key domain) — rows <= domain size, independent of corpus scale',
        'BroadcastNestedLoopJoin BuildRight, LeftOuter, (yr < yr)':
            'BOUNDED: bounded-domain BroadcastNestedLoopJoin — 1-row scalar aggregates, settings/spine frames or per-bounded-group extrema (the scale_lint BNLJ_DOCUMENTED class)',
    },
    'q_copurchase_pairs': {
        'BroadcastHashJoin [l_orderkey], [l_orderkey], Inner, BuildRight, (part_a < part_b), false':
            'SCAN-FED: build side is a scan/projection with parquet file-size statistics — accurate at every scale, the planner re-decides and flips to shuffle when the table outgrows the threshold',
    },
    'q_customer_order_counts': {
        'BroadcastHashJoin [c_custkey], [o_custkey], LeftOuter, BuildRight, false':
            'SCAN-FED: build side is a scan/projection with parquet file-size statistics — accurate at every scale, the planner re-decides and flips to shuffle when the table outgrows the threshold',
    },
    'q_customers_without_orders': {
        'BroadcastHashJoin [c_custkey], [o_custkey], LeftAnti, BuildRight, false':
            'SCAN-FED: build side is a scan/projection with parquet file-size statistics — accurate at every scale, the planner re-decides and flips to shuffle when the table outgrows the threshold',
    },
    'q_decayed_popularity': {
        'BroadcastNestedLoopJoin BuildRight, Cross':
            'BOUNDED: crossJoin of a 1-row/bounded frame (scalar aggregates, settings frames, query workloads) — the documented bounded-domain BNLJ class',
    },
    'q_distinct_and_percentiles': {
        'BroadcastHashJoin [l_returnflag], [l_returnflag], Inner, BuildRight, false':
            'BOUNDED: per-group aggregate/spine over a bounded key domain (flags, priorities, buckets, calendar spine, source catalog, CIDR table, synthetic key domain) — rows <= domain size, independent of corpus scale',
    },
    'q_gapfill_buckets': {
        'BroadcastHashJoin [bucket], [bucket], LeftOuter, BuildRight, false':
            'BOUNDED: per-group aggregate/spine over a bounded key domain (flags, priorities, buckets, calendar spine, source catalog, CIDR table, synthetic key domain) — rows <= domain size, independent of corpus scale',
    },
    'q_iqr_outliers': {
        'BroadcastHashJoin [o_orderpriority], [o_orderpriority], Inner, BuildRight, false':
            'BOUNDED: per-group aggregate/spine over a bounded key domain (flags, priorities, buckets, calendar spine, source catalog, CIDR table, synthetic key domain) — rows <= domain size, independent of corpus scale',
    },
    'q_join_size_estimate': {
        'BroadcastHashJoin [key], [key], Inner, BuildRight, false':
            'BOUNDED: per-group aggregate/spine over a bounded key domain (flags, priorities, buckets, calendar spine, source catalog, CIDR table, synthetic key domain) — rows <= domain size, independent of corpus scale',
        'BroadcastNestedLoopJoin BuildRight, Cross':
            'BOUNDED: crossJoin of a 1-row/bounded frame (scalar aggregates, settings frames, query workloads) — the documented bounded-domain BNLJ class',
    },
    'q_key_skew_report': {
        'BroadcastNestedLoopJoin BuildRight, Cross':
            'BOUNDED: crossJoin of a 1-row/bounded frame (scalar aggregates, settings frames, query workloads) — the documented bounded-domain BNLJ class',
    },
    'q_link_prediction_aa': {
        'BroadcastHashJoin [l_orderkey], [l_orderkey], Inner, BuildRight, (part_a < part_b), false':
            'SCAN-FED: build side is a scan/projection with parquet file-size statistics — accurate at every scale, the planner re-decides and flips to shuffle when the table outgrows the threshold',
        'BroadcastHashJoin [l_orderkey], [l_orderkey], Inner, BuildRight, false':
            'SCAN-FED: build side is a scan/projection with parquet file-size statistics — accurate at every scale, the planner re-decides and flips to shuffle when the table outgrows the threshold',
    },
    'q_pagerank_trade': {
        'BroadcastHashJoin [o_orderkey], [l_orderkey], Inner, BuildLeft, false':
            'SCAN-FED: build side is a scan/projection with parquet file-size statistics — accurate at every scale, the planner re-decides and flips to shuffle when the table outgrows the threshold',
    },
    'q_pure_range_join': {
        'BroadcastHashJoin [_bucket], [_bucket], Inner, BuildRight, ((x >= lo) AND (x < hi)), false':
            'BOUNDED: per-group aggregate/spine over a bounded key domain (flags, priorities, buckets, calendar spine, source catalog, CIDR table, synthetic key domain) — rows <= domain size, independent of corpus scale',
    },
    'q_recursive_months': {
        'BroadcastHashJoin [ym], [ym], LeftOuter, BuildRight, false':
            'BOUNDED: per-group aggregate/spine over a bounded key domain (flags, priorities, buckets, calendar spine, source catalog, CIDR table, synthetic key domain) — rows <= domain size, independent of corpus scale',
        'BroadcastNestedLoopJoin BuildRight, Cross, ((((yr * 12) + cast(i as bigint)) >= mn) AND (((yr * 12) + cast(i as bigint)) <= mx))':
            'BOUNDED: crossJoin of a 1-row/bounded frame (scalar aggregates, settings frames, query workloads) — the documented bounded-domain BNLJ class',
    },
    'q_ri_audit': {
        'BroadcastHashJoin [l_orderkey], [o_orderkey], LeftOuter, BuildRight, false':
            'SCAN-FED: build side is a scan/projection with parquet file-size statistics — accurate at every scale, the planner re-decides and flips to shuffle when the table outgrows the threshold',
        'BroadcastHashJoin [l_partkey], [p_partkey], LeftOuter, BuildRight, false':
            'SCAN-FED: build side is a scan/projection with parquet file-size statistics — accurate at every scale, the planner re-decides and flips to shuffle when the table outgrows the threshold',
        'BroadcastHashJoin [l_suppkey], [s_suppkey], LeftOuter, BuildRight, false':
            'SCAN-FED: build side is a scan/projection with parquet file-size statistics — accurate at every scale, the planner re-decides and flips to shuffle when the table outgrows the threshold',
        'BroadcastHashJoin [o_custkey], [c_custkey], LeftOuter, BuildRight, false':
            'SCAN-FED: build side is a scan/projection with parquet file-size statistics — accurate at every scale, the planner re-decides and flips to shuffle when the table outgrows the threshold',
    },
    'q_salted_join_enrich': {
        'BroadcastHashJoin [l_returnflag, _salt], [l_returnflag, _salt], Inner, BuildRight, false':
            'BOUNDED: per-group aggregate/spine over a bounded key domain (flags, priorities, buckets, calendar spine, source catalog, CIDR table, synthetic key domain) — rows <= domain size, independent of corpus scale',
    },
    'q_segment_set_ops': {
        'BroadcastHashJoin [coalesce(o_custkey, 0), isnull(o_custkey)], [coalesce(custkey, 0), isnull(custkey)], LeftSemi, BuildRight, false':
            'SCAN-FED: build side is a scan/projection with parquet file-size statistics — accurate at every scale, the planner re-decides and flips to shuffle when the table outgrows the threshold',
        'BroadcastHashJoin [o_custkey], [c_custkey], Inner, BuildRight, false':
            'SCAN-FED: build side is a scan/projection with parquet file-size statistics — accurate at every scale, the planner re-decides and flips to shuffle when the table outgrows the threshold',
    },
    'q_ship_within_week': {
        'BroadcastHashJoin [l_orderkey], [o_orderkey], Inner, BuildRight, ((l_shipdate >= o_orderdate) AND (l_shipdate < cast(date_add(cast(o_orderdate as date), 7) as timestamp_ntz))), false':
            'SCAN-FED: build side is a scan/projection with parquet file-size statistics — accurate at every scale, the planner re-decides and flips to shuffle when the table outgrows the threshold',
    },
    'q_skyline_pareto': {
        'BroadcastHashJoin [knownfloatingpointnormalized(normalizenanandzero(p_retailprice)), p_size], [knownfloatingpointnormalized(normalizenanandzero(m)), p_size], Inner, BuildRight, (isnull(fm) OR (fm > p_':
            'BOUNDED: per-group extremum frame — one row per bounded group domain (argmax/skyline pattern)',
        'BroadcastNestedLoopJoin BuildRight, LeftOuter, (p_size > p_size)':
            'BOUNDED: bounded-domain BroadcastNestedLoopJoin — 1-row scalar aggregates, settings/spine frames or per-bounded-group extrema (the scale_lint BNLJ_DOCUMENTED class)',
    },
    'q_snapshot_drift': {
        'BroadcastNestedLoopJoin BuildRight, Cross':
            'BOUNDED: crossJoin of a 1-row/bounded frame (scalar aggregates, settings frames, query workloads) — the documented bounded-domain BNLJ class',
    },
    'q_sql_surface': {
        'BroadcastHashJoin [c_custkey], [o_custkey], Inner, BuildRight, false':
            'SCAN-FED: build side is a scan/projection with parquet file-size statistics — accurate at every scale, the planner re-decides and flips to shuffle when the table outgrows the threshold',
        'BroadcastHashJoin [c_nationkey], [n_nationkey], Inner, BuildLeft, false':
            'SCAN-FED: build side is a scan/projection with parquet file-size statistics — accurate at every scale, the planner re-decides and flips to shuffle when the table outgrows the threshold',
        'BroadcastHashJoin [c_nationkey], [n_nationkey], Inner, BuildRight, false':
            'SCAN-FED: build side is a scan/projection with parquet file-size statistics — accurate at every scale, the planner re-decides and flips to shuffle when the table outgrows the threshold',
    },
    'q_target_encode_lofo': {
        'BroadcastHashJoin [cat], [cat], Inner, BuildRight, false':
            'BOUNDED: per-group aggregate/spine over a bounded key domain (flags, priorities, buckets, calendar spine, source catalog, CIDR table, synthetic key domain) — rows <= domain size, independent of corpus scale',
    },
    'q_topk_parts_per_brand': {
        'BroadcastHashJoin [l_partkey], [p_partkey], Inner, BuildRight, false':
            'SCAN-FED: build side is a scan/projection with parquet file-size statistics — accurate at every scale, the planner re-decides and flips to shuffle when the table outgrows the threshold',
    },
    'q_triangle_suppliers': {
        'BroadcastHashJoin [l_orderkey], [l_orderkey], Inner, BuildRight, (l_suppkey < r_suppkey), false':
            'SCAN-FED: build side is a scan/projection with parquet file-size statistics — accurate at every scale, the planner re-decides and flips to shuffle when the table outgrows the threshold',
        'BroadcastNestedLoopJoin BuildRight, Inner':
            'BOUNDED: documented bounded-domain BNLJ (scale_lint BNLJ_DOCUMENTED allowlist carries the per-query bound)',
    },
    'sim_ann_ivf_topk': {
        'BroadcastHashJoin [cell], [cell], Inner, BuildLeft, NOT (vec_id = query_id), false':
            'BOUNDED: query-workload side — bounded by the benchmark query set (and k candidates per query), independent of corpus size',
    },
    'sim_ann_lsh_topk': {
        'BroadcastHashJoin [lsh_key], [lsh_key], Inner, BuildLeft, NOT (vec_id = query_id), false':
            'BOUNDED: query-workload side — bounded by the benchmark query set (and k candidates per query), independent of corpus size',
    },
    'sim_int8_rerank': {
        'BroadcastHashJoin [query_id], [query_id], Inner, BuildRight, false':
            'BOUNDED: query-workload side — bounded by the benchmark query set (and k candidates per query), independent of corpus size',
        'BroadcastHashJoin [vec_id], [vec_id], Inner, BuildRight, false':
            'BOUNDED: rerank candidate-id side — |queries| x k ids by construction (prefilter output), independent of corpus size',
        'BroadcastNestedLoopJoin BuildRight, Cross, NOT (vec_id = query_id)':
            'BOUNDED: crossJoin of a 1-row/bounded frame (scalar aggregates, settings frames, query workloads) — the documented bounded-domain BNLJ class',
    },
    'sim_int8_topk': {
        'BroadcastNestedLoopJoin BuildRight, Cross, NOT (vec_id = query_id)':
            'BOUNDED: crossJoin of a 1-row/bounded frame (scalar aggregates, settings frames, query workloads) — the documented bounded-domain BNLJ class',
    },
    'sim_ivf_tradeoff': {
        'BroadcastHashJoin [cell], [cell], Inner, BuildRight, false':
            'BOUNDED: build side is the explicit broadcast of the probe frame — |queries| x max(n_probes) rows by construction (query-workload-bounded), joined into the ~sqrt(n)-row cell occupancy table',
        'BroadcastHashJoin [n_probe], [n_probe], LeftOuter, BuildRight, false':
            'BOUNDED: per-setting metric counts — one row per swept n_probe setting',
        'BroadcastHashJoin [query_id, cell], [query_id, cell], Inner, BuildRight, false':
            "BOUNDED: build side is the explicit broadcast of the probe frame (|queries| x max(n_probes) rows); probe side is the |queries| x k truth-pair frame — both query-workload-bounded (the left join's NULLs are provably dropped downstream, so the optimizer's Inner conversion is semantics-preserving)",
        'BroadcastHashJoin [vec_id], [vec_id], Inner, BuildRight, false':
            'BOUNDED: rerank candidate-id side — |queries| x k ids by construction (brute-force truth output), independent of corpus size',
        'BroadcastNestedLoopJoin BuildRight, Cross':
            'BOUNDED: crossJoin of 1-row scalar count frames (n_queries, n_corpus) — the documented bounded-domain BNLJ class',
        'BroadcastNestedLoopJoin BuildRight, Cross, NOT (vec_id = query_id)':
            "BOUNDED: query-workload side — brute_force_topk's broadcast queries x corpus truth scan, bounded by the benchmark query set, the measurement query's documented cost",
    },
    'sim_ivfpq_topk': {
        'BroadcastHashJoin [cell], [cell], Inner, BuildRight, NOT (vec_id = query_id), false':
            'BOUNDED: query-workload side — bounded by the benchmark query set (and k candidates per query), independent of corpus size',
    },
    'sim_matryoshka_rerank': {
        'BroadcastHashJoin [query_id], [query_id], Inner, BuildRight, false':
            'BOUNDED: query-workload side — bounded by the benchmark query set (and k candidates per query), independent of corpus size',
        'BroadcastHashJoin [vec_id], [vec_id], Inner, BuildRight, false':
            'BOUNDED: rerank candidate-id side — |queries| x k ids by construction (prefilter output), independent of corpus size',
        'BroadcastNestedLoopJoin BuildRight, Cross, NOT (vec_id = query_id)':
            'BOUNDED: crossJoin of a 1-row/bounded frame (scalar aggregates, settings frames, query workloads) — the documented bounded-domain BNLJ class',
    },
    'sim_matryoshka_tradeoff': {
        'BroadcastHashJoin [d_small], [d_small], LeftOuter, BuildRight, false':
            'BOUNDED: per-setting metric counts — one row per swept prefix width',
        'BroadcastNestedLoopJoin BuildRight, Cross':
            'BOUNDED: crossJoin of a 1-row/bounded frame (scalar aggregates, settings frames, query workloads) — the documented bounded-domain BNLJ class',
        'BroadcastNestedLoopJoin BuildRight, Cross, NOT (vec_id = query_id)':
            'BOUNDED: crossJoin of a 1-row/bounded frame (scalar aggregates, settings frames, query workloads) — the documented bounded-domain BNLJ class',
    },
    'sim_pq_adc_topk': {
        'BroadcastNestedLoopJoin BuildRight, Cross, NOT (vec_id = query_id)':
            'BOUNDED: crossJoin of a 1-row/bounded frame (scalar aggregates, settings frames, query workloads) — the documented bounded-domain BNLJ class',
    },
    'sim_topk_bruteforce': {
        'BroadcastNestedLoopJoin BuildRight, Cross, NOT (vec_id = query_id)':
            'BOUNDED: crossJoin of a 1-row/bounded frame (scalar aggregates, settings frames, query workloads) — the documented bounded-domain BNLJ class',
    },
    'sketch_cms_topk': {
        'BroadcastHashJoin [j, h], [j, h], Inner, BuildRight, false':
            'BOUNDED: Count-Min-Sketch counter table — depth x width cells by construction',
    },
    'text_bm25_topk': {
        'BroadcastHashJoin [doc_id], [doc_id], Inner, BuildLeft, false':
            "X100-RAN-CLEAN: corpus-scaled build side the static planner still broadcasts at x100, where the query EXECUTED clean (tools/bhj_sweep_r13.py r13/r14: all flagged queries ran, no OOM). Two decades validated; merge pin deferred (it also blocks AQE's runtime-measured conversions, +20-51% measured r14) — re-run the bhj sweep after touching this site and pin on demonstrated build/spill pain (the posting self-join precedent)",
        'BroadcastNestedLoopJoin BuildRight, Cross':
            'BOUNDED: crossJoin of a 1-row/bounded frame (scalar aggregates, settings frames, query workloads) — the documented bounded-domain BNLJ class',
    },
    'text_fingerprint': {
        'BroadcastHashJoin [doc_id], [doc_id], LeftOuter, BuildRight, false':
            "X100-RAN-CLEAN: corpus-scaled build side the static planner still broadcasts at x100, where the query EXECUTED clean (tools/bhj_sweep_r13.py r13/r14: all flagged queries ran, no OOM). Two decades validated; merge pin deferred (it also blocks AQE's runtime-measured conversions, +20-51% measured r14) — re-run the bhj sweep after touching this site and pin on demonstrated build/spill pain (the posting self-join precedent)",
    },
    'text_hybrid_rrf': {
        'BroadcastHashJoin [doc_id], [doc_id], Inner, BuildLeft, false':
            "X100-RAN-CLEAN: corpus-scaled build side the static planner still broadcasts at x100, where the query EXECUTED clean (tools/bhj_sweep_r13.py r13/r14: all flagged queries ran, no OOM). Two decades validated; merge pin deferred (it also blocks AQE's runtime-measured conversions, +20-51% measured r14) — re-run the bhj sweep after touching this site and pin on demonstrated build/spill pain (the posting self-join precedent)",
        'BroadcastNestedLoopJoin BuildRight, Cross':
            'BOUNDED: crossJoin of a 1-row/bounded frame (scalar aggregates, settings frames, query workloads) — the documented bounded-domain BNLJ class',
    },
    'text_ngram_novelty': {
        'BroadcastHashJoin [doc_id], [doc_id], LeftOuter, BuildRight, false':
            "X100-RAN-CLEAN: corpus-scaled build side the static planner still broadcasts at x100, where the query EXECUTED clean (tools/bhj_sweep_r13.py r13/r14: all flagged queries ran, no OOM). Two decades validated; merge pin deferred (it also blocks AQE's runtime-measured conversions, +20-51% measured r14) — re-run the bhj sweep after touching this site and pin on demonstrated build/spill pain (the posting self-join precedent)",
        'BroadcastHashJoin [g], [g], Inner, BuildRight, false':
            "X100-RAN-CLEAN: corpus-scaled build side the static planner still broadcasts at x100, where the query EXECUTED clean (tools/bhj_sweep_r13.py r13/r14: all flagged queries ran, no OOM). Two decades validated; merge pin deferred (it also blocks AQE's runtime-measured conversions, +20-51% measured r14) — re-run the bhj sweep after touching this site and pin on demonstrated build/spill pain (the posting self-join precedent)",
    },
    'text_pmi_collocations': {
        'BroadcastHashJoin [w1], [w1], Inner, BuildRight, false':
            "X100-RAN-CLEAN: corpus-scaled build side the static planner still broadcasts at x100, where the query EXECUTED clean (tools/bhj_sweep_r13.py r13/r14: all flagged queries ran, no OOM). Two decades validated; merge pin deferred (it also blocks AQE's runtime-measured conversions, +20-51% measured r14) — re-run the bhj sweep after touching this site and pin on demonstrated build/spill pain (the posting self-join precedent)",
        'BroadcastHashJoin [w2], [w2], Inner, BuildRight, false':
            "X100-RAN-CLEAN: corpus-scaled build side the static planner still broadcasts at x100, where the query EXECUTED clean (tools/bhj_sweep_r13.py r13/r14: all flagged queries ran, no OOM). Two decades validated; merge pin deferred (it also blocks AQE's runtime-measured conversions, +20-51% measured r14) — re-run the bhj sweep after touching this site and pin on demonstrated build/spill pain (the posting self-join precedent)",
        'BroadcastNestedLoopJoin BuildRight, Cross':
            'BOUNDED: crossJoin of a 1-row/bounded frame (scalar aggregates, settings frames, query workloads) — the documented bounded-domain BNLJ class',
    },
    'text_quality': {
        'BroadcastHashJoin [doc_id], [doc_id], LeftOuter, BuildRight, false':
            "X100-RAN-CLEAN: corpus-scaled build side the static planner still broadcasts at x100, where the query EXECUTED clean (tools/bhj_sweep_r13.py r13/r14: all flagged queries ran, no OOM). Two decades validated; merge pin deferred (it also blocks AQE's runtime-measured conversions, +20-51% measured r14) — re-run the bhj sweep after touching this site and pin on demonstrated build/spill pain (the posting self-join precedent)",
    },
    'text_rake_keyphrases': {
        'BroadcastHashJoin [doc_id, grp], [doc_id, grp], Inner, BuildRight, false':
            "X100-RAN-CLEAN: corpus-scaled build side the static planner still broadcasts at x100, where the query EXECUTED clean (tools/bhj_sweep_r13.py r13/r14: all flagged queries ran, no OOM). Two decades validated; merge pin deferred (it also blocks AQE's runtime-measured conversions, +20-51% measured r14) — re-run the bhj sweep after touching this site and pin on demonstrated build/spill pain (the posting self-join precedent)",
        'BroadcastHashJoin [w], [w], Inner, BuildRight, false':
            "X100-RAN-CLEAN: corpus-scaled build side the static planner still broadcasts at x100, where the query EXECUTED clean (tools/bhj_sweep_r13.py r13/r14: all flagged queries ran, no OOM). Two decades validated; merge pin deferred (it also blocks AQE's runtime-measured conversions, +20-51% measured r14) — re-run the bhj sweep after touching this site and pin on demonstrated build/spill pain (the posting self-join precedent)",
    },
    'text_repetition': {
        'BroadcastHashJoin [doc_id], [doc_id], LeftOuter, BuildRight, false':
            "X100-RAN-CLEAN: corpus-scaled build side the static planner still broadcasts at x100, where the query EXECUTED clean (tools/bhj_sweep_r13.py r13/r14: all flagged queries ran, no OOM). Two decades validated; merge pin deferred (it also blocks AQE's runtime-measured conversions, +20-51% measured r14) — re-run the bhj sweep after touching this site and pin on demonstrated build/spill pain (the posting self-join precedent)",
    },
    'text_tfidf_cosine_rerank': {
        'BroadcastHashJoin [band, key], [band, key], Inner, BuildRight, (doc_a < doc_b), false':
            'X100-FLIPS: corpus-scaled build side whose size estimate tracks the input — the static planner flips this site to sort-merge by the x100 replica scale (plan probe); the broadcast appears only at gate-fixture sizes where it is genuinely optimal',
        'BroadcastHashJoin [band, key], [band, key], LeftAnti, BuildRight, false':
            'BOUNDED: heavy-bucket key list — <= n_rows/bucket_cap keys by construction (occupancy-cap aggregate)',
        'BroadcastHashJoin [doc_a], [doc_a], Inner, BuildRight, false':
            "X100-RAN-CLEAN: corpus-scaled build side the static planner still broadcasts at x100, where the query EXECUTED clean (tools/bhj_sweep_r13.py r13/r14: all flagged queries ran, no OOM). Two decades validated; merge pin deferred (it also blocks AQE's runtime-measured conversions, +20-51% measured r14) — re-run the bhj sweep after touching this site and pin on demonstrated build/spill pain (the posting self-join precedent)",
        'BroadcastHashJoin [doc_b, term], [doc_b, term], Inner, BuildRight, false':
            "X100-RAN-CLEAN: corpus-scaled build side the static planner still broadcasts at x100, where the query EXECUTED clean (tools/bhj_sweep_r13.py r13/r14: all flagged queries ran, no OOM). Two decades validated; merge pin deferred (it also blocks AQE's runtime-measured conversions, +20-51% measured r14) — re-run the bhj sweep after touching this site and pin on demonstrated build/spill pain (the posting self-join precedent)",
        'BroadcastHashJoin [doc_b], [doc_b], Inner, BuildRight, false':
            "X100-RAN-CLEAN: corpus-scaled build side the static planner still broadcasts at x100, where the query EXECUTED clean (tools/bhj_sweep_r13.py r13/r14: all flagged queries ran, no OOM). Two decades validated; merge pin deferred (it also blocks AQE's runtime-measured conversions, +20-51% measured r14) — re-run the bhj sweep after touching this site and pin on demonstrated build/spill pain (the posting self-join precedent)",
        'BroadcastHashJoin [term], [term], Inner, BuildRight, false':
            "X100-RAN-CLEAN: corpus-scaled build side the static planner still broadcasts at x100, where the query EXECUTED clean (tools/bhj_sweep_r13.py r13/r14: all flagged queries ran, no OOM). Two decades validated; merge pin deferred (it also blocks AQE's runtime-measured conversions, +20-51% measured r14) — re-run the bhj sweep after touching this site and pin on demonstrated build/spill pain (the posting self-join precedent)",
    },
    'text_tfidf_topterms': {
        'BroadcastHashJoin [term], [term], Inner, BuildRight, false':
            "X100-RAN-CLEAN: corpus-scaled build side the static planner still broadcasts at x100, where the query EXECUTED clean (tools/bhj_sweep_r13.py r13/r14: all flagged queries ran, no OOM). Two decades validated; merge pin deferred (it also blocks AQE's runtime-measured conversions, +20-51% measured r14) — re-run the bhj sweep after touching this site and pin on demonstrated build/spill pain (the posting self-join precedent)",
    },
    'text_trigram_familiarity': {
        'BroadcastHashJoin [doc_id], [doc_id], LeftOuter, BuildRight, false':
            "X100-RAN-CLEAN: corpus-scaled build side the static planner still broadcasts at x100, where the query EXECUTED clean (tools/bhj_sweep_r13.py r13/r14: all flagged queries ran, no OOM). Two decades validated; merge pin deferred (it also blocks AQE's runtime-measured conversions, +20-51% measured r14) — re-run the bhj sweep after touching this site and pin on demonstrated build/spill pain (the posting self-join precedent)",
        'BroadcastHashJoin [g], [g], LeftSemi, BuildRight, false':
            "X100-RAN-CLEAN: corpus-scaled build side the static planner still broadcasts at x100, where the query EXECUTED clean (tools/bhj_sweep_r13.py r13/r14: all flagged queries ran, no OOM). Two decades validated; merge pin deferred (it also blocks AQE's runtime-measured conversions, +20-51% measured r14) — re-run the bhj sweep after touching this site and pin on demonstrated build/spill pain (the posting self-join precedent)",
    },
}
