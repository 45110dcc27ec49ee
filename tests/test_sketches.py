"""Count-min sketch: the properties that make it a sketch.

Determinism is attested by the DuckDB oracle (test_oracle_parity);
these tests pin the structural contract: estimates never undercount,
and the counter grid is bounded by depth x width no matter the input.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dns_log_transformer_spark.operators import sketches
from dns_log_transformer_spark.operators.text import tokens
from dns_log_transformer_spark.session import read_table
from tests.conftest import SF_SMOKE


def test_cms_never_underestimates(spark):
    """CMS estimates are upper bounds: collisions only ADD counts, so
    est >= true for every token — the one-sided error guarantee the
    min-over-rows construction provides."""
    docs = read_table(spark, SF_SMOKE, "documents")
    true_counts = {
        r["tok"]: r["c"]
        for r in docs.select(F.explode(tokens(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("c"))
        .collect()
    }
    est = {r["tok"]: r["est"] for r in sketches.cms_topk(docs, k=10_000).collect()}
    assert set(est) == set(true_counts)
    for tok, e in est.items():
        assert e >= true_counts[tok], f"{tok}: est {e} < true {true_counts[tok]}"


def test_cms_grid_is_bounded(spark):
    """The counter table never exceeds depth*width rows — the whole
    point of the sketch: the aggregation payload is the grid, not the
    vocabulary (fixed at any corpus size)."""
    docs = read_table(spark, SF_SMOKE, "documents")
    grid = sketches.cms_counters(docs, depth=3, width=16)
    rows = grid.collect()
    assert len(rows) <= 3 * 16
    assert {r["j"] for r in rows} <= set(range(3))
    assert all(0 <= r["h"] < 16 for r in rows)
    # mass conservation per row: every instance lands in exactly one
    # bucket per row, so each row's counters sum to the stream length
    n_inst = docs.select(F.explode(tokens(F.col("text")))).count()
    by_row = {}
    for r in rows:
        by_row[r["j"]] = by_row.get(r["j"], 0) + r["c"]
    assert all(v == n_inst for v in by_row.values()), by_row


def test_bloom_decontaminate_supersets_exact(spark):
    """Bloom error is one-sided: per doc, n_maybe_hits >= the exact
    n_hits and every exactly-contaminated doc is bloom-flagged — a false
    negative would leak eval data into training, so the sketch must only
    ever err toward dropping more."""
    from dns_log_transformer_spark.operators import corpus

    docs = read_table(spark, SF_SMOKE, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    exact = {
        r["doc_id"]: (r["n_hits"], r["is_contaminated"])
        for r in corpus.decontaminate(docs, bench, n=8).collect()
    }
    bloom = {
        r["doc_id"]: (r["n_maybe_hits"], r["maybe_contaminated"])
        for r in corpus.bloom_decontaminate(docs, bench, n=8).collect()
    }
    assert set(bloom) == set(exact)
    for doc_id, (n_hits, flagged) in exact.items():
        n_maybe, maybe = bloom[doc_id]
        assert n_maybe >= n_hits, f"doc {doc_id}: bloom {n_maybe} < exact {n_hits}"
        if flagged:
            assert maybe, f"doc {doc_id}: exact contaminated but bloom missed it"


def test_bloom_probe_plan_is_join_free(spark):
    """The probe's 100 TB contract: the corpus side reaches its per-doc
    aggregation through projections only — no join, no extra shuffle.
    (The bitset is a literal array; membership is element_at + bit_get
    inside whole-stage codegen.)"""
    from dns_log_transformer_spark.operators import corpus
    from dns_log_transformer_spark.plans import physical_plan

    docs = read_table(spark, SF_SMOKE, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    plan = physical_plan(corpus.bloom_decontaminate(docs, bench, n=8))
    assert "Join" not in plan, plan


def test_bloom_verified_decon_matches_exact_and_prefilters(spark):
    """The two-stage decontaminate returns the EXACT operator's rows
    value-for-value (the sketch may only change the plan), and the plan
    shows the sketch doing its job: the bit_get probe appears upstream
    of the verification join, so the exact shingle join never sees
    certainly-clean docs."""
    from dns_log_transformer_spark.operators import corpus
    from dns_log_transformer_spark.plans import physical_plan

    docs = read_table(spark, SF_SMOKE, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    exact = {
        r["doc_id"]: (r["n_hits"], r["contam_frac"], r["is_contaminated"])
        for r in corpus.decontaminate(docs, bench, n=8).collect()
    }
    two_stage_df = corpus.bloom_verified_decontaminate(docs, bench, n=8)
    two_stage = {
        r["doc_id"]: (r["n_hits"], r["contam_frac"], r["is_contaminated"])
        for r in two_stage_df.collect()
    }
    assert two_stage == exact
    plan = physical_plan(two_stage_df)
    assert "bit_get" in plan, plan


def test_bloom_word_rows_bounded_and_nonnegative(spark):
    """The bitset build never exceeds ceil(m/63) rows and every word is
    non-negative (63-bit packing keeps the sign bit clear — the DuckDB
    oracle's checked shift can reproduce every word)."""
    docs = read_table(spark, SF_SMOKE, "documents")
    vals = docs.select(F.col("text").alias("v"))
    rows = sketches.bloom_word_rows(vals, "v", k=4, m_bits=1 << 10).collect()
    assert len(rows) <= -(-(1 << 10) // 63)
    assert all(0 <= r["word"] < -(-(1 << 10) // 63) for r in rows)
    assert all(r["bits"] >= 0 for r in rows)


def test_cms_narrower_grid_estimates_dominate(spark):
    """Halving width can only merge collision classes (8 divides 64, so
    tokens colliding mod 64 also collide mod 8): every per-row counter,
    and therefore every min-over-rows estimate, is >= its wide-grid
    counterpart. Pins that error grows monotonically as the grid
    shrinks — the knob a 100 TB deployment turns."""
    docs = read_table(spark, SF_SMOKE, "documents")
    wide = {r["tok"]: r["est"] for r in sketches.cms_topk(docs, k=10_000).collect()}
    narrow = {
        r["tok"]: r["est"]
        for r in sketches.cms_topk(docs, k=10_000, width=8).collect()
    }
    assert set(narrow) == set(wide)
    for tok in wide:
        assert narrow[tok] >= wide[tok], tok
