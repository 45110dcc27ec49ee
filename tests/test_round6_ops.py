"""Unit coverage for the round-6 operators (winnow span dedup, IVF
delta index, kNN labels, TF-IDF, char entropy) — semantics on
constructed inputs plus plan-shape assertions for their scale claims.
Oracle parity at sf0.01 is covered by test_oracle_parity."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from dns_log_transformer_spark.operators import corpus, similarity, text
from dns_log_transformer_spark.plans import physical_plan
from tests.conftest import SF_SMOKE


def test_winnow_span_dedup_finds_variable_length_boilerplate(spark):
    """A ~120-char paragraph shared by two docs (surrounded by distinct
    prose) must surface as ONE maximal span per doc covering most of the
    paragraph — the variable-length detection the fixed-8-gram pass
    cannot express. A third doc without the paragraph yields nothing."""
    boiler = (
        "subscribe to our newsletter for updates terms of service apply "
        "all rights reserved contact support for assistance today"
    )
    docs = spark.createDataFrame(
        [
            (1, f"alpha bravo charlie delta unique one {boiler} tail one xyz"),
            (2, f"completely different opening words here {boiler} other ending"),
            (3, "nothing shared with the others at all just plain text"),
        ],
        "doc_id long, text string",
    )
    spans = corpus.winnow_span_dedup(docs, k=8, w=4, min_anchors=2).collect()
    by_doc = {}
    for r in spans:
        by_doc.setdefault(r["doc_id"], []).append(
            (r["span_start"], r["span_len"], r["n_anchors"])
        )
    assert 3 not in by_doc, "doc without shared content produced spans"
    assert 1 in by_doc and 2 in by_doc
    # the shared paragraph is ~120 chars; the merged span must cover the
    # bulk of it in one island (NOT fragment into 8-char pieces)
    for d in (1, 2):
        longest = max(s_len for _, s_len, _ in by_doc[d])
        assert longest >= 90, f"doc {d} span too short: {by_doc[d]}"
        assert len(by_doc[d]) <= 2, f"doc {d} fragmented: {by_doc[d]}"


def test_winnow_span_dedup_plan_shape(spark):
    """No cartesian product, no row-at-a-time Python; anchor extraction
    is ONE Arrow map pass (never BatchEvalPython); the shared-anchor
    pass is an aggregate + semi-ish join on fp, islands window by doc."""
    docs = spark.range(0, 50).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text body shared portion here "), F.col("id")).alias(
            "text"
        ),
    )
    plan = physical_plan(corpus.winnow_span_dedup(docs), "simple")
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    assert "MapInPandas" in plan
    assert "windowspecdefinition(doc_id" in plan


def test_winnow_anchors_arrow_equals_catalyst(spark):
    """The Arrow anchor fast path is pinned EXACTLY equal to the
    Catalyst winnow_anchors on real fixture text plus the tie/edge
    cases that exercise every branch: repeated-gram hash ties (leftmost
    must win), texts with fewer than w grams (global-min branch), and
    texts shorter than k (dropped)."""
    from dns_log_transformer_spark.operators import text as text_ops

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").limit(200)
    edge = spark.createDataFrame(
        [
            (9_000_001, "aaaaaaaaaaaaaaaaaaaaaaaa"),  # all grams identical
            (9_000_002, "abcdefghij"),  # 3 grams < w -> global min
            (9_000_003, "abcdefgh"),  # exactly one gram
            (9_000_004, "short"),  # < k chars -> no rows
            (9_000_005, "xyzxyzxyzxyzxyzxyzxyz"),  # period-3 repeats
        ],
        "doc_id long, text string",
    )
    both = docs.select("doc_id", "text").unionAll(edge)
    slow = sorted(
        (r["doc_id"], r["pos"], r["fp"])
        for r in text_ops.winnow_anchors(both).collect()
    )
    fast = sorted(
        (r["doc_id"], r["pos"], r["fp"])
        for r in text_ops.winnow_anchors_arrow(both).collect()
    )
    assert len(slow) > 0
    assert fast == slow


def test_char_entropy_known_values(spark):
    df = spark.createDataFrame(
        [(1, "aaaa"), (2, "ab"), (3, "abcd"), (4, ""), (5, None)],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in text.char_entropy(df).collect()}
    assert set(rows) == {1, 2, 3}, "empty/null texts must drop out"
    assert rows[1]["entropy"] == 0.0 and rows[1]["n_chars"] == 4
    assert rows[2]["entropy"] == round(math.log(2), 4)
    assert rows[3]["entropy"] == round(math.log(4), 4)


def test_tfidf_topterms_hand_computed(spark):
    docs = spark.createDataFrame(
        [
            (1, "cat cat dog"),
            (2, "dog fish"),
            (3, "fish fish fish bird"),
        ],
        "doc_id long, text string",
    )
    out = text.tfidf_topterms(docs, n_docs=3, k=2).collect()
    got = {(r["doc_id"], r["rnk"]): (r["term"], r["tfidf"]) for r in out}
    ln = math.log
    # doc 1: cat tf=2 df=1 -> 2*ln(3); dog tf=1 df=2 -> ln(1.5)
    assert got[(1, 1)] == ("cat", round(2 * ln(3), 4))
    assert got[(1, 2)] == ("dog", round(ln(3 / 2), 4))
    # doc 3: fish tf=3 df=2 -> 3*ln(1.5)=1.2164; bird tf=1 df=1 -> ln 3
    assert got[(3, 1)] == ("fish", round(3 * ln(3 / 2), 4))
    assert got[(3, 2)] == ("bird", round(ln(3), 4))


def test_knn_predict_labels_votes_and_ties(spark):
    """Two tight clusters with known labels; a tie case resolves to the
    smallest label."""
    rows = []
    # cluster A (label 1) near (1, 0); cluster B (label 2) near (0, 1)
    for i, eps in enumerate([0.00, 0.01, 0.02, 0.03]):
        rows.append((i, [1.0, eps], 1))
    for i, eps in enumerate([0.00, 0.01, 0.02, 0.03]):
        rows.append((10 + i, [eps, 1.0], 2))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    q = emb.filter(F.col("vec_id") == 0)
    out = similarity.knn_predict_labels(emb, q, k=3).collect()
    assert len(out) == 1
    assert out[0]["pred_label"] == 1 and out[0]["n_votes"] == 3
    # k=6 -> 3 from own cluster (excl. self), 3 from the other: tie ->
    # smallest label wins
    out = similarity.knn_predict_labels(emb, q, k=6).collect()
    assert out[0]["pred_label"] == 1 and out[0]["n_votes"] == 3


def test_knn_label_vote_needs_no_label_join(spark):
    """r10 shape: the neighbor's label rides the top-k through
    brute_force_topk's keep_cols, so the vote needs NO label join and
    the corpus is scanned ONCE (the r9 shape re-scanned it and
    broadcast-joined the |Q| x k neighbors back just to fetch labels —
    the emb_knn_label bench triage). The only join left is the scoring
    cross join against the broadcast query side."""
    emb = spark.range(0, 100).select(
        F.col("id").alias("vec_id"),
        F.array(
            (F.col("id") % 7).cast("double"), (F.col("id") % 3).cast("double")
        ).alias("embedding"),
        (F.col("id") % 4).cast("int").alias("label"),
    )
    q = emb.filter(F.col("vec_id") % 10 == 0)
    plan = physical_plan(similarity.knn_predict_labels(emb, q, k=5), "simple")
    assert "BroadcastHashJoin" not in plan, (
        "label join reintroduced — labels should ride keep_cols"
    )
    assert plan.count("BroadcastNestedLoopJoin") == 1, plan


def test_ivf_assign_matches_topk_cell_choice(spark):
    """ivf_assign's nearest cell equals the n_probe=1 head of the
    attested probe list (same codebook, same tie rule)."""
    emb = spark.range(0, 60).select(
        F.col("vec_id").alias("vec_id")
        if False
        else F.col("id").alias("vec_id"),
        F.array(
            *[((F.col("id") + i) % 5).cast("double") for i in range(4)]
        ).alias("embedding"),
    )
    cb = similarity.pq_codebook(emb, n_cells=4)
    got = {
        r["vec_id"]: r["cell"]
        for r in similarity.ivf_assign(emb, cb).collect()
    }
    cells, mat = cb
    import numpy as np

    vecs = {r["vec_id"]: np.array(r["embedding"]) for r in emb.collect()}
    for vid, v in vecs.items():
        scores = mat @ v
        best = int(cells[int(np.argmax(scores))])
        assert got[vid] == best


def test_sorted_neighborhood_finds_prefix_variants(spark):
    """Docs sharing a long normalized prefix but with divergent tails
    (the variants token-hash blocking can miss) must pair with the
    right edit distance; unrelated docs must not pair."""
    from dns_log_transformer_spark.operators import dedup

    docs = spark.createDataFrame(
        [
            (1, "The   QUICK brown fox jumps over the lazy dog extra tail A"),
            (2, "the quick brown fox jumps over the lazy dog extra tail B"),
            (3, "zzz completely unrelated content about spark partitions"),
            (4, None),
            (5, ""),
        ],
        "doc_id long, text string",
    )
    rows = dedup.sorted_neighborhood_pairs(
        docs, key_len=24, prefix_len=40, window=2, max_distance=5
    ).collect()
    got = {(r["doc_a"], r["doc_b"]): r["edit_distance"] for r in rows}
    # 1 and 2 share the normalized 40-char prefix exactly -> distance 0
    assert got.get((1, 2)) == 0
    # NULL and '' both normalize to '' -> adjacent in sort order, distance 0
    assert got.get((4, 5)) == 0
    # nothing pairs with the unrelated doc within distance 5
    assert not any(3 in p for p in got)


def test_sorted_neighborhood_plan_shape(spark):
    """The candidate join must be an EQUI-join on the neighbor rank (no
    CartesianProduct, no BroadcastNestedLoopJoin from a range
    condition), and the verify must stay JVM-side (no Python nodes)."""
    from dns_log_transformer_spark.operators import dedup
    from dns_log_transformer_spark.session import read_table

    docs = read_table(spark, SF_SMOKE, "documents")
    df = dedup.sorted_neighborhood_pairs(docs)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "EvalPython" not in plan
    assert "levenshtein" in plan


def test_tfidf_cosine_rerank_identical_and_disjoint(spark):
    """Identical docs -> cosine 1.0; candidate pair with no shared term
    -> cosine 0.0 (the left-join coalesce path); a pair sharing half
    its terms lands strictly between."""
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),
            (2, "alpha beta gamma delta"),
            (3, "epsilon zeta eta theta"),
            (4, "alpha beta epsilon zeta"),
        ],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4)], "doc_a long, doc_b long"
    )
    rows = text.tfidf_cosine_rerank(docs, pairs, n_docs=4).collect()
    got = {(r["doc_a"], r["doc_b"]): r["cosine"] for r in rows}
    assert got[(1, 2)] == 1.0
    assert got[(1, 3)] == 0.0
    assert 0.0 < got[(1, 4)] < 1.0


def test_bpe_merge_steps_greedy_semantics(spark):
    """Hand-checkable corpus: 'a b' wins step 1 (3 occurrences), the
    merged token then chains into 'a_b c' at step 2 — and the greedy
    left-to-right non-overlap rule means 'x x x' counts 2 pairs but
    merges only the leftmost per scan."""
    docs = spark.createDataFrame(
        [
            (1, "a b c"),
            (2, "a b c"),
            (3, "a b d"),
            (4, "x x x"),
        ],
        "doc_id long, text string",
    )
    rows = text.bpe_merge_steps(docs, k=3).collect()
    got = [(r["merge_rank"], r["lhs"], r["rhs"], r["pair_count"]) for r in rows]
    # step 1: (a,b) x3 beats (x,x) x2 and (b,c) x2
    assert got[0] == (1, "a", "b", 3)
    # step 2: (a_b, c) x2 ties (x, x) x2; lexical tie-break -> a_b < x
    assert got[1] == (2, "a_b", "c", 2)
    # step 3: (x, x) x2 wins; doc 4 rewrites to 'x_x x' (leftmost only)
    assert got[2] == (3, "x", "x", 2)


def test_tfidf_cosine_rerank_plan_reuses_weight_cache(spark):
    """The quantized weight table feeds three consumers (norms + both
    pair sides); the plan must read it back from the persisted
    intermediate (InMemoryTableScan) rather than recomputing the
    tokenize+tf+df pipeline per branch."""
    from dns_log_transformer_spark.session import read_table

    docs = read_table(spark, SF_SMOKE, "documents")
    pairs = spark.createDataFrame([(1, 2)], "doc_a long, doc_b long")
    df = text.tfidf_cosine_rerank(docs, pairs, n_docs=100)
    plan = physical_plan(df)
    assert plan.count("InMemoryTableScan") >= 3


def test_cdc_time_travel_single_merge_shuffle(spark):
    """AS-OF reconstruction at every version must be ONE (as_of, key)
    merge — the version fan-out rides the scan as a Generate, with no
    per-version join or rescan (no Join nodes at all before the dims,
    and exactly one Generate)."""
    from dns_log_transformer_spark.queries import ALL_QUERIES

    df = ALL_QUERIES["cdc_time_travel"].fn(spark, SF_SMOKE)
    plan = physical_plan(df)
    # one Generate tree node (formatted plans list each node twice:
    # once in the tree, once in the detail section)
    assert plan.count("+- Generate") == 1  # explode(sequence) once
    assert "Join" not in plan  # pure union -> agg pipeline
