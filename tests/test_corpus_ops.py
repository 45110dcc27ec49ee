"""Corpus-preparation operator tests (operators/corpus.py) — invariants
beyond the oracle-parity mirror."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dns_log_transformer_spark.operators import corpus, text
from dns_log_transformer_spark.session import read_table
from tests.conftest import SF_SMOKE


def test_split_is_stable_and_roughly_proportional(spark):
    docs = read_table(spark, SF_SMOKE, "documents")
    a = corpus.with_split(docs, seed=42).select("doc_id", "split")
    b = corpus.with_split(docs.orderBy(F.rand(1)), seed=42).select("doc_id", "split")
    # same assignment regardless of row order / partitioning
    assert {tuple(r) for r in a.collect()} == {tuple(r) for r in b.collect()}
    frac = {
        r["split"]: r["n"]
        for r in a.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    n = sum(frac.values())
    assert frac["train"] / n == pytest.approx(0.9, abs=0.1)


def test_split_and_sample_have_no_shuffle(spark):
    """Both must stay narrow — a filter/projection over the scan."""
    from dns_log_transformer_spark.plans import physical_plan

    docs = read_table(spark, SF_SMOKE, "documents")
    for df in [
        corpus.with_split(docs),
        corpus.weighted_sample(docs, {"src0": 0.5}),
    ]:
        assert "Exchange" not in physical_plan(df, "simple")


def test_seeded_shuffle_is_a_permutation(spark):
    docs = read_table(spark, SF_SMOKE, "documents")
    out = corpus.seeded_shuffle(docs, seed=1)
    n = docs.count()
    ranks = [r["shuffle_rank"] for r in out.select("shuffle_rank").collect()]
    assert sorted(ranks) == list(range(1, n + 1))
    other = corpus.seeded_shuffle(docs, seed=2)
    pairs = {(r["doc_id"], r["shuffle_rank"]) for r in out.collect()}
    assert pairs != {(r["doc_id"], r["shuffle_rank"]) for r in other.collect()}


def test_seeded_shuffle_matches_global_sort_order(spark):
    """The two-pass global index must equal the rank a (non-scalable)
    global row_number would produce: position in (md5 key, id) order."""
    docs = read_table(spark, SF_SMOKE, "documents")
    got = {
        r["doc_id"]: r["shuffle_rank"]
        for r in corpus.seeded_shuffle(docs, seed=42, num_partitions=7).collect()
    }
    keyed = docs.select(
        "doc_id",
        F.md5(F.concat(F.lit("42:"), F.col("doc_id").cast("string"))).alias("k"),
    ).collect()
    expected = {
        r["doc_id"]: i + 1
        for i, r in enumerate(sorted(keyed, key=lambda r: (r["k"], r["doc_id"])))
    }
    assert got == expected


def test_seeded_shuffle_has_no_window(spark):
    """The scale contract: no WindowExec anywhere in the plan (a
    partition-less Window would funnel all rows through one task). The
    rank must come from the parallel sort + offset arithmetic."""
    from dns_log_transformer_spark.plans import physical_plan

    docs = read_table(spark, SF_SMOKE, "documents")
    plan = physical_plan(corpus.seeded_shuffle(docs, seed=1))
    assert "Window" not in plan, plan


def test_global_rank_parallel_and_total(spark):
    """global_rank: ranks are exactly 1..n, ordering honors the sort
    spec (descending key here), and the plan carries NO WindowExec and
    NO single-partition exchange — the whole point vs
    row_number().over(Window.orderBy(...))."""
    from dns_log_transformer_spark.plans import physical_plan
    from pyspark.sql import functions as F

    docs = read_table(spark, SF_SMOKE, "documents")
    ranked = corpus.global_rank(
        docs, [F.desc("n_chars"), F.asc("doc_id")], num_partitions=7
    )
    rows = ranked.select("doc_id", "n_chars", "global_rank").collect()
    n = len(rows)
    assert sorted(r["global_rank"] for r in rows) == list(range(1, n + 1))
    by_rank = sorted(rows, key=lambda r: r["global_rank"])
    for a, b in zip(by_rank, by_rank[1:]):
        # rank order == (n_chars desc, doc_id asc) order
        assert (-a["n_chars"], a["doc_id"]) < (-b["n_chars"], b["doc_id"])
    plan = physical_plan(ranked)
    assert "Window" not in plan, plan
    assert "SinglePartition" not in plan, plan


def test_capped_sample_skewed_source_prefilter(spark):
    """One source holding ~95% of rows: the hash-threshold pre-filter
    must shrink the window input to O(k) for that source, and the result
    must be byte-identical to ranking the full data."""
    from pyspark.sql import Window

    n = 4000
    rows = [(i, "web" if i % 20 != 0 else f"src{i % 5}") for i in range(n)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    k = 10

    keyed = df.withColumn(
        "_cap_key",
        F.md5(F.concat(F.lit("13:"), F.col("doc_id").cast("string"))),
    )
    survivors = corpus._cap_survivors(keyed, k, "source", "_cap_key")
    surv_counts = {r["source"]: r["count"] for r in survivors.groupBy("source").count().collect()}
    # the heavy source's window input is bounded (expected ~4k=40, allow slack)
    assert surv_counts["web"] < 200, surv_counts
    assert surv_counts["web"] >= k

    got = {
        (r["doc_id"], r["source"], r["sample_rank"])
        for r in corpus.capped_sample_per_source(df, k=k, seed=13).collect()
    }
    w = Window.partitionBy("source").orderBy(F.col("_cap_key"), F.col("doc_id"))
    naive = {
        (r["doc_id"], r["source"], r["sample_rank"])
        for r in keyed.withColumn(
            "sample_rank", F.row_number().over(w).cast("long")
        )
        .filter(F.col("sample_rank") <= k)
        .collect()
    }
    assert got == naive


def test_pii_redact_order_matters(spark):
    """An email's digits must be swallowed by <EMAIL>, not re-matched as
    a long number; counts are taken on the text each stage sees."""
    df = spark.createDataFrame(
        [(1, "write to a123456789b@ex.org or 10.0.0.1 acct 987654321x")],
        "doc_id int, text string",
    )
    r = corpus.pii_redact(df).collect()[0]
    assert (r["n_email"], r["n_ipv4"], r["n_longnum"]) == (1, 1, 1)
    assert r["redacted"] == "write to <EMAIL> or <IP> acct <NUM>x"


def test_pack_sequences_respects_budget(spark):
    docs = read_table(spark, SF_SMOKE, "documents")
    toks = text.with_token_counts(docs).select("doc_id", "n_tokens")
    packed = corpus.pack_sequences(toks, budget=64, n_shards=8)
    per_bin = (
        packed.groupBy("shard", "bin_in_shard")
        .agg(F.sum("tokens").alias("t"), F.count("*").alias("n"))
        .collect()
    )
    assert len(per_bin) > 1
    for r in per_bin:
        # a bin only exceeds the budget when a single oversized doc owns it
        assert r["t"] <= 64 or r["n"] == 1
    # every doc packed exactly once
    assert packed.count() == toks.count()
    assert packed.select("doc_id").distinct().count() == toks.count()


def test_capped_sample_per_source(spark):
    docs = read_table(spark, SF_SMOKE, "documents")
    out = corpus.capped_sample_per_source(docs, k=5, seed=13)
    per_src = out.groupBy("source").count().collect()
    assert all(r["count"] <= 5 for r in per_src)
    # deterministic: same ids both runs
    again = corpus.capped_sample_per_source(docs, k=5, seed=13)
    assert {r["doc_id"] for r in out.collect()} == {
        r["doc_id"] for r in again.collect()
    }


def test_chunk_windows_cover_exactly(spark):
    df = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(10))), (2, "a b"), (3, "")],
        "doc_id int, text string",
    )
    out = corpus.chunk_windows(df, size=4, stride=3).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 1: starts 0,3,6,9 — last chunk is the 1-token tail
    got = [(r["chunk_start"], r["n_chunk_tokens"], r["chunk_text"]) for r in sorted(by_doc[1], key=lambda r: r["chunk_no"])]
    assert got == [
        (0, 4, "t0 t1 t2 t3"),
        (3, 4, "t3 t4 t5 t6"),
        (6, 4, "t6 t7 t8 t9"),
        (9, 1, "t9"),
    ]
    assert [(r["chunk_start"], r["chunk_text"]) for r in by_doc[2]] == [(0, "a b")]
    assert 3 not in by_doc  # empty doc -> no chunks


def test_chunk_windows_no_shuffle(spark):
    from dns_log_transformer_spark.plans import physical_plan

    docs = read_table(spark, SF_SMOKE, "documents")
    assert "Exchange" not in physical_plan(
        corpus.chunk_windows(docs, size=32, stride=24), "simple"
    )


def test_decontaminate_flags_planted_overlap(spark):
    """A doc sharing an 8-gram with the benchmark is flagged; disjoint
    docs are not; sub-8-token docs survive with zero shingles."""
    rows = [
        (1, "a b c d e f g h i j"),          # shares a b..h with bench
        (2, "q r s t u v w x y z"),          # disjoint
        (3, "tiny doc"),                     # < 8 tokens
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    bench = spark.createDataFrame(
        [(100, "Z z a b c d e f g h")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in corpus.decontaminate(docs, bench).collect()}
    assert out[1]["is_contaminated"] and out[1]["n_hits"] == 1
    assert out[1]["n_shingles"] == 3
    assert not out[2]["is_contaminated"] and out[2]["n_hits"] == 0
    assert out[3]["n_shingles"] == 0 and out[3]["contam_frac"] == 0.0
    assert len(out) == 3


def test_decontaminate_broadcasts_benchmark(spark):
    """The benchmark shingle set must broadcast — the corpus side is
    never shuffled on the shingle key."""
    from dns_log_transformer_spark.plans import physical_plan

    docs = read_table(spark, SF_SMOKE, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    p = physical_plan(corpus.decontaminate(docs, bench))
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_repetition_stats_hand_computed(spark):
    """Stats on a doc small enough to verify by hand."""
    #         tokens: x y x y z  -> 2-grams: "x y"(2) "y x"(1) "y z"(1)
    docs = spark.createDataFrame(
        [(1, "x y x y z"), (2, "")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in text.repetition_stats(docs).collect()}
    r1 = out[1]
    assert r1["n_tokens"] == 5
    assert r1["dup_word_frac"] == pytest.approx((5 - 3) / 5, abs=1e-9)
    assert r1["top2_gram"] == "x y" and r1["top2_count"] == 2
    # "x y" twice = 6 chars of 9 normalized chars
    assert r1["top2_char_frac"] == pytest.approx(6 / 9, abs=1e-4)
    assert r1["dup5_char_frac"] == 0.0  # only one 5-gram, not duplicated
    assert r1["flag_repetitive"]
    r2 = out[2]
    assert r2["n_tokens"] == 0 and not r2["flag_repetitive"]
    assert r2["top2_count"] == 0 and r2["top2_gram"] is None


def test_quality_filter_runs_under_streaming(spark, tmp_path):
    """Corpus operators are plain DataFrame->DataFrame functions, so the
    same code path must run unchanged under readStream — the engine's
    'one code path for batch and streaming' contract, proven here for
    the LLM-ops side (quality scoring + filter)."""
    from dns_log_transformer_spark.operators.text import with_quality_score
    from dns_log_transformer_spark.session import read_table
    from tests.conftest import SF_SMOKE

    batch_docs = read_table(spark, SF_SMOKE, "documents")
    expected = {
        r["doc_id"]
        for r in with_quality_score(batch_docs)
        .filter(F.col("quality_score") >= 0.5)
        .select("doc_id")
        .collect()
    }
    assert expected, "fixture should pass some docs"

    stream = (
        spark.readStream.schema(batch_docs.schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(SF_SMOKE)
    )
    q = (
        with_quality_score(stream)
        .filter(F.col("quality_score") >= 0.5)
        .select("doc_id")
        .writeStream.format("memory")
        .queryName("quality_stream_sink")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {r["doc_id"] for r in spark.sql("SELECT * FROM quality_stream_sink").collect()}
    assert got == expected


def test_span_dedup_first_occurrence_wins(spark):
    """Hand-built corpus: doc 0 and doc 2 share a span; only doc 0's
    instance survives. Within one doc, a repeated span keeps its first
    index."""
    rows = [
        (0, "a b c d e f g h x y z"),        # span0 = 'a b c d e f g h'
        (1, "p q r s t u v w"),              # unique
        (2, "a b c d e f g h only tail"),    # span0 duplicates doc 0's
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in corpus.span_dedup(df, span_tokens=8).collect()}
    assert out[0]["n_spans"] == 2 and out[0]["n_kept"] == 2
    assert out[1]["n_kept"] == 1
    # doc 2 loses its first span to doc 0, keeps its own tail span
    assert out[2]["n_spans"] == 2 and out[2]["n_kept"] == 1
    assert out[2]["kept_text"] == "only tail"


def test_span_dedup_has_no_window(spark):
    """First-occurrence must be the map-side-combinable min(struct) agg,
    never a window over the span key (a hyper-duplicated span would land
    one task)."""
    from dns_log_transformer_spark.plans import physical_plan

    docs = read_table(spark, SF_SMOKE, "documents")
    assert "Window" not in physical_plan(corpus.span_dedup(docs), "simple")


def test_dsir_weights_prefer_target_like_docs(spark):
    """Docs made of target-domain bigrams must outscore docs of
    raw-only bigrams."""
    rows = [
        (0, "the quick brown fox", True),
        (1, "the quick brown fox", True),
        (2, "the quick brown fox", False),   # target-like, not labeled
        (3, "zz yy xx ww vv uu", False),     # pure raw
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, tgt boolean")
    out = {
        r["doc_id"]: r["weight"]
        for r in corpus.dsir_weights(df, target_filter=F.col("tgt")).collect()
    }
    assert out[2] > out[3]
    assert out[0] == out[1] == out[2]


def test_dsir_histogram_is_broadcast(spark):
    """The feature histogram must broadcast — the corpus never shuffles
    on the feature key."""
    from dns_log_transformer_spark.plans import physical_plan

    docs = read_table(spark, SF_SMOKE, "documents")
    plan = physical_plan(
        corpus.dsir_weights(docs, target_filter=F.col("lang") == "en"), "simple"
    )
    assert "BroadcastHashJoin" in plan


def test_temperature_sample_quotas_follow_sqrt(spark):
    """A source with 4x the rows gets ~2x the quota (alpha=0.5), and
    every source contributes at least one doc."""
    rows = [(i, f"doc {i}", "big" if i < 400 else "small") for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = corpus.temperature_sample(df, total=90, source_col="source")
    got = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert set(got) == {"big", "small"}
    # sqrt(400)=20, sqrt(100)=10 -> quotas 60 and 30
    assert got["big"] == 60 and got["small"] == 30
    # deterministic under re-run
    again = corpus.temperature_sample(df, total=90, source_col="source")
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, again.collect()))
