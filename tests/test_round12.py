"""Round-12 operator pins: PMI collocations (hand-computed corpus),
MinHash blocking audit (metric identities + planted duplicates), and
the WARC-style Content-Length-driven record walk (round trip, hostile
payload, truncation, under-unroll, corrupt headers)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from dns_log_transformer_spark.operators import dedup, text
from dns_log_transformer_spark.sources import warc


def _md5(s: str) -> str:
    return hashlib.md5(s.encode("utf-8")).hexdigest()


# ---------------------------------------------------------------------------
# PMI collocations
# ---------------------------------------------------------------------------


def test_pmi_hand_computed_corpus(spark):
    # "x y x y x y": bigrams xy,yx,xy,yx,xy -> c(x,y)=3, c(y,x)=2;
    # "z w": one (z,w) bigram. N = 6. Unigrams: x=3 y=3 z=1 w=1.
    # Only (x,y) survives min_count=3: lift = 1000*6*3/(3*3) = 2000.
    docs = spark.createDataFrame(
        [(0, "x y x y x y"), (1, "z w")], "doc_id long, text string"
    )
    rows = text.pmi_collocations(docs, min_count=3, k=3).collect()
    assert [tuple(r) for r in rows] == [("x", "y", 3, 3, 3, 2000, 1)]


def test_pmi_case_folds_and_skips_empty(spark):
    # case-folded occurrences merge; NULL/empty/whitespace text is inert.
    # N = 5 bigrams (one doc of 6 tokens), c(a,b)=3, c(a)=c(b)=3:
    # lift = (1000*5*3) // 9 = 1666.
    docs = spark.createDataFrame(
        [(0, "A b a B A b"), (1, None), (2, ""), (3, "   ")],
        "doc_id long, text string",
    )
    rows = text.pmi_collocations(docs, min_count=3, k=3).collect()
    assert [tuple(r) for r in rows] == [("a", "b", 3, 3, 3, 1666, 1)]


def test_pmi_topk_ranks_by_lift_then_partner(spark):
    # headword 'a' pairs with three partners at different lifts; k=2
    # keeps the two highest, tie impossible here; partner text breaks
    # ordering determinism inside the window.
    corpus = " ".join(["a b"] * 4 + ["a c"] * 4 + ["a d"] * 4 + ["e f"] * 12)
    docs = spark.createDataFrame([(0, corpus)], "doc_id long, text string")
    out = text.pmi_collocations(docs, min_count=3, k=2)
    got = {(r.w1, r.rk): r.w2 for r in out.collect()}
    # partners of 'a' all have identical counts -> identical lift ->
    # alphabetical tiebreak: b then c
    assert got[("a", 1)] == "b" and got[("a", 2)] == "c"


# ---------------------------------------------------------------------------
# Blocking audit
# ---------------------------------------------------------------------------


def _audit_row(spark, rows):
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    return dedup.blocking_audit(docs, threshold=0.5, df_cap=100).collect()[0]


def test_blocking_audit_identities_on_planted_dups(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    other = "one two three four five six seven eight nine ten"
    rows = [
        (0, base),
        (1, base),  # exact dup of 0 -> certain truth pair, certain candidate
        (2, other),
        (3, "unrelated words entirely distinct vocabulary here today"),
    ]
    r = _audit_row(spark, rows)
    assert r.n_docs == 4 and r.n_possible_pairs == 6
    assert r.n_truth >= 1  # the planted pair
    assert r.n_hit <= min(r.n_truth, r.n_cand)
    # identical docs share every band -> the planted pair must be caught
    assert r.n_hit >= 1
    assert 0 <= r.pair_completeness_milli <= 1000
    assert 0 <= r.reduction_ratio_milli <= 1000
    assert 0 <= r.precision_milli <= 1000
    # exact milli arithmetic, not float: recompute from the counts
    assert r.pair_completeness_milli == (1000 * r.n_hit) // r.n_truth
    assert r.reduction_ratio_milli == 1000 - (1000 * r.n_cand) // 6
    assert r.precision_milli == (1000 * r.n_hit) // r.n_cand


def test_blocking_audit_degenerate_single_doc(spark):
    r = _audit_row(spark, [(0, "only one document three words plus")])
    assert r.n_docs == 1 and r.n_possible_pairs == 0
    assert r.n_truth == 0 and r.n_cand == 0 and r.n_hit == 0
    # 0-denominator ratios are NULL, never a crash or a fake 0
    assert r.pair_completeness_milli is None
    assert r.reduction_ratio_milli is None
    assert r.precision_milli is None


# ---------------------------------------------------------------------------
# WARC-style record framing
# ---------------------------------------------------------------------------

HOSTILE = "see WARC/1.0\r\n\r\nContent-Length: 3\r\n\r\n nested header lookalike"


def _docs(spark):
    return spark.createDataFrame(
        [
            (0, "hello world"),
            (1, HOSTILE),
            (2, "x"),
            (3, "the quick brown fox"),
            (4, "second blob"),
            (5, ""),
        ],
        "doc_id long, text string",
    )


def test_warc_round_trip_with_hostile_payload(spark):
    blobs = warc.pack_warc_blobs(_docs(spark), per_blob=4)
    out = sorted(
        warc.parse_warc_records(blobs, max_records=6).collect(),
        key=lambda r: (r.blob_id, r.rec_idx),
    )
    texts = {
        0: "hello world",
        1: HOSTILE,
        2: "x",
        3: "the quick brown fox",
        4: "second blob",
        5: "",
    }
    assert [r.doc_id for r in out] == [0, 1, 2, 3, 4, 5]
    for r in out:
        assert r.ok, r
        assert r.blob_leftover == 0
        assert r.content_length == len(texts[r.doc_id])
        # the Content-Length-driven walk recovers the exact payload —
        # including doc 1, whose payload CONTAINS a full header
        # lookalike that a split-on-magic parser would resync on
        assert r.payload_md5 == _md5(texts[r.doc_id])


def test_warc_truncated_blob_is_loud(spark):
    blobs = warc.pack_warc_blobs(_docs(spark), per_blob=4)
    bad = blobs.withColumn(
        "blob", F.expr("substring(blob, 1, length(blob) - 5)")
    )
    out = sorted(
        warc.parse_warc_records(bad, max_records=6).collect(),
        key=lambda r: (r.blob_id, r.rec_idx),
    )
    by_blob: dict[int, list] = {}
    for r in out:
        by_blob.setdefault(r.blob_id, []).append(r)
    for recs in by_blob.values():
        # every record but the last parses; the clipped final record
        # surfaces as ok=False (separator no longer where declared)
        assert all(r.ok for r in recs[:-1])
        assert not recs[-1].ok
        assert recs[-1].payload_md5 is None


def test_warc_under_unrolled_walk_reports_leftover(spark):
    blobs = warc.pack_warc_blobs(_docs(spark), per_blob=4)
    out = warc.parse_warc_records(blobs, max_records=2).collect()
    four_rec_rows = [r for r in out if r.blob_id == 0]
    assert len(four_rec_rows) == 2  # walk stopped at max_records
    # ...but loudly: the unconsumed tail is visible, not silently dropped
    assert all(r.blob_leftover > 0 for r in four_rec_rows)
    assert all(r.ok for r in four_rec_rows)


def test_warc_corrupt_content_length_is_loud(spark):
    blobs = warc.pack_warc_blobs(_docs(spark), per_blob=4)
    bad = blobs.withColumn(
        "blob",
        F.expr("replace(blob, 'Content-Length: 11', 'Content-Length: xx')"),
    )
    out = warc.parse_warc_records(bad, max_records=6).collect()
    bad_rows = [r for r in out if not r.ok]
    assert bad_rows, "corrupt Content-Length must surface as ok=False"
    assert all(r.content_length is None for r in bad_rows)
    # ADVICE r13: leftover counts the unconsumed tail from the failing
    # record's start, so an early malformed stop is loud here too
    assert all(r.blob_leftover > 0 for r in bad_rows)


def test_warc_bad_magic_is_loud(spark):
    blobs = spark.createDataFrame(
        [(0, "NOT-A-WARC-RECORD at all"), ], "blob_id long, blob string"
    )
    out = warc.parse_warc_records(blobs, max_records=6).collect()
    assert len(out) == 1
    assert not out[0].ok and out[0].doc_id is None


def test_warc_pack_drops_null_text_and_orders_by_id(spark):
    docs = spark.createDataFrame(
        [(3, "c"), (1, "a"), (2, None)], "doc_id long, text string"
    )
    blobs = warc.pack_warc_blobs(docs, per_blob=4).collect()
    assert len(blobs) == 1
    b = blobs[0]
    assert b.n_records == 2
    # id order inside the blob regardless of input order; doc 2 dropped
    assert b.blob.index("urn:doc:1") < b.blob.index("urn:doc:3")
    assert "urn:doc:2" not in b.blob


# ---------------------------------------------------------------------------
# Matryoshka truncation probe
# ---------------------------------------------------------------------------


def test_matryoshka_prefix_vs_full_ranking_flip(spark):
    from dns_log_transformer_spark.operators import similarity

    # dim 64; q/a agree everywhere; b matches q's PREFIX but opposes the
    # tail; c opposes the prefix but matches the tail. With +-1 values
    # the int8 codes are exactly +-127:
    #   dot_full:  a = 64*127^2,  b = -32*127^2,  c = +32*127^2
    #   dot_trunc: a = 16*127^2,  b = +16*127^2,  c = -16*127^2
    # full top-2 = [a, c]; trunc top-2 = [a, b] (a/b tie -> id order);
    # overlap = {a} -> 1 of 2 -> 500 milli.
    q = [1.0] * 64
    a = [1.0] * 64
    b = [1.0] * 16 + [-1.0] * 48
    c = [-1.0] * 16 + [1.0] * 48
    emb = spark.createDataFrame(
        [(0, q), (1, a), (2, b), (3, c)],
        "vec_id long, embedding array<float>",
    )
    queries = emb.filter(F.col("vec_id") == 0)
    out = similarity.matryoshka_probe(emb, queries, k=2, d_small=16).collect()
    assert len(out) == 1
    r = out[0]
    assert r.top_full_csv == "1,3"
    assert r.top_trunc_csv == "1,2"
    assert r.n_overlap == 1
    assert r.overlap_milli == 500


# ---------------------------------------------------------------------------
# WARC walk property fuzz: the round trip must hold for ARBITRARY
# payload content — including payloads stuffed with CRLF runs, header
# lookalikes and separator sequences — because Content-Length framing
# never scans the payload. Position arithmetic (1-based substr, +4s)
# is exactly the kind of code a fixed fixture under-tests.
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_payload = st.lists(
    st.sampled_from(
        list("abc XYZ09")
        + ["\r", "\n", "\r\n", "WARC/1.0", "Content-Length: 5", "\r\n\r\n"]
    ),
    min_size=0,
    max_size=40,
).map("".join)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(texts=st.lists(_payload, min_size=1, max_size=9))
def test_warc_round_trip_fuzz(spark, texts):
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    blobs = warc.pack_warc_blobs(docs, per_blob=4)
    out = sorted(
        warc.parse_warc_records(blobs, max_records=6).collect(),
        key=lambda r: (r.blob_id, r.rec_idx),
    )
    assert [r.doc_id for r in out] == list(range(len(texts)))
    for r in out:
        assert r.ok and r.blob_leftover == 0
        assert r.content_length == len(texts[r.doc_id])
        assert r.payload_md5 == _md5(texts[r.doc_id])
