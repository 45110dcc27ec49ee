"""Round-13 operator tests: byte-domain WARC (+HTTP split), Matryoshka
rerank, blocking tradeoff."""

from __future__ import annotations

import hashlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from dns_log_transformer_spark.sources import warc

SUFFIX = " §é€\U0001f600"


def _md5(s: str) -> str:
    return hashlib.md5(s.encode("utf-8")).hexdigest()


def _docs(spark):
    return spark.createDataFrame(
        [
            (0, "héllo wörld"),
            # a FULL WARC record lookalike (plus an HTTP status-line
            # lookalike) INSIDE an HTTP body: a split-on-magic or
            # scan-for-delimiter parser resynchronizes here; the
            # Content-Length-driven walk must not
            (1, "WARC/1.0\r\nContent-Length: 3\r\n\r\nxxx\r\n\r\n"
                "HTTP/1.1 404 NO\r\n\r\n body 😀"),
            (2, "x"),
            (3, "日本語テキスト"),
        ],
        "doc_id long, text string",
    )


def _parse(spark, docs=None, per_blob=2, max_records=5):
    blobs = warc.pack_warc_http_blobs(
        docs if docs is not None else _docs(spark), per_blob=per_blob
    )
    return warc.parse_warc_http(
        blobs.select("blob_id", "blob"), max_records=max_records
    )


def test_warc_http_octet_framing_survives_multibyte(spark):
    """THE byte-domain pin (VERDICT r12 #3): every body carries 2-, 3-
    and 4-octet UTF-8 sequences, so character count != octet count on
    every record — a character-framed parser desynchronizes on the
    FIRST record; the octet walk recovers every record and digest."""
    rows = sorted(
        _parse(spark).collect(), key=lambda r: (r.blob_id, r.rec_idx)
    )
    bodies = {
        0: "héllo wörld" + SUFFIX,
        1: "WARC/1.0\r\nContent-Length: 3\r\n\r\nxxx\r\n\r\n"
           "HTTP/1.1 404 NO\r\n\r\n body 😀" + SUFFIX,
        2: "x" + SUFFIX,
        3: "日本語テキスト" + SUFFIX,
    }
    assert all(r.ok for r in rows), [r for r in rows if not r.ok]
    assert all(r.blob_leftover == 0 for r in rows)
    resp = {r.doc_id: r for r in rows if r.warc_type == "response"}
    assert sorted(resp) == [0, 1, 2, 3]
    for did, body in bodies.items():
        r = resp[did]
        n_octets = len(body.encode("utf-8"))
        assert r.body_octets == n_octets, (did, r.body_octets, n_octets)
        # char framing would be WRONG here — the multi-byte pin
        assert n_octets != len(body)
        assert r.body_md5 == _md5(body)
        assert r.http_status == 200
        assert r.http_content_type == "text/html; charset=utf-8"
    # doc 1: the hostile body parses as ONE record — the embedded WARC
    # lookalike and fake status line never desynchronize the walk, and
    # the recovered status is the real one (200), not the payload's 404
    assert resp[1].http_status == 200


def test_warc_http_record_type_surface(spark):
    """warcinfo / request / response typing and per-type columns."""
    rows = sorted(
        _parse(spark).collect(), key=lambda r: (r.blob_id, r.rec_idx)
    )
    assert [r.warc_type for r in rows if r.blob_id == 0] == [
        "warcinfo", "request", "response", "request", "response",
    ]
    winfo = [r for r in rows if r.warc_type == "warcinfo"]
    assert all(r.doc_id is None for r in winfo)
    assert all(
        r.payload_md5 == _md5(warc.WARCINFO_PAYLOAD) for r in winfo
    )
    reqs = [r for r in rows if r.warc_type == "request"]
    assert reqs and all(
        r.http_status is None
        and r.http_content_type is None
        and r.body_octets is None
        and r.body_md5 is None
        for r in reqs
    )
    # request payloads are attested byte-for-byte too
    for r in reqs:
        req = f"GET /doc/{r.doc_id} HTTP/1.1\r\nHost: corpus.invalid\r\n\r\n"
        assert r.payload_md5 == _md5(req)
        assert r.content_length == len(req.encode("utf-8"))


def test_warc_http_truncated_blob_is_loud(spark):
    blobs = warc.pack_warc_http_blobs(_docs(spark)).select("blob_id", "blob")
    bad = blobs.withColumn(
        "blob", F.expr("substring(blob, 1, octet_length(blob) - 5)")
    )
    out = sorted(
        warc.parse_warc_http(bad, max_records=5).collect(),
        key=lambda r: (r.blob_id, r.rec_idx),
    )
    by_blob: dict[int, list] = {}
    for r in out:
        by_blob.setdefault(r.blob_id, []).append(r)
    for recs in by_blob.values():
        assert all(r.ok for r in recs[:-1])
        assert not recs[-1].ok
        assert recs[-1].payload_md5 is None and recs[-1].body_md5 is None


def test_warc_http_corrupt_content_length_is_loud(spark):
    blobs = warc.pack_warc_http_blobs(
        spark.createDataFrame([(0, "abc")], "doc_id long, text string")
    ).select("blob_id", "blob")
    # corrupt the REQUEST record's WARC Content-Length (45 octets)
    bad = blobs.withColumn(
        "blob",
        F.encode(
            F.regexp_replace(
                F.decode("blob", "ISO-8859-1"),
                r"Content-Length: 45\r\n\r\nGET",
                "Content-Length: xx\r\n\r\nGET",
            ),
            "ISO-8859-1",
        ),
    )
    out = sorted(
        warc.parse_warc_http(bad, max_records=5).collect(),
        key=lambda r: r.rec_idx,
    )
    # warcinfo parses; the corrupted request is loud and stops the walk
    assert out[0].warc_type == "warcinfo" and out[0].ok
    assert not out[1].ok and out[1].content_length is None
    assert len(out) == 2
    # ADVICE r13: the unconsumed tail after a malformed stop is counted
    # from the failing record's start — the corrupted request record
    # plus the whole response record were never consumed, so leftover
    # is the octets from the second record's magic to the blob end
    # (Python ground truth, never the parser)
    raw = bytes(bad.select("blob").collect()[0].blob)
    second_magic = raw.index(b"WARC/1.0", len(b"WARC/1.0"))
    assert out[1].blob_leftover == len(raw) - second_magic
    assert out[0].blob_leftover == out[1].blob_leftover  # per-blob column


def test_warc_http_under_unrolled_walk_reports_leftover(spark):
    out = _parse(spark, max_records=3).collect()
    rows0 = [r for r in out if r.blob_id == 0]
    assert len(rows0) == 3  # walk stopped at max_records
    assert all(r.blob_leftover > 0 for r in rows0)
    assert all(r.ok for r in rows0)


def test_warc_http_single_doc_blob(spark):
    docs = spark.createDataFrame([(9, "solo")], "doc_id long, text string")
    out = sorted(
        _parse(spark, docs=docs).collect(), key=lambda r: r.rec_idx
    )
    assert [r.warc_type for r in out] == ["warcinfo", "request", "response"]
    assert all(r.ok and r.blob_leftover == 0 for r in out)


@settings(max_examples=15, deadline=None)
@given(
    texts=st.lists(
        st.text(
            alphabet=st.characters(
                codec="utf-8", exclude_characters=["\x00"]
            ),
            max_size=40,
        ),
        min_size=1,
        max_size=5,
    )
)
def test_warc_http_round_trip_fuzz(spark, texts):
    """Any UTF-8 payload (including CR/LF, header lookalikes, astral
    plane) round-trips: every record ok, octet counts and digests match
    the Python ground truth, leftover 0."""
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    rows = _parse(spark, docs=docs, per_blob=3, max_records=7).collect()
    assert all(r.ok for r in rows)
    assert all(r.blob_leftover == 0 for r in rows)
    resp = {r.doc_id: r for r in rows if r.warc_type == "response"}
    assert sorted(resp) == list(range(len(texts)))
    for did, t in enumerate(texts):
        body = t + SUFFIX
        assert resp[did].body_octets == len(body.encode("utf-8"))
        assert resp[did].body_md5 == _md5(body)


# ---------------------------------------------------------------------------
# Matryoshka rerank (VERDICT r12 #6): the operator the r12 probe gates
# ---------------------------------------------------------------------------


def _flip_corpus(spark):
    """The r12 probe's ranking-flip fixture: q/a agree everywhere; b
    matches q's PREFIX but opposes the tail; c opposes the prefix but
    matches the tail. With +-1 values the int8 codes are exactly +-127:
      dot_full:   a = 64*127^2, b = -32*127^2, c = +32*127^2
      dot_prefix: a = 16*127^2, b = +16*127^2, c = -16*127^2
    Full top-2 = [a, c]; prefix-only top-2 = [a, b]."""
    q = [1.0] * 64
    a = [1.0] * 64
    b = [1.0] * 16 + [-1.0] * 48
    c = [-1.0] * 16 + [1.0] * 48
    return spark.createDataFrame(
        [(0, q), (1, a), (2, b), (3, c)],
        "vec_id long, embedding array<float>",
    )


def test_matryoshka_rerank_repairs_prefix_misranking(spark):
    """The probe->decision closure: with prefilter wide enough to retain
    the true neighbor the prefix MIS-RANKED, the full-width rerank
    restores the exact full ranking — rerank recall@k >= prefix-only
    recall@k, strictly greater on this fixture."""
    from dns_log_transformer_spark.operators import similarity

    emb = _flip_corpus(spark)
    queries = emb.filter(F.col("vec_id") == 0)
    truth = similarity.int8_topk(emb, queries, k=2)
    full_ids = [r.vec_id for r in sorted(truth.collect(), key=lambda r: r.rnk)]
    assert full_ids == [1, 3]
    out = similarity.matryoshka_rerank_topk(
        emb, queries, k=2, prefilter=3, d_small=16
    )
    rows = sorted(out.collect(), key=lambda r: r.rnk)
    rerank_ids = [r.vec_id for r in rows]
    assert rerank_ids == [1, 3]  # full recall restored
    # dot_full values are the exact integers the construction predicts
    assert [r.dot_full for r in rows] == [64 * 127 * 127, 32 * 127 * 127]
    # prefix-only baseline would have returned [a, b]: recall 1/2
    prefix_only = similarity.matryoshka_rerank_topk(
        emb, queries, k=2, prefilter=2, d_small=16
    )
    prefix_ids = {r.vec_id for r in prefix_only.collect()}
    assert len(set(rerank_ids) & set(full_ids)) >= len(prefix_ids & set(full_ids))


def test_matryoshka_rerank_only_reorders_prefilter_survivors(spark):
    """Stage 2 touches ONLY candidate ids: with prefilter=2 the prefix
    stage keeps {a, b} (c's prefix opposes q), so the rerank must rank
    within that set even though c's full dot beats b's — the recall
    loss is the prefilter's, never silent candidate leakage."""
    from dns_log_transformer_spark.operators import similarity

    emb = _flip_corpus(spark)
    queries = emb.filter(F.col("vec_id") == 0)
    out = similarity.matryoshka_rerank_topk(
        emb, queries, k=2, prefilter=2, d_small=16
    )
    rows = sorted(out.collect(), key=lambda r: r.rnk)
    assert [r.vec_id for r in rows] == [1, 2]
    assert [r.dot_full for r in rows] == [64 * 127 * 127, -32 * 127 * 127]


# ---------------------------------------------------------------------------
# Blocking tradeoff (VERDICT r12 #7): the banding decision as a query
# ---------------------------------------------------------------------------


def _tradeoff_rows(spark, rows, **kw):
    from dns_log_transformer_spark.operators import dedup

    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup.blocking_tradeoff(docs, threshold=0.5, df_cap=100, **kw)
    return {r.num_bands: r for r in out.collect()}


_CORPUS = [
    (0, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (2, "alpha beta gamma delta epsilon zeta eta theta iota lambda"),
    (3, "one two three four five six seven eight nine ten"),
    (4, "unrelated words entirely distinct vocabulary here today"),
    (5, "alpha beta gamma delta epsilon zeta eta theta mu nu"),
]


def test_blocking_tradeoff_monotone_along_refinement_chains(spark):
    """With 12 hashes, the 2-band split is a concatenation of the
    4-band and 6-band splits (and 3-band of 6-band): a coarse-band
    match implies a match in every refining piece, so along the chains
    2->4, 2->6 and 3->6 the candidate set only grows — n_cand and pair
    completeness nondecreasing (the bucket cap never triggers at test
    occupancy, so the identity is exact)."""
    by = _tradeoff_rows(spark, _CORPUS)
    assert sorted(by) == [2, 3, 4, 6]
    for coarse, fine in ((2, 4), (2, 6), (3, 6)):
        assert by[fine].n_cand >= by[coarse].n_cand
        assert (
            by[fine].pair_completeness_milli
            >= by[coarse].pair_completeness_milli
        )
        # finer banding never improves the reduction ratio
        assert (
            by[fine].reduction_ratio_milli <= by[coarse].reduction_ratio_milli
        )


def test_blocking_tradeoff_shares_one_truth_and_matches_audit(spark):
    """Every settings row reports the IDENTICAL band-invariant numbers
    (n_docs, n_possible_pairs, n_truth — the truth side is computed
    once), and the num_bands=4 row reproduces the shipped
    ``blocking_audit`` exactly — the sweep and the audit can never
    disagree about the default config."""
    from dns_log_transformer_spark.operators import dedup

    by = _tradeoff_rows(spark, _CORPUS)
    invariants = {
        (r.n_docs, r.n_possible_pairs, r.n_truth) for r in by.values()
    }
    assert len(invariants) == 1
    docs = spark.createDataFrame(_CORPUS, "doc_id long, text string")
    audit = dedup.blocking_audit(docs, threshold=0.5, df_cap=100).collect()[0]
    r4 = by[4]
    assert (r4.n_docs, r4.n_truth, r4.n_cand, r4.n_hit) == (
        audit.n_docs,
        audit.n_truth,
        audit.n_cand,
        audit.n_hit,
    )
    assert r4.pair_completeness_milli == audit.pair_completeness_milli
    assert r4.precision_milli == audit.precision_milli
    # exact milli arithmetic recomputed from the counts, per row
    for r in by.values():
        assert r.rows_per_band == 12 // r.num_bands
        if r.n_truth:
            assert r.pair_completeness_milli == (1000 * r.n_hit) // r.n_truth
        if r.n_cand:
            assert r.precision_milli == (1000 * r.n_hit) // r.n_cand


def test_blocking_tradeoff_planted_exact_dup_caught_everywhere(spark):
    """An exact dup shares every band at EVERY setting — n_hit >= 1 on
    each row, and completeness is 1000 when it is the only truth pair."""
    rows = [
        (0, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (2, "one two three four five six seven eight nine ten"),
    ]
    by = _tradeoff_rows(spark, rows)
    for r in by.values():
        assert r.n_truth == 1 and r.n_hit == 1
        assert r.pair_completeness_milli == 1000


def test_blocking_tradeoff_degenerate_single_doc(spark):
    by = _tradeoff_rows(spark, [(0, "only one document three words plus")])
    assert sorted(by) == [2, 3, 4, 6]  # settings rows never vanish
    for r in by.values():
        assert r.n_docs == 1 and r.n_possible_pairs == 0
        assert r.n_truth == 0 and r.n_cand == 0 and r.n_hit == 0
        assert r.pair_completeness_milli is None
        assert r.reduction_ratio_milli is None
        assert r.precision_milli is None


def test_blocking_tradeoff_rejects_non_divisor_bands(spark):
    from dns_log_transformer_spark.operators import dedup

    docs = spark.createDataFrame([(0, "a b c d")], "doc_id long, text string")
    with pytest.raises(ValueError, match="must divide"):
        dedup.blocking_tradeoff(docs, band_settings=(5,))
