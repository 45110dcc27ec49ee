"""Round-14 operator tests: gzip-member WARC framing (.warc.gz),
Matryoshka prefix-width tradeoff."""

from __future__ import annotations

import gzip
import hashlib
import zlib

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from dns_log_transformer_spark import plans
from dns_log_transformer_spark.sources import warc

SUFFIX = " §é€\U0001f600"


def _md5(s: str) -> str:
    return hashlib.md5(s.encode("utf-8")).hexdigest()


def _docs(spark):
    return spark.createDataFrame(
        [
            (0, "héllo wörld"),
            # full WARC-record + HTTP-status-line lookalikes inside the
            # body: neither the gunzip member scan nor the walk may
            # resynchronize on them
            (1, "WARC/1.0\r\nContent-Length: 3\r\n\r\nxxx\r\n\r\n"
                "HTTP/1.1 404 NO\r\n\r\n body 😀"),
            (2, "x"),
            (3, "日本語テキスト"),
        ],
        "doc_id long, text string",
    )


def _parse(spark, docs=None, **pack_kw):
    blobs = warc.pack_warc_gz_blobs(
        docs if docs is not None else _docs(spark), **pack_kw
    )
    return warc.parse_warc_http(
        warc.parse_warc_gz(blobs), blob_col="rec_bytes", max_records=1
    )


def _member_bytes(spark, docs=None, **pack_kw):
    """blob_id -> raw packed bytes, via the production pack."""
    blobs = warc.pack_warc_gz_blobs(
        docs if docs is not None else _docs(spark), **pack_kw
    ).collect()
    return {r.blob_id: bytes(r.blob) for r in blobs}


def test_warc_gz_round_trip(spark):
    """One gzip member per record, members concatenated: the gunzip
    stage recovers every record and the attested byte walk recovers
    every digest — multi-byte UTF-8 bodies throughout."""
    rows = sorted(
        _parse(spark).collect(), key=lambda r: (r.blob_id, r.member_idx)
    )
    assert all(r.member_ok and r.gz_leftover == 0 for r in rows)
    assert all(r.ok and r.blob_leftover == 0 for r in rows)
    assert all(r.rec_idx == 0 for r in rows)  # one record per member
    resp = {r.doc_id: r for r in rows if r.warc_type == "response"}
    for did, t in [(0, "héllo wörld"), (2, "x"), (3, "日本語テキスト")]:
        body = t + SUFFIX
        assert resp[did].body_octets == len(body.encode("utf-8"))
        assert resp[did].body_md5 == _md5(body)
    # member ordering: warcinfo first, then request/response pairs
    per_blob = {}
    for r in rows:
        per_blob.setdefault(r.blob_id, []).append(r.warc_type)
    for types in per_blob.values():
        assert types[0] == "warcinfo"
        assert types[1:] == ["request", "response"] * ((len(types) - 1) // 2)


def test_warc_gz_stored_mode_member_is_hostile_to_magic_scanners(spark):
    """compresslevel=0 emits stored DEFLATE blocks: the COMPRESSED byte
    stream contains every record's text verbatim — including its
    'WARC/1.0' magic and, for doc 1, an embedded lookalike record. A
    parser that scans the compressed stream for record magic splits
    here; gzip-member framing (decompressobj + unused_data) must not."""
    raw = _member_bytes(spark, compresslevel=0)
    # hostile premise: the magic bytes appear in the compressed stream,
    # MORE often than there are members (doc 1's body embeds one)
    blob0 = raw[0]
    n_members = blob0.count(b"\x1f\x8b\x08")  # gzip member headers
    assert blob0.count(b"WARC/1.0") > n_members - 1  # verbatim text inside
    rows = _parse(spark, compresslevel=0).collect()
    assert all(r.member_ok and r.ok for r in rows)
    resp = {r.doc_id: r for r in rows if r.warc_type == "response"}
    body1 = (
        "WARC/1.0\r\nContent-Length: 3\r\n\r\nxxx\r\n\r\n"
        "HTTP/1.1 404 NO\r\n\r\n body 😀" + SUFFIX
    )
    assert resp[1].body_md5 == _md5(body1)
    assert resp[1].payload_md5 is not None


def test_warc_gz_trailing_garbage_is_loud(spark):
    """Non-gzip bytes after the last member: one extra member row with
    member_ok=false, gz_leftover = the garbage octet count, and the
    sentinel record flows through the walk as a loud ok=false row."""
    blobs = warc.pack_warc_gz_blobs(_docs(spark)).withColumn(
        "blob", F.concat(F.col("blob"), F.lit(b"this-is-not-gzip"))
    )
    rows = sorted(
        warc.parse_warc_http(
            warc.parse_warc_gz(blobs), blob_col="rec_bytes", max_records=1
        ).collect(),
        key=lambda r: (r.blob_id, r.member_idx),
    )
    by_blob = {}
    for r in rows:
        by_blob.setdefault(r.blob_id, []).append(r)
    for recs in by_blob.values():
        assert all(r.member_ok and r.ok for r in recs[:-1])
        bad = recs[-1]
        assert not bad.member_ok and not bad.ok
        assert bad.gz_leftover == len(b"this-is-not-gzip")
        assert bad.payload_md5 is None


def test_warc_gz_truncated_member_is_loud(spark):
    """A member cut before its DEFLATE end-of-stream: member_ok=false
    with gz_leftover counting from the truncated member's start."""
    blobs = warc.pack_warc_gz_blobs(_docs(spark)).withColumn(
        "blob", F.expr("substring(blob, 1, octet_length(blob) - 5)")
    )
    rows = sorted(
        warc.parse_warc_http(
            warc.parse_warc_gz(blobs), blob_col="rec_bytes", max_records=1
        ).collect(),
        key=lambda r: (r.blob_id, r.member_idx),
    )
    by_blob = {}
    for r in rows:
        by_blob.setdefault(r.blob_id, []).append(r)
    for recs in by_blob.values():
        assert all(r.member_ok and r.ok for r in recs[:-1])
        assert not recs[-1].member_ok and recs[-1].gz_leftover > 0


def test_warc_gz_corrupt_crc_is_loud(spark):
    """A flipped byte inside a member's DEFLATE/CRC region: zlib raises
    on the data check; the member is quarantined loudly, never emitted
    as silently-wrong bytes."""
    raw = _member_bytes(spark)
    blob0 = bytearray(raw[0])
    # flip a byte in the LAST member's trailer (CRC32 little-endian is
    # 8 bytes from the end of the member = end of blob)
    blob0[-6] ^= 0xFF
    blobs = spark.createDataFrame(
        [(0, bytes(blob0))], "blob_id long, blob binary"
    )
    rows = sorted(
        warc.parse_warc_http(
            warc.parse_warc_gz(blobs), blob_col="rec_bytes", max_records=1
        ).collect(),
        key=lambda r: r.member_idx,
    )
    assert all(r.member_ok and r.ok for r in rows[:-1])
    assert not rows[-1].member_ok and not rows[-1].ok
    assert rows[-1].gz_leftover > 0


def test_warc_gz_null_and_empty_blob_are_loud(spark):
    """A NULL or 0-byte blob must not vanish from the output: every
    input blob_id is accounted for by exactly one member_ok=false
    sentinel row (ADVICE r14 — the loudness contract covers the
    degenerate inputs too), and the sentinel keeps the downstream walk
    loud in the same pass."""
    blobs = spark.createDataFrame(
        [(0, None), (1, b"")], "blob_id long, blob binary"
    )
    rows = sorted(
        warc.parse_warc_http(
            warc.parse_warc_gz(blobs), blob_col="rec_bytes", max_records=1
        ).collect(),
        key=lambda r: r.blob_id,
    )
    assert [r.blob_id for r in rows] == [0, 1]
    for r in rows:
        assert not r.member_ok and not r.ok
        assert r.member_idx == 0 and r.gz_leftover == 0
        assert r.payload_md5 is None


def test_warc_gz_multi_record_member_leftover_is_loud(spark):
    """A member wrapping TWO records (some writers concatenate): at the
    contract's max_records=1 the walk's blob_leftover flags the second
    record loudly instead of silently dropping it; max_records=2
    recovers both — the r12 no-silent-cap guard, one layer down."""
    rec = (
        "WARC/1.0\r\nWARC-Type: request\r\nWARC-Record-ID: <urn:doc:7>"
        "\r\nContent-Length: 2\r\n\r\nhi\r\n\r\n"
    )
    member = gzip.compress((rec + rec).encode("utf-8"), 9, mtime=0)
    blobs = spark.createDataFrame(
        [(0, member)], "blob_id long, blob binary"
    )
    members = warc.parse_warc_gz(blobs)
    one = warc.parse_warc_http(
        members, blob_col="rec_bytes", max_records=1
    ).collect()
    assert len(one) == 1 and one[0].ok and one[0].blob_leftover > 0
    two = warc.parse_warc_http(
        members, blob_col="rec_bytes", max_records=2
    ).collect()
    assert len(two) == 2 and all(r.ok for r in two)
    assert all(r.blob_leftover == 0 for r in two)


def test_warc_gz_plan_one_arrow_stage_no_shuffle(spark):
    """The parse side's plan contract (VERDICT r13 #3): exactly ONE
    Arrow stage (the gunzip), zero shuffles between it and the walk —
    the whole parse path rides the scan."""
    blobs = spark.createDataFrame(
        [(0, gzip.compress(b"x", 9, mtime=0))], "blob_id long, blob binary"
    )
    df = warc.parse_warc_http(
        warc.parse_warc_gz(blobs), blob_col="rec_bytes", max_records=1
    )
    plan = plans.physical_plan(df, "simple")
    assert plan.count("MapInArrow") == 1, plan
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan, plan


def test_warc_gz_member_boundaries_never_scan_for_magic():
    """Unit pin of the framing primitive itself: decompressobj's
    unused_data lands exactly on the next member header even when the
    compressed stream is riddled with magic lookalikes."""
    a = gzip.compress(b"WARC/1.0\r\nfake", 0, mtime=0)  # stored: verbatim
    b = gzip.compress(b"second", 9, mtime=0)
    d = zlib.decompressobj(31)
    out = d.decompress(a + b)
    assert out == b"WARC/1.0\r\nfake" and d.eof
    assert d.unused_data == b


@settings(max_examples=10, deadline=None)
@given(
    texts=st.lists(
        st.text(
            alphabet=st.characters(
                codec="utf-8", exclude_characters=["\x00"]
            ),
            max_size=40,
        ),
        min_size=1,
        max_size=4,
    ),
    level=st.sampled_from([0, 1, 9]),
)
def test_warc_gz_round_trip_fuzz(spark, texts, level):
    """Any UTF-8 payload at any compression level round-trips through
    gzip members + the byte walk: every member and record ok, digests
    match the Python ground truth, zero leftovers at both layers."""
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    rows = _parse(spark, docs=docs, per_blob=3, compresslevel=level).collect()
    assert all(r.member_ok and r.gz_leftover == 0 for r in rows)
    assert all(r.ok and r.blob_leftover == 0 for r in rows)
    resp = {r.doc_id: r for r in rows if r.warc_type == "response"}
    assert sorted(resp) == list(range(len(texts)))
    for did, t in enumerate(texts):
        body = t + SUFFIX
        assert resp[did].body_octets == len(body.encode("utf-8"))
        assert resp[did].body_md5 == _md5(body)


# ---------------------------------------------------------------------------
# Matryoshka prefix-width tradeoff (VERDICT r13 #6)
# ---------------------------------------------------------------------------


def _flip_corpus(spark):
    """The r12/r13 ranking-flip fixture (tests/test_round13.py): b
    matches q's 16-dim prefix but opposes the tail; c opposes the
    prefix but matches the tail. Full top-2 = [a, c]; a 16-prefix
    prefilter of 2 keeps [a, b] — one true neighbor lost."""
    q = [1.0] * 64
    a = [1.0] * 64
    b = [1.0] * 16 + [-1.0] * 48
    c = [-1.0] * 16 + [1.0] * 48
    return spark.createDataFrame(
        [(0, q), (1, a), (2, b), (3, c)],
        "vec_id long, embedding array<float>",
    )


def test_matryoshka_tradeoff_counts_prefilter_survival(spark):
    """On the flip corpus with prefilter=2, k=2: the 16-wide prefix
    keeps [a, b] (recall 1/2 -> 500 milli); the 32-wide prefix sees
    half of c's agreeing tail and flips it back above b (dot_32:
    a=32, b=0, c=0 x127^2; tie b/c broken by id -> [a, b] still...
    verified numerically below against the operator) — the row set is
    the exact survival count per width, computed from ONE pair pass."""
    from dns_log_transformer_spark.operators import similarity

    emb = _flip_corpus(spark)
    queries = emb.filter(F.col("vec_id") == 0)
    out = similarity.matryoshka_tradeoff(
        emb, queries, k=2, prefilter=2, d_smalls=(16, 32, 64)
    )
    rows = {r.d_small: r for r in out.collect()}
    assert sorted(rows) == [16, 32, 64]
    assert all(r.n_queries == 1 for r in rows.values())
    # d=64 IS the full ranking: prefilter keeps exactly the true top-2
    assert rows[64].n_hit == 2 and rows[64].recall_milli == 1000
    # d=16: prefix keeps [a, b]; true top-2 = [a, c] -> 1 survivor
    assert rows[16].n_hit == 1 and rows[16].recall_milli == 500
    # d=32: dot_32 a=32*127^2, b=0, c=0; tie b/c -> id order keeps b:
    # still 1 survivor — widening inside the agreeing region buys
    # nothing on this adversarial corpus (the tradeoff's whole point)
    assert rows[32].n_hit == 1 and rows[32].recall_milli == 500
    # cost axis: exact milli of d/64
    assert [rows[d].index_bytes_milli for d in (16, 32, 64)] == [250, 500, 1000]


def test_matryoshka_tradeoff_monotone_on_fixture(spark):
    """On the real fixture workload (the registered query at sf0.001),
    recall@k is non-decreasing in the prefix width — the empirical
    monotonicity the tuning decision rests on (pinned like the
    blocking tradeoff's refinement chains; not a theorem, as the flip
    corpus above shows, but the fixture property the decision reads)."""
    import __spark_entry__ as em

    out = em.queries()["sim_matryoshka_tradeoff"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    byd = {r.d_small: r.recall_milli for r in out}
    assert sorted(byd) == [8, 16, 32]
    assert byd[8] <= byd[16] <= byd[32]
    from dns_log_transformer_spark.operators.caching import release_all

    release_all()


def test_matryoshka_tradeoff_single_pass_plan(spark):
    """Plan contract: the sweep is ONE tagged pass — the pair frame
    (where the single prefix_dots UDF scores ALL widths at once) is
    persisted and every consumer (full-width truth + the tagged
    per-setting ranking) reads the cache, so the UDF executes once per
    pair, not once per setting; plan size far under the lint."""
    from dns_log_transformer_spark.operators import similarity
    from dns_log_transformer_spark.operators.caching import release_all

    emb = _flip_corpus(spark)
    queries = emb.filter(F.col("vec_id") == 0)
    df = similarity.matryoshka_tradeoff(emb, queries, k=2, prefilter=2)
    try:
        plan = plans.physical_plan(df, "simple")
        # the scored pair frame is consumed via the cache by BOTH
        # branches (static plan prints the cached lineage per branch;
        # the share is the InMemoryTableScan nodes)
        assert plan.count("InMemoryTableScan") >= 2, plan
        # ALL widths come from the one snapshot array: no per-setting
        # dot UDFs — prefix_dots appears in the (duplicated) cached
        # lineage only, never with a width-specific variant
        assert "prefix_dots" in plan and "dot_pd" not in plan, plan
        assert plans.plan_size_lint(df) == []
    finally:
        release_all()
