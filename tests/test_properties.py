"""Property-based tests (SURVEY.md §5.5).

The reference couples validation and formatting implicitly:
`is_valid_dns_data` passing guarantees `to_bind9_log_format` cannot
KeyError (/root/reference/app/app.py:229-251). The engine's analog:
any record the validity predicate accepts MUST format into exactly
1 + len(answers) non-null lines, and any record it rejects must land in
quarantine with a reason — across randomized record shapes.
"""

from __future__ import annotations

import json

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.test_transforms import envelope_json, make_record, run_pipeline

# field -> a generator of INVALID values for it (None = absent)
_scalar = st.sampled_from(
    [
        "version",
        "account_id",
        "region",
        "vpc_id",
        "query_name",
        "query_type",
        "query_class",
        "rcode",
        "srcaddr",
        "srcport",
        "transport",
    ]
)

record_strategy = st.fixed_dictionaries(
    {
        "mutate": st.sampled_from(["none", "drop_scalar", "null_scalar", "bad_ts", "drop_answer_type"]),
        "field": _scalar,
        "n_answers": st.integers(min_value=0, max_value=4),
        "null_rdata": st.booleans(),
        "qname": st.text(
            alphabet="abcdefghijklmnopqrstuvwxyz0123456789-.", min_size=1, max_size=30
        ),
    }
)


def build_record(spec) -> tuple[dict, bool]:
    """Returns (record, expected_valid)."""
    answers = [
        {"Rdata": None if spec["null_rdata"] else f"10.0.0.{i}", "Type": "A"}
        for i in range(spec["n_answers"])
    ]
    rec = make_record(answers=answers, query_name=spec["qname"] or "x.")
    if spec["mutate"] == "drop_scalar":
        del rec[spec["field"]]
        return rec, False
    if spec["mutate"] == "null_scalar":
        rec[spec["field"]] = None
        return rec, False
    if spec["mutate"] == "bad_ts":
        rec["query_timestamp"] = "04/02/2021 17:51"
        return rec, False
    # a null/missing Rdata in any answer is itself a rejection
    # (app/app.py:208-210) regardless of other mutations
    base_valid = not (spec["null_rdata"] and spec["n_answers"] > 0)
    if spec["mutate"] == "drop_answer_type":
        if not answers:
            return rec, base_valid  # nothing to drop
        rec["answers"] = [{"Rdata": "1.2.3.4"}] + answers[1:]
        return rec, False
    return rec, base_valid


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(specs=st.lists(record_strategy, min_size=1, max_size=5))
def test_valid_iff_formats(spark, specs):
    built = [build_record(s) for s in specs]
    payload = envelope_json([r for r, _ in built])
    lines, quarantine = run_pipeline(spark, [payload])

    expected_lines = sum(
        1 + len(rec["answers"]) for rec, ok in built if ok
    )
    expected_rejects = sum(1 for _, ok in built if not ok)

    line_rows = lines.collect()
    assert len(line_rows) == expected_lines
    assert all(r["line"] is not None and "None" not in r["line"].split("#")[0] for r in line_rows)
    assert quarantine.count() == expected_rejects
    if expected_rejects:
        assert all(
            r["reject_reason"] is not None for r in quarantine.collect()
        )


# ---------------------------------------------------------------------------
# Sorted-neighborhood dedup vs a pure-Python reference (round 6)
# ---------------------------------------------------------------------------

_word = st.sampled_from(["alpha", "beta", "gamma", "delta", "epsilon", "zeta"])
_doc_text = st.one_of(
    st.none(),
    st.lists(_word, min_size=0, max_size=6).map(" ".join),
)


def _ref_sorted_neighborhood(docs, key_len, prefix_len, window, max_dist):
    """Dict/list reference: normalize, sort by (block key, id), pair
    within the window, Levenshtein on prefixes."""
    import re

    def lev(a, b):
        m, n = len(a), len(b)
        prev = list(range(n + 1))
        for i in range(1, m + 1):
            cur = [i] + [0] * n
            for j in range(1, n + 1):
                cur[j] = min(
                    prev[j] + 1,
                    cur[j - 1] + 1,
                    prev[j - 1] + (a[i - 1] != b[j - 1]),
                )
            prev = cur
        return prev[n]

    rows = []
    for i, t in docs:
        norm = re.sub(r"\s+", " ", (t or "").strip().lower())
        rows.append((norm[:key_len], i, norm[:prefix_len]))
    rows.sort()
    out = set()
    for a in range(len(rows)):
        for b in range(a + 1, min(a + 1 + window, len(rows))):
            d = lev(rows[a][2], rows[b][2])
            if d <= max_dist:
                ia, ib = rows[a][1], rows[b][1]
                out.add((min(ia, ib), max(ia, ib), d))
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(_doc_text, min_size=0, max_size=12),
    window=st.integers(min_value=1, max_value=4),
    max_dist=st.integers(min_value=0, max_value=8),
)
def test_sorted_neighborhood_matches_reference(spark, texts, window, max_dist):
    """The distributed sorted-neighborhood (range-partitioned
    global_rank + explode/equi-join candidates) must equal the
    quadratic single-machine reference for any doc set, window, and
    distance threshold — including NULL/empty texts and rank ties."""
    from dns_log_transformer_spark.operators import dedup

    docs = list(enumerate(texts))
    df = spark.createDataFrame(
        [(i, t) for i, t in docs], "doc_id long, text string"
    )
    got = {
        (r["doc_a"], r["doc_b"], r["edit_distance"])
        for r in dedup.sorted_neighborhood_pairs(
            df, key_len=10, prefix_len=20, window=window, max_distance=max_dist
        ).collect()
    }
    want = _ref_sorted_neighborhood(docs, 10, 20, window, max_dist)
    assert got == want


# ---------------------------------------------------------------------------
# TF-IDF cosine rerank vs a pure-Python reference (round 6)
# ---------------------------------------------------------------------------


def _ref_tfidf_cosine(docs, pairs, scale=10_000):
    import math
    from collections import Counter

    tf = {}
    for i, t in docs:
        toks = (t or "").strip().split()
        if toks:
            tf[i] = Counter(toks)
    dfreq = Counter()
    for c in tf.values():
        for term in c:
            dfreq[term] += 1
    n = len(docs)
    w = {
        i: {
            term: round(cnt * math.log(n / dfreq[term]) * scale)
            for term, cnt in c.items()
        }
        for i, c in tf.items()
    }
    out = {}
    for a, b in set(pairs):
        if a not in w or b not in w:
            continue  # a side with no tokens has no weight rows
        nsq_a = sum(v * v for v in w[a].values())
        nsq_b = sum(v * v for v in w[b].values())
        if nsq_a == 0 or nsq_b == 0:
            out[(a, b)] = 0.0
            continue
        dot = sum(w[a][t] * w[b].get(t, 0) for t in w[a])
        out[(a, b)] = round(dot / (nsq_a**0.5 * nsq_b**0.5), 4)
    return out


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(_doc_text, min_size=2, max_size=10),
    pair_idx=st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 9)), max_size=8
    ),
)
def test_tfidf_cosine_rerank_matches_reference(spark, texts, pair_idx):
    """The distributed candidate-restricted TF-IDF cosine (integer
    quantization, DECIMAL dots, zero-norm guard, duplicate-pair dedup)
    must equal a dict-based reference for any corpus and candidate
    list — including duplicate and self-referential candidate rows."""
    from dns_log_transformer_spark.operators import text as text_ops

    docs = list(enumerate(texts))
    n = len(docs)
    pairs = [
        (min(a % n, b % n), max(a % n, b % n))
        for a, b in pair_idx
        if a % n != b % n
    ]
    if not pairs:
        return
    df = spark.createDataFrame(docs, "doc_id long, text string")
    pdf = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    got = {
        (r["doc_a"], r["doc_b"]): r["cosine"]
        for r in text_ops.tfidf_cosine_rerank(df, pdf, n_docs=n).collect()
    }
    want = _ref_tfidf_cosine(docs, pairs)
    assert got == want


# ---------------------------------------------------------------------------
# BPE greedy trainer vs a pure-Python reference (round 6)
# ---------------------------------------------------------------------------


def _ref_bpe(texts, k):
    from collections import Counter

    cur = [" ".join((t or "").split()) for t in texts]
    cur = [t for t in cur if t]
    merges = []
    for rank in range(1, k + 1):
        counts = Counter()
        for t in cur:
            toks = t.split(" ")
            for a, b in zip(toks, toks[1:]):
                counts[(a, b)] += 1
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (lhs, rhs), cnt = best
        merges.append((rank, lhs, rhs, cnt))
        pat, rep = f" {lhs} {rhs} ", f" {lhs}_{rhs} "
        cur = [f" {t} ".replace(pat, rep).strip() for t in cur]
    return merges


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(_doc_text, min_size=0, max_size=10),
    k=st.integers(min_value=1, max_value=4),
)
def test_bpe_merge_steps_matches_reference(spark, texts, k):
    """The distributed greedy BPE trainer must equal the single-machine
    reference for any corpus and step count — the non-overlapping
    left-to-right replace semantics (Python str.replace scans the
    input the same way) and the (count DESC, lhs, rhs) tie-break are
    the load-bearing details."""
    from dns_log_transformer_spark.operators import text as text_ops

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = [
        (r["merge_rank"], r["lhs"], r["rhs"], r["pair_count"])
        for r in text_ops.bpe_merge_steps(df, k=k).collect()
    ]
    assert got == _ref_bpe(texts, k)


# ---------------------------------------------------------------------------
# merge_anchor_spans (the gaps-and-islands core shared by the batch
# winnow operator and the round-7 streaming winnow index)
# ---------------------------------------------------------------------------


def _spans_reference(doc_positions, k, min_anchors):
    """Obviously-correct per-doc interval merge: anchors cover
    [pos, pos+k-1]; sorted positions chain into one island while each
    next pos starts at or before the running max end + 1."""
    out = set()
    for doc, positions in doc_positions.items():
        runs: list[list[int]] = []
        for pos in sorted(set(positions)):
            if runs and pos <= runs[-1][-1] + k - 1 + 1:
                runs[-1].append(pos)
            else:
                runs.append([pos])
        for run in runs:
            if len(run) >= min_anchors:
                out.add((doc, run[0], run[-1] + k - 1 - run[0] + 1, len(run)))
    return out


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    docs=st.dictionaries(
        st.integers(min_value=1, max_value=6),
        st.lists(st.integers(min_value=1, max_value=60), min_size=1, max_size=25),
        min_size=1,
        max_size=6,
    ),
    k=st.integers(min_value=2, max_value=9),
    min_anchors=st.integers(min_value=1, max_value=3),
)
def test_merge_anchor_spans_matches_reference(spark, docs, k, min_anchors):
    from dns_log_transformer_spark.operators.corpus import merge_anchor_spans

    rows = [
        (doc, pos, f"fp{doc}_{pos}")
        for doc, positions in docs.items()
        for pos in sorted(set(positions))
    ]
    sa = spark.createDataFrame(rows, "doc_id long, pos int, fp string")
    got = {
        (r["doc_id"], r["span_start"], r["span_len"], r["n_anchors"])
        for r in merge_anchor_spans(
            sa, id_col="doc_id", k=k, min_anchors=min_anchors
        ).collect()
    }
    want = _spans_reference(docs, k, min_anchors)
    assert got == want


# ---------------------------------------------------------------------------
# Winnowing detection guarantee boundary (VERDICT r9 #8)
# ---------------------------------------------------------------------------
#
# The SWA'03 guarantee for k-gram winnowing with window w: any shared
# run of >= k + w - 1 chars contains w consecutive k-grams in BOTH
# docs, each doc has a window consisting of exactly those grams, and
# that window's minimum — the same VALUE in both docs — is selected,
# so at least one anchor fp is shared. One window-width more
# (>= k + 2w - 1 chars) gives two DISJOINT gram windows, hence >= 2
# shared anchors per doc — winnow_span_dedup's min_anchors=2 emission
# threshold. BELOW k + w - 1 nothing is guaranteed: the shared grams
# can lose every window-min election to smaller context grams.

_WK, _WW = 8, 4  # the operator defaults (corpus.winnow_span_dedup)


def _rand_letters(rng, n):
    return "".join(rng.choice("abcdefghijklmnopqrstuvwxyz") for _ in range(n))


def _planted_pair(rng, run_len, ctx=40):
    """Two docs sharing ONLY a planted run of exactly run_len chars,
    embedded at different offsets in distinct random contexts (pure
    lowercase letters: normalization is then the identity, so char
    positions in the docs are the positions the operator reports).

    The chars immediately flanking the run are forced to DIFFER
    between the two docs.  With independently-random flanks they
    coincide with probability ~1/26 per side, and when they do the
    TRUE shared run is genuinely one char longer than the planted one
    — winnow then correctly anchors a k-gram crossing the planted
    boundary and the guarantee test's strict span-inside-the-run
    assertion fails on a correct engine (hypothesis found seed 10983;
    boundary-coincidence class, VERDICT r10 #1).  Forcing distinct
    flanks makes the fixture enforce its own "share ONLY the run"
    claim."""
    alphabet = "abcdefghijklmnopqrstuvwxyz"
    run = _rand_letters(rng, run_len)
    left_a, left_b = rng.sample(alphabet, 2)
    right_a, right_b = rng.sample(alphabet, 2)
    a = _rand_letters(rng, ctx - 1) + left_a + run + right_a + _rand_letters(rng, ctx - 1)
    b = _rand_letters(rng, ctx + 6) + left_b + run + right_b + _rand_letters(rng, ctx - 6)
    return a, b


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(seed=st.integers(min_value=0, max_value=2**31))
def test_winnow_guarantee_at_and_above_threshold(spark, seed):
    """AT the guarantee threshold (run = k + w - 1 chars) the two docs
    must share >= 1 anchor fp; at k + 2w - 1 they must share >= 2
    anchor positions each AND winnow_span_dedup must emit a span for
    both docs that lies inside the planted run."""
    import random

    from dns_log_transformer_spark.operators import corpus
    from dns_log_transformer_spark.operators.text import winnow_anchors_arrow

    rng = random.Random(seed)
    ctx = 40
    a1, b1 = _planted_pair(rng, _WK + _WW - 1, ctx)      # fp guarantee
    a2, b2 = _planted_pair(rng, _WK + 2 * _WW - 1, ctx)  # span guarantee
    df = spark.createDataFrame(
        [(10, a1), (11, b1), (20, a2), (21, b2)], "doc_id long, text string"
    )
    anchors = winnow_anchors_arrow(df, k=_WK, w=_WW).collect()
    fps = {}
    for r in anchors:
        fps.setdefault(r["doc_id"], set()).add(r["fp"])
    assert fps[10] & fps[11], (
        f"seed {seed}: no shared anchor at the k+w-1 guarantee threshold"
    )
    assert len(fps[20] & fps[21]) >= 2

    spans = corpus.winnow_span_dedup(df, k=_WK, w=_WW).collect()
    by_doc = {}
    for r in spans:
        by_doc.setdefault(r["doc_id"], []).append(
            (r["span_start"], r["span_len"], r["n_anchors"])
        )
    run_len = _WK + 2 * _WW - 1
    for doc, run_start in ((20, ctx + 1), (21, ctx + 7 + 1)):
        assert doc in by_doc, f"seed {seed}: doc {doc} emitted no span"
        inside = [
            s for s in by_doc[doc]
            if s[0] >= run_start and s[0] + s[1] <= run_start + run_len
            and s[2] >= 2
        ]
        assert inside, (
            f"seed {seed}: doc {doc} spans {by_doc[doc]} none inside the "
            f"planted run [{run_start}, {run_start + run_len})"
        )


def test_winnow_below_threshold_can_miss(spark):
    """ONE char below the guarantee (run = k + w - 2: only w - 1 shared
    grams, so neither doc necessarily owns a window made purely of run
    grams) detection is NOT guaranteed — a seeded search finds a
    concrete corpus where the pair shares ZERO anchors. This pins the
    boundary from below: the guarantee in the sibling test is exactly
    tight, and callers must not assume sub-threshold boilerplate is
    caught."""
    import random

    from dns_log_transformer_spark.operators.text import winnow_anchors_arrow

    rng = random.Random(0xB0B)
    rows = []
    specs = []
    for i in range(40):
        a, b = _planted_pair(rng, _WK + _WW - 2)
        rows += [(2 * i, a), (2 * i + 1, b)]
        specs.append((2 * i, 2 * i + 1))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    anchors = winnow_anchors_arrow(df, k=_WK, w=_WW).collect()
    fps = {}
    for r in anchors:
        fps.setdefault(r["doc_id"], set()).add(r["fp"])
    missed = [
        (a, b) for a, b in specs if not (fps.get(a, set()) & fps.get(b, set()))
    ]
    assert missed, (
        "every below-threshold pair was detected — either the seed got "
        "lucky 40/40 (rerun with another) or the guarantee is looser "
        "than documented"
    )
