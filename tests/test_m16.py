"""M16: range boundaries, contrastive negatives, CCNet ppl buckets."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from piholelongtermstats_spark.operators import approx, corpus, lm


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


# ---------------------------------------------------------------------------
# range_boundaries
# ---------------------------------------------------------------------------


def test_range_boundaries_hand_computed(spark):
    df = spark.createDataFrame([(float(v),) for v in range(1, 9)], "x double")
    got = {r["bucket"]: r["boundary"] for r in approx.range_boundaries(df, "x", 4).collect()}
    # n=8, nb=4: boundary_i = smallest v with cum*4 >= i*8 → 2, 4, 6
    assert got == {1: 2.0, 2: 4.0, 3: 6.0}


def test_range_boundaries_skew_and_nulls(spark):
    rows = [(5.0,)] * 10 + [(None,)] * 3
    df = spark.createDataFrame(rows, "x double")
    got = approx.range_boundaries(df, "x", 3).collect()
    assert [r["boundary"] for r in got] == [5.0, 5.0]  # all mass on one value


def test_range_boundaries_balance_property(spark):
    rng = np.random.default_rng(13)
    vals = rng.integers(0, 1000, size=5000).astype(float)
    df = spark.createDataFrame([(float(v),) for v in vals], "x double")
    nb = 8
    bounds = [r["boundary"] for r in approx.range_boundaries(df, "x", nb).collect()]
    assert bounds == sorted(bounds)
    # each bucket holds at most ceil(n/nb) + max-multiplicity rows
    s = np.sort(vals)
    edges = [-math.inf] + bounds + [math.inf]
    sizes = [
        int(((s > edges[i]) & (s <= edges[i + 1])).sum()) if i > 0
        else int((s <= edges[1]).sum())
        for i in range(nb)
    ]
    assert sum(sizes) == len(vals)
    _, counts = np.unique(vals, return_counts=True)
    assert max(sizes) <= math.ceil(len(vals) / nb) + int(counts.max())


def test_range_boundaries_validation(spark):
    df = spark.createDataFrame([(1.0,)], "x double")
    with pytest.raises(ValueError):
        approx.range_boundaries(df, "x", 1)
    with pytest.raises(ValueError):
        approx.range_boundaries(df, "x", 4, quantize_to=-1.0)


# ---------------------------------------------------------------------------
# contrastive_negatives
# ---------------------------------------------------------------------------


def test_contrastive_negatives_differential(spark):
    n, k, pool_mod = 60, 3, 4
    docs = spark.createDataFrame(
        [(i, f"text {i}", "en") for i in range(n)],
        "doc_id long, text string, lang string",
    )
    got = [
        (r["doc_id"], r["j"], r["neg_doc_id"])
        for r in corpus.contrastive_negatives(docs, k=k, pool_mod=pool_mod).collect()
    ]

    pool = sorted(i for i in range(n) if _h60(str(i)) % pool_mod == 0)
    expect = []
    for d in range(n):
        for j in range(1, k + 1):
            neg = pool[_h60(f"{d}:{j}") % len(pool)]
            if neg != d:
                expect.append((d, j, neg))
    assert got == expect
    assert all(neg in pool for _, _, neg in got)
    assert all(d != neg for d, _, neg in got)


def test_contrastive_negatives_validation(spark):
    docs = spark.createDataFrame([(1, "t", "en")], "doc_id long, text string, lang string")
    with pytest.raises(ValueError):
        corpus.contrastive_negatives(docs, k=0)


# ---------------------------------------------------------------------------
# ppl_buckets (CCNet head/middle/tail)
# ---------------------------------------------------------------------------


def _ref_ppl_buckets(rows):
    """Pure-Python reference: add-1 bigram LM trained on the corpus,
    per-language histogram nearest-rank thirds."""
    toks = {d: t.split() for d, t, _ in rows}
    lang = {d: lg for d, _, lg in rows}
    uni, big = {}, {}
    for t in toks.values():
        for w in t:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(t, t[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
    v = len(uni)
    q = {}
    for d, t in toks.items():
        pairs = list(zip(t, t[1:]))
        if not pairs:
            q[d] = None
            continue
        lp = sum(
            math.log((big[p] + 1) / (uni[p[0]] + v)) for p in pairs
        ) / len(pairs)
        q[d] = int(np.round(-lp * 1_000_000))
    buckets = {}
    for lg in set(lang.values()):
        vals = sorted(q[d] for d in q if lang[d] == lg and q[d] is not None)
        if not vals:
            continue
        n = len(vals)
        # nearest-rank over the distinct-value histogram
        distinct = sorted(set(vals))
        cum, c = {}, 0
        for dv in distinct:
            c += vals.count(dv)
            cum[dv] = c
        t1 = min(dv for dv in distinct if cum[dv] * 3 >= n)
        t2 = min(dv for dv in distinct if cum[dv] * 3 >= 2 * n)
        for d in q:
            if lang[d] != lg:
                continue
            if q[d] is None:
                buckets[d] = "empty"
            elif q[d] <= t1:
                buckets[d] = "head"
            elif q[d] <= t2:
                buckets[d] = "middle"
            else:
                buckets[d] = "tail"
    for d in q:
        if q[d] is None:
            buckets[d] = "empty"
    return q, buckets


def test_ppl_buckets_differential(spark):
    rng = np.random.default_rng(17)
    vocab = [f"w{i}" for i in range(30)]
    rows = []
    for d in range(40):
        n = int(rng.integers(0, 25))
        text = " ".join(rng.choice(vocab, size=n)) if n else ""
        rows.append((d, text, "en" if d % 2 == 0 else "fr"))
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")

    got = {r["doc_id"]: r for r in lm.ppl_buckets(docs).collect()}
    q_ref, b_ref = _ref_ppl_buckets(rows)
    assert len(got) == 40
    for d in range(40):
        assert got[d]["ppl_q"] == q_ref[d], d
        assert got[d]["bucket"] == b_ref[d], d


def test_ppl_buckets_thirds_are_balanced(spark):
    # each doc mixes a frequent bigram (the,the) with one rare tail
    # bigram in a different ratio → 12 distinct scores, thirds 4/4/4
    rows = [(d, " ".join(["the"] * (d + 1)) + f" z{d}", "en") for d in range(12)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    counts = (
        lm.ppl_buckets(docs)
        .groupBy("bucket")
        .count()
        .toPandas()
        .set_index("bucket")["count"]
        .to_dict()
    )
    assert counts.get("empty", 0) == 0
    vals = [counts.get(b, 0) for b in ("head", "middle", "tail")]
    assert sum(vals) == 12 and max(vals) - min(vals) <= 1


# ---------------------------------------------------------------------------
# pmi_top_bigrams / oov_rate
# ---------------------------------------------------------------------------


def test_pmi_hand_computed(spark):
    # "a b" x6, "a c" x2, fillers: N=16 tokens
    # c(a)=8, c(b)=6, c(c)=2; c12(a,b)=6, c12(a,c)=2
    # lift(a,b) = 6*16/(8*6) = 2.0 ; lift(a,c) = 2*16/(8*2) = 2.0
    rows = [(i, "a b", "en") for i in range(6)] + [(10 + i, "a c", "en") for i in range(2)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = lm.pmi_top_bigrams(docs, min_count=2).collect()
    as_dict = {(r["w1"], r["w2"]): r for r in got}
    assert as_dict[("a", "b")]["lift"] == 2.0
    assert as_dict[("a", "b")]["c12"] == 6 and as_dict[("a", "b")]["c1"] == 8
    assert as_dict[("a", "c")]["lift"] == 2.0
    # min_count drops the hapax pathology
    assert all(r["c12"] >= 2 for r in got)
    # equal lift → tie broken by (w1, w2): (a,b) before (a,c)
    assert [(r["w1"], r["w2"]) for r in got[:2]] == [("a", "b"), ("a", "c")]


def test_pmi_rank_matches_log_pmi(spark):
    rng = np.random.default_rng(23)
    vocab = [f"w{i}" for i in range(12)]
    rows = [
        (d, " ".join(rng.choice(vocab, size=30)), "en") for d in range(25)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = lm.pmi_top_bigrams(docs, min_count=5, top_k=20).collect()
    lifts = [r["lift"] for r in got]
    assert lifts == sorted(lifts, reverse=True)
    # PMI (log lift) ordering == lift ordering (monotone transform)
    pmis = [math.log2(r["c12"] * 1.0) for r in got]  # sanity: no NaN path
    assert all(not math.isnan(p) for p in pmis)


def test_oov_rate_hand_computed(spark):
    # vocab_size=1 → only the most frequent word ("x", cnt 5) in-vocab
    rows = [
        (1, "x x x y", "en"),
        (2, "x x z", "fr"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {r["lang"]: r for r in lm.oov_rate(docs, vocab_size=1).collect()}
    assert got["en"]["n_tokens"] == 4 and got["en"]["n_oov"] == 1
    assert got["fr"]["n_tokens"] == 3 and got["fr"]["n_oov"] == 1
    assert got["en"]["oov_rate"] == pytest.approx(0.25)
    assert got["fr"]["oov_rate"] == pytest.approx(1 / 3)


# ---------------------------------------------------------------------------
# exact_substring_dedup
# ---------------------------------------------------------------------------


def test_exact_substring_dedup_catches_shifted_passages(spark):
    # the same 6-token passage starts at offset 0 in doc 1 and offset
    # 3 in doc 2: fixed-offset span_dedup (span=6) sees two DIFFERENT
    # chunkings and misses it; overlapping windows (k=6) catch it.
    passage = "p1 p2 p3 p4 p5 p6"
    rows = [
        (1, passage + " a1 a2 a3", "en"),
        (2, "b1 b2 b3 " + passage, "en"),
        (3, "c1 c2 c3 c4 c5 c6 c7 c8 c9", "en"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")

    fixed = {
        r["doc_id"]: r
        for r in corpus.span_dedup(docs, span=6, max_df=1).collect()
    }
    assert fixed[1]["removed_spans"] == 0 and fixed[2]["removed_spans"] == 0

    got = {
        r["doc_id"]: r
        for r in corpus.exact_substring_dedup(docs, k=6, min_df=2).collect()
    }
    assert got[1]["removed_tokens"] == 6 and got[1]["clean_text"] == "a1 a2 a3"
    assert got[2]["removed_tokens"] == 6 and got[2]["clean_text"] == "b1 b2 b3"
    assert got[3]["removed_tokens"] == 0 and got[3]["kept_tokens"] == 9


def test_exact_substring_dedup_coverage_union(spark):
    # overlapping duplicated windows cover the UNION of positions:
    # docs share an 8-token passage, k=5 → windows at offsets 0..3
    # all duplicated → all 8 tokens removed (not just the first 5)
    passage = " ".join(f"s{i}" for i in range(8))
    docs = spark.createDataFrame(
        [(1, passage + " tail1", "en"), (2, "head1 " + passage, "en")],
        "doc_id long, text string, lang string",
    )
    got = {
        r["doc_id"]: r
        for r in corpus.exact_substring_dedup(docs, k=5, min_df=2).collect()
    }
    assert got[1]["clean_text"] == "tail1" and got[1]["removed_tokens"] == 8
    assert got[2]["clean_text"] == "head1" and got[2]["removed_tokens"] == 8


def test_exact_substring_dedup_short_and_empty_docs(spark):
    docs = spark.createDataFrame(
        [(1, "", "en"), (2, "one two", "en"), (3, "one two", "en")],
        "doc_id long, text string, lang string",
    )
    got = {
        r["doc_id"]: r
        for r in corpus.exact_substring_dedup(docs, k=5, min_df=2).collect()
    }
    # docs shorter than k produce no windows → nothing removed
    assert got[1]["n_tokens"] == 0 and got[1]["clean_text"] == ""
    assert got[2]["removed_tokens"] == 0 and got[2]["clean_text"] == "one two"
    with pytest.raises(ValueError):
        corpus.exact_substring_dedup(docs, k=1)


def test_exact_substring_dedup_keep_first_policy(spark):
    passage = "p1 p2 p3 p4 p5 p6"
    docs = spark.createDataFrame(
        [
            (1, passage + " a1 a2 a3", "en"),
            (2, "b1 b2 b3 " + passage, "en"),
        ],
        "doc_id long, text string, lang string",
    )
    got = {
        r["doc_id"]: r
        for r in corpus.exact_substring_dedup(
            docs, k=6, min_df=2, policy="keep_first"
        ).collect()
    }
    # doc 1 (lowest id) owns the passage and keeps everything
    assert got[1]["removed_tokens"] == 0
    assert got[1]["clean_text"] == passage + " a1 a2 a3"
    # doc 2 loses only the duplicated span
    assert got[2]["removed_tokens"] == 6 and got[2]["clean_text"] == "b1 b2 b3"
    with pytest.raises(ValueError):
        corpus.exact_substring_dedup(docs, k=6, policy="nope")
