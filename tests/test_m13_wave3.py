"""Wave-3 M13 operators: per-source token-budget capping and the
leakage-safe (cluster-aware) train/test split."""

from __future__ import annotations

import hashlib

from piholelongtermstats_spark.operators import corpus


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_source_token_caps_matches_single_window(spark):
    docs = spark.createDataFrame(
        [
            (i, " ".join(["w"] * (3 + i % 7)), "lang", f"src{i % 3}", 1)
            for i in range(60)
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = corpus.source_token_caps(docs, budget=20, n_buckets=8).collect()
    # Python reference: same (md5, doc_id) order, single running sum.
    per_source: dict[str, list[tuple[int, int, int]]] = {}
    for i in range(60):
        per_source.setdefault(f"src{i % 3}", []).append(
            (_h60(str(i)), i, 3 + i % 7)
        )
    expect = {}
    for src, rows in per_source.items():
        cum = 0
        for h, doc, n in sorted(rows):
            cum += n
            expect[doc] = (src, n, cum, cum <= 20)
    assert len(got) == 60
    for r in got:
        assert expect[r.doc_id] == (r.source, r.n_tok, r.cum_tok, r.kept)


def test_source_token_caps_budget_boundary(spark):
    # Two docs of 10 tokens each, budget exactly 20: both kept; a third
    # pushes cum to 30 and is dropped — <= boundary, not <.
    docs = spark.createDataFrame(
        [(i, " ".join(["t"] * 10), "l", "s", 1) for i in range(3)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    rows = corpus.source_token_caps(docs, budget=20).collect()
    kept = sorted((r.cum_tok, r.kept) for r in rows)
    assert kept == [(10, True), (20, True), (30, False)]


def test_leakage_safe_split_no_cluster_straddles(spark):
    docs = spark.createDataFrame(
        [(i, "", "l", "s", 0) for i in range(40)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    # 10 clusters of size 3 (docs 3k,3k+1,3k+2 share cluster 3k), rest
    # singletons (absent from the clusters frame).
    clusters = spark.createDataFrame(
        [(3 * k + j, 3 * k) for k in range(10) for j in range(3)],
        "doc_id long, cluster_id long",
    )
    out = {r.split: r for r in corpus.leakage_safe_split(docs, clusters).collect()}
    assert set(out) <= {"train", "test"}
    assert sum(r.n_docs for r in out.values()) == 40
    for r in out.values():
        assert r.leaked_clusters == 0
    # Independent structural check: recompute each doc's split from its
    # cluster hash and confirm every cluster is single-split.
    assig = {}
    for k in range(10):
        split = "train" if _h60(str(3 * k)) % 100 < 90 else "test"
        for j in range(3):
            assig[3 * k + j] = split
    for d in range(30, 40):
        assig[d] = "train" if _h60(str(d)) % 100 < 90 else "test"
    from collections import Counter

    cnt = Counter(assig.values())
    for split, r in out.items():
        assert r.n_docs == cnt[split]


def test_naive_per_doc_split_would_leak(spark):
    """The failure mode the operator exists to prevent: hashing DOC ids
    instead of CLUSTER ids splits at least one near-dup cluster across
    train and test on this fixture."""
    members = {3 * k + j: 3 * k for k in range(10) for j in range(3)}
    naive = {d: ("train" if _h60(str(d)) % 100 < 90 else "test") for d in members}
    by_cluster: dict[int, set] = {}
    for d, c in members.items():
        by_cluster.setdefault(c, set()).add(naive[d])
    assert any(len(s) > 1 for s in by_cluster.values())
