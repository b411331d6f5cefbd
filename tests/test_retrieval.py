"""BM25 + RRF retrieval (operators/retrieval.py): constructed-case
scoring semantics, fusion properties, and plan shape."""

from __future__ import annotations

import math

from piholelongtermstats_spark.operators import retrieval


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bm25_ordering_and_membership(spark):
    docs = _docs(
        spark,
        [
            (0, "scan scan scan merge window extra pad tokens here now"),
            (1, "scan merge pad pad pad pad pad pad pad pad"),
            (2, "totally unrelated words only pad pad pad pad pad pad"),
            (3, "scan pad pad pad pad pad pad pad pad pad"),
        ],
    )
    out = retrieval.bm25_topk(docs, query=("scan", "merge", "window")).collect()
    ids = [r.doc_id for r in out]
    assert 2 not in ids  # no query term → absent, not zero-scored
    assert ids[0] == 0  # most matched terms, highest tf → top
    scores = {r.doc_id: r.score for r in out}
    assert scores[1] > scores[3]  # two terms beat one at equal length


def test_bm25_matches_hand_computation(spark):
    # one doc, one query term: score = idf * tf(k1+1)/(tf + k1) since
    # dl == avgdl makes the length norm collapse to 1
    docs = _docs(spark, [(0, "scan scan pad pad")])
    out = retrieval.bm25_topk(docs, query=("scan",)).collect()
    idf = math.log(1.0 + (1 - 1 + 0.5) / (1 + 0.5))
    expect = round(idf * (2 * 2.2) / (2 + 1.2), 6)
    assert out[0].score == expect


def test_rrf_fusion_prefers_docs_in_both_legs(spark, tmp_path):
    # build a tiny corpus where doc 5 ranks mid in BOTH legs while
    # docs 1-4 appear in only one leg each
    import numpy as np

    docs = _docs(
        spark,
        [(0, "query doc"), (1, "scan scan scan pad"), (5, "scan pad pad pad"),
         (2, "nothing here at all"), (3, "pad " * 4), (4, "filler words pad x")],
    )
    rng = [0.0] * 8
    def vec(seed):
        v = [0.0] * 8
        v[seed % 8] = 1.0
        v[(seed + 1) % 8] = 0.5
        return v
    emb = spark.createDataFrame(
        [(i, vec(i if i != 5 else 1), 0) for i in [0, 1, 2, 3, 4, 5]],
        "vec_id long, embedding array<float>, label int",
    )
    out = retrieval.hybrid_rrf_topk(docs, emb, query=("scan",), k=5).collect()
    got = {r.doc_id: r for r in out}
    # doc 5 has a BM25 rank AND a cosine rank → both components > 0
    assert got[5].r_bm25 > 0 and got[5].r_cos > 0
    # every returned rrf equals the recomputed fixed-order sum
    for r in out:
        expect = (1.0 / (60 + r.r_bm25) if r.r_bm25 else 0.0) + (
            1.0 / (60 + r.r_cos) if r.r_cos else 0.0
        )
        assert r.rrf == expect


def test_bm25_topk_is_take_ordered(spark):
    docs = _docs(spark, [(0, "scan pad")])
    df = retrieval.bm25_topk(docs)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan


def test_empty_corpus(spark):
    empty = _docs(spark, [])
    assert retrieval.bm25_topk(empty).count() == 0


def test_inverted_postings_partitioning_independent(spark):
    """The posting md5 folds doc-ordered pairs, so any partitioning
    yields identical hashes; tf/df audited on a constructed corpus."""
    from piholelongtermstats_spark.operators.retrieval import (
        inverted_postings_audit,
    )

    docs = spark.createDataFrame(
        [
            (1, "a b a", "en", "s", 5),
            (2, "b b c", "en", "s", 5),
            (3, "a", "en", "s", 1),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = {r.term: r for r in inverted_postings_audit(docs).collect()}
    assert (got["a"].df, got["a"].total_tf) == (2, 3)
    assert (got["b"].df, got["b"].total_tf) == (2, 3)
    assert (got["c"].df, got["c"].total_tf) == (1, 1)
    again = {
        r.term: r.postings_md5
        for r in inverted_postings_audit(docs.repartition(7)).collect()
    }
    assert {t: r.postings_md5 for t, r in got.items()} == again
