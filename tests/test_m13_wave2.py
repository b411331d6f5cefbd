"""Wave-2 M13 operators: kNN label voting, percentile blending, and
the heavy-hitters doubling property."""

from __future__ import annotations

from fractions import Fraction

from pyspark.sql import functions as F

from piholelongtermstats_spark.operators import freq, knn, text


def _emb(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )


def test_knn_label_vote_majority_and_tiebreak(spark):
    # Query 0 at the origin-ish; corpus on two axes. k=5, n_queries=1.
    # Labels: three votes for 7 (ranks 2,4,5), two for 3 (ranks 1,3)
    # -> majority 7 despite label 3 holding the nearest neighbor.
    rows = [
        (0, [1.0, 0.0], 0),  # query
        (1, [1.0, 0.001], 3),   # rank 1
        (2, [1.0, 0.01], 7),    # rank 2
        (3, [1.0, 0.02], 3),    # rank 3
        (4, [1.0, 0.03], 7),    # rank 4
        (5, [1.0, 0.04], 7),    # rank 5
        (6, [0.0, 1.0], 9),     # far — outside k
    ]
    out = knn.knn_label_vote(_emb(spark, rows), n_queries=1, k=5).collect()
    assert [(r.query_id, r.pred_label, r.votes) for r in out] == [(0, 7, 3)]

    # Vote tie (2 vs 2): label holding the NEAREST neighbor wins.
    rows_tie = [
        (0, [1.0, 0.0], 0),
        (1, [1.0, 0.001], 5),  # rank 1 -> label 5 best_rank 1
        (2, [1.0, 0.01], 2),   # rank 2
        (3, [1.0, 0.02], 5),   # rank 3
        (4, [1.0, 0.03], 2),   # rank 4
    ]
    out = knn.knn_label_vote(_emb(spark, rows_tie), n_queries=1, k=4).collect()
    assert [(r.pred_label, r.votes, r.best_rank) for r in out] == [(5, 2, 1)]


def test_percentile_blend_exact_small(spark):
    docs = spark.createDataFrame(
        [
            ("d1", "one two three", 13),
            ("d2", "one two", 7),
            ("d3", "one two three four five", 23),
            ("d4", "one", 3),
        ],
        "doc_id string, text string, n_chars int",
    )
    out = {r.doc_id: r for r in text.percentile_blend(docs, top_n=4).collect()}
    # wc: d4=1, d2=2, d1=3, d3=5; n_chars strictly increasing with wc,
    # so both ECDFs coincide: 1/4, 2/4, 3/4, 4/4.
    for doc, rank in (("d4", 1), ("d2", 2), ("d1", 3), ("d3", 4)):
        expect = float(Fraction(rank, 4))
        assert out[doc].pct_wc == expect
        assert out[doc].pct_chars == expect
        assert out[doc].blend == expect
    # top_n ordering: highest blend first
    ordered = [r.doc_id for r in text.percentile_blend(docs, top_n=2).collect()]
    assert ordered == ["d3", "d1"]


def test_percentile_blend_tied_values_share_percentile(spark):
    docs = spark.createDataFrame(
        [("a", "x y", 5), ("b", "p q", 5), ("c", "p q r s", 9)],
        "doc_id string, text string, n_chars int",
    )
    out = {r.doc_id: r for r in text.percentile_blend(docs, top_n=3).collect()}
    # wc 2 appears twice: both get ECDF 2/3 (count of values <= 2).
    assert out["a"].pct_wc == out["b"].pct_wc == round(2 / 3, 6)
    assert out["c"].pct_wc == 1.0


def test_heavy_hitters_doubling_property(spark):
    values = ["a"] * 50 + ["b"] * 30 + [f"x{i}" for i in range(20)]
    df = spark.createDataFrame([(v,) for v in values], "domain string")
    one = {(r.item, r.cnt, r.n_total)
           for r in freq.heavy_hitters_exact(df, "domain", 4).collect()}
    two = {(r.item, r.cnt, r.n_total)
           for r in freq.heavy_hitters_exact(df.unionByName(df), "domain", 4).collect()}
    assert two == {(i, 2 * c, 2 * n) for (i, c, n) in one}
