"""Bigram-LM scoring (operators/lm.py): pure-Python differential for
the fp log-prob edge, the one-row-per-document contract (empty docs),
and plan guards (no window anywhere, top-k is TakeOrderedAndProject)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from piholelongtermstats_spark.operators import lm
from piholelongtermstats_spark.sources.parquet import load_table

SF = "/root/testdata/sf0.001"


def _docs(spark):
    from piholelongtermstats_spark.session import ensure_session_defaults

    ensure_session_defaults(spark)
    return load_table(spark, SF, "documents")


def test_doc_logprob_matches_python(spark):
    """Exact replay: train the same add-1 bigram model with Python
    dicts over the same corpus, score every doc, compare sums to
    1e-9 (fp sum order may differ across partitions)."""
    docs = _docs(spark)
    rows = docs.select("doc_id", "text").collect()
    uni: dict[str, int] = {}
    bi: dict[tuple[str, str], int] = {}
    doc_pairs: dict[int, list[tuple[str, str]]] = {}
    for r in rows:
        toks = r["text"].split()
        for t in toks:
            uni[t] = uni.get(t, 0) + 1
        pairs = list(zip(toks, toks[1:]))
        doc_pairs[r["doc_id"]] = pairs
        for p in pairs:
            bi[p] = bi.get(p, 0) + 1
    v = len(uni)
    got = {r["doc_id"]: r for r in lm.doc_logprob(docs).collect()}
    assert set(got) == set(doc_pairs)
    for doc_id, pairs in doc_pairs.items():
        want = sum(
            math.log(bi[p] + 1) - math.log(uni[p[0]] + v) for p in pairs
        )
        g = got[doc_id]
        assert g["n_bigrams"] == len(pairs), doc_id
        assert abs(g["logprob_sum"] - want) < 1e-9, (doc_id, g, want)
        if pairs:
            assert abs(g["avg_logprob"] - want / len(pairs)) < 1e-9, doc_id


def test_one_row_per_document_including_empty(spark):
    """The r6 DSIR lesson as a day-one contract: token-poor documents
    (empty / whitespace / single-token) still emit exactly one row
    with n_bigrams=0 and zero sums."""
    docs = spark.createDataFrame(
        [
            (0, "alpha beta alpha"),
            (1, ""),
            (2, "   "),
            (3, "single"),
            (4, "alpha beta"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in lm.doc_logprob(docs).collect()}
    assert set(out) == {0, 1, 2, 3, 4}
    for d in (1, 2, 3):
        assert out[d]["n_bigrams"] == 0, d
        assert out[d]["logprob_sum"] == 0.0, d
        assert out[d]["avg_logprob"] == 0.0, d
    assert out[0]["n_bigrams"] == 2
    assert out[4]["n_bigrams"] == 1


def test_bigram_counts_exact_on_fixture(spark):
    docs = spark.createDataFrame(
        [(0, "a b a b"), (1, "a b c"), (2, "")],
        "doc_id long, text string",
    )
    got = {
        (r["w1"], r["w2"]): r["cnt"] for r in lm.bigram_counts(docs).collect()
    }
    assert got == {("a", "b"): 3, ("b", "a"): 1, ("b", "c"): 1}


def test_bigram_counts_double_on_doubled_corpus(spark):
    """Doubling invariant: on corpus ∪ id-shifted copy every bigram
    count exactly doubles and the vocabulary (V) is unchanged — the
    scale proof's algebraic form for the counting tier."""
    docs = _docs(spark).select("doc_id", "text")
    shift = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    doubled = docs.unionAll(
        docs.select((F.col("doc_id") + shift).alias("doc_id"), "text")
    )
    base = {
        (r["w1"], r["w2"]): r["cnt"] for r in lm.bigram_counts(docs).collect()
    }
    twice = {
        (r["w1"], r["w2"]): r["cnt"]
        for r in lm.bigram_counts(doubled).collect()
    }
    assert twice == {k: 2 * v for k, v in base.items()}
    v1 = lm.unigram_counts(docs).count()
    v2 = lm.unigram_counts(doubled).count()
    assert v1 == v2


def test_plans_have_no_window_and_topk_is_take_ordered(spark):
    """Neither the scoring join nor the model build may introduce a
    window (the corpus is never totally ordered); the top-k face must
    run as TakeOrderedAndProject."""
    docs = _docs(spark)
    for df, want_tako in ((lm.bigram_topk(docs), True), (lm.doc_logprob(docs), False)):
        plan = df._jdf.queryExecution().explainString(
            df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        assert "Window" not in plan, plan
        assert "CartesianProduct" not in plan, plan
        if want_tako:
            assert "TakeOrderedAndProject" in plan, plan
