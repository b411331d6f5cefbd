"""Corpus-pipeline operators (operators/corpus.py): survivor
materialization, deterministic sampling, TF-IDF, decontamination.
Constructed edge cases + a differential test of the two-level
stratified tournament against the naive single window."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from piholelongtermstats_spark.operators import corpus, dedup
from piholelongtermstats_spark.operators.text import md5_hash60


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )


# ---------------------------------------------------------------------------
# dedup_survivors
# ---------------------------------------------------------------------------

def test_survivors_keep_representative_and_singletons(spark):
    docs = _docs(
        spark,
        [(i, f"doc {i}", "en", "s") for i in range(6)],
    )
    # clusters: {0,3,5} labeled 0 and {2,4} labeled 2; doc 1 unclustered
    clusters = spark.createDataFrame(
        [(0, 0), (3, 0), (5, 0), (2, 2), (4, 2)],
        "doc_id long, cluster_id long",
    )
    out = {
        r["doc_id"]: (r["cluster_id"], r["kept"])
        for r in corpus.dedup_survivors(docs, clusters).collect()
    }
    assert out == {
        0: (0, 1),
        1: (1, 1),
        2: (2, 1),
        3: (0, 0),
        4: (2, 0),
        5: (0, 0),
    }


def test_survivors_end_to_end_with_star_clusters(spark):
    # Three exact near-dup docs + two unique ones; the LSH pipeline
    # must cluster the triplet and keep exactly its min doc_id.
    dup = "alpha beta gamma delta epsilon zeta eta theta"
    docs = _docs(
        spark,
        [
            (10, dup, "en", "s"),
            (11, dup, "en", "s"),
            (12, dup, "en", "s"),
            (20, "one two three four five six seven eight", "en", "s"),
            (21, "red green blue cyan magenta yellow black white", "en", "s"),
        ],
    )
    pairs = dedup.lsh_candidate_pairs(docs)
    out = corpus.dedup_survivors(docs, dedup.duplicate_clusters_star(pairs))
    kept = sorted(r["doc_id"] for r in out.filter("kept = 1").collect())
    assert kept == [10, 20, 21]


# ---------------------------------------------------------------------------
# hash_sample
# ---------------------------------------------------------------------------

def test_hash_sample_deterministic_and_pure_filter(spark):
    docs = _docs(spark, [(i, f"t {i}", "en", "s") for i in range(500)])
    a = sorted(r["doc_id"] for r in corpus.hash_sample(docs, pct=10).collect())
    b = sorted(r["doc_id"] for r in corpus.hash_sample(docs, pct=10).collect())
    assert a == b
    assert 20 <= len(a) <= 90  # ~50 expected; md5 is uniform
    # monotone in pct: the 10% sample is a subset of the 20% sample
    c = set(r["doc_id"] for r in corpus.hash_sample(docs, pct=20).collect())
    assert set(a) <= c


# ---------------------------------------------------------------------------
# stratified_sample
# ---------------------------------------------------------------------------

def test_stratified_tournament_matches_naive_window(spark):
    rows = [
        (i, f"t {i}", ["en", "de", "fr"][i % 3], "s") for i in range(200)
    ]
    docs = _docs(spark, rows)
    got = corpus.stratified_sample(docs, k=7, group="lang", n_buckets=8)
    h = md5_hash60(F.col("doc_id").cast("string"))
    w = Window.partitionBy("lang").orderBy(h, "doc_id")
    want = (
        docs.select("doc_id", "lang")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 7)
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_stratified_small_group_returns_whole_group(spark):
    docs = _docs(
        spark,
        [(1, "a", "xx", "s"), (2, "b", "xx", "s"), (3, "c", "en", "s")],
    )
    out = corpus.stratified_sample(docs, k=5, group="lang")
    assert out.count() == 3  # both groups smaller than k → all rows


# ---------------------------------------------------------------------------
# tfidf_top_terms
# ---------------------------------------------------------------------------

def test_tfidf_ranks_distinctive_terms_first(spark):
    docs = _docs(
        spark,
        [
            (1, "shared shared rare1", "en", "s"),
            (2, "shared shared rare2", "en", "s"),
            (3, "shared other other", "en", "s"),
        ],
    )
    out = corpus.tfidf_top_terms(docs, k=1).collect()
    top = {r["doc_id"]: r["term"] for r in out}
    # "shared" has df=3 → idf=ln(1)=0; the doc-unique terms win.
    assert top == {1: "rare1", 2: "rare2", 3: "other"}
    for r in out:
        assert r["rank"] == 1 and r["df"] in (1, 2)


def test_tfidf_tie_break_by_tf_then_term(spark):
    # Two terms with identical (tf, df) → identical score: term asc.
    docs = _docs(
        spark,
        [(1, "bb aa", "en", "s"), (2, "cc dd", "en", "s")],
    )
    out = (
        corpus.tfidf_top_terms(docs, k=2)
        .filter("doc_id = 1")
        .orderBy("rank")
        .collect()
    )
    assert [r["term"] for r in out] == ["aa", "bb"]


# ---------------------------------------------------------------------------
# contamination_overlap
# ---------------------------------------------------------------------------

def test_contamination_planted_full_containment(spark):
    # Benchmark doc 29 is fully embedded in corpus doc 1 → overlap 1.0.
    bench_text = "alpha beta gamma delta"
    docs = _docs(
        spark,
        [
            (29, bench_text, "en", "s"),
            (1, "intro words " + bench_text + " trailing words", "en", "s"),
            (2, "unrelated content entirely different tokens", "en", "s"),
            (58, "no shingle collides with this benchmark row", "en", "s"),
        ],
    )
    sh = dedup.shingles(docs)
    out = {
        r["bench_id"]: (r["best_match"], r["overlap"])
        for r in corpus.contamination_overlap(sh, bench_mod=29).collect()
    }
    assert out[29] == (1, 1.0)
    assert out[58] == (-1, 0.0)
    # benchmark docs never match other benchmark docs
    assert all(m % 29 != 0 for m, _ in out.values() if m != -1)


def test_contamination_shuffle_fallback_matches_broadcast(spark):
    docs = _docs(
        spark,
        [
            (0, "aa bb cc dd ee", "en", "s"),
            (1, "aa bb cc xx yy", "en", "s"),
            (2, "zz ww vv uu tt", "en", "s"),
        ],
    )
    sh = dedup.shingles(docs)
    a = corpus.contamination_overlap(sh, bench_mod=29, broadcast_bench=True)
    b = corpus.contamination_overlap(sh, bench_mod=29, broadcast_bench=False)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


# ---------------------------------------------------------------------------
# corpus_build (end-to-end manifest)
# ---------------------------------------------------------------------------

def test_corpus_build_gates_dedups_and_caps(spark):
    long_ok = " ".join(f"w{i}" for i in range(12))  # 12 tokens, 0 stopwords
    stopy = "the a of and to in is on for with xx"  # 10/11 stopwords
    docs = _docs(
        spark,
        [
            (1, long_ok, "en", "s"),
            (2, long_ok, "en", "s"),          # exact dup of 1 → dropped
            (3, "short text", "en", "s"),     # < 10 tokens → gated
            (4, stopy, "en", "s"),            # stop ratio 10/11 > 0.6 → gated
            (5, long_ok + " tail", "de", "s"),
        ],
    )
    out = corpus.corpus_build(docs, k_per_lang=50).collect()
    got = {r["doc_id"]: (r["lang"], r["n_tokens"], r["rn"]) for r in out}
    assert got == {1: ("en", 12, 1), 5: ("de", 13, 1)}


def test_corpus_build_cap_applies_per_lang(spark):
    base = " ".join(f"tok{i}" for i in range(15))
    docs = _docs(
        spark,
        [(i, f"{base} unique{i}", ["en", "de"][i % 2], "s") for i in range(40)],
    )
    out = corpus.corpus_build(docs, k_per_lang=5)
    counts = {
        r["lang"]: r["n"]
        for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert counts == {"en": 5, "de": 5}
    assert out.filter("rn > 5").count() == 0


# ---------------------------------------------------------------------------
# doc_repetition
# ---------------------------------------------------------------------------

def test_doc_repetition_counts_repeats_and_short_docs(spark):
    docs = _docs(
        spark,
        [
            (1, "a b c a b c a b c", "en", "s"),   # 7 grams, 3 distinct
            (2, "x y z w", "en", "s"),             # 2 grams, both unique
            (3, "too short", "en", "s"),           # < 3 tokens → 0 grams
        ],
    )
    out = {
        r["doc_id"]: (r["total_ngrams"], r["distinct_ngrams"], r["rep_ratio"])
        for r in corpus.doc_repetition(docs, n=3).collect()
    }
    assert out[1] == (7, 3, 4 / 7)
    assert out[2] == (2, 2, 0.0)
    assert out[3] == (0, 0, 0.0)


# ---------------------------------------------------------------------------
# mix_sample
# ---------------------------------------------------------------------------

def test_mix_sample_rates_zero_one_and_partial(spark):
    docs = _docs(
        spark,
        [(i, f"t {i}", ["en", "de", "es"][i % 3], "s") for i in range(300)],
    )
    out = corpus.mix_sample(docs, {"en": 0.5, "de": 1.0, "es": 0.0})
    counts = {
        r["lang"]: r["n"]
        for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert counts.get("de") == 100      # rate 1.0 → everything kept
    assert "es" not in counts           # rate 0.0 → nothing kept
    assert 25 <= counts.get("en", 0) <= 75  # ~50 of 100 expected
    # deterministic: identical second run
    again = corpus.mix_sample(docs, {"en": 0.5, "de": 1.0, "es": 0.0})
    assert sorted(r["doc_id"] for r in out.collect()) == sorted(
        r["doc_id"] for r in again.collect()
    )


def test_mix_sample_rejects_bad_rates(spark):
    docs = _docs(spark, [(1, "t", "en", "s")])
    with pytest.raises(ValueError):
        corpus.mix_sample(docs, {"en": 1.5})


# ---------------------------------------------------------------------------
# corpus_delta
# ---------------------------------------------------------------------------

def test_corpus_delta_is_content_keyed(spark):
    prev = _docs(spark, [(1, "old content here", "en", "s")])
    new = _docs(
        spark,
        [
            (10, "old content here", "en", "s"),   # re-crawl, new id → NOT new
            (11, "brand new content", "en", "s"),  # new text → new
        ],
    )
    got = [r["doc_id"] for r in corpus.corpus_delta(new, prev).collect()]
    assert got == [11]


def test_tfidf_skew_split_matches_default(spark):
    docs = _docs(
        spark,
        [
            (i, "the common words here plus unique" + str(i), "en", "s")
            for i in range(30)
        ],
    )
    a = corpus.tfidf_top_terms(docs, k=3)
    b = corpus.tfidf_top_terms(docs, k=3, hot_df_threshold=10)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


# ---------------------------------------------------------------------------
# span_dedup (r5: repeated-span removal)
# ---------------------------------------------------------------------------

def test_span_dedup_removes_boilerplate_spans_in_order(spark):
    """A 3-token span shared by 3 docs is removed everywhere; spans in
    ≤2 docs survive; reassembly preserves original chunk order; a doc
    made ENTIRELY of boilerplate comes back with empty clean_text."""
    boiler = "one two three"
    docs = _docs(
        spark,
        [
            (0, boiler + " alpha beta gamma", "en", "s"),
            (1, "delta eps zeta " + boiler, "en", "s"),
            (2, boiler, "en", "s"),
            (3, "unique words here entirely kept yes", "en", "s"),
        ],
    )
    out = {
        r["doc_id"]: (
            r["n_spans"], r["kept_spans"], r["removed_spans"], r["clean_text"]
        )
        for r in corpus.span_dedup(docs, span=3, max_df=2).collect()
    }
    # each doc splits into 3-token chunks; the boiler chunk has df=3
    assert out[0] == (2, 1, 1, "alpha beta gamma")
    assert out[1] == (2, 1, 1, "delta eps zeta")
    assert out[2] == (1, 0, 1, "")
    assert out[3] == (2, 2, 0, "unique words here entirely kept yes")


def test_span_dedup_within_doc_repeat_counts_once(spark):
    """df counts DISTINCT documents: a span repeated twice inside one
    doc has df=1 and is kept (both occurrences, in order)."""
    docs = _docs(spark, [(0, "a b c a b c", "en", "s")])
    out = corpus.span_dedup(docs, span=3, max_df=2).collect()[0]
    assert (out["n_spans"], out["kept_spans"], out["removed_spans"]) == (2, 2, 0)
    assert out["clean_text"] == "a b c a b c"


def test_temperature_mix_flattens_distribution(spark):
    from piholelongtermstats_spark.operators.corpus import temperature_mix

    # skewed corpus: 400 'en', 100 'de', 25 'fr' — τ=1/2 keeps rates
    # 1·sqrt(25/400)=0.25, sqrt(25/100)=0.5, 1.0
    rows = (
        [(i, "x", "en", "s") for i in range(400)]
        + [(1000 + i, "x", "de", "s") for i in range(100)]
        + [(2000 + i, "x", "fr", "s") for i in range(25)]
    )
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    kept = temperature_mix(docs).groupBy("lang").count()
    by = {r["lang"]: r["count"] for r in kept.collect()}
    assert by["fr"] == 25  # smallest group keeps everything
    # expected 100 en / 50 de; hash acceptance is binomial — wide bands
    assert 60 <= by["en"] <= 140, by
    assert 30 <= by["de"] <= 70, by
    # flattening: post-mix ratios are closer to uniform than pre-mix
    assert by["en"] / by["fr"] < 400 / 25
    # deterministic: same run twice
    again = {
        r["lang"]: r["count"]
        for r in temperature_mix(docs).groupBy("lang").count().collect()
    }
    assert again == by


def test_temperature_mix_is_subset_and_zero_shuffle_filter(spark):
    from piholelongtermstats_spark.operators.corpus import temperature_mix

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    kept = temperature_mix(docs)
    all_ids = {r["doc_id"] for r in docs.select("doc_id").collect()}
    kept_ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    assert kept_ids <= all_ids and 0 < len(kept_ids) < len(all_ids)
    # the doc-side path is a broadcast-join filter: no shuffle of the
    # corpus (only the tiny count agg exchanges)
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
