"""Property-based (hypothesis) invariants for the dedup/sampling tier.

Each property runs a handful of randomized corpora through REAL Spark
plans (examples kept small and few — every example is a Spark job).

The capped-Jaccard property pins the operator's documented contract
precisely: the df_cap path is SOUND (never emits a wrong pair — every
emitted pair carries the true Jaccard and passes the threshold) and
its only permitted incompleteness is a pair whose every common shingle
has document frequency > df_cap (dedup.py's stop-shingle caveat).
"""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from piholelongtermstats_spark.operators import corpus, dedup

VOCAB = [f"w{i}" for i in range(12)]

docs_strategy = st.lists(
    st.lists(st.sampled_from(VOCAB), min_size=3, max_size=10),
    min_size=4,
    max_size=24,
)


def _py_shingles(toks: list[str]) -> set[str]:
    return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}


@settings(
    max_examples=8, deadline=None, suppress_health_check=list(HealthCheck)
)
@given(docs_strategy, st.integers(min_value=1, max_value=4))
def test_capped_jaccard_sound_and_characterized_complete(
    spark, token_docs, df_cap
):
    rows = [(i, " ".join(toks), "en", "s") for i, toks in enumerate(token_docs)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(df, 0.5, df_cap=df_cap).collect()
    }
    # python oracle
    sh = {i: _py_shingles(toks) for i, toks in enumerate(token_docs)}
    freq = Counter(s for ss in sh.values() for s in ss)
    exact = {}
    for a in sh:
        for b in sh:
            if a < b and sh[a] and sh[b]:
                inter = sh[a] & sh[b]
                j = len(inter) / len(sh[a] | sh[b])
                if round(j, 6) >= 0.5:
                    exact[(a, b)] = (round(j, 6), inter)
    # sound: every emitted pair is a true qualifying pair w/ true score
    for pair, j in got.items():
        assert pair in exact, (pair, exact)
        assert j == exact[pair][0]
    # characterized completeness: a missed pair must have ALL common
    # shingles with df > df_cap
    for pair, (j, inter) in exact.items():
        if pair not in got:
            assert all(freq[s] > df_cap for s in inter), (pair, inter)


@settings(
    max_examples=8, deadline=None, suppress_health_check=list(HealthCheck)
)
@given(
    st.lists(st.sampled_from(["en", "de", "fr", "zh"]), min_size=1, max_size=40),
    st.integers(min_value=1, max_value=6),
    st.integers(min_value=1, max_value=5),
)
def test_stratified_tournament_equals_naive_window(spark, langs, k, n_buckets):
    rows = [(i, f"text {i}", g, "s") for i, g in enumerate(langs)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    got = corpus.stratified_sample(df, k=k, group="lang", n_buckets=n_buckets)
    from pyspark.sql import Window

    from piholelongtermstats_spark.operators.text import md5_hash60

    w = Window.partitionBy("lang").orderBy(
        md5_hash60(F.col("doc_id").cast("string")), "doc_id"
    )
    want = (
        df.select("doc_id", "lang")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


@settings(
    max_examples=6, deadline=None, suppress_health_check=list(HealthCheck)
)
@given(docs_strategy, st.integers(min_value=1, max_value=3))
def test_span_dedup_matches_python_oracle(spark, token_docs, max_df):
    """span_dedup ≡ a direct python computation on any corpus: chunk
    each doc into 3-token spans, count DISTINCT-doc frequency, drop
    spans over max_df everywhere, reassemble in order. Also pins the
    accounting identity kept + removed == n_spans."""
    span = 3
    rows = [(i, " ".join(toks), "en", "s") for i, toks in enumerate(token_docs)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    got = {
        r["doc_id"]: (
            r["n_spans"], r["kept_spans"], r["removed_spans"], r["clean_text"]
        )
        for r in corpus.span_dedup(df, span=span, max_df=max_df).collect()
    }
    chunks = {
        i: [
            " ".join(toks[p : p + span])
            for p in range(0, len(toks), span)
        ]
        for i, toks in enumerate(token_docs)
    }
    dfreq = Counter()
    for i, cs in chunks.items():
        for c in set(cs):
            dfreq[c] += 1
    for i, cs in chunks.items():
        kept = [c for c in cs if dfreq[c] <= max_df]
        want = (
            len(cs),
            len(kept),
            len(cs) - len(kept),
            " ".join(kept),
        )
        assert got[i] == want, (i, got[i], want)
