"""Prefix-filtered exact set-similarity join (operators/setsim.py).

Three claims, each tested directly:
1. the prefix-filtered pair set is IDENTICAL to the brute-force exact
   join (differential, random corpus);
2. prefix filtering has zero recall loss even where the df_cap path
   by design loses pairs — two documents whose ONLY shared shingles
   are universe-frequent;
3. the integer prefix-length formula matches ⌈t·n⌉ computed exactly.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from piholelongtermstats_spark.operators import dedup, setsim


def _sh(spark, docs: dict[str, list[str]]):
    rows = [(d, s) for d, toks in docs.items() for s in set(toks)]
    return spark.createDataFrame(rows, "doc_id string, shingle string")


def _pairs(df) -> set[tuple]:
    return {(r.doc_a, r.doc_b) for r in df.collect()}


def _brute(docs: dict[str, list[str]], t: float) -> set[tuple]:
    ids = sorted(docs)
    out = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            sa, sb = set(docs[a]), set(docs[b])
            inter = len(sa & sb)
            if inter and inter / len(sa | sb) >= t:
                out.add((a, b))
    return out


def test_prefix_filter_matches_bruteforce(spark):
    rng = random.Random(13)
    vocab = [f"w{i}" for i in range(40)]
    docs = {}
    for i in range(60):
        base = rng.sample(vocab, rng.randint(4, 12))
        docs[f"d{i:03d}"] = base
        if rng.random() < 0.4:  # plant near-duplicates
            mut = list(base)
            if rng.random() < 0.5 and len(mut) > 5:
                mut.pop()
            else:
                mut.append(rng.choice(vocab))
            docs[f"d{i:03d}x"] = mut
    got = _pairs(setsim.prefix_filter_pairs(_sh(spark, docs), 4, 5))
    assert got == _brute(docs, 0.8)


def test_prefix_filter_on_stop_heavy_corpus(spark):
    """Corpus where every qualifying pair shares ONLY high-df shingles —
    the adversarial case where df_cap's exactness guard degrades to the
    full quadratic self-join (dedup.py:240-300). Prefix filtering must
    return the same exact answer with no fallback path at all, and the
    df_cap twin (via its guard) must agree."""
    common = [f"c{i}" for i in range(10)]
    docs = {f"bg{i:02d}": common + [f"u{i}"] for i in range(30)}
    # The planted pair shares exactly the 10 universe-frequent tokens
    # (df >= 30) plus nothing else: J = 10/12 ≈ 0.833 >= 0.8.
    docs["pa"] = common + ["pa_only"]
    docs["pb"] = common + ["pb_only"]
    sh = _sh(spark, docs)
    got = _pairs(setsim.prefix_filter_pairs(sh, 4, 5))
    assert ("pa", "pb") in got
    assert got == _brute(docs, 0.8)
    capped = dedup.ngram_jaccard_pairs(None, 0.8, sh=sh, df_cap=20)
    assert _pairs(capped) == got


def test_prefix_length_formula():
    for n in range(1, 500):
        for num, den in ((4, 5), (1, 2), (9, 10), (3, 4), (1, 1)):
            ceil_int = (num * n + den - 1) // den
            assert ceil_int == -((-num * n) // den)  # two integer ceils agree
            p = n - ceil_int + 1
            assert 1 <= p <= n


def test_prefix_is_rarest_tokens(spark):
    """The generated candidates only ever come from each document's
    lowest-df shingles — spot-check by planting one rare and many
    frequent shingles and asserting the candidate join key set."""
    common = [f"c{i}" for i in range(8)]
    docs = {f"bg{i:02d}": common for i in range(20)}
    docs["ra"] = common + ["rare1"]
    docs["rb"] = common + ["rare1"]
    got = _pairs(setsim.prefix_filter_pairs(_sh(spark, docs), 4, 5))
    assert ("ra", "rb") in got
    assert got == _brute(docs, 0.8)


def _brute_cross(a_docs: dict, b_docs: dict, t: float) -> set[tuple]:
    out = set()
    for a, ta in a_docs.items():
        for b, tb in b_docs.items():
            sa, sb = set(ta), set(tb)
            inter = len(sa & sb)
            if inter and inter / len(sa | sb) >= t:
                out.add((a, b))
    return out


def test_prefix_filter_join_matches_bruteforce(spark):
    rng = random.Random(29)
    vocab = [f"w{i}" for i in range(30)]
    batch = {f"b{i:02d}": rng.sample(vocab, rng.randint(4, 10)) for i in range(20)}
    corpus = {f"c{i:02d}": rng.sample(vocab, rng.randint(4, 10)) for i in range(40)}
    # plant cross-corpus near-dups
    for i in range(6):
        corpus[f"cdup{i}"] = list(batch[f"b{i:02d}"])
    got = _pairs(setsim.prefix_filter_join(_sh(spark, batch), _sh(spark, corpus), 4, 5))
    assert got == _brute_cross(batch, corpus, 0.8)
    assert got, "fixture must plant at least one cross pair"
    # the join is strictly cross-corpus: no batch-batch or corpus-corpus pair
    for a, b in got:
        assert a.startswith("b") and (a not in corpus) and (b in corpus)


def test_incremental_new_docs_audit(spark):
    batch = {"b1": ["x", "y", "z", "w"], "b2": ["p", "q", "r", "s"]}
    corpus = {"c1": ["x", "y", "z", "w"], "c2": ["m", "n", "o"]}
    ids = spark.createDataFrame([("b1",), ("b2",), ("b3",)], "doc_id string")
    out = {
        r.doc_id: (r.n_matches, r.is_new)
        for r in setsim.incremental_new_docs(
            _sh(spark, batch), _sh(spark, corpus), 4, 5, batch_ids=ids
        ).collect()
    }
    # b1 duplicates c1; b2 matches nothing; b3 has no shingles at all
    # (absent from sh_batch) and must still appear, trivially new.
    assert out == {"b1": (1, False), "b2": (0, True), "b3": (0, True)}
