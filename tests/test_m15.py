"""M15 sketch + mixture tier: constructed-edge exactness and
differential pins for CMS, Bloom, UniMax, KN continuations, and the
embedding stats/PCA pair."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from piholelongtermstats_spark.operators import bloom, freq, lm, mixture, pca


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


# ---------------------------------------------------------------------------
# UniMax waterfill
# ---------------------------------------------------------------------------


def test_unimax_hand_computed(spark):
    # tokens: a=2, b=4, c=10  → T=16, B = 3*16 DIV 4 = 12, E=1
    # sorted supplies [2, 4, 10]; i=1: 2*3=6 <= 12 → capped;
    # i=2: 4*2=8 <= 12-2=10 → capped; i=3: 10*1=10 > 12-6=6 → uncapped
    # leftover share = (12 - 6) / 1 = 6.0
    docs = _docs(
        spark,
        [
            (1, "x x", "a"),
            (2, "x x x x", "b"),
            (3, "x x x x x x x x x x", "c"),
        ],
    )
    got = {
        r["lang"]: r
        for r in mixture.unimax_allocation(docs, (3, 4), max_epochs=1).collect()
    }
    assert got["a"]["capped"] and got["a"]["alloc_tokens"] == 2.0
    assert got["b"]["capped"] and got["b"]["alloc_tokens"] == 4.0
    assert not got["c"]["capped"] and got["c"]["alloc_tokens"] == 6.0


def test_unimax_all_capped_leaves_budget_unallocated(spark):
    # B = 3*4 DIV 4 = 3 with E=2: supplies [2, 6]; i=1: 2*2=4 > 3 →
    # nobody capped?  No: use a generous ratio instead. T=4, ratio
    # (5, 1) → B=20 covers both supplies (4 and 4): all capped, the
    # share division never runs (no div-by-zero on n-k=0).
    docs = _docs(spark, [(1, "x x", "a"), (2, "y y", "b")])
    rows = mixture.unimax_allocation(docs, (5, 1), max_epochs=2).collect()
    assert all(r["capped"] for r in rows)
    assert all(r["alloc_tokens"] == float(r["supply"]) for r in rows)


def test_unimax_differential_waterfill(spark):
    # Independent greedy waterfill in plain Python over a skewed mix.
    counts = {"a": 3, "b": 7, "c": 19, "d": 51, "e": 120}
    docs = _docs(
        spark,
        [(i, " ".join(["w"] * n), lang) for i, (lang, n) in enumerate(counts.items())],
    )
    total = sum(counts.values())
    budget = (3 * total) // 4
    supplies = sorted((n, lang) for lang, n in counts.items())
    remaining, m, expect = budget, len(supplies), {}
    share = None
    for s, lang in supplies:
        if s * m <= remaining:
            expect[lang] = (True, float(s))
            remaining -= s
            m -= 1
        else:
            share = remaining / m if share is None else share
            expect[lang] = (False, share)
    got = {
        r["lang"]: (r["capped"], r["alloc_tokens"])
        for r in mixture.unimax_allocation(docs, (3, 4), max_epochs=1).collect()
    }
    assert got == expect


# ---------------------------------------------------------------------------
# Count-Min sketch
# ---------------------------------------------------------------------------


def test_cms_upper_bound_and_differential(spark):
    rng = np.random.default_rng(7)
    keys = [f"dom{i}.example" for i in range(40)]
    weights = rng.integers(1, 30, size=40)
    data = [(k,) for k, w in zip(keys, weights) for _ in range(int(w))]
    df = spark.createDataFrame(data, "domain string")

    sk = freq.cms_sketch(df, "domain", d=4, w=64)
    probes = spark.createDataFrame([(k,) for k in keys], "domain string")
    est = {
        r["domain"]: r["cms_cnt"]
        for r in freq.cms_estimate(sk, probes, "domain", d=4, w=64).collect()
    }

    # Independent pandas sketch with the same md5-chunk hashing.
    import hashlib

    grid = {}
    for k, w in zip(keys, weights):
        h = hashlib.md5(k.encode()).hexdigest()
        for r in range(4):
            b = int(h[8 * r : 8 * r + 8], 16) % 64
            grid[(r, b)] = grid.get((r, b), 0) + int(w)
    for k, w in zip(keys, weights):
        h = hashlib.md5(k.encode()).hexdigest()
        ref = min(grid[(r, int(h[8 * r : 8 * r + 8], 16) % 64)] for r in range(4))
        assert est[k] == ref  # exact replication of the grid
        assert est[k] >= int(w)  # CMS one-sided error


def test_cms_grid_is_bounded(spark):
    df = spark.createDataFrame([(f"k{i}",) for i in range(500)], "domain string")
    sk = freq.cms_sketch(df, "domain", d=3, w=32).collect()
    assert len(sk) <= 3 * 32
    assert sum(r["cnt"] for r in sk) == 3 * 500  # mass conservation


def test_cms_d_bound(spark):
    df = spark.createDataFrame([("x",)], "domain string")
    with pytest.raises(ValueError):
        freq.cms_sketch(df, "domain", d=5)


# ---------------------------------------------------------------------------
# Bloom contamination
# ---------------------------------------------------------------------------


def test_bloom_no_false_negatives_and_fp_accounting(spark):
    bench = spark.createDataFrame(
        [(i, f"bench text {i}") for i in range(20)], "doc_id long, text string"
    )
    clean = spark.createDataFrame(
        [(100 + i, f"clean text {i}") for i in range(200)],
        "doc_id long, text string",
    )
    corpus = clean.unionAll(bench)

    # Tiny filter → false positives possible; duplicates always caught.
    row = bloom.bloom_contamination_audit(corpus, bench, k=4, m=64).collect()[0]
    assert row["n_corpus_keys"] == 220
    assert row["n_exact_dup"] == 20
    assert row["n_flagged"] == row["n_exact_dup"] + row["n_false_pos"]

    # Generous filter → zero false positives at this scale.
    row2 = bloom.bloom_contamination_audit(corpus, bench, k=4, m=1 << 20).collect()[0]
    assert row2["n_flagged"] == 20 and row2["n_false_pos"] == 0


def test_bloom_k_bound(spark):
    df = spark.createDataFrame([("x",)], "text string")
    with pytest.raises(ValueError):
        bloom.bloom_contamination_audit(df, df, k=5)


# ---------------------------------------------------------------------------
# Kneser-Ney continuations
# ---------------------------------------------------------------------------


def test_kneser_ney_hand_computed(spark):
    # corpus: "a b", "c b", "b a"  → distinct bigrams {(a,b),(c,b),(b,a)}
    # cont_left:  b←{a,c}=2, a←{b}=1, c←{}=0;  cont_right: a→1, c→1, b→1
    # unigram counts: a=2, b=3, c=1;  D = 3
    docs = _docs(spark, [(1, "a b", "x"), (2, "c b", "x"), (3, "b a", "x")])
    rows = {r["w"]: r for r in lm.kneser_ney_continuations(docs).collect()}
    assert rows["b"]["cont_left"] == 2 and rows["b"]["cont_right"] == 1
    assert rows["a"]["cont_left"] == 1 and rows["a"]["cont_right"] == 1
    assert rows["c"]["cont_left"] == 0 and rows["c"]["cont_right"] == 1
    assert rows["a"]["cnt"] == 2 and rows["b"]["cnt"] == 3 and rows["c"]["cnt"] == 1
    assert rows["b"]["p_cont"] == pytest.approx(2 / 3)
    # continuation mass sums to 1 over the vocab (KN normalization)
    assert sum(r["p_cont"] for r in rows.values()) == pytest.approx(1.0)


def test_kneser_ney_empty_and_single_token_docs(spark):
    docs = _docs(spark, [(1, "", "x"), (2, "solo", "x"), (3, "a a a", "x")])
    rows = {r["w"]: r for r in lm.kneser_ney_continuations(docs).collect()}
    # "solo" has no bigrams but still counts as a unigram row
    assert rows["solo"]["cnt"] == 1 and rows["solo"]["cont_left"] == 0
    assert rows["a"]["cont_left"] == 1  # (a, a)


# ---------------------------------------------------------------------------
# Embedding dim stats + PCA
# ---------------------------------------------------------------------------


def _emb_frame(spark, x: np.ndarray):
    pdf = pd.DataFrame(
        {
            "vec_id": np.arange(len(x), dtype=np.int64),
            "embedding": [row.astype(np.float32).tolist() for row in x],
        }
    )
    return spark.createDataFrame(pdf, "vec_id long, embedding array<float>")


def test_dim_stats_differential(spark):
    rng = np.random.default_rng(11)
    x = rng.normal(size=(50, 8)).astype(np.float32)
    got = pca.embedding_dim_stats(_emb_frame(spark, x), dim=8).collect()
    xq = np.round(x.astype(np.float64) * 1_000_000).astype(np.int64)
    assert len(got) == 8
    for r in got:
        d = r["dim"]
        assert r["n"] == 50
        assert r["sum_q"] == int(xq[:, d].sum())
        assert r["sumsq_q"] == int((xq[:, d].astype(object) ** 2).sum())
        assert r["mean_q"] == pytest.approx(xq[:, d].sum() / 50)


def test_pca_project_matches_numpy(spark):
    rng = np.random.default_rng(3)
    # anisotropic cloud → well-separated top eigenvalues
    base = rng.normal(size=(120, 6)) * np.array([5.0, 3.0, 1.0, 0.5, 0.2, 0.1])
    mix = rng.normal(size=(6, 6)) * 0.3 + np.eye(6)
    x = (base @ mix).astype(np.float32)

    got = (
        pca.pca_project(_emb_frame(spark, x), k=2, dim=6)
        .orderBy("vec_id")
        .toPandas()
    )

    xf = x.astype(np.float64)
    cov = np.cov(xf.T, ddof=1)
    vals, vecs = np.linalg.eigh(cov)
    comps = vecs[:, np.argsort(vals)[::-1][:2]]
    for c in range(2):
        lead = np.argmax(np.abs(comps[:, c]))
        if comps[lead, c] < 0:
            comps[:, c] = -comps[:, c]
    ref = (xf - xf.mean(axis=0)) @ comps

    assert np.allclose(got["pc1"].to_numpy(), np.round(ref[:, 0], 6), atol=2e-4)
    assert np.allclose(got["pc2"].to_numpy(), np.round(ref[:, 1], 6), atol=2e-4)


def test_covariance_matrix_matches_numpy(spark):
    rng = np.random.default_rng(5)
    x = rng.normal(size=(80, 4)).astype(np.float32)
    got = pca.covariance_matrix(_emb_frame(spark, x), dim=4)
    ref = np.cov(x.astype(np.float64).T, ddof=1)
    assert np.allclose(got, ref, atol=1e-9)


def test_fixed_basis_is_orthonormal_and_deterministic():
    b = np.asarray(pca.fixed_basis(4, 16))
    g = b @ b.T
    assert np.allclose(g, np.eye(4), atol=1e-12)
    assert pca.fixed_basis(4, 16) == pca.fixed_basis(4, 16)


def test_pca_fixed_project_matches_sequential_fold(spark):
    """Each pc must be the LEFT-ASSOCIATIVE fold of
    (x_i − μ_i)·b_i in index order — replayed here with a plain
    Python loop (arbitrary-precision-free but op-for-op identical),
    the contract the DuckDB oracle relies on."""
    rng = np.random.default_rng(7)
    x = rng.normal(size=(40, 8)).astype(np.float32)
    got = (
        pca.pca_fixed_project(_emb_frame(spark, x), k=2, dim=8)
        .orderBy("vec_id")
        .collect()
    )
    # centering means exactly as the operator derives them
    xq = np.round(x.astype(np.float64) * 1_000_000)
    mu = [(xq[:, d].sum() / 40) / 1_000_000 for d in range(8)]
    basis = pca.fixed_basis(2, 8)
    for r in got:
        xf = x[r.vec_id].astype(np.float64)
        for c, col in enumerate(("pc1", "pc2")):
            acc = 0.0
            for i in range(8):
                acc = acc + (float(xf[i]) - mu[i]) * basis[c][i]
            assert getattr(r, col) == round(acc, 6) or abs(
                getattr(r, col) - acc
            ) < 1e-9
