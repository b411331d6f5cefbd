"""M7 operator tests: dedup, text analysis, similarity, multimodal."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from piholelongtermstats_spark.operators import dedup, multimodal, similarity, text


def _docs(spark, texts, langs=None):
    rows = [
        (i, t, (langs or ["en"] * len(texts))[i], f"src{i}", len(t))
        for i, t in enumerate(texts)
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


BASE = "the quick brown fox jumps over the lazy dog near the old river bank today"
NEAR = "the quick brown fox jumps over the lazy dog near the old river bank now"
FAR = "completely different words appear here with nothing shared at all whatsoever"


def test_exact_dedup_counts(spark):
    docs = _docs(spark, [BASE, BASE, FAR])
    row = dedup.exact_dedup_counts(docs).collect()[0]
    assert row["n_rows"] == 3
    assert row["n_distinct_texts"] == 2
    assert row["n_duplicate_rows"] == 1


def test_ngram_jaccard_finds_near_dup(spark):
    docs = _docs(spark, [BASE, NEAR, FAR])
    pairs = dedup.ngram_jaccard_pairs(docs, 0.5).collect()
    assert [(p["doc_a"], p["doc_b"]) for p in pairs] == [(0, 1)]
    # 15-token docs: 13 shingles each, differing only in the last token
    # → 12 shared, union 14 → jaccard 12/14
    assert pairs[0]["jaccard"] == pytest.approx(12 / 14, abs=1e-6)


def test_ngram_jaccard_capped_exact_on_stop_heavy_corpus(spark):
    """The pathological case for df_cap: near-dup pairs whose ENTIRE
    intersection is stop shingles (boilerplate docs, every shingle's
    document frequency above the cap). The stop-heavy guard path must
    recover them, making the capped variant provably identical to the
    uncapped oracle on ANY corpus — the property the registry's
    exact-Jaccard oracle gate relies on."""
    boiler = "terms of service apply to all users of this site always"
    boiler_near = "terms of service apply to all users of this site today"
    texts = [boiler] * 6 + [boiler_near] * 3 + [FAR]
    docs = _docs(spark, texts)
    # df of every boiler shingle ≥ 6 > df_cap=4 → zero rare candidates
    exact = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(docs, 0.5).collect()
    }
    capped = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(docs, 0.5, df_cap=4).collect()
    }
    assert exact and capped == exact


def test_lsh_recovers_jaccard_pairs(spark):
    docs = _docs(spark, [BASE, NEAR, FAR, "x y z w v u t s r q p o n m"])
    cand = {(r["doc_a"], r["doc_b"]) for r in dedup.lsh_candidate_pairs(docs).collect()}
    assert (0, 1) in cand
    assert (0, 2) not in cand and (1, 2) not in cand


def test_simhash_properties(spark):
    docs = _docs(spark, [BASE, BASE, FAR])
    sh = {r["doc_id"]: r["simhash"] for r in dedup.simhash(docs).collect()}
    assert sh[0] == sh[1]  # identical text → identical sketch
    assert sh[0] != sh[2]
    assert 0 <= sh[0] < 2**60


def test_text_stats_known_values(spark):
    docs = _docs(spark, ["the cat sat"])
    row = text.text_stats(docs).collect()[0]
    assert row["n_tokens"] == 3
    assert row["n_chars"] == 11
    assert row["avg_token_len"] == pytest.approx(9 / 3)
    assert row["stopword_ratio"] == pytest.approx(1 / 3)
    # 0.4*min(1,3/100) + 0.3*(2/3) + 0.3*min(1,3/8)
    want = 0.4 * 0.03 + 0.3 * (2 / 3) + 0.3 * (3 / 8)
    assert row["quality_score"] == pytest.approx(want, abs=1e-9)


def test_lang_id_markers(spark):
    docs = _docs(
        spark,
        [
            "the cat and the dog is happy in that house",
            "der hund und die katze ist nicht hier",
            "el perro y la casa de los gatos",
            "qwzx vbnm zzzz",
        ],
        langs=["en", "de", "es", "zh"],
    )
    got = {r["doc_id"]: r["pred_lang"] for r in text.lang_id(docs).collect()}
    assert got[0] == "en"
    assert got[1] == "de"
    assert got[2] == "es"
    assert got[3] == "und"


def test_fingerprint_order_sensitive(spark):
    docs = _docs(spark, ["a b c", "a b c", "c b a"])
    fp = {r["doc_id"]: r["fingerprint"] for r in text.fingerprint(docs).collect()}
    assert fp[0] == fp[1]
    assert fp[0] != fp[2]
    assert 0 <= fp[0] < 1_000_000_007


def _emb(spark, vecs):
    rows = [(i, [float(x) for x in v], i % 3) for i, v in enumerate(vecs)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")


def test_cosine_topk_exact(spark):
    vecs = [
        [1.0, 0.0, 0.0, 0.0],
        [0.9, 0.1, 0.0, 0.0],   # closest to query
        [0.0, 1.0, 0.0, 0.0],   # orthogonal
        [-1.0, 0.0, 0.0, 0.0],  # opposite
    ]
    top = similarity.cosine_topk(_emb(spark, vecs), 0, 3).collect()
    assert [r["vec_id"] for r in top] == [1, 2, 3]
    assert top[0]["cosine"] == pytest.approx(0.9 / math.sqrt(0.82), abs=1e-6)
    assert top[1]["cosine"] == pytest.approx(0.0)
    assert top[2]["cosine"] == pytest.approx(-1.0)


def test_lsh_ann_recall_on_testdata(spark):
    """ANN vs exact top-10 on the driver's sf0.001 embeddings: the
    query's bucket must contain candidates, all scores must agree with
    the exact path, and recall is reported (bucketing trades it off)."""
    import os

    path = "/root/testdata/sf0.001/embeddings.parquet"
    if not os.path.exists(path):
        pytest.skip("driver testdata not present")
    emb = spark.read.parquet(path)
    exact = {r["vec_id"] for r in similarity.cosine_topk(emb, 0, 10).collect()}
    ann_rows = similarity.lsh_ann_topk(emb, 0, 10).collect()
    assert len(ann_rows) > 0
    exact_scores = {
        r["vec_id"]: r["cosine"]
        for r in similarity.cosine_scores(emb, 0).collect()
    }
    for r in ann_rows:
        assert r["cosine"] == exact_scores[r["vec_id"]]
    recall = len({r["vec_id"] for r in ann_rows} & exact) / 10
    assert recall >= 0.1  # single-bucket, no multi-probe: weak but non-zero


def test_media_pipeline_fake_decode(spark):
    docs = _docs(spark, [BASE, FAR])
    media = multimodal.docs_as_media(docs)
    feats = multimodal.extract_features(media, fake=True).collect()
    assert len(feats) == 2
    by_id = {r["media_id"]: r for r in feats}
    assert by_id[0]["n_bytes"] == len(BASE.encode())
    assert len(by_id[0]["feature"]) == 8
    # deterministic: same payload → same features
    feats2 = multimodal.extract_features(media, fake=True).collect()
    assert {r["media_id"]: r["feature"] for r in feats2} == {
        r["media_id"]: r["feature"] for r in feats
    }


def test_media_real_decode_raises(spark):
    docs = _docs(spark, [BASE])
    media = multimodal.docs_as_media(docs)
    with pytest.raises(Exception, match="NotImplementedError|media decode"):
        multimodal.extract_features(media, fake=False).collect()


def test_resize_metadata_arithmetic(spark):
    """Resize stub: aspect-preserving downscale computed per batch;
    payloads pass through untouched."""
    from piholelongtermstats_spark.operators import multimodal as mm

    media = spark.createDataFrame(
        [
            (1, b"x" * 10, "image/png", 1024, 512),
            (2, b"y" * 10, "image/png", 100, 200),   # under max: no upscale
            (3, b"z" * 10, "image/png", None, None),  # missing dims
        ],
        mm.MEDIA_SCHEMA,
    )
    got = {r["media_id"]: (r["width"], r["height"])
           for r in mm.resize_images(media, max_side=256).collect()}
    assert got[1] == (256, 128)
    assert got[2] == (100, 200)
    assert got[3] == (256, 256)


def test_frame_sampling_fanout(spark):
    """Frame sampler fans each media row out to duration/every rows
    with monotone frame timestamps."""
    from piholelongtermstats_spark.operators import multimodal as mm

    media = spark.createDataFrame(
        [(1, b"0123456789abcdef" * 8, "video/mp4", None, None)], mm.MEDIA_SCHEMA
    )
    frames = mm.sample_frames(media, every_ms=1000, duration_ms=5000).collect()
    assert len(frames) == 5
    assert [f["frame_ts_ms"] for f in sorted(frames, key=lambda f: f["frame_idx"])] \
        == [0, 1000, 2000, 3000, 4000]


def test_ivf_ann_recall(spark):
    """IVF with nprobe=4/16 cells recovers most of the exact top-10;
    full probe (nprobe=n_cells) is EXACTLY the brute-force answer."""
    from piholelongtermstats_spark.operators import ivf, similarity
    from piholelongtermstats_spark.session import ensure_session_defaults
    from piholelongtermstats_spark.sources.parquet import load_table

    ensure_session_defaults(spark)
    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    exact = [r["vec_id"] for r in similarity.cosine_topk(emb, 0, 10).collect()]

    cents = ivf.train_centroids(emb)
    approx = [
        r["vec_id"]
        for r in ivf.ivf_ann_topk(emb, 0, 10, centroids=cents).collect()
    ]
    recall = len(set(exact) & set(approx)) / 10
    assert recall >= 0.5, (recall, exact, approx)

    full = [
        r["vec_id"]
        for r in ivf.ivf_ann_topk(
            emb, 0, 10, nprobe=ivf.N_CELLS, centroids=cents
        ).collect()
    ]
    assert full == exact


def test_ivf_deterministic(spark):
    """Two independent trainings produce identical centroids (no RNG)."""
    from piholelongtermstats_spark.operators import ivf
    from piholelongtermstats_spark.session import ensure_session_defaults
    from piholelongtermstats_spark.sources.parquet import load_table

    ensure_session_defaults(spark)
    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    c1 = ivf.train_centroids(emb, n_iters=2)
    c2 = ivf.train_centroids(emb, n_iters=2)
    assert c1 == c2


def test_duplicate_clusters_transitive(spark):
    """a~b, b~c chain into one cluster; d~e separate; labels = min id."""
    from piholelongtermstats_spark.operators import dedup

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 9), (3, 5), (10, 11), (11, 10)],
        "doc_a long, doc_b long",
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup.duplicate_clusters(pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 5: 1, 7: 7, 9: 7, 10: 10, 11: 10}


def test_multiprobe_improves_or_matches_recall(spark):
    """Probing hamming-1 buckets can only add candidates: recall vs
    exact top-10 is monotone in the probe count, and with all planes
    probed the candidate set strictly contains the single-bucket one."""
    from piholelongtermstats_spark.operators import similarity
    from piholelongtermstats_spark.session import ensure_session_defaults
    from piholelongtermstats_spark.sources.parquet import load_table

    ensure_session_defaults(spark)
    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    exact = [r["vec_id"] for r in similarity.cosine_topk(emb, 0, 10).collect()]

    def recall(m):
        got = [
            r["vec_id"]
            for r in similarity.lsh_ann_topk(emb, 0, 10, multiprobe=m).collect()
        ]
        return len(set(exact) & set(got)) / 10

    r0, r4 = recall(0), recall(4)
    assert r4 >= r0
    assert r4 >= 0.5, (r0, r4)


def test_quality_classifier_known_values(spark):
    import hashlib

    docs = _docs(spark, ["the cat sat"])
    row = text.quality_classifier(docs).collect()[0]

    def w(tok: str) -> int:
        return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % 2001 - 1000

    want = w("the") + w("cat") + w("sat")
    assert row["n_tokens"] == 3
    assert row["weight_sum"] == want
    assert row["score"] == want / 3000.0
    assert row["keep"] == (want >= 0)


def test_quality_classifier_splits_corpus(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = text.quality_classifier(docs)
    n = out.count()
    kept = out.filter("keep").count()
    # pseudo-random weights → keep rate near 1/2, never degenerate
    assert 0 < kept < n


def test_quality_classifier_plan_no_shuffle(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = (
        text.quality_classifier(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan


def test_vocab_topk_known_values(spark):
    docs = _docs(spark, ["the cat sat", "the cat", "dog"])
    rows = text.vocab_topk(docs, k=3).collect()
    assert [(r["token"], r["tf"], r["df"]) for r in rows] == [
        ("cat", 2, 2),
        ("the", 2, 2),
        ("dog", 1, 1),
    ]


def test_vocab_topk_plan_partial_agg_and_topk(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = (
        text.vocab_topk(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # one shuffle on token (plus the countDistinct expand stage runs
    # inside the same aggregation); final top-k never global-sorts
    assert "TakeOrderedAndProject" in plan, plan


def test_near_dup_backends_agree(spark):
    # grouped-matmul pair values == pure-Column pair values after the
    # shared Spark-side rounding (the midpoint-margin fp test
    # guarantees this CAN hold; this pins that it DOES)
    from pyspark.sql import functions as F

    from piholelongtermstats_spark.operators import similarity as sim

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    dimc = sim._dim(emb)
    v = F.col("embedding").cast("array<double>")
    b = emb.select(
        "vec_id", v.alias("v"), sim.lsh_bucket(v, dimc, sim.N_PLANES).alias("bucket")
    )
    vec = {tuple(r) for r in sim._bucket_pairs_vec(b, 0.4).collect()}
    expr = {tuple(r) for r in sim._bucket_pairs_expr(b, 0.4).collect()}
    assert vec == expr and len(vec) > 0


def test_simhash_near_dup_pigeonhole_and_values(spark):
    # identical texts → hamming 0 pair; pigeonhole: any planted pair
    # at distance < bands must surface
    docs = _docs(spark, [BASE, BASE, FAR])
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in dedup.simhash_near_dup(docs).collect()
    }
    assert pairs.get((0, 1)) == 0
    assert (0, 2) not in pairs and (1, 2) not in pairs
    # brute-force differential on the real corpus: banded candidates
    # with hamming <= 4 (= bands-1) EXACTLY equal the all-pairs set
    real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    sk = {r["doc_id"]: r["simhash"] for r in dedup.simhash(real).collect()}
    ids = sorted(sk)
    want = {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin(sk[a] ^ sk[b]).count("1") <= 4
    }
    got = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.simhash_near_dup(real, max_hamming=4).collect()
    }
    assert got == want and len(want) > 0


def test_minhash_estimate_identity_and_bounds(spark):
    # identical documents estimate J=1 exactly; all estimates bounded
    docs = _docs(spark, [BASE, BASE, FAR])
    est = {
        (r["doc_a"], r["doc_b"]): (r["matches"], r["est_jaccard"])
        for r in dedup.minhash_jaccard_estimates(docs).collect()
    }
    assert est[(0, 1)] == (dedup.NUM_PERMS, 1.0)
    for m, e in est.values():
        assert 0 <= m <= dedup.NUM_PERMS and 0.0 <= e <= 1.0


def test_minhash_estimate_tracks_exact_jaccard(spark):
    # estimator sanity on the real corpus: mean |est - exact| over the
    # candidate pairs is within the sketch's own error band
    # (std ≈ sqrt(J(1-J)/16) ≤ 0.125)
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    est = dedup.minhash_jaccard_estimates(docs)
    sh = dedup.shingles(docs)
    from pyspark.sql import functions as F

    sizes = sh.groupBy("doc_id").count()
    inter = (
        est.select("doc_a", "doc_b", "est_jaccard")
        .join(sh.select(F.col("doc_id").alias("doc_a"), "shingle"), "doc_a")
        .join(sh.select(F.col("doc_id").alias("doc_b"), "shingle"), ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b", "est_jaccard")
        .agg(F.count("*").alias("inter"))
    )
    rows = (
        inter.join(sizes.select(F.col("doc_id").alias("doc_a"), F.col("count").alias("na")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"), F.col("count").alias("nb")), "doc_b")
        .select(
            "est_jaccard",
            (F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))).alias("exact"),
        )
        .collect()
    )
    assert rows
    mean_err = sum(abs(r["est_jaccard"] - r["exact"]) for r in rows) / len(rows)
    assert mean_err <= 0.25, mean_err
