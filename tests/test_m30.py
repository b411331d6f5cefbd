"""M30: ANN-eval metrics on constructed index geometries (perfect
recall, forced miss) and the robust doubling invariance."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from piholelongtermstats_spark.operators import knn, robust
from tests.conftest import make_fact


def _emb_df(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v], 0) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>, label int",
    )


def _ring(i, n=12, d=4):
    a = 2 * math.pi * i / n
    return [math.cos(a), math.sin(a)] + [0.1] * (d - 2)


def test_ann_eval_perfect_recall_with_all_probes(spark):
    """nprobe = #centroids ⇒ the approx leg IS the exact leg:
    recall 100%, nn_rank 1, rr 1.0 for every query."""
    vecs = [_ring(i) for i in range(12)]
    cents = [[1.0, 0.0, 0.1, 0.1], [-1.0, 0.0, 0.1, 0.1]]
    out = knn.ann_eval_metrics(
        _emb_df(spark, vecs), centroids=cents, n_queries=2, k=3, nprobe=2
    ).collect()
    assert len(out) == 2
    for r in out:
        assert r.hits == 3 and r.recall_ppm == 1000000
        assert r.nn_rank == 1 and r.rr == 1.0


def test_ann_eval_detects_misses_single_probe(spark):
    """One probe over two well-separated clusters: a query whose
    true top-k straddles clusters must show hits < k, and a missed
    true-NN yields nn_rank NULL / rr NULL."""
    # queries: vec 0 points at cluster A, vec 1 between clusters
    a = [[1.0, 0.05 * i, 0.0, 0.0] for i in range(4)]
    b = [[-1.0, 0.05 * i, 0.0, 0.0] for i in range(4)]
    vecs = [[1.0, 0.0, 0.0, 0.0], [-1.0, 0.01, 0.0, 0.0]] + a + b
    cents = [[1.0, 0.0, 0.0, 0.0], [-1.0, 0.0, 0.0, 0.0]]
    rows = {
        r.query_id: r
        for r in knn.ann_eval_metrics(
            _emb_df(spark, vecs), centroids=cents, n_queries=2, k=6, nprobe=1
        ).collect()
    }
    # each query sees only its own 4-vector cluster (+ the other query
    # vector if co-assigned): hits strictly < k for both
    assert all(r.hits < 6 for r in rows.values())
    assert all(r.recall_ppm == r.hits * 1000000 // 6 for r in rows.values())
    # query 0's true NN is in its probe cell -> found at rank 1
    assert rows[0].nn_rank == 1 and rows[0].rr == 1.0


def test_robust_scale_2x_halves_identical(spark):
    """Each (day, day+64) pair in the doubled fact carries identical
    y/med2/mad4/flag/z — the multiset-invariance doubling proof."""
    rows = [
        (i, f"2024-01-{(i % 5) + 1:02d}T10:00:00", "c1", "d", "Allowed", None)
        for i in range(25)
    ] + [
        (100 + i, "2024-01-05T12:00:00", "c2", "d", "Blocked", None)
        for i in range(40)
    ]
    fact = make_fact(spark, rows)
    shifted = fact.select(
        (F.col("ts") + F.expr("INTERVAL 64 DAYS")).alias("ts"),
        (F.col("event_id") + F.lit(1 << 40)).alias("event_id"),
        "client", "domain", "status_type", "reply_time",
    )
    from piholelongtermstats_spark.functions.derive import enrich_time

    dbl = enrich_time(
        fact.select("ts", "event_id", "client", "domain", "status_type", "reply_time")
        .unionByName(shifted),
        "ts",
    )
    got = {r.date: r for r in robust.mad_outlier_days(dbl).collect()}
    assert len(got) == 10
    for d, r in got.items():
        twin_key = [k for k in got if abs((k - d).days) == 64]
        assert len(twin_key) == 1
        t = got[twin_key[0]]
        assert (r.y, r.med2, r.mad4, r.is_outlier, r.robust_z) == (
            t.y, t.med2, t.mad4, t.is_outlier, t.robust_z
        )
    spike = [r for r in got.values() if r.y == 45]
    assert len(spike) == 2 and all(r.is_outlier == 1 for r in spike)
