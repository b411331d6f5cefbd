"""Large-star/small-star connected components (dedup.duplicate_clusters_star).

The star-contraction variant must agree exactly with the
label-propagation variant (differential) and with hand-computed
components on constructed shapes: deep chains (O(log n) round bound is
the point), stars, cycles, and seeded random graphs."""

from __future__ import annotations

import random

import pytest

from piholelongtermstats_spark.operators.dedup import (
    duplicate_clusters,
    duplicate_clusters_star,
)


def _labels(spark, edges, fn=duplicate_clusters_star, **kw):
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    return {r["doc_id"]: r["cluster_id"] for r in fn(pairs, **kw).collect()}


def test_star_deep_chain(spark):
    """100-node path, diameter 99: star contraction must converge in
    ≤30 rounds (O(log n)) where plain min-label would need 99."""
    got = _labels(spark, [(i, i + 1) for i in range(99)])
    assert len(got) == 100
    assert set(got.values()) == {0}


def test_star_two_components(spark):
    got = _labels(spark, [(5, 3), (3, 9), (20, 22), (21, 22)])
    assert got == {3: 3, 5: 3, 9: 3, 20: 20, 21: 20, 22: 20}


def test_star_cycle_and_self_edge(spark):
    # Cycle 1-2-3-1 plus a self-edge (dropped) and a reversed dup pair.
    got = _labels(spark, [(1, 2), (2, 3), (3, 1), (4, 4), (2, 1)])
    assert got == {1: 1, 2: 1, 3: 1}


def test_star_matches_label_propagation_on_random_graphs(spark):
    rng = random.Random(7)
    for trial in range(3):
        n = 60
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(40 + 20 * trial)
        ]
        edges = [e for e in edges if e[0] != e[1]]
        a = _labels(spark, edges, fn=duplicate_clusters_star)
        b = _labels(spark, edges, fn=duplicate_clusters)
        assert a == b


def test_star_raises_on_round_cap(spark):
    pairs_edges = [(i, i + 1) for i in range(500)]
    with pytest.raises(RuntimeError, match="did not converge"):
        _labels(spark, pairs_edges, max_rounds=1)


def test_dedup_scale_2x_no_spill_no_single_partition(spark):
    """r3 VERDICT #8: the end-to-end doubled-corpus dedup run (corpus ∪
    shifted copy → LSH → star contraction → survivors) must execute
    with ZERO spill and never funnel a stage through a single
    partition — the two local signals that a plan would fall over at
    100×. Also pins the oracle identity: doubled-corpus survivors ==
    single-corpus survivor ids."""
    from pyspark.sql import functions as F

    from piholelongtermstats_spark.plans import QUERIES
    from piholelongtermstats_spark.plans.metrics import executed_plan_metrics

    sf = "/root/testdata/sf0.001"
    df = QUERIES["dedup_scale_2x"](spark, sf)
    got = sorted(r["doc_id"] for r in df.collect())

    m = executed_plan_metrics(df)
    assert m.get("spillSize", 0) == 0, m
    plan = df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "SinglePartition" not in plan, plan

    single = (
        QUERIES["dedup_survivors"](spark, sf)
        .filter(F.col("kept") == 1)
        .select("doc_id")
    )
    assert got == sorted(r["doc_id"] for r in single.collect())
