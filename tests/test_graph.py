"""PageRank (operators/graph.py): numpy differential, mass
conservation, and determinism under repartitioning."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from piholelongtermstats_spark.operators import graph
from piholelongtermstats_spark.sources.events import dns_fact

SF = "/root/testdata/sf0.001"


def _numpy_pagerank(edges, n_iter=graph.N_ITER, d=graph.DAMPING):
    nodes = sorted({s for s, _ in edges} | {t for _, t in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    outdeg = np.zeros(n)
    for s, _ in edges:
        outdeg[idx[s]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(n_iter):
        nxt = np.full(n, (1 - d) / n)
        contrib = r / outdeg
        for s, t in edges:
            nxt[idx[t]] += d * contrib[idx[s]]
        r = nxt
    return {v: r[idx[v]] for v in nodes}


def test_pagerank_matches_numpy_reference(spark):
    fact = dns_fact(spark, SF)
    edges = [
        (r.src, r.dst) for r in graph.bipartite_edges(fact).collect()
    ]
    want = _numpy_pagerank(edges)
    got = {r.node: r.rank for r in graph.pagerank(fact, top=None).collect()}
    assert set(got) == set(want)
    # Spark serves round(rank, 8): agreement bound = half-ulp of the
    # 8th digit (5e-9) + fp accumulation slack
    for v, rv in got.items():
        assert abs(rv - want[v]) < 6e-9, (v, rv, want[v])
    # mass conservation: ranks sum to 1 (symmetric bipartite graph
    # has no sinks by construction)
    assert abs(sum(got.values()) - 1.0) < 1e-6


def test_pagerank_deterministic_under_repartition(spark):
    fact = dns_fact(spark, SF)
    a = [(r.node, r.rank) for r in graph.pagerank(fact).collect()]
    b = [
        (r.node, r.rank)
        for r in graph.pagerank(fact.repartition(17)).collect()
    ]
    # rounded serving edge + pinned tie-break: identical top-20
    assert a == b and len(a) == 20


def test_pagerank_empty_graph(spark):
    empty = spark.createDataFrame([], "client string, domain string")
    assert graph.pagerank(empty).count() == 0


def test_bipartite_edges_symmetric(spark):
    fact = spark.createDataFrame(
        [("c1", "d1"), ("c1", "d1"), ("c2", "d1")], "client string, domain string"
    )
    e = {(r.src, r.dst) for r in graph.bipartite_edges(fact).collect()}
    assert e == {
        ("c:c1", "d:d1"), ("c:c2", "d:d1"),
        ("d:d1", "c:c1"), ("d:d1", "c:c2"),
    }


def _python_pagerank_fixedpoint(edges, n_iter=graph.N_ITER):
    """Exact integer replay of pagerank_fixedpoint: ppt ranks, DIV
    per edge, 17/20 damping — arbitrary-precision Python ints, so any
    divergence from Spark is a real arithmetic mismatch."""
    nodes = sorted({s for s, _ in edges} | {t for _, t in edges})
    n = len(nodes)
    outdeg = {v: 0 for v in nodes}
    for s, _ in edges:
        outdeg[s] += 1
    r = {v: graph.PPT_SCALE // n for v in nodes}
    base = (3 * graph.PPT_SCALE) // (20 * n)
    for _ in range(n_iter):
        mass = {v: 0 for v in nodes}
        for s, t in edges:
            mass[t] += r[s] // outdeg[s]
        r = {v: base + (17 * mass[v]) // 20 for v in nodes}
    return r


def test_pagerank_fixedpoint_exact_integer_replay(spark):
    fact = dns_fact(spark, SF)
    edges = [
        (r.src, r.dst) for r in graph.bipartite_edges(fact).collect()
    ]
    want = _python_pagerank_fixedpoint(edges)
    got = {
        r.node: r.rank_ppt
        for r in graph.pagerank_fixedpoint(fact, top=None).collect()
    }
    assert got == {v: want[v] for v in got}
    assert set(got) == set(want)


def test_pagerank_fixedpoint_agrees_with_float_ranking(spark):
    """The ppt quantization floors at most ~n_iter*maxdeg ppt per
    node — the served top-20 node ORDER must match the float
    variant's (the float serving edge rounds to 8 digits with the
    same (rank DESC, node ASC) tie-break)."""
    fact = dns_fact(spark, SF)
    fixed = [r.node for r in graph.pagerank_fixedpoint(fact).collect()]
    flt = [r.node for r in graph.pagerank(fact).collect()]
    assert fixed == flt


def test_pagerank_fixedpoint_deterministic_under_repartition(spark):
    fact = dns_fact(spark, SF)
    a = [
        (r.node, r.rank_ppt)
        for r in graph.pagerank_fixedpoint(fact).collect()
    ]
    b = [
        (r.node, r.rank_ppt)
        for r in graph.pagerank_fixedpoint(fact.repartition(17)).collect()
    ]
    assert a == b and len(a) == 20
