"""M24: priority sampling against a hashlib differential, triangle
census against a brute-force python graph."""

from __future__ import annotations

import hashlib
from itertools import combinations

from piholelongtermstats_spark.operators import corpus, graph
from tests.conftest import make_fact


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def _pri(doc_id: int, n_chars: int) -> int:
    h = int(hashlib.md5(f"{doc_id}:ws".encode()).hexdigest()[:8], 16)
    return h * 10**9 // max(n_chars, 1)


def test_weighted_sample_matches_hashlib(spark):
    rows = [(i, f"t{i}", "en", "s", 10 + 37 * (i % 13)) for i in range(40)]
    got = corpus.weighted_sample_wor(_docs(spark, rows), k=10).collect()
    want = sorted(
        ((_pri(i, w), i, w) for i, _, _, _, w in rows)
    )[:10]
    assert [(r.priority, r.doc_id, r.weight) for r in got] == [
        (p, i, w) for p, i, w in want
    ]


def test_weighted_sample_zero_weight_guard(spark):
    """n_chars = 0 clamps to weight 1 instead of dividing by zero."""
    rows = [(1, "t", "en", "s", 0), (2, "t", "en", "s", 100)]
    got = corpus.weighted_sample_wor(_docs(spark, rows), k=2).collect()
    assert {r.doc_id: r.weight for r in got} == {1: 1, 2: 100}


def test_weighted_sample_k_larger_than_frame(spark):
    rows = [(i, "t", "en", "s", 50) for i in range(3)]
    got = corpus.weighted_sample_wor(_docs(spark, rows), k=99).collect()
    assert len(got) == 3
    assert [r.priority for r in got] == sorted(r.priority for r in got)


def _tri_reference(baskets, decile=10):
    """Brute-force census: baskets is a list of domain lists (one per
    (client, day)); returns (n_pairs, thr, n_edges, wedges2, n_tri)."""
    from collections import Counter

    co = Counter()
    for b in baskets:
        for d1, d2 in combinations(sorted(set(b)), 2):
            co[(d1, d2)] += 1
    n_pairs = len(co)
    hist = Counter(co.values())
    cum, thr = 0, None
    for v in sorted(hist, reverse=True):
        cum += hist[v]
        if cum * decile <= n_pairs:
            thr = v
    thr = thr if thr is not None else max(hist)
    edges = {p for p, c in co.items() if c >= thr}
    deg = Counter()
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    wedges2 = sum(d * (d - 1) for d in deg.values())
    nodes = sorted(deg)
    tri = sum(
        1
        for a, b, c in combinations(nodes, 3)
        if (a, b) in edges and (b, c) in edges and (a, c) in edges
    )
    return n_pairs, thr, len(edges), wedges2, tri


def test_triangle_census_matches_bruteforce(spark):
    # 12 baskets engineered so the top-decile cut keeps exactly the
    # heavily repeated clique {A,B,C} plus a pendant edge (C,D).
    baskets = (
        [["A", "B", "C"]] * 5
        + [["C", "D"]] * 4
        + [["A", "D"], ["B", "D"], ["A", "E"], ["B", "E"], ["D", "E"]]
    )
    rows = []
    eid = 0
    for i, b in enumerate(baskets):
        client, day = f"c{i % 4}", i // 4 + 1
        for dom in b:
            eid += 1
            rows.append(
                (eid, f"2024-01-{day:02d}T10:00:00", client, dom,
                 "Allowed", 0.1)
            )
    # Rebuild the true basket set as (client, day) pairs — two list
    # entries can collide on the same (client, day) key.
    from collections import defaultdict

    merged = defaultdict(set)
    for i, b in enumerate(baskets):
        merged[(i % 4, i // 4)] |= set(b)
    want = _tri_reference(list(merged.values()))
    r = graph.domain_cograph_triangles(make_fact(spark, rows)).collect()[0]
    assert (r.n_pairs, r.co_thr, r.n_edges, r.wedges2, r.n_triangles) == want


def test_triangle_census_empty_edgecases(spark):
    """A single-domain fact has no pairs: all counts 0/NULL-safe."""
    rows = [(1, "2024-01-01T10:00:00", "c1", "only", "Allowed", 0.1)]
    r = graph.domain_cograph_triangles(make_fact(spark, rows)).collect()[0]
    assert (r.n_pairs is None or r.n_pairs == 0) or r.n_edges == 0
    assert r.n_triangles == 0
