"""M29 profiling + MMR: exact counts on constructed fixtures, MMR
greedy vs a literal Python re-implementation (including a fixture
where pure-relevance order and MMR order DIFFER)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from piholelongtermstats_spark.operators import mmr, profiling
from tests.conftest import make_fact


def _fact(spark):
    rows = [
        # domain -> status holds for a.com/b.com, violated by c.com
        (0, "2024-01-01T10:00:00", "c1", "a.com", "Allowed", 0.1),
        (1, "2024-01-01T11:00:00", "c1", "a.com", "Allowed", 0.2),
        (2, "2024-01-02T10:00:00", "c2", "b.com", "Blocked", None),
        (3, "2024-01-02T11:00:00", "c2", "c.com", "Allowed", 0.3),
        (4, "2024-01-03T10:00:00", "c1", "c.com", "Allowed", 0.1),
        (5, "2024-01-03T23:30:00", "c3", "c.com", "Blocked", 0.4),
    ]
    return make_fact(spark, rows)


def test_fd_violations_exact(spark):
    out = {
        (r.lhs, r.rhs): r
        for r in profiling.fd_violation_profile(_fact(spark)).collect()
    }
    ds = out[("domain", "status_type")]
    # c.com: 2 Allowed + 1 Blocked -> 1 violation; a.com/b.com clean
    assert ds.violations == 1 and ds.holds == 0 and ds.n_rows == 6
    assert ds.n_groups == 3
    assert ds.violation_ppm == 1000000 // 6
    cp = out[("client", "day_period")]
    # c1: 3 Day; c2: 2 Day; c3: 1 Night -> holds
    assert cp.violations == 0 and cp.holds == 1


def test_fd_grouping_sets_path_matches_union_fallback(spark):
    """The r12 single-scan GROUPING SETS path must produce the exact
    rows of the per-candidate union it replaced — differential over a
    custom candidate list exercising shared lhs AND rhs columns (the
    gid bit-order mapping is what this pins: a wrong grouping_id()
    formula would mislabel candidates, not just reorder them)."""
    fact = _fact(spark)
    cands = [
        ("domain", "status_type"),
        ("status_type", "domain"),  # same column SET reversed -> collides
        ("client", "domain"),
    ]
    # colliding sets must take the union fallback and still be exact
    got = {
        (r.lhs, r.rhs): (r.n_groups, r.n_rows, r.violations, r.holds)
        for r in profiling.fd_violation_profile(fact, cands).collect()
    }
    want = {
        (r.lhs, r.rhs): (r.n_groups, r.n_rows, r.violations, r.holds)
        for r in profiling._fd_violation_union(fact, cands).collect()
    }
    assert got == want and set(got) == set(map(tuple, cands))
    # non-colliding list goes through grouping sets; same differential
    cands2 = [("domain", "status_type"), ("client", "domain"),
              ("status_type", "client")]
    got2 = {
        (r.lhs, r.rhs): (r.n_groups, r.n_rows, r.violations, r.holds)
        for r in profiling.fd_violation_profile(fact, cands2).collect()
    }
    want2 = {
        (r.lhs, r.rhs): (r.n_groups, r.n_rows, r.violations, r.holds)
        for r in profiling._fd_violation_union(fact, cands2).collect()
    }
    assert got2 == want2 and len(got2) == 3


def test_fd_grouping_sets_single_scan_plan(spark):
    """The default-candidate plan must hold exactly ONE source leaf —
    the optimization's contract (4 fact scans -> 1)."""
    plan = profiling.fd_violation_profile(
        _fact(spark)
    )._jdf.queryExecution().sparkPlan().toString()
    assert plan.count("Scan ExistingRDD") + plan.count("Scan parquet") == 1
    assert "Expand" in plan  # the grouping-sets pass


def test_column_profile_exact(spark):
    out = {
        r.column_name: r
        for r in profiling.column_profile(_fact(spark)).collect()
    }
    assert set(out) == set(profiling.PROFILE_COLS)
    d = out["domain"]
    assert d.n_rows == 6 and d.n_null == 0 and d.n_distinct == 3
    assert d.min_value == "a.com" and d.max_value == "c.com"
    c = out["client"]
    assert c.n_distinct == 3 and c.min_value == "c1" and c.max_value == "c3"


def test_column_profile_counts_nulls(spark):
    fact = _fact(spark).withColumn(
        "domain", F.when(F.col("event_id") < 2, None).otherwise(F.col("domain"))
    )
    d = {
        r.column_name: r for r in profiling.column_profile(fact).collect()
    }["domain"]
    assert d.n_null == 2 and d.n_distinct == 2 and d.min_value == "b.com"


def test_vocab_growth_curve(spark):
    rows = {
        r.date.day: r
        for r in profiling.vocab_growth_curve(_fact(spark)).collect()
    }
    assert [
        (rows[d].new_domains, rows[d].cum_domains) for d in (1, 2, 3)
    ] == [(1, 1), (2, 3), (0, 3)]


def _emb_df(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v], 0) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>, label int",
    )


def _py_mmr(vecs, qid=0, n_cand=16, k=5, lam=0.5):
    """Literal greedy reference with the same rounded-cosine policy."""

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return round(
            d / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b))),
            6,
        )

    q = vecs[qid]
    cands = sorted(
        (
            (i, cos(v, q))
            for i, v in enumerate(vecs)
            if i != qid
        ),
        key=lambda t: (-t[1], t[0]),
    )[:n_cand]
    sel = [cands[0]]
    while len(sel) < min(k, len(cands)):
        best = None
        for i, rel in cands:
            if any(i == j for j, _ in sel):
                continue
            ms = max(cos(vecs[i], vecs[j]) for j, _ in sel)
            sc = lam * rel - (1.0 - lam) * ms
            if best is None or sc > best[0] or (sc == best[0] and i < best[1]):
                best = (sc, i, rel)
        sel.append((best[1], best[2]))
    return [(r + 1, i, rel) for r, (i, rel) in enumerate(sel)]


def test_mmr_diversifies_vs_pure_relevance(spark):
    """Two tight clusters near the query: pure relevance would take
    the whole near cluster; MMR alternates clusters. Differential vs
    the literal greedy."""
    q = [1.0, 0.0, 0.0, 0.0]
    near = [[0.99, 0.14, 0.0, 0.0], [0.98, 0.15, 0.02, 0.0], [0.985, 0.145, 0.01, 0.0]]
    far = [[0.8, -0.6, 0.0, 0.0], [0.79, -0.61, 0.02, 0.0]]
    vecs = [q] + near + far
    got = [
        (r.pick_rank, r.vec_id, r.rel)
        for r in mmr.mmr_rerank(
            _emb_df(spark, vecs), 0, n_cand=5, k=4, lam=0.5
        ).orderBy("pick_rank").collect()
    ]
    want = _py_mmr(vecs, 0, n_cand=5, k=4, lam=0.5)
    assert got == [(r, i, pytest.approx(rel)) for r, i, rel in want]
    # diversity: the second pick is from the far cluster even though
    # all near-cluster rels are higher
    rel_order = sorted(got, key=lambda t: -t[2])
    assert got[1][1] in (4, 5) and rel_order[1][1] not in (4, 5)


def test_mmr_matches_python_on_spread_vectors(spark):
    vecs = [
        [math.cos(0.37 * i + 0.1 * j) for j in range(8)] for i in range(12)
    ]
    got = [
        (r.pick_rank, r.vec_id, r.rel)
        for r in mmr.mmr_rerank(_emb_df(spark, vecs), 0, 8, 5, 0.5)
        .orderBy("pick_rank")
        .collect()
    ]
    want = _py_mmr(vecs, 0, 8, 5, 0.5)
    assert [(r, i) for r, i, _ in got] == [(r, i) for r, i, _ in want]


def test_mmr_k_exceeds_candidates(spark):
    """k larger than the candidate pool: every candidate is picked
    once, no duplicates, no crash."""
    vecs = [[1.0, 0.0], [0.9, 0.1], [0.5, 0.5]]
    got = mmr.mmr_rerank(_emb_df(spark, vecs), 0, n_cand=2, k=5).collect()
    assert sorted(r.vec_id for r in got) == [1, 2]
    assert sorted(r.pick_rank for r in got) == [1, 2]
