"""M31: per-client MAD on constructed keys (odd/even day counts per
key), assortativity vs a literal numpy Pearson, rank metrics vs the
textbook definitions."""

from __future__ import annotations

import numpy as np
import pytest

from piholelongtermstats_spark.operators import graph, ranks, robust
from tests.conftest import make_fact


def _fact_client_days(spark, spec: dict[str, dict[str, int]]):
    rows, i = [], 0
    for client, days in spec.items():
        for d, n in days.items():
            for _ in range(n):
                rows.append((i, f"{d}T12:00:00", client, "dom", "Allowed", None))
                i += 1
    return make_fact(spark, rows)


def test_client_mad_independent_keys(spark):
    """c1 (5 days, odd) has one spike; c2 (4 days, even) is clean —
    each client's med2/mad4 computed only from its own days."""
    fact = _fact_client_days(
        spark,
        {
            "c1": {f"2024-01-0{i}": 10 for i in range(1, 5)}
            | {"2024-01-05": 99},
            "c2": {
                "2024-01-01": 4,
                "2024-01-02": 5,
                "2024-01-03": 7,
                "2024-01-04": 8,
            },
        },
    )
    rows = {
        (r.client, r.date.day): r
        for r in robust.client_mad_outliers(fact).collect()
    }
    assert rows[("c1", 5)].med2 == 20 and rows[("c1", 5)].mad4 == 0
    assert rows[("c1", 5)].is_outlier == 1
    assert all(rows[("c1", d)].is_outlier == 0 for d in range(1, 5))
    # c2: sorted 4,5,7,8 -> med2 = 12; u = |2y-12| = 4,2,2,4 sorted
    # 2,2,4,4 -> mad4 = 6; gate 4u > 42 -> none
    c2 = rows[("c2", 1)]
    assert c2.med2 == 12 and c2.mad4 == 6
    assert all(rows[("c2", d)].is_outlier == 0 for d in range(1, 5))
    assert rows[("c2", 1)].robust_z == pytest.approx(
        round((2.0 * -4) / (1.4826 * 6), 6)
    )


def test_assortativity_matches_numpy(spark):
    """Star (hub client) + chain: compare against numpy corrcoef over
    the literal per-edge degree pairs."""
    spec = {
        "hub": {"2024-01-01": 1},
        "a": {"2024-01-01": 1},
        "b": {"2024-01-01": 1},
    }
    rows, i = [], 0
    edges = [
        ("hub", "d1"), ("hub", "d2"), ("hub", "d3"),
        ("a", "d1"), ("b", "d1"), ("a", "d4"),
    ]
    for c, d in edges:
        rows.append((i, "2024-01-01T10:00:00", c, d, "Allowed", None))
        i += 1
    fact = make_fact(spark, rows)
    got = graph.degree_assortativity(fact).collect()[0]
    from collections import Counter

    dc, dd = Counter(c for c, _ in edges), Counter(d for _, d in edges)
    xs = np.array([dc[c] for c, d in edges], dtype=float)
    ys = np.array([dd[d] for c, d in edges], dtype=float)
    want = np.corrcoef(xs, ys)[0, 1]
    assert got.n_edges == 6
    assert got.sx == int(xs.sum()) and got.sxy == int((xs * ys).sum())
    assert got.assortativity == pytest.approx(round(want, 6), abs=1e-6)


def test_assortativity_degenerate_is_null(spark):
    """All degrees equal -> zero variance -> NULL, not a crash."""
    rows = [
        (0, "2024-01-01T10:00:00", "c1", "d1", "Allowed", None),
        (1, "2024-01-01T10:00:00", "c2", "d2", "Allowed", None),
    ]
    got = graph.degree_assortativity(make_fact(spark, rows)).collect()[0]
    assert got.assortativity is None and got.n_edges == 2


def test_rank_metrics_definitions(spark):
    """6 clients with distinct counts: ntile(4) buckets 2/2/1/1,
    percent_rank = (rank-1)/5, cume = rank/6."""
    spec = {
        f"c{i}": {"2024-01-01": 10 - i} for i in range(6)
    }  # c0 biggest … c5 smallest
    out = {
        r.client: r
        for r in ranks.client_rank_metrics(
            _fact_client_days(spark, spec)
        ).collect()
    }
    assert [out[f"c{i}"].quartile for i in range(6)] == [1, 1, 2, 2, 3, 4]
    for i in range(6):
        assert out[f"c{i}"].pct_rank == round(i / 5, 6)
        assert out[f"c{i}"].cume == round((i + 1) / 6, 6)
