"""M61 — top-k stability differentials."""

from __future__ import annotations

import datetime as dt

from piholelongtermstats_spark.operators import anomaly
from tests.conftest import make_fact

_BASE = dt.datetime(2024, 1, 1, 9, 0, 0)


def _rows_domains(half1, half2):
    """half1/half2: dict domain -> count; halves 4 days apart."""
    rows, eid = [], 0
    for off, half in ((0, half1), (4, half2)):
        for dom, cnt in half.items():
            for i in range(cnt):
                eid += 1
                ts = _BASE + dt.timedelta(days=off + (i % 2), minutes=i)
                rows.append((eid, ts.isoformat(), "c1", dom, "Allowed", 0.01))
    return rows


def test_topk_stability_identical_halves(spark):
    half = {f"d{i}": 5 + i for i in range(6)}
    r = anomaly.topk_domain_stability(
        make_fact(spark, _rows_domains(half, half)), k=10
    ).collect()[0]
    assert r.n_first == 6 and r.n_second == 6 and r.n_common == 6
    assert r.jaccard_ppm == 1_000_000


def test_topk_stability_disjoint_halves(spark):
    r = anomaly.topk_domain_stability(
        make_fact(
            spark,
            _rows_domains({f"a{i}": 3 for i in range(4)},
                          {f"b{i}": 3 for i in range(4)}),
        ),
        k=10,
    ).collect()[0]
    assert r.n_common == 0 and r.jaccard_ppm == 0


def test_topk_stability_respects_k_cut_and_tiebreak(spark):
    # first half has 12 domains; only the top-10 by (cnt DESC, domain
    # ASC) may count. d10/d11 have the lowest counts -> cut.
    h1 = {f"d{i:02d}": 20 - i for i in range(12)}
    h2 = {f"d{i:02d}": 20 - i for i in range(10)}
    r = anomaly.topk_domain_stability(
        make_fact(spark, _rows_domains(h1, h2)), k=10
    ).collect()[0]
    assert r.n_first == 10 and r.n_second == 10 and r.n_common == 10
    assert r.jaccard_ppm == 1_000_000


def test_topk_stability_empty_input_one_row(spark):
    empty = make_fact(spark, [])
    r = anomaly.topk_domain_stability(empty, k=10).collect()
    assert len(r) == 1
    assert r[0].n_first == 0 and r[0].jaccard_ppm is None
