"""M62 — Hill tail-index differentials."""

from __future__ import annotations

import datetime as dt
import math

import pytest

from piholelongtermstats_spark.operators import skew
from tests.conftest import make_fact

_BASE = dt.datetime(2024, 1, 1, 9, 0, 0)


def _rows(domain_counts):
    rows, eid = [], 0
    for dom, cnt in domain_counts.items():
        for i in range(cnt):
            eid += 1
            ts = _BASE + dt.timedelta(minutes=eid % 500)
            rows.append((eid, ts.isoformat(), "c1", dom, "Allowed", 0.01))
    return rows


def _hill_replay(counts, k):
    xs = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[: k + 1]
    xk1 = xs[k][1]
    acc = 0.0
    for dom, c in xs[:k]:
        acc = acc + math.log(c / xk1)
    return acc / k, (k / acc if acc > 0 else None)


def test_hill_matches_float_replay(spark):
    # Zipf-ish head: cnt ~ 60/rank over 14 domains, k = 8
    counts = {f"d{i:02d}": max(60 // (i + 1), 1) for i in range(14)}
    r = skew.domain_tail_hill(make_fact(spark, _rows(counts)), k=8).collect()[0]
    hill, alpha = _hill_replay(counts, 8)
    assert r.n_domains == 14 and r.k == 8
    assert r.hill_mean == pytest.approx(hill, abs=1e-6)
    assert r.alpha_hat == pytest.approx(alpha, abs=1e-6)
    # a 1/rank head should estimate alpha in the neighborhood of 1
    assert 0.4 < r.alpha_hat < 2.5


def test_hill_too_few_domains_is_null(spark):
    counts = {f"d{i}": 5 for i in range(6)}
    r = skew.domain_tail_hill(make_fact(spark, _rows(counts)), k=8).collect()[0]
    assert r.n_domains == 6
    assert r.hill_mean is None and r.alpha_hat is None


def test_hill_uniform_counts_degenerate(spark):
    # all counts equal: every ln term is 0 -> hill_mean 0, alpha NULL
    counts = {f"d{i:02d}": 7 for i in range(12)}
    r = skew.domain_tail_hill(make_fact(spark, _rows(counts)), k=8).collect()[0]
    assert r.hill_mean == 0.0 and r.alpha_hat is None
