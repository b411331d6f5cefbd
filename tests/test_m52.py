"""M52 — seasonal Mann–Kendall, Cochran–Armitage block-rate trend."""

from __future__ import annotations

import datetime as dt
import math

from piholelongtermstats_spark.operators import stattests
from tests.conftest import make_fact


def _day_counts(counts_list, start="2024-01-01"):
    t0 = dt.datetime.fromisoformat(f"{start}T10:00:00")
    rows, eid = [], 0
    for i, c in enumerate(counts_list):
        for j in range(c):
            eid += 1
            rows.append(
                (eid, (t0 + dt.timedelta(days=i, minutes=j)).isoformat(),
                 "c1", "dom", "Allowed", 0.1)
            )
    return rows


def test_seasonal_mk_pure_cycle_is_exact_zero(spark):
    """Every weekday subseries is constant -> S' = 0 and z = 0, while
    the plain MK S over the same series is nonzero (the cycle's
    cross-weekday signs do not fully cancel over 4.5 weeks)."""
    counts = ([5, 8, 11, 14, 11, 40, 40] * 5)[:32]
    fact = make_fact(spark, _day_counts(counts))
    r = stattests.seasonal_mann_kendall(fact).collect()[0]
    assert (r.s_stat, r.z) == (0, 0.0)


def test_seasonal_mk_detects_trend_under_cycle(spark):
    counts = [10 + 2 * t + (30 if t % 7 >= 5 else 0) for t in range(28)]
    fact = make_fact(spark, _day_counts(counts))
    r = stattests.seasonal_mann_kendall(fact).collect()[0]
    # every weekday subseries is strictly increasing: S' = 7 * C(4,2)
    assert r.s_stat == 7 * 6
    assert r.z > 1.96


def test_seasonal_mk_matches_direct_formula(spark):
    counts = [7, 3, 9, 9, 2, 8, 5, 6, 3, 9, 1, 2, 8, 5, 7, 4]
    fact = make_fact(spark, _day_counts(counts))
    r = stattests.seasonal_mann_kendall(fact).collect()[0]
    # 2024-01-01 is a Monday; weekday key only partitions, value
    # irrelevant
    by_wd = {}
    for t, y in enumerate(counts):
        by_wd.setdefault(t % 7, []).append(y)
    s = var18 = 0
    for ys in by_wd.values():
        n_w = len(ys)
        var18 += n_w * (n_w - 1) * (2 * n_w + 5)
        tie_counts = {}
        for y in ys:
            tie_counts[y] = tie_counts.get(y, 0) + 1
        var18 -= sum(t * (t - 1) * (2 * t + 5) for t in tie_counts.values())
        for i in range(n_w):
            for j in range(i + 1, n_w):
                s += (ys[j] > ys[i]) - (ys[j] < ys[i])
    assert (r.s_stat, r.var18_num) == (s, var18)
    corr = s - 1 if s > 0 else s + 1 if s < 0 else 0
    expect = 0.0 if s == 0 or var18 <= 0 else corr / math.sqrt(var18 / 18.0)
    assert r.z == round(expect, 6)


def _rate_rows(day_specs, start="2024-01-01"):
    """day_specs: list of (n_allowed, n_blocked)."""
    t0 = dt.datetime.fromisoformat(f"{start}T10:00:00")
    rows, eid = [], 0
    for i, (na, nb) in enumerate(day_specs):
        for j in range(na + nb):
            eid += 1
            st = "Blocked" if j < nb else "Allowed"
            rows.append(
                (eid, (t0 + dt.timedelta(days=i, minutes=j)).isoformat(),
                 "c1", "dom", st, 0.1)
            )
    return rows


def test_ca_constant_share_is_exact_zero(spark):
    """b_i = n_i/5 every day -> num = 0 exactly, z = 0.0 (volume
    varies wildly; only composition matters)."""
    fact = make_fact(
        spark, _rate_rows([(8, 2), (40, 10), (4, 1), (16, 4), (80, 20)])
    )
    r = stattests.blocked_rate_trend(fact).collect()[0]
    assert r.z == 0.0


def test_ca_detects_composition_drift(spark):
    specs = [(95, 5), (90, 10), (85, 15), (80, 20), (75, 25),
             (70, 30), (65, 35)]
    fact = make_fact(spark, _rate_rows(specs))
    r = stattests.blocked_rate_trend(fact).collect()[0]
    assert r.z > 1.96
    assert (r.n_total, r.blocked_total) == (700, 140)


def test_ca_degenerate_all_blocked_is_null(spark):
    fact = make_fact(spark, _rate_rows([(0, 5), (0, 9), (0, 4)]))
    r = stattests.blocked_rate_trend(fact).collect()[0]
    assert r.z is None


def test_ca_matches_direct_formula(spark):
    specs = [(9, 1), (17, 3), (6, 2), (21, 9), (11, 4), (13, 7)]
    fact = make_fact(spark, _rate_rows(specs))
    r = stattests.blocked_rate_trend(fact).collect()[0]
    ns = [a + b for a, b in specs]
    bs = [b for _, b in specs]
    nn, bb = sum(ns), sum(bs)
    stb = sum(t * b for t, b in enumerate(bs))
    stn = sum(t * n for t, n in enumerate(ns))
    snt2 = sum(n * t * t for t, n in enumerate(ns))
    num = nn * stb - bb * stn
    z = (float(num) * math.sqrt(float(nn) / (float(bb) * float(nn - bb)))
         / math.sqrt(float(nn * snt2 - stn * stn)))
    assert r.z == round(z, 6)
