"""M59 — weekday ANOVA, Kruskal–Wallis, Cramér's V differentials."""

from __future__ import annotations

import datetime as dt

import pytest

from piholelongtermstats_spark.operators import stattests
from tests.conftest import make_fact

# 2024-01-01 is a Monday: weekday index i -> date 2024-01-0(1+i)
_BASE = dt.datetime(2024, 1, 1, 10, 0, 0)


def _rows(groups, status="Allowed"):
    rows, eid = [], 0
    for widx, vals in groups.items():
        for v in vals:
            eid += 1
            rows.append(
                (
                    eid,
                    (_BASE + dt.timedelta(days=widx, minutes=eid % 40)).isoformat(),
                    "c1",
                    "dom",
                    status,
                    v,
                )
            )
    return rows


def _anova_replay(groups):
    """Plain-float replay of the exact-moment formula."""
    q = {w: [round(v * 1000) for v in vs] for w, vs in groups.items()}
    ns = {w: len(vs) for w, vs in q.items()}
    ss = {w: sum(vs) for w, vs in q.items()}
    n = sum(ns.values())
    s = sum(ss.values())
    qq = sum(x * x for vs in q.values() for x in vs)
    a = sum(ss[w] ** 2 / ns[w] for w in q)
    ssb = a - s * s / n
    ssw = qq - a
    k = len(q)
    return (ssb / (k - 1)) / (ssw / (n - k))


def test_anova_matches_float_replay(spark):
    groups = {
        0: [0.010, 0.012, 0.014, 0.020, 0.016],
        1: [0.050, 0.055, 0.048, 0.060],
        2: [0.030, 0.031, 0.029, 0.033, 0.035, 0.028],
    }
    r = stattests.weekday_anova_reply(make_fact(spark, _rows(groups))).collect()[0]
    assert r.k_groups == 3 and r.n_total == 15
    assert r.f_stat == pytest.approx(_anova_replay(groups), abs=1e-6)


def test_anova_zero_within_variance_is_null(spark):
    groups = {0: [0.01] * 4, 1: [0.01] * 4}
    r = stattests.weekday_anova_reply(make_fact(spark, _rows(groups))).collect()[0]
    assert r.ssw == 0.0 and r.f_stat is None


def test_anova_identical_groups_small_f(spark):
    groups = {w: [0.010, 0.020, 0.030] for w in range(7)}
    r = stattests.weekday_anova_reply(make_fact(spark, _rows(groups))).collect()[0]
    assert r.k_groups == 7
    assert abs(r.f_stat) < 1e-6  # identical groups: SSB = 0 exactly


def _kw_replay(groups):
    q = {w: [round(v * 1000) for v in vs] for w, vs in groups.items()}
    allv = sorted(x for vs in q.values() for x in vs)
    n = len(allv)
    # midrank per value
    from collections import Counter

    cnt = Counter(allv)
    mid = {}
    cum = 0
    for v in sorted(cnt):
        f = cnt[v]
        mid[v] = cum + (f + 1) / 2
        cum += f
    rs = {w: sum(mid[x] for x in vs) for w, vs in q.items()}
    h = 12 / (n * (n + 1)) * sum(
        rs[w] ** 2 / len(q[w]) for w in q
    ) - 3 * (n + 1)
    t = sum(f**3 - f for f in cnt.values())
    c = 1 - t / (n**3 - n)
    return h, (h / c if c > 0 else None)


def test_kruskal_wallis_matches_float_replay(spark):
    groups = {
        0: [0.010, 0.012, 0.012, 0.020],
        3: [0.050, 0.055, 0.012, 0.060, 0.055],
        5: [0.030, 0.030, 0.029],
    }
    r = stattests.kruskal_wallis_weekday(make_fact(spark, _rows(groups))).collect()[0]
    h, hc = _kw_replay(groups)
    assert r.k_groups == 3 and r.n_total == 12
    assert r.h_stat == pytest.approx(h, abs=1e-6)
    assert r.h_corrected == pytest.approx(hc, abs=1e-6)


def test_kruskal_wallis_all_ties_corrected_null(spark):
    groups = {0: [0.01] * 3, 1: [0.01] * 3}
    r = stattests.kruskal_wallis_weekday(make_fact(spark, _rows(groups))).collect()[0]
    # every value identical: C = 0, corrected H undefined; raw H = 0
    # up to the -3(N+1) identity (single tie group -> H exactly 0)
    assert r.h_corrected is None
    assert r.h_stat == pytest.approx(0.0, abs=1e-9)


def test_cramers_v_independent_table_is_zero(spark):
    # O = [[2,4],[1,2]] over (Mon,Tue) x (Allowed,Blocked):
    # every cell satisfies N*O = r*c exactly -> chi2 = 0
    rows = (
        _rows({0: [0.01] * 2}, "Allowed")
        + [
            (100 + i, (_BASE + dt.timedelta(minutes=i)).isoformat(), "c1", "dom", "Blocked", 0.01)
            for i in range(4)
        ]
        + [
            (200 + i, (_BASE + dt.timedelta(days=1, minutes=i)).isoformat(), "c1", "dom", "Allowed", 0.01)
            for i in range(1)
        ]
        + [
            (300 + i, (_BASE + dt.timedelta(days=1, minutes=i)).isoformat(), "c1", "dom", "Blocked", 0.01)
            for i in range(2)
        ]
    )
    r = stattests.weekday_status_cramers_v(make_fact(spark, rows)).collect()[0]
    assert r.k_weekdays == 2 and r.m_statuses == 2
    assert r.chi2 == 0.0 and r.cramers_v == 0.0


def test_cramers_v_perfect_association_is_one(spark):
    rows = _rows({0: [0.01] * 5}, "Allowed") + [
        (500 + i, (_BASE + dt.timedelta(days=1, minutes=i)).isoformat(), "c1", "dom", "Blocked", 0.01)
        for i in range(5)
    ]
    r = stattests.weekday_status_cramers_v(make_fact(spark, rows)).collect()[0]
    assert r.cramers_v == pytest.approx(1.0, abs=1e-9)


def test_anova_single_group_is_null(spark):
    r = stattests.weekday_anova_reply(
        make_fact(spark, _rows({2: [0.01, 0.02, 0.03]}))
    ).collect()[0]
    assert r.k_groups == 1 and r.f_stat is None
