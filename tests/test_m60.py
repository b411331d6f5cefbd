"""M60 — effect-size panel and weekly periodogram differentials."""

from __future__ import annotations

import datetime as dt
import math

import pytest

from piholelongtermstats_spark.operators import stattests
from tests.conftest import make_fact

_BASE = dt.datetime(2024, 1, 1, 8, 0, 0)  # Monday


def _mk(day_blocked, day_other, night_blocked, night_other):
    rows, eid = [], 0
    for cnt, status, hour in (
        (day_blocked, "Blocked", 10),
        (day_other, "Allowed", 10),
        (night_blocked, "Blocked", 2),
        (night_other, "Allowed", 2),
    ):
        for i in range(cnt):
            eid += 1
            ts = _BASE.replace(hour=hour) + dt.timedelta(minutes=i % 50)
            rows.append((eid, ts.isoformat(), "c1", "dom", status, 0.01))
    return rows


def test_effect_panel_matches_float_replay(spark):
    n1, x1, n2, x2 = 40, 12, 25, 3
    fact = make_fact(spark, _mk(x1, n1 - x1, x2, n2 - x2))
    r = stattests.day_night_effect_panel(fact).collect()[0]
    assert (r.n1, r.x1, r.n2, r.x2) == (n1, x1, n2, x2)
    p = (x1 + x2) / (n1 + n2)
    z = (x1 / n1 - x2 / n2) / math.sqrt(p * (1 - p) * (1 / n1 + 1 / n2))
    assert r.z_stat == pytest.approx(z, abs=1e-6)
    assert r.risk_ratio == pytest.approx((x1 * n2) / (x2 * n1), abs=1e-6)
    assert r.odds_ratio == pytest.approx(
        (x1 * (n2 - x2)) / (x2 * (n1 - x1)), abs=1e-6
    )


def test_effect_panel_degenerate_margins(spark):
    # night has zero blocked: RR/OR undefined, z still defined
    r = stattests.day_night_effect_panel(
        make_fact(spark, _mk(5, 5, 0, 10))
    ).collect()[0]
    assert r.risk_ratio is None and r.odds_ratio is None
    assert r.z_stat is not None
    # everything blocked: pooled rate saturated -> z undefined
    r2 = stattests.day_night_effect_panel(
        make_fact(spark, _mk(5, 0, 5, 0))
    ).collect()[0]
    assert r2.z_stat is None


def _pg_replay(counts, harmonics=3):
    n = len(counts)
    s = sum(counts)
    c = [n * y - s for y in counts]
    den = sum(v * v for v in c)
    g = [0] * 7
    for i, v in enumerate(c):
        g[i % 7] += v
    out = {}
    for k in range(1, harmonics + 1):
        cs, sn = 0.0, 0.0
        for m in range(7):
            cs = cs + float(g[m]) * math.cos(2.0 * math.pi * k * m / 7.0)
            sn = sn + float(g[m]) * math.sin(2.0 * math.pi * k * m / 7.0)
        out[k] = (cs, sn, (cs * cs + sn * sn) / (n * den) if den else None)
    return out


def _day_counts(counts):
    rows, eid = [], 0
    for i, cnt in enumerate(counts):
        for j in range(cnt):
            eid += 1
            ts = _BASE + dt.timedelta(days=i, minutes=j % 50)
            rows.append((eid, ts.isoformat(), "c1", "dom", "Allowed", 0.01))
    return rows


def test_periodogram_matches_float_replay(spark):
    counts = [5, 9, 4, 12, 6, 14, 3, 11, 8, 2, 13, 7, 10, 6]
    rows = stattests.weekly_periodogram(
        make_fact(spark, _day_counts(counts))
    ).collect()
    want = _pg_replay(counts)
    assert len(rows) == 3
    for r in rows:
        cs, sn, ps = want[r.harmonic]
        assert r.cos_sum == pytest.approx(cs, abs=1e-6)
        assert r.sin_sum == pytest.approx(sn, abs=1e-6)
        assert r.power_share == pytest.approx(ps, abs=1e-9)


def test_periodogram_pure_weekly_cycle_concentrates_power(spark):
    # cosine-SHAPED week over 4 full weeks: the fundamental carries
    # far more power than harmonics 2 and 3. (A one-day spike train
    # would NOT work — an impulse per week is spectrally flat across
    # all weekly harmonics, the first draft's fixture mistake.)
    counts = [20, 15, 8, 3, 3, 8, 15] * 4
    rows = {
        r.harmonic: r.power_share
        for r in stattests.weekly_periodogram(
            make_fact(spark, _day_counts(counts))
        ).collect()
    }
    assert rows[1] > 5 * rows[2] and rows[1] > 5 * rows[3]


def test_periodogram_constant_series_is_null(spark):
    rows = stattests.weekly_periodogram(
        make_fact(spark, _day_counts([6] * 10))
    ).collect()
    assert all(r.power_share is None for r in rows)
    assert all(r.den == 0.0 for r in rows)
