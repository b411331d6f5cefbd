"""M28 robust tier: exact-median/MAD decisions on constructed edge
cases, Theil–Sen vs a literal pairwise-median reference, EWMA vs a
Python fold, seasonal index exact ratios."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from piholelongtermstats_spark.operators import robust
from tests.conftest import make_fact


def _fact_days(spark, day_counts: dict[str, int]):
    """Fact with exactly day_counts[date_iso] events on each date."""
    rows, i = [], 0
    for d, n in day_counts.items():
        for _ in range(n):
            rows.append((i, f"{d}T12:00:00", "c1", "dom", "Allowed", None))
            i += 1
    return make_fact(spark, rows)


def test_mad_outlier_flags_spike_odd_n(spark):
    """5 days (odd): counts 10,10,10,10,100 → med=10, MAD=0 → the
    spike is flagged (mad4=0 rule), z NULL everywhere."""
    fact = _fact_days(
        spark,
        {f"2024-01-0{i}": 10 for i in range(1, 5)} | {"2024-01-05": 100},
    )
    rows = {r.date.day: r for r in robust.mad_outlier_days(fact).collect()}
    assert all(r.med2 == 20 and r.mad4 == 0 for r in rows.values())
    assert rows[5].is_outlier == 1 and rows[5].dev2 == 180
    assert all(rows[d].is_outlier == 0 for d in range(1, 5))
    assert all(r.robust_z is None for r in rows.values())


def test_mad_outlier_even_n_half_integer_median(spark):
    """4 days: 10,11,13,50 → med = 12 (med2=24), deviations
    |y−12| = 2,1,1,38 → MAD = 1.5 (mad4=6); gate |y−med| > 3.5·1.5
    = 5.25 flags only the 50-day. z = dev/(1.4826·1.5)."""
    fact = _fact_days(
        spark,
        {
            "2024-02-01": 10,
            "2024-02-02": 11,
            "2024-02-03": 13,
            "2024-02-04": 50,
        },
    )
    rows = {r.date.day: r for r in robust.mad_outlier_days(fact).collect()}
    assert rows[1].med2 == 24 and rows[1].mad4 == 6
    assert [rows[d].is_outlier for d in (1, 2, 3, 4)] == [0, 0, 0, 1]
    assert rows[4].robust_z == pytest.approx(
        round((2.0 * 76) / (1.4826 * 6), 6)
    )


def test_theil_sen_ignores_single_outlier(spark):
    """y = 5 + 2·i for 7 days with day 4 spiked to 100: OLS would
    swing; the pairwise-slope median stays exactly 2."""
    counts = {
        f"2024-03-0{i+1}": 5 + 2 * i if i != 3 else 100 for i in range(7)
    }
    fact = _fact_days(spark, counts)
    row = robust.theil_sen_daily_trend(fact).collect()[0]
    ys = [5 + 2 * i if i != 3 else 100 for i in range(7)]
    slopes = sorted(
        (ys[j] - ys[i]) / (j - i)
        for i in range(7)
        for j in range(i + 1, 7)
    )
    n = len(slopes)
    ref = (
        slopes[(n - 1) // 2]
        if n % 2
        else (slopes[n // 2 - 1] + slopes[n // 2]) / 2
    )
    assert row.n_days == 7 and row.n_pairs == 21
    assert row.slope_per_day == pytest.approx(round(ref, 6))
    assert row.slope_per_day == 2.0


def test_ewma_matches_python_fold(spark):
    counts = {f"2024-04-{d:02d}": (d * 7) % 13 + 1 for d in range(1, 11)}
    fact = _fact_days(spark, counts)
    got = {
        r.date.day: r.ewma
        for r in robust.ewma_daily_counts(fact, alpha=0.3).collect()
    }
    e = None
    for d in range(1, 11):
        y = float((d * 7) % 13 + 1)
        e = y if e is None else 0.3 * y + 0.7 * e
        assert got[d] == round(e, 6), d
    assert len(got) == 10


def test_seasonal_index_exact_ratio(spark):
    """Two weeks where every Monday has 30 events and every other
    day 10: overall mean = (2·30+12·10)/14 = 180/14; Monday index =
    30/(180/14) = 7/3."""
    base = dt.date(2024, 1, 1)  # a Monday
    counts = {
        (base + dt.timedelta(days=i)).isoformat(): (30 if i % 7 == 0 else 10)
        for i in range(14)
    }
    fact = _fact_days(spark, counts)
    rows = {r.day_name: r for r in robust.weekday_seasonal_index(fact).collect()}
    mon = rows["Monday"]
    assert mon.n_days == 2 and mon.day_total == 60
    assert mon.idx_num == 60 * 14 and mon.idx_den == 2 * 180
    assert mon.seasonal_index == round(840 / 360, 6)
    tue = rows["Tuesday"]
    assert tue.seasonal_index == round(280 / 360, 6)
    assert len(rows) == 7


def test_theil_sen_two_days_single_pair(spark):
    fact = _fact_days(spark, {"2024-05-01": 4, "2024-05-03": 10})
    row = robust.theil_sen_daily_trend(fact).collect()[0]
    assert row.n_pairs == 1 and row.slope_per_day == 3.0


def test_mad_plan_windows_are_daily_only(spark):
    """The only row_number windows order the per-day relation — the
    fact is reduced by groupBy(date) before any window."""
    fact = _fact_days(spark, {"2024-06-01": 3, "2024-06-02": 5})
    plan = robust.mad_outlier_days(fact)._jdf.queryExecution().executedPlan().toString()
    # windows exist, but no window input contains the raw event scan
    # without an intervening HashAggregate (date grouping first)
    assert plan.count("Window") >= 1
    assert "HashAggregate" in plan


def test_holt_matches_python_fold(spark):
    counts = {f"2024-05-{d:02d}": (d * 5) % 11 + 2 for d in range(1, 13)}
    fact = _fact_days(spark, counts)
    got = {
        r.date.day: (r.level, r.trend, r.forecast_next)
        for r in robust.holt_linear_daily(fact, 0.3, 0.2).collect()
    }
    l = b = None
    for d in range(1, 13):
        y = float((d * 5) % 11 + 2)
        if l is None:
            l, b = y, 0.0
        else:
            l_new = 0.3 * y + 0.7 * (l + b)
            b = 0.2 * (l_new - l) + 0.8 * b
            l = l_new
        assert got[d] == (round(l, 6), round(b, 6), round(l + b, 6)), d


def test_forecast_error_panel_exact(spark):
    """10 days: scored days are t=8..10; hand-check both numerators."""
    ys = [5, 7, 6, 9, 4, 8, 10, 6, 7, 12]
    counts = {f"2024-06-{d:02d}": ys[d - 1] for d in range(1, 11)}
    row = robust.forecast_error_panel(_fact_days(spark, counts)).collect()[0]
    p_num = sum(abs(ys[t] - ys[t - 1]) for t in range(7, 10))
    s_num = sum(abs(ys[t] - ys[t - 7]) for t in range(7, 10))
    assert row.n_scored == 3
    assert row.mae_p_num == p_num and row.mae_s_num == s_num
    assert row.mase_persistence == round(p_num / s_num, 6)


def test_tukey_fences_flag_extremes(spark):
    """8 days sorted 1,10,11,12,13,14,15,60: type-1 ranks are
    ceil(8/4)=2 and ceil(24/4)=6 -> Q1=10, Q3=14, IQR 4; fences
    [4, 20]: 1 below, 60 above."""
    ys = [12, 10, 1, 14, 13, 11, 60, 15]
    counts = {f"2024-07-{d:02d}": ys[d - 1] for d in range(1, 9)}
    rows = {r.y: r for r in robust.tukey_fence_days(_fact_days(spark, counts)).collect()}
    assert rows[12].q1 == 10 and rows[12].q3 == 14 and rows[12].iqr == 4
    assert rows[1].below_fence == 1 and rows[1].above_fence == 0
    assert rows[60].above_fence == 1 and rows[60].below_fence == 0
    assert all(
        r.below_fence == 0 and r.above_fence == 0
        for y, r in rows.items()
        if y not in (1, 60)
    )
