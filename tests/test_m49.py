"""M49 — Holt–Winters triple smoothing, trimmed daily mean."""

from __future__ import annotations

import datetime as dt

from piholelongtermstats_spark.operators import robust, timeagg
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


def test_holt_winters_exact_on_pure_weekly_series(spark):
    """On a zero-noise, zero-trend additive weekly series the HW
    recurrences are FIXED POINTS from the very first scored day:
    y − s_{t−7} = l̄ keeps the level constant, y − l̄ = s keeps each
    seasonal unchanged, so forecast_next equals the next observation
    EXACTLY (not approximately) for every t."""
    pattern = [10, 10, 10, 10, 10, 40, 40]
    counts = pattern * 4
    fact = make_fact(spark, _day_counts(counts))
    rows = sorted(
        robust.holt_winters_daily(fact).collect(), key=lambda r: r.date
    )
    assert len(rows) == len(counts) - 7
    for i, r in enumerate(rows[:-1]):
        assert r.forecast_next == float(counts[7 + i + 1])
        assert r.trend == 0.0
    # level holds at the first-week mean throughout
    assert all(abs(r.level - sum(pattern) / 7.0) < 1e-6 for r in rows)


def test_holt_winters_learns_trend(spark):
    """Linear trend + weekly seasonal: the one-step error over the
    final week must be far below the error over the first scored week
    (the trend state converges toward the true slope)."""
    season = [0, 0, 0, 0, 0, 30, 30]
    counts = [100 + 3 * t + season[t % 7] for t in range(35)]
    fact = make_fact(spark, _day_counts(counts))
    rows = sorted(
        robust.holt_winters_daily(fact).collect(), key=lambda r: r.date
    )
    errs = [
        abs(r.forecast_next - counts[7 + i + 1])
        for i, r in enumerate(rows[:-1])
    ]
    assert sum(errs[-7:]) < 0.5 * sum(errs[:7])
    assert 1.5 < rows[-1].trend < 4.5


def test_holt_winters_short_series_is_empty(spark):
    fact = make_fact(spark, _day_counts([5] * 7))  # period but no t>7
    assert robust.holt_winters_daily(fact).count() == 0
    fact2 = make_fact(spark, _day_counts([5] * 4))
    assert robust.holt_winters_daily(fact2).count() == 0


def _reply_rows(ms_values, start="2024-01-01"):
    t0 = dt.datetime.fromisoformat(f"{start}T10:00:00")
    return [
        (i + 1, (t0 + dt.timedelta(minutes=i)).isoformat(), "c1", "dom",
         "Allowed", v / 1000.0)
        for i, v in enumerate(ms_values)
    ]


def test_trimmed_mean_hand_values(spark):
    fact = make_fact(spark, _reply_rows(list(range(1, 11))))
    r = timeagg.trimmed_mean_reply_daily(fact).collect()[0]
    # n=10: drop rank 1 and rank 10 -> mean of 2..9 = 5.5
    assert (r.n, r.n_kept) == (10, 8)
    assert r.trimmed_mean_ms == 5.5


def test_trimmed_mean_ignores_outlier(spark):
    fact = make_fact(spark, _reply_rows([1] * 9 + [100000]))
    r = timeagg.trimmed_mean_reply_daily(fact).collect()[0]
    assert r.trimmed_mean_ms == 1.0  # the spike is outside the kept ranks
    assert r.n_kept == 8


def test_trimmed_mean_small_n_keeps_everything(spark):
    fact = make_fact(spark, _reply_rows([5, 7, 9]))
    r = timeagg.trimmed_mean_reply_daily(fact).collect()[0]
    # n=3: lo = 0, hi = 3 -> nothing trimmed
    assert (r.n, r.n_kept) == (3, 3)
    assert r.trimmed_mean_ms == 7.0


def test_trimmed_mean_tie_spans_cut(spark):
    """A value whose multiplicity straddles the cut contributes only
    its kept multiplicity."""
    fact = make_fact(spark, _reply_rows([1, 2, 2, 2, 2, 2, 2, 2, 2, 50]))
    r = timeagg.trimmed_mean_reply_daily(fact).collect()[0]
    # ranks 2..9 are all the value 2
    assert (r.n_kept, r.trimmed_mean_ms) == (8, 2.0)
