"""M21 statistical tests: CUSUM drawup identity vs the sequential
fold, chi-square numerator exactness, degenerate inputs."""

from __future__ import annotations

from piholelongtermstats_spark.operators import timeagg
from tests.conftest import make_fact


def _fact_daily(spark, counts, start=1):
    """counts[i] events on day start+i (one client/domain)."""
    rows = []
    eid = 0
    for i, c in enumerate(counts):
        for _ in range(c):
            eid += 1
            rows.append(
                (eid, f"2024-01-{start + i:02d}T10:00:00", "c1", "d",
                 "Allowed", 0.1)
            )
    return make_fact(spark, rows)


def _cusum_fold(counts):
    """Reference: the literal sequential fold in n-scaled units."""
    n, sy = len(counts), sum(counts)
    s = best = 0
    best_i = 0
    for i, y in enumerate(counts):
        s = max(0, s + (n * y - sy))
        if s > best:
            best, best_i = s, i
    return best, best_i


def test_cusum_matches_sequential_fold(spark):
    """A flat series with an upward level shift: the windows-only
    drawup identity must equal the literal fold, and the peak date
    lands inside the shifted regime."""
    counts = [2, 2, 2, 2, 8, 8, 8]
    r = timeagg.cusum_changepoint(_fact_daily(spark, counts)).collect()[0]
    best, best_i = _cusum_fold(counts)
    assert r.n_days == 7
    assert r.max_cusum == best
    assert r.peak_date.day == 1 + best_i
    assert r.cusum_norm == round(best / 7, 6)


def test_cusum_flat_series_is_zero_peak_first_date(spark):
    """No shift: every s_i = 0; the earliest-argmax rule pins
    peak_date to the first date."""
    r = timeagg.cusum_changepoint(_fact_daily(spark, [3, 3, 3, 3])).collect()[0]
    assert r.max_cusum == 0
    assert r.peak_date.day == 1


def test_cusum_downward_shift_stays_zeroish(spark):
    """A downward shift gives the upward CUSUM nothing to accumulate
    beyond the early positive residuals."""
    counts = [8, 8, 8, 2, 2, 2]
    r = timeagg.cusum_changepoint(_fact_daily(spark, counts)).collect()[0]
    best, _ = _cusum_fold(counts)
    assert r.max_cusum == best  # identity holds regardless of direction


def test_chi2_exact_numerator(spark):
    """3 Mondays + 1 Tuesday (n=4): numerator = (7*3-4)^2 + (7*1-4)^2
    + 5*(0-4)^2 = 289 + 9 + 80 = 378; chi2 = 378/28."""
    rows = [
        (1, "2024-01-01T10:00:00", "c1", "d", "Allowed", 0.1),  # Mon
        (2, "2024-01-01T11:00:00", "c1", "d", "Allowed", 0.1),
        (3, "2024-01-01T12:00:00", "c1", "d", "Allowed", 0.1),
        (4, "2024-01-02T10:00:00", "c1", "d", "Allowed", 0.1),  # Tue
    ]
    r = timeagg.weekday_chi2(make_fact(spark, rows)).collect()[0]
    assert (r.n, r.chi2_num, r.dof) == (4, 378, 6)
    assert r.chi2 == round(378 / 28, 6)


def test_chi2_uniform_is_zero(spark):
    """One event on each of 7 consecutive days (one per weekday):
    numerator 0, chi2 0."""
    rows = [
        (i, f"2024-01-{i:02d}T10:00:00", "c1", "d", "Allowed", 0.1)
        for i in range(1, 8)
    ]
    r = timeagg.weekday_chi2(make_fact(spark, rows)).collect()[0]
    assert (r.chi2_num, r.chi2) == (0, 0.0)
