"""M22 nonparametric tests: Mann-Kendall S/variance/Z against a
literal pairwise reference, KS against a brute-force ECDF scan."""

from __future__ import annotations

import math

from piholelongtermstats_spark.operators import stattests
from tests.conftest import make_fact


def _fact_daily(spark, counts):
    rows = []
    eid = 0
    for i, c in enumerate(counts):
        for _ in range(c):
            eid += 1
            rows.append(
                (eid, f"2024-01-{i + 1:02d}T10:00:00", "c1", "d",
                 "Allowed", 0.1)
            )
    return make_fact(spark, rows)


def _mk_reference(y):
    n = len(y)
    s = sum(
        (y[j] > y[i]) - (y[j] < y[i])
        for i in range(n) for j in range(i + 1, n)
    )
    from collections import Counter

    tie_term = sum(
        t * (t - 1) * (2 * t + 5) for t in Counter(y).values()
    )
    var18 = n * (n - 1) * (2 * n + 5) - tie_term
    if s == 0 or var18 <= 0:
        z = 0.0
    else:
        corr = s - 1 if s > 0 else s + 1
        z = corr / math.sqrt(var18 / 18.0)
    return s, var18, round(z, 6)


def test_mann_kendall_matches_reference(spark):
    for counts in ([2, 4, 3, 6, 5, 9], [5, 5, 5, 5], [9, 7, 7, 4, 2]):
        s, var18, z = _mk_reference(counts)
        r = stattests.mann_kendall_trend(_fact_daily(spark, counts)).collect()[0]
        assert (r.n_days, r.s_stat, r.var18_num, r.z) == (
            len(counts), s, var18, z
        ), counts


def test_mann_kendall_monotone_series_extremes(spark):
    """Strictly increasing counts: S = n(n-1)/2 (every pair +1)."""
    counts = [1, 2, 3, 4, 5]
    r = stattests.mann_kendall_trend(_fact_daily(spark, counts)).collect()[0]
    assert r.s_stat == 10
    assert r.z > 0


def test_ks_matches_bruteforce(spark):
    """Day sample {1,2,2,9}, Night sample {2,3}: brute-force the
    merged-ECDF max deviation."""
    rows = [
        # Day = hour 10; Night = hour 2 (day_period derives from hour)
        (1, "2024-01-01T10:00:00", "c1", "d", "Allowed", 1.0),
        (2, "2024-01-01T10:01:00", "c1", "d", "Allowed", 2.0),
        (3, "2024-01-01T10:02:00", "c1", "d", "Allowed", 2.0),
        (4, "2024-01-01T10:03:00", "c1", "d", "Allowed", 9.0),
        (5, "2024-01-01T02:00:00", "c1", "d", "Allowed", 2.0),
        (6, "2024-01-01T02:01:00", "c1", "d", "Allowed", 3.0),
    ]
    a, b = [1.0, 2.0, 2.0, 9.0], [2.0, 3.0]
    na, nb = len(a), len(b)
    values = sorted(set(a) | set(b))
    d_num = max(
        abs(sum(x <= v for x in a) * nb - sum(x <= v for x in b) * na)
        for v in values
    )
    r = stattests.ks_day_night(make_fact(spark, rows)).collect()[0]
    assert (r.n_day, r.n_night, r.d_num) == (na, nb, d_num)
    assert r.d_stat == round(d_num / (na * nb), 6)


def test_ks_identical_samples_zero(spark):
    rows = [
        (1, "2024-01-01T10:00:00", "c1", "d", "Allowed", 5.0),
        (2, "2024-01-01T02:00:00", "c1", "d", "Allowed", 5.0),
    ]
    r = stattests.ks_day_night(make_fact(spark, rows)).collect()[0]
    assert (r.d_num, r.d_stat) == (0, 0.0)
