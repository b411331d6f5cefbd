"""M50 — Ljung–Box, survival doubling invariance, ORC round trip."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from piholelongtermstats_spark.operators import stattests, survival
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


def test_ljung_box_matches_direct_formula(spark):
    """Q replayed in plain Python floats with the identical clearing
    and fold order on a mixed fixture."""
    counts = [5, 9, 4, 12, 6, 14, 3, 11, 8, 2, 13, 7, 10, 6, 9]
    fact = make_fact(spark, _day_counts(counts))
    r = stattests.ljung_box_daily(fact, 7).collect()[0]
    n, s = len(counts), sum(counts)
    c = [n * x - s for x in counts]
    den = sum(v * v for v in c)
    acc = 0.0
    for k in range(1, 8):
        num = sum(c[t] * c[t + k] for t in range(n - k))
        rho = float(num) / float(den)
        acc = acc + rho * rho / float(n - k)
    assert r.n_days == n and r.dof == 7
    assert abs(r.q_stat - n * (n + 2) * acc) < 1e-6


def test_ljung_box_strong_weekly_cycle_is_significant(spark):
    counts = [5, 5, 5, 5, 5, 40, 40] * 4
    fact = make_fact(spark, _day_counts(counts))
    r = stattests.ljung_box_daily(fact, 7).collect()[0]
    assert r.q_stat > 14.07  # chi2_{7, 0.95}


def test_ljung_box_zero_variance_is_null(spark):
    fact = make_fact(spark, _day_counts([6] * 10))
    r = stattests.ljung_box_daily(fact, 7).collect()[0]
    assert r.q_stat is None


def test_ljung_box_short_series_caps_dof(spark):
    """n = 5 days: lags 5..7 have no pairs and drop out of dof."""
    fact = make_fact(spark, _day_counts([3, 8, 2, 9, 4]))
    r = stattests.ljung_box_daily(fact, 7).collect()[0]
    assert r.dof == 4


def test_ljung_box_single_day_emits_one_row(spark):
    """Degenerate series (one day): no lag has pairs AND den = 0.
    The global-agg shape must still emit exactly one row — dof 0,
    q_stat NULL — matching the oracle's one-row FROM tot, den, folded
    (r9 ADVICE: the old groupBy('n','den') returned ZERO rows here)."""
    rows = stattests.ljung_box_daily(
        make_fact(spark, _day_counts([5])), 7
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.n_days == 1 and r.dof == 0 and r.q_stat is None


def test_ljung_box_fully_gapped_calendar_emits_one_row(spark):
    """Two observed days 152 apart: den > 0 but no lag k <= 7 pairs
    exist, so the fold is empty — one row, dof 0, Q = n(n+2)*0.0."""
    rows_a = _day_counts([3], "2024-01-01")
    rows_b = [
        (eid + 1000, *rest)
        for (eid, *rest) in _day_counts([8], "2024-06-01")
    ]
    out = stattests.ljung_box_daily(
        make_fact(spark, rows_a + rows_b), 7
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_days == 2 and r.dof == 0 and r.q_stat == 0.0


def _rows_for(client_days, start="2024-01-01"):
    t0 = dt.datetime.fromisoformat(f"{start}T10:00:00")
    rows, eid = [], 0
    for client, days in client_days.items():
        for d in days:
            eid += 1
            rows.append(
                (eid, (t0 + dt.timedelta(days=d)).isoformat(), client,
                 "dom", "Allowed", 0.1)
            )
    return rows


def test_survival_doubling_invariance(spark):
    """Client-doubled fact: n_risk/d/c exactly double, surv
    BIT-identical (each KM factor (2n−2d)/(2n) rounds to the same
    double as (n−d)/n)."""
    spec = {"c1": [0, 4], "c2": [0, 9], "c3": [1, 15], "c4": [19], "c5": [0]}
    fact = make_fact(spark, _rows_for(spec))
    doubled = fact.unionByName(
        fact.withColumn("client", F.concat(F.lit("x_"), F.col("client")))
    )
    base = {r.t_days: r for r in
            survival.kaplan_meier_clients(fact, 7).collect()}
    twox = {r.t_days: r for r in
            survival.kaplan_meier_clients(doubled, 7).collect()}
    assert sorted(base) == sorted(twox)
    for t, b in base.items():
        d = twox[t]
        assert (d.n_risk, d.n_events, d.n_censored) == (
            2 * b.n_risk, 2 * b.n_events, 2 * b.n_censored)
        assert d.surv == b.surv  # bitwise, after the shared round
