"""M47 — Kaplan–Meier survival, Pettitt changepoint, client Gini."""

from __future__ import annotations

import datetime as dt

from piholelongtermstats_spark.operators import counts, stattests, survival
from tests.conftest import make_fact


def _rows_for(client_days: dict[str, list[int]], start="2024-01-01"):
    """One event per (client, day-offset)."""
    t0 = dt.datetime.fromisoformat(f"{start}T10:00:00")
    rows, eid = [], 0
    for client, days in client_days.items():
        for d in days:
            eid += 1
            rows.append(
                (
                    eid,
                    (t0 + dt.timedelta(days=d)).isoformat(),
                    client,
                    "dom",
                    "Allowed",
                    0.1,
                )
            )
    return rows


def test_kaplan_meier_hand_curve(spark):
    """5 clients, window ends 2024-01-20 (g_end), horizon 7:

    c1 days 0-4   -> t=4,  last 15d before end  -> churn observed
    c2 days 0-9   -> t=9,  last 10d before end  -> churn observed
    c3 days 1-15  -> t=14, last 4d before end   -> censored
    c4 day 19     -> t=0,  last 0d before end   -> censored
    c5 day 0      -> t=0,  last 19d before end  -> churn observed

    KM: surv(0)=4/5=0.8, surv(4)=0.8*(2/3), surv(9)=...*(1/2),
    surv(14) unchanged (censor-only time).
    """
    fact = make_fact(
        spark,
        _rows_for(
            {
                "c1": [0, 4],
                "c2": [0, 9],
                "c3": [1, 15],
                "c4": [19],
                "c5": [0],
            }
        ),
    )
    out = {
        r.t_days: r
        for r in survival.kaplan_meier_clients(fact, 7).collect()
    }
    assert sorted(out) == [0, 4, 9, 14]
    assert (out[0].n_risk, out[0].n_events, out[0].n_censored) == (5, 1, 1)
    assert (out[4].n_risk, out[4].n_events) == (3, 1)
    assert (out[9].n_risk, out[9].n_events) == (2, 1)
    assert (out[14].n_risk, out[14].n_events, out[14].n_censored) == (1, 0, 1)
    assert abs(out[0].surv - 0.8) < 1e-9
    assert abs(out[4].surv - 0.8 * (2 / 3)) < 1e-6
    assert abs(out[9].surv - 0.8 * (2 / 3) * 0.5) < 1e-6
    assert out[14].surv == out[9].surv  # censoring never drops the curve


def test_kaplan_meier_monotone_and_bounded(spark):
    fact = make_fact(
        spark,
        _rows_for({f"c{i}": list(range(0, i + 1)) for i in range(12)}),
    )
    rows = survival.kaplan_meier_clients(fact, 3).collect()
    survs = [r.surv for r in sorted(rows, key=lambda r: r.t_days)]
    assert all(0.0 <= s <= 1.0 for s in survs)
    assert all(a >= b for a, b in zip(survs, survs[1:]))


def _day_counts(counts_list, start="2024-01-01"):
    t0 = dt.datetime.fromisoformat(f"{start}T10:00:00")
    rows, eid = [], 0
    for i, c in enumerate(counts_list):
        for j in range(c):
            eid += 1
            rows.append(
                (
                    eid,
                    (t0 + dt.timedelta(days=i, minutes=j)).isoformat(),
                    "c1",
                    "dom",
                    "Allowed",
                    0.1,
                )
            )
    return rows


def test_pettitt_level_shift(spark):
    """10 days at 5 then 10 days at 20: the changepoint is the LAST
    day of the first segment with U = -(10*10) (all 100 cross-segment
    signs are -1)."""
    fact = make_fact(spark, _day_counts([5] * 10 + [20] * 10))
    row = stattests.pettitt_changepoint(fact).collect()[0]
    assert row.n_days == 20
    assert row.change_date == dt.datetime(2024, 1, 10)
    assert row.u_at_k == -100
    assert row.k_stat == 100
    assert row.p_approx < 0.01


def test_pettitt_constant_series_null_result(spark):
    """All-equal days: every U_t = 0 -> K = 0, p saturates at 1.0,
    argmax tie pinned to the first date."""
    fact = make_fact(spark, _day_counts([7] * 8))
    row = stattests.pettitt_changepoint(fact).collect()[0]
    assert row.k_stat == 0
    assert row.p_approx == 1.0
    assert row.change_date == dt.datetime(2024, 1, 1)


def test_gini_equal_counts_is_zero(spark):
    fact = make_fact(
        spark, _rows_for({f"c{i}": [0, 1, 2] for i in range(4)})
    )
    row = counts.client_gini(fact).collect()[0]
    assert (row.n_clients, row.total_events) == (4, 12)
    assert row.gini_ppm == 0
    assert row.gini == 0.0


def test_gini_hand_value(spark):
    """Counts (1,1,2,4): sorted ranks give sum(i*x) = 25, so
    G = (2*25 - 5*8) / (4*8) = 10/32 = 0.3125."""
    fact = make_fact(
        spark,
        _rows_for(
            {"a": [0], "b": [1], "c": [0, 1], "d": [0, 1, 2, 3]}
        ),
    )
    row = counts.client_gini(fact).collect()[0]
    assert (row.n_clients, row.total_events) == (4, 8)
    assert row.gini_ppm == 312500
    assert abs(row.gini - 0.3125) < 1e-12


def test_gini_matches_direct_formula(spark):
    """Histogram closed form == direct sorted-rank formula on an
    arbitrary mixed-tie fixture."""
    sizes = [1, 3, 3, 7, 2, 2, 2, 9, 1, 5]
    fact = make_fact(
        spark,
        _rows_for(
            {f"c{i}": list(range(s)) for i, s in enumerate(sizes)}
        ),
    )
    row = counts.client_gini(fact).collect()[0]
    xs = sorted(sizes)
    n, s = len(xs), sum(xs)
    t_rank = sum((i + 1) * x for i, x in enumerate(xs))
    num, den = 2 * t_rank - (n + 1) * s, n * s
    assert row.gini_ppm == num * 1_000_000 // den
    assert abs(row.gini - num / den) < 1e-12
