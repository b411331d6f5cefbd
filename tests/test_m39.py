"""M39 — bootstrap / diversity / p95 heatmap property tests."""

from __future__ import annotations

import datetime as dt

from piholelongtermstats_spark.operators import behavior, resample, stattests
from tests.conftest import make_fact


def _day_rows(counts, start="2024-01-01"):
    t0 = dt.datetime.fromisoformat(f"{start}T10:00:00")
    rows, eid = [], 0
    for i, c in enumerate(counts):
        for j in range(c):
            eid += 1
            rows.append(
                (eid, (t0 + dt.timedelta(days=i, minutes=j)).isoformat(),
                 "c1", "d", "Allowed", 0.1)
            )
    return rows


def test_poisson_weights_pinned_distribution():
    """The pinned inverse-CDF thresholds reproduce Poisson(1) to the
    ppb grid: threshold gaps = e⁻¹/k! within 1 ppb rounding."""
    from math import exp, factorial

    prev = 0
    for k, t in enumerate(resample.POISSON1_CUM_PPB):
        want = exp(-1) / factorial(k) * 1e9
        assert abs((t - prev) - want) < 1.0, k
        prev = t


def test_bootstrap_ci_brackets_point_and_is_deterministic(spark):
    fact = make_fact(spark, _day_rows([5, 9, 3, 8, 6, 7, 4, 9, 5, 8,
                                       6, 7, 3, 9, 5, 8, 4, 7, 6, 9]))
    a = resample.bootstrap_daily_mean_ci(fact, 200).collect()[0]
    b = resample.bootstrap_daily_mean_ci(fact, 200).collect()[0]
    assert a == b  # deterministic: same seed -> same weights -> same CI
    assert a.n_days == 20
    assert a.lo_mean <= a.point_mean <= a.hi_mean
    assert a.n_resamples_eff == 200
    # interval is genuinely nondegenerate on a varying series
    assert a.lo_mean < a.hi_mean


def test_bootstrap_ci_tightens_on_constant_series(spark):
    """Every resample of a constant series has the same mean — the CI
    collapses to the point exactly."""
    fact = make_fact(spark, _day_rows([6] * 15))
    r = resample.bootstrap_daily_mean_ci(fact, 100).collect()[0]
    assert r.lo_mean == r.point_mean == r.hi_mean == 6.0


def test_bootstrap_seed_changes_resamples(spark):
    fact = make_fact(spark, _day_rows([5, 9, 3, 8, 6, 7, 4, 9, 5, 8]))
    a = resample.bootstrap_daily_mean_ci(fact, 200, seed="boot").collect()[0]
    c = resample.bootstrap_daily_mean_ci(fact, 200, seed="other").collect()[0]
    assert (a.lo_mean, a.hi_mean) != (c.lo_mean, c.hi_mean)


def test_simpson_separates_concentration_from_distinct_count(spark):
    """Two clients with the SAME distinct-domain count but opposite
    concentration: uniform client scores high, spiked client low."""
    t0 = dt.datetime.fromisoformat("2024-01-01T10:00:00")
    rows, eid = [], 0
    for i in range(40):  # uniform: 4 domains x 10
        eid += 1
        rows.append((eid, (t0 + dt.timedelta(minutes=eid)).isoformat(),
                     "uni", f"d{i % 4}", "Allowed", 0.1))
    for i in range(40):  # spiked: 37 hits on d0, one each on d1-d3
        eid += 1
        d = f"d{i - 36}" if i >= 37 else "d0"
        rows.append((eid, (t0 + dt.timedelta(minutes=eid)).isoformat(),
                     "spike", d, "Allowed", 0.1))
    fact = make_fact(spark, rows)
    got = {r.client: r for r in behavior.client_domain_simpson(fact, 10).collect()}
    assert got["uni"].n_domains == got["spike"].n_domains == 4
    # uniform: 1 - 4*(10/40)^2 = 0.75 exactly
    assert got["uni"].simpson_ppm == 750000
    # spiked: 1 - (37^2+3)/1600 = 0.1425
    assert got["spike"].simpson_ppm == 142500
    assert got["uni"].simpson_ppm > got["spike"].simpson_ppm


def test_p95_heatmap_nearest_rank_exact(spark):
    """20 replies in one cell: p95 rank = ceil(0.95*20) = 19 -> the
    19th smallest value; values 1..20 ms -> p95 = 19ms."""
    t0 = dt.datetime.fromisoformat("2024-01-01T10:00:00")
    rows = [
        (i + 1, (t0 + dt.timedelta(seconds=i)).isoformat(), "c", "d",
         "Allowed", (i + 1) / 1000.0)
        for i in range(20)
    ]
    fact = make_fact(spark, rows)
    got = stattests.reply_p95_heatmap(fact).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.n_replies, r.p95_q) == (20, 19)
    assert r.p95_ms == 0.019


# --- M43 additions (same family) ---------------------------------------------


def test_dq_panel_flags_injected_violations(spark):
    import datetime as dtm

    rows = [
        (1, dtm.datetime(2024, 1, 1, 10), 1, "view", 0.5, "d"),
        (1, dtm.datetime(2024, 1, 1, 11), 2, "click", 0.5, "d"),  # dup id
        (3, None, 3, "view", 0.5, "d"),                    # null ts
        (4, dtm.datetime(1999, 1, 1, 0), 4, "view", 0.5, "d"),  # out of range
        (5, dtm.datetime(2024, 1, 2, 10), None, "view", 0.5, "d"),  # null uid
        (6, dtm.datetime(2024, 1, 2, 11), 6, "weird", 0.5, "d"),  # bad type
        (7, dtm.datetime(2024, 1, 2, 12), 7, "view", -1.0, "d"),  # negative
    ]
    from piholelongtermstats_spark.operators import dq

    raw = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    got = {r.check_name: r for r in dq.dq_expectations_panel(raw).collect()}
    assert got["event_id_unique"].n_violations == 1
    assert got["ts_not_null"].n_violations == 1
    assert got["ts_in_range"].n_violations == 1
    assert got["user_id_not_null"].n_violations == 1
    assert got["event_type_known"].n_violations == 1
    assert got["value_nonnegative"].n_violations == 1
    assert got["event_id_not_null"].pass_flag == 1
    assert all(r.n_checked == 7 for r in got.values())


def test_twap_differs_from_mean_on_burst(spark):
    """9 fast replies in 9 seconds then one slow reply an hour later:
    the count mean is fast-dominated, the time-weighted mean is
    slow-value-free (the last event carries no interval) but weights
    the fast values by their tiny spans correctly."""
    import datetime as dtm

    from piholelongtermstats_spark.operators import timeagg

    t0 = dtm.datetime.fromisoformat("2024-01-01T10:00:00")
    rows = [
        (i + 1, (t0 + dtm.timedelta(seconds=i)).isoformat(), "c", "d",
         "Allowed", 0.001 * (i + 1))
        for i in range(9)
    ]
    rows.append((10, (t0 + dtm.timedelta(hours=1)).isoformat(), "c", "d",
                 "Allowed", 1.0))
    fact = make_fact(spark, rows)
    r = timeagg.twap_reply_daily(fact).collect()[0]
    assert r.n_replies == 10
    # mean over quantized values (1..9, 1000) = 1045/10
    assert r.mean_q == 104.5
    # twap: values 1..8 hold 1s each; value 9 holds 3600-8 = 3592s;
    # total span 3600s -> (36 + 9*3592)/3600 = 8.99 exactly
    assert r.twap_q == 8.99
    assert r.span_us == 3600 * 1000000


def test_bootstrap_median_integer_exact_and_bracketing(spark):
    fact = make_fact(spark, _day_rows([5, 9, 3, 8, 6, 7, 4, 9, 5, 8,
                                       6, 7, 3, 9, 5]))
    r = resample.bootstrap_daily_median_ci(fact, 200).collect()[0]
    assert isinstance(r.point_median, int)
    assert r.lo_median <= r.point_median <= r.hi_median
    assert r.n_resamples_eff == 200
    r2 = resample.bootstrap_daily_median_ci(fact, 200).collect()[0]
    assert r == r2
