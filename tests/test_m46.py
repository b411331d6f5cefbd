"""M46 — seasonal-adjusted outliers, windowed funnel, spike
contribution, temporal drift."""

from __future__ import annotations

import datetime as dt

from piholelongtermstats_spark.operators import behavior, journey, robust, stattests
from tests.conftest import make_fact

RAW_SCHEMA = "event_id long, ts timestamp, user_id long, event_type string"


def _day_rows(counts, start="2024-01-01", domain="d"):
    t0 = dt.datetime.fromisoformat(f"{start}T10:00:00")
    rows, eid = [], 0
    for i, c in enumerate(counts):
        for j in range(c):
            eid += 1
            rows.append(
                (eid, (t0 + dt.timedelta(days=i, minutes=j)).isoformat(),
                 "c1", domain, "Allowed", 0.1)
            )
    return rows


def test_seasonal_adjustment_unflags_weekly_cycle(spark):
    """A strong pure weekly cycle with ONE genuinely anomalous day:
    the raw MAD gate flags the (normal) weekly peaks; the adjusted
    gate flags ONLY the anomaly."""
    pattern = [5, 5, 5, 5, 5, 30, 30]  # busy weekends
    counts = pattern * 4
    counts[16] = 60  # a genuinely anomalous midweek day
    fact = make_fact(spark, _day_rows(counts))
    adj = {r.date.day + (r.date.month - 1) * 31: r.is_outlier
           for r in robust.seasonal_adjusted_outliers(fact).collect()}
    raw = {r.date.day + (r.date.month - 1) * 31: r.is_outlier
           for r in robust.mad_outlier_days(fact).collect()}
    # raw gate: weekend days (count 30) flagged vs median 5
    assert sum(raw.values()) > 4
    # adjusted gate: day 17 (index 16) flagged
    assert adj[17] == 1
    # the adjusted gate flags far fewer days than the raw gate
    assert sum(adj.values()) < sum(raw.values())


def _raw(spark, rows):
    return spark.createDataFrame(
        [(i, dt.datetime.fromisoformat(ts), u, t) for i, ts, u, t in rows],
        RAW_SCHEMA,
    )


def test_windowed_funnel_enforces_budget(spark):
    rows = [
        (1, "2024-01-01T10:00:00", 1, "view"),
        (2, "2024-01-01T10:10:00", 1, "click"),     # within 30m
        (3, "2024-01-01T12:00:00", 1, "purchase"),  # 110m after click: out
        (4, "2024-01-01T10:00:00", 2, "view"),
        (5, "2024-01-01T11:00:00", 2, "click"),     # 60m after view: out
    ]
    r = journey.funnel_windowed(_raw(spark, rows), within_minutes=30).collect()[0]
    assert (r.n_step1, r.n_step2, r.n_step3) == (2, 1, 0)


def test_windowed_funnel_huge_budget_reproduces_unwindowed(spark):
    import __spark_entry__ as se
    from piholelongtermstats_spark.plans.cache import shared_input
    from piholelongtermstats_spark.sources.events import raw_event_stream

    sf = "/root/testdata/sf0.001"
    raw = shared_input(
        spark, "raw_events", sf, lambda: raw_event_stream(spark, sf)
    )
    wide = journey.funnel_windowed(raw, within_minutes=10**7).collect()[0]
    plain = journey.funnel_conversion(raw).collect()[0]
    assert wide == plain
    # and the 30m budget can only shrink stage counts
    tight = se.queries()["funnel_windowed"](spark, sf).collect()[0]
    assert tight.n_step1 == plain.n_step1
    assert tight.n_step2 <= plain.n_step2
    assert tight.n_step3 <= plain.n_step3


def test_spike_contribution_decomposes_delta(spark):
    """surge.com alone drives the spike day; shares are signed ppm and
    per-domain deltas sum to the total."""
    t0 = dt.datetime.fromisoformat("2024-01-01T10:00:00")
    rows, eid = [], 0
    for day in range(6):
        for j in range(10):  # steady baseline
            eid += 1
            rows.append((eid, (t0 + dt.timedelta(days=day, minutes=j)).isoformat(),
                         "c", "steady.com", "Allowed", 0.1))
        if day == 3:  # the spike day
            for j in range(40):
                eid += 1
                rows.append((eid, (t0 + dt.timedelta(days=day, minutes=60 + j)).isoformat(),
                             "c", "surge.com", "Allowed", 0.1))
    fact = make_fact(spark, rows)
    got = behavior.spike_contribution(fact, 10).collect()
    assert got[0].spike_date == dt.datetime.fromisoformat("2024-01-04T00:00:00")
    assert got[0].total_delta == 40
    assert got[0].domain == "surge.com"
    assert (got[0].cnt_before, got[0].cnt_after, got[0].delta) == (0, 40, 40)
    assert got[0].share_ppm == 1000000
    assert sum(r.delta for r in got) == 40  # exact decomposition


def test_drift_chi2_zero_on_identical_halves(spark):
    """Identical reply distributions in both halves -> every bucket
    balances exactly (cross-multiplied numerators are 0) -> chi2 = 0."""
    t0 = dt.datetime.fromisoformat("2024-01-01T10:00:00")
    rows, eid = [], 0
    for day in range(10):
        for j in range(20):
            eid += 1
            rows.append((eid, (t0 + dt.timedelta(days=day, minutes=j)).isoformat(),
                         "c", "d", "Allowed", (j % 5 + 1) / 1000.0))
    fact = make_fact(spark, rows)
    r = stattests.reply_drift_chi2(fact).collect()[0]
    # mid = d0 + 4: halves are days 0-3 (80 rows) and 4-9 (120 rows);
    # per-value proportions are still identical, so chi2 is exactly 0
    assert (r.n_first, r.n_second) == (80, 120)
    assert r.chi2 == 0.0


def test_drift_chi2_detects_shift(spark):
    """Second half 10x slower: chi2 large."""
    t0 = dt.datetime.fromisoformat("2024-01-01T10:00:00")
    rows, eid = [], 0
    for day in range(10):
        mult = 1 if day < 5 else 10
        for j in range(20):
            eid += 1
            rows.append((eid, (t0 + dt.timedelta(days=day, minutes=j)).isoformat(),
                         "c", "d", "Allowed", mult * (j % 5 + 1) / 1000.0))
    fact = make_fact(spark, rows)
    r = stattests.reply_drift_chi2(fact).collect()[0]
    assert r.chi2 > 50.0
