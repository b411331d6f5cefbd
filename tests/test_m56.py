"""M56 — weekend-adjusted OLS, prequential-z doubling proof."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from piholelongtermstats_spark.operators import anomaly, robust
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


def test_weekend_ols_recovers_exact_coefficients(spark):
    """y = 100 + 3t + 25·is_weekend exactly: the normal equations
    have the integer solution, so the fit is EXACT (2024-01-01 is a
    Monday; weekend = Sat/Sun = t%7 in {5, 6})."""
    counts = [100 + 3 * t + (25 if t % 7 in (5, 6) else 0) for t in range(21)]
    fact = make_fact(spark, _day_counts(counts))
    r = robust.weekend_adjusted_trend(fact).collect()[0]
    assert r.n_days == 21
    assert (r.intercept, r.slope_per_day, r.weekend_effect) == (
        100.0, 3.0, 25.0)


def test_weekend_ols_removes_omitted_variable_bias(spark):
    """A pure weekend bump with NO trend: the plain OLS slope over a
    window starting Monday is nonzero (the bump loads onto t), the
    adjusted slope is exactly 0."""
    counts = [10 + (40 if t % 7 in (5, 6) else 0) for t in range(14)]
    fact = make_fact(spark, _day_counts(counts))
    adj = robust.weekend_adjusted_trend(fact).collect()[0]
    assert adj.slope_per_day == 0.0
    assert adj.weekend_effect == 40.0
    from piholelongtermstats_spark.operators import timeagg

    plain = timeagg.daily_trend(fact).collect()[0]
    assert abs(plain.slope) > 0.5


def test_weekend_ols_no_contrast_is_null(spark):
    """A 5-weekday-only window has Σw = 0 -> singular design ->
    NULL coefficients (never a fabricated weekend effect)."""
    counts = [10, 12, 14, 16, 18]  # Mon-Fri from 2024-01-01
    fact = make_fact(spark, _day_counts(counts))
    r = robust.weekend_adjusted_trend(fact).collect()[0]
    assert r.weekend_effect is None and r.slope_per_day is None


def test_zscore_doubling_invariance(spark):
    """Client-doubled daily relation: each copy's scores are
    bit-identical to the base run and row volume exactly doubles."""
    rows = [("c1", f"2024-01-{d:02d}", v) for d, v in
            zip(range(1, 9), [4, 7, 5, 6, 30, 6, 5, 90])]
    daily = spark.createDataFrame(
        [(c, dt.datetime.fromisoformat(d), y) for c, d, y in rows],
        "client string, date timestamp, y long",
    )
    doubled = daily.unionByName(
        daily.withColumn("client", F.concat(F.lit("x_"), F.col("client")))
    )
    base = {(r.date, r.y): (r.z, r.is_spike) for r in
            anomaly.running_zscore_by_client(daily).collect()}
    two = anomaly.running_zscore_by_client(doubled).collect()
    assert len(two) == 2 * len(base)
    for r in two:
        assert base[(r.date, r.y)] == (r.z, r.is_spike)
