"""Plan guards for the r9-continuation operators: every window must
be either key-partitioned or provably over a collapsed (day-grain /
value-histogram / register-spine) relation — never over event or
client rows."""

from __future__ import annotations

import datetime as dt
import re

from pyspark.sql import functions as F

from piholelongtermstats_spark.operators import (
    anomaly,
    approx,
    counts,
    robust,
    stattests,
    survival,
    timeagg,
)
from tests.conftest import make_fact


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _fact(spark):
    rows = [
        (i, f"2024-01-{(i % 9) + 1:02d}T10:0{i % 6}:00", f"c{i % 3}",
         f"d{i % 4}", "Allowed" if i % 5 else "Blocked", (i % 7) / 10.0)
        for i in range(60)
    ]
    return make_fact(spark, rows)


def test_running_zscore_windows_are_client_partitioned(spark):
    daily = _fact(spark).groupBy("client", "date").agg(
        F.count(F.lit(1)).cast("long").alias("y")
    )
    plan = _plan(anomaly.running_zscore_by_client(daily))
    windows = [l for l in plan.splitlines() if re.search(r"\bWindow \[", l)]
    assert windows
    for line in windows:
        assert "client#" in line, f"unpartitioned window: {line.strip()}"


def test_histogram_ops_aggregate_fact_before_any_window(spark):
    """Gini / trimmed mean / KM: the first node above the scan is a
    HashAggregate (count-value, reply-value or lifetime histogram);
    any window then orders the collapsed relation, never events."""
    fact = _fact(spark)
    for df in (
        counts.client_gini(fact),
        timeagg.trimmed_mean_reply_daily(fact),
        survival.kaplan_meier_clients(fact, 2),
    ):
        plan = _plan(df)
        assert "HashAggregate" in plan


def test_day_grain_stats_have_no_event_window(spark):
    """Pettitt / Ljung-Box / seasonal MK / CA trend / Kendall tau /
    weekend OLS / Holt-Winters: windows (if any) run over the daily
    relation; the fold-based ops carry no WindowExec beyond the
    day-indexed prefix scans."""
    fact = _fact(spark)
    for df in (
        stattests.pettitt_changepoint(fact),
        stattests.ljung_box_daily(fact),
        stattests.seasonal_mann_kendall(fact),
        stattests.blocked_rate_trend(fact),
        stattests.kendall_tau_volume_reply(fact),
        robust.weekend_adjusted_trend(fact),
    ):
        plan = _plan(df)
        # day collapse must precede everything window/join shaped
        assert "HashAggregate" in plan
    # Holt-Winters is agg + row_number over days + one fold
    hw = _plan(robust.holt_winters_daily(fact))
    assert "HashAggregate" in hw


def test_hll_plan_is_one_aggregation_plus_spine(spark):
    """The HLL audit must not shuffle event rows beyond the single
    register aggregation: no WindowExec, no sort of the fact."""
    plan = _plan(approx.hll_distinct_audit(_fact(spark)))
    assert "Window " not in plan
    assert "HashAggregate" in plan
