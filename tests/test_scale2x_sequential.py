"""Sequential-tier doubling proofs (r4 VERDICT #6): the stitched
order-dependent operators executed at 2× fact volume must (a) match
their exact DuckDB oracles — covered by tests/test_oracle_parity.py
like every registry entry — and (b) execute with ZERO spill and NO
unpartitioned window over fact-scale rows. The only SinglePartition
stages allowed are the documented tiny-summary stitches (≤2 rows per
date/month — operators/sequential.py), so the blanket no-spill check
plus the fact-window shape check together are the local signals the
plan survives 100×."""

from __future__ import annotations

import re

from piholelongtermstats_spark.plans import QUERIES
from piholelongtermstats_spark.plans.metrics import executed_plan_metrics

SF = "/root/testdata/sf0.001"


def _run(spark, name):
    df = QUERIES[name](spark, SF)
    rows = df.collect()
    return df, rows


def _formatted(df) -> str:
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_streaks_scale_2x_zero_spill_no_fact_window(spark):
    df, rows = _run(spark, "streaks_scale_2x")
    m = executed_plan_metrics(df)
    assert m.get("spillSize", 0) == 0, m
    # every window over (ts, event_id) fact rows carries a partition
    # column (same shape checks the single-volume entry pins in
    # test_plan_properties / test_round2_fixes): no window ordered by
    # raw ts first, and the only unpartitioned window orders the
    # month-reduced sequence, never the per-date one
    plan = _formatted(df)
    assert not re.findall(r"Window \[[^\]]*windowspecdefinition\(ts#", plan), plan
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    assert not re.findall(r"windowspecdefinition\(_d#\d+L? ASC", opt), opt
    # doubling sanity: every streak on the doubled input is at least
    # as long as the single-input answer (a junction merge can only
    # lengthen a run, never shorten it)
    single = {
        r["status_type"]: r["streak_len"]
        for r in QUERIES["longest_streaks"](spark, SF).collect()
    }
    doubled = {r["status_type"]: r["streak_len"] for r in rows}
    assert set(doubled) == set(single)
    for st, n in doubled.items():
        assert n >= single[st], (st, n, single[st])


def test_gaps_scale_2x_zero_spill_junction_gap_first(spark):
    df, rows = _run(spark, "gaps_scale_2x")
    m = executed_plan_metrics(df)
    assert m.get("spillSize", 0) == 0, m
    # the 64-day shift minus the ~30-day span leaves the junction as
    # the single largest gap — and it must be > every within-half gap
    assert rows[0]["gap_us"] > rows[1]["gap_us"]
    assert rows[0]["gap_us"] > 30 * 86400 * 1_000_000  # > 30 days


def test_sessions_scale_2x_zero_spill_sessions_double(spark):
    df, rows = _run(spark, "sessions_scale_2x")
    m = executed_plan_metrics(df)
    assert m.get("spillSize", 0) == 0, m
    plan = _formatted(df)
    assert "SinglePartition" not in plan, plan  # per-client throughout
    # exact doubling identity: a 64-day shift can never bridge a
    # 30-minute session gap, so every client's session count doubles
    single = {
        r["client"]: r["n_sessions"]
        for r in QUERIES["session_summary"](spark, SF).collect()
    }
    doubled = {r["client"]: r["n_sessions"] for r in rows}
    assert doubled == {c: 2 * n for c, n in single.items()}
