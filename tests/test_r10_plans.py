"""Plan guards for the r10 operators: the k-group statistics must be
single-aggregate plans (no windows over event rows, no joins), the
periodogram must stay windowless, the fixed-point PageRank must keep
the float variant's join-per-iteration shape, and the restructured
set-similarity prefix build must carry its df window PARTITIONED BY
shingle (never unpartitioned)."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from piholelongtermstats_spark.operators import dedup, graph, setsim, stattests
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


def test_kgroup_stats_are_single_aggregate_no_window(spark):
    """ANOVA / Cramér's V / effect panel: one map-side-combined
    aggregate, a scalar projection, nothing else — no WindowExec, no
    join of any kind."""
    fact = _fact(spark)
    for df in (
        stattests.weekday_anova_reply(fact),
        stattests.weekday_status_cramers_v(fact),
        stattests.day_night_effect_panel(fact),
    ):
        plan = _plan(df)
        assert "HashAggregate" in plan
        assert "Window " not in plan
        assert "Join" not in plan, plan


def test_kruskal_window_orders_value_histogram_only(spark):
    """KW's only window runs over the DISTINCT reply-value histogram
    (the histogram-window class) — above a HashAggregate, never over
    event rows."""
    plan = _plan(stattests.kruskal_wallis_weekday(_fact(spark)))
    windows = [l for l in plan.splitlines() if re.search(r"\bWindow \[", l)]
    assert len(windows) == 1
    # the window input is the value histogram: the plan below the
    # window must contain the value-grouping aggregate
    assert "HashAggregate" in plan


def test_periodogram_is_windowless(spark):
    plan = _plan(stattests.weekly_periodogram(_fact(spark)))
    assert "Window " not in plan
    assert "HashAggregate" in plan


def test_pagerank_fixedpoint_collects_nothing_but_n(spark):
    """The fixed-point twin keeps the float plan shape: per iteration
    one edges⋈ranks join + one dst aggregate; the returned frame is
    checkpoint-backed (lineage truncated), never a local relation
    wider than the top-k."""
    df = graph.pagerank_fixedpoint(_fact(spark), n_iter=3, top=5)
    rows = df.collect()
    assert len(rows) <= 5
    assert df.schema.simpleString() == "struct<node:string,rank_ppt:bigint>"


def test_setsim_df_window_is_shingle_partitioned(spark):
    """The r10 prefix build computes df with count() OVER (PARTITION
    BY shingle): the window must be keyed (no 'No Partition Defined'
    class), and the full pipeline must stay cartesian-free."""
    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon zeta " + ("x" * (i % 3)))
         for i in range(8)],
        "doc_id long, text string",
    )
    sh = dedup.shingles(docs)
    pref = setsim._prefixes(sh, 4, 5)
    plan = _plan(pref)
    windows = [l for l in plan.splitlines() if re.search(r"\bWindow \[", l)]
    assert windows
    # every window keyed (the shingle-builder's lead() runs per
    # doc_id; the df count per shingle) — none unpartitioned
    for line in windows:
        assert re.search(
            r"windowspecdefinition\((doc_id|shingle)#", line
        ), f"unpartitioned window: {line.strip()}"
    assert any(
        "windowspecdefinition(shingle#" in line for line in windows
    ), "df window not partitioned by shingle"
    full = setsim.prefix_filter_pairs(sh, 4, 5)
    assert "Cartesian" not in _plan(full)
