"""Top-level user API — the reference's load→process→serve flow.

Reference: ``load_and_process_data`` + the layout/reload callbacks
(app.py:120-197, 1056-1104). A reference user drives everything with
(db paths | parquet dir, date range or lookback days, timezone,
exclusion patterns) and gets back the stats dict plus the plot-data
frames; the reload button is a parameterized re-run (SURVEY §3.2).
This module is that same contract on the Spark engine:

    result = run_dashboard(spark, parquet_dir="/data/events",
                           days=31, timezone="Europe/Berlin",
                           exclude_patterns=[r"ads\\."])
    result["stats"]              # ~60-scalar dict (§2.11 contract 1)
    result["plot_data"]          # 10 pandas frames (§2.11 contract 2)
    result["hourly_agg"]         # resident rollup DataFrame (serve path)

Time-range bounds resolve driver-side (sources/daterange.py, the S7
exclusive-end contract) and are applied in the RAW storage domain so
they reach the parquet scan (sources/events.py). The enriched fact is
persisted once per run — every downstream consumer shares it.
"""

from __future__ import annotations

import datetime as dt
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from piholelongtermstats_spark.functions.exclude import exclude_domains
from piholelongtermstats_spark.operators import plotdata, stats
from piholelongtermstats_spark.session import ensure_session_defaults
from piholelongtermstats_spark.sources.daterange import date_range_epochs
from piholelongtermstats_spark.sources.events import dns_fact


def run_dashboard(
    spark: SparkSession,
    parquet_dir: str,
    start_date: str | None = None,
    end_date: str | None = None,
    days: int | None = None,
    timezone: str | None = None,
    exclude_patterns: list[str] | None = None,
    collect_plots: bool = True,
) -> dict[str, Any]:
    """One parameterized run: range-scan → exclude → enrich → stats +
    plot frames + resident rollup. Re-invoking with new parameters IS
    the reload (app.py:1056-1104) — no engine state to reset beyond
    unpersisting the returned fact."""
    ensure_session_defaults(spark)

    lo = hi = None
    if (start_date and end_date) or days is not None:
        lo_s, hi_s = date_range_epochs(start_date, end_date, days, timezone)
        lo = dt.datetime.fromtimestamp(lo_s, dt.timezone.utc)
        hi = dt.datetime.fromtimestamp(hi_s, dt.timezone.utc)

    fact = dns_fact(spark, parquet_dir, lo=lo, hi=hi)
    fact = exclude_domains(fact, exclude_patterns)
    fact = fact.persist()

    frames = plotdata.generate_plot_data(fact)
    rollup = plotdata.hourly_agg(fact)
    return {
        "stats": stats.compute_stats(fact, timezone or "UTC"),
        "plot_data": plotdata.to_payload(frames) if collect_plots else frames,
        "hourly_agg": rollup,
        "fact": fact,
    }


def reload(spark: SparkSession, previous: dict[str, Any], **params) -> dict[str, Any]:
    """Reference reload semantics: drop the old working set, re-run
    with new parameters."""
    old: DataFrame | None = previous.get("fact")
    if old is not None:
        old.unpersist()
    return run_dashboard(spark, **params)
