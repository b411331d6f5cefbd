"""Shared fixtures. Test strategy mirrors the reference's
(SURVEY.md §5): deterministic synthetic frames with exact-value
assertions on constructed edge cases, plus differential tests against
DuckDB that the reference never had."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import SparkSession

from piholelongtermstats_spark.session import get_spark

UTC = dt.timezone.utc


@pytest.fixture(scope="session")
def spark() -> SparkSession:
    s = get_spark("phlts-tests", cpus=4, shuffle_partitions=4)
    yield s


def make_fact(spark: SparkSession, rows: list[tuple]) -> "DataFrame":  # noqa: F821
    """Build an enriched fact frame from (event_id, ts_iso, client,
    domain, status_type, reply_time) tuples — the canonical shape
    produced by sources/events.dns_fact."""
    from pyspark.sql import functions as F

    from piholelongtermstats_spark.functions.derive import enrich_time

    df = spark.createDataFrame(
        [
            (i, dt.datetime.fromisoformat(ts), c, d, st, rt)
            for (i, ts, c, d, st, rt) in rows
        ],
        "event_id long, ts timestamp, client string, domain string, "
        "status_type string, reply_time double",
    )
    return enrich_time(df, "ts")
