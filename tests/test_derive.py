"""Derived-column semantics (reference tests: test_process.py:141-204)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from piholelongtermstats_spark.functions.derive import (
    ALLOWED_STATUSES,
    BLOCKED_STATUSES,
    preprocess,
)


def test_status_type_buckets(spark):
    """Mask equivalence for all enum values incl. 'Other'
    (test_process.py:141-155, test_stats.py:395-418)."""
    rows = [(i, 1_700_000_000 + i, 1, s, "d.com", "192.168.1.2", 0.5)
            for i, s in enumerate(list(range(19)) + [99])]
    df = spark.createDataFrame(
        rows, "id long, timestamp long, type int, status int, domain string, "
        "client string, reply_time double")
    got = {r["status"]: r["status_type"] for r in preprocess(df).collect()}
    for s in ALLOWED_STATUSES:
        assert got[s] == "Allowed"
    for s in BLOCKED_STATUSES:
        assert got[s] == "Blocked"
    assert got[0] == "Other"
    assert got[99] == "Other"


def test_day_night_boundary(spark):
    """Day = [6,24) rule at hours 5/6/23/0 (process.py:64,
    test_process.py:157-169)."""
    base = int(dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc).timestamp())
    rows = [(h, base + h * 3600, 1, 2, "d", "c", 0.1) for h in (0, 5, 6, 23)]
    df = spark.createDataFrame(
        rows, "id long, timestamp long, type int, status int, domain string, "
        "client string, reply_time double")
    got = {r["hour"]: r["day_period"] for r in preprocess(df).collect()}
    assert got[0] == "Night"
    assert got[5] == "Night"
    assert got[6] == "Day"
    assert got[23] == "Day"


def test_time_derivations(spark):
    """date normalization, hour extract, weekday name (process.py:60-79)."""
    ts = int(dt.datetime(2024, 1, 3, 15, 30, 45, tzinfo=dt.timezone.utc).timestamp())
    df = spark.createDataFrame(
        [(1, ts, 1, 2, "d", "c", 0.1)],
        "id long, timestamp long, type int, status int, domain string, "
        "client string, reply_time double")
    row = preprocess(df).collect()[0]
    assert row["date"] == dt.datetime(2024, 1, 3, 0, 0)
    assert row["hour"] == 15
    assert row["day_name"] == "Wednesday"  # 2024-01-03 was a Wednesday


def test_reply_time_coercion(spark):
    """try_cast semantics ≡ pd.to_numeric(errors='coerce')
    (process.py:80)."""
    df = spark.createDataFrame(
        [(1, 1_700_000_000, 1, 2, "d", "c", "0.5"),
         (2, 1_700_000_001, 1, 2, "d", "c", "garbage"),
         (3, 1_700_000_002, 1, 2, "d", "c", None)],
        "id long, timestamp long, type int, status int, domain string, "
        "client string, reply_time string")
    got = {r["id"]: r["reply_time"] for r in preprocess(df).collect()}
    assert got[1] == 0.5
    assert got[2] is None
    assert got[3] is None
