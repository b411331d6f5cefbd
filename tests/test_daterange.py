"""Date-range resolution (reference tests: test_db.py:115-131)."""

from __future__ import annotations

import datetime as dt

from piholelongtermstats_spark.sources.daterange import (
    date_range_epochs,
    resolve_timezone,
)

UTC = dt.timezone.utc


def test_exclusive_end():
    """end bound = end_date + 1 day at midnight (db.py:85)."""
    lo, hi = date_range_epochs("2024-01-01", "2024-01-31", timezone="UTC")
    assert lo == int(dt.datetime(2024, 1, 1, tzinfo=UTC).timestamp())
    assert hi == int(dt.datetime(2024, 2, 1, tzinfo=UTC).timestamp())


def test_days_lookback():
    now = dt.datetime(2024, 6, 15, 12, 0, tzinfo=UTC)
    lo, hi = date_range_epochs(days=7, timezone="UTC", now=now)
    assert hi == int(now.timestamp())
    assert hi - lo == 7 * 86400


def test_invalid_tz_falls_back_to_utc():
    """db.py:71-74."""
    tz = resolve_timezone("Not/AZone")
    assert str(tz) == "UTC"
    lo, hi = date_range_epochs("2024-01-01", "2024-01-01", timezone="Not/AZone")
    assert hi - lo == 86400


def test_non_utc_timezone():
    lo, _ = date_range_epochs("2024-01-01", "2024-01-02", timezone="Europe/Berlin")
    # Berlin midnight is 23:00 UTC the previous day (winter, UTC+1)
    assert lo == int(dt.datetime(2023, 12, 31, 23, 0, tzinfo=UTC).timestamp())
