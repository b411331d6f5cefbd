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


def test_dst_spring_forward_day_is_23_hours():
    """America/New_York 2024-03-10: the local day loses an hour; the
    exclusive-end window [Mar 10, Mar 11) must span 23h of epoch time
    (naive 24h arithmetic would over-count — db.py's local-midnight
    contract, hard part 3 in SURVEY §7)."""
    lo, hi = date_range_epochs("2024-03-10", "2024-03-10", timezone="America/New_York")
    assert hi - lo == 23 * 3600


def test_dst_fall_back_day_is_25_hours():
    """America/New_York 2024-11-03 gains an hour: 25h span."""
    lo, hi = date_range_epochs("2024-11-03", "2024-11-03", timezone="America/New_York")
    assert hi - lo == 25 * 3600


def test_utc_day_is_24_hours_always():
    lo, hi = date_range_epochs("2024-03-10", "2024-03-10", timezone="UTC")
    assert hi - lo == 24 * 3600
