"""Date-range resolution — (start, end) or lookback-days → epoch bounds.

Reference: ``get_date_range_epochs`` (piholelongtermstats/db.py:69-108).
Contracts preserved (tested at tests/test_db.py:115-131 in the
reference):

- end date is EXCLUSIVE: callers pass a calendar end date and the bound
  is end + 1 day at local midnight (db.py:85);
- invalid timezone names fall back to UTC with a warning (db.py:71-74);
- ``days`` lookback means [now - days, now].

This is a driver-side helper producing literal bounds (SURVEY.md §2.1
S7); the resulting predicate is pushed into the parquet scan by
Catalyst (partition pruning when the table is date-partitioned).
"""

from __future__ import annotations

import logging
from datetime import datetime, timedelta
from zoneinfo import ZoneInfo, ZoneInfoNotFoundError

logger = logging.getLogger(__name__)


def resolve_timezone(tz_name: str | None) -> ZoneInfo:
    """Timezone lookup with UTC fallback (db.py:71-74)."""
    if not tz_name:
        return ZoneInfo("UTC")
    try:
        return ZoneInfo(tz_name)
    except (ZoneInfoNotFoundError, ValueError, KeyError):
        logger.warning("Unknown timezone %r; falling back to UTC", tz_name)
        return ZoneInfo("UTC")


def date_range_epochs(
    start_date: str | None = None,
    end_date: str | None = None,
    days: int | None = None,
    timezone: str | None = None,
    now: datetime | None = None,
) -> tuple[int, int]:
    """Return (start_epoch, end_epoch) unix seconds, end EXCLUSIVE.

    ``start_date``/``end_date`` are 'YYYY-MM-DD' in the given timezone;
    the end bound is end_date + 1 day at local midnight (db.py:85).
    With ``days``, the window is [now - days, now] (db.py:88-95).
    """
    tz = resolve_timezone(timezone)
    if start_date and end_date:
        start = datetime.strptime(start_date, "%Y-%m-%d").replace(tzinfo=tz)
        end = datetime.strptime(end_date, "%Y-%m-%d").replace(tzinfo=tz) + timedelta(
            days=1
        )
    else:
        now = now or datetime.now(tz)
        end = now
        start = now - timedelta(days=days if days is not None else 31)
    return int(start.timestamp()), int(end.timestamp())
