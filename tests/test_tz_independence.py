"""Driver-OS-timezone independence of the S4 range-scan bounds
(ADVICE r3): a naive-datetime literal is converted through the driver
OS local timezone, so on a non-UTC host the timestamp/timestamp_ntz
filter bounds would shift by the OS offset. dns_fact builds bounds
from UTC epoch micros (timestamp_micros) instead — this test runs the
same range scan in a subprocess with TZ=America/New_York and asserts
the row count matches DuckDB's (TZ-independent) answer."""

from __future__ import annotations

import os
import subprocess
import sys

import duckdb

SF = "/root/testdata/sf0.001"
LO = "2024-01-05 00:00:00"
HI = "2024-01-12 00:00:00"

_CHILD = f"""
import datetime as dt
from piholelongtermstats_spark.session import get_spark
from piholelongtermstats_spark.sources.events import dns_fact
spark = get_spark("phlts-tz-test", cpus=2, shuffle_partitions=2)
lo = dt.datetime.fromisoformat("{LO}")
hi = dt.datetime.fromisoformat("{HI}")
print("COUNT=" + str(dns_fact(spark, "{SF}", lo=lo, hi=hi).count()))
spark.stop()
"""


def test_range_bounds_survive_nonutc_driver_tz():
    expected = duckdb.sql(
        f"SELECT count(*) FROM '{SF}/events.parquet' "
        f"WHERE ts >= TIMESTAMP '{LO}' AND ts < TIMESTAMP '{HI}'"
    ).fetchone()[0]
    env = dict(os.environ, TZ="America/New_York")
    out = subprocess.run(
        [sys.executable, "-c", _CHILD],
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    counts = [l for l in out.stdout.splitlines() if l.startswith("COUNT=")]
    assert counts, out.stderr[-2000:]
    assert int(counts[0].removeprefix("COUNT=")) == expected
