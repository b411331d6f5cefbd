"""Sliding-window counts: stream == batch parity, window-assignment
rule, and late-event eviction behavior."""

from __future__ import annotations

import datetime as dt

from piholelongtermstats_spark.streaming.rollup import STREAM_SCHEMA
from piholelongtermstats_spark.streaming.sliding import (
    sliding_busiest,
    start_sliding_to_memory,
)
from tests.conftest import make_fact


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, STREAM_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def test_event_is_assigned_to_exactly_six_windows(spark):
    rows = [(1, "2024-01-01T10:03:27", "c1", "d", "Allowed", 0.1)]
    got = sliding_busiest(make_fact(spark, rows), k=100).collect()
    starts = sorted(r.window_start for r in got)
    assert len(starts) == 6
    # grid: floor to 10:00, then every -5min back to 09:35 exclusive
    want = [
        dt.datetime.fromisoformat(f"2024-01-01T{h}")
        for h in ("09:35:00", "09:40:00", "09:45:00", "09:50:00",
                  "09:55:00", "10:00:00")
    ]
    assert starts == want
    assert all(r.cnt == 1 for r in got)


def test_stream_equals_batch(spark, tmp_path):
    src = str(tmp_path / "sliding_src")
    t0 = dt.datetime.fromisoformat("2024-01-01T10:00:00")
    rows = [
        (1, t0, "c1", "d", "Allowed", 0.1),
        (2, t0 + dt.timedelta(minutes=7), "c1", "d", "Allowed", 0.1),
        (3, t0 + dt.timedelta(minutes=29), "c1", "d", "Blocked", 0.1),
        (4, t0 + dt.timedelta(minutes=3), "c2", "d", "Allowed", 0.1),
        (5, t0 + dt.timedelta(hours=3), "c2", "d", "Allowed", 0.1),
    ]
    _write_batch(spark, src, rows)
    q = start_sliding_to_memory(spark, src, "sliding_t1")
    q.awaitTermination(60)
    stream = {
        (r.client, r.window_start): r.cnt
        for r in spark.sql("SELECT * FROM sliding_t1").collect()
    }
    batch_rows = [
        (i, ts.isoformat(), c, d, s, rt) for (i, ts, c, d, s, rt) in rows
    ]
    batch = {
        (r.client, r.window_start): r.cnt
        for r in sliding_busiest(make_fact(spark, batch_rows), k=1000).collect()
    }
    assert stream == batch


def test_busiest_cell_tiebreak(spark):
    # Two events 7 min apart share 5 windows (cnt=2 cells); the
    # busiest cell sorts by (cnt desc, client, window_start).
    rows = [
        (1, "2024-01-01T10:00:00", "c1", "d", "Allowed", 0.1),
        (2, "2024-01-01T10:07:00", "c1", "d", "Allowed", 0.1),
    ]
    got = sliding_busiest(make_fact(spark, rows), k=3).collect()
    assert got[0].cnt == 2
    assert got[0].window_start == dt.datetime.fromisoformat(
        "2024-01-01T09:40:00"
    )


def test_append_parquet_emits_only_finalized_windows(spark, tmp_path):
    """The production-shaped append sink (r8 ADVICE): windows are
    emitted exactly once when the watermark passes their end — so
    after draining a late batch that advances the watermark, the
    early windows are in the output and the late event's own
    (unfinalized) windows are not. This is the path where state
    eviction actually holds (complete mode never evicts)."""
    from piholelongtermstats_spark.streaming.sliding import (
        start_sliding_to_parquet,
    )

    src = str(tmp_path / "sl_src")
    out = str(tmp_path / "sl_out")
    ckpt = str(tmp_path / "sl_ckpt")
    t0 = dt.datetime.fromisoformat("2024-01-01T10:00:00")
    early = [
        (1, t0, "c1", "d", "Allowed", 0.1),
        (2, t0 + dt.timedelta(minutes=7), "c1", "d", "Allowed", 0.1),
    ]
    _write_batch(spark, src, early)
    q = start_sliding_to_parquet(spark, src, out, ckpt)
    q.awaitTermination(120)
    # advance the watermark far past the early windows
    late = [(3, t0 + dt.timedelta(hours=6), "c2", "d", "Allowed", 0.1)]
    _write_batch(spark, src, late)
    q = start_sliding_to_parquet(spark, src, out, ckpt)
    q.awaitTermination(120)
    got = {
        (r.client, r.window_start): r.cnt
        for r in spark.read.parquet(out).collect()
    }
    # every early window finalized: starts 09:35..10:05 = 7 distinct
    # cells for c1 (the 5 interior windows hold both events)
    assert ("c1", t0 - dt.timedelta(minutes=25)) in got
    assert got[("c1", t0)] == 2  # 10:00 window holds both events
    assert sum(1 for (c, _w) in got if c == "c1") == 7
    assert sum(cnt for (c, _w), cnt in got.items() if c == "c1") == 12
    # the late event's windows end after the watermark -> not emitted
    assert not any(c == "c2" for (c, _w) in got)
