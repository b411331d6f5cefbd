"""Structured Streaming rollup extension (SURVEY.md §2.9 — batch-only
reference; this is the beyond-reference streaming path)."""

from __future__ import annotations

import datetime as dt

from piholelongtermstats_spark.streaming.rollup import (
    STREAM_SCHEMA,
    start_rollup_to_memory,
)


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, STREAM_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def test_streaming_rollup_incremental(spark, tmp_path):
    src = str(tmp_path / "stream_src")
    t0 = dt.datetime.fromisoformat("2024-01-01T10:00:00")

    _write_batch(
        spark,
        src,
        [
            (1, t0, "c1", "d1", "Allowed", 0.1),
            (2, t0 + dt.timedelta(minutes=10), "c1", "d1", "Blocked", 0.2),
            (3, t0 + dt.timedelta(minutes=70), "c2", "d2", "Allowed", 0.3),
        ],
    )
    q = start_rollup_to_memory(spark, src, "rollup_t1")
    q.awaitTermination(60)
    got = {
        (r["hour_bucket"], r["status_type"], r["client"]): r["cnt"]
        for r in spark.sql("SELECT * FROM rollup_t1").collect()
    }
    h10 = dt.datetime.fromisoformat("2024-01-01T10:00:00")
    h11 = dt.datetime.fromisoformat("2024-01-01T11:00:00")
    assert got == {
        (h10, "Allowed", "c1"): 1,
        (h10, "Blocked", "c1"): 1,
        (h11, "Allowed", "c2"): 1,
    }

    # second drop lands → rerun availableNow picks up only-new files via
    # the same source dir (fresh query name; memory sink is per-query)
    _write_batch(
        spark,
        src,
        [(4, t0 + dt.timedelta(minutes=20), "c1", "d1", "Allowed", 0.4)],
    )
    q2 = start_rollup_to_memory(spark, src, "rollup_t2")
    q2.awaitTermination(60)
    got2 = {
        (r["hour_bucket"], r["status_type"], r["client"]): r["cnt"]
        for r in spark.sql("SELECT * FROM rollup_t2").collect()
    }
    assert got2[(h10, "Allowed", "c1")] == 2
