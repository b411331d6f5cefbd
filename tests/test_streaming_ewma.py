"""Streaming per-client EWMA: stream ≡ batch twin on shared files
(bit-for-bit after the shared round), state carried across triggers,
late-row drop contract."""

from __future__ import annotations

import datetime as dt

from piholelongtermstats_spark.operators.robust import ewma_by_client
from piholelongtermstats_spark.streaming.ewma import (
    DAILY_FEED_SCHEMA,
    start_ewma_to_memory,
)


def _write_day(spark, path, rows):
    spark.createDataFrame(rows, DAILY_FEED_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def _d(s):
    return dt.datetime.fromisoformat(s)


def test_streaming_ewma_equals_batch(spark, tmp_path):
    src = str(tmp_path / "ewma_src")
    days = [
        [("c1", _d("2024-01-01"), 10), ("c2", _d("2024-01-01"), 3)],
        [("c1", _d("2024-01-02"), 20), ("c2", _d("2024-01-02"), 9)],
        [("c1", _d("2024-01-03"), 7)],
    ]
    for batch in days:
        _write_day(spark, src, batch)
    q = start_ewma_to_memory(spark, src, "ewma_t1")
    q.awaitTermination(120)
    streamed = {
        (r.client, r.date): (r.y, r.ewma)
        for r in spark.sql("SELECT * FROM ewma_t1").collect()
    }
    batch_twin = {
        (r.client, r.date): (r.y, r.ewma)
        for r in ewma_by_client(spark.read.parquet(src)).collect()
    }
    assert streamed == batch_twin
    assert len(streamed) == 5
    # literal recurrence check: c1 = 10, .3*20+.7*10 = 13, .3*7+.7*13
    assert streamed[("c1", _d("2024-01-02"))][1] == round(0.3 * 20 + 0.7 * 10, 6)


def test_streaming_ewma_state_survives_new_drop(spark, tmp_path):
    """A second start() over a checkpoint continues the recurrence
    from stored state rather than restarting it."""
    src = str(tmp_path / "ewma_src2")
    ckpt = str(tmp_path / "ewma_ckpt2")
    sink = str(tmp_path / "ewma_sink2")
    from piholelongtermstats_spark.streaming.ewma import streaming_client_ewma

    def run():
        # memory sinks can't recover a checkpoint; a parquet sink can
        out = streaming_client_ewma(spark, src)
        return (
            out.writeStream.outputMode("append")
            .format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    _write_day(spark, src, [("c1", _d("2024-02-01"), 100)])
    q = run()
    q.awaitTermination(120)
    _write_day(spark, src, [("c1", _d("2024-02-02"), 0)])
    q = run()
    q.awaitTermination(120)
    rows = {r.date: r.ewma for r in spark.read.parquet(sink).collect()}
    # the second day's value chains off the CHECKPOINTED e=100 (a
    # restarted recurrence would emit 0.0)
    assert rows == {
        _d("2024-02-01"): 100.0,
        _d("2024-02-02"): round(0.3 * 0 + 0.7 * 100.0, 6),
    }


def test_streaming_ewma_drops_late_rows(spark, tmp_path):
    src = str(tmp_path / "ewma_src3")
    _write_day(spark, src, [("c1", _d("2024-03-05"), 10)])
    _write_day(spark, src, [("c1", _d("2024-03-04"), 999)])  # late
    _write_day(spark, src, [("c1", _d("2024-03-06"), 20)])
    q = start_ewma_to_memory(spark, src, "ewma_t3")
    q.awaitTermination(120)
    rows = {
        r.date: (r.y, r.ewma)
        for r in spark.sql("SELECT * FROM ewma_t3").collect()
    }
    assert set(rows) == {_d("2024-03-05"), _d("2024-03-06")}
    assert rows[_d("2024-03-06")] == (20, round(0.3 * 20 + 0.7 * 10, 6))
