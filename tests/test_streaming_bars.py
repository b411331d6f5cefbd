"""Streaming OHLC bars: batch ≡ stream on shared files, tie pins
carried into the streaming state."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from piholelongtermstats_spark.functions.derive import enrich_time
from piholelongtermstats_spark.operators.timeagg import hourly_ohlc_reply
from piholelongtermstats_spark.streaming.bars import start_bars_to_memory
from piholelongtermstats_spark.streaming.rollup import STREAM_SCHEMA


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, STREAM_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def test_streaming_bars_equal_batch(spark, tmp_path):
    """The streamed bars must equal timeagg.hourly_ohlc_reply over the
    same files — including the (ts, event_id) tie pins on open/close
    (two events share the opening timestamp) and null-reply drops."""
    src = str(tmp_path / "bars_src")
    t0 = dt.datetime.fromisoformat("2024-01-01T10:00:00")
    rows = [
        (2, t0, "c1", "d", "Allowed", 5.0),
        (1, t0, "c1", "d", "Allowed", 3.0),          # open: lower event_id
        (3, t0 + dt.timedelta(minutes=30), "c1", "d", "Allowed", 9.0),
        (5, t0 + dt.timedelta(minutes=59), "c1", "d", "Allowed", 1.0),
        (4, t0 + dt.timedelta(minutes=59), "c1", "d", "Allowed", 7.0),
        (6, t0 + dt.timedelta(minutes=65), "c2", "d", "Allowed", None),
        (7, t0 + dt.timedelta(minutes=70), "c2", "d", "Blocked", 2.0),
    ]
    _write_batch(spark, src, rows)

    q = start_bars_to_memory(spark, src, "bars_t1")
    q.awaitTermination(60)
    streamed = {
        r["hour_ts"]: (r["n"], r["open"], r["high"], r["low"], r["close"])
        for r in spark.sql("SELECT * FROM bars_t1").collect()
    }

    batch_fact = enrich_time(spark.read.parquet(src), "ts")
    batch = {
        r["hour_ts"]: (r["n"], r["open"], r["high"], r["low"], r["close"])
        for r in hourly_ohlc_reply(batch_fact).collect()
    }
    assert streamed == batch
    h10 = dt.datetime.fromisoformat("2024-01-01T10:00:00")
    assert streamed[h10] == (5, 3.0, 9.0, 1.0, 1.0)


def test_streaming_bars_incremental_drop(spark, tmp_path):
    """A second file drop extends an existing bar: min_by/max_by state
    merges the new events exactly like the batch partial agg."""
    src = str(tmp_path / "bars_src2")
    t0 = dt.datetime.fromisoformat("2024-01-01T10:00:00")
    _write_batch(spark, src, [(1, t0, "c1", "d", "Allowed", 4.0)])
    _write_batch(
        spark, src,
        [(2, t0 + dt.timedelta(minutes=5), "c1", "d", "Allowed", 8.0)],
    )
    q = start_bars_to_memory(spark, src, "bars_t2")
    q.awaitTermination(60)
    got = spark.sql("SELECT * FROM bars_t2").collect()
    assert len(got) == 1
    r = got[0]
    assert (r["n"], r["open"], r["high"], r["low"], r["close"]) == (
        2, 4.0, 8.0, 4.0, 8.0,
    )
