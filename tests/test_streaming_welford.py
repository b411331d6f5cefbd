"""Streaming prequential z-score: stream ≡ batch twin on shared
files (integer state ⇒ no fp-recurrence argument needed), state
carried across checkpointed restarts, late-row drop contract."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from piholelongtermstats_spark.operators.anomaly import running_zscore_by_client
from piholelongtermstats_spark.streaming.welford import (
    DAILY_FEED_SCHEMA,
    start_zscore_to_memory,
    streaming_client_zscore,
)


def _write_day(spark, path, rows):
    spark.createDataFrame(rows, DAILY_FEED_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def _d(s):
    return dt.datetime.fromisoformat(s)


def test_streaming_zscore_equals_batch(spark, tmp_path):
    src = str(tmp_path / "wf_src")
    days = [
        [("c1", _d("2024-01-01"), 10), ("c2", _d("2024-01-01"), 3)],
        [("c1", _d("2024-01-02"), 20), ("c2", _d("2024-01-02"), 3)],
        [("c1", _d("2024-01-03"), 7), ("c2", _d("2024-01-03"), 50)],
        [("c1", _d("2024-01-04"), 400)],
    ]
    for batch in days:
        _write_day(spark, src, batch)
    q = start_zscore_to_memory(spark, src, "wf_t1")
    q.awaitTermination(120)
    streamed = {
        (r.client, r.date): (r.y, r.n_prior, r.z, r.is_spike)
        for r in spark.sql("SELECT * FROM wf_t1").collect()
    }
    batch_twin = {
        (r.client, r.date): (r.y, r.n_prior, r.z, r.is_spike)
        for r in running_zscore_by_client(
            spark.read.parquet(src)
        ).collect()
    }
    assert streamed == batch_twin
    # c2's day-3 jump from a zero-variance history: NULL z, spike=1
    assert streamed[("c2", _d("2024-01-03"))][2] is None
    assert streamed[("c2", _d("2024-01-03"))][3] == 1


def test_streaming_zscore_state_survives_restart(spark, tmp_path):
    src = str(tmp_path / "wf_src2")
    ckpt = str(tmp_path / "wf_ckpt2")
    sink = str(tmp_path / "wf_sink2")

    def run():
        out = streaming_client_zscore(spark, src)
        return (
            out.writeStream.outputMode("append")
            .format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    _write_day(spark, src, [("c1", _d("2024-02-01"), 10)])
    _write_day(spark, src, [("c1", _d("2024-02-02"), 14)])
    q = run()
    q.awaitTermination(120)
    # nothing scored yet (n_prior < 2), but (n,S,Q) must be in state
    _write_day(spark, src, [("c1", _d("2024-02-03"), 18)])
    q = run()
    q.awaitTermination(120)
    rows = spark.read.parquet(sink).collect()
    assert len(rows) == 1
    r = rows[0]
    # prior history (10, 14): mean 12, sd sqrt(8): z = 6/sqrt(8)
    assert r.n_prior == 2
    assert r.z == round(float(2 * 18 - 24) * ((2 - 1) / (2.0 * (2 * 296 - 576))) ** 0.5, 6)


def test_streaming_zscore_drops_late_rows(spark, tmp_path):
    src = str(tmp_path / "wf_src3")
    _write_day(spark, src, [("c1", _d("2024-03-05"), 10)])
    _write_day(spark, src, [("c1", _d("2024-03-06"), 12)])
    # late arrival for an already-applied day plus a duplicate
    _write_day(spark, src, [("c1", _d("2024-03-04"), 999),
                            ("c1", _d("2024-03-06"), 999)])
    _write_day(spark, src, [("c1", _d("2024-03-07"), 11)])
    q = start_zscore_to_memory(spark, src, "wf_t3")
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM wf_t3").collect()
    assert len(rows) == 1
    # the late 999s never entered the moments: history is (10, 12)
    assert rows[0].n_prior == 2
    assert rows[0].y == 11


def test_round6_half_up_matches_spark_on_ties(spark):
    """_round6_half_up must replicate Spark's F.round(d, 6) on exact
    6-decimal ties, where bare Python round() (half-even on the
    binary value) can diverge (r9 ADVICE).  Pinned against the real
    Spark expression over tie values of both signs."""
    from piholelongtermstats_spark.streaming.welford import _round6_half_up

    vals = [
        1.0000005, -1.0000005, 2.0000015, -2.0000015, 0.0000025,
        -0.0000025, 3.1415925, 123.4567895, -123.4567895, 0.1234565,
    ]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = {
        r.x: r.r
        for r in df.select("x", F.round("x", 6).alias("r")).collect()
    }
    for v in vals:
        assert _round6_half_up(v) == got[v], v
