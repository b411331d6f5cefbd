"""Streaming observability (streaming/observe.py): the progress
listener captures per-batch facts and exposes them as a DataFrame."""

from __future__ import annotations

import datetime as dt
import time

from pyspark.sql import functions as F

from piholelongtermstats_spark.streaming import observe
from piholelongtermstats_spark.streaming.rollup import (
    STREAM_SCHEMA,
    streaming_hourly_rollup,
)


def test_progress_recorder_captures_batches(spark, tmp_path):
    src = str(tmp_path / "obs_src")
    t0 = dt.datetime.fromisoformat("2024-01-01T10:00:00")
    rows = [
        (i, t0 + dt.timedelta(minutes=i), f"c{i % 3}", "d", "Allowed", 0.1)
        for i in range(30)
    ]
    spark.createDataFrame(rows, STREAM_SCHEMA).coalesce(3).write.mode(
        "append"
    ).parquet(src)

    rec = observe.attach_recorder(spark)
    try:
        q = (
            streaming_hourly_rollup(spark, src)
            .writeStream.format("memory")
            .queryName("obs_rollup")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        # listener events are delivered asynchronously
        for _ in range(40):
            if rec.events:
                break
            time.sleep(0.25)
    finally:
        observe.detach_recorder(spark, rec)
    df = observe.progress_df(spark, rec)
    assert df.count() >= 1
    got = df.agg(F.sum("num_input_rows")).first()[0]
    assert got == 30
    # state-backed agg reports state rows; batch ids are distinct
    assert df.select("batch_id").distinct().count() == df.count()
    assert df.agg(F.max("state_rows")).first()[0] >= 1
