"""Streaming OHLC bars — the batch ``timeagg.hourly_ohlc_reply``
maintained incrementally (SURVEY §2.9 extension, the financial-bars
member of the streaming agg family).

The batch operator's whole design carries over unchanged because
min_by/max_by are ordinary declarative aggregates: the streaming
window state per (hour) bar is four scalars plus their carried
(ts, event_id) keys — constant bytes per bar, merged exactly like the
batch partial aggregation, finalized by the watermark. No custom
stateful processor is needed; this is the "let the engine's agg
machinery do it" path (the session_window lesson applied to bars).

Batch ≡ stream is pinned by tests/test_streaming_bars.py on shared
files: the streamed bars equal timeagg.hourly_ohlc_reply over the
same data, tie-pins included.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from piholelongtermstats_spark.streaming.rollup import STREAM_SCHEMA


def streaming_hourly_bars(
    spark: SparkSession,
    source_dir: str,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming plan: per-hour OHLC of reply_time with open/close
    argmin/argmax by the canonical (ts, event_id) order."""
    events = (
        spark.readStream.schema(STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 16)
        .parquet(source_dir)
    )
    key = F.struct("ts", "event_id")
    return (
        events.filter(F.col("reply_time").isNotNull())
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min_by("reply_time", key).alias("open"),
            F.max("reply_time").alias("high"),
            F.min("reply_time").alias("low"),
            F.max_by("reply_time", key).alias("close"),
        )
        .select(
            F.col("w.start").alias("hour_ts"),
            "n", "open", "high", "low", "close",
        )
    )


def start_bars_to_memory(
    spark: SparkSession,
    source_dir: str,
    table_name: str = "hourly_bars_live",
    watermark: str = "2 hours",
) -> StreamingQuery:
    """Run the bars into an in-memory sink (demo/test harness);
    complete mode keeps every bar queryable — bars are a
    dashboard-sized aggregate like the rollup."""
    bars = streaming_hourly_bars(spark, source_dir, watermark)
    return (
        bars.writeStream.outputMode("complete")
        .format("memory")
        .queryName(table_name)
        .trigger(availableNow=True)
        .start()
    )
