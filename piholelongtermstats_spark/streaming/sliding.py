"""Sliding (overlapping) event-time windows — the one window class
the streaming tier didn't yet carry (rollup/topk/bars are tumbling,
sessions are gap-based). A 30-minute window sliding every 5 minutes
answers "what was the worst half-hour, at 5-minute resolution?" —
the SRE burst dashboard — and in streaming form maintains it
continuously with watermark-bounded state.

Semantics (identical batch and stream — Spark assigns each event to
⌈30/5⌉ = 6 epoch-aligned windows): window starts are the 5-minute
grid points s with s ≤ ts < s + 30 min. The batch twin is oracle-
checked by materializing exactly those 6 grid slots per event in SQL
(k = 0..5: s = floor₅ₘ(ts) − k·5 min — every slot satisfies the
window inequality, so the explode is the full assignment set).

Scale: the streaming state is (client × open windows) rows, bounded
by the watermark horizon; the batch plan is one partial-agg shuffle
keyed on (window, client) after a 6-way in-row explode — fan-out 6,
map-side combined, no skew beyond the client distribution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from piholelongtermstats_spark.streaming.rollup import STREAM_SCHEMA

WINDOW = "30 minutes"
SLIDE = "5 minutes"


def sliding_busiest(fact: DataFrame, k: int = 10) -> DataFrame:
    """Batch twin: top-k busiest (client, 30-min sliding window)
    cells — (client, window_start, cnt), ties broken (cnt DESC,
    client ASC, window_start ASC)."""
    return (
        fact.groupBy(F.window("ts", WINDOW, SLIDE).alias("w"), "client")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .select("client", F.col("w.start").alias("window_start"), "cnt")
        .orderBy(
            F.col("cnt").desc(),
            F.col("client").asc(),
            F.col("window_start").asc(),
        )
        .limit(k)
    )


def streaming_sliding_counts(
    spark: SparkSession,
    source_dir: str,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming plan: the SAME sliding-window aggregation over a
    file-source stream, watermarked so windows finalize and state is
    evicted ``watermark`` past max event time."""
    events = (
        spark.readStream.schema(STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 16)
        .parquet(source_dir)
    )
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", WINDOW, SLIDE).alias("w"), "client")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .select("client", F.col("w.start").alias("window_start"), "cnt")
    )


def start_sliding_to_memory(
    spark: SparkSession,
    source_dir: str,
    table: str,
    watermark: str = "2 hours",
) -> StreamingQuery:
    """availableNow drain into an in-memory table — TEST HARNESS ONLY.

    Complete mode DISABLES watermark state eviction (Spark keeps every
    window ever seen so it can re-emit the full result each trigger),
    so the "state evicted ``watermark`` past max event time" contract
    does NOT hold on this sink: state grows with the full horizon
    (r8 ADVICE). Fine for bounded test drains where the memory sink
    needs the whole relation; the production-shaped path is
    ``start_sliding_to_parquet`` (append mode, eviction live)."""
    return (
        streaming_sliding_counts(spark, source_dir, watermark)
        .writeStream.format("memory")
        .queryName(table)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )


def start_sliding_to_parquet(
    spark: SparkSession,
    source_dir: str,
    out_dir: str,
    checkpoint: str,
    watermark: str = "2 hours",
) -> StreamingQuery:
    """Append-mode parquet sink — the production-shaped path: a window
    is emitted exactly once, when the watermark passes its end, and
    its state is then EVICTED, so state size is bounded by
    (window/slide) · |active keys| regardless of horizon."""
    return (
        streaming_sliding_counts(spark, source_dir, watermark)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
