"""Streaming windowed heavy hitters: per-hour top-K domains
maintained incrementally.

Capability extension (SURVEY.md §2.9): the reference's top-domains
panel (plot.py top-10 value_counts) recomputed from scratch per page
load; here the same ranking is maintained continuously. The streaming
half only AGGREGATES — watermarked tumbling-window counts in append
mode, so each (window, domain) row is emitted exactly once, when the
watermark closes its window. Ranking happens at the serving edge over
the finalized counts (`topk_over_counts`): a rank inside the stream
would need complete-mode state over every domain ever seen, while the
append-mode handoff keeps streaming state bounded by
(windows in watermark horizon) × (domains active in them) — the
standard production split (stream maintains counts, the dashboard
query ranks).

Scale: counts shuffle on (window, domain) — high-cardinality,
skew-tolerant (a hot domain is one state row per window, not a hot
partition of raw events); the serving rank reuses the
WindowGroupLimit cut (map-side partial top-k per window,
plan-asserted for the batch twin in operators/topk.py). Batch ≡
stream is pinned by tests/test_streaming_topk.py: the finalized
windows' top-K equals the batch groupBy+rank over the same rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from piholelongtermstats_spark.streaming.rollup import STREAM_SCHEMA

K = 10


def windowed_domain_counts(
    spark: SparkSession,
    source_dir: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming plan: watermarked tumbling-window (window, domain)
    counts; append mode emits each row once, on window close."""
    events = (
        spark.readStream.schema(STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 16)
        .parquet(source_dir)
    )
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "domain")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("w.start").alias("hour_bucket"), "domain", "cnt")
    )


def start_domain_counts_to_memory(
    spark: SparkSession,
    source_dir: str,
    table_name: str = "domain_counts_live",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> StreamingQuery:
    """Append-mode memory sink of finalized per-window domain counts
    (the micro-demo of the production parquet/Delta sink — each
    finalized row lands exactly once, so the sink is append-only)."""
    return (
        windowed_domain_counts(spark, source_dir, window, watermark)
        .writeStream.format("memory")
        .queryName(table_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def topk_over_counts(counts: DataFrame, k: int = K) -> DataFrame:
    """Serving-edge rank over finalized counts: top-k domains per
    window, ties pinned (cnt DESC, domain ASC — the engine-wide
    deterministic tie-break). Same WindowGroupLimit shape as the
    batch top-K family."""
    from pyspark.sql import Window

    w = Window.partitionBy("hour_bucket").orderBy(
        F.col("cnt").desc(), F.col("domain").asc()
    )
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("hour_bucket", "rank")
    )
