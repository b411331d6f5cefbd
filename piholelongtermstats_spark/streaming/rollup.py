"""Structured Streaming extension: continuously maintained hourly
rollup.

The reference is strictly batch — it re-reads SQLite on every page
reload and explicitly does not watch the live DB (README.md:46, 53;
reload callback app.py:1056-1104). Its hourly rollup (process.py:
100-113) is a tumbling window over event time computed in batch. This
module is the capability EXTENSION (SURVEY.md §2.9): the same rollup
maintained incrementally, so the interactive dashboard path
(operators/plotdata.filtered_timeseries) reads an always-fresh table
instead of triggering a full recompute.

Shape: file-source readStream (new FTL→parquet drops land as files) →
1-hour tumbling window on event time with a 2-hour watermark for late
arrivals → counts per (window, status_type, client) → sink in append
mode (complete/update for memory-table demos). At production scale the
source would be Kafka and the sink a partitioned Delta/parquet table —
the plan is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

# The canonical enriched-event schema a streaming drop directory holds
# (file sources must declare their schema up front).
STREAM_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("client", T.StringType()),
        T.StructField("domain", T.StringType()),
        T.StructField("status_type", T.StringType()),
        T.StructField("reply_time", T.DoubleType()),
    ]
)


def streaming_hourly_rollup(
    spark: SparkSession,
    source_dir: str,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming plan: windowed (hour, status_type, client) counts.

    Watermark bounds state: windows older than max(event time) −
    watermark are finalized and evictable; later-than-watermark events
    are dropped (the batch reference has no late-data story at all).
    """
    events = (
        spark.readStream.schema(STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 16)
        .parquet(source_dir)
    )
    return (
        events.withWatermark("ts", watermark)
        .groupBy(
            F.window("ts", "1 hour").alias("w"),
            "status_type",
            "client",
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.col("w.start").alias("hour_bucket"),
            "status_type",
            "client",
            "cnt",
        )
    )


def start_rollup_to_memory(
    spark: SparkSession,
    source_dir: str,
    table_name: str = "hourly_rollup_live",
    watermark: str = "2 hours",
) -> StreamingQuery:
    """Run the rollup into an in-memory sink (demo/test harness).

    'complete' mode keeps the whole rollup queryable — fine for a
    dashboard-sized aggregate; a production sink would use update mode
    + foreachBatch MERGE into a keyed table.
    """
    rollup = streaming_hourly_rollup(spark, source_dir, watermark)
    return (
        rollup.writeStream.outputMode("complete")
        .format("memory")
        .queryName(table_name)
        .trigger(availableNow=True)
        .start()
    )
