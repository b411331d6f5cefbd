"""Stream-static enrichment: the event stream joined against a
slowly-changing dimension table.

§2.9 depth: the reference resolves client labels at render time from
an in-memory dict; the streaming equivalent is a stream-static join —
Structured Streaming re-plans the STATIC side every micro-batch, so a
dimension updated between triggers is picked up without restarting
the query (tests/test_streaming_topk.py pins exactly that: relabel
the dim between two availableNow runs and the later batch carries the
new label). The dim side is broadcast — no stream-side shuffle — and
unmatched clients keep flowing with a NULL label (left join):
enrichment must never drop telemetry.

At scale the dim is a catalog table refreshed by its own pipeline
(e.g. an SCD2 head — sources/snapshots.scd2_history's is_current
slice); the join shape is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from piholelongtermstats_spark.streaming.rollup import STREAM_SCHEMA

DIM_SCHEMA = T.StructType(
    [
        T.StructField("client", T.StringType()),
        T.StructField("client_label", T.StringType()),
    ]
)


def enriched_stream(
    spark: SparkSession,
    source_dir: str,
    dim_path: str,
    max_files_per_trigger: int = 16,
) -> DataFrame:
    """File-source event stream left-joined to the client dimension
    (static side re-read per micro-batch; broadcast)."""
    events = (
        spark.readStream.schema(STREAM_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )
    dim = spark.read.schema(DIM_SCHEMA).parquet(dim_path)
    return events.join(F.broadcast(dim), "client", "left")


def start_enriched_to_memory(
    spark: SparkSession,
    source_dir: str,
    dim_path: str,
    table_name: str = "enriched_live",
) -> StreamingQuery:
    return (
        enriched_stream(spark, source_dir, dim_path)
        .writeStream.format("memory")
        .queryName(table_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
