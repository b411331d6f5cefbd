"""Streaming observability: per-micro-batch progress metrics captured
into a queryable DataFrame.

At scale nobody debugs a streaming job from driver logs — the
operations questions (is the watermark advancing? what's rows/sec?
how big is the join/dedup state? is a batch stuck?) need the progress
stream AS DATA. Structured Streaming already emits everything via
StreamingQueryProgress; this module is the thin, dependency-free
bridge: a ``StreamingQueryListener`` accumulates the per-batch facts
(driver-side, bounded by ``max_events`` — progress events are tiny
and arrive once per batch, so memory is not a concern), and
``progress_df`` materializes them as a DataFrame for the same
engine's SQL to analyze — lag percentiles, throughput timelines, and
state growth become ordinary registry-style queries.
"""

from __future__ import annotations

from collections import deque

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQueryListener

PROGRESS_SCHEMA = T.StructType(
    [
        T.StructField("query_id", T.StringType()),
        T.StructField("batch_id", T.LongType()),
        T.StructField("num_input_rows", T.LongType()),
        T.StructField("input_rows_per_sec", T.DoubleType()),
        T.StructField("process_rows_per_sec", T.DoubleType()),
        T.StructField("batch_duration_ms", T.LongType()),
        T.StructField("watermark", T.StringType()),
        T.StructField("state_rows", T.LongType()),
        T.StructField("state_bytes", T.LongType()),
    ]
)


class ProgressRecorder(StreamingQueryListener):
    """Accumulates one row per (query, batch) progress event."""

    def __init__(self, max_events: int = 10_000):
        self.events: deque = deque(maxlen=max_events)

    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        state_rows = sum(
            (s.numRowsTotal or 0) for s in (p.stateOperators or [])
        )
        state_bytes = sum(
            (s.memoryUsedBytes or 0) for s in (p.stateOperators or [])
        )
        self.events.append(
            (
                str(p.id),
                int(p.batchId),
                int(p.numInputRows or 0),
                float(p.inputRowsPerSecond or 0.0),
                float(p.processedRowsPerSecond or 0.0),
                int(p.durationMs.get("triggerExecution", 0)),
                (p.eventTime or {}).get("watermark"),
                int(state_rows),
                int(state_bytes),
            )
        )


def attach_recorder(
    spark: SparkSession, max_events: int = 10_000
) -> ProgressRecorder:
    rec = ProgressRecorder(max_events)
    spark.streams.addListener(rec)
    return rec


def detach_recorder(spark: SparkSession, rec: ProgressRecorder) -> None:
    spark.streams.removeListener(rec)


def progress_df(spark: SparkSession, rec: ProgressRecorder) -> DataFrame:
    """Snapshot the recorded progress events as a DataFrame."""
    return spark.createDataFrame(list(rec.events), PROGRESS_SCHEMA)
