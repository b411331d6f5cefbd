"""Session analytics: gap-based session windows, batch + streaming.

Beyond-reference capability (the reference has no session concept —
SURVEY.md §2.9): group a client's queries into sessions separated by
≥ `gap` of inactivity. Two implementations:

- `client_sessions` — native `F.session_window` (Spark ≥3.2). Works
  identically over batch DataFrames and streams; state (in
  streaming) is bounded by the watermark. This is the scale path:
  session merging happens in the JVM aggregation machinery, sessions
  for different clients never co-shuffle more than a groupBy would.
- `running_client_totals_stream` — `applyInPandasWithState`, the
  custom-stateful-operator escape hatch for semantics the built-in
  windows can't express (here: a per-client running total carried
  across micro-batches). Arrow-batched, schema-declared state; the
  pattern to copy for custom session policies (e.g. cap-length
  sessions, per-entity dynamic gaps).

The batch `client_sessions` is SQL-expressible (lag → gap flag →
running sum → group) so it gets a full DuckDB oracle; session_window
end = last event ts + gap, mirrored exactly in the oracle SQL.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Any, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

SESSION_GAP = "30 minutes"


def client_sessions(fact: DataFrame, gap: str = SESSION_GAP) -> DataFrame:
    """One row per (client, session): start/end and event count.

    `session_window` merges events whose timestamps are within `gap`
    of the session's current end; window end = last ts + gap. Same
    call works on a stream after `.withWatermark('ts', ...)`.
    """
    return (
        fact.groupBy(F.session_window("ts", gap).alias("w"), "client")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "client",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def session_summary(fact: DataFrame, gap: str = SESSION_GAP) -> DataFrame:
    """Per-client session stats: session count, avg events/session,
    longest session in seconds (exact integer µs → one division)."""
    s = client_sessions(fact, gap)
    return (
        s.groupBy("client")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.round(
                F.sum("n_events").cast("double") / F.count(F.lit(1)), 6
            ).alias("avg_events_per_session"),
            F.round(
                F.max(
                    F.unix_micros("session_end") - F.unix_micros("session_start")
                ).cast("double")
                / 1_000_000.0,
                6,
            ).alias("longest_session_sec"),
        )
    )


RUNNING_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("client", T.StringType()),
        T.StructField("total_events", T.LongType()),
        T.StructField("last_ts", T.TimestampType()),
    ]
)
RUNNING_STATE_SCHEMA = T.StructType(
    [
        T.StructField("total", T.LongType()),
        T.StructField("last_ts_us", T.LongType()),
    ]
)


def _update_running_totals(
    key: tuple, pdfs: "Iterator[pd.DataFrame]", state: Any
) -> "Iterator[pd.DataFrame]":
    """Per-client micro-batch update: fold batch counts into state,
    emit the updated running total. State is a (total, last_ts_us)
    tuple — tiny and schema-declared, so Spark can checkpoint and
    redistribute it."""
    import datetime as dt

    import pandas as pd

    total, last_us = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        total += len(pdf)
        if len(pdf):
            last_us = max(
                last_us, int(pdf["ts"].astype("int64").max()) // 1000
            )
    state.update((total, last_us))
    yield pd.DataFrame(
        {
            "client": [key[0]],
            "total_events": [total],
            "last_ts": [
                dt.datetime.fromtimestamp(last_us / 1e6, dt.timezone.utc).replace(
                    tzinfo=None
                )
            ],
        }
    )


def running_client_totals_stream(
    spark: SparkSession, source_dir: str, schema: T.StructType
) -> DataFrame:
    """Streaming per-client running totals via applyInPandasWithState."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    events = spark.readStream.schema(schema).parquet(source_dir)
    return events.groupBy("client").applyInPandasWithState(
        _update_running_totals,
        outputStructType=RUNNING_OUTPUT_SCHEMA,
        stateStructType=RUNNING_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_dedup(
    spark: SparkSession,
    source_dir: str,
    schema: T.StructType,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup on event_id within the watermark horizon.

    `dropDuplicatesWithinWatermark` keeps state only for the watermark
    window — the unbounded-state trap of plain dropDuplicates on a
    stream is the reason this variant exists. Re-deliveries inside the
    horizon (at-least-once sources) are suppressed; older re-sends age
    out of state and must be handled idempotently at the sink.
    """
    events = spark.readStream.schema(schema).parquet(source_dir)
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )
