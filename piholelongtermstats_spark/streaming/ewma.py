"""Streaming per-client EWMA — a CUSTOM STATEFUL RECURRENCE kept
incrementally with applyInPandasWithState (SURVEY §2.9 extension:
the first streaming member whose state is an order-dependent fold,
not a commutative aggregate).

Why this needs arbitrary state: min/max/count/OHLC merge in any
order, so groupBy().agg() state suffices (streaming/bars.py). An
EWMA's state is the recurrence value itself — e ← α·y + (1−α)·e in
DATE order — which no built-in streaming aggregate expresses. The
GroupState per client is two scalars (ewma, last day index):
constant bytes per key, the smallest possible stateful footprint.

Input contract: the source is a DAILY ROLLUP FEED of
(client, date, y) rows arriving in non-decreasing date order per
client (the natural shape of a day-close rollup export — e.g.
operators/timeagg.hourly_rollup re-aggregated to days and dropped
per day). Within a micro-batch rows are sorted by date; a row at or
before the client's last applied day is LATE by contract and is
dropped (counted nowhere — the feed is append-only by day; replays
must reset the checkpoint).

fp: the per-step expression α·y + (1−α)·e runs in IEEE doubles here
(Python floats ARE IEEE 754 binary64) exactly as in the batch twin's
catalyst fold (operators/robust.ewma_by_client) — stream ≡ batch is
pinned bit-for-bit (after the shared round-to-6) on shared files by
tests/test_streaming_ewma.py.

No protobuf needed: applyInPandasWithState speaks the Arrow
protocol, unlike transformWithStateInPandas (streaming/stateful.py,
env-gated in this container).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DAILY_FEED_SCHEMA = "client string, date timestamp, y long"
_OUT_SCHEMA = "client string, date timestamp, y long, ewma double"
_STATE_SCHEMA = "e double, last_day long"

_EPOCH_DAY_NS = 86_400_000_000_000


def _make_update(alpha: float):
    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        e, last = (state.get if state.exists else (None, -(1 << 62)))
        rows = [pdf for pdf in pdfs if not pdf.empty]
        batch = (
            pd.concat(rows, ignore_index=True)
            if rows
            else pd.DataFrame(columns=["client", "date", "y"])
        )
        batch = batch.sort_values("date", kind="mergesort")
        out_date, out_y, out_e = [], [], []
        for _, r in batch.iterrows():
            day = r["date"].value // _EPOCH_DAY_NS
            if day <= last:
                continue  # late by contract: the feed is append-only
            y = float(r["y"])
            e = y if e is None else alpha * y + (1.0 - alpha) * e
            last = day
            out_date.append(r["date"])
            out_y.append(int(r["y"]))
            out_e.append(round(e, 6))
        if e is not None:
            state.update((e, last))
        if out_date:
            yield pd.DataFrame(
                {
                    "client": key[0],
                    "date": out_date,
                    "y": out_y,
                    "ewma": out_e,
                }
            )

    return update


def streaming_client_ewma(
    spark: SparkSession, source_dir: str, alpha: float = 0.3
) -> DataFrame:
    """Streaming plan: per-client EWMA rows appended as the daily
    feed lands, one file per trigger (so each day's drop advances
    every client's recurrence exactly once)."""
    feed = (
        spark.readStream.schema(DAILY_FEED_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(source_dir)
    )
    return feed.groupBy("client").applyInPandasWithState(
        _make_update(alpha),
        _OUT_SCHEMA,
        _STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )


def start_ewma_to_memory(
    spark: SparkSession,
    source_dir: str,
    table_name: str = "client_ewma_live",
    alpha: float = 0.3,
) -> StreamingQuery:
    """Run the streaming EWMA into an in-memory sink (test harness);
    append mode — each day's value is emitted once, final."""
    out = streaming_client_ewma(spark, source_dir, alpha)
    return (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName(table_name)
        .trigger(availableNow=True)
        .start()
    )
