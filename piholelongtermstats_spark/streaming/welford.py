"""Streaming per-client prequential z-score — RUNNING MOMENTS kept
incrementally with applyInPandasWithState (SURVEY §2.9 extension:
the streaming-anomaly member of the stateful family, next to the
EWMA recurrence in streaming/ewma.py and the Misra–Gries sketch in
streaming/heavyhitters.py).

State per client is three INTEGERS (n, Σy, Σy²) plus the last
applied day — the Welford/moment form of an online variance. Because
the state is integer-exact, stream ≡ batch needs no fp-recurrence
argument at all: both sides evaluate the SAME one-shot double
expression z = (n·y−S)·sqrt((n−1)/(n·(n·Q−S²))) over identical
integer moments (operators/anomaly.running_zscore_by_client is the
batch twin; equality is pinned bit-for-bit on shared files by
tests/test_streaming_welford.py). The spike gate is pure integer
arithmetic in both engines.

Input contract: the same append-only daily rollup feed as
streaming/ewma.py — (client, date, y) in non-decreasing date order
per client; a row at or before the client's last applied day is LATE
by contract and dropped.

Integer bounds: Σy² is held in a Python int (arbitrary precision) in
state-update code but stored as int64 in the state schema — at 10⁶
events/day·client over 10 years Σy² ≈ 3.7e15 « 2⁶³; beyond that the
state schema would need a decimal column (documented, matching the
batch twin's DECIMAL(38,0) widening).
"""

from __future__ import annotations

import math
from collections.abc import Iterator
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DAILY_FEED_SCHEMA = "client string, date timestamp, y long"
_OUT_SCHEMA = (
    "client string, date timestamp, y long, n_prior long, "
    "z double, is_spike int"
)
_STATE_SCHEMA = "n long, s long, q long, last_day long"

_EPOCH_DAY_NS = 86_400_000_000_000


def _round6_half_up(x: float) -> float:
    """Replicate Spark's F.round(col, 6) on a double EXACTLY: Spark
    routes through Scala BigDecimal.decimal(d) — the SHORTEST decimal
    representation of the double (Double.toString) — then rounds
    HALF_UP.  Python's repr() produces the same shortest round-trip
    decimal, so Decimal(repr(x)).quantize(..., ROUND_HALF_UP) is the
    bit-for-bit twin.  A bare Python round() would be round-half-even
    on the binary value and can diverge on an exact 6-decimal tie
    (r9 ADVICE)."""
    return float(
        Decimal(repr(x)).quantize(
            Decimal("0.000001"), rounding=ROUND_HALF_UP
        )
    )


def _score(n: int, s: int, q: int, y: int) -> tuple[float | None, int]:
    """The batch twin's exact expression tree over integer moments:
    float() casts mirror Spark's decimal→double casts, each IEEE op
    in the same order as the Column expression."""
    num = n * y - s
    varnum = n * q - s * s
    if varnum > 0:
        z = _round6_half_up(
            float(num)
            * math.sqrt(float(n - 1) / (float(n) * float(varnum)))
        )
    else:
        z = None
    spike = int(num * num * (n - 1) > 9 * n * varnum)
    return z, spike


def _update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, s, q, last = (
        state.get if state.exists else (0, 0, 0, -(1 << 62))
    )
    rows = [pdf for pdf in pdfs if not pdf.empty]
    batch = (
        pd.concat(rows, ignore_index=True)
        if rows
        else pd.DataFrame(columns=["client", "date", "y"])
    )
    batch = batch.sort_values("date", kind="mergesort")
    out = {k: [] for k in ("date", "y", "n_prior", "z", "is_spike")}
    for _, r in batch.iterrows():
        day = r["date"].value // _EPOCH_DAY_NS
        if day <= last:
            continue  # late by contract: the feed is append-only
        y = int(r["y"])
        if n >= 2:
            z, spike = _score(n, s, q, y)
            out["date"].append(r["date"])
            out["y"].append(y)
            out["n_prior"].append(n)
            out["z"].append(z)
            out["is_spike"].append(spike)
        n, s, q, last = n + 1, s + y, q + y * y, day
    state.update((n, s, q, last))
    if out["date"]:
        yield pd.DataFrame({"client": key[0], **out})


def streaming_client_zscore(
    spark: SparkSession, source_dir: str
) -> DataFrame:
    """Streaming plan: per-client prequential z-scores appended as the
    daily feed lands; days with fewer than 2 prior observations are
    absorbed into state without emitting (the batch twin's n≥2 rule).
    """
    feed = (
        spark.readStream.schema(DAILY_FEED_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(source_dir)
    )
    return feed.groupBy("client").applyInPandasWithState(
        _update,
        _OUT_SCHEMA,
        _STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )


def start_zscore_to_memory(
    spark: SparkSession,
    source_dir: str,
    table_name: str = "client_zscore_live",
) -> StreamingQuery:
    """Run the streaming z-score into an in-memory sink (test
    harness); append mode — each scored day is emitted once, final."""
    out = streaming_client_zscore(spark, source_dir)
    return (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName(table_name)
        .trigger(availableNow=True)
        .start()
    )
