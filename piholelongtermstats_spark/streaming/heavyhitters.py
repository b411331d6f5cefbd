"""Streaming Misra–Gries heavy hitters — SKETCH MAINTENANCE as
stateful streaming (the streaming sibling of the batch two-pass MG in
operators/freq.py): keep a k-counter MG summary per shard that is
updated incrementally as events land, so "what are the heavy domains
RIGHT NOW" never rescans history.

Sharding: each item (domain) maps to exactly ONE shard
(md5 60-bit mod n_shards), so per-shard summaries preserve the MG
guarantee — an item with global count > N/(k+1) has, within its own
shard, count > n_shard/(k+1) (n_shard ≤ N), hence survives that
shard's sketch. Union of shard sketches ⊇ global heavy hitters, with
per-item undercount ≤ ⌊n_shard/(k+1)⌋ (tests/test_streaming_hh.py
pins both bounds against exact batch counts).

State per shard: ≤ k (item, count) pairs + the processed-row count —
the canonical MG invariant state, constant-bounded bytes per shard at
ANY stream length. This is the applyInPandasWithState pattern of
streaming/ewma.py applied to a sketch instead of a recurrence; no
protobuf needed (Arrow protocol).

Emission: after each trigger every updated shard emits a SNAPSHOT of
its sketch tagged with a per-shard monotonically increasing seq
(append mode streams immutable snapshot rows; readers take the max
seq per shard — the CDC-manifest convention)."""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from piholelongtermstats_spark.streaming.rollup import STREAM_SCHEMA

N_SHARDS = 8
K_COUNTERS = 10

_OUT_SCHEMA = (
    "shard int, seq long, item string, mg_count long, n_shard long"
)
_STATE_SCHEMA = (
    "items array<string>, counts array<long>, n long, seq long"
)


def shard_of(domain: str, n_shards: int = N_SHARDS) -> int:
    """The engine-wide 60-bit md5 primitive, mod n_shards — identical
    to the Column expression in streaming_heavy_hitters."""
    return int(hashlib.md5(domain.encode()).hexdigest()[:15], 16) % n_shards


def _mg_update(k: int):
    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            items, counts, n, seq = state.get
            sketch = dict(zip(list(items), list(counts)))
        else:
            sketch, n, seq = {}, 0, 0
        for pdf in pdfs:
            for d in pdf["domain"]:
                n += 1
                if d in sketch:
                    sketch[d] += 1
                elif len(sketch) < k:
                    sketch[d] = 1
                else:
                    # decrement-all: the MG subtraction step (never
                    # the filter-only variant — operators/freq.py
                    # pins the invariant it would break)
                    for it in list(sketch):
                        sketch[it] -= 1
                        if sketch[it] == 0:
                            del sketch[it]
        seq += 1
        state.update(
            (list(sketch.keys()), [int(v) for v in sketch.values()], n, seq)
        )
        if sketch:
            yield pd.DataFrame(
                {
                    "shard": int(key[0]),
                    "seq": seq,
                    "item": list(sketch.keys()),
                    "mg_count": [int(v) for v in sketch.values()],
                    "n_shard": n,
                }
            )

    return update


def streaming_heavy_hitters(
    spark: SparkSession,
    source_dir: str,
    k: int = K_COUNTERS,
    n_shards: int = N_SHARDS,
) -> DataFrame:
    """Streaming plan: per-shard MG sketch snapshots after each
    trigger."""
    events = (
        spark.readStream.schema(STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(source_dir)
    )
    sharded = events.select(
        (
            F.conv(F.substring(F.md5(F.col("domain")), 1, 15), 16, 10)
            .cast("long")
            % n_shards
        ).cast("int").alias("shard"),
        "domain",
    )
    return sharded.groupBy("shard").applyInPandasWithState(
        _mg_update(k),
        _OUT_SCHEMA,
        _STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )


def start_hh_to_memory(
    spark: SparkSession,
    source_dir: str,
    table_name: str = "hh_live",
    k: int = K_COUNTERS,
    n_shards: int = N_SHARDS,
) -> StreamingQuery:
    out = streaming_heavy_hitters(spark, source_dir, k, n_shards)
    return (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName(table_name)
        .trigger(availableNow=True)
        .start()
    )


def latest_sketch(spark: SparkSession, table_name: str) -> DataFrame:
    """The current global candidate set: max-seq snapshot per shard,
    unioned. (Readers of a parquet sink run the identical max-seq
    cut.)"""
    from pyspark.sql import Window

    snap = spark.table(table_name)
    mx = F.max("seq").over(Window.partitionBy("shard"))
    return (
        snap.withColumn("_mx", mx)
        .filter(F.col("seq") == F.col("_mx"))
        .select("shard", "item", "mg_count", "n_shard")
    )
