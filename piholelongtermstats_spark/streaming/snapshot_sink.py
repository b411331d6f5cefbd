"""Streaming snapshot sink: every micro-batch commits an immutable
corpus version keyed by its batchId.

Effectively-once without a transaction log: Structured Streaming
replays a failed batch with the SAME batchId, and
snapshots.commit_version is idempotent per version — a replayed batch
finds the committed manifest and no-ops, a torn directory from the
crash is cleaned and rewritten. This is the standard idempotent-sink
contract (the same reasoning as foreachBatch-to-JDBC-with-
transaction-id), here giving the corpus a TIME-TRAVELABLE ingest
history: `snapshots.read_snapshot(root, v)` is the corpus as of
micro-batch v, and `snapshot_diff` audits what each batch added.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from piholelongtermstats_spark.sources import snapshots


def start_snapshot_sink(
    stream: DataFrame,
    root: str,
    checkpoint: str,
) -> StreamingQuery:
    """foreachBatch sink committing each micro-batch as version =
    batchId under ``root``."""

    def _commit(batch: DataFrame, batch_id: int) -> None:
        snapshots.commit_version(batch, root, int(batch_id))

    return (
        stream.writeStream.foreachBatch(_commit)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
