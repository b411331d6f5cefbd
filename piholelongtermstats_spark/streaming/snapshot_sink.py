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


def start_merge_sink(
    stream: DataFrame,
    root: str,
    checkpoint: str,
    key: str = "doc_id",
    op_col: str = "_op",
) -> StreamingQuery:
    """CDC apply: each micro-batch is a CHANGE SET (rows carrying
    ``op_col`` ∈ upsert|delete) MERGED into the snapshot chain —
    the streaming half of sources/snapshots.merge_upsert. Replay
    safety comes from the batch-id watermark in the manifests
    (merge_upsert_once), not from the changes being idempotent: a
    replayed batch no-ops instead of minting a duplicate version."""

    def _apply(batch: DataFrame, batch_id: int) -> None:
        snapshots.merge_upsert_once(
            batch.sparkSession, root, batch, int(batch_id), key, op_col
        )

    return (
        stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
