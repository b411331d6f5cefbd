"""End-to-end streaming composition (r5 VERDICT #9): stream-static
enrichment → snapshot sink → time-travel read-back → heavy hitters.

The three pieces (streaming/enrich.py, streaming/snapshot_sink.py,
streaming/topk.py) are individually tested; this file pins the SEAM:
enriched micro-batches committed as immutable versions, the versioned
history reassembling to exactly the batch answer, and the serving-edge
heavy-hitter rank agreeing between the streamed history and a direct
batch computation over the same source."""

from __future__ import annotations

import datetime as dt
from functools import reduce

from pyspark.sql import functions as F

from piholelongtermstats_spark.sources import snapshots as snap
from piholelongtermstats_spark.streaming.enrich import DIM_SCHEMA, enriched_stream
from piholelongtermstats_spark.streaming.rollup import STREAM_SCHEMA
from piholelongtermstats_spark.streaming.snapshot_sink import start_snapshot_sink
from piholelongtermstats_spark.streaming.topk import topk_over_counts


def _write_file(spark, path, rows):
    spark.createDataFrame(rows, STREAM_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def _hourly_counts(df):
    return (
        df.groupBy(F.window("ts", "1 hour").alias("w"), "domain")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("w.start").alias("hour_bucket"), "domain", "cnt")
    )


def test_e2e_enriched_versions_reassemble_and_rank(spark, tmp_path):
    src = str(tmp_path / "src")
    dimp = str(tmp_path / "dim")
    root = str(tmp_path / "versions")
    ckpt = str(tmp_path / "ckpt")
    t0 = dt.datetime.fromisoformat("2024-01-01T10:00:00")

    spark.createDataFrame(
        [("c1", "home"), ("c2", "office")], DIM_SCHEMA
    ).write.parquet(dimp)
    # three files → maxFilesPerTrigger=1 → three micro-batches
    _write_file(spark, src, [
        (1, t0, "c1", "d1", "Allowed", 0.1),
        (2, t0 + dt.timedelta(minutes=5), "c2", "d1", "Blocked", 0.2),
    ])
    _write_file(spark, src, [
        (3, t0 + dt.timedelta(minutes=10), "c1", "d2", "Allowed", 0.3),
        (4, t0 + dt.timedelta(minutes=70), "c9", "d1", "Allowed", 0.1),
    ])
    _write_file(spark, src, [
        (5, t0 + dt.timedelta(minutes=75), "c2", "d2", "Allowed", 0.2),
    ])

    q = start_snapshot_sink(
        enriched_stream(spark, src, dimp, max_files_per_trigger=1), root, ckpt
    )
    q.awaitTermination(120)

    # one committed immutable version per micro-batch
    assert snap.versions(root) == [0, 1, 2]

    # time-travel reassembly: the union of versions is row-for-row the
    # batch enrichment of the full source (labels included)
    union = reduce(
        lambda a, b: a.unionByName(b),
        [snap.read_snapshot(spark, root, v) for v in snap.versions(root)],
    )
    dim = spark.read.schema(DIM_SCHEMA).parquet(dimp)
    batch = spark.read.schema(STREAM_SCHEMA).parquet(src).join(
        F.broadcast(dim), "client", "left"
    )
    key = lambda r: (r.event_id, r.client, r.domain, r.client_label)  # noqa: E731
    assert sorted(map(key, union.collect())) == sorted(map(key, batch.collect()))
    # the unmatched client flowed through with a NULL label
    assert {r.client_label for r in union.filter(F.col("client") == "c9").collect()} == {None}

    # heavy hitters over the streamed history ≡ over the batch source
    got = [
        (r.hour_bucket, r.domain, r.cnt, r.rank)
        for r in topk_over_counts(_hourly_counts(union), k=2).collect()
    ]
    want = [
        (r.hour_bucket, r.domain, r.cnt, r.rank)
        for r in topk_over_counts(_hourly_counts(batch), k=2).collect()
    ]
    h10 = t0
    h11 = t0 + dt.timedelta(hours=1)
    assert got == want == [
        (h10, "d1", 2, 1),
        (h10, "d2", 1, 2),
        (h11, "d1", 1, 1),
        (h11, "d2", 1, 2),
    ]

    # fresh-checkpoint replay: commit_version no-ops on committed ids —
    # the history is effectively-once even without the checkpoint
    q2 = start_snapshot_sink(
        enriched_stream(spark, src, dimp, max_files_per_trigger=1),
        root,
        str(tmp_path / "ckpt2"),
    )
    q2.awaitTermination(120)
    assert snap.versions(root) == [0, 1, 2]
    union2 = reduce(
        lambda a, b: a.unionByName(b),
        [snap.read_snapshot(spark, root, v) for v in snap.versions(root)],
    )
    assert sorted(map(key, union2.collect())) == sorted(map(key, union.collect()))

    # and the audit trail: each version's diff vs the previous shows
    # only additions (append-only ingest)
    d = snap.snapshot_diff(spark, root, 0, 1, key="event_id")
    assert {r.change_type for r in d.collect()} <= {"added", "removed"}
    # versions are per-batch sets, so old ids read as removed and new
    # as added; CONTENT never mutates across the chain
    changed = d.filter(F.col("change_type") == "changed").count()
    assert changed == 0
