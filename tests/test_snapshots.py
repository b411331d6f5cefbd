"""Versioned snapshots (sources/snapshots.py): commit chain,
time-travel reads, immutability, crash-safety, and diff algebra."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from piholelongtermstats_spark.sources import snapshots as snap


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_version_chain_and_time_travel(spark, tmp_path):
    root = str(tmp_path / "snaps")
    v0 = snap.write_snapshot(_df(spark, [(1, "a"), (2, "b")]), root)
    v1 = snap.write_snapshot(_df(spark, [(1, "a2"), (3, "c")]), root)
    assert (v0, v1) == (0, 1)
    assert snap.versions(root) == [0, 1]
    # time travel: v0 unchanged after v1 commit
    old = snap.read_snapshot(spark, root, 0)
    assert sorted((r.doc_id, r.text) for r in old.collect()) == [(1, "a"), (2, "b")]
    head = snap.read_snapshot(spark, root)  # chain head
    assert sorted(r.doc_id for r in head.collect()) == [1, 3]
    m = json.load(open(os.path.join(root, "v=1", "_MANIFEST.json")))
    assert m["parent"] == 0 and m["n_rows"] == 2


def test_uncommitted_directory_is_invisible(spark, tmp_path):
    root = str(tmp_path / "snaps2")
    snap.write_snapshot(_df(spark, [(1, "a")]), root)
    # simulate a crashed writer: parquet dir exists, manifest missing
    _df(spark, [(9, "x")]).write.parquet(os.path.join(root, "v=1"))
    assert snap.versions(root) == [0]
    assert snap.read_snapshot(spark, root).first().doc_id == 1
    # the next commit does NOT reuse the torn directory's number: the
    # rename-as-claim skips the burned slot and commits cleanly at 2
    # (r7: previously this raised; now the writer terminates)
    assert snap.write_snapshot(_df(spark, [(2, "b")]), root) == 2
    assert snap.versions(root) == [0, 2]
    assert snap.read_snapshot(spark, root).first().doc_id == 2


def test_diff_algebra(spark, tmp_path):
    root = str(tmp_path / "snaps3")
    snap.write_snapshot(_df(spark, [(1, "a"), (2, "b"), (3, "c")]), root)
    snap.write_snapshot(_df(spark, [(2, "b"), (3, "c2"), (4, "d")]), root)
    diff = {
        (r.change_type, r.doc_id)
        for r in snap.snapshot_diff(spark, root, 0, 1).collect()
    }
    assert diff == {("removed", 1), ("changed", 3), ("added", 4)}


def test_diff_null_keys_classify_by_side(spark, tmp_path):
    """NULL keys never equi-match, so a NULL-key row is 'removed' when
    it lives in the old version and 'added' when in the new — pinned
    because the r12 full-outer rewrite decides the side via presence
    flags (key nullability alone would misclassify an old-side NULL
    row as 'added')."""
    root = str(tmp_path / "snaps_null")
    snap.write_snapshot(_df(spark, [(1, "a"), (None, "ghost-old")]), root)
    snap.write_snapshot(_df(spark, [(1, "a"), (None, "ghost-new")]), root)
    diff = {
        (r.change_type, r.doc_id)
        for r in snap.snapshot_diff(spark, root, 0, 1).collect()
    }
    assert diff == {("removed", None), ("added", None)}


def test_read_missing_version_raises(spark, tmp_path):
    root = str(tmp_path / "snaps4")
    with pytest.raises(FileNotFoundError):
        snap.read_snapshot(spark, root)
    snap.write_snapshot(_df(spark, [(1, "a")]), root)
    with pytest.raises(FileNotFoundError):
        snap.read_snapshot(spark, root, 7)


def test_commit_version_idempotent_replay(spark, tmp_path):
    root = str(tmp_path / "snaps5")
    df = _df(spark, [(1, "a")])
    assert snap.commit_version(df, root, 0) is True
    # replay (same batchId): no-op, data unchanged
    assert snap.commit_version(_df(spark, [(9, "z")]), root, 0) is False
    assert snap.read_snapshot(spark, root, 0).first().doc_id == 1
    # torn directory (crash before manifest) → cleaned and rewritten
    import shutil

    _df(spark, [(7, "torn")]).write.parquet(os.path.join(root, "v=1"))
    assert snap.commit_version(_df(spark, [(2, "b")]), root, 1) is True
    assert snap.read_snapshot(spark, root, 1).first().doc_id == 2


def test_streaming_snapshot_sink_effectively_once(spark, tmp_path):
    """Each micro-batch commits version=batchId; rerunning the stream
    over the same source with a FRESH checkpoint (forcing batch
    replay from scratch) must not change committed versions."""
    import datetime as dt

    from piholelongtermstats_spark.streaming.rollup import STREAM_SCHEMA
    from piholelongtermstats_spark.streaming.snapshot_sink import (
        start_snapshot_sink,
    )

    src = str(tmp_path / "snap_src")
    root = str(tmp_path / "snap_root")
    t0 = dt.datetime.fromisoformat("2024-01-01T10:00:00")
    spark.createDataFrame(
        [(1, t0, "c1", "d1", "Allowed", 0.1)], STREAM_SCHEMA
    ).coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema(STREAM_SCHEMA).parquet(src)
    q = start_snapshot_sink(stream, root, str(tmp_path / "ck1"))
    q.awaitTermination(60)
    assert snap.versions(root) == [0]
    n0 = snap.read_snapshot(spark, root, 0).count()
    assert n0 == 1

    # replay from a fresh checkpoint: batch 0 re-runs, commit no-ops
    stream2 = spark.readStream.schema(STREAM_SCHEMA).parquet(src)
    q2 = start_snapshot_sink(stream2, root, str(tmp_path / "ck2"))
    q2.awaitTermination(60)
    assert snap.versions(root) == [0]
    assert snap.read_snapshot(spark, root, 0).count() == 1


def test_scd2_three_version_fold(spark, tmp_path):
    """General N-version fold: change, absence gap (same content
    returning → NEW run), and currency flags."""
    root = str(tmp_path / "scd2")
    snap.write_snapshot(_df(spark, [(1, "a"), (2, "b")]), root)      # v0
    snap.write_snapshot(_df(spark, [(1, "a2")]), root)               # v1: 1 changed, 2 absent
    snap.write_snapshot(_df(spark, [(1, "a2"), (2, "b")]), root)     # v2: 2 returns, same content
    hist = snap.scd2_history(spark, root)
    rows = [
        (r.doc_id, r.valid_from, r.valid_to, r.is_current)
        for r in hist.collect()
    ]
    assert sorted(rows) == [
        (1, 0, 0, False),   # "a"
        (1, 1, 2, True),    # "a2" spans v1-v2
        (2, 0, 0, False),   # "b" first run, ended by absence
        (2, 2, 2, True),    # "b" returns as a NEW run
    ]


def test_compact_retention(spark, tmp_path):
    """compact(root, keep_last=N): retained versions byte-identical
    (time-travel reads and diffs unchanged), dropped versions gone,
    lineage folded into the oldest retained manifest."""
    root = str(tmp_path / "compact")
    for i in range(5):
        snap.write_snapshot(
            _df(spark, [(1, f"a{i}"), (2, "b"), (i + 10, "x")]), root
        )
    pre_v3 = sorted(
        (r.doc_id, r.text) for r in snap.read_snapshot(spark, root, 3).collect()
    )
    pre_diff = sorted(
        (r.change_type, r.doc_id)
        for r in snap.snapshot_diff(spark, root, 3, 4).collect()
    )
    dropped = snap.compact(root, keep_last=2)
    assert dropped == [0, 1, 2]
    assert snap.versions(root) == [3, 4]
    # retained snapshots unchanged (self-contained full snapshots)
    post_v3 = sorted(
        (r.doc_id, r.text) for r in snap.read_snapshot(spark, root, 3).collect()
    )
    assert post_v3 == pre_v3
    # diff between retained versions preserved
    post_diff = sorted(
        (r.change_type, r.doc_id)
        for r in snap.snapshot_diff(spark, root, 3, 4).collect()
    )
    assert post_diff == pre_diff
    # dropped versions unreadable
    with pytest.raises(FileNotFoundError):
        snap.read_snapshot(spark, root, 1)
    # lineage folded into the oldest retained manifest, parent cut
    m = json.load(open(os.path.join(root, "v=3", "_MANIFEST.json")))
    assert [e["version"] for e in m["compacted_parents"]] == [0, 1, 2]
    assert m["parent"] is None
    # no-op on rerun
    assert snap.compact(root, keep_last=2) == []
    # scd2 still folds over the retained chain
    hist = snap.scd2_history(spark, root)
    assert hist.filter(F.col("doc_id") == 2).count() == 1


def test_compact_crash_rerun_no_duplicate_lineage(spark, tmp_path):
    """A crash between manifest rewrite and directory removal leaves
    old dirs behind; the rerun finishes removal WITHOUT refolding
    versions already in the lineage."""
    root = str(tmp_path / "compact_crash")
    for i in range(4):
        snap.write_snapshot(_df(spark, [(1, f"t{i}")]), root)
    # simulate the crash: rewrite the base manifest as compact would,
    # but leave v=0/v=1 directories in place
    base_mp = os.path.join(root, "v=2", "_MANIFEST.json")
    m = json.load(open(base_mp))
    m["compacted_parents"] = [
        {"version": 0, "parent": None, "n_rows": 1},
        {"version": 1, "parent": 0, "n_rows": 1},
    ]
    m["parent"] = None
    with open(base_mp, "w") as f:
        json.dump(m, f)
    dropped = snap.compact(root, keep_last=2)
    assert dropped == [0, 1]
    assert snap.versions(root) == [2, 3]
    m2 = json.load(open(base_mp))
    assert [e["version"] for e in m2["compacted_parents"]] == [0, 1]


def test_compact_layered_lineage(spark, tmp_path):
    """Compacting twice carries the earlier fold's lineage forward."""
    root = str(tmp_path / "compact2x")
    for i in range(4):
        snap.write_snapshot(_df(spark, [(1, f"t{i}")]), root)
    assert snap.compact(root, keep_last=3) == [0]
    snap.write_snapshot(_df(spark, [(1, "t4")]), root)  # v4
    assert snap.compact(root, keep_last=2) == [1, 2]
    m = json.load(open(os.path.join(root, "v=3", "_MANIFEST.json")))
    assert [e["version"] for e in m["compacted_parents"]] == [0, 1, 2]
    with pytest.raises(ValueError):
        snap.compact(root, keep_last=0)


def test_two_concurrent_writers_get_distinct_linear_versions(spark, tmp_path):
    """r6 VERDICT #5: stage + rename-as-claim — two writers racing the
    same root both terminate cleanly with distinct committed versions,
    the parent chain is linear, and nothing is orphaned."""
    import threading

    root = str(tmp_path / "concurrent")
    a = spark.range(10).withColumn("val", F.lit("a"))
    b = spark.range(20).withColumn("val", F.lit("b"))
    results, errors = {}, []
    barrier = threading.Barrier(2)

    def writer(name, df):
        try:
            barrier.wait(timeout=60)
            results[name] = snap.write_snapshot(df, root)
        except Exception as e:  # noqa: BLE001
            errors.append((name, e))

    threads = [
        threading.Thread(target=writer, args=("a", a)),
        threading.Thread(target=writer, args=("b", b)),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert not errors, errors
    assert sorted(results.values()) == [0, 1]
    assert snap.versions(root) == [0, 1]
    # no orphaned staging dirs or unclaimed version dirs
    staging = os.path.join(root, "_staging")
    assert not os.path.isdir(staging) or os.listdir(staging) == []
    assert sorted(d for d in os.listdir(root) if d.startswith("v=")) == [
        "v=0", "v=1",
    ]
    # linear parent chain regardless of which writer won which slot
    with open(os.path.join(root, "v=0", "_MANIFEST.json")) as f:
        m0 = json.load(f)
    with open(os.path.join(root, "v=1", "_MANIFEST.json")) as f:
        m1 = json.load(f)
    assert m0["parent"] is None and m1["parent"] == 0
    # both snapshots read back whole
    n_by_version = sorted(
        snap.read_snapshot(spark, root, v).count() for v in (0, 1)
    )
    assert n_by_version == [10, 20]


def test_burned_version_number_does_not_split_scd2_runs(spark, tmp_path):
    """A claimed-but-uncommitted directory (crashed writer) burns its
    number; scd2_history folds runs by committed-chain adjacency, so
    the gap must NOT split a constant-content run."""
    root = str(tmp_path / "burned")
    df = spark.range(5).withColumn("val", F.lit("x"))
    assert snap.write_snapshot(df, root) == 0
    assert snap.write_snapshot(df, root) == 1
    # simulate a crashed concurrent claim: data dir without manifest
    os.makedirs(os.path.join(root, "v=2"))
    assert snap.write_snapshot(df, root) == 3  # number 2 is burned
    assert snap.versions(root) == [0, 1, 3]
    hist = snap.scd2_history(spark, root, key="id").collect()
    # one run per key spanning the whole committed chain
    assert len(hist) == 5
    assert all(r.valid_from == 0 and r.valid_to == 3 and r.is_current for r in hist)


def test_merge_upsert_semantics_and_diff_audit(spark, tmp_path):
    """MERGE: matched-update, not-matched-insert, matched-delete,
    untouched carry-over; pre-merge version still readable and
    snapshot_diff(v0, v1) reports exactly the applied changes."""
    root = str(tmp_path / "merge")
    base = spark.createDataFrame(
        [(i, f"text {i}") for i in range(6)], "doc_id long, text string"
    )
    assert snap.write_snapshot(base, root) == 0
    changes = spark.createDataFrame(
        [
            (1, "text 1 v2", "upsert"),   # update
            (9, "brand new", "upsert"),   # insert
            (2, None, "delete"),          # delete
            (7, None, "delete"),          # delete of absent key: no-op
        ],
        "doc_id long, text string, _op string",
    )
    v1 = snap.merge_upsert(spark, root, changes)
    assert v1 == 1
    head = {r.doc_id: r.text for r in snap.read_snapshot(spark, root).collect()}
    assert head == {0: "text 0", 1: "text 1 v2", 3: "text 3",
                    4: "text 4", 5: "text 5", 9: "brand new"}
    # immutable history
    v0 = {r.doc_id for r in snap.read_snapshot(spark, root, 0).collect()}
    assert v0 == set(range(6))
    diff = {(r.change_type, r.doc_id)
            for r in snap.snapshot_diff(spark, root, 0, 1).collect()}
    assert diff == {("changed", 1), ("added", 9), ("removed", 2)}
    # invalid op rejected
    import pytest as _pytest

    bad = spark.createDataFrame([(1, "x", "replace")],
                                "doc_id long, text string, _op string")
    with _pytest.raises(ValueError):
        snap.merge_upsert(spark, root, bad)


def test_streaming_merge_sink_cdc_apply_and_replay(spark, tmp_path):
    """CDC merge sink: micro-batches of change rows MERGE into the
    chain; replaying the stream from a fresh checkpoint (same
    batchIds) no-ops via the batch-id watermark instead of minting
    duplicate versions."""
    from piholelongtermstats_spark.streaming.snapshot_sink import (
        start_merge_sink,
    )

    CDC_SCHEMA = "doc_id long, text string, _op string"
    src = str(tmp_path / "cdc_src")
    root = str(tmp_path / "cdc_root")
    # batch 0: initial inserts (one file => one availableNow batch)
    spark.createDataFrame(
        [(1, "a", "upsert"), (2, "b", "upsert")], CDC_SCHEMA
    ).coalesce(1).write.mode("append").parquet(src)
    q = start_merge_sink(
        spark.readStream.schema(CDC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src),
        root,
        str(tmp_path / "ck1"),
    )
    q.awaitTermination(120)
    assert snap.versions(root) == [0]
    # batch 1: update 1, delete 2, insert 3
    spark.createDataFrame(
        [(1, "a2", "upsert"), (2, None, "delete"), (3, "c", "upsert")],
        CDC_SCHEMA,
    ).coalesce(1).write.mode("append").parquet(src)
    q2 = start_merge_sink(
        spark.readStream.schema(CDC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src),
        root,
        str(tmp_path / "ck1"),  # same checkpoint: continues at batch 1
    )
    q2.awaitTermination(120)
    head = {r.doc_id: r.text for r in snap.read_snapshot(spark, root).collect()}
    assert head == {1: "a2", 3: "c"}
    n_versions = len(snap.versions(root))
    assert snap.applied_batch_id(root) == 1
    # fresh checkpoint: batches 0 and 1 REPLAY; watermark no-ops both
    q3 = start_merge_sink(
        spark.readStream.schema(CDC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src),
        root,
        str(tmp_path / "ck2"),
    )
    q3.awaitTermination(120)
    assert len(snap.versions(root)) == n_versions
    head2 = {r.doc_id: r.text for r in snap.read_snapshot(spark, root).collect()}
    assert head2 == head
