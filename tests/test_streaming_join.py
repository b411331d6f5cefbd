"""Stream-stream windowed join (streaming/join.py): inner matches
within the attribution window only, batch ≡ stream parity, and
left-outer NULL emission gated on watermark passage."""

from __future__ import annotations

import datetime as dt

from piholelongtermstats_spark.streaming.join import start_conversions_to_memory
from piholelongtermstats_spark.streaming.rollup import STREAM_SCHEMA

T0 = dt.datetime.fromisoformat("2024-01-01T10:00:00")


def _write(spark, path, rows):
    spark.createDataFrame(rows, STREAM_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def _view(i, minute, client, domain="d1"):
    return (i, T0 + dt.timedelta(minutes=minute), client, domain, "Allowed", 0.1)


def _purchase(i, minute, client, domain="d1"):
    return (i, T0 + dt.timedelta(minutes=minute), client, domain, "Blocked", 0.1)


def test_inner_join_matches_within_window_only(spark, tmp_path):
    vdir, pdir = str(tmp_path / "v"), str(tmp_path / "p")
    _write(spark, vdir, [
        _view(1, 0, "c1"),    # converts at +10 → match
        _view(2, 0, "c2"),    # converts at +45 → OUTSIDE 30 min window
        _view(3, 5, "c3"),    # no purchase at all
        _view(4, 0, "c4"),    # two purchases in window → two matches
    ])
    _write(spark, pdir, [
        _purchase(101, 10, "c1"),
        _purchase(102, 45, "c2"),
        _purchase(103, 3, "c4"),
        _purchase(104, 20, "c4"),
        _purchase(105, 2, "c9"),  # purchase with no view
    ])
    q = start_conversions_to_memory(spark, vdir, pdir, "conv_inner")
    q.awaitTermination(120)
    got = sorted(
        (r.view_id, r.purchase_id)
        for r in spark.sql("SELECT * FROM conv_inner").collect()
    )
    assert got == [(1, 101), (4, 103), (4, 104)]


def test_left_outer_emits_unmatched_only_after_watermark(spark, tmp_path):
    """The unmatched view emits NULL-padded only once the GLOBAL
    watermark (min across BOTH inputs — one quiet side stalls it)
    passes view_ts + window, and physically during a LATER batch's
    eviction pass — hence late data on both sides, split across
    micro-batches via maxFilesPerTrigger=1."""
    vdir, pdir = str(tmp_path / "v2"), str(tmp_path / "p2")
    _write(spark, vdir, [_view(1, 0, "c1"), _view(2, 0, "c2")])
    _write(spark, pdir, [_purchase(101, 10, "c1")])
    q = start_conversions_to_memory(
        spark, vdir, pdir, "conv_lo1", how="left_outer"
    )
    q.awaitTermination(120)
    first = {
        (r.view_id, r.purchase_id)
        for r in spark.sql("SELECT * FROM conv_lo1").collect()
    }
    # the match emits immediately; the unmatched view must NOT — the
    # watermark hasn't proven a purchase can no longer arrive
    assert first == {(1, 101)}

    # advance BOTH sides' watermarks far past view_ts + window, with
    # trailing files so a later batch runs the eviction pass
    for m in (600, 660):
        _write(spark, vdir, [_view(90 + m, m, "c8")])
        _write(spark, pdir, [_purchase(190 + m, m, "c9")])
    q2 = start_conversions_to_memory(
        spark, vdir, pdir, "conv_lo2", how="left_outer",
        max_files_per_trigger=1,
    )
    q2.awaitTermination(240)
    second = {
        (r.view_id, r.purchase_id)
        for r in spark.sql("SELECT * FROM conv_lo2").collect()
    }
    assert (2, None) in second, second
    assert (1, 101) in second


def test_stream_matches_batch_join(spark, tmp_path):
    """Batch ≡ stream on the same files: the streamed inner matches
    equal a plain batch join with the identical range condition."""
    import pyspark.sql.functions as F

    vdir, pdir = str(tmp_path / "v3"), str(tmp_path / "p3")
    _write(spark, vdir, [_view(i, i % 50, f"c{i % 7}") for i in range(40)])
    _write(spark, pdir, [
        _purchase(100 + i, (i * 3) % 90, f"c{i % 7}") for i in range(40)
    ])
    q = start_conversions_to_memory(spark, vdir, pdir, "conv_b")
    q.awaitTermination(120)
    got = sorted(
        (r.view_id, r.purchase_id)
        for r in spark.sql("SELECT * FROM conv_b").collect()
    )
    # the batch side IS the registered, oracle-checked operator
    # (conversion_attribution) — this parity is the streaming bridge
    # that extends its oracle check to the stream-stream join
    from piholelongtermstats_spark.streaming.join import (
        attributed_conversions_batch,
    )

    fact = spark.read.schema(STREAM_SCHEMA).parquet(vdir).unionByName(
        spark.read.schema(STREAM_SCHEMA).parquet(pdir)
    )
    want = sorted(
        (r.view_id, r.purchase_id)
        for r in attributed_conversions_batch(fact).collect()
    )
    assert got == want and len(got) > 0
