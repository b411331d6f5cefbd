"""Streaming windowed heavy hitters (streaming/topk.py): append-mode
finalization semantics, batch ≡ stream count parity over finalized
windows, and deterministic top-k ties at the serving edge."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from piholelongtermstats_spark.streaming.rollup import STREAM_SCHEMA
from piholelongtermstats_spark.streaming.topk import (
    start_domain_counts_to_memory,
    topk_over_counts,
)


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, STREAM_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def _rows(t0, spec):
    """spec: list of (minute_offset, domain) → enriched-event tuples."""
    return [
        (i, t0 + dt.timedelta(minutes=m), "c1", d, "Allowed", 0.1)
        for i, (m, d) in enumerate(spec)
    ]


def test_append_mode_emits_only_finalized_windows(spark, tmp_path):
    src = str(tmp_path / "topk_src")
    t0 = dt.datetime.fromisoformat("2024-01-01T10:00:00")
    # hour 10: d1×3, d2×2, d3×1; hour 11: d2×1
    spec = [(0, "d1"), (5, "d1"), (10, "d1"), (15, "d2"), (20, "d2"), (25, "d3"), (70, "d2")]
    _write_batch(spark, src, _rows(t0, spec))
    q = start_domain_counts_to_memory(spark, src, "topk_t1")
    q.awaitTermination(60)
    # watermark after batch 1 = 11:10 − 2h → nothing finalized yet
    assert spark.sql("SELECT * FROM topk_t1").count() == 0

    # a later drop advances the watermark past hour 10 (and 11)
    _write_batch(spark, src, _rows(t0, [(300, "d9")]))
    q2 = start_domain_counts_to_memory(spark, src, "topk_t2")
    q2.awaitTermination(60)
    counts = spark.sql("SELECT * FROM topk_t2")
    h10 = dt.datetime.fromisoformat("2024-01-01T10:00:00")
    h11 = dt.datetime.fromisoformat("2024-01-01T11:00:00")
    got = {(r.hour_bucket, r.domain): r.cnt for r in counts.collect()}
    assert got == {
        (h10, "d1"): 3,
        (h10, "d2"): 2,
        (h10, "d3"): 1,
        (h11, "d2"): 1,
    }

    # serving-edge rank: batch ≡ stream — same top-k as the batch
    # groupBy over the finalized windows' raw rows
    top = topk_over_counts(counts, k=2).collect()
    assert [(r.hour_bucket, r.domain, r.cnt, r.rank) for r in top] == [
        (h10, "d1", 3, 1),
        (h10, "d2", 2, 2),
        (h11, "d2", 1, 1),
    ]


def test_topk_tie_break_pinned(spark):
    h = dt.datetime.fromisoformat("2024-01-01T10:00:00")
    counts = spark.createDataFrame(
        [(h, "zeta", 5), (h, "alpha", 5), (h, "mid", 7)],
        "hour_bucket timestamp, domain string, cnt long",
    )
    top = topk_over_counts(counts, k=2).collect()
    # cnt DESC then domain ASC: mid(7), alpha(5) — zeta loses the tie
    assert [(r.domain, r.rank) for r in top] == [("mid", 1), ("alpha", 2)]


def test_serving_rank_is_window_group_limit(spark):
    h = dt.datetime.fromisoformat("2024-01-01T10:00:00")
    counts = spark.createDataFrame(
        [(h, "a", 1)], "hour_bucket timestamp, domain string, cnt long"
    )
    df = topk_over_counts(counts)
    plan = df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "WindowGroupLimit" in plan, plan


def test_stream_static_enrichment_sees_dim_updates(spark, tmp_path):
    """The static dim side is re-planned per run: rows ingested after
    a dim relabel carry the NEW label, earlier rows keep the label
    they were enriched with; unmatched clients flow with NULL."""
    import datetime as dt

    from piholelongtermstats_spark.streaming.enrich import (
        DIM_SCHEMA,
        start_enriched_to_memory,
    )

    src = str(tmp_path / "enr_src")
    dimp = str(tmp_path / "enr_dim")
    t0 = dt.datetime.fromisoformat("2024-01-01T10:00:00")
    spark.createDataFrame([("c1", "home")], DIM_SCHEMA).write.mode(
        "overwrite"
    ).parquet(dimp)
    _write_batch(spark, src, [(1, t0, "c1", "d1", "Allowed", 0.1),
                              (2, t0, "c9", "d1", "Allowed", 0.1)])
    q = start_enriched_to_memory(spark, src, dimp, "enr_t1")
    q.awaitTermination(60)
    got = {r.event_id: r.client_label for r in spark.sql("SELECT * FROM enr_t1").collect()}
    assert got == {1: "home", 2: None}

    # relabel the dim, drop more events: the new run enriches with the
    # updated dimension
    spark.createDataFrame([("c1", "office")], DIM_SCHEMA).write.mode(
        "overwrite"
    ).parquet(dimp)
    _write_batch(spark, src, [(3, t0, "c1", "d1", "Allowed", 0.1)])
    q2 = start_enriched_to_memory(spark, src, dimp, "enr_t2")
    q2.awaitTermination(60)
    got2 = {r.event_id: r.client_label for r in spark.sql("SELECT * FROM enr_t2").collect()}
    assert got2[3] == "office"
