"""Streaming Misra–Gries heavy hitters: per-shard guarantee bounds vs
exact batch counts, snapshot semantics, checkpoint recovery."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from piholelongtermstats_spark.streaming.heavyhitters import (
    K_COUNTERS,
    N_SHARDS,
    latest_sketch,
    shard_of,
    start_hh_to_memory,
    streaming_heavy_hitters,
)
from piholelongtermstats_spark.streaming.rollup import STREAM_SCHEMA


def _rows(spec, t0=None, eid0=0):
    """spec: list of (domain, count) — expands to STREAM_SCHEMA rows."""
    t0 = t0 or dt.datetime.fromisoformat("2024-01-01T10:00:00")
    rows, eid = [], eid0
    for domain, cnt in spec:
        for _ in range(cnt):
            eid += 1
            rows.append(
                (eid, t0 + dt.timedelta(seconds=eid), "c1", domain,
                 "Allowed", 0.1)
            )
    return rows


def _write(spark, path, rows):
    spark.createDataFrame(rows, STREAM_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def test_mg_guarantee_vs_exact_counts(spark, tmp_path):
    """Every item heavier than n_shard/(k+1) within its shard survives
    the stream sketch, and sketch counts undercount by at most
    ⌊n_shard/(k+1)⌋ — the MG bounds, measured against exact batch
    counts over the same files."""
    src = str(tmp_path / "hh_src")
    spec = [(f"heavy{i}.com", 40 + 7 * i) for i in range(4)] + [
        (f"tail{i}.com", 2) for i in range(60)
    ]
    rows = _rows(spec)
    # two triggers: split the rows across two files
    _write(spark, src, rows[: len(rows) // 2])
    _write(spark, src, rows[len(rows) // 2:])
    q = start_hh_to_memory(spark, src, "hh_t1")
    q.awaitTermination(120)
    sketch = {
        (r.shard, r.item): (r.mg_count, r.n_shard)
        for r in latest_sketch(spark, "hh_t1").collect()
    }
    exact = {}
    shard_n = {}
    for domain, cnt in spec:
        s = shard_of(domain)
        exact[(s, domain)] = exact.get((s, domain), 0) + cnt
        shard_n[s] = shard_n.get(s, 0) + cnt
    k = K_COUNTERS
    for (s, item), true_cnt in exact.items():
        bound = shard_n[s] // (k + 1)
        if true_cnt > bound:
            assert (s, item) in sketch, (s, item, true_cnt, bound)
        if (s, item) in sketch:
            mg, n_sh = sketch[(s, item)]
            assert n_sh == shard_n[s]
            assert mg <= true_cnt <= mg + bound, (item, mg, true_cnt, bound)


def test_sketch_state_is_bounded(spark, tmp_path):
    """≤ k counters per shard regardless of distinct-domain count."""
    src = str(tmp_path / "hh_bound_src")
    _write(spark, src, _rows([(f"d{i}.com", 1) for i in range(500)]))
    q = start_hh_to_memory(spark, src, "hh_t2")
    q.awaitTermination(120)
    per_shard = (
        latest_sketch(spark, "hh_t2")
        .groupBy("shard")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert all(r.n <= K_COUNTERS for r in per_shard)


def test_checkpoint_recovery_continues_counts(spark, tmp_path):
    """Drain, stop, land more data, restart on the SAME checkpoint:
    n_shard accumulates across restarts (the sketch is durable
    state, not a per-run scratchpad)."""
    src = str(tmp_path / "hh_ck_src")
    out = str(tmp_path / "hh_ck_out")
    ckpt = str(tmp_path / "hh_ck")
    spec1 = [("big.com", 30), ("mid.com", 10)]
    _write(spark, src, _rows(spec1))

    def drain():
        q = (
            streaming_heavy_hitters(spark, src)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain()
    spec2 = [("big.com", 25)]
    _write(spark, src, _rows(spec2, eid0=10000))
    drain()
    snap = spark.read.parquet(out)
    last = snap.groupBy("shard").agg(F.max("seq").alias("seq"))
    final = {
        r.item: (r.mg_count, r.n_shard)
        for r in snap.join(last, ["shard", "seq"]).collect()
    }
    # only two distinct items in big.com's shard history -> exact
    assert final["big.com"][0] == 55
    s_big, s_mid = shard_of("big.com"), shard_of("mid.com")
    want_n = 55 + (10 if s_mid == s_big else 0)
    assert final["big.com"][1] == want_n
