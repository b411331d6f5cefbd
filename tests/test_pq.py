"""Product quantization (operators/pq.py): determinism, encode shape,
recall vs the exact scan, and the no-shuffle ADC scan property."""

from __future__ import annotations

from pyspark.sql import functions as F

from piholelongtermstats_spark.operators import pq, similarity

SF = "/root/testdata/sf0.001"


def _emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_codebooks_deterministic_and_shaped(spark):
    emb = _emb(spark)
    a = pq.train_pq_codebooks(emb, n_iters=1)
    b = pq.train_pq_codebooks(emb, n_iters=1)
    assert a == b
    assert len(a) == pq.N_SUB
    assert all(len(cb) == pq.N_CODES for cb in a)
    assert all(len(code) == 64 // pq.N_SUB for cb in a for code in cb)


def test_encode_codes_in_range(spark):
    emb = _emb(spark)
    cbs = pq.train_pq_codebooks(emb, n_iters=1)
    enc = pq.encode_pq(emb, cbs)
    bad = enc.filter(
        (F.array_min("codes") < 0)
        | (F.array_max("codes") >= pq.N_CODES)
        | (F.size("codes") != pq.N_SUB)
    ).count()
    assert bad == 0
    assert enc.count() == emb.count()


def test_pq_recall_vs_exact(spark):
    emb = _emb(spark)
    cbs = pq.train_pq_codebooks(emb, n_iters=2)
    exact = {r["vec_id"] for r in similarity.cosine_topk(emb, 0, 10).collect()}
    approx = {r["vec_id"] for r in pq.pq_ann_topk(emb, 0, 10, codebooks=cbs).collect()}
    recall = len(exact & approx) / 10
    assert recall >= 0.4, recall
    # Wider re-rank can only improve (or match) recall: the candidate
    # set grows monotonically and the re-rank is exact.
    wide = {
        r["vec_id"]
        for r in pq.pq_ann_topk(emb, 0, 10, codebooks=cbs, rerank=16).collect()
    }
    assert len(exact & wide) / 10 >= recall


def test_pq_empty_and_missing_query(spark):
    emb = _emb(spark)
    none = pq.pq_ann_topk(emb.limit(0), 0, 10)
    assert none.count() == 0
    missing = pq.pq_ann_topk(emb, query_vec_id=10**9, k=10)
    assert missing.count() == 0


def test_adc_scan_has_no_shuffle_before_topk(spark):
    """The ADC candidate scan must be shuffle-free: literal-LUT
    lookups + TakeOrdered. Executed-plan metrics prove it — the only
    shuffle tolerated is the final re-rank join's broadcast (0 shuffle
    bytes) and TakeOrdered (no exchange)."""
    from piholelongtermstats_spark.plans.metrics import executed_plan_metrics

    emb = _emb(spark)
    cbs = pq.train_pq_codebooks(emb, n_iters=1)
    df = pq.pq_ann_topk(emb, 0, 10, codebooks=cbs)
    df.collect()
    m = executed_plan_metrics(df)
    assert m.get("shuffleBytesWritten", 0) == 0, m
