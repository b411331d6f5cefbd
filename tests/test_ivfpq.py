"""IVF-PQ composed index (operators/ivfpq.py): encode-table shape,
recall vs the exact scan with nprobe/rerank monotonicity, totality on
degenerate inputs, and the shuffle-free ADC probe scan property."""

from __future__ import annotations

from pyspark.sql import functions as F

from piholelongtermstats_spark.operators import ivf, ivfpq, pq, similarity

SF = "/root/testdata/sf0.001"


def _emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def _pinned():
    return ivf.fixed_centroids(64, ivfpq.N_CELLS), pq.fixed_codebooks(64)


def test_encode_table_shape(spark):
    emb = _emb(spark)
    cents, cbs = _pinned()
    enc = ivfpq.encode_ivfpq(emb, cents, cbs)
    assert enc.columns == ["vec_id", "label", "cell", "codes", "vnorm"]
    bad = enc.filter(
        (F.col("cell") < 0)
        | (F.col("cell") >= ivfpq.N_CELLS)
        | (F.array_min("codes") < 0)
        | (F.array_max("codes") >= pq.N_CODES)
        | (F.size("codes") != pq.N_SUB)
    ).count()
    assert bad == 0
    assert enc.count() == emb.count()
    # spherical routing populates many cells (the reason it exists —
    # euclidean routing of pinned centroids collapses to one)
    assert enc.select("cell").distinct().count() > 4


def test_recall_and_monotonicity(spark):
    emb = _emb(spark)
    cents, cbs = _pinned()
    exact = {r["vec_id"] for r in similarity.cosine_topk(emb, 0, 10).collect()}
    base = {
        r["vec_id"]
        for r in ivfpq.ivfpq_ann_topk(
            emb, 0, 10, centroids=cents, codebooks=cbs
        ).collect()
    }
    recall = len(exact & base) / 10
    assert recall >= 0.3, recall
    # limit case: probe every cell and let the candidate cut cover
    # the whole corpus — the exact re-rank then reproduces the exact
    # scan verbatim (ADC only ever mis-ORDERS candidates; it cannot
    # drop one that the cut keeps)
    n = emb.count()
    all_probe = {
        r["vec_id"]
        for r in ivfpq.ivfpq_ann_topk(
            emb, 0, 10,
            nprobe=ivfpq.N_CELLS, rerank=(n // 10) + 1,
            centroids=cents, codebooks=cbs,
        ).collect()
    }
    assert all_probe == exact


def test_recall_monotone_in_nprobe(spark):
    """Probe widening can only grow the probed-cell set, so with the
    candidate cut held non-binding (rerank covers the corpus) recall
    vs the exact scan is non-decreasing in nprobe and reaches 1.0 at
    the all-probe limit — the ivfpq mirror of
    test_knn.py::test_recall_monotone_in_nprobe (r5 VERDICT #4).
    (Measured sf0.1 curve recorded in NOTES.md.)"""
    emb = _emb(spark)
    cents, cbs = _pinned()
    exact = {r["vec_id"] for r in similarity.cosine_topk(emb, 0, 10).collect()}
    n = emb.count()
    prev = -1.0
    for np_ in (1, 4, ivfpq.N_CELLS):
        got = {
            r["vec_id"]
            for r in ivfpq.ivfpq_ann_topk(
                emb, 0, 10,
                nprobe=np_, rerank=(n // 10) + 1,
                centroids=cents, codebooks=cbs,
            ).collect()
        }
        rec = len(exact & got) / 10
        assert rec >= prev, (np_, rec, prev)
        prev = rec
    assert prev == 1.0
    # trained path (the rows-only registry variant): same law under
    # the data-adaptive quantizers
    prev = -1.0
    for np_ in (1, ivfpq.N_CELLS):
        got = {
            r["vec_id"]
            for r in ivfpq.ivfpq_ann_topk(
                emb, 0, 10, nprobe=np_, rerank=(n // 10) + 1
            ).collect()
        }
        rec = len(exact & got) / 10
        assert rec >= prev, (np_, rec, prev)
        prev = rec
    assert prev == 1.0


def test_empty_and_missing_query(spark):
    emb = _emb(spark)
    cents, cbs = _pinned()
    assert ivfpq.ivfpq_ann_topk(emb.limit(0), 0, 10).count() == 0
    assert (
        ivfpq.ivfpq_ann_topk(
            emb, 10**9, 10, centroids=cents, codebooks=cbs
        ).count()
        == 0
    )


def test_adc_probe_scan_no_shuffle(spark):
    """Same contract as the flat PQ scan (test_pq.py): the probed ADC
    scan is codegen arithmetic + TakeOrdered, zero shuffle bytes; the
    re-rank join broadcasts the candidate ids."""
    from piholelongtermstats_spark.plans.metrics import executed_plan_metrics

    emb = _emb(spark)
    cents, cbs = _pinned()
    df = ivfpq.ivfpq_ann_topk(emb, 0, 10, centroids=cents, codebooks=cbs)
    df.collect()
    m = executed_plan_metrics(df)
    assert m.get("shuffleBytesWritten", 0) == 0, m


def test_trained_path_deterministic(spark):
    emb = _emb(spark)
    a = ivfpq.ivfpq_ann_topk(emb, 0, 10).collect()
    b = ivfpq.ivfpq_ann_topk(emb, 0, 10).collect()
    assert a == b
    assert len(a) == 10
