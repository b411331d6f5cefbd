"""Binary (sign-bit) quantization ANN — exactness at full candidate
width, recall monotonicity in the candidate budget, a numpy packing
differential, and the WindowGroupLimit plan guard."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from piholelongtermstats_spark.operators import binquant, knn
from piholelongtermstats_spark.sources.parquet import load_table

SF = "/root/testdata/sf0.001"


def _emb(spark):
    from piholelongtermstats_spark.session import ensure_session_defaults

    ensure_session_defaults(spark)
    return load_table(spark, SF, "embeddings")


def test_pack_signbits_matches_numpy(spark):
    emb = _emb(spark).limit(50)
    got = {
        r["vec_id"]: r["code"]
        for r in emb.select(
            "vec_id",
            binquant.pack_signbits(
                F.col("embedding").cast("array<double>"), 64
            ).alias("code"),
        ).collect()
    }
    for r in emb.select("vec_id", "embedding").collect():
        v = np.asarray(r["embedding"], dtype=np.float64)
        want = [
            sum(1 << j for j in range(32) if v[w + j] > 0) for w in (0, 32)
        ]
        assert got[r["vec_id"]] == want, r["vec_id"]


def test_all_candidates_reproduces_exact_knn(spark):
    """With the candidate budget opened to the whole corpus, the
    hamming cut is a no-op and the rerank must equal the exact
    brute-force knn_join row for row."""
    emb = _emb(spark)
    n_corpus = emb.count()
    exact = [
        (r["query_id"], r["rank"], r["vec_id"], r["cosine"])
        for r in knn.knn_join(emb).collect()
    ]
    bq = [
        (r["query_id"], r["rank"], r["vec_id"], r["cosine"])
        for r in binquant.binary_quant_ann(emb, n_candidates=n_corpus).collect()
    ]
    assert bq == exact


def test_recall_monotone_in_candidates(spark):
    """Recall@k vs the exact join is monotone in the candidate budget
    and reaches 1.0 at full width."""
    emb = _emb(spark)
    n_corpus = emb.count()
    truth = {
        (r["query_id"], r["vec_id"]) for r in knn.knn_join(emb).collect()
    }
    recalls = []
    for c in (10, 50, n_corpus):
        got = {
            (r["query_id"], r["vec_id"])
            for r in binquant.binary_quant_ann(emb, n_candidates=c).collect()
        }
        recalls.append(len(got & truth) / len(truth))
    assert recalls == sorted(recalls), recalls
    assert recalls[-1] == 1.0, recalls


def test_hamming_cut_is_window_group_limit(spark):
    """Both rank cuts (hamming candidates, cosine rerank) must run as
    WindowGroupLimit — each map task ships its local top-C/top-k per
    query, never the corpus; the query side arrives broadcast."""
    df = binquant.binary_quant_ann(_emb(spark))
    plan = df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert plan.count("WindowGroupLimit") >= 2, plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan
