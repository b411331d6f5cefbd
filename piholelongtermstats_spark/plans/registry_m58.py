"""M58 — trained-index recall audit (r9 VERDICT #4):

``trained_ann_recall_panel`` — one row per TRAINED vector-index family
with the integer overlap of its top-k result against the exact cosine
truth over the fixed query set: (family, n_queries, k, hits,
recall_ppm). The six ``_trained`` registry entries were pure
rows-only trust-me's — their oracle-checked twins pin the UNTRAINED
machinery, but no checked statement existed about the trained path.
This panel makes the trained path's retrieval quality a deterministic,
driver-recordable number: the trainers are deterministic (Lloyd on a
deterministic subsample, session-cached), both legs are deterministic
plans, and every output except the one DIV is a BIGINT count.

Rows-only BY DESIGN: iterative k-means training is not one SQL
statement (the same reason the ``_trained`` entries themselves are
rows-only) — but unlike those entries, this panel's VALUES are pinned
in pytest (tests/test_m58.py: recall floors per family, exact-k hit
caps, and determinism across invocations), so the driver's row-count/
schema check rides on top of value-pinned aggregates.

semdedup's trained path is deliberately not in the panel: it is a
dedup (cell-assignment) operator, not a retrieval index — its trained
quality is audited by semdedup_cell_margins (registry_m38).

Scale: every leg is a k-row-per-query relation; the overlap join and
the final union are driver-negligible. The trained quantizers come
from the same session caches the ``_trained`` entries use — train
once, audit free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from piholelongtermstats_spark.operators import knn, similarity
from piholelongtermstats_spark.plans.registry import register
from piholelongtermstats_spark.plans.registry_m7 import (
    _emb,
    q_ivf_ann_topk_trained,
    q_pq_ann_topk_trained,
)
from piholelongtermstats_spark.plans.registry_m9 import q_ivfpq_ann_topk_trained
from piholelongtermstats_spark.plans.registry_m10 import q_knn_join_ivf_trained

_K1 = 10  # single-query families serve top-10 (their registry contract)


def _overlap(
    exact: DataFrame,
    approx: DataFrame,
    family: str,
    n_queries: int,
    k: int,
) -> DataFrame:
    """One row: integer overlap of two (query_id, vec_id) top-k
    relations; recall_ppm = hits·10⁶ DIV (n_queries·k) — integer
    FLOOR division (the ann_eval_metrics convention, r8 ADVICE)."""
    hits = (
        exact.select("query_id", "vec_id")
        .join(approx.select("query_id", "vec_id"), ["query_id", "vec_id"], "left_semi")
        .agg(F.count(F.lit(1)).cast("long").alias("hits"))
    )
    return hits.select(
        F.lit(family).alias("family"),
        F.lit(n_queries).cast("long").alias("n_queries"),
        F.lit(k).cast("long").alias("k"),
        "hits",
        F.expr(f"hits * 1000000 DIV {n_queries * k}").alias("recall_ppm"),
    )


@register("trained_ann_recall_panel")  # rows-only: k-means training isn't SQL
def q_trained_ann_recall_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of every trained retrieval index vs the exact cosine
    truth (operators/knn.py, ivf.py, pq.py, ivfpq.py, semdedup.py)."""
    emb = _emb(spark, sf_dir)
    # The exact leg feeds three overlap branches — materialize its 10
    # rows once (eager localCheckpoint, the cograph convention) so the
    # corpus scan doesn't re-execute per union branch.
    exact1 = (
        similarity.cosine_topk(emb, 0, _K1)
        .select(F.lit(0).alias("query_id"), "vec_id")
        .localCheckpoint(eager=True)
    )
    panels = []
    for family, qfn in (
        ("ivf_trained", q_ivf_ann_topk_trained),
        ("ivfpq_trained", q_ivfpq_ann_topk_trained),
        ("pq_trained", q_pq_ann_topk_trained),
    ):
        approx = qfn(spark, sf_dir).select(
            F.lit(0).alias("query_id"), "vec_id"
        )
        panels.append(_overlap(exact1, approx, family, 1, _K1))
    exact8 = knn.knn_join(emb).select("query_id", "vec_id")
    approx8 = q_knn_join_ivf_trained(spark, sf_dir).select(
        "query_id", "vec_id"
    )
    panels.append(
        _overlap(exact8, approx8, "sphknn_trained", knn.N_QUERIES, knn.K)
    )
    out = panels[0]
    for p in panels[1:]:
        out = out.unionByName(p)
    return out.orderBy("family")
