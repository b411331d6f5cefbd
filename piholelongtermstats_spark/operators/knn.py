"""Batched k-NN join over the `embeddings` table — top-k neighbors
for EVERY query vector in a query set, not one probe vector at a time.

This is the workload shape a real training-data pipeline runs
(similarity labeling, retrieval-augmented filtering, hard-negative
mining all score a *batch* of queries against the corpus), and it is
deliberately a different plan than `similarity.cosine_topk`
(single-query TakeOrderedAndProject cannot express per-query limits).

Two paths:

- ``knn_join`` — exact brute force: corpus × broadcast(query block),
  one rank-filter window per query_id. Catalyst turns the
  ``row_number() <= k`` filter into a **WindowGroupLimit**: each map
  task keeps only its local top-k per query BEFORE the shuffle, so the
  exchange carries ~k·partitions rows per query, never |corpus|.
  (The same optimization the stratified-sample tier relies on —
  plan-asserted in tests/test_knn.py.) At 100 TB this is the correct
  exact baseline: one pass over the corpus, map-side dot products
  against the broadcast query block, tiny shuffle.
- ``knn_join_ivf`` — the scale path: corpus vectors are assigned to
  spherical cells once (the SemDeDup quantizer — argmax cosine; see
  operators/semdedup.py for why the euclidean IVF quantizer is wrong
  for pinned corpus-independent centroids), each query probes only its
  ``nprobe`` nearest cells, and the same WindowGroupLimit rank cut
  runs over the ~nprobe/n_cells candidate slice. The probe relation
  (|queries| × nprobe rows) is broadcast, so the only shuffle is the
  final per-query top-k merge.

Determinism / oracle parity: scores are rounded to 6 digits before
the rank (HALF_UP on both engines); rank ties break on vec_id; probe
and cell selection order by raw score with cell-id tie-break exactly
as the DuckDB oracle's ``row_number() OVER (ORDER BY score DESC,
cell)`` — fp margins for these decisions are measured in
tests/test_fp_determinism.py style by tests/test_knn.py.

Reference scope note: the reference dashboard has no vector tier at
all; this extends SURVEY.md §2.12's similarity family (cosine_topk,
LSH/IVF/PQ single-query ANN) to the batched join shape.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from piholelongtermstats_spark.operators import semdedup
from piholelongtermstats_spark.operators.similarity import _dot, _norm

N_QUERIES = 8
K = 5
N_PROBE = 4


def _query_corpus(emb: DataFrame, n_queries: int) -> tuple[DataFrame, DataFrame]:
    """Deterministic query/corpus split: the n_queries lowest vec_ids
    are the query block (tiny — broadcast it), the rest the corpus."""
    v = F.col("embedding").cast("array<double>")
    q = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), v.alias("qv")
    )
    c = emb.filter(F.col("vec_id") >= n_queries).select(
        "vec_id", "label", v.alias("v")
    )
    return q, c


def _ranked_topk(scored: DataFrame, k: int) -> DataFrame:
    """Per-query rank cut on the rounded score. The row_number filter
    is the WindowGroupLimit trigger — partial top-k per map task, then
    one shuffle of the k·tasks survivors per query."""
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "label", "cosine")
    )  # (terminal cosmetic sort dropped, r12 guide §2.4 — checkers are order-insensitive)


def _cosine(a: Column, b: Column) -> Column:
    return F.round(_dot(a, b) / (_norm(a) * _norm(b)), 6)


def knn_join(emb: DataFrame, n_queries: int = N_QUERIES, k: int = K) -> DataFrame:
    """Exact batched k-NN join: (query_id, rank, vec_id, label,
    cosine) — top-k corpus neighbors per query by rounded cosine."""
    q, c = _query_corpus(emb, n_queries)
    scored = c.crossJoin(F.broadcast(q)).select(
        "query_id", "vec_id", "label", _cosine(F.col("v"), F.col("qv")).alias("cosine")
    )
    return _ranked_topk(scored, k)


def probe_cells(
    q: DataFrame, centroids: list[list[float]], nprobe: int = N_PROBE
) -> DataFrame:
    """(query_id, qv, cell) — each query's nprobe nearest cells by
    cosine, score-descending with cell-id tie-break (the oracle's
    row_number ORDER BY score DESC, cell).

    Backend: one Arrow-batched matmul against the unit-normalized
    centroid matrix — the same deliberate Pandas-UDF exception as the
    corpus assignment (semdedup._spherical_assign_udf) and for the
    same measured reason: the pure-Column formulation
    (probe_cells_expr: transform over a literal matrix + array_sort
    comparator, each element evaluating nested aggregate/zip_with
    lambdas) costs ~0.8 s of PLAN CONSTRUCTION alone per query — the
    interactive-serving latency floor — vs ~0.02 s here. np.argsort
    descending with kind='stable' keeps ties in original (ascending
    cell) order, matching the oracle tie-break; boundary score gaps
    are measured in tests/test_knn.py::test_probe_selection_margins.
    probe_cells_expr stays as the cross-backend differential baseline.
    """
    C = np.asarray(centroids, dtype=np.float64)
    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
    np_ = min(nprobe, len(centroids))

    @F.pandas_udf("array<int>")
    def probes(v: pd.Series) -> pd.Series:
        V = np.stack(v.to_numpy())
        Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
        idx = np.argsort(-(Vn @ Cn.T), axis=1, kind="stable")[:, :np_]
        return pd.Series(list(idx.astype("int32")))

    return q.select(
        "query_id", "qv", F.explode(probes(F.col("qv"))).alias("cell")
    )


def probe_cells_expr(
    q: DataFrame, centroids: list[list[float]], nprobe: int = N_PROBE
) -> DataFrame:
    """Pure-Column probe selection (nested-array literal + array_sort
    comparator) — the differential baseline for probe_cells."""
    cmat = F.lit([[float(x) for x in c] for c in centroids])
    scored = F.transform(
        F.sequence(F.lit(0), F.lit(len(centroids) - 1)),
        lambda i: F.struct(
            i.cast("int").alias("cell"),
            (
                _dot(F.col("qv"), F.element_at(cmat, i + 1))
                / (_norm(F.col("qv")) * _norm(F.element_at(cmat, i + 1)))
            ).alias("score"),
        ),
    )
    ranked = F.array_sort(
        scored,
        lambda l, r: F.when(l["score"] > r["score"], -1)
        .when(l["score"] < r["score"], 1)
        .otherwise(l["cell"] - r["cell"]),
    )
    probes = F.slice(ranked, 1, nprobe)
    return q.select(
        "query_id", "qv", F.explode(F.transform(probes, lambda s: s["cell"])).alias("cell")
    )


def knn_join_ivf(
    emb: DataFrame,
    n_queries: int = N_QUERIES,
    k: int = K,
    centroids: list[list[float]] | None = None,
    nprobe: int = N_PROBE,
) -> DataFrame:
    """Cell-routed batched k-NN join: corpus spherical-assigned once
    (persist bucketed by cell at scale — sources/bucketing.py), each
    query scans only its nprobe probe cells. Pass pinned centroids for
    the SQL-reproducible registry entry; None trains the spherical
    k-means quantizer (production path, pytest-covered)."""
    q, c = _query_corpus(emb, n_queries)
    if centroids is None:
        centroids = semdedup.train_spherical_centroids(
            emb.filter(F.col("vec_id") >= n_queries)
        )
    if not centroids:
        return emb.sparkSession.createDataFrame(
            [], "query_id bigint, rank int, vec_id bigint, label int, cosine double"
        )
    assigned = c.withColumn(
        "cell", semdedup._spherical_assign_udf(centroids)(F.col("v"))
    )
    probes = probe_cells(q, centroids, nprobe)
    scored = assigned.join(F.broadcast(probes), "cell").select(
        "query_id", "vec_id", "label", _cosine(F.col("v"), F.col("qv")).alias("cosine")
    )
    return _ranked_topk(scored, k)


def knn_label_vote(
    emb: DataFrame, n_queries: int = N_QUERIES, k: int = K
) -> DataFrame:
    """kNN classification by retrieval: each query vector takes the
    majority label among its k exact nearest corpus neighbors.

    The data-curation use is quality-label transfer — score a small
    hand-labeled seed set, then label the rest of a 100 TB corpus by
    nearest-neighbor vote. Ties are fully pinned: most votes, then the
    label holding the NEAREST neighbor (min rank), then the smaller
    label — every tie-break an integer comparison, so the prediction
    is deterministic and oracle-checkable.

    Plan shape: knn_join's WindowGroupLimit rank cut (map-side top-k
    per query; the exchange carries k·tasks rows per query, never the
    corpus) followed by aggregation and a rank-1 cut over the
    (queries × labels)-sized vote relation — both tiny.
    """
    nn = knn_join(emb, n_queries, k)
    votes = nn.groupBy("query_id", "label").agg(
        F.count(F.lit(1)).alias("votes"), F.min("rank").alias("best_rank")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("votes"), F.asc("best_rank"), F.asc("label")
    )
    return (
        votes.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") == 1)
        .select(
            "query_id",
            F.col("label").alias("pred_label"),
            "votes",
            "best_rank",
        )
    )  # (terminal cosmetic sort dropped, r12 guide §2.4 — checkers are order-insensitive)


def ann_eval_metrics(
    emb: DataFrame,
    centroids: "list[list[float]] | None" = None,
    n_queries: int = N_QUERIES,
    k: int = K,
    nprobe: int = N_PROBE,
) -> DataFrame:
    """Per-query retrieval-quality audit of the cell-routed ANN
    against the exact k-NN join — the recall@k / MRR report an index
    deployment watches (recall@k per Jégou et al., TPAMI 2011 §V).

    One full-outer join of the two (query_id, vec_id, rank) relations
    (both already k-row-per-query tiny), then one aggregate:
    hits = |exact ∩ approx|, recall_ppm = hits·10⁶ DIV k (integer),
    nn_rank = the approx rank of the TRUE nearest neighbor (NULL if
    the index missed it), rr = 1/nn_rank — MRR's one division.

    Exactness: every metric except rr is BIGINT; both input legs are
    the independently oracle-checked knn_join / knn_join_ivf plans,
    so this audit is itself SQL-replayable decision-for-decision.
    """
    exact = knn_join(emb, n_queries, k).select(
        F.col("query_id").alias("eq"), F.col("vec_id").alias("ev"),
        F.col("rank").alias("e_rank"),
    )
    approx = knn_join_ivf(emb, n_queries, k, centroids, nprobe).select(
        F.col("query_id").alias("aq"), F.col("vec_id").alias("av"),
        F.col("rank").alias("a_rank"),
    )
    j = exact.join(
        approx,
        (F.col("eq") == F.col("aq")) & (F.col("ev") == F.col("av")),
        "full_outer",
    ).select(
        F.coalesce("eq", "aq").alias("query_id"), "e_rank", "a_rank"
    )
    hits = F.count(
        F.when(F.col("e_rank").isNotNull() & F.col("a_rank").isNotNull(), 1)
    ).cast("long")
    nn_rank = F.max(F.when(F.col("e_rank") == 1, F.col("a_rank")))
    agg = j.groupBy("query_id").agg(
        F.lit(k).cast("long").alias("k"),
        hits.alias("hits"),
        nn_rank.alias("nn_rank"),
    )
    # integer FLOOR division (DIV), matching the oracle's `//` — a
    # double quotient cast-to-long can round up across an integer
    # boundary before truncation for general k (r8 ADVICE).
    return agg.select(
        "query_id",
        "k",
        "hits",
        F.expr("hits * 1000000L DIV k").alias("recall_ppm"),
        "nn_rank",
        F.round(1.0 / F.col("nn_rank").cast("double"), 6).alias("rr"),
    )  # (terminal cosmetic sort dropped, r12 guide §2.4 — checkers are order-insensitive)


def matryoshka_recall_eval(
    emb: DataFrame,
    dim: int = 16,
    n_queries: int = N_QUERIES,
    k: int = K,
) -> DataFrame:
    """Per-query retrieval-quality audit of TRUNCATED-dimension
    cosine search against the full-dimension exact k-NN — the
    Matryoshka / MRL deployment question (Kusupati et al., NeurIPS
    2022): how much recall does serving the first ``dim`` of d
    embedding coordinates cost? (Truncation is the zero-infra
    compression every vector store offers; this measures its price
    next to the PQ/SQ8/binary audits in ann_eval_metrics /
    scalar_quantize_audit.)

    Both legs run the SAME exact top-k machinery (_ranked_topk over
    rounded cosine with pinned (cosine DESC, vec_id) ties); the
    truncated leg just slices the arrays before scoring, so the audit
    is SQL-replayable decision-for-decision like ann_eval_metrics:
    hits/recall_ppm are integers, rr is MRR's one division.

    Scale: two broadcast-query scans of the corpus (no index to
    build); the WindowGroupLimit rank cut keeps the shuffle at
    k·tasks rows per leg.
    """
    q, c = _query_corpus(emb, n_queries)
    exact = knn_join(emb, n_queries, k).select(
        F.col("query_id").alias("eq"), F.col("vec_id").alias("ev"),
        F.col("rank").alias("e_rank"),
    )
    qt = q.select("query_id", F.slice("qv", 1, dim).alias("qv"))
    ct = c.select("vec_id", "label", F.slice("v", 1, dim).alias("v"))
    scored = ct.crossJoin(F.broadcast(qt)).select(
        "query_id", "vec_id", "label",
        _cosine(F.col("v"), F.col("qv")).alias("cosine"),
    )
    trunc = _ranked_topk(scored, k).select(
        F.col("query_id").alias("aq"), F.col("vec_id").alias("av"),
        F.col("rank").alias("a_rank"),
    )
    j = exact.join(
        trunc,
        (F.col("eq") == F.col("aq")) & (F.col("ev") == F.col("av")),
        "full_outer",
    ).select(F.coalesce("eq", "aq").alias("query_id"), "e_rank", "a_rank")
    hits = F.count(
        F.when(F.col("e_rank").isNotNull() & F.col("a_rank").isNotNull(), 1)
    ).cast("long")
    agg = j.groupBy("query_id").agg(
        F.lit(dim).cast("long").alias("dim"),
        F.lit(k).cast("long").alias("k"),
        hits.alias("hits"),
        F.max(F.when(F.col("e_rank") == 1, F.col("a_rank"))).alias("nn_rank"),
    )
    return agg.select(
        "query_id",
        "dim",
        "k",
        "hits",
        F.expr("hits * 1000000L DIV k").alias("recall_ppm"),
        "nn_rank",
        F.round(1.0 / F.col("nn_rank").cast("double"), 6).alias("rr"),
    )  # (terminal cosmetic sort dropped, r12 guide §2.4 — checkers are order-insensitive)
