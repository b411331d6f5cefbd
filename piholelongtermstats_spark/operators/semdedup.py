"""SemDeDup — semantic deduplication over the `embeddings` table.

Beyond-reference capability (LLM-training-data tier, alongside
operators/dedup.py's lexical families): the SemDeDup recipe (Abbas et
al. 2023, arXiv:2303.09540) removes *semantic* duplicates — documents
whose embeddings are close in cosine space even when their text
differs — by (1) k-means-clustering the embedding space and (2)
comparing pairs ONLY within a cluster, keeping one representative per
ε-ball. The clustering is what makes it scale: candidate pairs are
quadratic per cluster, not per corpus, exactly the role the sign
buckets play for `similarity.embedding_near_dup_pairs` and the
shingle bands play for LSH MinHash.

Clustering is SPHERICAL (assign to argmax cosine(v, centroid)) — the
paper operates on normalized embeddings, and spherical assignment
partitions by direction, which is the geometry cosine dedup needs.
(The euclidean IVF quantizer in operators/ivf.py is the wrong tool
here: with corpus-independent pinned centroids its −|c|²/2 bias term
dominates and every vector lands in one cell.)

Removal policy (deterministic, SQL-reproducible): within a cluster,
vector b is removed iff some vector a with a.vec_id < b.vec_id has
round(cosine(a, b), 6) ≥ threshold. This is the paper's
upper-triangular max-similarity rule with vec_id as the keep-order
(the reference implementation uses an arbitrary-but-fixed index order
within each cluster; keeping lowest id makes that order explicit and
engine-independent). Note removal looks at ALL lower-id members, not
just surviving ones — matching the paper's matrix formulation, and
keeping the operator a single self-join instead of an iterative loop.

Scale shape (100 TB): assignment is one Arrow-batched matmul per
partition — no shuffle; the pair join shuffles on `cell` once;
`cluster_cap` bounds the per-cluster quadratic worst case exactly as
`bucket_cap` does for the LSH path; removal-set + anti-join is one
more hash shuffle on vec_id. At 10⁹ vectors, k scales as n/target so
clusters stay ~constant-sized, and the assigned corpus is persisted
bucketed by cell (sources/bucketing.py) so repeated dedup passes skip
the assignment scan.

Determinism: no RNG. The oracle-checked registry entry uses the
corpus-independent md5-derived centroids (ivf.fixed_centroids) under
spherical assignment; the production path trains spherical k-means
with md5-ordered seeds (train_spherical_centroids) — same
train-once/apply-many contract as ivf.train_centroids, covered by
pytest (an iterative trainer isn't a static SQL string).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from piholelongtermstats_spark.operators import ivf
from piholelongtermstats_spark.operators.similarity import _dot, _norm
from piholelongtermstats_spark.operators.text import md5_hash60

N_CLUSTERS = 16
N_ITERS = 3
THRESHOLD = 0.35  # driver-testdata ε: the synthetic embeddings have no
# planted near-identical pairs (max pair cosine ≈ 0.55), so the
# registry entry exercises the semantics at a radius where removals
# are non-trivial at every SF; a production run on real embeddings
# uses the paper's ~0.95+.


def _spherical_assign_udf(centroids: list[list[float]]):
    """Vectorized nearest-centroid-by-cosine assignment: one numpy
    matmul per Arrow batch against the unit-normalized centroid
    matrix (argmax v·ĉ == argmax cosine(v, c); |v| is constant per
    row). Ties → lowest cell id (np.argmax first-hit), mirroring the
    oracle's ORDER BY score DESC, cell."""
    C = np.asarray(centroids, dtype=np.float64)
    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)

    @F.pandas_udf("int")
    def assign(v: pd.Series) -> pd.Series:
        V = np.stack(v.to_numpy())
        return pd.Series(np.argmax(V @ Cn.T, axis=1).astype("int32"))

    return assign


def assign_clusters(emb: DataFrame, centroids: list[list[float]]) -> DataFrame:
    """Corpus → (vec_id, label, v, cell) under spherical assignment.
    At scale, persist this bucketed by cell."""
    v = F.col("embedding").cast("array<double>")
    return emb.select(
        "vec_id",
        "label",
        v.alias("v"),
        _spherical_assign_udf(centroids)(v).alias("cell"),
    )


def train_spherical_centroids(
    emb: DataFrame,
    n_clusters: int = N_CLUSTERS,
    n_iters: int = N_ITERS,
    sample_mod: int | None = None,
) -> list[list[float]]:
    """Deterministic spherical k-means: seeds are the vectors with the
    n_clusters smallest md5(vec_id) (same fixed pseudo-sample as
    ivf.train_centroids); each iteration assigns by cosine and takes
    the element-wise member mean as the new centroid direction
    (assignment normalizes, so the mean need not be). Empty cells
    keep their previous centroid. Driver traffic per iteration is
    k×dim doubles — kilobytes."""
    if sample_mod and sample_mod > 1:
        emb = emb.filter(F.col("vec_id") % sample_mod == 0)
    v = F.col("embedding").cast("array<double>")
    seeds = (
        emb.select("vec_id", v.alias("v"))
        .orderBy(md5_hash60(F.col("vec_id").cast("string")).asc(), F.col("vec_id").asc())
        .limit(n_clusters)
        .collect()
    )
    if not seeds:
        return []
    dim = len(seeds[0]["v"])
    centroids = [list(r["v"]) for r in seeds]
    base = emb.select(v.alias("v"))
    for _ in range(n_iters):
        assigned = base.withColumn(
            "cell", _spherical_assign_udf(centroids)(F.col("v"))
        )
        means = (
            assigned.groupBy("cell")
            .agg(*[F.avg(F.col("v")[i]).alias(f"c{i}") for i in range(dim)])
            .collect()
        )
        new = {r["cell"]: [r[f"c{i}"] for i in range(dim)] for r in means}
        centroids = [new.get(i, centroids[i]) for i in range(len(centroids))]
    return centroids


def semdedup_pairs(
    assigned: DataFrame, threshold: float = THRESHOLD
) -> DataFrame:
    """(cell, vec_a < vec_b, cosine) pairs within a cluster at or
    above the rounded-cosine threshold — the upper-triangular
    similarity matrix.

    Computed per cell with one grouped BLAS matmul (`applyInPandas`
    on the cell key — the hash shuffle the self-join would have done
    anyway, then W·Wᵀ over the ≤cluster-sized member block). This is
    the deliberate Pandas-UDF exception to JVM-expressions-everywhere
    (same rationale + measurement style as ivf._assign_udf): the
    Column self-join evaluates a 64-step interpreted lambda per pair
    — measured ~4 s for ~500k pairs on the doubled sf0.1 corpus vs
    ~0.5 s for the grouped matmul. Cells are bounded (k scales as
    n/target, cluster_cap hard-caps stragglers), so each group's
    n²·d block stays small; this mirrors the SemDeDup reference
    practice of per-cluster dense math.

    Decision parity: cosines are rounded to 6 digits before the ≥ τ
    comparison; the rounded decision is pinned ≥ 5e-7 from the
    boundary by tests/test_fp_determinism.py, so BLAS-vs-sequential
    accumulation (or np.round's half-even vs SQL half-up, which only
    differ exactly ON a midpoint) cannot flip it —
    `semdedup_pairs_expr` is the pure-Column formulation kept for the
    differential test of exactly that claim."""
    tau = threshold

    def _pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < 2:
            return pd.DataFrame(
                {"cell": [], "vec_a": [], "vec_b": [], "cosine": []}
            ).astype({"cell": "int32", "vec_a": "int64", "vec_b": "int64", "cosine": "float64"})
        pdf = pdf.sort_values("vec_id")
        ids = pdf["vec_id"].to_numpy()
        V = np.stack(pdf["v"].to_numpy()).astype(np.float64)
        W = V / np.linalg.norm(V, axis=1, keepdims=True)
        S = np.round(W @ W.T, 6)
        ai, bi = np.triu_indices(len(ids), k=1)
        keep = S[ai, bi] >= tau
        return pd.DataFrame(
            {
                "cell": np.full(keep.sum(), int(pdf["cell"].iloc[0]), dtype="int32"),
                "vec_a": ids[ai[keep]],
                "vec_b": ids[bi[keep]],
                "cosine": S[ai, bi][keep],
            }
        )

    return assigned.select("vec_id", "cell", "v").groupBy("cell").applyInPandas(
        _pairs, "cell int, vec_a long, vec_b long, cosine double"
    )


def semdedup_pairs_expr(
    assigned: DataFrame, threshold: float = THRESHOLD
) -> DataFrame:
    """Pure-Column formulation of semdedup_pairs (cell self-join +
    higher-order dot over once-normalized vectors) — the differential
    baseline pinning that both backends make identical decisions."""
    nrm = assigned.withColumn("_nrm", _norm(F.col("v"))).withColumn(
        "_vn", F.transform(F.col("v"), lambda x: x / F.col("_nrm"))
    )
    n = nrm.select("vec_id", "cell", "_vn")
    return (
        n.alias("a")
        .join(n.alias("b"), "cell")
        .filter(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("cell"),
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.round(_dot(F.col("a._vn"), F.col("b._vn")), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def semantic_dedup(
    emb: DataFrame,
    threshold: float = THRESHOLD,
    centroids: list[list[float]] | None = None,
    cluster_cap: int | None = None,
) -> DataFrame:
    """Survivors (vec_id, label, cell) after SemDeDup removal. With
    ``centroids=None`` trains the spherical quantizer (production
    path); pass ivf.fixed_centroids(dim) for the pinned
    SQL-reproducible variant.

    ``cluster_cap`` bounds the quadratic per-cluster pair join: only
    the cap lowest-vec_id members of an oversized cluster enter pair
    generation (over-cap members are never removed — they saw no
    comparisons — matching the documented keep-on-no-evidence
    policy)."""
    if centroids is None:
        centroids = train_spherical_centroids(emb)
    if not centroids:
        return emb.sparkSession.createDataFrame(
            [], "vec_id bigint, label int, cell int"
        )
    assigned = assign_clusters(emb, centroids)
    candidates = assigned
    if cluster_cap is not None:
        w = Window.partitionBy("cell").orderBy("vec_id")
        candidates = (
            assigned.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= cluster_cap)
            .drop("_rn")
        )
    removed = (
        semdedup_pairs(candidates, threshold)
        .select(F.col("vec_b").alias("vec_id"))
        .distinct()
    )
    return assigned.join(removed, "vec_id", "left_anti").select(
        "vec_id", "label", "cell"
    )


def semantic_dedup_stats(
    emb: DataFrame,
    threshold: float = THRESHOLD,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """Per-cluster audit frame: (cell, n_members, n_removed,
    survivor_id_sum) — compact, but the id-sum makes the hash
    sensitive to every individual keep/remove decision, so the
    oracle compare verifies the full pairwise rule, not just counts."""
    if centroids is None:
        centroids = train_spherical_centroids(emb)
    assigned = assign_clusters(emb, centroids)
    removed = (
        semdedup_pairs(assigned, threshold)
        .select(F.col("vec_b").alias("vec_id"))
        .distinct()
        .withColumn("_removed", F.lit(1))
    )
    flagged = assigned.join(removed, "vec_id", "left")
    return (
        flagged.groupBy("cell")
        .agg(
            F.count("*").alias("n_members"),
            F.count("_removed").alias("n_removed"),
            F.sum(
                F.when(F.col("_removed").isNull(), F.col("vec_id"))
            ).alias("survivor_id_sum"),
        )
    )  # (terminal cosmetic sort dropped, r12 guide §2.4 — checkers are order-insensitive)


def semantic_contamination(
    emb: DataFrame,
    bench_mod: int = 10,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """Semantic benchmark decontamination — the embedding-space
    counterpart of corpus.contamination_overlap's lexical shingle
    containment: for every held-out "benchmark" vector (vec_id %
    bench_mod == 0), the most semantically similar training-corpus
    vector and its cosine. Train/test leakage that survives lexical
    decontamination (paraphrases, translations) shows up here.

    Candidate generation is cell-bounded exactly like SemDeDup
    removal: both sides spherical-assign once, pairs join within a
    cell only — the benchmark side is tiny (corpus/bench_mod rows)
    and broadcasts, so the corpus never shuffles. Per-bench argmax is
    a (bench_id-partitioned) rank-1 cut — WindowGroupLimit, ties
    pinned (cosine DESC, train vec_id ASC). A same-cell miss is the
    same recall trade every bucketed pass makes; nprobe-style
    widening composes if needed.
    """
    if centroids is None:
        centroids = train_spherical_centroids(
            emb.filter(F.col("vec_id") % bench_mod != 0)
        )
    if not centroids:
        return emb.sparkSession.createDataFrame(
            [], "bench_id bigint, train_id bigint, cosine double"
        )
    assigned = assign_clusters(emb, centroids)
    bench = assigned.filter(F.col("vec_id") % bench_mod == 0).select(
        F.col("vec_id").alias("bench_id"), F.col("cell"), F.col("v").alias("bv")
    )
    train = assigned.filter(F.col("vec_id") % bench_mod != 0).select(
        F.col("vec_id").alias("train_id"), "cell", F.col("v").alias("tv")
    )
    # Cosine over the RAW vectors with the engine-wide expression tree
    # (dot/(norm·norm), round 6 — knn._cosine): the oracle's
    # list_cosine_similarity also consumes raw vectors, so both engines
    # evaluate the same mathematical form rather than a pre-normalized
    # dot whose fp error tree differs near rounding/rank boundaries.
    pairs = train.join(F.broadcast(bench), "cell").select(
        "bench_id",
        "train_id",
        F.round(
            _dot(F.col("bv"), F.col("tv"))
            / (_norm(F.col("bv")) * _norm(F.col("tv"))),
            6,
        ).alias("cosine"),
    )
    w = Window.partitionBy("bench_id").orderBy(
        F.col("cosine").desc(), F.col("train_id").asc()
    )
    return (
        pairs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("bench_id", "train_id", "cosine")
    )  # (terminal cosmetic sort dropped, r12 guide §2.4 — checkers are order-insensitive)


def _cell_scores_udf(centroids: list[list[float]]):
    """Vectorized cosine scores against ALL centroids: one numpy
    matmul per Arrow batch over the unit-normalized centroid matrix
    (the _spherical_assign_udf kernel, returning the full score row
    instead of its argmax). The deliberate Arrow exception to the
    JVM-expressions rule, with the same measured justification
    (ivf.py:74-92: k·dim interpreted HOF lambdas per row are ~6×
    slower)."""
    import numpy as np
    import pandas as pd

    C = np.asarray(centroids, dtype=np.float64)
    C = C / np.linalg.norm(C, axis=1, keepdims=True)

    @F.pandas_udf("array<double>")
    def scores(v: pd.Series) -> pd.Series:
        V = np.stack(v.to_numpy()).astype(np.float64)
        V = V / np.linalg.norm(V, axis=1, keepdims=True)
        S = V @ C.T
        return pd.Series(list(S))

    return scores


def semdedup_cell_margins(
    emb: DataFrame, centroids: list[list[float]]
) -> DataFrame:
    """Per-cell clustering-quality audit for the SemDeDup quantizer —
    the simplified-silhouette complement to ann_eval_metrics (vector
    index) and lsh_dedup_eval (dedup index): how SEPARATED are the
    cells that bound the within-cell dedup search?

    Per vector: a = cosine to the assigned centroid (argmax, ties →
    lowest cell — the assignment rule), b = best cosine among the
    OTHER centroids; margin = a − b ≥ 0. A margin near 0 marks a
    boundary vector whose near-duplicates may sit in the neighbor
    cell — the cell-bounded search's one blind spot, here MEASURED
    per cell instead of argued.

    Output one row per cell: (cell, n_members, sum_margin_ppm,
    min_margin_ppm, mean_margin_ppm) ordered by cell.

    Exactness: scores are quantized to integer ppm —
    round(cos·10⁶) → BIGINT — BEFORE any comparison or sum, so the
    per-cell sums are exact integers and the mean is one rounded
    division (fp-accumulation order can never show through; clearance
    of raw scores from the ppm rounding grid is measured in
    tests/test_m38.py, the test_fp_determinism convention).

    Scale: ONE Arrow matmul per batch produces all k scores; the
    per-vector top-2 is a posexplode over k=16 rows per vector with a
    vec_id-partitioned rank — k·n rows, one hash shuffle, no
    all-pairs anywhere.
    """
    from pyspark.sql import Window

    scored = emb.select(
        "vec_id",
        F.posexplode(_cell_scores_udf(centroids)(F.col("embedding"))).alias(
            "cell", "score"
        ),
    ).select(
        "vec_id",
        "cell",
        F.round(F.col("score") * 1000000).cast("long").alias("ppm"),
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("ppm").desc(), F.col("cell").asc()
    )
    ranked = scored.select(
        "vec_id", "cell", "ppm", F.row_number().over(w).alias("rn")
    )
    per_vec = ranked.groupBy("vec_id").agg(
        F.max(F.when(F.col("rn") == 1, F.col("cell"))).alias("cell"),
        F.max(F.when(F.col("rn") == 1, F.col("ppm"))).alias("a_ppm"),
        F.max(F.when(F.col("rn") > 1, F.col("ppm"))).alias("b_ppm"),
    )
    margin = (F.col("a_ppm") - F.col("b_ppm")).cast("long")
    return (
        per_vec.select("cell", margin.alias("m"))
        .groupBy("cell")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_members"),
            F.sum("m").cast("long").alias("sum_margin_ppm"),
            F.min("m").cast("long").alias("min_margin_ppm"),
            F.round(
                F.sum("m").cast("double") / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("mean_margin_ppm"),
        )
    )  # (terminal cosmetic sort dropped, r12 guide §2.4 — checkers are order-insensitive)
