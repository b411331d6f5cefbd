"""Frequent Directions — the mergeable matrix sketch (Liberty, KDD
2013; Ghashami, Liberty, Phillips, Woodruff, SIAM J. Comput. 2016).

Why next to the exact Gramian (operators/pca.py): the Gramian path
moves d² partial sums per task — exact, and fine at d = 64. FD is the
SCALE path when d is large or when only an ℓ ≪ d-rank summary is
needed: each partition maintains an ℓ×d sketch B with Liberty's
guarantee ``0 ≼ AᵀA − BᵀB`` and ``‖AᵀA − BᵀB‖₂ ≤ 2‖A‖_F²/ℓ``,
and — the property that makes it Spark-shaped — sketches MERGE
(Ghashami et al. Thm 7): running FD over concatenated sketches keeps
the same bound against the concatenated input. So the plan is
map-partitions (local FD) → coalesce(1) (P·ℓ rows of width d, tiny)
→ one final FD merge, never a d² shuffle and never the raw matrix.

fp policy: SVD is iterative and order-dependent ⇒ the registry entry
is rows-only (the trained-index class); pytest pins the spectral
error bound against numpy and exact recovery when n ≤ ℓ.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _fd_shrink(buf: np.ndarray, ell: int) -> np.ndarray:
    """One FD shrink step: SVD the buffer, subtract the ℓ-th squared
    singular value, return the ℓ non-zero-padded rows Σ'Vᵀ.

    When the buffer has ≤ ℓ non-zero singular values (rank ≤ ℓ, e.g.
    d ≤ ℓ) there is nothing to subtract — but the buffer must STILL
    be compressed to ≤ ℓ rows, else the caller's fixed 2ℓ-row budget
    never frees and its fill loop can't advance. ΣVᵀ is the lossless
    form: BᵀB = AᵀA exactly, ≤ min(rank, ℓ) rows."""
    _, s, vt = np.linalg.svd(buf, full_matrices=False)
    if len(s) <= ell:
        return s[:, None] * vt
    delta = s[ell] ** 2
    s2 = np.sqrt(np.maximum(s[:ell] ** 2 - delta, 0.0))
    return s2[:, None] * vt[:ell]


def _fd_reduce(rows: np.ndarray, ell: int) -> np.ndarray:
    """Stream ``rows`` through an ℓ-sized FD sketch (buffer 2ℓ)."""
    d = rows.shape[1]
    sketch = np.zeros((0, d))
    i = 0
    while i < len(rows):
        take = rows[i : i + 2 * ell - len(sketch)]
        i += len(take)
        sketch = _fd_shrink(np.vstack([sketch, take]), ell)
    return sketch


def _partition_sketches(ell: int, dim: int):
    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        buf = np.zeros((0, dim))
        for pdf in batches:
            if pdf.empty:
                continue
            x = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            buf = _fd_reduce(np.vstack([buf, x]), ell)
        if len(buf):
            yield pd.DataFrame({"row": [r.tolist() for r in buf]})

    return part


def _merge_sketches(ell: int, dim: int):
    def merge(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        buf = np.zeros((0, dim))
        for pdf in batches:
            if pdf.empty:
                continue
            x = np.stack(pdf["row"].to_numpy()).astype(np.float64)
            buf = _fd_reduce(np.vstack([buf, x]), ell)
        sv = np.linalg.svd(buf, compute_uv=False) if len(buf) else np.array([])
        yield pd.DataFrame(
            {"rank": np.arange(1, len(sv) + 1), "sigma": sv}
        )

    return merge


def fd_sketch_spectrum(
    emb: DataFrame, ell: int = 16, dim: int = 64, top: int = 8
) -> DataFrame:
    """Top singular values of the corpus embedding matrix as seen by
    a distributed Frequent-Directions sketch: (rank, sigma) rows,
    rank ≤ ``top``.

    Plan: mapInPandas local sketches (each task holds ≤ 2ℓ×d
    doubles) → repartition(1) of the P·ℓ sketch rows → one merge
    task. The only shuffle moves P·ℓ·d doubles — independent of n.
    """
    parts = emb.select("embedding").mapInPandas(
        _partition_sketches(ell, dim), schema="row array<double>"
    )
    merged = parts.repartition(1).mapInPandas(
        _merge_sketches(ell, dim), schema="rank int, sigma double"
    )
    return (
        merged.filter(F.col("rank") <= top)
        .select("rank", F.round(F.col("sigma"), 4).alias("sigma"))
        .orderBy("rank")
    )


def fd_spectrum_audit(
    emb: DataFrame, ell: int = 16, dim: int = 64, top: int = 8
) -> DataFrame:
    """Hash-checkable audit of the FD sketch's accuracy CONTRACT —
    the quantile_sketch_eval playbook applied to the matrix sketch
    (SVD itself is the fp edge no SQL replays; its GUARANTEE is
    auditable against the exact spectrum):

    - the sketch spectrum comes from the distributed FD path above;
    - the EXACT spectrum comes from the distributed d×d Gramian
      (operators/pca._gramian_partials — d² partial sums, independent
      of n) eigen-solved on the driver (64×64, trivial);
    - per rank i ≤ top, two Liberty verdicts: ``not_over``
      (σᵢ(B)² ≤ σᵢ(A)², FD never overestimates) and ``within_bound``
      (σᵢ(A)² − σᵢ(B)² ≤ 2‖A‖_F²/ℓ); plus ``fro_contained``
      (Σσᵢ(B)² ≤ ‖A‖_F² over ALL sketch ranks);
    - the data tie-in columns ``n_rows`` and ``fro2_q`` (Σ over every
      entry of floor(1000·e)², an exact BIGINT both engines compute
      bit-identically after the float→double widening) prove the
      relation actually read this corpus.

    The oracle emits the exact tie-in columns plus the PROMISE
    (verdicts = 1), so a bound violation fails the driver hash gate,
    not just pytest. Scale: one d²-sized and one P·ℓ·d-sized
    aggregate, a counts-sized driver solve, no event-sized collect.
    """
    from piholelongtermstats_spark.operators import pca

    spark = emb.sparkSession
    sk_rows = (
        emb.select("embedding")
        .mapInPandas(_partition_sketches(ell, dim), schema="row array<double>")
        .repartition(1)
        .mapInPandas(_merge_sketches(ell, dim), schema="rank int, sigma double")
        .collect()
    )
    sk = {r["rank"]: float(r["sigma"]) for r in sk_rows}

    g_rows = (
        emb.select("embedding")
        .mapInPandas(pca._gramian_partials(dim), schema="i int, j int, v double")
        .groupBy("i", "j")
        .agg(F.sum("v").alias("v"))
        .collect()
    )
    g = np.zeros((dim, dim))
    for r in g_rows:
        if r["i"] < dim and r["j"] < dim:
            g[r["i"], r["j"]] = r["v"]
            g[r["j"], r["i"]] = r["v"]
    ev = np.sort(np.linalg.eigvalsh(g))[::-1]  # σᵢ(A)², descending
    fro2 = float(np.trace(g))
    bound = 2.0 * fro2 / ell
    tol = 1e-9 * max(fro2, 1.0)

    sk_fro2 = sum(s * s for s in sk.values())
    fro_contained = int(sk_fro2 <= fro2 + tol)

    tie = emb.select(
        F.expr(
            "aggregate(transform(embedding, e -> CAST(floor(CAST(e AS DOUBLE)"
            " * 1000) AS BIGINT) * CAST(floor(CAST(e AS DOUBLE) * 1000)"
            " AS BIGINT)), 0L, (a, x) -> a + x)"
        ).alias("q2")
    ).agg(
        F.count(F.lit(1)).alias("n_rows"), F.sum("q2").alias("fro2_q")
    ).first()

    out = []
    for i in range(1, top + 1):
        sb2 = sk.get(i, 0.0) ** 2
        ea2 = float(ev[i - 1]) if i <= len(ev) else 0.0
        out.append(
            (
                i,
                int(tie["n_rows"]),
                # SUM over zero rows (or all-NULL embeddings) is NULL
                int(tie["fro2_q"] or 0),
                int(sb2 <= ea2 + tol),
                int(ea2 - sb2 <= bound + tol),
                fro_contained,
            )
        )
    return spark.createDataFrame(
        out,
        "rank long, n_rows long, fro2_q long, not_over int,"
        " within_bound int, fro_contained int",
    )
