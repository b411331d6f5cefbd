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
