"""Floating-point determinism margins for the pinned IVF/PQ oracles
(r4 ADVICE).

The ivf_ann_topk / pq_ann_topk oracle comparisons assume the Spark
side (numpy BLAS matmul, pairwise/SIMD accumulation) and the DuckDB
side (list_dot_product, sequential accumulation) agree on every
argmax/ordering decision. Non-associativity means that assumption
holds only while no decision is within fp error of a tie. This test
MEASURES those margins on the actual corpus against an
exactly-rounded reference (math.fsum): if a future corpus or quantizer
change brings any decision within ulp range, the failure lands here
with a number — not as a mystery hash mismatch in the parity suite.

Decisions covered (the ones the oracle replays):
  - IVF cell assignment: argmax over 16 centroid scores per vector;
  - IVF probe selection: the nprobe-th vs (nprobe+1)-th centroid
    distance cut for the query vector;
  - PQ per-subspace code assignment: argmax over 16 codes × 8
    subspaces per vector.
"""

from __future__ import annotations

import math
import os

import numpy as np
import pyarrow.parquet as papq
import pytest

from piholelongtermstats_spark.operators import ivf as ivf_mod
from piholelongtermstats_spark.operators import pq as pq_mod

SF_DIRS = [
    d for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01")
    if os.path.isdir(d)
]

# Margins far above double-precision accumulation error for dim-64
# dot products of O(1) components (error ~1e-13); anything smaller
# than this and the two engines could legitimately disagree.
MIN_SAFE_MARGIN = 1e-7


def _load(sf_dir: str) -> np.ndarray:
    t = papq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    return np.stack(t.column("embedding").to_pylist()).astype(np.float64)


def _fsum_scores(V: np.ndarray, C: np.ndarray, half: np.ndarray) -> np.ndarray:
    """Exactly-rounded reference: math.fsum per (vector, centroid)."""
    out = np.empty((len(V), len(C)))
    for i, v in enumerate(V):
        for j, c in enumerate(C):
            out[i, j] = math.fsum(v * c) - half[j]
    return out


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_ivf_cell_assignment_margins(sf_dir):
    V = _load(sf_dir)
    C = np.asarray(ivf_mod.fixed_centroids(V.shape[1]), dtype=np.float64)
    half = 0.5 * (C * C).sum(axis=1)
    blas = V @ C.T - half[None, :]
    ref = _fsum_scores(V, C, half)
    # same winner under both accumulation orders
    assert (np.argmax(blas, axis=1) == np.argmax(ref, axis=1)).all()
    # and the winner is never a near-tie
    top2 = np.partition(ref, -2, axis=1)[:, -2:]
    margins = top2[:, 1] - top2[:, 0]
    assert margins.min() > MIN_SAFE_MARGIN, margins.min()


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_ivf_probe_cut_margin(sf_dir):
    V = _load(sf_dir)
    C = np.asarray(ivf_mod.fixed_centroids(V.shape[1]), dtype=np.float64)
    q = V[0]
    d = ((C - q[None, :]) ** 2).sum(axis=1)
    order = np.argsort(d, kind="stable")
    cut = d[order[ivf_mod.N_PROBE]] - d[order[ivf_mod.N_PROBE - 1]]
    assert cut > MIN_SAFE_MARGIN, cut


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_pq_code_assignment_margins(sf_dir):
    V = _load(sf_dir)
    cbs = pq_mod.fixed_codebooks(V.shape[1])
    subdim = V.shape[1] // len(cbs)
    worst = np.inf
    for s, cb in enumerate(cbs):
        C = np.asarray(cb, dtype=np.float64)
        half = 0.5 * (C * C).sum(axis=1)
        Vs = V[:, s * subdim : (s + 1) * subdim]
        blas = Vs @ C.T - half[None, :]
        ref = _fsum_scores(Vs, C, half)
        assert (np.argmax(blas, axis=1) == np.argmax(ref, axis=1)).all()
        top2 = np.partition(ref, -2, axis=1)[:, -2:]
        worst = min(worst, float((top2[:, 1] - top2[:, 0]).min()))
    assert worst > MIN_SAFE_MARGIN, worst


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_semdedup_assignment_and_threshold_margins(sf_dir):
    """r5: the semantic_dedup oracle replays two fp decisions —
    spherical cell assignment (argmax cosine over 16 centroids) and
    the removal threshold round(cos,6) ≥ τ on within-cluster pairs.
    Measure both margins against exactly-rounded references."""
    from piholelongtermstats_spark.operators import semdedup as sd

    V = _load(sf_dir)
    C = np.asarray(
        ivf_mod.fixed_centroids(V.shape[1], sd.N_CLUSTERS), dtype=np.float64
    )
    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
    blas = V @ Cn.T
    ref = np.empty_like(blas)
    for j in range(len(Cn)):
        for i, v in enumerate(V):
            ref[i, j] = math.fsum(v * Cn[j])
    assert (np.argmax(blas, axis=1) == np.argmax(ref, axis=1)).all()
    top2 = np.partition(ref, -2, axis=1)[:, -2:]
    assert (top2[:, 1] - top2[:, 0]).min() > MIN_SAFE_MARGIN

    # threshold decision: no within-cluster pair's ROUNDED cosine sits
    # on the τ boundary closer than the cross-engine rounding error
    # band (~1e-13 on the unrounded value ⇒ a flip requires the
    # unrounded cosine within 1e-13 of a 5e-7 decimal midpoint).
    cells = np.argmax(blas, axis=1)
    norms = np.linalg.norm(V, axis=1)
    worst = 1.0
    for cell in np.unique(cells):
        idx = np.where(cells == cell)[0]
        if len(idx) < 2:
            continue
        W = V[idx] / norms[idx, None]
        cos = W @ W.T
        iu = np.triu_indices(len(idx), k=1)
        r = np.round(cos[iu], 6)
        worst = min(worst, np.abs(r - sd.THRESHOLD).min())
    # rounded values are multiples of 1e-6; a nonzero gap means the
    # decision is pinned a full rounding step away from the boundary
    assert worst == 0.0 or worst > 5e-7, worst


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_ivfpq_residual_code_and_probe_margins(sf_dir):
    """r5: the ivfpq_ann_topk oracle replays residual PQ code
    assignment (argmax over 16 codes × 8 subspaces on v − c[cell])
    and the spherical probe cut — measure both margins. The spherical
    CELL assignment margin is covered by the semdedup test (same
    centroids, same routing rule)."""
    from piholelongtermstats_spark.operators import ivfpq as ivfpq_mod

    V = _load(sf_dir)
    C = np.asarray(
        ivf_mod.fixed_centroids(V.shape[1], ivfpq_mod.N_CELLS), dtype=np.float64
    )
    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
    cells = np.argmax(V @ Cn.T, axis=1)
    R = V - C[cells]
    cbs = pq_mod.fixed_codebooks(V.shape[1])
    subdim = V.shape[1] // len(cbs)
    for s, book in enumerate(cbs):
        B = np.asarray(book, dtype=np.float64)
        half = 0.5 * (B * B).sum(axis=1)
        Rs = R[:, s * subdim : (s + 1) * subdim]
        blas = Rs @ B.T - half[None, :]
        ref = np.empty_like(blas)
        for j in range(len(B)):
            for i in range(len(Rs)):
                ref[i, j] = math.fsum(Rs[i] * B[j]) - half[j]
        assert (np.argmax(blas, axis=1) == np.argmax(ref, axis=1)).all()
        top2 = np.partition(ref, -2, axis=1)[:, -2:]
        assert (top2[:, 1] - top2[:, 0]).min() > MIN_SAFE_MARGIN

    # probe cut: the nprobe-th vs (nprobe+1)-th centroid cosine gap
    q = V[0]
    sims = Cn @ (q / np.linalg.norm(q))
    order = np.argsort(-sims, kind="stable")
    cut = sims[order[ivfpq_mod.N_PROBE - 1]] - sims[order[ivfpq_mod.N_PROBE]]
    assert cut > MIN_SAFE_MARGIN, cut


# ---------------------------------------------------------------------------
# r11: TRAINED-quantizer margins. The *_trained oracles replay the
# Lloyd trainers as unrolled CTEs (plans/oracle_train.py) with raw
# avg() — safe only while (a) every TRAINING-time assignment and (b)
# every SEARCH-time decision has a margin far above the cross-engine
# accumulation band (~1e-13, which also bounds the Spark-avg vs
# DuckDB-avg centroid divergence that feeds later decisions). This
# replicates each trainer in numpy (same seeds, same update rule —
# numpy mean vs Spark avg differs ~1e-15, irrelevant at 1e-7 margins)
# and measures every iteration's worst assignment margin plus the
# final search margins.
# ---------------------------------------------------------------------------

import hashlib

# The trained quantizers are data-adaptive, so their worst margins run
# tighter than the md5-synthesized fixed quantizers' (observed min:
# 7.5e-8, a PQ code decision at sf0.001). That is still ~5 orders of
# magnitude above the measured cross-engine accumulation band
# (~1e-13 worst-case for dim-64 O(1) dot products, and the
# Spark-avg/DuckDB-avg centroid divergence it bounds), so the replay
# stays deterministic; the gate keeps four orders of safety.
TRAINED_MIN_MARGIN = 1e-8


def _ids(sf_dir: str) -> np.ndarray:
    t = papq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    return np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64)


def _seed_order(ids: np.ndarray) -> np.ndarray:
    h = np.array(
        [
            int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16)
            for i in ids
        ]
    )
    return np.lexsort((ids, h))


def _lloyd_margins(
    V: np.ndarray, ids: np.ndarray, n_cells: int, n_iters: int, metric: str
) -> tuple[np.ndarray, float]:
    """Replicate ivf.train_centroids / semdedup.train_spherical_
    centroids; return (centroids, worst assignment margin over all
    iterations)."""
    cents = V[_seed_order(ids)[:n_cells]].copy()
    worst = np.inf
    for _ in range(n_iters):
        if metric == "l2":
            S = V @ cents.T - 0.5 * (cents * cents).sum(axis=1)[None, :]
        else:
            Cn = cents / np.linalg.norm(cents, axis=1, keepdims=True)
            S = V @ Cn.T
        a = np.argmax(S, axis=1)
        top2 = np.partition(S, -2, axis=1)[:, -2:]
        worst = min(worst, float((top2[:, 1] - top2[:, 0]).min()))
        for c in range(n_cells):
            m = V[a == c]
            if len(m):
                cents[c] = m.mean(axis=0)
    return cents, worst


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_trained_ivf_margins(sf_dir):
    """ivf_ann_topk_trained: 2 L2-Lloyd iterations on the %4
    subsample, then full-corpus assignment + probe cut."""
    V, ids = _load(sf_dir), _ids(sf_dir)
    tr = ids % 4 == 0
    C, train_m = _lloyd_margins(V[tr], ids[tr], ivf_mod.N_CELLS, 2, "l2")
    assert train_m > TRAINED_MIN_MARGIN, train_m
    S = V @ C.T - 0.5 * (C * C).sum(axis=1)[None, :]
    top2 = np.partition(S, -2, axis=1)[:, -2:]
    assert (top2[:, 1] - top2[:, 0]).min() > TRAINED_MIN_MARGIN
    d = ((C - V[0][None, :]) ** 2).sum(axis=1)
    order = np.argsort(d, kind="stable")
    cut = d[order[ivf_mod.N_PROBE]] - d[order[ivf_mod.N_PROBE - 1]]
    assert cut > TRAINED_MIN_MARGIN, cut


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_trained_spherical_margins(sf_dir):
    """semantic_dedup_trained (full corpus), knn_join_ivf_trained
    (corpus half), ivfpq_ann_topk_trained coarse (full corpus): 3
    cos-Lloyd iterations each, then assignment + probe margins."""
    from piholelongtermstats_spark.operators import knn as knn_mod
    from piholelongtermstats_spark.operators import semdedup as sd

    V, ids = _load(sf_dir), _ids(sf_dir)
    for pred in (slice(None), ids >= knn_mod.N_QUERIES):
        C, train_m = _lloyd_margins(
            V[pred], ids[pred], sd.N_CLUSTERS, sd.N_ITERS, "cos"
        )
        assert train_m > TRAINED_MIN_MARGIN, train_m
        Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
        S = V @ Cn.T
        top2 = np.partition(S, -2, axis=1)[:, -2:]
        assert (top2[:, 1] - top2[:, 0]).min() > TRAINED_MIN_MARGIN
        # probe cuts: every query vector the legs route (vec 0 for
        # ivfpq; the first N_QUERIES for the knn join)
        for qi in range(knn_mod.N_QUERIES):
            sims = Cn @ (V[qi] / np.linalg.norm(V[qi]))
            o = np.argsort(-sims, kind="stable")
            cut = sims[o[knn_mod.N_PROBE - 1]] - sims[o[knn_mod.N_PROBE]]
            assert cut > TRAINED_MIN_MARGIN, (qi, cut)


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_trained_pq_margins(sf_dir):
    """pq_ann_topk_trained (%2 subsample, 2 iters) and ivfpq's PQ leg
    (full corpus, 3 iters): per-subspace Lloyd margins, then
    full-corpus (or residual) code-assignment margins."""
    from piholelongtermstats_spark.operators import semdedup as sd

    V, ids = _load(sf_dir), _ids(sf_dir)
    subdim = V.shape[1] // pq_mod.N_SUB

    def _pq_case(train_mask, n_iters, apply_M):
        Vt, it = V[train_mask], ids[train_mask]
        order = _seed_order(it)[: pq_mod.N_CODES]
        for s in range(pq_mod.N_SUB):
            sl = slice(s * subdim, (s + 1) * subdim)
            # per-subspace Lloyd with SHARED seed rows (the trainer
            # splits whole-vector seeds): run it explicitly.
            B = Vt[order][:, sl].copy()
            worst = np.inf
            for _ in range(n_iters):
                S = Vt[:, sl] @ B.T - 0.5 * (B * B).sum(axis=1)[None, :]
                a = np.argmax(S, axis=1)
                t2 = np.partition(S, -2, axis=1)[:, -2:]
                worst = min(worst, float((t2[:, 1] - t2[:, 0]).min()))
                for c in range(pq_mod.N_CODES):
                    m = Vt[:, sl][a == c]
                    if len(m):
                        B[c] = m.mean(axis=0)
            assert worst > TRAINED_MIN_MARGIN, (s, worst)
            S = apply_M[:, sl] @ B.T - 0.5 * (B * B).sum(axis=1)[None, :]
            t2 = np.partition(S, -2, axis=1)[:, -2:]
            assert (t2[:, 1] - t2[:, 0]).min() > TRAINED_MIN_MARGIN, s

    # pq_ann_topk_trained: train on %2, encode the full corpus
    _pq_case(ids % 2 == 0, 2, V)
    # ivfpq_ann_topk_trained: train on the full corpus, encode the
    # RESIDUALS against the trained spherical cells
    C, _ = _lloyd_margins(V, ids, sd.N_CLUSTERS, sd.N_ITERS, "cos")
    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
    cells = np.argmax(V @ Cn.T, axis=1)
    _pq_case(np.ones(len(V), dtype=bool), pq_mod.N_ITERS, V - C[cells])


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_near_dup_pair_value_midpoint_margins(sf_dir):
    """r5: embedding_near_dup's ORACLE compares the 6-digit-rounded
    cosine VALUES, and the Spark side now computes them with a
    grouped BLAS matmul while DuckDB accumulates sequentially. The
    rounded values agree as long as no pair's true cosine sits within
    accumulation error (~1e-13) of a 5e-7 rounding midpoint — measure
    that distance for EVERY within-bucket pair."""
    from piholelongtermstats_spark.operators import similarity as sim

    V = _load(sf_dir)
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    planes = np.asarray(
        [sim.plane_signs(V.shape[1], p) for p in range(sim.N_PLANES)]
    )
    buckets = ((V @ planes.T) > 0) @ (1 << np.arange(sim.N_PLANES))
    worst_clear = 1.0
    worst_diverge = 0.0
    for bkt in np.unique(buckets):
        idx = np.where(buckets == bkt)[0]
        if len(idx) < 2:
            continue
        S = Vn[idx] @ Vn[idx].T
        iu = np.triu_indices(len(idx), k=1)
        c = S[iu]
        # distance from the nearest x.5e-6 rounding midpoint
        frac = np.abs((c * 1e6 + 0.5) % 1.0 - 0.5)  # dist to nearest int of c*1e6+0.5
        worst_clear = min(worst_clear, frac.min() / 1e6)
        # MEASURED accumulation divergence: BLAS matmul vs
        # exactly-rounded fsum, pair for pair (the worst-case n·eps
        # bound ≈ 1.4e-14 is pessimistic by orders of magnitude)
        W = Vn[idx]
        ref = np.array(
            [math.fsum(W[a] * W[b]) for a, b in zip(iu[0], iu[1])]
        )
        worst_diverge = max(worst_diverge, np.abs(c - ref).max())
    # every pair's rounded value is pinned: the clearance to the
    # nearest rounding midpoint must dwarf the observed cross-method
    # error (measured ~1e-16; clearance ≥ ~7e-13 at these SFs). NB
    # this is a TEST-SCALE determinism guarantee for the oracle
    # harness — at ~1e9 pairs the expected clearance approaches the
    # error band and value-level cross-engine hashes stop being
    # meaningful (threshold DECISIONS, as in semdedup, degrade
    # gracefully; value hashes would not).
    assert worst_diverge < worst_clear / 100, (worst_diverge, worst_clear)
