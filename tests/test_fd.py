"""Frequent Directions: exact recovery under capacity, Liberty
spectral-error bound vs numpy, merge path stability."""

from __future__ import annotations

import numpy as np
import pytest

from piholelongtermstats_spark.operators import fd


def _emb_df(spark, x):
    return spark.createDataFrame(
        [(i, row.tolist(), 0) for i, row in enumerate(x)],
        "vec_id long, embedding array<double>, label int",
    )


def _rng_matrix(n, d, rank=4):
    """Deterministic low-rank-plus-noise matrix (no RNG state leaks:
    fixed seed)."""
    rng = np.random.default_rng(12345)
    u = rng.normal(size=(n, rank))
    v = rng.normal(size=(rank, d))
    return u @ v + 0.01 * rng.normal(size=(n, d))


def test_fd_exact_when_under_capacity(spark):
    """n ≤ ℓ: the sketch's Gramian equals AᵀA to fp tolerance, so the
    top singular values match numpy exactly (rounded)."""
    x = _rng_matrix(10, 8)
    got = fd.fd_sketch_spectrum(
        _emb_df(spark, x), ell=16, dim=8, top=8
    ).collect()
    want = np.linalg.svd(x, compute_uv=False)
    assert len(got) == 8
    for r in got:
        assert r.sigma == pytest.approx(round(want[r.rank - 1], 4), abs=2e-4)


def test_fd_liberty_bound_over_capacity(spark):
    """n ≫ ℓ across several partitions: ‖AᵀA − BᵀB‖₂ ≤ 2‖A‖_F²/ℓ and
    every sketched singular value lower-bounds the true one."""
    x = _rng_matrix(600, 16)
    ell = 8
    df = _emb_df(spark, x).repartition(7)
    parts = df.select("embedding").mapInPandas(
        fd._partition_sketches(ell, 16), schema="row array<double>"
    )
    merged_rows = (
        parts.repartition(1)
        .mapInPandas(fd._merge_sketches(ell, 16), schema="rank int, sigma double")
        .collect()
    )
    got = {r.rank: r.sigma for r in merged_rows}
    true_sv = np.linalg.svd(x, compute_uv=False)
    fro2 = float((x * x).sum())
    # reconstruct BᵀB spectral deviation via the sketched sigmas:
    # sigma_i(B)² ≤ sigma_i(A)² ≤ sigma_i(B)² + 2‖A‖_F²/ℓ  (Liberty)
    bound = 2 * fro2 / ell
    for i in range(1, min(len(true_sv), len(got)) + 1):
        assert got[i] ** 2 <= true_sv[i - 1] ** 2 + 1e-6
        assert true_sv[i - 1] ** 2 - got[i] ** 2 <= bound + 1e-6


def test_fd_registry_shape(spark):
    x = _rng_matrix(100, 8)
    out = fd.fd_sketch_spectrum(_emb_df(spark, x), ell=8, dim=8, top=5)
    rows = out.collect()
    assert [r.rank for r in rows] == [1, 2, 3, 4, 5]
    assert all(rows[i].sigma >= rows[i + 1].sigma for i in range(len(rows) - 1))


def test_fd_spectrum_audit_verdicts_and_tie_in(spark):
    """All verdicts hold on a well-behaved matrix, and the quantized
    Frobenius tie-in matches a pure-Python recompute."""
    x = _rng_matrix(300, 16)
    out = fd.fd_spectrum_audit(_emb_df(spark, x), ell=8, dim=16, top=5).collect()
    assert [r.rank for r in out] == [1, 2, 3, 4, 5]
    want_q = sum(int(np.floor(float(v) * 1000)) ** 2 for row in x for v in row)
    for r in out:
        assert r.n_rows == 300
        assert r.fro2_q == want_q
        assert r.not_over == 1
        assert r.within_bound == 1
        assert r.fro_contained == 1


def test_fd_spectrum_audit_catches_inflated_sketch(spark, monkeypatch):
    """Adversarial: an FD implementation that overestimates a singular
    value must flip not_over to 0 (i.e. the driver hash would fail)."""
    real = fd._merge_sketches

    def inflated(ell, dim):
        inner = real(ell, dim)

        def merge(batches):
            for pdf in inner(batches):
                pdf = pdf.copy()
                pdf["sigma"] = pdf["sigma"] * 10.0
                yield pdf

        return merge

    monkeypatch.setattr(fd, "_merge_sketches", inflated)
    x = _rng_matrix(300, 16)
    out = fd.fd_spectrum_audit(_emb_df(spark, x), ell=8, dim=16, top=5).collect()
    assert any(r.not_over == 0 for r in out)
