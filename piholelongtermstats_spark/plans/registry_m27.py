"""M27 — matrix-sketch wave:

- ``fd_sketch_spectrum`` (rows-only: SVD fp edge, the trained-index
  class) — top singular values of the embedding matrix via a
  distributed Frequent-Directions sketch (Liberty KDD'13; mergeable
  per-partition sketches, one P·ℓ·d-double shuffle independent of n).
  pytest pins exact recovery under capacity and the 2‖A‖_F²/ℓ
  spectral bound against numpy (tests/test_fd.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from piholelongtermstats_spark.operators import fd
from piholelongtermstats_spark.plans.registry import register
from piholelongtermstats_spark.plans.registry_m14 import _emb


@register("fd_sketch_spectrum")  # rows-only: SVD fp edge, numpy-pinned
def q_fd_sketch_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed FD sketch spectrum, ℓ=16 over the 64-dim corpus
    (operators/fd.py)."""
    return fd.fd_sketch_spectrum(_emb(spark, sf_dir), ell=16, dim=64, top=8)
