"""Skew mitigation: salted two-stage aggregation.

A DNS log is Zipf-skewed on both entity dimensions — a handful of
domains (ad trackers) and clients (the NAT gateway) dominate. A
plain groupBy(domain).count() at 100 TB sends every row for the hot
key to ONE reducer; AQE's skew-join splitting helps joins but not
hash aggregation with a single hot group.

The classic fix is salting: append a random-ish salt to the key,
pre-aggregate (key, salt) — spreading the hot key over `n_salt`
reducers — then re-aggregate by key. Counts and sums re-aggregate
losslessly (sum of partials); so do min/max. Averages must be
carried as (sum, count) pairs. The salt here is deterministic
(crc32 of the row's event id mod n_salt) so results are stable
run-to-run and under the DuckDB oracle.

Note Spark's map-side partial aggregation already absorbs most
in-partition skew for simple counts; salting matters when the
per-partition distinct-key set is too large for the partial hash map
(spill) or when the hot key's partials still overwhelm one reducer.
It composes with — not replaces — AQE.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_count(
    df: DataFrame, key: str, salt_src: str, n_salt: int = 32
) -> DataFrame:
    """groupBy(key).count() with a deterministic two-stage salted
    plan: (key, salt) partial counts → per-key sum. Identical result
    to the direct aggregation; the hot key's rows fan out over
    `n_salt` stage-1 reducers."""
    salt = (F.crc32(F.col(salt_src).cast("string")) % n_salt).alias("_salt")
    partial = df.select(F.col(key), salt).groupBy(key, "_salt").agg(
        F.count(F.lit(1)).alias("_c")
    )
    return partial.groupBy(key).agg(F.sum("_c").cast("long").alias("cnt"))


def salted_avg(
    df: DataFrame, key: str, val: str, salt_src: str, n_salt: int = 32
) -> DataFrame:
    """groupBy(key).avg(val) via salted (sum, count) partials — the
    decomposition that stays exact under re-aggregation (an avg of
    partial avgs would weight groups wrongly)."""
    salt = (F.crc32(F.col(salt_src).cast("string")) % n_salt).alias("_salt")
    partial = (
        df.select(F.col(key), F.col(val), salt)
        .groupBy(key, "_salt")
        .agg(F.sum(val).alias("_s"), F.count(val).alias("_n"))
    )
    return partial.groupBy(key).agg(
        (F.sum("_s") / F.sum("_n")).alias("avg_val")
    )
