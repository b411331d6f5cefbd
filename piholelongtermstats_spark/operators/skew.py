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


def key_skew_report(df: DataFrame, col: str, top_k: int = 10) -> DataFrame:
    """One-row skew diagnostic for a grouping key: total rows, distinct
    keys, the hottest key's count and share, and the top-``top_k``
    concentration — the measurement that decides whether a key needs
    salting / AQE skew handling before it burns a 100 TB job.

    Shape: one map-side-combined groupBy over the key (the same
    aggregation any query on this key would run), then everything else
    operates on the KEY HISTOGRAM (|distinct keys| rows): the top-k is
    TakeOrderedAndProject with a (cnt desc, key) deterministic
    tie-break, the totals a single aggregate. Shares are one division
    each, rounded to 6 — the integer counts are the contract, the
    shares the display.
    """
    counts = df.groupBy(col).agg(F.count(F.lit(1)).alias("cnt"))
    totals = counts.agg(
        F.sum("cnt").alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("cnt").alias("max_cnt"),
    )
    topk = (
        counts.orderBy(F.desc("cnt"), F.asc(col))
        .limit(top_k)
        .agg(F.sum("cnt").alias("topk_cnt"))
    )
    return totals.crossJoin(F.broadcast(topk)).select(
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("n_keys").cast("long").alias("n_keys"),
        F.col("max_cnt").cast("long").alias("max_cnt"),
        F.round(
            F.col("max_cnt").cast("double") / F.col("n_rows").cast("double"), 6
        ).alias("max_share"),
        F.col("topk_cnt").cast("long").alias("topk_cnt"),
        F.round(
            F.col("topk_cnt").cast("double") / F.col("n_rows").cast("double"), 6
        ).alias("topk_share"),
    )
