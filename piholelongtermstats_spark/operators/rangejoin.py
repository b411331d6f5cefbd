"""Range (interval) join — match events to time intervals that
contain them, without the O(n·m) theta-join Spark would otherwise
plan.

A bare `l.ts BETWEEN r.start AND r.end` join has no equi-key, so
Spark falls back to BroadcastNestedLoopJoin (fine for a broadcast-
sized interval table, quadratic disaster otherwise). The standard
scale fix is BINNING: overlay a fixed grid, explode each interval to
the bins it overlaps, join on the bin equi-key, then re-filter the
exact predicate. Cost: |intervals| × avg_bins_per_interval exploded
rows and ONE hash shuffle — the theta join becomes an equi join.

Bin width trades explosion factor against candidate precision; pick
it near the median interval length. All deterministic, fully
expressible in DuckDB SQL (plain inequality join) for the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BIN_SECONDS = 3600


def range_join_binned(
    events: DataFrame,
    intervals: DataFrame,
    ts_col: str = "ts",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    bin_seconds: int = BIN_SECONDS,
    how: str = "inner",
) -> DataFrame:
    """Join rows of `events` to every interval (inclusive bounds)
    containing their timestamp, on a bin equi-key.

    Intervals explode to ceil(len/bin)+1 grid cells via sequence();
    events map to exactly one cell — the join is a plain hash join on
    `_bin`, and the exact BETWEEN predicate re-filters candidates.
    """
    ev = events.withColumn(
        "_bin", F.floor(F.unix_timestamp(F.col(ts_col)) / bin_seconds)
    )
    iv = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(start_col)) / bin_seconds),
                F.floor(F.unix_timestamp(F.col(end_col)) / bin_seconds),
            )
        ),
    )
    joined = ev.join(iv, "_bin", how).filter(
        (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) <= F.col(end_col))
    )
    return joined.drop("_bin")
