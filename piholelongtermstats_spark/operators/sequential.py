"""Sequential / window operators (M4) — the order-dependent 20%.

Reference: idle gaps via ``ts.diff()`` (stats.py:515, 369-408), average
time between blocked/allowed queries (stats.py:382-388), and
gaps-and-islands streak detection (stats.py:506-515 flags,
stats.py:324-366 aggregation).

Total-order caveat (SURVEY.md §2.6): a naive ``Window.orderBy(ts)``
with no partitioning funnels the whole table through one task. The gap
operators here use the distributed decomposition instead:

  1. lag within date partitions (parallel — date is derived from ts so
     partition order ⊂ global order), plus
  2. cross-midnight gaps from a per-date first/last summary (one row
     per date — tiny), unioned in.

This yields exactly the global-order result with no single-task stage
over the fact table. Streak detection keeps a documented global-order
window on a 3-column projection (ts, id, status) — see
``longest_streaks`` for the scale plan.

Event order is pinned to (ts, event_id): timestamps can tie, and an
unpinned order would be nondeterministic under oracle hashing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def consecutive_gaps(
    df: DataFrame,
    ts_col: str = "ts",
    id_col: str = "event_id",
    date_col: str = "date",
) -> DataFrame:
    """(prev_ts, next_ts, gap_us) for every consecutive pair in global
    (ts, id) order — distributed via date-partition + boundary stitch.

    gap_us is exact integer microseconds (both engines compute
    epoch-microsecond BIGINT subtraction — no float drift).
    """
    cols = [F.col(date_col).alias("_d"), F.col(ts_col).alias("_ts"), F.col(id_col).alias("_id")]
    ev = df.select(*cols)

    w_day = Window.partitionBy("_d").orderBy("_ts", "_id")
    within = (
        ev.withColumn("prev_ts", F.lag("_ts").over(w_day))
        .filter(F.col("prev_ts").isNotNull())
        .select("prev_ts", F.col("_ts").alias("next_ts"))
    )

    per_day = ev.groupBy("_d").agg(
        F.min(F.struct("_ts", "_id")).alias("first_ev"),
        F.max(F.struct("_ts", "_id")).alias("last_ev"),
    )
    w_days = Window.orderBy("_d")  # one row per date — single-task is fine
    boundary = (
        per_day.withColumn("prev_last", F.lag("last_ev").over(w_days))
        .filter(F.col("prev_last").isNotNull())
        .select(
            F.col("prev_last._ts").alias("prev_ts"),
            F.col("first_ev._ts").alias("next_ts"),
        )
    )
    both = within.unionByName(boundary)
    return both.select(
        "prev_ts",
        "next_ts",
        (F.unix_micros(F.col("next_ts")) - F.unix_micros(F.col("prev_ts"))).alias(
            "gap_us"
        ),
    )


def idle_gaps_top(fact: DataFrame, k: int = 10) -> DataFrame:
    """Top-K largest idle gaps with both endpoints (stats.py:369-408, W4).

    The reference finds idxmax then positionally reads rows idx-1/idx
    (stats.py:390-402); carrying prev_ts through the lag makes both
    endpoints one row — no positional lookup.
    """
    return consecutive_gaps(fact).orderBy(
        F.col("gap_us").desc(), F.col("next_ts").asc()
    ).limit(k)


def avg_gap_per_status(fact: DataFrame) -> DataFrame:
    """Average seconds between consecutive same-status queries
    (stats.py:382-388, A17), for Blocked and Allowed.

    Consecutive-within-status ⇒ gaps computed on each filtered stream.
    Exact integer sum of gap_us, one division ⇒ deterministic double.
    """
    out = None
    for st in ("Blocked", "Allowed"):
        gaps = consecutive_gaps(fact.filter(F.col("status_type") == st))
        agg = gaps.agg(
            F.lit(st).alias("status_type"),
            F.round(
                F.sum("gap_us").cast("double") / F.count(F.lit(1)) / 1000000.0, 6
            ).alias("avg_gap_sec"),
        )
        out = agg if out is None else out.unionByName(agg)
    return out


def longest_streaks(fact: DataFrame) -> DataFrame:
    """Longest consecutive run per status bucket: (status_type,
    streak_len, start_ts) — gaps-and-islands (stats.py:324-366 +
    flags at stats.py:506-515, W3/W5).

    Classic idiom: change-flag via lag → running sum over an
    unbounded-preceding frame → run-id groupBy → top-1 per status with
    pinned tie-break (len DESC, start_ts ASC).

    Scale note: the run-id assignment needs a total order. This
    operator first REDUCES the stream to a 3-column projection and the
    window sees only (ts, id, status) — at 100 TB the right variant is
    per-date runs + boundary-chain stitching on the tiny per-date
    summary (same decomposition as consecutive_gaps); the global-order
    window here is the correct-first fallback the stitched variant is
    verified against (SURVEY.md §7 M4).
    """
    ev = fact.select("ts", "event_id", "status_type")
    w = Window.orderBy("ts", "event_id")
    chg = F.when(
        F.lag("status_type").over(w).isNull()
        | (F.lag("status_type").over(w) != F.col("status_type")),
        1,
    ).otherwise(0)
    run_id = F.sum("chg").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    runs = (
        ev.withColumn("chg", chg)
        .withColumn("run_id", run_id)
        .groupBy("run_id", "status_type")
        .agg(F.count(F.lit(1)).alias("streak_len"), F.min("ts").alias("start_ts"))
    )
    w_top = Window.partitionBy("status_type").orderBy(
        F.col("streak_len").desc(), F.col("start_ts").asc()
    )
    return (
        runs.withColumn("rn", F.row_number().over(w_top))
        .filter(F.col("rn") == 1)
        .select("status_type", "streak_len", "start_ts")
    )
