"""As-of join — enrich each left row with the most recent right row
at or before its timestamp, per key.

The canonical "custom operator Spark lacks": no built-in as-of join
exists in Spark SQL (pandas-on-Spark merge_asof shuffles per call;
range-join hints need Databricks). The composition here is the
standard union-and-carry idiom, made scale-safe:

  1. Tag both sides, union into one (key, ts, side, payload) stream.
  2. Within each (key, DATE) partition — parallel, never global —
     carry the last right-side payload forward with
     last(..., ignoreNulls) over an unbounded-preceding frame.
  3. Rows in a partition whose carry is still NULL (no right row yet
     that date) take the boundary carry-in: the last right value of
     any PRIOR date, computed by the same cumulative trick over the
     tiny per-(key, date) summary — rows = keys × dates, the same
     decomposition as operators/sequential.py.

Ordering within equal timestamps puts the right side FIRST, so a
right row at exactly t serves a left row at t ("at or before").

DuckDB has native ASOF JOIN — the oracle uses it directly, making
this one of the few custom operators with a first-class oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    date_col: str | None = None,
) -> DataFrame:
    """Left as-of join: every `left` row + the latest `right` payload
    with right_ts <= left_ts for the same key (NULLs if none).

    `value_cols` are the right-side columns to carry. All heavy
    windows partition by (key, date); only the keys×dates summary
    sees an unbounded-by-date window.
    """
    l_tag = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*[F.lit(None).cast(dict(right.dtypes)[c]).alias(c) for c in value_cols]).alias("_payload"),
        F.struct(*left.columns).alias("_row"),
    )
    r_tag = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.struct(*[F.col(c).alias(c) for c in value_cols]).alias("_payload"),
        F.lit(None).cast(l_tag.schema["_row"].dataType).alias("_row"),
    )
    u = l_tag.unionByName(r_tag).withColumn("_d", F.to_date(F.col("_ts")))

    w_day = (
        Window.partitionBy("_k", "_d")
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.withColumn(
        "_carry",
        F.last(F.when(F.col("_side") == 0, F.col("_payload")), ignorenulls=True).over(
            w_day
        ),
    )

    # Boundary carry-in: last right payload per (key, date), cumulated
    # over STRICTLY PRIOR dates on the tiny summary. The date domain is
    # every (key, date) present on either side — a date with no right
    # rows contributes NULL and passes the carry through (ignorenulls).
    # Right-side (key, ts) pairs are assumed unique (as-of with
    # duplicate right timestamps is ambiguous in any engine).
    dates = u.select("_k", "_d").distinct()
    # NB (r12): deriving right_last from the small right side alone
    # was measured SLOWER than this shape — filtering the union lets
    # AQE reuse the window's (_k, _d) exchange for this groupBy, so
    # the "extra" scan is a reused shuffle read, not a recompute.
    right_last = (
        u.filter(F.col("_side") == 0)
        .groupBy("_k", "_d")
        .agg(F.max_by("_payload", F.col("_ts")).alias("_day_last"))
    )
    w_days = (
        Window.partitionBy("_k")
        .orderBy("_d")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry_in = (
        dates.join(right_last, ["_k", "_d"], "left")
        .withColumn("_carry_in", F.last("_day_last", ignorenulls=True).over(w_days))
        .select("_k", "_d", "_carry_in")
    )

    out = (
        carried.filter(F.col("_side") == 1)
        .join(carry_in, ["_k", "_d"], "left")
        .withColumn("_final", F.coalesce(F.col("_carry"), F.col("_carry_in")))
    )
    return out.select(
        *[F.col(f"_row.{c}").alias(c) for c in left.columns],
        *[F.col(f"_final.{c}").alias(c) for c in value_cols],
    )
