"""Derived-column expressions — the enriched logical schema.

Reference: ``preprocess_df`` (piholelongtermstats/process.py:47-83)
builds 6 derived columns once per load. The reference implements two of
them as row-wise Python lambdas (day_period at process.py:64, and the
status_type masks at process.py:71-77); here every derivation is a
native Catalyst expression so the whole enrichment stays inside
whole-stage codegen — zero Python UDFs (SURVEY.md §2.10).

Scale note: these are per-row projections with no shuffle; they fuse
into the scan stage. The reference's global sort (process.py:59) is
deliberately NOT reproduced here — Spark analytics don't need a
physically sorted table; order-dependent operators (operators/
sequential.py) declare their own window ordering instead.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Pi-hole status enums → 3-way bucket (process.py:71-77).
ALLOWED_STATUSES = (2, 3, 12, 13, 14, 17)
BLOCKED_STATUSES = (1, 4, 5, 6, 7, 8, 9, 10, 11, 15, 16, 18)


def status_type(status: Column) -> Column:
    """3-way status bucket: Allowed / Blocked / Other (process.py:71-77)."""
    return (
        F.when(status.isin(*ALLOWED_STATUSES), F.lit("Allowed"))
        .when(status.isin(*BLOCKED_STATUSES), F.lit("Blocked"))
        .otherwise(F.lit("Other"))
    )


def day_period(hour: Column) -> Column:
    """'Day' iff 6 <= hour < 24 else 'Night' (process.py:64).

    The reference uses a row-wise ``apply`` lambda; this is the same
    predicate as a codegen-able CASE expression.
    """
    return F.when(hour.between(6, 23), F.lit("Day")).otherwise(F.lit("Night"))


def enrich_time(df: DataFrame, ts_col: str = "timestamp") -> DataFrame:
    """Add the time-derived columns date/hour/day_name/day_period.

    Mirrors process.py:60-79: date_trunc for the midnight-normalized
    date (process.py:62), hour extract (process.py:63), English weekday
    name (process.py:79), and the day/night bucket (process.py:64).
    ``hour`` is LongType to match oracle (DuckDB hour() → BIGINT).
    """
    ts = F.col(ts_col)
    h = F.hour(ts)
    return (
        df.withColumn("date", F.date_trunc("DAY", ts))
        .withColumn("hour", h.cast("long"))
        .withColumn("day_name", F.date_format(ts, "EEEE"))
        .withColumn("day_period", day_period(h))
    )


def preprocess(df: DataFrame) -> DataFrame:
    """Full enrichment of a raw `queries` frame (process.py:47-83).

    Input columns per schema.QUERIES_SCHEMA (`timestamp` is unix epoch
    seconds). Produces the canonical enriched fact table:
      ts (timestamp), date, hour, day_name, day_period, status_type,
      and reply_time coerced to nullable double (process.py:80 —
      pd.to_numeric(errors='coerce') ≡ try_cast).
    """
    df = df.withColumn("ts", F.timestamp_seconds(F.col("timestamp")))
    df = enrich_time(df, "ts")
    df = df.withColumn("status_type", status_type(F.col("status")))
    df = df.withColumn("reply_time", F.expr("try_cast(reply_time AS DOUBLE)"))
    return df
