"""M56 — multiple regression + prequential-anomaly scale proof:

- ``weekend_adjusted_trend`` — y = a + b·t + c·is_weekend by exact
  normal equations; the Cramer determinants evaluate ONE shared
  expression string through F.expr and verbatim oracle SQL, so the
  operand trees match by construction.
- ``zscore_scale_2x`` — client-doubled prequential z-scores: every
  copy carries identical per-day histories, so scores and spike
  flags are copy-invariant while row volume doubles; checked against
  the direct oracle on the doubled input.

Both DuckDB-oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from piholelongtermstats_spark.operators import anomaly, robust
from piholelongtermstats_spark.operators.robust import (
    WK_DET,
    WK_DET_A,
    WK_DET_B,
    WK_DET_C,
)
from piholelongtermstats_spark.plans.registry import _fact, register
from piholelongtermstats_spark.plans.registry_m48 import _RZ_SQL
from piholelongtermstats_spark.sources.events import FACT_CTE

_WK_SQL = (
    FACT_CTE
    + f"""
, daily AS (
  SELECT date, CAST(count(*) AS BIGINT) AS y FROM fact GROUP BY date
), scored AS (
  SELECT y,
    CAST(date_diff('day', (SELECT min(date) FROM daily), date) AS BIGINT)
      AS t,
    CAST(dayofweek(date) IN (0, 6) AS BIGINT) AS w
  FROM daily
), m AS (
  SELECT CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(t) AS HUGEINT) AS st,
         CAST(sum(w) AS HUGEINT) AS sw,
         CAST(sum(t * t) AS HUGEINT) AS stt,
         CAST(sum(t * w) AS HUGEINT) AS stw,
         CAST(sum(y) AS HUGEINT) AS sy,
         CAST(sum(t * y) AS HUGEINT) AS sty,
         CAST(sum(w * y) AS HUGEINT) AS swy
  FROM scored
)
SELECT CAST(n AS BIGINT) AS n_days,
  round(CASE WHEN {WK_DET} <> 0 THEN
    CAST({WK_DET_A} AS DOUBLE) / CAST({WK_DET} AS DOUBLE) END, 6)
    AS intercept,
  round(CASE WHEN {WK_DET} <> 0 THEN
    CAST({WK_DET_B} AS DOUBLE) / CAST({WK_DET} AS DOUBLE) END, 6)
    AS slope_per_day,
  round(CASE WHEN {WK_DET} <> 0 THEN
    CAST({WK_DET_C} AS DOUBLE) / CAST({WK_DET} AS DOUBLE) END, 6)
    AS weekend_effect
FROM m
"""
)


@register("weekend_adjusted_trend", _WK_SQL)
def q_weekend_adjusted_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-parameter OLS over the daily series
    (operators/robust.py)."""
    return robust.weekend_adjusted_trend(_fact(spark, sf_dir))


_Z2X_SQL = _RZ_SQL.replace(
    "FROM fact GROUP BY client, date",
    """FROM (SELECT client, date FROM fact
      UNION ALL
      SELECT 'x_' || client, date FROM fact)
  GROUP BY client, date""",
    1,
)


@register("zscore_scale_2x", _Z2X_SQL)
def q_zscore_scale_2x(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prequential z over the client-doubled fact: per-copy scores
    identical, volume doubled (operators/anomaly.py)."""
    fact = _fact(spark, sf_dir)
    doubled = fact.unionByName(
        fact.withColumn("client", F.concat(F.lit("x_"), F.col("client")))
    )
    daily = doubled.groupBy("client", "date").agg(
        F.count(F.lit(1)).cast("long").alias("y")
    )
    return anomaly.running_zscore_by_client(daily)
