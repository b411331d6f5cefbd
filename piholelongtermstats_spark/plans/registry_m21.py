"""M21 — statistical-test wave (integer-exact sufficient statistics,
continuing the M20 regression family):

- ``cusum_changepoint`` — one-sided upward CUSUM change-point scan.
  The sequential fold s_i = max(0, s_{i-1} + (y_i − ȳ)) is rewritten
  through the drawup identity s_i = P_i − min(0, min_{j<=i} P_j)
  with P the n-SCALED deviation prefix sum (n·y − Σy, so the mean
  never divides) — two running windows over the tiny daily relation
  replace the recursion, and both engines run the identical windows.
- ``weekday_chi2_uniformity`` — χ² goodness-of-fit of volume against
  a uniform day-of-week model: χ² = Σ(7·O_i − n)²/(7n); the numerator
  is exact BIGINT over the zero-filled 7-category spine, χ² one
  division.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from piholelongtermstats_spark.operators import timeagg
from piholelongtermstats_spark.plans.registry import _fact, register
from piholelongtermstats_spark.sources.events import FACT_CTE

_CUSUM_SQL = (
    FACT_CTE
    + """
, daily AS (
  SELECT date, CAST(count(*) AS BIGINT) AS y FROM fact GROUP BY date
), tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS sy
  FROM daily
), scanned AS (
  SELECT date,
         CAST(sum(n * y - sy) OVER (ORDER BY date ROWS UNBOUNDED PRECEDING)
              AS BIGINT) AS p
  FROM daily, tot
), s2 AS (
  SELECT date,
         p - least(0, min(p) OVER (ORDER BY date ROWS UNBOUNDED PRECEDING))
           AS s
  FROM scanned
)
SELECT t.n AS n_days,
       m.max_cusum,
       round(CAST(m.max_cusum AS DOUBLE) / NULLIF(CAST(t.n AS DOUBLE), 0), 6)
         AS cusum_norm,
       (SELECT min(date) FROM s2 WHERE s = m.max_cusum) AS peak_date
FROM tot t, (SELECT max(s) AS max_cusum FROM s2) m
"""
)


@register("cusum_changepoint", _CUSUM_SQL)
def q_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM upward change-point over daily counts — the sequential
    fold as two running windows (operators/timeagg.py)."""
    return timeagg.cusum_changepoint(_fact(spark, sf_dir))


_CHI2_SQL = (
    FACT_CTE
    + """
, spine AS (
  SELECT unnest(['Monday', 'Tuesday', 'Wednesday', 'Thursday',
                 'Friday', 'Saturday', 'Sunday']) AS day_name
), obs AS (
  SELECT day_name, count(*) AS o FROM fact GROUP BY day_name
), filled AS (
  SELECT CAST(coalesce(o, 0) AS BIGINT) AS o
  FROM spine LEFT JOIN obs USING (day_name)
), tot AS (
  SELECT CAST(sum(o) AS BIGINT) AS n FROM filled
)
SELECT max(n) AS n,
       CAST(sum((7 * o - n) * (7 * o - n)) AS BIGINT) AS chi2_num,
       round(CAST(sum((7 * o - n) * (7 * o - n)) AS DOUBLE)
             / NULLIF(CAST(7 * max(n) AS DOUBLE), 0), 6) AS chi2,
       CAST(6 AS BIGINT) AS dof
FROM filled, tot
"""
)


@register("weekday_chi2_uniformity", _CHI2_SQL)
def q_weekday_chi2_uniformity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square uniformity test of the day-of-week volume profile —
    exact-integer numerator, one division (operators/timeagg.py)."""
    return timeagg.weekday_chi2(_fact(spark, sf_dir))
