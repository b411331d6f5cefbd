"""M28 — robust time-series / anomaly wave (operators/robust.py):
median/MAD outlier days, Theil–Sen robust trend, EWMA smoothing,
weekday multiplicative seasonal index. All four DuckDB-oracle-checked:
decisions (outlier gate, median element selection) are exact integer
arithmetic; reported fp values are one fixed IEEE expression per row
replayed verbatim in the oracle (the EWMA fold becomes a recursive
CTE with the identical per-step operand tree).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from piholelongtermstats_spark.operators import robust
from piholelongtermstats_spark.plans.registry import _fact, register
from piholelongtermstats_spark.sources.events import FACT_CTE

_DAILY = """
, daily AS (
  SELECT date, CAST(count(*) AS BIGINT) AS y FROM fact GROUP BY date
)"""

_MAD_SQL = (
    FACT_CTE
    + _DAILY
    + """
, nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM daily)
, ry AS (
  SELECT y, row_number() OVER (ORDER BY y, date) AS r FROM daily
)
, med AS (
  SELECT CAST(CASE WHEN n % 2 = 1 THEN 2 * sum(y) ELSE sum(y) END
              AS BIGINT) AS med2
  FROM ry, nn WHERE r IN ((n + 1) // 2, n // 2 + 1) GROUP BY n
)
, dev AS (
  SELECT date, y, med2, abs(2 * y - med2) AS u FROM daily, med
)
, ru AS (SELECT u, row_number() OVER (ORDER BY u) AS r FROM dev)
, mad AS (
  SELECT CAST(CASE WHEN n % 2 = 1 THEN 2 * sum(u) ELSE sum(u) END
              AS BIGINT) AS mad4
  FROM ru, nn WHERE r IN ((n + 1) // 2, n // 2 + 1) GROUP BY n
)
SELECT d.date AS date, d.y AS y, d.med2 AS med2, mad.mad4 AS mad4,
  2 * d.y - d.med2 AS dev2,
  round(CASE WHEN mad.mad4 > 0 THEN
    (2.0 * CAST(2 * d.y - d.med2 AS DOUBLE))
    / (1.4826 * CAST(mad.mad4 AS DOUBLE)) END, 6) AS robust_z,
  CAST(4 * d.u > 7 * mad.mad4 AS INT) AS is_outlier
FROM dev d, mad
"""
)


@register("mad_outlier_days", _MAD_SQL)
def q_mad_outlier_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median/MAD robust per-day outlier audit, integer-exact 3.5-MAD
    gate (operators/robust.py)."""
    return robust.mad_outlier_days(_fact(spark, sf_dir))


_THEIL_SEN_SQL = (
    FACT_CTE
    + _DAILY
    + """
, d0 AS (SELECT min(date) AS d0 FROM daily)
, idx AS (
  SELECT CAST(date_diff('day', d0, date) AS BIGINT) AS i, y
  FROM daily, d0
)
, pairs AS (
  SELECT b.y - a.y AS num, b.i - a.i AS den
  FROM idx a JOIN idx b ON a.i < b.i
)
, np AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs FROM pairs)
, ranked AS (
  SELECT CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS v,
         row_number() OVER (
           ORDER BY CAST(num AS DOUBLE) / CAST(den AS DOUBLE), num, den
         ) AS r
  FROM pairs
)
, med AS (
  SELECT CASE WHEN n_pairs % 2 = 1 THEN sum(v) ELSE sum(v) / 2.0 END
         AS slope
  FROM ranked, np WHERE r IN ((n_pairs + 1) // 2, n_pairs // 2 + 1)
  GROUP BY n_pairs
)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM daily) AS n_days,
       np.n_pairs AS n_pairs,
       round(med.slope, 6) AS slope_per_day
FROM med, np
"""
)


@register("theil_sen_trend", _THEIL_SEN_SQL)
def q_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust daily trend — exact rational median selection
    (operators/robust.py)."""
    return robust.theil_sen_daily_trend(_fact(spark, sf_dir))


# The EWMA recurrence needs WITH RECURSIVE; FACT_CTE's prefix is
# rewritten (RECURSIVE scopes the whole WITH list in DuckDB).
_EWMA_SQL = (
    FACT_CTE.replace("WITH fact AS", "WITH RECURSIVE fact AS", 1)
    + _DAILY
    + """
, seq AS (
  SELECT date, y, row_number() OVER (ORDER BY date) AS r FROM daily
)
, rec AS (
  SELECT r, date, y, CAST(y AS DOUBLE) AS e FROM seq WHERE r = 1
  UNION ALL
  SELECT s.r, s.date, s.y, 0.3 * CAST(s.y AS DOUBLE) + 0.7 * rec.e
  FROM seq s JOIN rec ON s.r = rec.r + 1
)
SELECT date, y, round(e, 6) AS ewma FROM rec
"""
)


@register("ewma_daily_counts", _EWMA_SQL)
def q_ewma_daily_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA(α=0.3) of daily counts — JVM catalyst fold vs the
    oracle's recursive CTE, identical IEEE step (operators/robust.py)."""
    return robust.ewma_daily_counts(_fact(spark, sf_dir), alpha=0.3)


_SEASONAL_SQL = (
    FACT_CTE
    + """
, daily AS (
  SELECT date, day_name, CAST(count(*) AS BIGINT) AS y
  FROM fact GROUP BY date, day_name
)
, per_wd AS (
  SELECT day_name, CAST(count(*) AS BIGINT) AS n_days,
         CAST(sum(y) AS BIGINT) AS day_total
  FROM daily GROUP BY day_name
)
, tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n_all, CAST(sum(y) AS BIGINT) AS s_all
  FROM daily
)
SELECT day_name, n_days, day_total,
       day_total * n_all AS idx_num,
       n_days * s_all AS idx_den,
       round(CAST(day_total * n_all AS DOUBLE)
             / CAST(n_days * s_all AS DOUBLE), 6) AS seasonal_index
FROM per_wd, tot
"""
)


@register("weekday_seasonal_index", _SEASONAL_SQL)
def q_weekday_seasonal_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly multiplicative seasonal index — exact BIGINT
    cross-products, one division (operators/robust.py)."""
    return robust.weekday_seasonal_index(_fact(spark, sf_dir))
