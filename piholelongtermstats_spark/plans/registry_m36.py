"""M36 — inference completion wave (operators/stattests.py):

- ``mann_whitney_day_night`` — nonparametric distribution-shift test
  (rank-sum) with tie-corrected normal z; doubled midranks over the
  merged value histogram keep every rank statistic exact DECIMAL.
- ``levene_day_night`` — Brown–Forsythe scale test in the two-group
  Welch form: absolute deviations from per-group HISTOGRAM medians
  (integer half-units), then the exact-moment welch expression.

With these the two-sample family covers mean (welch), distribution
(ks), rank shift (mann-whitney), and variance (levene). Both
DuckDB-oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from piholelongtermstats_spark.operators import stattests
from piholelongtermstats_spark.plans.registry import _fact, register
from piholelongtermstats_spark.sources.events import FACT_CTE

_MW_SQL = (
    FACT_CTE
    + """
, m AS (
  SELECT CAST(round(reply_time * 1000) AS BIGINT) AS r, day_period
  FROM fact WHERE reply_time IS NOT NULL
)
, hist AS (
  SELECT r,
    CAST(count(*) FILTER (WHERE day_period = 'Day') AS BIGINT) AS ca,
    CAST(count(*) FILTER (WHERE day_period = 'Night') AS BIGINT) AS cb
  FROM m GROUP BY r
)
, scanned AS (
  SELECT ca, ca + cb AS t,
    CAST(coalesce(sum(ca + cb) OVER (
      ORDER BY r ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      AS BIGINT) AS cum_before
  FROM hist
)
, agg AS (
  SELECT CAST(sum(ca) AS BIGINT) AS n1,
         CAST(sum(t - ca) AS BIGINT) AS n2,
         CAST(sum(CAST(ca * (2 * cum_before + t + 1) AS DECIMAL(38,0)))
              AS DECIMAL(38,0)) AS r2_day,
         CAST(sum(CAST(t * t * t - t AS DECIMAL(38,0)))
              AS DECIMAL(38,0)) AS tie_term
  FROM scanned
)
, fin AS (
  SELECT n1, n2,
         r2_day - CAST(n1 * (n1 + 1) AS DECIMAL(38,0)) AS u2_day,
         tie_term,
         (CAST(n1 + n2 AS DECIMAL(38,0)) * CAST(n1 + n2 AS DECIMAL(38,0))
            * CAST(n1 + n2 AS DECIMAL(38,0))
          - CAST(n1 + n2 AS DECIMAL(38,0))) - tie_term AS bracket
  FROM agg
)
SELECT n1, n2,
  CAST(u2_day AS DOUBLE) AS u2_day,
  CAST(tie_term AS DOUBLE) AS tie_term,
  round(CASE WHEN n1 > 0 AND n2 > 0 AND bracket > 0 THEN
    (CAST(u2_day AS DOUBLE) - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))
    / (2.0 * sqrt(
        (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) * CAST(bracket AS DOUBLE)
        / (12.0 * (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))
           * ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)) - 1.0))))
  END, 6) AS z
FROM fin
"""
)


@register("mann_whitney_day_night", _MW_SQL)
def q_mann_whitney_day_night(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-sum shift test Day vs Night, tie-corrected
    (operators/stattests.py)."""
    return stattests.mann_whitney_day_night(_fact(spark, sf_dir))


_LEVENE_SQL = (
    FACT_CTE
    + """
, m AS (
  SELECT CAST(round(reply_time * 1000) AS BIGINT) AS r, day_period
  FROM fact WHERE reply_time IS NOT NULL
)
, hist AS (
  SELECT day_period, r, CAST(count(*) AS BIGINT) AS cnt
  FROM m GROUP BY 1, 2
)
, h AS (
  SELECT day_period, r, cnt,
    CAST(sum(cnt) OVER (PARTITION BY day_period ORDER BY r
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
    CAST(sum(cnt) OVER (PARTITION BY day_period) AS BIGINT) AS n
  FROM hist
)
, med AS (
  SELECT day_period,
    CAST(min(CASE WHEN cum >= (n + 1) // 2 THEN r END)
         + min(CASE WHEN cum >= n // 2 + 1 THEN r END) AS BIGINT) AS med2
  FROM h GROUP BY day_period
)
, agg AS (
  SELECT
    CAST(sum(cnt) FILTER (WHERE day_period = 'Day') AS BIGINT) AS n1,
    CAST(sum(cnt * abs(2 * r - med2))
         FILTER (WHERE day_period = 'Day') AS BIGINT) AS s1,
    CAST(sum(CAST(cnt * abs(2 * r - med2) * abs(2 * r - med2)
                  AS DECIMAL(38,0)))
         FILTER (WHERE day_period = 'Day') AS DECIMAL(38,0)) AS q1,
    CAST(sum(cnt) FILTER (WHERE day_period = 'Night') AS BIGINT) AS n2,
    CAST(sum(cnt * abs(2 * r - med2))
         FILTER (WHERE day_period = 'Night') AS BIGINT) AS s2,
    CAST(sum(CAST(cnt * abs(2 * r - med2) * abs(2 * r - med2)
                  AS DECIMAL(38,0)))
         FILTER (WHERE day_period = 'Night') AS DECIMAL(38,0)) AS q2
  FROM hist JOIN med USING (day_period)
)
SELECT n1, s1, CAST(q1 AS DOUBLE) AS q1, n2, s2, CAST(q2 AS DOUBLE) AS q2,
  round(CASE WHEN n1 > 1 AND n2 > 1 THEN
    (CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
     - CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE))
    / sqrt(
        ((CAST(q1 AS DOUBLE)
          - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE))
         / (CAST(n1 AS DOUBLE) - 1.0)) / CAST(n1 AS DOUBLE)
      + ((CAST(q2 AS DOUBLE)
          - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE))
         / (CAST(n2 AS DOUBLE) - 1.0)) / CAST(n2 AS DOUBLE))
  END, 6) AS t_stat,
  round(CASE WHEN n1 > 1 AND n2 > 1 THEN
    (  (((CAST(q1 AS DOUBLE)
          - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE))
         / (CAST(n1 AS DOUBLE) - 1.0)) / CAST(n1 AS DOUBLE)
      + ((CAST(q2 AS DOUBLE)
          - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE))
         / (CAST(n2 AS DOUBLE) - 1.0)) / CAST(n2 AS DOUBLE))
     * (((CAST(q1 AS DOUBLE)
          - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE))
         / (CAST(n1 AS DOUBLE) - 1.0)) / CAST(n1 AS DOUBLE)
      + ((CAST(q2 AS DOUBLE)
          - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE))
         / (CAST(n2 AS DOUBLE) - 1.0)) / CAST(n2 AS DOUBLE)))
    / ( (((CAST(q1 AS DOUBLE)
           - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE))
          / (CAST(n1 AS DOUBLE) - 1.0)) / CAST(n1 AS DOUBLE))
        * (((CAST(q1 AS DOUBLE)
           - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE))
          / (CAST(n1 AS DOUBLE) - 1.0)) / CAST(n1 AS DOUBLE))
        / (CAST(n1 AS DOUBLE) - 1.0)
      + (((CAST(q2 AS DOUBLE)
           - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE))
          / (CAST(n2 AS DOUBLE) - 1.0)) / CAST(n2 AS DOUBLE))
        * (((CAST(q2 AS DOUBLE)
           - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE))
          / (CAST(n2 AS DOUBLE) - 1.0)) / CAST(n2 AS DOUBLE))
        / (CAST(n2 AS DOUBLE) - 1.0) )
  END, 6) AS df
FROM agg
"""
)


@register("levene_day_night", _LEVENE_SQL)
def q_levene_day_night(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown–Forsythe variance-shift test Day vs Night
    (operators/stattests.py)."""
    return stattests.levene_day_night(_fact(spark, sf_dir))
