"""M22 — nonparametric-test wave (the monitoring / drift tier,
continuing M21's exact-sufficient-statistic policy):

- ``mann_kendall_trend`` — Mann–Kendall S over daily counts (pure
  integer pairwise signs on the tiny daily relation), tie-corrected
  variance numerator exact BIGINT, continuity-corrected Z via one
  division + one IEEE sqrt (both correctly rounded ⇒
  engine-identical).
- ``ks_day_night`` — two-sample Kolmogorov–Smirnov D between Day and
  Night reply-time samples via the merged value histogram:
  D-numerator max|cumA·nB − cumB·nA| exact BIGINT, one division.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from piholelongtermstats_spark.operators import stattests
from piholelongtermstats_spark.plans.registry import _fact, register
from piholelongtermstats_spark.sources.events import FACT_CTE

_MK_SQL = (
    FACT_CTE
    + """
, daily AS (
  SELECT date, CAST(count(*) AS BIGINT) AS y FROM fact GROUP BY date
), s AS (
  SELECT CAST(sum(CASE WHEN b.y > a.y THEN 1
                       WHEN b.y < a.y THEN -1 ELSE 0 END) AS BIGINT)
           AS s_stat
  FROM daily a JOIN daily b ON a.date < b.date
), nn AS (
  SELECT CAST(count(*) AS BIGINT) AS n FROM daily
), ties AS (
  SELECT CAST(coalesce(sum(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT)
           AS tie_term
  FROM (SELECT CAST(count(*) AS BIGINT) AS t FROM daily GROUP BY y)
)
SELECT n AS n_days,
       s_stat,
       n * (n - 1) * (2 * n + 5) - tie_term AS var18_num,
       round(CASE
         WHEN s_stat = 0 OR n * (n - 1) * (2 * n + 5) - tie_term <= 0
           THEN 0.0
         ELSE (CASE WHEN s_stat > 0 THEN s_stat - 1
                    ELSE s_stat + 1 END)
              / sqrt(CAST(n * (n - 1) * (2 * n + 5) - tie_term AS DOUBLE)
                     / 18.0)
       END, 6) AS z
FROM s, nn, ties
"""
)


@register("mann_kendall_trend", _MK_SQL)
def q_mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Kendall trend test over daily counts — integer pairwise
    signs, tie-corrected variance (operators/stattests.py)."""
    return stattests.mann_kendall_trend(_fact(spark, sf_dir))


_KS_SQL = (
    FACT_CTE
    + """
, hist AS (
  SELECT reply_time,
         count(*) FILTER (WHERE day_period = 'Day') AS ca,
         count(*) FILTER (WHERE day_period = 'Night') AS cb
  FROM fact WHERE reply_time IS NOT NULL
  GROUP BY reply_time
), tot AS (
  SELECT CAST(sum(ca) AS BIGINT) AS na, CAST(sum(cb) AS BIGINT) AS nb
  FROM hist
), scanned AS (
  SELECT abs(sum(ca) OVER (ORDER BY reply_time ROWS UNBOUNDED PRECEDING)
               * nb
             - sum(cb) OVER (ORDER BY reply_time ROWS UNBOUNDED PRECEDING)
               * na) AS dev,
         na, nb
  FROM hist, tot
)
SELECT max(na) AS n_day,
       max(nb) AS n_night,
       CAST(max(dev) AS BIGINT) AS d_num,
       round(CAST(max(dev) AS DOUBLE)
             / NULLIF(CAST(max(na) * max(nb) AS DOUBLE), 0), 6) AS d_stat
FROM scanned
"""
)


@register("ks_day_night", _KS_SQL)
def q_ks_day_night(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample KS statistic, Day vs Night reply times — exact
    BIGINT numerator over the merged value histogram
    (operators/stattests.py)."""
    return stattests.ks_day_night(_fact(spark, sf_dir))
