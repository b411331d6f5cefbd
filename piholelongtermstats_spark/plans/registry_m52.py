"""M52 — seasonality-robust trend + composition drift:

- ``seasonal_mann_kendall`` — weekly-stratified Mann–Kendall (Hirsch
  & Slack): pairs only within each weekday's subseries, so a strong
  weekday cycle can no longer drown a real trend (a pure cycle gives
  S' = 0 exactly).
- ``blocked_rate_trend`` — Cochran–Armitage trend test on the daily
  blocked PROPORTION with day-index scores: composition drift
  independent of volume drift (a day-constant share gives num = 0
  exactly).

Both DuckDB-oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from piholelongtermstats_spark.operators import stattests
from piholelongtermstats_spark.plans.registry import _fact, register
from piholelongtermstats_spark.sources.events import FACT_CTE

_SMK_SQL = (
    FACT_CTE
    + """
, daily AS (
  SELECT date, CAST(count(*) AS BIGINT) AS y,
         CAST(dayofweek(date) + 1 AS INT) AS wd
  FROM fact GROUP BY date
), s AS (
  SELECT CAST(coalesce(sum(CASE WHEN b.y > a.y THEN 1
                                WHEN b.y < a.y THEN -1 ELSE 0 END), 0)
              AS BIGINT) AS s_stat
  FROM daily a JOIN daily b ON a.wd = b.wd AND a.date < b.date
), vp AS (
  SELECT CAST(sum(n_w * (n_w - 1) * (2 * n_w + 5)) AS BIGINT) AS var_pos,
         CAST(sum(n_w) AS BIGINT) AS n_days
  FROM (SELECT wd, CAST(count(*) AS BIGINT) AS n_w FROM daily GROUP BY wd)
), ties AS (
  SELECT CAST(coalesce(sum(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT)
    AS tie_term
  FROM (SELECT CAST(count(*) AS BIGINT) AS t FROM daily GROUP BY wd, y)
)
SELECT vp.n_days, s.s_stat,
  CAST(vp.var_pos - ties.tie_term AS BIGINT) AS var18_num,
  round(CASE WHEN s.s_stat = 0 OR vp.var_pos - ties.tie_term <= 0
        THEN CAST(0.0 AS DOUBLE)
        ELSE CAST(CASE WHEN s.s_stat > 0 THEN s.s_stat - 1
                       WHEN s.s_stat < 0 THEN s.s_stat + 1
                       ELSE 0 END AS DOUBLE)
             / sqrt(CAST(vp.var_pos - ties.tie_term AS DOUBLE) / 18.0)
        END, 6) AS z
FROM s, vp, ties
"""
)


@register("seasonal_mann_kendall", _SMK_SQL)
def q_seasonal_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly-stratified Mann–Kendall trend test
    (operators/stattests.py)."""
    return stattests.seasonal_mann_kendall(_fact(spark, sf_dir))


_CA_SQL = (
    FACT_CTE
    + """
, daily AS (
  SELECT date, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(status_type = 'Blocked' AS BIGINT)) AS BIGINT) AS b
  FROM fact GROUP BY date
), scored AS (
  SELECT n, b,
    CAST(date_diff('day', (SELECT min(date) FROM daily), date) AS BIGINT)
      AS t
  FROM daily
), agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_days,
         CAST(sum(n) AS BIGINT) AS nn, CAST(sum(b) AS BIGINT) AS bb,
         sum(CAST(t AS HUGEINT) * b) AS stb,
         sum(CAST(t AS HUGEINT) * n) AS stn,
         sum(CAST(n AS HUGEINT) * t * t) AS snt2
  FROM scored
)
SELECT n_days, nn AS n_total, bb AS blocked_total,
  round(CASE WHEN bb > 0 AND bb < nn
              AND CAST(CAST(nn AS HUGEINT) * snt2 - stn * stn AS DOUBLE) > 0
        THEN CAST(CAST(nn AS HUGEINT) * stb - CAST(bb AS HUGEINT) * stn
                  AS DOUBLE)
             * sqrt(CAST(nn AS DOUBLE)
                    / (CAST(bb AS DOUBLE) * CAST(nn - bb AS DOUBLE)))
             / sqrt(CAST(CAST(nn AS HUGEINT) * snt2 - stn * stn AS DOUBLE))
        END, 6) AS z
FROM agg
"""
)


@register("blocked_rate_trend", _CA_SQL)
def q_blocked_rate_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran–Armitage block-rate composition trend
    (operators/stattests.py)."""
    return stattests.blocked_rate_trend(_fact(spark, sf_dir))
