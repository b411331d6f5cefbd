"""M35 — forecasting & boxplot wave (operators/robust.py):

- ``holt_linear_daily`` — Holt two-state (level+trend) smoothing as
  one catalyst fold; the oracle's recursive CTE carries (l, b)
  through the identical IEEE trees ⇒ bit-identical before round.
- ``forecast_error_panel`` — persistence vs seasonal-naive MAE with
  exact BIGINT numerators on a shared scoring set + the MASE-style
  ratio of the two numerators.
- ``tukey_fence_days`` — boxplot outlier audit with type-1
  nearest-rank quartiles; fences are pure integer comparisons in
  doubled units (2y < 5·Q1 − 3·Q3 / 2y > 5·Q3 − 3·Q1).

All three DuckDB-oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from piholelongtermstats_spark.operators import robust
from piholelongtermstats_spark.plans.registry import _fact, register
from piholelongtermstats_spark.plans.registry_m28 import _DAILY
from piholelongtermstats_spark.sources.events import FACT_CTE

_HOLT_SQL = (
    FACT_CTE.replace("WITH fact AS", "WITH RECURSIVE fact AS", 1)
    + _DAILY
    + """
, seq AS (
  SELECT date, y, row_number() OVER (ORDER BY date) AS r FROM daily
)
, rec AS (
  SELECT r, date, y, CAST(y AS DOUBLE) AS l, CAST(0.0 AS DOUBLE) AS b
  FROM seq WHERE r = 1
  UNION ALL
  SELECT s.r, s.date, s.y,
         0.3 * CAST(s.y AS DOUBLE) + 0.7 * (rec.l + rec.b),
         0.2 * ((0.3 * CAST(s.y AS DOUBLE) + 0.7 * (rec.l + rec.b))
                - rec.l)
           + 0.8 * rec.b
  FROM seq s JOIN rec ON s.r = rec.r + 1
)
SELECT date, y, round(l, 6) AS level, round(b, 6) AS trend,
       round(l + b, 6) AS forecast_next
FROM rec
"""
)


@register("holt_linear_daily", _HOLT_SQL)
def q_holt_linear_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt(α=0.3, β=0.2) level+trend smoothing — two-state catalyst
    fold vs recursive CTE (operators/robust.py)."""
    return robust.holt_linear_daily(_fact(spark, sf_dir), 0.3, 0.2)


_FC_ERR_SQL = (
    FACT_CTE
    + _DAILY
    + """
, lagged AS (
  SELECT y,
         lag(y, 1) OVER (ORDER BY date) AS p1,
         lag(y, 7) OVER (ORDER BY date) AS p7
  FROM daily
)
, s AS (
  SELECT CAST(count(*) AS BIGINT) AS n_scored,
         CAST(sum(abs(y - p1)) AS BIGINT) AS mae_p_num,
         CAST(sum(abs(y - p7)) AS BIGINT) AS mae_s_num
  FROM lagged WHERE p7 IS NOT NULL
)
SELECT n_scored, mae_p_num, mae_s_num,
  round(CAST(mae_p_num AS DOUBLE) / CAST(n_scored AS DOUBLE), 6)
    AS mae_persistence,
  round(CAST(mae_s_num AS DOUBLE) / CAST(n_scored AS DOUBLE), 6)
    AS mae_seasonal,
  round(CASE WHEN mae_s_num > 0 THEN
    CAST(mae_p_num AS DOUBLE) / CAST(mae_s_num AS DOUBLE) END, 6)
    AS mase_persistence
FROM s
"""
)


@register("forecast_error_panel", _FC_ERR_SQL)
def q_forecast_error_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persistence vs seasonal-naive forecast MAEs + MASE ratio,
    exact numerators (operators/robust.py)."""
    return robust.forecast_error_panel(_fact(spark, sf_dir))


_TUKEY_SQL = (
    FACT_CTE
    + _DAILY
    + """
, nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM daily)
, ranked AS (
  SELECT y, row_number() OVER (ORDER BY y, date) AS r FROM daily
)
, qs AS (
  SELECT CAST(min(CASE WHEN r = (n + 3) // 4 THEN y END) AS BIGINT) AS q1,
         CAST(min(CASE WHEN r = (3 * n + 3) // 4 THEN y END) AS BIGINT) AS q3
  FROM ranked, nn
)
SELECT d.date AS date, d.y AS y, qs.q1 AS q1, qs.q3 AS q3,
       qs.q3 - qs.q1 AS iqr,
       CAST(2 * d.y < 5 * qs.q1 - 3 * qs.q3 AS INT) AS below_fence,
       CAST(2 * d.y > 5 * qs.q3 - 3 * qs.q1 AS INT) AS above_fence
FROM daily d, qs
"""
)


@register("tukey_fence_days", _TUKEY_SQL)
def q_tukey_fence_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boxplot-fence outlier audit, integer-exact fences
    (operators/robust.py)."""
    return robust.tukey_fence_days(_fact(spark, sf_dir))
