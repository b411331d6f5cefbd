"""M23 — parametric-inference / correlation wave (extends M21/M22's
exact-sufficient-statistic policy to the classical t-test /
correlation / forensics screens a telemetry warehouse runs):

- ``welch_day_night`` — Welch's unequal-variance t between Day and
  Night reply times; n/Σr/Σr² exact (BIGINT + DECIMAL(38,0)), t and
  the Welch–Satterthwaite df one fixed IEEE expression.
- ``spearman_volume_reply`` — Spearman ρ between daily volume and
  daily total reply; tie-aware doubled ranks are integers, Pearson
  moments over them all-BIGINT.
- ``acf_daily_counts`` — autocorrelation of the daily series, lags
  1..7, in the n²-cleared all-integer form.
- ``benford_reply_digits`` — first-significant-digit audit vs
  Benford's law, integer parts-per-billion, zero fp anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from piholelongtermstats_spark.operators import stattests
from piholelongtermstats_spark.plans.registry import _fact, register
from piholelongtermstats_spark.sources.events import FACT_CTE

_WELCH_SQL = (
    FACT_CTE
    + """
, m AS (
  SELECT CAST(round(reply_time * 1000) AS BIGINT) AS r, day_period
  FROM fact WHERE reply_time IS NOT NULL
), agg AS (
  SELECT
    CAST(count(*) FILTER (WHERE day_period = 'Day') AS BIGINT)  AS n1,
    CAST(sum(r)  FILTER (WHERE day_period = 'Day') AS BIGINT)   AS s1,
    CAST(sum(CAST(r * r AS DECIMAL(38,0)))
             FILTER (WHERE day_period = 'Day') AS DECIMAL(38,0)) AS q1,
    CAST(count(*) FILTER (WHERE day_period = 'Night') AS BIGINT) AS n2,
    CAST(sum(r)  FILTER (WHERE day_period = 'Night') AS BIGINT)  AS s2,
    CAST(sum(CAST(r * r AS DECIMAL(38,0)))
             FILTER (WHERE day_period = 'Night') AS DECIMAL(38,0)) AS q2
  FROM m
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


@register("welch_day_night", _WELCH_SQL)
def q_welch_day_night(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch t-test Day vs Night reply time — exact moments, one
    IEEE scalar expression (operators/stattests.py)."""
    return stattests.welch_day_night(_fact(spark, sf_dir))


_SPEARMAN_SQL = (
    FACT_CTE
    + """
, daily AS (
  SELECT date,
         CAST(count(*) AS BIGINT) AS x,
         CAST(coalesce(sum(CAST(round(reply_time * 1000) AS BIGINT))
                         FILTER (WHERE reply_time IS NOT NULL), 0)
              AS BIGINT) AS y
  FROM fact GROUP BY date
), ranked AS (
  SELECT
    CAST(2 * rank() OVER (ORDER BY x)
         + count(*) OVER (PARTITION BY x) - 1 AS BIGINT) AS u,
    CAST(2 * rank() OVER (ORDER BY y)
         + count(*) OVER (PARTITION BY y) - 1 AS BIGINT) AS v
  FROM daily
), s AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(u) AS BIGINT) AS su,
         CAST(sum(v) AS BIGINT) AS sv,
         CAST(sum(u * v) AS BIGINT) AS suv,
         CAST(sum(u * u) AS BIGINT) AS suu,
         CAST(sum(v * v) AS BIGINT) AS svv
  FROM ranked
)
SELECT n AS n_days,
       n * suv - su * sv AS rho_num,
       n * suu - su * su AS den_u,
       n * svv - sv * sv AS den_v,
       round(CASE WHEN n * suu - su * su > 0 AND n * svv - sv * sv > 0
         THEN CAST(n * suv - su * sv AS DOUBLE)
              / sqrt(CAST(n * suu - su * su AS DOUBLE)
                     * CAST(n * svv - sv * sv AS DOUBLE))
       END, 6) AS rho
FROM s
"""
)


@register("spearman_volume_reply", _SPEARMAN_SQL)
def q_spearman_volume_reply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman ρ of daily volume vs daily total reply — integer
    doubled ranks (operators/stattests.py)."""
    return stattests.spearman_volume_reply(_fact(spark, sf_dir))


_ACF_SQL = (
    FACT_CTE
    + """
, daily AS (
  SELECT date, CAST(count(*) AS BIGINT) AS x FROM fact GROUP BY date
), tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS s,
         min(date) AS d0
  FROM daily
), d AS (
  SELECT CAST(date_diff('day', d0, date) AS BIGINT) AS idx,
         n * x - s AS c, n
  FROM daily, tot
), lags AS (
  SELECT * FROM (VALUES (1),(2),(3),(4),(5),(6),(7)) t(lag_k)
), den AS (
  SELECT CAST(sum(c * c) AS BIGINT) AS acf_den FROM d
), pairs AS (
  SELECT l.lag_k, a.c AS c1, b.c AS c2, a.n
  FROM d a CROSS JOIN lags l JOIN d b ON b.idx = a.idx + l.lag_k
)
SELECT p.lag_k AS lag_k,
       CAST(max(p.n) AS BIGINT) AS n_days,
       CAST(sum(p.c1 * p.c2) AS BIGINT) AS acf_num,
       den.acf_den AS acf_den,
       round(CASE WHEN den.acf_den > 0
         THEN CAST(sum(p.c1 * p.c2) AS DOUBLE)
              / CAST(den.acf_den AS DOUBLE)
       END, 6) AS rho
FROM pairs p, den
GROUP BY p.lag_k, den.acf_den
ORDER BY lag_k
"""
)


@register("acf_daily_counts", _ACF_SQL)
def q_acf_daily_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-count autocorrelation, lags 1..7, n²-cleared integers
    (operators/stattests.py)."""
    return stattests.acf_daily_counts(_fact(spark, sf_dir))


_BENFORD_VALUES = ",".join(
    f"({d},{p})" for d, p in stattests.BENFORD_PPB.items()
)

_BENFORD_SQL = (
    FACT_CTE
    + f"""
, digits AS (
  SELECT CAST(substr(CAST(r AS VARCHAR), 1, 1) AS INT) AS digit
  FROM (
    SELECT CAST(round(reply_time * 1000) AS BIGINT) AS r
    FROM fact WHERE reply_time IS NOT NULL
  ) WHERE r > 0
), cnts AS (
  SELECT digit, CAST(count(*) AS BIGINT) AS cnt FROM digits GROUP BY digit
), tot AS (
  SELECT CAST(sum(cnt) AS BIGINT) AS total FROM cnts
), expd AS (
  SELECT * FROM (VALUES {_BENFORD_VALUES}) e(digit, expected_ppb)
)
SELECT c.digit AS digit,
       c.cnt AS cnt,
       CAST((c.cnt * 1000000000) // t.total AS BIGINT) AS obs_ppb,
       CAST(e.expected_ppb AS BIGINT) AS expected_ppb,
       CAST((c.cnt * 1000000000) // t.total - e.expected_ppb AS BIGINT)
         AS dev_ppb
FROM cnts c CROSS JOIN tot t JOIN expd e ON e.digit = c.digit
ORDER BY digit
"""
)


@register("benford_reply_digits", _BENFORD_SQL)
def q_benford_reply_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit of reply times — integer ppb, no fp
    (operators/stattests.py)."""
    return stattests.benford_reply_digits(_fact(spark, sf_dir))
