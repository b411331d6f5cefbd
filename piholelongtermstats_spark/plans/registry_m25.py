"""M25 — event-time window / concentration wave:

- ``sliding_peak_30min`` — per-client peak 30-minute load via an
  event-time RANGE frame over epoch microseconds (burst detection as
  a declarative window).
- ``interarrival_burstiness`` — coefficient of variation of per-
  client inter-arrival gaps from exact BIGINT/DECIMAL moments
  (CV ≫ 1 ⇒ bursty, ≈ 1 ⇒ Poisson).
- ``client_concentration_hhi`` — Herfindahl–Hirschman domain
  concentration per client, exact integer numerator/denominator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from piholelongtermstats_spark.operators import counts, sequential
from piholelongtermstats_spark.plans.registry import _fact, register
from piholelongtermstats_spark.sources.events import FACT_CTE

_PEAK_SQL = (
    FACT_CTE
    + """
, c AS (
  SELECT client, ts,
         CAST(count(*) OVER (
           PARTITION BY client ORDER BY epoch_us(ts)
           RANGE BETWEEN 1799999999 PRECEDING AND CURRENT ROW
         ) AS BIGINT) AS win_cnt
  FROM fact
), p AS (
  SELECT client, win_cnt AS peak, ts AS peak_at,
         row_number() OVER (
           PARTITION BY client ORDER BY win_cnt DESC, ts ASC
         ) AS rn
  FROM c
)
SELECT client, peak, peak_at
FROM p WHERE rn = 1
ORDER BY peak DESC, client ASC
LIMIT 10
"""
)


@register("sliding_peak_30min", _PEAK_SQL)
def q_sliding_peak_30min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak trailing-30-minute event count per client, top-10
    (operators/sequential.py)."""
    return sequential.sliding_peak_30min(_fact(spark, sf_dir), k=10)


_BURST_SQL = (
    FACT_CTE
    + """
, g AS (
  SELECT client,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (
           PARTITION BY client ORDER BY ts, event_id
         ) AS g
  FROM fact
), m AS (
  SELECT client,
         CAST(count(*) AS BIGINT) AS n_gaps,
         CAST(sum(g) AS BIGINT) AS sum_g,
         CAST(sum(CAST(g AS DECIMAL(19,0)) * CAST(g AS DECIMAL(19,0)))
              AS DECIMAL(38,0)) AS ssq_g
  FROM g WHERE g IS NOT NULL
  GROUP BY client
)
SELECT client, n_gaps, sum_g, CAST(ssq_g AS VARCHAR) AS ssq_g,
       round(sqrt(CAST(n_gaps AS DOUBLE) * CAST(ssq_g AS DOUBLE)
                  - CAST(sum_g AS DOUBLE) * CAST(sum_g AS DOUBLE))
             / CAST(sum_g AS DOUBLE), 6) AS cv
FROM m
WHERE n_gaps >= 2 AND sum_g > 0
ORDER BY cv DESC, client ASC
LIMIT 10
"""
)


@register("interarrival_burstiness", _BURST_SQL)
def q_interarrival_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 burstiest clients by inter-arrival CV
    (operators/sequential.py)."""
    return sequential.interarrival_burstiness(_fact(spark, sf_dir), k=10)


_HHI_SQL = (
    FACT_CTE
    + """
, per_dom AS (
  SELECT client, domain, CAST(count(*) AS BIGINT) AS c
  FROM fact GROUP BY client, domain
), per_client AS (
  SELECT client,
         CAST(count(*) AS BIGINT) AS n_domains,
         CAST(sum(c * c) AS BIGINT) AS hhi_num,
         CAST(sum(c) AS BIGINT) AS tot
  FROM per_dom GROUP BY client
)
SELECT client, n_domains, hhi_num,
       tot * tot AS hhi_den,
       round(CAST(hhi_num AS DOUBLE) / CAST(tot * tot AS DOUBLE), 6) AS hhi
FROM per_client
ORDER BY hhi DESC, client ASC
LIMIT 10
"""
)


@register("client_concentration_hhi", _HHI_SQL)
def q_client_concentration_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 most domain-concentrated clients by exact-integer HHI
    (operators/counts.py)."""
    return counts.client_concentration_hhi(_fact(spark, sf_dir), k=10)
