"""M19 — basket & bar analytics wave:

- ``domain_association_rules`` — market-basket mining (the Apriori
  pair tier) over (client, day) domain baskets: support, confidence,
  lift. The lift>1 decision is cross-multiplied onto exact BIGINTs
  (n·cnt_ab > cnt_a·cnt_b); baskets larger than the cap are dropped
  whole (the df_cap recall-trade pattern) and ALL supports count over
  the capped universe, keeping the three measures consistent.
- ``hourly_ohlc_reply`` — OHLC bars (first/max/min/last per hour) via
  min_by/max_by on the canonical (ts, event_id) order — no window,
  one partial-agg shuffle; the oracle builds the same bars from
  row_number windows, pinning the two formulations equivalent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from piholelongtermstats_spark.operators import basket, timeagg
from piholelongtermstats_spark.plans.registry import _fact, register
from piholelongtermstats_spark.sources.events import FACT_CTE

_RULES_SQL = (
    FACT_CTE
    + """
, baskets_all AS (
  SELECT DISTINCT client, date, domain FROM fact
), sizes AS (
  SELECT client, date, count(*) AS basket_size
  FROM baskets_all GROUP BY client, date
), baskets AS (
  SELECT b.client, b.date, b.domain
  FROM baskets_all b JOIN sizes s
    ON b.client = s.client AND b.date = s.date
  WHERE s.basket_size <= 64
), bn AS (
  SELECT CAST(count(*) AS BIGINT) AS n_baskets
  FROM (SELECT DISTINCT client, date FROM baskets)
), items AS (
  SELECT domain, count(*) AS item_cnt FROM baskets GROUP BY domain
), pairs AS (
  SELECT a.domain AS domain_a, b.domain AS domain_b, count(*) AS cnt_ab
  FROM baskets a
  JOIN baskets b
    ON a.client = b.client AND a.date = b.date AND a.domain < b.domain
  GROUP BY 1, 2
  HAVING count(*) >= 3
)
SELECT domain_a, domain_b, cnt_ab,
       ca.item_cnt AS cnt_a, cb.item_cnt AS cnt_b,
       round(CAST(cnt_ab AS DOUBLE) / CAST(ca.item_cnt AS DOUBLE), 6)
         AS conf_ab,
       round(CAST(n_baskets * cnt_ab AS DOUBLE)
             / CAST(ca.item_cnt * cb.item_cnt AS DOUBLE), 6) AS lift,
       n_baskets * cnt_ab > ca.item_cnt * cb.item_cnt AS lift_gt1
FROM pairs
JOIN items ca ON domain_a = ca.domain
JOIN items cb ON domain_b = cb.domain
CROSS JOIN bn
ORDER BY cnt_ab DESC, domain_a, domain_b
LIMIT 25
"""
)


@register("domain_association_rules", _RULES_SQL)
def q_domain_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-25 co-visited domain pairs with support/confidence/lift —
    the market-basket family (operators/basket.py)."""
    return basket.domain_association_rules(
        _fact(spark, sf_dir), min_support=3, top_k=25, basket_cap=64
    )


_OHLC_SQL = (
    FACT_CTE
    + """
, ranked AS (
  SELECT date_trunc('hour', ts) AS hour_ts, reply_time,
         row_number() OVER (PARTITION BY date_trunc('hour', ts)
                            ORDER BY ts, event_id) AS rn_a,
         row_number() OVER (PARTITION BY date_trunc('hour', ts)
                            ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM fact WHERE reply_time IS NOT NULL
)
SELECT hour_ts,
       count(*) AS n,
       max(CASE WHEN rn_a = 1 THEN reply_time END) AS open,
       max(reply_time) AS high,
       min(reply_time) AS low,
       max(CASE WHEN rn_d = 1 THEN reply_time END) AS close
FROM ranked
GROUP BY hour_ts
ORDER BY hour_ts
"""
)


@register("hourly_ohlc_reply", _OHLC_SQL)
def q_hourly_ohlc_reply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC bars of reply_time — argmin/argmax per bucket with
    min_by/max_by, windowless (operators/timeagg.py)."""
    return timeagg.hourly_ohlc_reply(_fact(spark, sf_dir))
