"""M48 — prequential anomaly, temporal diversity, governance depth:

- ``client_running_zscore`` — each client-day scored against that
  client's history STRICTLY BEFORE it (the one-pass causal sibling of
  client_daily_spikes and the batch twin of the streaming Welford
  state processor, streaming/welford.py).
- ``renyi2_entropy_daily`` — per-day collision (Rényi-2) diversity of
  the domain mix with exact integer moments and one final ln.
- ``l_diversity_audit`` — the released k-anonymous groups NEAREST
  the re-identification cliff by distinct-client diversity
  (kanon_domain_daily's second-order privacy check; worst-K, not a
  fixed bar — a fixed l is scale-dependent).

All three DuckDB-oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from piholelongtermstats_spark.operators import anomaly, counts
from piholelongtermstats_spark.plans.registry import _fact, register
from piholelongtermstats_spark.sources.events import FACT_CTE

_RZ_SQL = (
    FACT_CTE
    + """
, daily AS (
  SELECT client, date, CAST(count(*) AS BIGINT) AS y
  FROM fact GROUP BY client, date
), scored AS (
  SELECT client, date, y,
    CAST(count(y) OVER w AS BIGINT) AS n_prior,
    CAST(sum(y) OVER w AS BIGINT) AS s_prior,
    sum(CAST(y AS HUGEINT) * y) OVER w AS q_prior
  FROM daily
  WINDOW w AS (PARTITION BY client ORDER BY date
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
), g AS (
  SELECT client, date, y, n_prior,
    CAST(n_prior AS HUGEINT) * y - s_prior AS num,
    CAST(n_prior AS HUGEINT) * q_prior
      - CAST(s_prior AS HUGEINT) * s_prior AS varnum
  FROM scored WHERE n_prior >= 2
)
SELECT client, date, y, n_prior,
  round(CASE WHEN varnum > 0 THEN CAST(num AS DOUBLE)
    * sqrt(CAST(n_prior - 1 AS DOUBLE)
           / (CAST(n_prior AS DOUBLE) * CAST(varnum AS DOUBLE))) END,
    6) AS z,
  CAST(num * num * (n_prior - 1) > 9 * n_prior * varnum AS INT)
    AS is_spike
FROM g ORDER BY client, date
"""
)


@register("client_running_zscore", _RZ_SQL)
def q_client_running_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prequential per-client z-scores over daily counts
    (operators/anomaly.py; streaming twin streaming/welford.py)."""
    fact = _fact(spark, sf_dir)
    daily = fact.groupBy("client", "date").agg(
        F.count(F.lit(1)).cast("long").alias("y")
    )
    return anomaly.running_zscore_by_client(daily)


_RENYI_SQL = (
    FACT_CTE
    + """
, dom AS (
  SELECT date, domain, CAST(count(*) AS BIGINT) AS c
  FROM fact GROUP BY date, domain
), per AS (
  SELECT date, CAST(sum(c) AS BIGINT) AS n_events,
         CAST(count(*) AS BIGINT) AS n_domains,
         sum(CAST(c AS HUGEINT) * c) AS sum_c2
  FROM dom GROUP BY date
)
SELECT date, n_events, n_domains,
  round(CAST(CAST(n_events AS HUGEINT) * n_events AS DOUBLE)
        / CAST(sum_c2 AS DOUBLE), 6) AS eff_domains,
  round(- ln(CAST(sum_c2 AS DOUBLE)
             / CAST(CAST(n_events AS HUGEINT) * n_events AS DOUBLE)),
        6) AS renyi2
FROM per ORDER BY date
"""
)


@register("renyi2_entropy_daily", _RENYI_SQL)
def q_renyi2_entropy_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day Rényi-2 domain diversity (operators/counts.py)."""
    return counts.renyi2_entropy_daily(_fact(spark, sf_dir))


_LDIV_K = 5
_LDIV_WORST = 20

_LDIV_SQL = (
    FACT_CTE
    + f"""
, groups AS (
  SELECT domain, date, CAST(count(*) AS BIGINT) AS cnt,
         CAST(count(DISTINCT client) AS BIGINT) AS n_clients
  FROM fact GROUP BY domain, date
), released AS (
  SELECT * FROM groups WHERE cnt >= {_LDIV_K}
), audit AS (
  SELECT CAST(count(*) AS BIGINT) AS groups_released,
         CAST(min(n_clients) AS BIGINT) AS min_l
  FROM released
)
SELECT domain, date, cnt, n_clients, groups_released, min_l
FROM released, audit
ORDER BY n_clients ASC, cnt DESC, domain ASC, date ASC
LIMIT {_LDIV_WORST}
"""
)


@register("l_diversity_audit", _LDIV_SQL)
def q_l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Worst released k-anon groups by l-diversity
    (operators/counts.py)."""
    return counts.l_diversity_audit(
        _fact(spark, sf_dir), k=_LDIV_K, worst=_LDIV_WORST
    )
