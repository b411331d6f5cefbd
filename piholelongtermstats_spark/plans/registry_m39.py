"""M39 — resampling inference + diversity + tail-latency wave:

- ``bootstrap_daily_mean_ci`` — deterministic Poisson-bootstrap 95%
  CI for the mean daily volume (operators/resample.py): per-(resample,
  day) weights from the pinned Poisson(1) inverse-CDF over the
  engine-wide md5 ppb uniform; B exact-integer means; nearest-rank
  bounds. The bootstrap shape that actually distributes.
- ``client_domain_simpson`` — Gini–Simpson domain-diversity ranking,
  a rational (log-free) concentration measure in exact ppm.
- ``reply_p95_heatmap`` — exact nearest-rank p95 reply time per
  (day_name, hour) cell: where in the week is the service SLOW (the
  tail-latency complement of the count heatmap).

All DuckDB-oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from piholelongtermstats_spark.operators import behavior, resample, stattests
from piholelongtermstats_spark.operators.resample import POISSON1_CUM_PPB
from piholelongtermstats_spark.plans.registry import _fact, register
from piholelongtermstats_spark.sources.events import FACT_CTE

_B = 200
_W_CASE = (
    "CASE "
    + " ".join(
        f"WHEN u < {t} THEN {k}" for k, t in enumerate(POISSON1_CUM_PPB)
    )
    + " ELSE 9 END"
)

_BOOT_SQL = (
    FACT_CTE
    + f"""
, daily AS (
  SELECT date, CAST(count(*) AS BIGINT) AS y FROM fact GROUP BY date
), nd AS (SELECT CAST(count(*) AS BIGINT) AS n_days FROM daily)
, b AS (SELECT CAST(range AS INT) AS b FROM range({_B}))
, weighted AS (
  SELECT b.b, daily.y,
         CAST({_W_CASE} AS BIGINT) AS w
  FROM daily CROSS JOIN b
  CROSS JOIN LATERAL (
    SELECT ('0x' || substr(md5('boot' || ':' || b.b || ':'
                 || strftime(daily.date, '%Y-%m-%d')), 1, 15))::BIGINT
           % 1000000000 AS u
  ) h
), means AS (
  SELECT round(CAST(sum(w * y) AS DOUBLE) / CAST(sum(w) AS DOUBLE), 6) AS m
  FROM weighted GROUP BY b HAVING sum(w) > 0
), ranked AS (
  SELECT m, row_number() OVER (ORDER BY m) AS r,
         CAST(count(*) OVER () AS BIGINT) AS n_eff
  FROM means
), ci AS (
  SELECT CAST(max(n_eff) AS BIGINT) AS n_resamples_eff,
         min(CASE WHEN r = (n_eff * 25 + 999) // 1000 THEN m END) AS lo_mean,
         min(CASE WHEN r = (n_eff * 975 + 999) // 1000 THEN m END) AS hi_mean
  FROM ranked
), pt AS (
  SELECT round(CAST(sum(y) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
    AS point_mean
  FROM daily
)
SELECT nd.n_days, ci.n_resamples_eff, pt.point_mean, ci.lo_mean, ci.hi_mean
FROM nd, pt, ci
"""
)


@register("bootstrap_daily_mean_ci", _BOOT_SQL)
def q_bootstrap_daily_mean_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson-bootstrap CI for mean daily volume, deterministic
    (operators/resample.py)."""
    return resample.bootstrap_daily_mean_ci(_fact(spark, sf_dir), _B)


_SIMPSON_K = 10

_SIMPSON_SQL = (
    FACT_CTE
    + f"""
, cd AS (
  SELECT client, domain, CAST(count(*) AS BIGINT) AS c
  FROM fact GROUP BY client, domain
), per AS (
  SELECT client, CAST(sum(c) AS BIGINT) AS n,
         CAST(count(*) AS BIGINT) AS n_domains,
         sum(CAST(c AS HUGEINT) * c) AS sq
  FROM cd GROUP BY client
)
SELECT client, n AS n_events, n_domains,
       CAST(((CAST(n AS HUGEINT) * n - sq) * 1000000)
            // (CAST(n AS HUGEINT) * n) AS BIGINT) AS simpson_ppm
FROM per
ORDER BY simpson_ppm DESC, client
LIMIT {_SIMPSON_K}
"""
)


@register("client_domain_simpson", _SIMPSON_SQL)
def q_client_domain_simpson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini–Simpson domain diversity per client, exact ppm, top-10
    (operators/behavior.py)."""
    return behavior.client_domain_simpson(_fact(spark, sf_dir), _SIMPSON_K)


_P95_SQL = (
    FACT_CTE
    + """
, m AS (
  SELECT day_name, hour, CAST(round(reply_time * 1000) AS BIGINT) AS r
  FROM fact WHERE reply_time IS NOT NULL
), hist AS (
  SELECT day_name, hour, r, CAST(count(*) AS BIGINT) AS cnt
  FROM m GROUP BY 1, 2, 3
), h AS (
  SELECT day_name, hour, r,
    CAST(sum(cnt) OVER (PARTITION BY day_name, hour ORDER BY r
         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
    CAST(sum(cnt) OVER (PARTITION BY day_name, hour) AS BIGINT) AS n
  FROM hist
)
SELECT day_name, hour,
       CAST(max(n) AS BIGINT) AS n_replies,
       CAST(min(CASE WHEN cum >= (19 * n + 19) // 20 THEN r END) AS BIGINT)
         AS p95_q,
       round(CAST(min(CASE WHEN cum >= (19 * n + 19) // 20 THEN r END)
                  AS DOUBLE) / 1000.0, 6) AS p95_ms
FROM h GROUP BY day_name, hour
ORDER BY day_name, hour
"""
)


@register("reply_p95_heatmap", _P95_SQL)
def q_reply_p95_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact nearest-rank p95 reply per weekday×hour cell
    (operators/stattests.py)."""
    return stattests.reply_p95_heatmap(_fact(spark, sf_dir))
