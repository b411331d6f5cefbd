"""M60 — effect sizes + spectral seasonality (both oracle-checked):

- ``day_night_effect_panel`` — the 2×2 blocked-rate effect panel
  (pooled two-proportion z, risk ratio, odds ratio) between Day and
  Night; ratios as single divisions over exact cross products.
- ``weekly_periodogram`` — periodogram lines at the weekly frequency
  family (harmonics k = 1..3 of period 7): the spectral companion of
  acf_daily_counts. Order-free by construction — the trig sums
  collapse over idx mod 7 into seven exact integer masses first, then
  a fixed 7-term chain of literal cos/sin values (computed once
  driver-side, embedded identically in both engines — the
  plane_signs literal discipline).

The oracle SQL is GENERATED so chain order and literals match the
Column expressions by construction (the M59 protocol).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession

from piholelongtermstats_spark.operators import stattests
from piholelongtermstats_spark.plans.registry import FACT_CTE, _fact, register

# ---------------------------------------------------------------------------
# day_night_effect_panel
# ---------------------------------------------------------------------------

_P = (
    "((CAST(x1 AS DOUBLE) + CAST(x2 AS DOUBLE))"
    " / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)))"
)

_EFFECT_SQL = (
    FACT_CTE
    + f"""
, agg AS (
  SELECT
    CAST(count(*) FILTER (WHERE day_period = 'Day') AS BIGINT) AS n1,
    CAST(count(*) FILTER (WHERE day_period = 'Day'
         AND status_type = 'Blocked') AS BIGINT) AS x1,
    CAST(count(*) FILTER (WHERE day_period = 'Night') AS BIGINT) AS n2,
    CAST(count(*) FILTER (WHERE day_period = 'Night'
         AND status_type = 'Blocked') AS BIGINT) AS x2
  FROM fact
)
SELECT n1, x1, n2, x2,
  round(CASE WHEN n1 > 0 AND n2 > 0 AND x1 + x2 > 0
             AND x1 + x2 < n1 + n2 THEN
    (CAST(x1 AS DOUBLE) / CAST(n1 AS DOUBLE)
     - CAST(x2 AS DOUBLE) / CAST(n2 AS DOUBLE))
    / sqrt({_P} * (1.0 - {_P})
           * (1.0 / CAST(n1 AS DOUBLE) + 1.0 / CAST(n2 AS DOUBLE)))
  END, 6) AS z_stat,
  round(CASE WHEN n1 > 0 AND n2 > 0 AND x2 > 0 THEN
    CAST(CAST(x1 AS HUGEINT) * n2 AS DOUBLE)
    / CAST(CAST(x2 AS HUGEINT) * n1 AS DOUBLE)
  END, 6) AS risk_ratio,
  round(CASE WHEN n1 > 0 AND n2 > 0 AND x2 > 0 AND x1 < n1 THEN
    CAST(CAST(x1 AS HUGEINT) * (n2 - x2) AS DOUBLE)
    / CAST(CAST(x2 AS HUGEINT) * (n1 - x1) AS DOUBLE)
  END, 6) AS odds_ratio
FROM agg
"""
)


@register("day_night_effect_panel", _EFFECT_SQL)
def q_day_night_effect_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z + risk/odds ratios for the Day-vs-Night
    blocked rate (operators/stattests.py:day_night_effect_panel)."""
    return stattests.day_night_effect_panel(_fact(spark, sf_dir))


# ---------------------------------------------------------------------------
# weekly_periodogram
# ---------------------------------------------------------------------------

_PG_HARMONICS = 3


def _pg_chain(k: int, fn) -> str:
    s = "0.0"
    for m in range(7):
        s += f" + CAST(g{m} AS DOUBLE) * ({fn(2.0 * math.pi * k * m / 7.0)!r})"
    return s


def _pg_sql(harmonics: int = _PG_HARMONICS) -> str:
    gs = ",\n    ".join(
        f"coalesce(sum(CAST(c AS HUGEINT)) FILTER (WHERE m = {m}), 0)"
        f" AS g{m}"
        for m in range(7)
    )
    selects = []
    for k in range(1, harmonics + 1):
        c = _pg_chain(k, math.cos)
        s = _pg_chain(k, math.sin)
        selects.append(
            f"""
SELECT CAST({k} AS BIGINT) AS harmonic, n AS n_days,
  CAST(den AS DOUBLE) AS den,
  round({c}, 6) AS cos_sum, round({s}, 6) AS sin_sum,
  round(CASE WHEN n > 1 AND den > 0 THEN
    (({c}) * ({c}) + ({s}) * ({s}))
    / (CAST(n AS DOUBLE) * CAST(den AS DOUBLE)) END, 9) AS power_share
FROM base"""
        )
    return (
        FACT_CTE
        + f"""
, daily AS (
  SELECT date, CAST(count(*) AS BIGINT) AS y FROM fact GROUP BY date
), tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS s,
         min(date) AS d0
  FROM daily
), d AS (
  SELECT CAST(date_diff('day', d0, date) % 7 AS INTEGER) AS m,
         CAST(n * y - s AS BIGINT) AS c
  FROM daily, tot
), g AS (
  SELECT coalesce(sum(CAST(c AS HUGEINT) * c), 0) AS den,
    {gs}
  FROM d
), base AS MATERIALIZED (SELECT g.*, tot.n FROM g, tot)
"""
        + "\nUNION ALL".join(selects)
        + "\nORDER BY harmonic"
    )


@register("weekly_periodogram", _pg_sql())
def q_weekly_periodogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Periodogram lines at the weekly harmonics
    (operators/stattests.py:weekly_periodogram)."""
    return stattests.weekly_periodogram(_fact(spark, sf_dir), _PG_HARMONICS)
