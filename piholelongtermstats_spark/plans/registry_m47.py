"""M47 — survival, rank-based changepoint, fleet inequality:

- ``kaplan_meier_clients`` — Kaplan–Meier product-limit survival over
  client lifetimes, right-censored near the window end; the survival
  product folds left-to-right with the recursive-CTE twin (the
  ewma/holt bit-identical-fold contract).
- ``pettitt_changepoint`` — Pettitt's nonparametric changepoint over
  the daily count series (exact BIGINT U statistics; the rank-based
  sibling of cusum_changepoint).
- ``client_gini`` — Gini coefficient of the per-client event-count
  distribution via the count-value histogram (no per-client rank
  window at any scale).

All three DuckDB-oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from piholelongtermstats_spark.operators import counts, stattests, survival
from piholelongtermstats_spark.plans.registry import _fact, register
from piholelongtermstats_spark.sources.events import FACT_CTE

# Registry pin: horizon 2 days. The synthetic corpus is 30 dense days
# (TESTDATA.md), so at the production default (7) no client ever
# churns and the curve is a degenerate all-censored 1.0 line; at 2 the
# driver check exercises real event steps at every SF.
_KM_H = 2

_KM_SQL = (
    FACT_CTE
    + f"""
, per AS (
  SELECT client, min(date) AS first_d, max(date) AS last_d
  FROM fact GROUP BY client
), g AS (
  SELECT max(date) AS g_end FROM fact
), life AS (
  SELECT CAST(date_diff('day', first_d, last_d) AS BIGINT) AS t,
         CAST(date_diff('day', last_d, g_end) >= {_KM_H} AS INT) AS observed
  FROM per, g
), hist AS (
  SELECT t, CAST(sum(observed) AS BIGINT) AS d,
         CAST(sum(1 - observed) AS BIGINT) AS c,
         CAST(count(*) AS BIGINT) AS m
  FROM life GROUP BY t
), risked AS (
  SELECT t, d, c,
    CAST((SELECT count(*) FROM life)
         - (sum(m) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) - m)
         AS BIGINT) AS n_risk
  FROM hist
), idx AS (
  SELECT t, d, c, n_risk,
         CAST(row_number() OVER (ORDER BY t) AS BIGINT) AS i
  FROM risked
), folded AS (
  -- t-ordered LEFT FOLD of surv *= (n_risk - d)/n_risk: the
  -- recursive-CTE twin of Spark's array fold (identical operand
  -- order => identical doubles)
  WITH RECURSIVE f(i, surv) AS (
    SELECT CAST(0 AS BIGINT), CAST(1.0 AS DOUBLE)
    UNION ALL
    SELECT f.i + 1,
           f.surv * (CAST((SELECT n_risk - d FROM idx WHERE i = f.i + 1)
                          AS DOUBLE)
                     / CAST((SELECT n_risk FROM idx WHERE i = f.i + 1)
                            AS DOUBLE))
    FROM f WHERE f.i < (SELECT count(*) FROM idx)
  )
  SELECT i, surv FROM f WHERE i > 0
)
SELECT idx.t AS t_days, idx.n_risk, idx.d AS n_events,
       idx.c AS n_censored, round(folded.surv, 6) AS surv
FROM idx JOIN folded ON folded.i = idx.i
ORDER BY t_days
"""
)


@register("kaplan_meier_clients", _KM_SQL)
def q_kaplan_meier_clients(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Client-lifetime Kaplan–Meier survival curve
    (operators/survival.py)."""
    return survival.kaplan_meier_clients(
        _fact(spark, sf_dir), censor_horizon_days=_KM_H
    )


_PETTITT_SQL = (
    FACT_CTE
    + """
, daily AS (
  SELECT date, CAST(count(*) AS BIGINT) AS y FROM fact GROUP BY date
), v AS (
  SELECT a.date AS d1,
    CAST(sum(CASE WHEN a.y > b.y THEN 1 WHEN a.y < b.y THEN -1
                  ELSE 0 END) AS BIGINT) AS v
  FROM daily a JOIN daily b ON a.date <> b.date
  GROUP BY a.date
), u AS (
  SELECT d1 AS date,
    CAST(sum(v) OVER (ORDER BY d1 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS u
  FROM v
), nn AS (
  SELECT CAST(count(*) AS BIGINT) AS n_days FROM daily
), picked AS (
  SELECT date, u
  FROM u, (SELECT max(date) AS last_date FROM daily)
  WHERE date < last_date
  ORDER BY abs(u) DESC, date ASC LIMIT 1
)
SELECT nn.n_days, picked.date AS change_date, picked.u AS u_at_k,
  abs(picked.u) AS k_stat,
  round(least(2.0 * exp(-6.0 * CAST(picked.u * picked.u AS DOUBLE)
    / (CAST(nn.n_days AS DOUBLE) * CAST(nn.n_days AS DOUBLE)
       * CAST(nn.n_days AS DOUBLE)
       + CAST(nn.n_days AS DOUBLE) * CAST(nn.n_days AS DOUBLE))),
    1.0), 6) AS p_approx
FROM picked, nn
"""
)


@register("pettitt_changepoint", _PETTITT_SQL)
def q_pettitt_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pettitt rank-based changepoint over daily counts
    (operators/stattests.py)."""
    return stattests.pettitt_changepoint(_fact(spark, sf_dir))


_GINI_SQL = (
    FACT_CTE
    + """
, per AS (
  SELECT client, CAST(count(*) AS BIGINT) AS x FROM fact GROUP BY client
), hist AS (
  SELECT x, CAST(count(*) AS BIGINT) AS f FROM per GROUP BY x
), ranked AS (
  SELECT x, f,
    CAST(sum(f) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING) - f
         AS BIGINT) AS c_below
  FROM hist
), agg AS (
  SELECT CAST(sum(f) AS BIGINT) AS n_clients,
         CAST(sum(x * f) AS BIGINT) AS total_events,
         sum(CAST(x AS HUGEINT)
             * (CAST(f AS HUGEINT) * c_below + f * (f + 1) // 2)) AS t_rank
  FROM ranked
)
SELECT n_clients, total_events,
  CAST((2 * t_rank - (CAST(n_clients AS HUGEINT) + 1) * total_events)
       * 1000000
       // (CAST(n_clients AS HUGEINT) * total_events) AS BIGINT)
    AS gini_ppm,
  round(CAST(2 * t_rank - (CAST(n_clients AS HUGEINT) + 1) * total_events
             AS DOUBLE)
        / CAST(CAST(n_clients AS HUGEINT) * total_events AS DOUBLE), 6)
    AS gini
FROM agg
"""
)


@register("client_gini", _GINI_SQL)
def q_client_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fleet-wide Gini of per-client event counts
    (operators/counts.py)."""
    return counts.client_gini(_fact(spark, sf_dir))
