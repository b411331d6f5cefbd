"""M49 — seasonal forecasting completion + robust daily center:

- ``holt_winters_daily`` — additive Holt–Winters (level + trend +
  weekly seasonal) as one catalyst fold carrying the length-7
  seasonal queue in the accumulator; the oracle's recursive CTE
  carries the same LIST through identical IEEE operand trees ⇒
  bit-identical before round (the holt_linear/ewma fold contract,
  extended to three states).
- ``trimmed_mean_reply_daily`` — per-day 10%-trimmed mean of reply
  time from the value histogram in closed form (no per-event
  ordering).

Both DuckDB-oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from piholelongtermstats_spark.operators import robust, timeagg
from piholelongtermstats_spark.plans.registry import _fact, register
from piholelongtermstats_spark.plans.registry_m28 import _DAILY
from piholelongtermstats_spark.sources.events import FACT_CTE

_HW_SQL = (
    FACT_CTE.replace("WITH fact AS", "WITH RECURSIVE fact AS", 1)
    + _DAILY
    + """
, seq AS (
  SELECT date, y, CAST(row_number() OVER (ORDER BY date) AS BIGINT) AS r
  FROM daily
), init AS (
  SELECT CAST(sum(y) AS BIGINT) AS s_head, CAST(count(*) AS BIGINT) AS n_head,
         list(CAST(y AS DOUBLE) ORDER BY r) AS ys
  FROM seq WHERE r <= 7
), rec AS (
  -- anchor: l = mean(y_1..y_7), b = 0, s_i = y_i - l (i = 1..7)
  SELECT CAST(7 AS BIGINT) AS r,
         CAST(NULL AS TIMESTAMP) AS date, CAST(NULL AS BIGINT) AS y,
         CAST(s_head AS DOUBLE) / 7.0 AS l,
         CAST(0.0 AS DOUBLE) AS b,
         list_transform(ys, yy -> yy - CAST(s_head AS DOUBLE) / 7.0) AS s,
         CAST(NULL AS DOUBLE) AS seas, CAST(NULL AS DOUBLE) AS fc
  FROM init WHERE n_head >= 7
  UNION ALL
  -- l_new inlined into b/s/fc exactly as the Spark fold reuses the
  -- l_new Column (operand order pinned); s[1] is s_{t-7}, the new
  -- queue is s[2:7] || [s_new], and forecast_next reads old s[2]
  SELECT q.r, q.date, q.y,
    0.25 * (CAST(q.y AS DOUBLE) - rec.s[1]) + 0.75 * (rec.l + rec.b),
    0.1 * ((0.25 * (CAST(q.y AS DOUBLE) - rec.s[1])
            + 0.75 * (rec.l + rec.b)) - rec.l) + 0.9 * rec.b,
    rec.s[2:7] || [0.2 * (CAST(q.y AS DOUBLE)
                          - (0.25 * (CAST(q.y AS DOUBLE) - rec.s[1])
                             + 0.75 * (rec.l + rec.b)))
                   + 0.8 * rec.s[1]],
    0.2 * (CAST(q.y AS DOUBLE)
           - (0.25 * (CAST(q.y AS DOUBLE) - rec.s[1])
              + 0.75 * (rec.l + rec.b)))
      + 0.8 * rec.s[1],
    (0.25 * (CAST(q.y AS DOUBLE) - rec.s[1]) + 0.75 * (rec.l + rec.b))
      + (0.1 * ((0.25 * (CAST(q.y AS DOUBLE) - rec.s[1])
                 + 0.75 * (rec.l + rec.b)) - rec.l) + 0.9 * rec.b)
      + rec.s[2]
  FROM seq q JOIN rec ON q.r = rec.r + 1
)
SELECT date, y, round(l, 6) AS level, round(b, 6) AS trend,
       round(seas, 6) AS seasonal, round(fc, 6) AS forecast_next
FROM rec WHERE r > 7 ORDER BY date
"""
)


@register("holt_winters_daily", _HW_SQL)
def q_holt_winters_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive Holt–Winters over daily counts
    (operators/robust.py)."""
    return robust.holt_winters_daily(_fact(spark, sf_dir), 0.25, 0.1, 0.2, 7)


_TRIM_PPM = 100_000

_TRIM_SQL = (
    FACT_CTE
    + f"""
, m AS (
  SELECT date, CAST(round(reply_time * 1000) AS BIGINT) AS r
  FROM fact WHERE reply_time IS NOT NULL
), hist AS (
  SELECT date, r, CAST(count(*) AS BIGINT) AS c FROM m GROUP BY date, r
), tot AS (
  SELECT date, CAST(sum(c) AS BIGINT) AS n FROM hist GROUP BY date
), ranked AS (
  SELECT hist.date, hist.r, hist.c, tot.n,
    CAST(sum(hist.c) OVER (PARTITION BY hist.date ORDER BY hist.r
                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
  FROM hist JOIN tot ON hist.date = tot.date
), kept AS (
  SELECT date, r, n,
    greatest(least(cum, n - n * {_TRIM_PPM} // 1000000)
             - greatest(cum - c, n * {_TRIM_PPM} // 1000000), 0) AS k
  FROM ranked
)
SELECT date, CAST(max(n) AS BIGINT) AS n,
  CAST(sum(k) AS BIGINT) AS n_kept,
  round(CAST(sum(CAST(r AS HUGEINT) * k) AS DOUBLE)
        / CAST(CAST(sum(k) AS BIGINT) AS DOUBLE), 6) AS trimmed_mean_ms
FROM kept GROUP BY date ORDER BY date
"""
)


@register("trimmed_mean_reply_daily", _TRIM_SQL)
def q_trimmed_mean_reply_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day 10%-trimmed mean reply time (operators/timeagg.py)."""
    return timeagg.trimmed_mean_reply_daily(_fact(spark, sf_dir), _TRIM_PPM)
