"""M46 — seasonally-adjusted anomaly, windowed funnel, spike
explanation, temporal drift:

- ``seasonal_adjusted_outliers`` — the MAD outlier gate on the
  STL-lite integer remainder: weekday effect removed before flagging.
- ``funnel_windowed`` — the ordered funnel with a per-step time
  budget (30 min): the production "first touch within window" rule.
- ``spike_contribution`` — top domains by contribution to the
  largest day-over-day volume change (Δtotal decomposes exactly into
  per-domain Δcounts).
- ``reply_drift_chi2`` — χ² drift of the reply distribution between
  date-range halves over the first half's own exact deciles (the PSI
  shape, log-free); the χ² sum runs as a bucket-ordered fold in both
  engines (bit-identical doubles).

All four DuckDB-oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from piholelongtermstats_spark.operators import behavior, journey, robust, stattests
from piholelongtermstats_spark.plans.cache import fan_degenerate, shared_input
from piholelongtermstats_spark.plans.registry import _fact, register
from piholelongtermstats_spark.session import ensure_session_defaults
from piholelongtermstats_spark.sources.events import FACT_CTE, raw_event_stream

_SEASONAL_OUT_SQL = (
    FACT_CTE
    + """
, daily AS (
  SELECT date, CAST(count(*) AS BIGINT) AS y FROM fact GROUP BY date
), base AS (
  SELECT date, y,
    CAST(dayofweek(date) + 1 AS INT) AS wd,
    CAST(count(*) OVER w AS BIGINT) AS win_n,
    CAST(sum(y) OVER w AS BIGINT) AS win_sum
  FROM daily
  WINDOW w AS (ORDER BY date ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
), d AS (
  SELECT *, win_n * y - win_sum AS det7 FROM base
), season AS (
  SELECT wd, CAST(sum(det7) AS BIGINT) AS s_sum,
         CAST(count(*) AS BIGINT) AS s_cnt
  FROM d GROUP BY wd
), stl AS (
  SELECT d.date, d.y,
         CAST(d.det7 * season.s_cnt - season.s_sum AS BIGINT) AS adj
  FROM d JOIN season USING (wd)
), h1 AS (
  SELECT adj AS v,
    CAST(sum(cnt) OVER (ORDER BY adj ROWS UNBOUNDED PRECEDING) AS BIGINT)
      AS cum,
    CAST(sum(cnt) OVER () AS BIGINT) AS n
  FROM (SELECT adj, CAST(count(*) AS BIGINT) AS cnt FROM stl GROUP BY adj)
), med AS (
  SELECT CAST(min(CASE WHEN cum >= (n + 1) // 2 THEN v END)
         + min(CASE WHEN cum >= n // 2 + 1 THEN v END) AS BIGINT) AS med2
  FROM h1
), dev AS (
  SELECT stl.*, med.med2, abs(2 * stl.adj - med.med2) AS u FROM stl, med
), h2 AS (
  SELECT u AS v,
    CAST(sum(cnt) OVER (ORDER BY u ROWS UNBOUNDED PRECEDING) AS BIGINT)
      AS cum,
    CAST(sum(cnt) OVER () AS BIGINT) AS n
  FROM (SELECT u, CAST(count(*) AS BIGINT) AS cnt FROM dev GROUP BY u)
), mad AS (
  SELECT CAST(min(CASE WHEN cum >= (n + 1) // 2 THEN v END)
         + min(CASE WHEN cum >= n // 2 + 1 THEN v END) AS BIGINT) AS mad4
  FROM h2
)
SELECT dev.date, dev.y, dev.adj, dev.med2, mad.mad4,
  round(CASE WHEN mad.mad4 > 0 THEN
    (2.0 * CAST(2 * dev.adj - dev.med2 AS DOUBLE))
    / (1.4826 * CAST(mad.mad4 AS DOUBLE)) END, 6) AS robust_z,
  CAST(2 * 2 * dev.u > 7 * mad.mad4 AS INT) AS is_outlier
FROM dev, mad
ORDER BY dev.date
"""
)


@register("seasonal_adjusted_outliers", _SEASONAL_OUT_SQL)
def q_seasonal_adjusted_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAD outlier gate on the seasonally-adjusted (STL remainder)
    series (operators/robust.py)."""
    return robust.seasonal_adjusted_outliers(_fact(spark, sf_dir))


_FW_MIN = 30

_FUNNEL_W_SQL = f"""
WITH s1 AS (
  SELECT user_id, min(ts) AS t FROM events
  WHERE event_type = 'view' GROUP BY user_id
), s2 AS (
  SELECT e.user_id, min(e.ts) AS t
  FROM events e JOIN s1 ON s1.user_id = e.user_id
    AND e.ts > s1.t AND e.ts <= s1.t + INTERVAL {_FW_MIN} MINUTE
  WHERE e.event_type = 'click' GROUP BY e.user_id
), s3 AS (
  SELECT e.user_id, min(e.ts) AS t
  FROM events e JOIN s2 ON s2.user_id = e.user_id
    AND e.ts > s2.t AND e.ts <= s2.t + INTERVAL {_FW_MIN} MINUTE
  WHERE e.event_type = 'purchase' GROUP BY e.user_id
), c AS (
  SELECT
    (SELECT CAST(count(DISTINCT user_id) AS BIGINT) FROM events) AS n_users,
    (SELECT CAST(count(*) AS BIGINT) FROM s1) AS n_step1,
    (SELECT CAST(count(*) AS BIGINT) FROM s2) AS n_step2,
    (SELECT CAST(count(*) AS BIGINT) FROM s3) AS n_step3
)
SELECT n_users, n_step1, n_step2, n_step3,
  CAST(CASE WHEN n_step1 > 0 THEN n_step2 * 1000000 // n_step1 END
       AS BIGINT) AS conv_1_2_ppm,
  CAST(CASE WHEN n_step2 > 0 THEN n_step3 * 1000000 // n_step2 END
       AS BIGINT) AS conv_2_3_ppm,
  CAST(CASE WHEN n_step1 > 0 THEN n_step3 * 1000000 // n_step1 END
       AS BIGINT) AS conv_1_3_ppm
FROM c
"""


@register("funnel_windowed", _FUNNEL_W_SQL)
def q_funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel with a 30-minute per-step budget
    (operators/journey.py)."""
    ensure_session_defaults(spark)
    raw = shared_input(
        spark,
        "raw_events",
        sf_dir,
        # fanned at cache build (r12, see cache.shared_docs)
        lambda: fan_degenerate(
            spark, raw_event_stream(spark, sf_dir), "user_id"
        ),
    )
    return journey.funnel_windowed(raw, within_minutes=_FW_MIN)


_SPIKE_K = 10

_SPIKE_SQL = (
    FACT_CTE
    + f"""
, daily AS (
  SELECT date, CAST(count(*) AS BIGINT) AS y FROM fact GROUP BY date
), deltas AS (
  SELECT date, y - lag(y) OVER (ORDER BY date) AS d,
         lag(date) OVER (ORDER BY date) AS prev_date
  FROM daily
), spike AS (
  SELECT date AS spike_date, prev_date AS before_date,
         CAST(d AS BIGINT) AS total_delta
  FROM deltas WHERE d IS NOT NULL
  ORDER BY abs(d) DESC, date LIMIT 1
), dd AS (
  SELECT f.domain,
    CAST(count(*) FILTER (WHERE f.date = s.before_date) AS BIGINT)
      AS cnt_before,
    CAST(count(*) FILTER (WHERE f.date = s.spike_date) AS BIGINT)
      AS cnt_after
  FROM fact f, spike s
  WHERE f.date = s.spike_date OR f.date = s.before_date
  GROUP BY f.domain
)
SELECT s.spike_date, s.total_delta, dd.domain, dd.cnt_before, dd.cnt_after,
       dd.cnt_after - dd.cnt_before AS delta,
       CAST((dd.cnt_after - dd.cnt_before) * 1000000 // s.total_delta
            AS BIGINT) AS share_ppm
FROM dd, spike s
ORDER BY abs(dd.cnt_after - dd.cnt_before) DESC, dd.domain
LIMIT {_SPIKE_K}
"""
)


@register("spike_contribution", _SPIKE_SQL)
def q_spike_contribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 domains explaining the largest day-over-day volume
    change (operators/behavior.py)."""
    return behavior.spike_contribution(_fact(spark, sf_dir), _SPIKE_K)


_NB = 10

_DRIFT_SQL = (
    FACT_CTE
    + f"""
, m AS (
  SELECT CAST(round(reply_time * 1000) AS BIGINT) AS r, date
  FROM fact WHERE reply_time IS NOT NULL
), bounds AS (
  SELECT min(date) + to_days(CAST(date_diff('day', min(date), max(date)) // 2
                                  AS INT)) AS mid
  FROM m
), v AS (
  SELECT r, CAST(date < mid AS INT) AS in_a FROM m, bounds
), hist AS (
  SELECT r, CAST(sum(in_a) AS BIGINT) AS ca,
         CAST(sum(1 - in_a) AS BIGINT) AS cb
  FROM v GROUP BY r
), h AS (
  SELECT r, ca, cb,
    CAST(sum(ca) OVER (ORDER BY r ROWS UNBOUNDED PRECEDING) AS BIGINT)
      AS cum_a,
    CAST(sum(ca) OVER () AS BIGINT) AS na
  FROM hist
), bucketed AS (
  SELECT CASE WHEN cum_a > 0
           THEN least(CAST((cum_a * {_NB} - 1) // na AS INT), {_NB - 1})
           ELSE 0 END AS b,
         ca, cb
  FROM h WHERE na > 0
), per AS (
  SELECT b, CAST(sum(ca) AS BIGINT) AS oa, CAST(sum(cb) AS BIGINT) AS ob
  FROM bucketed GROUP BY b
), tot AS (
  SELECT CAST(sum(oa) AS BIGINT) AS n_first,
         CAST(sum(ob) AS BIGINT) AS n_second
  FROM per
), terms AS (
  SELECT per.b,
    CASE WHEN CAST(tot.n_first AS HUGEINT) * tot.n_second
              * (per.oa + per.ob) > 0
    THEN CAST((CAST(tot.n_first AS HUGEINT) * per.ob
               - CAST(tot.n_second AS HUGEINT) * per.oa)
              * (CAST(tot.n_first AS HUGEINT) * per.ob
                 - CAST(tot.n_second AS HUGEINT) * per.oa) AS DOUBLE)
         / CAST(CAST(tot.n_first AS HUGEINT) * tot.n_second
                * (per.oa + per.ob) AS DOUBLE)
    ELSE 0.0 END AS t
  FROM per, tot
), folded AS (
  -- b-ordered LEFT FOLD of the double terms (the recursive-CTE twin
  -- of Spark's array fold: identical operand order => identical bits)
  WITH RECURSIVE f(i, acc) AS (
    -- anchor MUST be typed DOUBLE: a bare 0.0 is DECIMAL(2,1) in
    -- DuckDB and the accumulator would round every step to 1 digit
    SELECT -1, CAST(0.0 AS DOUBLE)
    UNION ALL
    SELECT i + 1,
           acc + coalesce((SELECT t FROM terms WHERE b = i + 1),
                          CAST(0.0 AS DOUBLE))
    FROM f WHERE i + 1 < {_NB}
  )
  SELECT acc AS chi2 FROM f WHERE i = {_NB} - 1
)
SELECT tot.n_first, tot.n_second,
       (SELECT CAST(count(*) AS BIGINT) FROM per) AS n_buckets_used,
       round(folded.chi2, 6) AS chi2,
       (SELECT CAST(count(*) - 1 AS BIGINT) FROM per) AS dof
FROM tot, folded
"""
)


@register("reply_drift_chi2", _DRIFT_SQL)
def q_reply_drift_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile-bucketed χ² drift of reply time between date-range
    halves (operators/stattests.py)."""
    return stattests.reply_drift_chi2(_fact(spark, sf_dir), _NB)
