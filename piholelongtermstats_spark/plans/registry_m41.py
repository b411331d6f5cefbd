"""M41 — user-journey analytics (operators/journey.py): the ordered
funnel and cohort-retention SERVING shapes, both DuckDB-oracle-checked.

Relationship to the M11 tier (registry_m11, operators/cohort.py):
M11's ``funnel_counts`` established the strictly-after anchor
semantics (reached-stage counts) and ``client_retention`` the raw
cohort × age matrix; this wave adds the rate-bearing serving variants
— ``funnel_conversion`` (ppm conversion rates between stages, generic
step list) and ``cohort_retention`` (cohort sizes + retention ppm,
offset-capped). The two formulations are CROSS-VALIDATED, not
redundant: tests/test_m41.py pins stage-count equality between
funnel_conversion and funnel_counts, and n_active equality between
cohort_retention and client_retention on shared inputs — two
independently-written implementations of the same semantics agreeing
is additional evidence for both.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from piholelongtermstats_spark.operators import journey
from piholelongtermstats_spark.plans.cache import fan_degenerate, shared_input
from piholelongtermstats_spark.plans.registry import _fact, register
from piholelongtermstats_spark.session import ensure_session_defaults
from piholelongtermstats_spark.sources.events import FACT_CTE, raw_event_stream

_FUNNEL_SQL = """
WITH s1 AS (
  SELECT user_id, min(ts) AS t FROM events
  WHERE event_type = 'view' GROUP BY user_id
), s2 AS (
  SELECT e.user_id, min(e.ts) AS t
  FROM events e JOIN s1 ON s1.user_id = e.user_id AND e.ts > s1.t
  WHERE e.event_type = 'click' GROUP BY e.user_id
), s3 AS (
  SELECT e.user_id, min(e.ts) AS t
  FROM events e JOIN s2 ON s2.user_id = e.user_id AND e.ts > s2.t
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


@register("funnel_conversion", _FUNNEL_SQL)
def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly-ordered 3-step funnel with ppm conversion rates
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
    return journey.funnel_conversion(raw)


_RETENTION_SQL = (
    FACT_CTE
    + """
, activity AS (SELECT DISTINCT client, date FROM fact)
, cohorts AS (
  SELECT client, min(date) AS cohort_date FROM activity GROUP BY client
), sizes AS (
  SELECT cohort_date, CAST(count(*) AS BIGINT) AS n_cohort
  FROM cohorts GROUP BY cohort_date
), active AS (
  SELECT c.cohort_date,
         CAST(date_diff('day', c.cohort_date, a.date) AS BIGINT)
           AS day_offset,
         CAST(count(*) AS BIGINT) AS n_active
  FROM activity a JOIN cohorts c USING (client)
  WHERE date_diff('day', c.cohort_date, a.date) <= 13
  GROUP BY 1, 2
)
SELECT a.cohort_date, a.day_offset, s.n_cohort, a.n_active,
       CAST(a.n_active * 1000000 // s.n_cohort AS BIGINT) AS retention_ppm
FROM active a JOIN sizes s USING (cohort_date)
ORDER BY cohort_date, day_offset
"""
)


@register("cohort_retention", _RETENTION_SQL)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-seen cohort × day-offset retention matrix, exact ppm
    (operators/journey.py)."""
    return journey.cohort_retention(_fact(spark, sf_dir), 13)
