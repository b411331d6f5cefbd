"""M45 — growth accounting + join-size estimation audit:

- ``growth_accounting_daily`` — the canonical per-day
  new/retained/resurrected/churned decomposition of the client base
  (DAU_t = new+retained+resurrected; ΔDAU = new+resurrected−churned),
  exact counts over the distinct activity relation with a day spine.
- ``join_cardinality_audit`` — |A ⋈ B| predicted exactly from key
  histograms (Σ f_A·f_B) with a probe-key executed verification —
  the optimizer-statistics workflow as a first-class query.

Both DuckDB-oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from piholelongtermstats_spark.operators import dq, journey
from piholelongtermstats_spark.plans.registry import _fact, register
from piholelongtermstats_spark.sources.events import FACT_CTE

_GROWTH_SQL = (
    FACT_CTE
    + """
, activity AS (SELECT DISTINCT client, date FROM fact)
, first AS (
  SELECT client, min(date) AS first_date FROM activity GROUP BY client
), y AS (
  SELECT client, date + INTERVAL 1 DAY AS date FROM activity
), flags AS (
  SELECT a.date,
    CASE WHEN a.date = f.first_date THEN 1 ELSE 0 END AS is_new,
    CASE WHEN a.date <> f.first_date AND y.client IS NOT NULL
         THEN 1 ELSE 0 END AS is_ret,
    CASE WHEN a.date <> f.first_date AND y.client IS NULL
         THEN 1 ELSE 0 END AS is_res
  FROM activity a
  JOIN first f USING (client)
  LEFT JOIN y ON y.client = a.client AND y.date = a.date
), per AS (
  SELECT date, CAST(count(*) AS BIGINT) AS dau,
         CAST(sum(is_new) AS BIGINT) AS new_clients,
         CAST(sum(is_ret) AS BIGINT) AS retained,
         CAST(sum(is_res) AS BIGINT) AS resurrected
  FROM flags GROUP BY date
), churn AS (
  SELECT y.date, CAST(count(*) AS BIGINT) AS churned
  FROM y LEFT JOIN activity t ON t.client = y.client AND t.date = y.date
  WHERE t.client IS NULL
  GROUP BY y.date
), spine AS (
  SELECT unnest(generate_series(min(date), max(date),
                                INTERVAL 1 DAY)) AS date
  FROM activity
)
SELECT s.date,
       CAST(coalesce(per.dau, 0) AS BIGINT) AS dau,
       CAST(coalesce(per.new_clients, 0) AS BIGINT) AS new_clients,
       CAST(coalesce(per.retained, 0) AS BIGINT) AS retained,
       CAST(coalesce(per.resurrected, 0) AS BIGINT) AS resurrected,
       CAST(coalesce(churn.churned, 0) AS BIGINT) AS churned
FROM spine s
LEFT JOIN per ON per.date = s.date
LEFT JOIN churn ON churn.date = s.date
ORDER BY s.date
"""
)


@register("growth_accounting_daily", _GROWTH_SQL)
def q_growth_accounting_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day new/retained/resurrected/churned decomposition
    (operators/journey.py)."""
    return journey.growth_accounting_daily(_fact(spark, sf_dir))


_N_PROBE = 20

_JOINCARD_SQL = (
    FACT_CTE
    + f"""
, bounds AS (
  SELECT min(date) AS d0,
         min(date) + to_days(CAST(date_diff('day', min(date), max(date)) // 2
                                  AS INT)) AS mid
  FROM fact
), hist AS (
  SELECT client,
         CAST(count(*) FILTER (WHERE date < mid) AS BIGINT) AS fa,
         CAST(count(*) FILTER (WHERE date >= mid) AS BIGINT) AS fb
  FROM fact, bounds GROUP BY client
), hb AS (
  SELECT * FROM hist WHERE fa > 0 AND fb > 0
), probe AS (
  SELECT client FROM (
    SELECT client,
           ('0x' || substr(md5(client), 1, 15))::BIGINT AS h
    FROM hb
  ) ORDER BY h, client LIMIT {_N_PROBE}
), tot AS (
  SELECT CAST(sum(fa) AS BIGINT) AS n_a_matched,
         CAST(sum(fb) AS BIGINT) AS n_b_matched,
         CAST(count(*) AS BIGINT) AS n_keys_common,
         CAST(CAST(sum(CAST(fa AS HUGEINT) * fb) AS HUGEINT) AS DOUBLE)
           AS predicted_total
  FROM hb
), pp AS (
  SELECT CAST(count(*) AS BIGINT) AS n_probe_keys,
         CAST(coalesce(sum(fa * fb), 0) AS BIGINT) AS predicted_probe
  FROM hb JOIN probe USING (client)
), ev AS (
  SELECT f.client, f.event_id, f.date < b.mid AS is_a
  FROM fact f, bounds b
  JOIN probe p ON p.client = f.client
), actual AS (
  SELECT CAST(count(*) AS BIGINT) AS actual_probe
  FROM (SELECT client, event_id FROM ev WHERE is_a) a
  JOIN (SELECT client, event_id FROM ev WHERE NOT is_a) b USING (client)
)
SELECT tot.n_a_matched, tot.n_b_matched, tot.n_keys_common,
       tot.predicted_total, pp.n_probe_keys, pp.predicted_probe,
       actual.actual_probe,
       CAST(pp.predicted_probe = actual.actual_probe AS INT) AS probe_match
FROM tot, pp, actual
"""
)


@register("join_cardinality_audit", _JOINCARD_SQL)
def q_join_cardinality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact join-size prediction from key histograms + probe-key
    executed verification (operators/dq.py)."""
    return dq.join_cardinality_audit(_fact(spark, sf_dir), _N_PROBE)


# ---------------------------------------------------------------------------
# journey_scale_2x — the doubling proof for the ordered-funnel tier:
# events ∪ (user_id + 2^40)-shifted copy. Shifted users are DISJOINT
# twins with identical per-user event sequences, so every stage count
# exactly doubles and the conversion ppms are IDENTICAL to 1×
# (invariance pinned in tests/test_m41.py); the driver row
# hash-checks the doubled execution against a direct oracle on the
# doubled input.
# ---------------------------------------------------------------------------

_J2X_SHIFT = 1 << 40

_J2X_SQL = f"""
WITH ev2 AS (
  SELECT user_id, event_type, ts FROM events
  UNION ALL
  SELECT user_id + {_J2X_SHIFT}, event_type, ts FROM events
), s1 AS (
  SELECT user_id, min(ts) AS t FROM ev2
  WHERE event_type = 'view' GROUP BY user_id
), s2 AS (
  SELECT e.user_id, min(e.ts) AS t
  FROM ev2 e JOIN s1 ON s1.user_id = e.user_id AND e.ts > s1.t
  WHERE e.event_type = 'click' GROUP BY e.user_id
), s3 AS (
  SELECT e.user_id, min(e.ts) AS t
  FROM ev2 e JOIN s2 ON s2.user_id = e.user_id AND e.ts > s2.t
  WHERE e.event_type = 'purchase' GROUP BY e.user_id
), c AS (
  SELECT
    (SELECT CAST(count(DISTINCT user_id) AS BIGINT) FROM ev2) AS n_users,
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


@register("journey_scale_2x", _J2X_SQL)
def q_journey_scale_2x(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel over the 2× user-shifted union — stage counts
    double, conversion ppms invariant (operators/journey.py)."""
    from pyspark.sql import functions as F

    from piholelongtermstats_spark.plans.cache import fan_degenerate, shared_input
    from piholelongtermstats_spark.session import ensure_session_defaults
    from piholelongtermstats_spark.sources.events import raw_event_stream

    ensure_session_defaults(spark)
    raw = shared_input(
        spark,
        "raw_events",
        sf_dir,
        # fanned at cache build (r12, see cache.shared_docs)
        lambda: fan_degenerate(
            spark, raw_event_stream(spark, sf_dir), "user_id"
        ),
    ).select("user_id", "event_type", "ts")
    shifted = raw.select(
        (F.col("user_id") + F.lit(_J2X_SHIFT)).alias("user_id"),
        "event_type",
        "ts",
    )
    return journey.funnel_conversion(raw.unionByName(shifted))
