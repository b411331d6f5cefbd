"""M42 — classical decomposition, change detection, sketch audit:

- ``stl_lite_daily`` — additive seasonal decomposition (centered-MA
  trend, weekday seasonal means, doubly-n-cleared integer remainder).
- ``domain_share_movers`` — top domains by absolute traffic-SHARE
  change between the halves of the date range (surge/collapse
  detection; share, not count, so volume drift cancels).
- ``quantile_sketch_eval`` — percentile_approx rank-error audit vs
  the exact histogram truth (rows-only: the GK sketch's compaction is
  not SQL-replayable; the bound contract is pytest-pinned instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from piholelongtermstats_spark.operators import behavior, robust, stattests
from piholelongtermstats_spark.plans.registry import _fact, register
from piholelongtermstats_spark.sources.events import FACT_CTE

_STL_SQL = (
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
)
SELECT d.date, d.y, d.win_n, d.win_sum, d.det7,
       season.s_cnt AS wd_cnt,
       season.s_sum AS wd_det_sum,
       CAST(d.det7 * season.s_cnt - season.s_sum AS BIGINT)
         AS remain7_scaled,
       round(CAST(d.win_sum AS DOUBLE) / CAST(d.win_n AS DOUBLE), 6)
         AS trend_mean,
       round(CAST(season.s_sum AS DOUBLE) / CAST(season.s_cnt AS DOUBLE), 6)
         AS seasonal_mean
FROM d JOIN season USING (wd)
ORDER BY date
"""
)


@register("stl_lite_daily", _STL_SQL)
def q_stl_lite_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive trend/seasonal/remainder decomposition of the daily
    series, integer-cleared (operators/robust.py)."""
    return robust.stl_lite_daily(_fact(spark, sf_dir))


_MOVERS_K = 10

_MOVERS_SQL = (
    FACT_CTE
    + f"""
, bounds AS (
  SELECT min(date) AS d0,
         min(date) + to_days(CAST(date_diff('day', min(date), max(date)) // 2
                                  AS INT)) AS mid
  FROM fact
), tagged AS (
  SELECT domain, CASE WHEN date < mid THEN 0 ELSE 1 END AS half
  FROM fact, bounds
), per AS (
  SELECT domain, half, CAST(count(*) AS BIGINT) AS c
  FROM tagged GROUP BY domain, half
), tot AS (
  SELECT half, CAST(sum(c) AS BIGINT) AS n FROM per GROUP BY half
), shares AS (
  SELECT domain,
    CAST(sum(CASE WHEN half = 0 THEN c ELSE 0 END) AS BIGINT) AS cnt_a,
    CAST(sum(CASE WHEN half = 1 THEN c ELSE 0 END) AS BIGINT) AS cnt_b,
    CAST(sum(CASE WHEN half = 0 THEN c * 1000000 // n ELSE 0 END) AS BIGINT)
      AS share_a_ppm,
    CAST(sum(CASE WHEN half = 1 THEN c * 1000000 // n ELSE 0 END) AS BIGINT)
      AS share_b_ppm
  FROM per JOIN tot USING (half) GROUP BY domain
)
SELECT domain, cnt_a, cnt_b, share_a_ppm, share_b_ppm,
       share_b_ppm - share_a_ppm AS delta_ppm,
       abs(share_b_ppm - share_a_ppm) AS abs_delta_ppm
FROM shares
ORDER BY abs_delta_ppm DESC, domain
LIMIT {_MOVERS_K}
"""
)


@register("domain_share_movers", _MOVERS_SQL)
def q_domain_share_movers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 domains by |share change| between date-range halves,
    exact ppm (operators/behavior.py)."""
    return behavior.domain_share_movers(_fact(spark, sf_dir), _MOVERS_K)


# Graduated from rows-only in r11 (r10 VERDICT #5): the GK sketch's
# COMPACTION isn't SQL-replayable, but its accuracy CONTRACT is
# checkable — the registered frame emits the exact-side columns (all
# SQL-derivable: nearest-rank quantile over the µs histogram, n, the
# promised ⌈n/accuracy⌉ bound) plus the audited within_bound verdict,
# and the oracle emits the PROMISE (within_bound = 1) next to its own
# exact legs. A hash match therefore certifies both that the exact
# side replays and that percentile_approx actually honoured its rank
# bound on this corpus at this run — a sketch violation now fails the
# driver gate, not just pytest. The raw sketch_q/rank_err columns
# stay pytest-pinned via the operator (tests/test_m38.py).
_QSK_SQL = (
    FACT_CTE
    + """
, m AS (SELECT CAST(round(reply_time * 1000) AS BIGINT) AS r
        FROM fact WHERE reply_time IS NOT NULL),
hist AS (SELECT r, CAST(count(*) AS BIGINT) AS cnt FROM m GROUP BY r),
h AS (SELECT r,
             CAST(sum(cnt) OVER (ORDER BY r ROWS BETWEEN UNBOUNDED
                                 PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
             CAST(sum(cnt) OVER () AS BIGINT) AS n
      FROM hist),
p AS (SELECT unnest([500, 950, 990]) AS p_pm),
exact AS (
  SELECT p_pm, CAST(max(n) AS BIGINT) AS n,
         CAST(min(r) AS BIGINT) AS exact_q
  FROM h CROSS JOIN p
  WHERE cum >= (p_pm * n + 999) // 1000
  GROUP BY p_pm)
SELECT p_pm, n, exact_q,
       CAST((n + 9999) // 10000 AS BIGINT) AS bound,
       CAST(1 AS INTEGER) AS within_bound
FROM exact ORDER BY p_pm
"""
)


@register("quantile_sketch_eval", _QSK_SQL)
def q_quantile_sketch_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percentile_approx rank-error audit vs exact histogram truth —
    exact-side columns plus the audited within_bound verdict; the
    oracle states the GK promise, so a bound violation hash-fails
    (operators/stattests.py)."""
    return stattests.quantile_sketch_eval(_fact(spark, sf_dir)).select(
        "p_pm", "n", "exact_q", "bound", "within_bound"
    )
