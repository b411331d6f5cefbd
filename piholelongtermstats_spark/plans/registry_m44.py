"""M44 — structural-break regression + k-core nucleus (+ the
streaming MG sketch, which lives test-side: streaming/heavyhitters.py
maintains per-shard Misra–Gries state incrementally; its batch twin
``heavy_hitters_exact`` is already a driver row, and the stream's
guarantee bounds are pinned in tests/test_streaming_hh.py).

- ``broken_trend_fit`` — piecewise OLS split at the CUSUM
  change-point (did the trend CHANGE at the break?), exact BIGINT
  sufficient statistics per segment; oracle-checked.
- ``kcore_summary`` — the k-core of the client↔domain graph by
  synchronous peeling (rows-only: iterative fixpoint; brute-force
  sequential-peel differential + disjoint-doubling invariance in
  tests/test_m44.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from piholelongtermstats_spark.operators import graph, timeagg
from piholelongtermstats_spark.plans.registry import _fact, register
from piholelongtermstats_spark.sources.events import FACT_CTE

_BROKEN_SQL = (
    FACT_CTE
    + """
, daily AS (
  SELECT date, CAST(count(*) AS BIGINT) AS y FROM fact GROUP BY date
), tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS sy,
         min(date) AS d0
  FROM daily
), scanned AS (
  SELECT date,
    CAST(sum(n * y - sy) OVER (ORDER BY date ROWS UNBOUNDED PRECEDING)
         AS BIGINT) AS p
  FROM daily, tot
), tau AS (
  SELECT date AS break_date FROM scanned ORDER BY abs(p) DESC, date LIMIT 1
), seg AS (
  SELECT CASE WHEN daily.date <= tau.break_date THEN 'a' ELSE 'b' END AS seg,
         CAST(date_diff('day', tot.d0, daily.date) AS BIGINT) AS x,
         daily.y AS y, tau.break_date
  FROM daily, tot, tau
), stats AS (
  SELECT seg, max(break_date) AS break_date,
         CAST(count(*) AS BIGINT) AS m,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(y * y) AS BIGINT) AS syy
  FROM seg GROUP BY seg
), per AS (
  SELECT seg, break_date, m,
    round(CAST(m * sxy - sx * sy AS DOUBLE)
          / nullif(CAST(m * sxx - sx * sx AS DOUBLE), 0), 6) AS sl,
    round(CAST(m * sxy - sx * sy AS DOUBLE)
          * CAST(m * sxy - sx * sy AS DOUBLE)
          / nullif(CAST(m * sxx - sx * sx AS DOUBLE)
                   * CAST(m * syy - sy * sy AS DOUBLE), 0), 6) AS r2
  FROM stats
), nd AS (SELECT CAST(count(*) AS BIGINT) AS n_days FROM daily)
SELECT nd.n_days,
       b.break_date,
       CAST(coalesce(a.m, 0) AS BIGINT) AS n_a,
       a.sl AS slope_a, a.r2 AS r2_a,
       b.m AS n_b, b.sl AS slope_b, b.r2 AS r2_b
FROM nd
CROSS JOIN (SELECT * FROM per WHERE seg = 'b') b
LEFT JOIN (SELECT * FROM per WHERE seg = 'a') a ON TRUE
"""
)


@register("broken_trend_fit", _BROKEN_SQL)
def q_broken_trend_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Piecewise OLS at the CUSUM break, exact sufficient statistics
    (operators/timeagg.py)."""
    return timeagg.broken_trend_fit(_fact(spark, sf_dir))


_KCORE_K = 2
_KCORE_ROUNDS = 40  # matches the operator's max_rounds raise guard


def _kcore_sql(k: int = _KCORE_K, rounds: int = _KCORE_ROUNDS) -> str:
    """Synchronous peeling unrolled to the operator's max_rounds
    (r9 VERDICT #3): e_i keeps exactly the edges whose BOTH endpoints
    have degree >= k in e_{i-1} — the operator's two LEFT ANTI joins.
    Peeling is idempotent past the fixpoint, so extra rounds are
    no-ops; ``rounds`` replays as the number of strict edge-count
    decreases (sizes are strictly monotone until the plateau, so
    count(DISTINCT size) - 1 is exact). Every CTE is MATERIALIZED —
    each e_i is referenced three times and inlining would make the
    plan exponential in the unroll depth.
    """
    parts = [
        FACT_CTE,
        """
, e0 AS MATERIALIZED (SELECT DISTINCT client, domain FROM fact)""",
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f""",
e{i} AS MATERIALIZED (
  SELECT client, domain FROM e{i - 1}
  WHERE client IN (SELECT client FROM e{i - 1}
                   GROUP BY client HAVING count(*) >= {k})
    AND domain IN (SELECT domain FROM e{i - 1}
                   GROUP BY domain HAVING count(*) >= {k}))"""
        )
    counts = "\n  UNION ALL ".join(
        f"SELECT (SELECT count(*) FROM e{i}) AS c" for i in range(rounds + 1)
    )
    parts.append(
        f""",
cnts AS ({counts})
SELECT CAST({k} AS BIGINT) AS k,
       (SELECT CAST(count(DISTINCT c) - 1 AS BIGINT) FROM cnts) AS rounds,
       CAST(count(DISTINCT client) AS BIGINT) AS n_clients_core,
       CAST(count(DISTINCT domain) AS BIGINT) AS n_domains_core,
       CAST(count(*) AS BIGINT) AS n_edges_core
FROM e{rounds}"""
    )
    return "".join(parts)


@register("kcore_summary", _kcore_sql())
def q_kcore_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-core of the client↔domain bipartite graph — synchronous
    peeling, confluent, with brute-force differential tests; the
    oracle replays the peel round-for-round as unrolled CTEs
    (operators/graph.py)."""
    return graph.kcore_decomposition(
        _fact(spark, sf_dir), _KCORE_K, max_rounds=_KCORE_ROUNDS
    )
