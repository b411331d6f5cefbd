"""M31 — per-key robust / graph-moment / rank-surface wave:

- ``client_mad_outliers`` — the M28 MAD audit generalized per client:
  every median is a PARTITIONED pair of order statistics over the
  (client, day) relation, so per-key robust stats never funnel
  through one partition (operators/robust.py).
- ``degree_assortativity`` — Pearson degree correlation over the
  distinct client↔domain edge set, exact BIGINT/DECIMAL(38,0)
  moments + one IEEE expression (operators/graph.py).
- ``client_rank_metrics`` — ntile / percent_rank / cume_dist panel
  over per-client counts on a unique total order
  (operators/ranks.py).

All three DuckDB-oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from piholelongtermstats_spark.operators import graph, ranks, robust
from piholelongtermstats_spark.plans.registry import _fact, register
from piholelongtermstats_spark.sources.events import FACT_CTE

_CLIENT_MAD_SQL = (
    FACT_CTE
    + """
, daily AS (
  SELECT client, date, CAST(count(*) AS BIGINT) AS y
  FROM fact GROUP BY 1, 2
)
, ranked AS (
  SELECT client, y AS v,
         row_number() OVER (PARTITION BY client ORDER BY y, date) AS r,
         count(*) OVER (PARTITION BY client) AS n
  FROM daily
)
, med AS (
  SELECT client,
         CAST(CASE WHEN max(n) % 2 = 1 THEN 2 * sum(v) ELSE sum(v) END
              AS BIGINT) AS med2
  FROM ranked WHERE r IN ((n + 1) // 2, n // 2 + 1) GROUP BY client
)
, dev AS (
  SELECT d.client, d.date, d.y, m.med2, abs(2 * d.y - m.med2) AS u
  FROM daily d JOIN med m USING (client)
)
, ranked2 AS (
  SELECT client, u AS v,
         row_number() OVER (PARTITION BY client ORDER BY u) AS r,
         count(*) OVER (PARTITION BY client) AS n
  FROM dev
)
, mad AS (
  SELECT client,
         CAST(CASE WHEN max(n) % 2 = 1 THEN 2 * sum(v) ELSE sum(v) END
              AS BIGINT) AS mad4
  FROM ranked2 WHERE r IN ((n + 1) // 2, n // 2 + 1) GROUP BY client
)
SELECT d.client AS client, d.date AS date, d.y AS y, d.med2 AS med2,
  mad.mad4 AS mad4, 2 * d.y - d.med2 AS dev2,
  round(CASE WHEN mad.mad4 > 0 THEN
    (2.0 * CAST(2 * d.y - d.med2 AS DOUBLE))
    / (1.4826 * CAST(mad.mad4 AS DOUBLE)) END, 6) AS robust_z,
  CAST(4 * d.u > 7 * mad.mad4 AS INT) AS is_outlier
FROM dev d JOIN mad USING (client)
"""
)


@register("client_mad_outliers", _CLIENT_MAD_SQL)
def q_client_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-client robust outlier days — partitioned exact medians
    (operators/robust.py)."""
    return robust.client_mad_outliers(_fact(spark, sf_dir))


_ASSORT_SQL = (
    FACT_CTE
    + """
, edges AS (SELECT DISTINCT client, domain FROM fact)
, degc AS (
  SELECT client, CAST(count(*) AS BIGINT) AS x FROM edges GROUP BY client
)
, degd AS (
  SELECT domain, CAST(count(*) AS BIGINT) AS y FROM edges GROUP BY domain
)
, e AS (
  SELECT x, y FROM edges JOIN degc USING (client) JOIN degd USING (domain)
)
, s AS (
  SELECT CAST(count(*) AS BIGINT) AS n_edges,
         CAST(sum(x) AS BIGINT) AS sx,
         CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(CAST(x * y AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sxy,
         CAST(sum(CAST(x * x AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sxx,
         CAST(sum(CAST(y * y AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS syy
  FROM e
)
SELECT n_edges, sx, sy,
  CAST(sxy AS DOUBLE) AS sxy,
  CAST(sxx AS DOUBLE) AS sxx,
  CAST(syy AS DOUBLE) AS syy,
  round(CASE WHEN
      (CAST(sxx AS DOUBLE) * CAST(n_edges AS DOUBLE)
       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) > 0
    AND
      (CAST(syy AS DOUBLE) * CAST(n_edges AS DOUBLE)
       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) > 0
  THEN
    (CAST(sxy AS DOUBLE) * CAST(n_edges AS DOUBLE)
     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
    / sqrt(
        (CAST(sxx AS DOUBLE) * CAST(n_edges AS DOUBLE)
         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        * (CAST(syy AS DOUBLE) * CAST(n_edges AS DOUBLE)
           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
  END, 6) AS assortativity
FROM s
"""
)


@register("degree_assortativity", _ASSORT_SQL)
def q_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bipartite degree assortativity — exact moments, one IEEE
    expression (operators/graph.py)."""
    return graph.degree_assortativity(_fact(spark, sf_dir))


_RANKS_SQL = (
    FACT_CTE
    + """
, per AS (
  SELECT client, CAST(count(*) AS BIGINT) AS cnt FROM fact GROUP BY client
)
SELECT client, cnt,
  ntile(4) OVER w AS quartile,
  round(percent_rank() OVER w, 6) AS pct_rank,
  round(cume_dist() OVER w, 6) AS cume
FROM per WINDOW w AS (ORDER BY cnt DESC, client)
"""
)


@register("client_rank_metrics", _RANKS_SQL)
def q_client_rank_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile/percent_rank/cume_dist panel on a unique total order
    (operators/ranks.py)."""
    return ranks.client_rank_metrics(_fact(spark, sf_dir))
