"""M62 — tail-index estimation (oracle-checked):

``domain_tail_hill`` — the Hill estimator over the top-k domain
popularity counts: the quantitative heavy-tail diagnostic behind
every salting/AQE-skew decision (domain_skew_report gives the
concentration shares; this gives the POWER-LAW EXPONENT). The Σ of k
ln terms is a left fold over ONE sorted array under the pinned
(cnt DESC, domain ASC) order, mirrored by list_reduce — the
transcendental budget is k ln's per query (the dp/renyi2 line),
never per event row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from piholelongtermstats_spark.operators import skew
from piholelongtermstats_spark.plans.registry import FACT_CTE, _fact, register

_HILL_K = 50

_HILL_SQL = (
    FACT_CTE
    + f"""
, top AS (
  SELECT domain, CAST(count(*) AS BIGINT) AS cnt
  FROM fact GROUP BY domain
  ORDER BY cnt DESC, domain LIMIT {_HILL_K + 1}
), nd AS (
  SELECT CAST(count(DISTINCT domain) AS BIGINT) AS n_domains FROM fact
), arr AS (
  SELECT list(struct_pack(neg := -cnt, domain := domain, cnt := cnt)
              ORDER BY -cnt, domain) AS a
  FROM top
), der AS (
  SELECT
    len(a) AS sz,
    CAST(a[{_HILL_K + 1}].cnt AS DOUBLE) AS xk1,
    list_reduce(
      list_transform(a[1:{_HILL_K}],
        x -> ln(CAST(x.cnt AS DOUBLE)
                / CAST(a[{_HILL_K + 1}].cnt AS DOUBLE))),
      (acc, t) -> acc + t) AS s
  FROM arr
)
SELECT nd.n_domains,
  CAST({_HILL_K} AS BIGINT) AS k,
  CAST(CASE WHEN sz = {_HILL_K + 1} THEN xk1 END AS BIGINT) AS x_kplus1,
  round(CASE WHEN sz = {_HILL_K + 1}
        THEN s / {float(_HILL_K)!r} END, 6) AS hill_mean,
  round(CASE WHEN sz = {_HILL_K + 1} AND s > 0
        THEN 1.0 / (s / {float(_HILL_K)!r}) END, 6) AS alpha_hat
FROM der, nd
"""
)


@register("domain_tail_hill", _HILL_SQL)
def q_domain_tail_hill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill tail-index estimate over top-50 domain counts
    (operators/skew.py:domain_tail_hill)."""
    return skew.domain_tail_hill(_fact(spark, sf_dir), _HILL_K)
