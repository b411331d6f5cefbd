"""M57 — the auditable sketch:

- ``hll_distinct_audit`` — HyperLogLog implemented in relational
  primitives (md5 registers, bin() bit-length ranks, ordered fold of
  the indicator) next to the exact COUNT DISTINCT: every register and
  the estimate replay bit-for-bit in the DuckDB oracle. The approx
  tier's answer to "why trust a sketch": don't — hash-check it.

DuckDB-oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from piholelongtermstats_spark.operators import approx
from piholelongtermstats_spark.plans.registry import _fact, register
from piholelongtermstats_spark.sources.events import FACT_CTE

_HLL_SQL = (
    FACT_CTE.replace("WITH fact AS", "WITH RECURSIVE fact AS", 1)
    + """
, regs AS (
  SELECT h % 64 AS reg, h // 64 AS w FROM (
    SELECT ('0x' || substr(md5(client), 1, 15))::BIGINT AS h FROM fact)
), mreg AS (
  SELECT reg,
    CAST(max(CASE WHEN w = 0 THEN 55
             ELSE 55 - length(bin(w)) END) AS BIGINT) AS mj
  FROM regs GROUP BY reg
), filled AS (
  SELECT CAST(s.range AS BIGINT) AS reg,
         CAST(coalesce(mreg.mj, 0) AS BIGINT) AS mj
  FROM range(64) s LEFT JOIN mreg ON mreg.reg = s.range
), folded AS (
  -- register-ordered LEFT FOLD of Z = sum 2^(-M_j): powers of two
  -- are exact doubles but their 64-term SUM is not associative past
  -- 53 bits, so the order is pinned (the chi2-drift fold contract)
  WITH RECURSIVE f(i, acc) AS (
    SELECT CAST(-1 AS BIGINT), CAST(0.0 AS DOUBLE)
    UNION ALL
    SELECT f.i + 1,
           f.acc + power(0.5, (SELECT mj FROM filled
                               WHERE reg = f.i + 1))
    FROM f WHERE f.i + 1 < 64
  )
  SELECT acc AS z FROM f WHERE i = 63
), vz AS (
  SELECT CAST(sum(CAST(mj = 0 AS BIGINT)) AS BIGINT) AS v_zero
  FROM filled
), ex AS (
  SELECT CAST(count(DISTINCT client) AS BIGINT) AS n_exact FROM fact
), e AS (
  SELECT CASE WHEN (CAST(0.709 AS DOUBLE) * CAST(4096.0 AS DOUBLE) / z)
                   <= CAST(160.0 AS DOUBLE)
               AND v_zero > 0
         THEN CAST(64.0 AS DOUBLE)
              * ln(CAST(64.0 AS DOUBLE) / CAST(v_zero AS DOUBLE))
         ELSE CAST(0.709 AS DOUBLE) * CAST(4096.0 AS DOUBLE) / z
         END AS est,
         v_zero
  FROM folded, vz
)
SELECT ex.n_exact, CAST(64 AS BIGINT) AS m_registers, e.v_zero,
  round(e.est, 6) AS est,
  CASE WHEN ex.n_exact > 0 THEN
    CAST(round(abs(e.est - CAST(ex.n_exact AS DOUBLE))
               / CAST(ex.n_exact AS DOUBLE) * 1000000.0) AS BIGINT)
  END AS abs_err_ppm
FROM e, ex
"""
)


@register("hll_distinct_audit", _HLL_SQL)
def q_hll_distinct_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-principles HLL vs exact distinct clients
    (operators/approx.py)."""
    return approx.hll_distinct_audit(_fact(spark, sf_dir), "client")
