"""M61 — data-forensics audits (both oracle-checked):

- ``benford_reply_digits`` — Benford first-digit χ² over the positive
  quantized reply times (fabricated-data / instrumentation-bug
  audit). No per-row logarithm anywhere: digits come from the decimal
  STRING of the exact integer grid value, and the Benford masses are
  driver-computed literals (the plane_signs discipline).
- ``topk_domain_stability`` — set-stability of the top-10 domains
  between the two halves of the date range (head-drift audit);
  pinned (cnt DESC, domain ASC) tie-break, integer Jaccard ppm.

Oracle SQL generated to mirror the Column chains (the M59 protocol).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession

from piholelongtermstats_spark.operators import anomaly, dq
from piholelongtermstats_spark.plans.registry import FACT_CTE, _fact, register

# ---------------------------------------------------------------------------
# benford_reply_digits
# ---------------------------------------------------------------------------


def _benford_sql() -> str:
    os_ = ",\n    ".join(
        f"CAST(count(*) FILTER (WHERE d = '{d}') AS BIGINT) AS o{d}"
        for d in range(1, 10)
    )
    e = {
        d: f"CAST(n_pos AS DOUBLE) * ({math.log10(1.0 + 1.0 / d)!r})"
        for d in range(1, 10)
    }
    diff = {d: f"(CAST(o{d} AS DOUBLE) - {e[d]})" for d in range(1, 10)}
    chain = "0.0"
    for d in range(1, 10):
        chain += f" + {diff[d]} * {diff[d]} / ({e[d]})"
    gmax = "greatest(" + ", ".join(f"abs({diff[d]})" for d in range(1, 10)) + ")"
    worst = (
        "CASE "
        + " ".join(
            f"WHEN abs({diff[d]}) = {gmax} THEN {d}" for d in range(1, 10)
        )
        + " END"
    )
    return (
        FACT_CTE
        + f"""
, pos AS (
  SELECT substr(CAST(CAST(round(reply_time * 1000) AS BIGINT) AS VARCHAR),
                1, 1) AS d
  FROM fact
  WHERE reply_time IS NOT NULL
    AND CAST(round(reply_time * 1000) AS BIGINT) > 0
), agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_pos,
    {os_}
  FROM pos
)
SELECT n_pos, {", ".join(f"o{d}" for d in range(1, 10))},
  round(CASE WHEN n_pos > 0 THEN {chain} END, 6) AS chi2,
  CAST(CASE WHEN n_pos > 0 THEN {worst} END AS BIGINT) AS worst_digit,
  round(CASE WHEN n_pos > 0 THEN {gmax} END, 6) AS worst_abs_dev
FROM agg
"""
    )


@register("benford_reply_digits", _benford_sql())
def q_benford_reply_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit χ² over positive quantized reply times
    (operators/dq.py:benford_reply_digits)."""
    return dq.benford_reply_digits(_fact(spark, sf_dir))


# ---------------------------------------------------------------------------
# topk_domain_stability
# ---------------------------------------------------------------------------

_TK_K = 10

_TK_SQL = (
    FACT_CTE
    + f"""
, b AS (SELECT min(date) AS d0, max(date) AS d1 FROM fact),
h1 AS (
  SELECT domain FROM (
    SELECT domain, CAST(count(*) AS BIGINT) AS cnt
    FROM fact, b
    WHERE date < d0 + to_days(CAST(date_diff('day', d0, d1) // 2
                                   AS INTEGER))
    GROUP BY domain ORDER BY cnt DESC, domain LIMIT {_TK_K})
),
h2 AS (
  SELECT domain FROM (
    SELECT domain, CAST(count(*) AS BIGINT) AS cnt
    FROM fact, b
    WHERE date >= d0 + to_days(CAST(date_diff('day', d0, d1) // 2
                                    AS INTEGER))
    GROUP BY domain ORDER BY cnt DESC, domain LIMIT {_TK_K})
),
s AS (
  SELECT (SELECT CAST(count(*) AS BIGINT) FROM h1) AS n_first,
         (SELECT CAST(count(*) AS BIGINT) FROM h2) AS n_second,
         (SELECT CAST(count(*) AS BIGINT) FROM h1
          WHERE domain IN (SELECT domain FROM h2)) AS n_common
)
SELECT CAST({_TK_K} AS BIGINT) AS k, n_first, n_second, n_common,
  CASE WHEN n_first + n_second - n_common > 0 THEN
    n_common * 1000000 // (n_first + n_second - n_common) END
  AS jaccard_ppm
FROM s
"""
)


@register("topk_domain_stability", _TK_SQL)
def q_topk_domain_stability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 domain set stability between date-range halves
    (operators/anomaly.py:topk_domain_stability)."""
    return anomaly.topk_domain_stability(_fact(spark, sf_dir), _TK_K)
