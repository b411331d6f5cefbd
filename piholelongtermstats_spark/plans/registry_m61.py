"""M61 — head-drift audit (oracle-checked):

``topk_domain_stability`` — set-stability of the top-10 domains
between the two halves of the date range; pinned (cnt DESC, domain
ASC) tie-break, integer Jaccard ppm, one-row-on-empty contract.

(The wave's first draft also added a one-row Benford panel — and the
new register() duplicate guard below exists because that draft
silently OVERWROTE the M23 ``benford_reply_digits``, the richer 9-row
per-digit audit that has been oracle-green since r8. The M23 entry is
restored; duplicate registration now raises at import time.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from piholelongtermstats_spark.operators import anomaly
from piholelongtermstats_spark.plans.registry import FACT_CTE, _fact, register

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
