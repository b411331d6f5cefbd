"""M33 — streaming stateful recurrence + its batch twin:

- ``client_ewma_daily`` — per-client EWMA over the (client, day)
  count relation (operators/robust.ewma_by_client): one grouped
  catalyst fold per client; the oracle replays the recurrence as a
  per-client recursive CTE with the identical IEEE step. This is the
  BATCH TWIN of streaming/ewma.streaming_client_ewma (custom
  applyInPandasWithState recurrence); stream ≡ batch is pinned
  bit-for-bit on shared files in tests/test_streaming_ewma.py, so
  this driver-checkable entry extends to the streaming operator's
  result contract (the conversion_attribution pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from piholelongtermstats_spark.operators import robust
from piholelongtermstats_spark.plans.registry import _fact, register
from piholelongtermstats_spark.sources.events import FACT_CTE

_CLIENT_EWMA_SQL = (
    FACT_CTE.replace("WITH fact AS", "WITH RECURSIVE fact AS", 1)
    + """
, daily AS (
  SELECT client, date, CAST(count(*) AS BIGINT) AS y
  FROM fact GROUP BY 1, 2
)
, seq AS (
  SELECT client, date, y,
         row_number() OVER (PARTITION BY client ORDER BY date) AS r
  FROM daily
)
, rec AS (
  SELECT client, r, date, y, CAST(y AS DOUBLE) AS e FROM seq WHERE r = 1
  UNION ALL
  SELECT s.client, s.r, s.date, s.y,
         0.3 * CAST(s.y AS DOUBLE) + 0.7 * rec.e
  FROM seq s JOIN rec ON s.client = rec.client AND s.r = rec.r + 1
)
SELECT client, date, y, round(e, 6) AS ewma FROM rec
"""
)


@register("client_ewma_daily", _CLIENT_EWMA_SQL)
def q_client_ewma_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-client EWMA(α=0.3) of daily counts — grouped catalyst fold
    vs per-client recursive CTE (operators/robust.py)."""
    daily = (
        _fact(spark, sf_dir)
        .groupBy("client", "date")
        .agg(F.count(F.lit(1)).cast("long").alias("y"))
    )
    return robust.ewma_by_client(daily, alpha=0.3)
