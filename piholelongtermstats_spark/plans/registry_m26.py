"""M26 — sliding-window wave: the overlapping event-time window
class, batch-twin oracle-checked (the streaming side of the same
aggregation is pinned stream==batch by tests/test_streaming_sliding).

- ``sliding_window_busiest`` — top-10 busiest (client, 30-min window
  sliding every 5 min) cells; the oracle materializes Spark's
  epoch-aligned window-assignment rule (6 grid slots per event)
  explicitly in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from piholelongtermstats_spark.plans.registry import _fact, register
from piholelongtermstats_spark.sources.events import FACT_CTE
from piholelongtermstats_spark.streaming.sliding import sliding_busiest

_SLIDING_SQL = (
    FACT_CTE
    + """
, slots AS (
  SELECT client,
         make_timestamp(
           (epoch_us(ts) // 300000000) * 300000000 - k.k * 300000000
         ) AS window_start
  FROM fact CROSS JOIN (VALUES (0),(1),(2),(3),(4),(5)) k(k)
), cells AS (
  SELECT client, window_start, CAST(count(*) AS BIGINT) AS cnt
  FROM slots GROUP BY client, window_start
)
SELECT client, window_start, cnt
FROM cells
ORDER BY cnt DESC, client ASC, window_start ASC
LIMIT 10
"""
)


@register("sliding_window_busiest", _SLIDING_SQL)
def q_sliding_window_busiest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Busiest overlapping 30-min/5-min (client, window) cells
    (streaming/sliding.py — same plan streams under a watermark)."""
    return sliding_busiest(_fact(spark, sf_dir), k=10)
