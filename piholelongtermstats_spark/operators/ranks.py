"""SQL rank-function surface over the client activity relation —
ntile / percent_rank / cume_dist in one audited table (the shapes a
BI layer generates constantly; SURVEY §2.6's W-family widened to the
full ANSI rank set).

Determinism: the window's total order is (cnt DESC, client) — unique
— so ntile bucket assignment (standard SQL: ⌊n/k⌋+1-sized buckets
first), percent_rank = (rank−1)/(n−1) and cume_dist = peers≤/n are
all engine-identical; the two divisions are the only fp and they are
single IEEE ops over exact integers.

Scale: the window orders the CLIENT relation (distinct clients after
one map-side-combined count agg) — key-cardinality rows, not events.
A billion-client deployment would range-partition the rank (the
source_token_caps two-level prefix-sum pattern); at dashboard
cardinalities the single ordered window is the right plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def client_rank_metrics(fact: DataFrame, buckets: int = 4) -> DataFrame:
    """(client, cnt, quartile, pct_rank, cume) — full rank-function
    panel over per-client query counts."""
    per = fact.groupBy("client").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    w = Window.orderBy(F.col("cnt").desc(), F.col("client").asc())
    return per.select(
        "client",
        "cnt",
        F.ntile(buckets).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )
