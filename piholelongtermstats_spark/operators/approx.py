"""Approximate aggregates — the constant-space scale variants.

The reference computes exact distinct counts (stats.py:422-434) and
no quantiles at all; its tests assert exact values, so the ORACLE
queries stay exact (`uniques`, `most_diverse_client`). These
operators are the 100 TB alternatives:

- `uniques_approx`: HyperLogLog++ (`approx_count_distinct`) — the
  exact COUNT DISTINCT shuffles every distinct value; HLL shuffles a
  fixed ~few-KB sketch per partition. rsd=0.01 ⇒ ~1% error for ~6 KB
  of state, mergeable across any partitioning.
- `reply_time_quantiles`: Greenwald-Khanna `approx_percentile` —
  single pass, bounded memory, mergeable; an exact distributed
  quantile needs a full sort or multi-pass selection.

Both are registered rows-only (sketch internals are not portable
SQL); tests bound their error against the exact answers instead —
the honest check for approximate operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def uniques_approx(fact: DataFrame, rsd: float = 0.01) -> DataFrame:
    return fact.agg(
        F.approx_count_distinct("domain", rsd).alias("unique_domains_approx"),
        F.approx_count_distinct("client", rsd).alias("unique_clients_approx"),
    )


def reply_time_quantiles(fact: DataFrame, accuracy: int = 10000) -> DataFrame:
    """p50/p90/p99/p999 of |reply_time| in ms."""
    a = F.abs(F.col("reply_time"))
    qs = F.percentile_approx(a, [0.5, 0.9, 0.99, 0.999], accuracy)
    return fact.agg(
        F.round(qs[0] * 1000, 3).alias("p50_ms"),
        F.round(qs[1] * 1000, 3).alias("p90_ms"),
        F.round(qs[2] * 1000, 3).alias("p99_ms"),
        F.round(qs[3] * 1000, 3).alias("p999_ms"),
    )


def exact_group_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    probs: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """EXACT per-group quantiles by nearest rank over a VALUE
    HISTOGRAM — the oracle-checkable exact member of the quantile
    family (contrast `reply_time_quantiles`' GK sketch: bounded
    memory, but sketch internals aren't portable SQL).

    Nearest-rank definition (engine-independent, no interpolation
    fp): q_p = the smallest value whose cumulative count ≥
    ceil(p·n). The windows order DISTINCT VALUES per group — the
    same trick as corpus.source_data_card's median: one partial-agg
    shuffle for the histogram, cumulative sums over |distinct
    values| rows, never a per-group sort of the raw relation. At
    100 TB a quasi-continuous metric is first quantized to fixed
    precision (e.g. µs) to bound histogram cardinality — here reply
    times already repeat (measured 5.6× compression at sf0.1).
    NULLs are excluded (SQL aggregate semantics)."""
    from pyspark.sql import Window

    hist = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(group_col, value_col)
        .agg(F.count("*").alias("cnt"))
    )
    ws = Window.partitionBy(group_col)
    wc = ws.orderBy(value_col).rowsBetween(Window.unboundedPreceding, 0)
    h = hist.withColumn("cum", F.sum("cnt").over(wc)).withColumn(
        "n", F.sum("cnt").over(ws)
    )
    aggs = [F.sum("cnt").alias("n_rows")]
    for p in probs:
        tag = ("p%g" % (p * 100)).replace(".", "_")
        aggs.append(
            F.min(
                F.when(
                    F.col("cum") >= F.ceil(F.lit(p) * F.col("n")),
                    F.col(value_col),
                )
            ).alias(tag)
        )
    return h.groupBy(group_col).agg(*aggs).orderBy(group_col)
