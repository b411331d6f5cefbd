"""Novelty and anomaly detection over the DNS fact table.

Beyond-reference analytics tier: the two questions an operator of a
100 TB query log actually asks of it — "what did we see today that we
have NEVER seen before?" (new-domain novelty series) and "which
client-days are statistical outliers against that client's own
history?" (per-client volume spikes).

Scale notes are per-function; the common discipline is the repo-wide
fp policy: every DECISION (which rows qualify) is exact integer /
decimal arithmetic, fp appears only in displayed values that both
engines compute with the identical expression tree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def first_seen_domains(fact: DataFrame) -> DataFrame:
    """Per-day count of domains seen for the FIRST time that day.

    Shape: one groupBy(domain) with map-side combine (min(date) is a
    partial-aggregable function — each partition contributes one row
    per local domain), then a tiny groupBy(date). The first shuffle
    carries one row per distinct domain, which is the information-
    theoretic minimum for a first-seen computation; nothing is
    windowed, nothing is sorted globally.
    """
    return (
        fact.groupBy("domain")
        .agg(F.min("date").alias("first_date"))
        .groupBy(F.col("first_date").alias("date"))
        .agg(F.count(F.lit(1)).alias("new_domains"))
        .orderBy("date")
    )


def client_daily_spikes(fact: DataFrame, z: int = 3, min_days: int = 3) -> DataFrame:
    """Client-days whose query count exceeds the client's own mean by
    more than ``z`` sample standard deviations — with an EXACT gate.

    ``z > (x-μ)/σ`` over μ = s1/n, σ² = (s2 - s1²/n)/(n-1) is fp-free
    after cross-multiplying by n²(n-1) > 0:

        (n·x - s1)² · (n-1)  >  z² · (n·s2 - s1²) · n      and  n·x > s1

    All factors are integers; they are carried as DECIMAL so the gate
    stays exact far past int64 (n ≤ ~3.7k days, x up to ~1e9/day keeps
    every product < 1e30 « 1e38). The displayed ``avg_cnt`` is the one
    fp value and is a single correctly-rounded division, identical in
    both engines.

    Shape: groupBy(client, date) with map-side combine, then windows
    partitioned by client over the DAILY relation — at most a few
    thousand rows per client regardless of input volume, so no
    partition can outgrow an executor and there is no global sort.
    """
    daily = fact.groupBy("client", "date").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("client")
    x = F.col("cnt").cast("decimal(19,0)")
    stats = daily.select(
        "client",
        "date",
        "cnt",
        F.count(F.lit(1)).over(w).cast("decimal(19,0)").alias("n"),
        F.sum(x).over(w).alias("s1"),
        F.sum(x * x).over(w).alias("s2"),
    )
    n, s1, s2 = F.col("n"), F.col("s1"), F.col("s2")
    a = n * x - s1  # n·(x - μ), exact
    spike = (
        (n >= min_days)
        & (n * x > s1)
        & (a * a * (n - 1) > F.lit(z * z) * (n * s2 - s1 * s1) * n)
    )
    return (
        stats.filter(spike)
        .select(
            "client",
            "date",
            "cnt",
            n.cast("long").alias("n_days"),
            F.round(s1.cast("double") / n.cast("double"), 6).alias("avg_cnt"),
        )
        .orderBy("client", "date")
    )
