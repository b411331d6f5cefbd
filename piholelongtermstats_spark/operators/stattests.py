"""Nonparametric statistical tests over event-stream aggregates —
the monitoring / data-drift tier (is volume trending? did the latency
distribution shift?), built on the engine's exact-integer
sufficient-statistic policy: every test statistic's numerator is
exact BIGINT arithmetic; at most one double division (plus one IEEE
sqrt, which is correctly rounded and therefore engine-identical)
produces the reported value.

- ``mann_kendall_trend`` — the Mann–Kendall trend test (Mann 1945,
  Kendall 1975): S = Σ_{i<j} sign(y_j − y_i) over the daily series,
  tie-corrected variance, normal-approximation Z. S and the 18·Var
  numerator are pure integers; the pairwise scan self-joins the tiny
  per-day relation (n(n−1)/2 pairs of DAYS, not events).
- ``ks_day_night`` — two-sample Kolmogorov–Smirnov statistic between
  the Day and Night reply-time samples: D = max_x |F_A(x) − F_B(x)|
  = max |cumA·nB − cumB·nA| / (nA·nB) — the numerator exact BIGINT
  over the merged value histogram (ECDF windows order DISTINCT
  metric values, never events — the quality_percentile_blend
  convention).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def mann_kendall_trend(fact: DataFrame) -> DataFrame:
    """(n_days, s_stat, var18_num, z) — Mann–Kendall over the daily
    count series.

    Var(S) = [n(n−1)(2n+5) − Σ_t t(t−1)(2t+5)] / 18 with t the tie
    group sizes of y; ``var18_num`` is that bracket, exact BIGINT.
    Z = (S ∓ 1)/sqrt(Var) (continuity-corrected, 0 when S = 0),
    rounded to 6 — the one fp step is a division and an IEEE sqrt,
    both correctly rounded, so the value is engine-identical.

    Scale: the fact collapses to one row per day; the pairwise sign
    scan is a self-join of the daily relation on date < date (at most
    |dates|²/2 rows — days, not events); ties aggregate per distinct
    y. Nothing touches event rows after the first partial agg.
    """
    daily = fact.groupBy("date").agg(F.count(F.lit(1)).alias("y"))
    a = daily.select(F.col("date").alias("d1"), F.col("y").alias("y1"))
    b = daily.select(F.col("date").alias("d2"), F.col("y").alias("y2"))
    s = (
        a.join(b, F.col("d1") < F.col("d2"))
        .agg(
            F.sum(F.signum(F.col("y2") - F.col("y1")).cast("long")).alias(
                "s_stat"
            )
        )
    )
    nn = daily.agg(F.count(F.lit(1)).cast("long").alias("n"))
    ties = (
        daily.groupBy("y")
        .agg(F.count(F.lit(1)).cast("long").alias("t"))
        .agg(
            F.sum(
                F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
            ).alias("tie_term")
        )
    )
    n = F.col("n")
    var18 = n * (n - 1) * (2 * n + 5) - F.coalesce(F.col("tie_term"), F.lit(0))
    s_ = F.col("s_stat")
    corrected = F.when(s_ > 0, s_ - 1).when(s_ < 0, s_ + 1).otherwise(F.lit(0))
    var = var18.cast("double") / 18.0
    z = F.when(
        (s_ == 0) | (var18 <= 0), F.lit(0.0)
    ).otherwise(corrected.cast("double") / F.sqrt(var))
    return (
        s.join(F.broadcast(nn))
        .join(F.broadcast(ties))
        .select(
            n.alias("n_days"),
            s_.alias("s_stat"),
            var18.alias("var18_num"),
            F.round(z, 6).alias("z"),
        )
    )


def ks_day_night(fact: DataFrame) -> DataFrame:
    """(n_day, n_night, d_num, d_stat) — two-sample KS statistic
    between Day and Night reply-time distributions.

    Merged-histogram formulation: per distinct reply value, per-sample
    counts; running sums over the DISTINCT-value relation give both
    ECDFs at every jump point; D's numerator max|cumA·nB − cumB·nA|
    is exact BIGINT, and d_stat = d_num/(nA·nB) is the one division.
    The unpartitioned windows order distinct metric values (the
    histogram-window class), never event rows.
    """
    m = fact.filter(F.col("reply_time").isNotNull()).select(
        "reply_time", "day_period"
    )
    hist = m.groupBy("reply_time").agg(
        F.count(F.when(F.col("day_period") == "Day", 1)).alias("ca"),
        F.count(F.when(F.col("day_period") == "Night", 1)).alias("cb"),
    )
    tot = hist.agg(
        F.sum("ca").cast("long").alias("na"),
        F.sum("cb").cast("long").alias("nb"),
    )
    w = Window.orderBy("reply_time").rowsBetween(Window.unboundedPreceding, 0)
    scanned = (
        hist.join(F.broadcast(tot))
        .withColumn("cuma", F.sum("ca").over(w))
        .withColumn("cumb", F.sum("cb").over(w))
        .withColumn(
            "dev",
            F.abs(F.col("cuma") * F.col("nb") - F.col("cumb") * F.col("na")),
        )
    )
    return scanned.agg(
        F.max("na").alias("n_day"),
        F.max("nb").alias("n_night"),
        F.max("dev").alias("d_num"),
        F.round(
            F.max("dev").cast("double")
            / F.when(
                F.max("na") * F.max("nb") != 0,
                (F.max("na") * F.max("nb")).cast("double"),
            ),
            6,
        ).alias("d_stat"),
    )
