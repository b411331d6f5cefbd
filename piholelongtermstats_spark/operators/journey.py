"""User-journey analytics over the RAW event stream — the funnel and
cohort shapes every product-analytics warehouse runs (and the
reference's event log supports but its dashboard never asks):

- ``funnel_conversion`` — strictly-ordered step funnel
  (view → click → purchase by default): how many users reach each
  stage, where each stage's event must occur strictly AFTER the
  user's previous-stage anchor (the classic "ordered funnel"
  semantics, not mere per-type presence).
- ``cohort_retention`` — first-seen cohort × day-offset retention
  matrix: of the clients first seen on day c, what fraction was
  active again d days later.

Exactness: counts are exact integers; every rate is one integer
FLOOR division (ppm). Funnel tie rule: a step chains only if its
timestamp is STRICTLY greater than the previous anchor — two events
in the same microsecond do not chain (pinned, engine-identical).

Scale: the funnel is S sequential keyed min-aggregations + joins on
user_id (each a hash join on the user key, no windows over events);
retention is two keyed aggs and one (cohort, offset) rollup. Nothing
orders event rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_STEPS = ("view", "click", "purchase")


def funnel_conversion(
    raw: DataFrame, steps: tuple = DEFAULT_STEPS
) -> DataFrame:
    """One row: (n_users, n_step1.., conv_1_2_ppm, conv_2_3_ppm,
    conv_1_3_ppm) for the strictly-ordered funnel over ``steps``.

    ``raw`` needs (user_id, event_type, ts). Per user the stage-s
    anchor is the EARLIEST step-s event strictly after the stage-s−1
    anchor; greedy-earliest anchoring is optimal for existence ("if
    any chain exists, the earliest-anchor chain exists"), so the
    reached-stage counts are well-defined.
    """
    total = raw.agg(
        F.count_distinct(F.col("user_id")).cast("long").alias("n_users")
    )
    anchored = None
    counts = []
    for i, step in enumerate(steps):
        ev = raw.filter(F.col("event_type") == step).select("user_id", "ts")
        if anchored is None:
            anchored = ev.groupBy("user_id").agg(F.min("ts").alias("t"))
        else:
            anchored = (
                ev.join(
                    anchored.select("user_id", F.col("t").alias("t_prev")),
                    "user_id",
                )
                .filter(F.col("ts") > F.col("t_prev"))
                .groupBy("user_id")
                .agg(F.min("ts").alias("t"))
            )
        counts.append(
            anchored.agg(
                F.count(F.lit(1)).cast("long").alias(f"n_step{i + 1}")
            )
        )
    out = total
    for c in counts:
        out = out.crossJoin(F.broadcast(c))
    return out.select(
        "n_users",
        *[f"n_step{i + 1}" for i in range(len(steps))],
        F.expr(
            "CAST(CASE WHEN n_step1 > 0 THEN n_step2 * 1000000 DIV n_step1 END AS BIGINT)"
        ).alias("conv_1_2_ppm"),
        F.expr(
            "CAST(CASE WHEN n_step2 > 0 THEN n_step3 * 1000000 DIV n_step2 END AS BIGINT)"
        ).alias("conv_2_3_ppm"),
        F.expr(
            "CAST(CASE WHEN n_step1 > 0 THEN n_step3 * 1000000 DIV n_step1 END AS BIGINT)"
        ).alias("conv_1_3_ppm"),
    )


def cohort_retention(fact: DataFrame, max_offset: int = 13) -> DataFrame:
    """(cohort_date, day_offset, n_cohort, n_active, retention_ppm)
    for offsets 0..``max_offset``: of the clients FIRST seen on
    cohort_date, how many were active again day_offset days later.

    Offset 0 is the cohort size itself (retention 10⁶ by definition —
    kept as the self-check row). Ordered by (cohort_date, day_offset).

    Scale: client first-seen = one keyed min agg; activity = distinct
    (client, date); the rollup keys on (cohort, offset) — day²-sized
    output at any event volume.
    """
    # Fan-out left to AQE exchange reuse (r12): an eager checkpoint of
    # activity was measured slower here — both consumers hash on the
    # same distinct exchange, which AQE already reuses.
    activity = fact.select("client", "date").distinct()
    cohorts = activity.groupBy("client").agg(F.min("date").alias("cohort_date"))
    sizes = cohorts.groupBy("cohort_date").agg(
        F.count(F.lit(1)).cast("long").alias("n_cohort")
    )
    joined = activity.join(cohorts, "client").select(
        "cohort_date",
        F.datediff("date", "cohort_date").cast("long").alias("day_offset"),
        "client",
    )
    active = (
        joined.filter(F.col("day_offset") <= max_offset)
        .groupBy("cohort_date", "day_offset")
        .agg(F.count(F.lit(1)).cast("long").alias("n_active"))
    )
    return (
        active.join(F.broadcast(sizes), "cohort_date")
        .select(
            "cohort_date",
            "day_offset",
            "n_cohort",
            "n_active",
            F.expr("CAST(n_active * 1000000 DIV n_cohort AS BIGINT)").alias(
                "retention_ppm"
            ),
        )
    )  # (terminal cosmetic sort dropped, r12 guide §2.4 — checkers are order-insensitive)


def growth_accounting_daily(fact: DataFrame) -> DataFrame:
    """Per-day growth accounting of the client base — the canonical
    NEW / RETAINED / RESURRECTED / CHURNED decomposition (the
    "growth accounting" identity: DAU_t = new_t + retained_t +
    resurrected_t, and DAU_t − DAU_{t−1} = new_t + resurrected_t −
    churned_t):

      new         — first day the client is ever seen
      retained    — active today AND active yesterday
      resurrected — active today, seen before, but not yesterday
      churned     — active YESTERDAY and not today (attributed to
                    today, the day the loss is observed)

    All four are exact counts from the distinct (client, date)
    activity relation: first-seen via one keyed min, yesterday-active
    via a self-equi-join on (client, date−1) — no windows over
    events, no per-client ordering; the day spine left-joins so
    zero-activity days still report their churn.

    Identity tests pin: dau = new + retained + resurrected, and
    Σnew = distinct clients (every client is new exactly once).
    """
    # Fan-out left to AQE exchange reuse (r12): an eager checkpoint of
    # activity was measured slower here despite five consumers — they
    # all reuse the distinct's exchange.
    activity = fact.select("client", "date").distinct()
    first = activity.groupBy("client").agg(F.min("date").alias("first_date"))
    a = activity.join(first, "client")
    y = activity.select(
        "client", F.date_add(F.col("date"), 1).cast("timestamp").alias("date")
    )
    flags = a.join(
        y.withColumn("_y", F.lit(1)), ["client", "date"], "left"
    ).select(
        "date",
        F.when(F.col("date") == F.col("first_date"), 1)
        .otherwise(0)
        .alias("is_new"),
        F.when(
            (F.col("date") != F.col("first_date")) & F.col("_y").isNotNull(), 1
        )
        .otherwise(0)
        .alias("is_ret"),
        F.when(
            (F.col("date") != F.col("first_date")) & F.col("_y").isNull(), 1
        )
        .otherwise(0)
        .alias("is_res"),
    )
    per = flags.groupBy("date").agg(
        F.count(F.lit(1)).cast("long").alias("dau"),
        F.sum("is_new").cast("long").alias("new_clients"),
        F.sum("is_ret").cast("long").alias("retained"),
        F.sum("is_res").cast("long").alias("resurrected"),
    )
    churn = (
        y.join(activity.withColumn("_t", F.lit(1)), ["client", "date"], "left")
        .filter(F.col("_t").isNull())
        .groupBy("date")
        .agg(F.count(F.lit(1)).cast("long").alias("churned"))
    )
    # day spine over [min, max] observed dates: a zero-activity day
    # inside the range still reports its churn (and zero DAU); churn
    # attributed past the horizon (last day's actives) is out of range
    # by construction and excluded
    spine = activity.agg(
        F.min("date").alias("lo"), F.max("date").alias("hi")
    ).select(
        F.explode(
            F.sequence(F.col("lo"), F.col("hi"), F.expr("INTERVAL 1 DAY"))
        ).alias("date")
    )
    return (
        spine.join(F.broadcast(per), "date", "left")
        .join(F.broadcast(churn), "date", "left")
        .select(
            "date",
            F.coalesce(F.col("dau"), F.lit(0)).alias("dau"),
            F.coalesce(F.col("new_clients"), F.lit(0)).alias("new_clients"),
            F.coalesce(F.col("retained"), F.lit(0)).alias("retained"),
            F.coalesce(F.col("resurrected"), F.lit(0)).alias("resurrected"),
            F.coalesce(F.col("churned"), F.lit(0)).alias("churned"),
        )
    )  # (terminal cosmetic sort dropped, r12 guide §2.4 — checkers are order-insensitive)


def funnel_windowed(
    raw: DataFrame,
    steps: tuple = DEFAULT_STEPS,
    within_minutes: int = 30,
) -> DataFrame:
    """``funnel_conversion`` with a per-step TIME BUDGET — the
    production variant: a click only counts if it lands within
    ``within_minutes`` of the view anchor, a purchase within the same
    budget of the click anchor (strictly after, at most the budget
    later). Output schema matches funnel_conversion so the two rates
    are directly comparable; the unwindowed funnel is the
    within → ∞ limit (test-pinned: windowed counts ≤ unwindowed, and
    a huge budget reproduces funnel_conversion exactly).

    Same greedy-earliest anchoring: for the EXISTENCE question the
    earliest in-budget anchor is optimal stage-by-stage under a fixed
    per-step budget (an earlier anchor can only widen the next
    step's admissible interval start... the budget windows shift with
    the anchor, so greedy is pinned as the DEFINED semantics — the
    industry-standard "first touch" rule — rather than argued
    optimal).

    Scale: identical shape to funnel_conversion — S keyed min-aggs +
    user-key hash joins; the budget is a filter, never a window.
    """
    total = raw.agg(
        F.count_distinct(F.col("user_id")).cast("long").alias("n_users")
    )
    budget = F.expr(f"INTERVAL {int(within_minutes)} MINUTES")
    anchored = None
    counts = []
    for i, step in enumerate(steps):
        ev = raw.filter(F.col("event_type") == step).select("user_id", "ts")
        if anchored is None:
            anchored = ev.groupBy("user_id").agg(F.min("ts").alias("t"))
        else:
            anchored = (
                ev.join(
                    anchored.select("user_id", F.col("t").alias("t_prev")),
                    "user_id",
                )
                .filter(
                    (F.col("ts") > F.col("t_prev"))
                    & (F.col("ts") <= F.col("t_prev") + budget)
                )
                .groupBy("user_id")
                .agg(F.min("ts").alias("t"))
            )
        counts.append(
            anchored.agg(
                F.count(F.lit(1)).cast("long").alias(f"n_step{i + 1}")
            )
        )
    out = total
    for c in counts:
        out = out.crossJoin(F.broadcast(c))
    return out.select(
        "n_users",
        *[f"n_step{i + 1}" for i in range(len(steps))],
        F.expr(
            "CAST(CASE WHEN n_step1 > 0 THEN n_step2 * 1000000 DIV n_step1 END AS BIGINT)"
        ).alias("conv_1_2_ppm"),
        F.expr(
            "CAST(CASE WHEN n_step2 > 0 THEN n_step3 * 1000000 DIV n_step2 END AS BIGINT)"
        ).alias("conv_2_3_ppm"),
        F.expr(
            "CAST(CASE WHEN n_step1 > 0 THEN n_step3 * 1000000 DIV n_step1 END AS BIGINT)"
        ).alias("conv_1_3_ppm"),
    )
