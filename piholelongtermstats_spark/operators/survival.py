"""Client-lifetime survival analysis — the "how long do clients stay
active?" question a fleet dashboard answers above the retention
matrix (reference scope: the per-client first/last activity the
reference's stats surface exposes as most_persistent_client,
stats.py:268-281, promoted to the full right-censored estimator):

- ``kaplan_meier_clients`` — the Kaplan–Meier product-limit estimator
  over client lifetimes (days between first and last observed event),
  right-censored for clients still active near the window end.

Exactness policy: risk counts, event counts and censor counts are
exact BIGINTs from one histogram aggregation; the survival curve is
the ordered product Π(1 − dᵢ/nᵢ) folded LEFT-to-right with one IEEE
division + one multiply per step — the identical operand tree the
DuckDB recursive-CTE oracle replays, so the doubles match bit for
bit (the ewma/holt fold contract, operators/robust.py).

Scale: one groupBy(client) reduce (map-side combined), one histogram
over distinct lifetimes (≤ days in range — calendar-bounded), one
fold over that histogram in a single task. No windows over event or
client rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def kaplan_meier_clients(
    fact: DataFrame, censor_horizon_days: int = 7
) -> DataFrame:
    """Kaplan–Meier survival over client lifetimes:
    (t_days, n_risk, n_events, n_censored, surv) ordered by t_days.

    A client's lifetime is datediff(last event, first event) in days.
    The churn EVENT is observed when the client's last event is at
    least ``censor_horizon_days`` before the global window end;
    otherwise the lifetime is right-censored at its observed length
    (the client may still be active — the estimator must not count it
    as churned, only remove it from the risk set).

        n_risk(t) = #clients with lifetime ≥ t
        surv(t)   = Π_{u ≤ t} (n_risk(u) − d(u)) / n_risk(u)

    Censor-only times (d = 0) keep surv unchanged but are emitted —
    the standard KM table lists them so the risk-set drops are
    auditable.
    """
    # r12 restructure (guide §2.4): one LINEAR chain. The global
    # window end is max(last_d) over the per-client relation (the
    # same value as a second fact-wide max), the lifetime histogram
    # is aggregated once, and n_risk rides the SAME array fold that
    # already computes surv (running Σm instead of a window + a
    # broadcast total join) — identical arithmetic: n_risk(t) =
    # n_total − Σ_{u<t} m(u), and the surv factors multiply in the
    # same ascending-t order, so the fp chain is unchanged.
    per = fact.groupBy("client").agg(
        F.min("date").alias("first_d"), F.max("date").alias("last_d")
    )
    g_end = per.agg(F.max("last_d").alias("g_end"))
    life = per.join(F.broadcast(g_end)).select(
        F.datediff("last_d", "first_d").cast("long").alias("t"),
        (
            F.datediff("g_end", "last_d") >= F.lit(censor_horizon_days)
        ).cast("int").alias("observed"),
    )
    hist = life.groupBy("t").agg(
        F.sum("observed").cast("long").alias("d"),
        F.sum(F.lit(1) - F.col("observed")).cast("long").alias("c"),
        F.count(F.lit(1)).cast("long").alias("m"),
    )
    xs = hist.agg(
        F.array_sort(
            F.collect_list(F.struct("t", "d", "c", "m"))
        ).alias("xs")
    ).select(
        "xs",
        F.aggregate(
            "xs",
            F.lit(0).cast("long"),
            lambda a, x: a + x["m"],
        ).alias("n_total"),
    )
    acc0 = F.expr(
        "CAST(named_struct('cum', CAST(0 AS BIGINT), 'arr', array()) AS "
        "struct<cum:bigint,arr:array<struct<"
        "t:bigint,n_risk:bigint,d:bigint,c:bigint,surv:double>>>)"
    )

    def step(acc, x):
        n_risk = (F.col("n_total") - acc["cum"]).cast("long")
        return F.struct(
            (acc["cum"] + x["m"]).alias("cum"),
            F.concat(
                acc["arr"],
                F.array(
                    F.struct(
                        x["t"].alias("t"),
                        n_risk.alias("n_risk"),
                        x["d"].alias("d"),
                        x["c"].alias("c"),
                        (
                            F.when(
                                F.size(acc["arr"]) == 0, F.lit(1.0)
                            ).otherwise(F.element_at(acc["arr"], -1)["surv"])
                            * (
                                (n_risk - x["d"]).cast("double")
                                / n_risk.cast("double")
                            )
                        ).alias("surv"),
                    )
                ),
            ).alias("arr"),
        )

    return (
        xs.select(
            F.explode(
                F.aggregate("xs", acc0, step, lambda acc: acc["arr"])
            ).alias("e")
        )
        .select(
            F.col("e.t").alias("t_days"),
            F.col("e.n_risk").alias("n_risk"),
            F.col("e.d").alias("n_events"),
            F.col("e.c").alias("n_censored"),
            F.round("e.surv", 6).alias("surv"),
        )
    )  # (terminal cosmetic sort dropped, r12 guide §2.4 — checkers are order-insensitive)
