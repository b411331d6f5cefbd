"""Market-basket association rules over (client, day) domain baskets
— the Apriori pair-candidate tier (support / confidence / lift) as a
distributed self-join, the co-visitation analysis recommender and
security pipelines run over DNS/event logs.

fp policy: support counts are exact integers; the lift>1 decision is
CROSS-MULTIPLIED (n_baskets · cnt_ab > cnt_a · cnt_b — all BIGINT) so
rule membership never touches a float; confidence and lift values are
each ONE double division of exact integers, rounded to 6 identically
in both engines.

Scale shape at 100 TB: baskets come from one DISTINCT shuffle on
(client, date, domain); the pair generator self-joins baskets on the
basket key — co-partitioned, so pairs materialize basket-locally and
the output is Σ |basket|² bounded by ``basket_cap`` (oversized
baskets are DROPPED ENTIRELY first, the df_cap recall-trade pattern:
a 10⁵-domain scanner basket would otherwise emit 10¹⁰ pairs); item
and pair supports are partial-agg shuffles on domain keys; the global
basket count is a 1-row broadcast. No window, no driver loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def domain_association_rules(
    fact: DataFrame,
    min_support: int = 5,
    top_k: int = 25,
    basket_cap: int = 64,
) -> DataFrame:
    """Top-K domain pairs by co-occurrence across (client, day)
    baskets: (domain_a < domain_b, cnt_ab, cnt_a, cnt_b, conf_ab,
    lift, lift_gt1), cnt_ab >= min_support, pinned total order
    (cnt_ab DESC, domain_a, domain_b).

    All supports are counted over the CAPPED basket universe
    (baskets with more than ``basket_cap`` distinct domains are
    excluded from items, pairs, and the basket total alike) so
    support/confidence/lift stay mutually consistent.
    """
    # ONE map-side-combined aggregation builds the basket arrays:
    # collect_set dedups (client, date, domain) inside the aggregation
    # buffer, so the raw projection shuffles once (partial aggregation
    # collapses each map task to one row per basket) and the former
    # distinct → window → self-join chain — which paid a second full
    # shuffle for the window and a join for pair generation — becomes
    # basket-local array arithmetic (guide §2.3 "aggregate before you
    # shuffle" / §2.4). The three consumers (basket total, items,
    # pairs) hang off the SAME (client, date) exchange, served via
    # ReusedExchange; supports, pair counts and the capped universe
    # are value-identical (a set explode enumerates exactly the
    # distinct (basket, domain) rows the old distinct produced).
    kept = (
        fact.select("client", "date", "domain")
        .groupBy("client", "date")
        .agg(F.collect_set("domain").alias("ds"))
        .filter(F.size("ds") <= basket_cap)
    )
    n_baskets = kept.agg(F.count(F.lit(1)).alias("n_baskets"))
    items = (
        kept.select(F.explode("ds").alias("domain"))
        .groupBy("domain")
        .agg(F.count(F.lit(1)).alias("item_cnt"))
    )
    pairs = (
        kept.select(F.explode("ds").alias("domain_a"), "ds")
        .select("domain_a", F.explode("ds").alias("domain_b"))
        .filter(F.col("domain_a") < F.col("domain_b"))
        .groupBy("domain_a", "domain_b")
        .agg(F.count(F.lit(1)).alias("cnt_ab"))
        .filter(F.col("cnt_ab") >= min_support)
    )
    ca = items.select(
        F.col("domain").alias("domain_a"), F.col("item_cnt").alias("cnt_a")
    )
    cb = items.select(
        F.col("domain").alias("domain_b"), F.col("item_cnt").alias("cnt_b")
    )
    return (
        pairs.join(F.broadcast(ca), "domain_a")
        .join(F.broadcast(cb), "domain_b")
        .join(F.broadcast(n_baskets))
        .select(
            "domain_a",
            "domain_b",
            "cnt_ab",
            "cnt_a",
            "cnt_b",
            F.round(
                F.col("cnt_ab").cast("double") / F.col("cnt_a").cast("double"), 6
            ).alias("conf_ab"),
            F.round(
                (F.col("n_baskets") * F.col("cnt_ab")).cast("double")
                / (F.col("cnt_a") * F.col("cnt_b")).cast("double"),
                6,
            ).alias("lift"),
            (
                F.col("n_baskets") * F.col("cnt_ab")
                > F.col("cnt_a") * F.col("cnt_b")
            ).alias("lift_gt1"),
        )
        .orderBy(F.desc("cnt_ab"), "domain_a", "domain_b")
        .limit(top_k)
    )
