"""Per-client behavioral analytics over the event stream — the
"which client is WEIRD, and is its badness real?" tier a fleet
dashboard runs above the raw top-K lists:

- ``client_profile_distance`` — hour-of-day usage-profile deviation:
  the L1 distance between each client's 24-bin hour histogram and the
  fleet-wide profile, both as distributions. A cron-driven scraper
  hitting one hour of the day scores near the 2.0 maximum; a client
  mirroring fleet behavior scores ~0. (Reference scope: the hourly
  histogram the reference plots globally — plot.py hourly panel —
  promoted to a per-client anomaly measure.)
- ``shrunk_block_rates`` — per-client block rates shrunk toward the
  fleet rate with a fixed pseudo-count prior (the additive-smoothing
  / empirical-Bayes-with-fixed-strength estimator): a client with 2/2
  blocked stops outranking one with 900/1000 on the "most blocked"
  list. The ranking question the raw-rate top-K gets WRONG at small n.

Exactness policy (engine-wide): both scores are single integer FLOOR
divisions (ppm) of exact cross-multiplied moments — the L1 and rate
numerators are DECIMAL(38,0) products (c_h·N at 10¹² events per hour
per client × 10¹⁴ total passes 2⁶³ but not 10³⁸), so every ordering
and every reported ppm is engine-exact with no fp anywhere.

Scale: one (client, hour) aggregation (≤24 rows per client), one
24-row broadcast global profile, one per-client reduce; no windows
over event rows, no per-client spine explode (the missing-hour mass
folds in closed form — see client_profile_distance).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_DEC = "decimal(38,0)"


def client_profile_distance(fact: DataFrame, k: int = 10) -> DataFrame:
    """Top-``k`` clients by hour-of-day profile L1 distance from the
    fleet profile: (client, n_events, dist_ppm) ordered by
    (dist_ppm DESC, client).

    With c_h = client count in hour h, n = client total, g_h = fleet
    count in hour h, N = fleet total:

        L1 = Σ_h |c_h·N − g_h·n|           (over all 24 hours)
        dist_ppm = 10⁶·L1 DIV (2·n·N)      (∈ [0, 10⁶]; L1/(n·N) is
                                            the distribution-space L1,
                                            max 2 for disjoint support)

    The Σ runs only over the client's OBSERVED hours plus one closed-
    form remainder — for hours the client never hit, the term is
    g_h·n, and Σ_{unobserved} g_h = N − Σ_{observed} g_h — so no
    client×24 spine is materialized (the join stays proportional to
    the observed (client, hour) relation).
    """
    # (client, hour)-sized fan-out input materialized once (r12,
    # guide §2.4): ch feeds the fleet profile (glob→tot), the
    # per-client totals and the scoring join — each leg would
    # otherwise re-run the fact-wide (client, hour) aggregation
    # (plan showed 3 duplicated subtrees, no exchange reuse). ≤24
    # rows per client at any event volume.
    ch = fact.groupBy("client", "hour").agg(
        F.count(F.lit(1)).cast("long").alias("c_h")
    ).localCheckpoint(eager=True)
    glob = ch.groupBy("hour").agg(F.sum("c_h").cast("long").alias("g_h"))
    tot = glob.agg(F.sum("g_h").cast("long").alias("n_total"))
    per = ch.groupBy("client").agg(F.sum("c_h").cast("long").alias("n_c"))
    j = (
        ch.join(F.broadcast(glob), "hour")
        .join(F.broadcast(tot))
        .join(per, "client")
    )
    term = F.abs(
        F.col("c_h").cast(_DEC) * F.col("n_total")
        - F.col("g_h").cast(_DEC) * F.col("n_c")
    )
    obs = j.groupBy("client").agg(
        F.max("n_c").alias("n_c"),
        F.max("n_total").alias("n_total"),
        F.sum(term).alias("l1_obs"),
        F.sum("g_h").cast("long").alias("g_obs"),
    )
    l1 = (
        F.col("l1_obs")
        + F.col("n_c").cast(_DEC) * (F.col("n_total") - F.col("g_obs"))
    )
    out = obs.select(
        "client",
        F.col("n_c").alias("n_events"),
        (l1 * 1000000)
        .cast(_DEC)
        .alias("_num"),
        (F.lit(2).cast(_DEC) * F.col("n_c") * F.col("n_total")).alias("_den"),
    ).select(
        "client",
        "n_events",
        F.expr("CAST(_num DIV _den AS BIGINT)").alias("dist_ppm"),
    )
    return out.orderBy(F.col("dist_ppm").desc(), F.col("client").asc()).limit(k)


def shrunk_block_rates(
    fact: DataFrame, pseudo: int = 100, k: int = 10
) -> DataFrame:
    """Top-``k`` clients by pseudo-count-shrunk block rate:
    (client, n_events, n_blocked, raw_ppm, shrunk_ppm) ordered by
    (shrunk_ppm DESC, client).

    shrunk = (x + λ·G) / (n + λ) with G = X/N the fleet block rate
    and λ = ``pseudo`` prior observations — in exact cross-multiplied
    integer form:

        shrunk_ppm = 10⁶·(x·N + λ·X) DIV (N·(n + λ))

    so a client's evidence is weighted against λ fleet-typical
    observations: n ≪ λ → the fleet rate; n ≫ λ → the raw rate. All
    products DECIMAL(38,0); the ordering key is the exact ppm.
    """
    # Fan-out left to exchange reuse (r12): an eager checkpoint of
    # per was measured slower (0.48→0.60 s) — both consumers sit over
    # the same per-client exchange, which the engine already reuses.
    per = fact.groupBy("client").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.count(F.when(F.col("status_type") == "Blocked", 1))
        .cast("long")
        .alias("x"),
    )
    tot = per.agg(
        F.sum("n").cast("long").alias("nn"),
        F.sum("x").cast("long").alias("xx"),
    )
    lam = int(pseudo)
    j = per.join(F.broadcast(tot))
    num = (
        F.col("x").cast(_DEC) * F.col("nn")
        + F.lit(lam).cast(_DEC) * F.col("xx")
    ) * 1000000
    den = F.col("nn").cast(_DEC) * (F.col("n") + F.lit(lam))
    out = j.select(
        "client",
        F.col("n").alias("n_events"),
        F.col("x").alias("n_blocked"),
        F.expr("CAST(x * 1000000 DIV n AS BIGINT)").alias("raw_ppm"),
        num.alias("_num"),
        den.alias("_den"),
    ).select(
        "client",
        "n_events",
        "n_blocked",
        "raw_ppm",
        F.expr("CAST(_num DIV _den AS BIGINT)").alias("shrunk_ppm"),
    )
    return out.orderBy(
        F.col("shrunk_ppm").desc(), F.col("client").asc()
    ).limit(k)


def client_domain_simpson(fact: DataFrame, k: int = 10) -> DataFrame:
    """Top-``k`` clients by Gini–Simpson domain diversity:
    (client, n_events, n_domains, simpson_ppm) ordered by
    (simpson_ppm DESC, client) — the CONCENTRATION complement to
    most_diverse_client's distinct count (reference stats.py's
    "most diverse client"): 500 queries spread over 50 domains and
    500 queries with 499 hits on one domain both count 50 distinct,
    but their Simpson indices differ maximally.

    1 − Σp² is RATIONAL — no entropy logs anywhere:

        simpson_ppm = 10⁶·(n² − Σc_d²) DIV n²       (∈ [0, 10⁶])

    with c_d the per-domain counts and n the client total; products
    in DECIMAL(38,0) (c_d ≤ 10¹², n² ≤ 10²⁴ pass 2⁶³). The effective
    domain count, if wanted, is n²/Σc² — the same two moments.

    Scale: one (client, domain) aggregation, one per-client reduce —
    the information-minimum pair of shuffles; no windows.
    """
    cd = fact.groupBy("client", "domain").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    per = cd.groupBy("client").agg(
        F.sum("c").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_domains"),
        F.sum((F.col("c").cast(_DEC) * F.col("c"))).alias("sq"),
    )
    n2 = F.col("n").cast(_DEC) * F.col("n")
    out = per.select(
        "client",
        F.col("n").alias("n_events"),
        "n_domains",
        ((n2 - F.col("sq")) * 1000000).alias("_num"),
        n2.alias("_den"),
    ).select(
        "client",
        "n_events",
        "n_domains",
        F.expr("CAST(_num DIV _den AS BIGINT)").alias("simpson_ppm"),
    )
    return out.orderBy(
        F.col("simpson_ppm").desc(), F.col("client").asc()
    ).limit(k)


def domain_share_movers(fact: DataFrame, k: int = 10) -> DataFrame:
    """Top-``k`` domains by absolute TRAFFIC-SHARE change between the
    first and second half of the observed date range — "what newly
    surged / collapsed", the change-detection complement to the
    static top-K lists. (share, not count: volume drift cancels.)

    The half boundary is mid = min_date + ⌊span/2⌋ days (second half
    starts AT mid); shares are exact ppm (cᴬ·10⁶ DIV Nᴬ), the mover
    score is |share_b_ppm − share_a_ppm| on those exact integers, and
    the ordering ties break on (abs_delta DESC, domain). Domains
    absent from a half carry share 0 — a full outer union of the two
    half profiles, no domain spine.

    Scale: one (domain, half) aggregation + a 2-row broadcast of the
    half totals; the top-k is a TakeOrdered over the domain relation.
    """
    bounds = fact.agg(
        F.min("date").alias("d0"), F.max("date").alias("d1")
    ).select(
        "d0",
        F.expr("date_add(d0, CAST(datediff(d1, d0) DIV 2 AS INT))").alias(
            "mid"
        ),
    )
    tagged = fact.join(F.broadcast(bounds)).select(
        "domain",
        F.when(F.col("date") < F.col("mid"), F.lit(0))
        .otherwise(F.lit(1))
        .alias("half"),
    )
    # Fan-out left to exchange reuse (r12): an eager checkpoint of
    # per was measured slower (0.61→0.77 s) — both consumers sit over
    # the same (domain, half) exchange, which the engine already
    # reuses.
    per = tagged.groupBy("domain", "half").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    tot = per.groupBy("half").agg(F.sum("c").cast("long").alias("n"))
    shares = (
        per.join(F.broadcast(tot), "half")
        .select(
            "domain",
            F.when(F.col("half") == 0, F.expr("c * 1000000 DIV n"))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("sa"),
            F.when(F.col("half") == 1, F.expr("c * 1000000 DIV n"))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("sb"),
            F.when(F.col("half") == 0, F.col("c")).otherwise(F.lit(0)).alias("ca"),
            F.when(F.col("half") == 1, F.col("c")).otherwise(F.lit(0)).alias("cb"),
        )
        .groupBy("domain")
        .agg(
            F.sum("ca").cast("long").alias("cnt_a"),
            F.sum("cb").cast("long").alias("cnt_b"),
            F.sum("sa").cast("long").alias("share_a_ppm"),
            F.sum("sb").cast("long").alias("share_b_ppm"),
        )
    )
    delta = F.col("share_b_ppm") - F.col("share_a_ppm")
    return (
        shares.select(
            "domain", "cnt_a", "cnt_b", "share_a_ppm", "share_b_ppm",
            delta.alias("delta_ppm"),
            F.abs(delta).alias("abs_delta_ppm"),
        )
        .orderBy(F.col("abs_delta_ppm").desc(), F.col("domain").asc())
        .limit(k)
    )


def spike_contribution(fact: DataFrame, k: int = 10) -> DataFrame:
    """Top-``k`` domains by contribution to the largest day-over-day
    volume change — "EXPLAIN the spike": since
    Δtotal_t = Σ_domain Δcount_t(domain) exactly, ranking domains by
    |Δcount| on the peak-Δ day decomposes the anomaly into its
    drivers (the additive contribution analysis every incident
    review starts with).

    Output: (spike_date, total_delta, domain, cnt_before, cnt_after,
    delta, share_ppm) ordered by (|delta| DESC, domain);
    share_ppm = 10⁶·delta DIV total_delta (signed; contributions
    against the move are negative shares).

    Determinism: the spike day is the EARLIEST argmax of |Δtotal|
    (exact integers); domains absent on one side carry 0.

    Scale: one daily-count relation + one (domain, date) aggregation
    filtered to two broadcast dates — the per-domain relation is
    touched for exactly the two days in question.
    """
    daily = fact.groupBy("date").agg(
        F.count(F.lit(1)).cast("long").alias("y")
    )
    w = Window.orderBy("date")
    deltas = daily.select(
        "date",
        (F.col("y") - F.lag("y").over(w)).alias("d"),
        F.lag("date").over(w).alias("prev_date"),
    ).filter(F.col("d").isNotNull())
    spike = deltas.orderBy(
        F.abs(F.col("d")).desc(), F.col("date").asc()
    ).limit(1).select(
        F.col("date").alias("spike_date"),
        F.col("prev_date").alias("before_date"),
        F.col("d").alias("total_delta"),
    )
    dd = (
        fact.join(F.broadcast(spike))
        .filter(
            (F.col("date") == F.col("spike_date"))
            | (F.col("date") == F.col("before_date"))
        )
        .groupBy("domain")
        .agg(
            F.count(F.when(F.col("date") == F.col("before_date"), 1))
            .cast("long")
            .alias("cnt_before"),
            F.count(F.when(F.col("date") == F.col("spike_date"), 1))
            .cast("long")
            .alias("cnt_after"),
        )
    )
    delta = (F.col("cnt_after") - F.col("cnt_before")).cast("long")
    out = dd.join(F.broadcast(spike)).select(
        "spike_date",
        "total_delta",
        "domain",
        "cnt_before",
        "cnt_after",
        delta.alias("delta"),
        F.expr("CAST((cnt_after - cnt_before) * 1000000 DIV total_delta AS BIGINT)").alias(
            "share_ppm"
        ),
    )
    return out.orderBy(
        F.abs(F.col("delta")).desc(), F.col("domain").asc()
    ).limit(k)
