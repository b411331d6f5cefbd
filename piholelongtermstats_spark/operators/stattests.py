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


# ---------------------------------------------------------------------------
# M23 — parametric / correlation tier (same exact-sufficient-statistic
# policy: integer or DECIMAL(38,0) moments, a fixed handful of IEEE
# double ops — each correctly rounded, identical expression tree on
# both engines — produce the reported statistic).
# ---------------------------------------------------------------------------

def _reply_q(col: str = "reply_time") -> F.Column:
    """reply_time quantized ONCE to the exact integer µ-grid
    (round(x·1000) → BIGINT, the embedding_dim_stats convention):
    every downstream moment is then exact integer arithmetic."""
    return F.round(F.col(col) * 1000).cast("long")


def welch_day_night(fact: DataFrame) -> DataFrame:
    """One row: Welch's unequal-variance t-test between Day and Night
    reply times (reference scope: the day/night split the reference
    plots, promoted to an inference question — did latency shift?).

    Sufficient statistics per group — n (BIGINT), Σr (BIGINT),
    Σr² (DECIMAL(38,0); r² ≤ ~10¹¹ so the long per-row product is
    exact and the decimal sum never overflows at any volume) — come
    from ONE map-side-combined aggregation over the fact. t and the
    Welch–Satterthwaite df are then a fixed scalar expression of the
    six exact moments (sample variance v = (Σr² − (Σr)²/n)/(n−1),
    t = (m₁−m₂)/√(v₁/n₁+v₂/n₂)); every fp step is correctly rounded
    IEEE arithmetic over identical operand trees, so the rounded
    values are engine-identical. t is computed on the quantized
    grid — t is scale-invariant, so the grid choice only fixes the
    (documented) tie behavior, not the statistic.
    """
    r = _reply_q()
    day = F.col("day_period") == "Day"
    night = F.col("day_period") == "Night"
    m = fact.filter(F.col("reply_time").isNotNull())
    agg = m.agg(
        F.count(F.when(day, 1)).cast("long").alias("n1"),
        F.sum(F.when(day, r)).cast("long").alias("s1"),
        F.sum(F.when(day, (r * r).cast("decimal(38,0)"))).alias("q1"),
        F.count(F.when(night, 1)).cast("long").alias("n2"),
        F.sum(F.when(night, r)).cast("long").alias("s2"),
        F.sum(F.when(night, (r * r).cast("decimal(38,0)"))).alias("q2"),
    )
    n1d, n2d = F.col("n1").cast("double"), F.col("n2").cast("double")
    s1d, s2d = F.col("s1").cast("double"), F.col("s2").cast("double")
    q1d, q2d = F.col("q1").cast("double"), F.col("q2").cast("double")
    v1 = (q1d - s1d * s1d / n1d) / (n1d - 1.0)
    v2 = (q2d - s2d * s2d / n2d) / (n2d - 1.0)
    a1, a2 = v1 / n1d, v2 / n2d
    se2 = a1 + a2
    t = (s1d / n1d - s2d / n2d) / F.sqrt(se2)
    df = (se2 * se2) / (a1 * a1 / (n1d - 1.0) + a2 * a2 / (n2d - 1.0))
    ok = (F.col("n1") > 1) & (F.col("n2") > 1)
    # Σr² is DECIMAL(38,0) internally; the REPORTED q1/q2 are DOUBLE
    # (decimal→double is correctly rounded in both engines, identical
    # bits) — Decimal-typed output columns serialize differently in
    # Spark's toPandas vs DuckDB's .df() and fail the driver's
    # value-hash even when numerically equal (round-8 lesson).
    return agg.select(
        "n1", "s1", q1d.alias("q1"), "n2", "s2", q2d.alias("q2"),
        F.round(F.when(ok, t), 6).alias("t_stat"),
        F.round(F.when(ok, df), 6).alias("df"),
    )


def spearman_volume_reply(fact: DataFrame) -> DataFrame:
    """One row: Spearman rank correlation between daily query volume
    and daily total (quantized) reply time — "do busy days run slow?"

    Tie-aware ranks without any float: for a value with min-rank p
    (rank()) and tie-count t (count() over the value partition),
    2·avgrank = 2p + t − 1 — an integer. Pearson over the doubled
    ranks (u, v) then has all-BIGINT sufficient statistics; ρ's
    numerator n·Σuv − Σu·Σv and the two denominator factors are
    exact, and ρ itself is one division and one IEEE sqrt.

    Scale: events collapse to one row per day first; the rank windows
    order the tiny daily relation (the histogram-window class — days,
    never events).
    """
    from pyspark.sql import Window as W

    daily = (
        fact.groupBy("date")
        .agg(
            F.count(F.lit(1)).cast("long").alias("x"),
            F.coalesce(
                F.sum(F.when(F.col("reply_time").isNotNull(), _reply_q())),
                F.lit(0),
            ).cast("long").alias("y"),
        )
    )
    u = (2 * F.rank().over(W.orderBy("x"))
         + F.count(F.lit(1)).over(W.partitionBy("x")) - 1).cast("long")
    v = (2 * F.rank().over(W.orderBy("y"))
         + F.count(F.lit(1)).over(W.partitionBy("y")) - 1).cast("long")
    ranked = daily.select(u.alias("u"), v.alias("v"))
    s = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("u").alias("su"),
        F.sum("v").alias("sv"),
        F.sum(F.col("u") * F.col("v")).alias("suv"),
        F.sum(F.col("u") * F.col("u")).alias("suu"),
        F.sum(F.col("v") * F.col("v")).alias("svv"),
    )
    num = F.col("n") * F.col("suv") - F.col("su") * F.col("sv")
    denu = F.col("n") * F.col("suu") - F.col("su") * F.col("su")
    denv = F.col("n") * F.col("svv") - F.col("sv") * F.col("sv")
    rho = F.when(
        (denu > 0) & (denv > 0),
        num.cast("double")
        / F.sqrt(denu.cast("double") * denv.cast("double")),
    )
    return s.select(
        F.col("n").alias("n_days"),
        num.alias("rho_num"),
        denu.alias("den_u"),
        denv.alias("den_v"),
        F.round(rho, 6).alias("rho"),
    )


def acf_daily_counts(fact: DataFrame, max_lag: int = 7) -> DataFrame:
    """Autocorrelation of the daily count series at lags 1..max_lag —
    one row per lag (lag, n_days, acf_num, acf_den, rho), the
    weekly-seasonality probe (ρ₇ high ⇒ weekday cycle).

    n²-cleared form: with S = Σx over all n days, the standard biased
    ACF estimator ρ_k = Σ_t(x_t−x̄)(x_{t+k}−x̄) / Σ_t(x_t−x̄)²
    equals Σ(n·x_t−S)(n·x_{t+k}−S) / Σ(n·x_t−S)² exactly — both
    sides pure BIGINT (|n·x| < 2⁶³ up to ~10¹⁴ events/day·10⁴ days;
    widen to DECIMAL(38,0) past that). One division per lag.

    Scale: one partial agg collapses events to days; days map to an
    integer index (datediff from the broadcast min date) so the lag
    pairing is a plain integer EQUI-join of the daily relation — at
    most n·max_lag pair rows of DAYS, hashable, no interval math.
    """
    daily = fact.groupBy("date").agg(
        F.count(F.lit(1)).cast("long").alias("x")
    )
    tot = daily.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").alias("s"),
        F.min("date").alias("d0"),
    )
    d = daily.join(F.broadcast(tot)).select(
        F.datediff("date", "d0").cast("long").alias("idx"),
        (F.col("n") * F.col("x") - F.col("s")).alias("c"),
        "n",
    ).localCheckpoint(eager=True)
        # Materialized ONCE (r12, guide §2.4 — the streak-kernel fix):
        # this dates-sized relation fans out to the lag-pair legs and
        # the denominator, each of which would otherwise re-run the
        # fact-wide daily aggregation upstream.
    lags = d.sparkSession.range(1, max_lag + 1).select(
        F.col("id").cast("int").alias("lag")
    )
    a = d.select(F.col("idx").alias("i1"), F.col("c").alias("c1"), "n")
    b = d.select(F.col("idx").alias("i2"), F.col("c").alias("c2"))
    pairs = (
        a.crossJoin(F.broadcast(lags))
        .join(b, F.col("i2") == F.col("i1") + F.col("lag"))
    )
    den = d.agg(F.sum(F.col("c") * F.col("c")).alias("acf_den"))
    out = (
        pairs.groupBy("lag")
        .agg(
            F.max("n").alias("n_days"),
            F.sum(F.col("c1") * F.col("c2")).alias("acf_num"),
        )
        .join(F.broadcast(den))
    )
    return out.select(
        F.col("lag").alias("lag_k"),
        "n_days",
        "acf_num",
        "acf_den",
        F.round(
            F.when(
                F.col("acf_den") > 0,
                F.col("acf_num").cast("double")
                / F.col("acf_den").cast("double"),
            ),
            6,
        ).alias("rho"),
    )  # (terminal cosmetic sort dropped, r12 guide §2.4 — checkers are order-insensitive)


# Benford expected first-digit proportions log10(1+1/d), d=1..9, in
# parts-per-billion — pinned integer literals (derived once from
# correctly-rounded log10; pinning beats recomputing because the
# oracle then shares the exact constants by construction).
BENFORD_PPB = {
    1: 301029996,
    2: 176091259,
    3: 124938737,
    4: 96910013,
    5: 79181246,
    6: 66946790,
    7: 57991947,
    8: 51152522,
    9: 45757491,
}


def benford_reply_digits(fact: DataFrame) -> DataFrame:
    """First-significant-digit audit of the (quantized) reply-time
    metric against Benford's law — 9 rows (digit, cnt, obs_ppb,
    expected_ppb, dev_ppb), the classic synthetic-data / telemetry
    forensics screen.

    Exactness: the digit is the first character of the BIGINT's
    decimal string (identical cross-engine; no float log10), observed
    proportion is integer parts-per-billion (cnt·10⁹ DIV total), and
    the expected proportions are pinned integer literals — the whole
    result is integer-exact, no fp anywhere.

    Scale: one map-side-combined 9-group aggregation; the total is a
    window-free broadcast join of the 9-row relation.
    """
    r = _reply_q()
    digits = (
        fact.filter(F.col("reply_time").isNotNull())
        .select(r.alias("r"))
        .filter(F.col("r") > 0)
        .select(
            F.substring(F.col("r").cast("string"), 1, 1)
            .cast("int")
            .alias("digit")
        )
    )
    cnts = digits.groupBy("digit").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    tot = cnts.agg(F.sum("cnt").cast("long").alias("total"))
    exp = F.create_map(
        *[x for dd, p in BENFORD_PPB.items() for x in (F.lit(dd), F.lit(p))]
    )
    return (
        cnts.join(F.broadcast(tot))
        .select(
            "digit",
            "cnt",
            F.expr("CAST(cnt * 1000000000 AS BIGINT) DIV total").alias(
                "obs_ppb"
            ),
            exp[F.col("digit")].cast("long").alias("expected_ppb"),
            (
                F.expr("CAST(cnt * 1000000000 AS BIGINT) DIV total")
                - exp[F.col("digit")].cast("long")
            ).alias("dev_ppb"),
        )
    )  # (terminal cosmetic sort dropped, r12 guide §2.4 — checkers are order-insensitive)


def mann_whitney_day_night(fact: DataFrame) -> DataFrame:
    """One row: the Mann–Whitney U (Wilcoxon rank-sum) test between
    Day and Night reply times — the NONPARAMETRIC shift complement
    to welch_day_night (Mann & Whitney 1947): did the latency
    DISTRIBUTION move, with no normality assumption?

    Histogram formulation (the ks_day_night convention): per distinct
    quantized value, per-sample counts; the doubled midrank of value
    v is dr_v = 2·cum_before(v) + t_v + 1 — an integer. Then
    2R₁ = Σ ca_v·dr_v and 2U₁ = 2R₁ − n₁(n₁+1) are exact
    (DECIMAL(38,0): at 10¹² events the rank products pass 2⁶³), and
    the tie-corrected normal approximation
        z = (2U₁ − n₁n₂) / (2·√(n₁n₂·((N³−N) − Σ(t³−t)) / (12·N·(N−1))))
    has an exact DECIMAL bracket with fixed IEEE steps after the
    casts (each correctly rounded ⇒ engine-identical).

    Scale: one histogram shuffle; the cum window orders DISTINCT
    metric values only.
    """
    m = fact.filter(F.col("reply_time").isNotNull()).select(
        _reply_q().alias("r"), "day_period"
    )
    hist = m.groupBy("r").agg(
        F.count(F.when(F.col("day_period") == "Day", 1)).cast("long").alias("ca"),
        F.count(F.when(F.col("day_period") == "Night", 1)).cast("long").alias("cb"),
    )
    w = Window.orderBy("r").rowsBetween(Window.unboundedPreceding, -1)
    t_v = (F.col("ca") + F.col("cb")).cast("long")
    scanned = hist.select(
        "ca",
        t_v.alias("t"),
        F.coalesce(
            F.sum(F.col("ca") + F.col("cb")).over(w), F.lit(0)
        ).cast("long").alias("cum_before"),
    )
    dec = "decimal(38,0)"
    agg = scanned.agg(
        F.sum("ca").cast("long").alias("n1"),
        F.sum(F.col("t") - F.col("ca")).cast("long").alias("n2"),
        F.sum(
            (F.col("ca") * (2 * F.col("cum_before") + F.col("t") + 1)).cast(dec)
        ).alias("r2_day"),
        F.sum((F.col("t") * F.col("t") * F.col("t") - F.col("t")).cast(dec)).alias(
            "tie_term"
        ),
    )
    n1, n2 = F.col("n1"), F.col("n2")
    nn = (n1 + n2).cast(dec)
    u2 = F.col("r2_day") - (n1 * (n1 + 1)).cast(dec)
    bracket = (nn * nn * nn - nn) - F.col("tie_term")
    n1d, n2d = n1.cast("double"), n2.cast("double")
    nd = n1d + n2d
    var = (n1d * n2d) * bracket.cast("double") / (12.0 * nd * (nd - 1.0))
    z = (u2.cast("double") - n1d * n2d) / (2.0 * F.sqrt(var))
    ok = (n1 > 0) & (n2 > 0) & (bracket > 0)
    # DECIMAL internally; DOUBLE at the output boundary (exact value,
    # correctly-rounded cast — the welch_day_night serialization rule).
    return agg.select(
        "n1",
        "n2",
        u2.cast("double").alias("u2_day"),
        F.col("tie_term").cast("double").alias("tie_term"),
        F.round(F.when(ok, z), 6).alias("z"),
    )


def levene_day_night(fact: DataFrame) -> DataFrame:
    """One row: did latency VARIABILITY shift between Day and Night?
    The Brown–Forsythe/Levene scale test (Brown & Forsythe 1974) in
    its two-group Welch form: absolute deviations from each group's
    MEDIAN, then the unequal-variance t on those deviations (for
    k = 2 the classic Levene W is the squared pooled t; the Welch
    variant is the robust default and reuses welch_day_night's exact
    operand tree verbatim).

    Exactness: group medians come from per-group value histograms as
    doubled medians (BIGINT — the robust-tier convention), so the
    deviations z = |2r − med2| are integers in half-units (the t is
    scale-invariant, so the unit never divides); n/Σz/Σz² are one
    histogram-sized aggregate (Σz² in DECIMAL(38,0)); t and df are
    the fixed welch IEEE expression.

    Scale: one (day_period, value) histogram shuffle; the cumulative
    windows are PARTITIONED by group and order distinct values.
    """
    m = fact.filter(F.col("reply_time").isNotNull()).select(
        _reply_q().alias("r"), "day_period"
    )
    hist = m.groupBy("day_period", "r").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    wp = Window.partitionBy("day_period")
    wc = wp.orderBy("r").rowsBetween(Window.unboundedPreceding, 0)
    h = hist.select(
        "day_period",
        "r",
        "cnt",
        F.sum("cnt").over(wc).cast("long").alias("cum"),
        F.sum("cnt").over(wp).cast("long").alias("n"),
    )
    r1 = F.expr("(n + 1) DIV 2")
    r2 = F.expr("n DIV 2 + 1")
    med = h.groupBy("day_period").agg(
        (
            F.min(F.when(F.col("cum") >= r1, F.col("r")))
            + F.min(F.when(F.col("cum") >= r2, F.col("r")))
        ).cast("long").alias("med2")
    )
    dec = "decimal(38,0)"
    z = F.abs(2 * F.col("r") - F.col("med2"))
    day = F.col("day_period") == "Day"
    night = F.col("day_period") == "Night"
    agg = hist.join(F.broadcast(med), "day_period").agg(
        F.sum(F.when(day, F.col("cnt"))).cast("long").alias("n1"),
        F.sum(F.when(day, F.col("cnt") * z)).cast("long").alias("s1"),
        F.sum(F.when(day, (F.col("cnt") * z * z).cast(dec))).alias("q1"),
        F.sum(F.when(night, F.col("cnt"))).cast("long").alias("n2"),
        F.sum(F.when(night, F.col("cnt") * z)).cast("long").alias("s2"),
        F.sum(F.when(night, (F.col("cnt") * z * z).cast(dec))).alias("q2"),
    )
    n1d, n2d = F.col("n1").cast("double"), F.col("n2").cast("double")
    s1d, s2d = F.col("s1").cast("double"), F.col("s2").cast("double")
    q1d, q2d = F.col("q1").cast("double"), F.col("q2").cast("double")
    v1 = (q1d - s1d * s1d / n1d) / (n1d - 1.0)
    v2 = (q2d - s2d * s2d / n2d) / (n2d - 1.0)
    a1, a2 = v1 / n1d, v2 / n2d
    se2 = a1 + a2
    t = (s1d / n1d - s2d / n2d) / F.sqrt(se2)
    df = (se2 * se2) / (a1 * a1 / (n1d - 1.0) + a2 * a2 / (n2d - 1.0))
    ok = (F.col("n1") > 1) & (F.col("n2") > 1)
    # DECIMAL internally; DOUBLE at the output boundary (the
    # welch_day_night serialization rule).
    return agg.select(
        "n1", "s1", q1d.alias("q1"), "n2", "s2", q2d.alias("q2"),
        F.round(F.when(ok, t), 6).alias("t_stat"),
        F.round(F.when(ok, df), 6).alias("df"),
    )


def ccf_status_daily(fact: DataFrame, max_lag: int = 7) -> DataFrame:
    """Cross-correlation between the DAILY Blocked and Allowed count
    series at lags −max_lag..+max_lag — "do blocked waves lead or trail
    allowed traffic?" (the two-series complement of acf_daily_counts;
    a positive-lag peak means Blocked LEADS Allowed by that many days).

    n²-cleared all-integer form: with Sb = Σb, Sa = Σa over all n
    days, the lag-k numerator Σ_t(b_t−b̄)(a_{t+k}−ā) equals
    Σ_t(n·b_t−Sb)(n·a_{t+k}−Sa)/n² — numerator exact BIGINT; the
    denominator √(Σ(n·b−Sb)²·Σ(n·a−Sa)²) shares the same n² factor,
    so ρ_k = num_k/√(db·da) needs no n² anywhere. One division + one
    IEEE sqrt per lag.

    Scale: events collapse to one row per day (counts are conditional,
    so both series share one partial agg); the lag pairing is an
    integer equi-join of the daily relation — ≤ n·(2L+1) day pairs.
    """
    daily = fact.groupBy("date").agg(
        F.count(F.when(F.col("status_type") == "Blocked", 1))
        .cast("long")
        .alias("b"),
        F.count(F.when(F.col("status_type") == "Allowed", 1))
        .cast("long")
        .alias("a"),
    )
    tot = daily.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("b").alias("sb"),
        F.sum("a").alias("sa"),
        F.min("date").alias("d0"),
    )
    d = daily.join(F.broadcast(tot)).select(
        F.datediff("date", "d0").cast("long").alias("idx"),
        (F.col("n") * F.col("b") - F.col("sb")).alias("cb"),
        (F.col("n") * F.col("a") - F.col("sa")).alias("ca"),
    ).localCheckpoint(eager=True)
        # Materialized ONCE (r12, guide §2.4 — the streak-kernel fix):
        # this dates-sized relation fans out to the lag-pair legs and
        # the denominator, each of which would otherwise re-run the
        # fact-wide daily aggregation upstream.

    den = d.agg(
        F.sum(F.col("cb") * F.col("cb")).alias("db"),
        F.sum(F.col("ca") * F.col("ca")).alias("da"),
    )
    lags = d.sparkSession.range(-max_lag, max_lag + 1).select(
        F.col("id").cast("int").alias("lag_k")
    )
    x = d.select(F.col("idx").alias("i1"), "cb")
    y = d.select(F.col("idx").alias("i2"), "ca")
    pairs = (
        x.crossJoin(F.broadcast(lags))
        .join(y, F.col("i2") == F.col("i1") + F.col("lag_k"))
    )
    out = (
        pairs.groupBy("lag_k")
        .agg(F.sum(F.col("cb") * F.col("ca")).alias("ccf_num"))
        .join(F.broadcast(den))
    )
    rho = F.when(
        (F.col("db") > 0) & (F.col("da") > 0),
        F.col("ccf_num").cast("double")
        / F.sqrt(F.col("db").cast("double") * F.col("da").cast("double")),
    )
    return out.select(
        "lag_k",
        "ccf_num",
        "db",
        "da",
        F.round(rho, 6).alias("rho"),
    )  # (terminal cosmetic sort dropped, r12 guide §2.4 — checkers are order-insensitive)


def runs_test_daily(fact: DataFrame) -> DataFrame:
    """One row: the Wald–Wolfowitz runs test on the daily count
    series' above/below-median sequence (Wald & Wolfowitz 1940) —
    "is day-to-day volume random, or does it streak?" Too FEW runs ⇒
    positive persistence (busy days cluster); too many ⇒ oscillation.

    Exactness: the median is the doubled exact median med2 (BIGINT;
    the robust-tier convention), days with 2y = med2 are DROPPED (the
    standard treatment), the sign sequence and run count R are pure
    integers from one lag over the date-ordered daily relation, and
    z = (R − μ)/σ with μ = 1 + 2n₁n₂/N, σ² = 2n₁n₂(2n₁n₂−N)/(N²(N−1))
    is one fixed IEEE expression of three integers.

    Scale: one partial agg to days; every window orders the per-date
    summary (the documented tiny-relation window class).
    """
    daily = fact.groupBy("date").agg(
        F.count(F.lit(1)).cast("long").alias("y")
    )
    w = Window.orderBy("y").rowsBetween(Window.unboundedPreceding, 0)
    h = (
        daily.groupBy("y")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .select(
            "y",
            F.sum("cnt").over(w).cast("long").alias("cum"),
            F.sum("cnt").over(
                Window.rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            ).cast("long").alias("n"),
        )
    )
    r1 = F.expr("(n + 1) DIV 2")
    r2 = F.expr("n DIV 2 + 1")
    med = h.agg(
        (
            F.min(F.when(F.col("cum") >= r1, F.col("y")))
            + F.min(F.when(F.col("cum") >= r2, F.col("y")))
        ).cast("long").alias("med2")
    )
    signed = (
        daily.join(F.broadcast(med))
        .filter(2 * F.col("y") != F.col("med2"))
        .select(
            "date", (2 * F.col("y") > F.col("med2")).cast("int").alias("s")
        )
    )
    wd = Window.orderBy("date")
    runs = signed.select(
        "s",
        F.when(
            F.lag("s").over(wd).isNull()
            | (F.lag("s").over(wd) != F.col("s")),
            1,
        ).otherwise(0).alias("chg"),
    )
    agg = runs.agg(
        F.sum(F.col("s").cast("long")).alias("n_above"),
        F.sum(F.lit(1) - F.col("s").cast("long")).alias("n_below"),
        F.sum("chg").cast("long").alias("n_runs"),
    )
    n1, n2, r = (
        F.col("n_above").cast("double"),
        F.col("n_below").cast("double"),
        F.col("n_runs").cast("double"),
    )
    nn = n1 + n2
    two_n1n2 = 2.0 * n1 * n2
    mu = 1.0 + two_n1n2 / nn
    var = two_n1n2 * (two_n1n2 - nn) / (nn * nn * (nn - 1.0))
    ok = (F.col("n_above") > 0) & (F.col("n_below") > 0) & (
        (F.col("n_above") + F.col("n_below")) > 1
    )
    z = F.when(ok & (var > 0), (r - mu) / F.sqrt(var))
    return agg.select(
        "n_above", "n_below", "n_runs", F.round(z, 6).alias("z")
    )


def reply_p95_heatmap(fact: DataFrame) -> DataFrame:
    """Per (day_name, hour) exact p95 of the quantized reply time —
    the tail-latency complement to the count heatmap the reference
    plots (plot.py day×hour panel): WHERE in the week is the service
    slow, not just busy.

    Exactness: nearest-rank p95 over per-cell value histograms —
    the smallest quantized value whose cumulative count reaches
    ⌈0.95·n⌉ = (19n + 19) DIV 20 — a pure integer selection (the
    exact_group_quantiles convention). p95_ms = p95_q/1000 is the one
    reporting division.

    Scale: one (cell, value) histogram shuffle; the cumulative
    windows are PARTITIONED by the 168 cells and order DISTINCT
    quantized values within each — never event rows.
    """
    m = fact.filter(F.col("reply_time").isNotNull()).select(
        "day_name", "hour", _reply_q().alias("r")
    )
    hist = m.groupBy("day_name", "hour", "r").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    cell = Window.partitionBy("day_name", "hour")
    wc = cell.orderBy("r").rowsBetween(Window.unboundedPreceding, 0)
    h = hist.select(
        "day_name",
        "hour",
        "r",
        F.sum("cnt").over(wc).cast("long").alias("cum"),
        F.sum("cnt").over(cell).cast("long").alias("n"),
    )
    rank = F.expr("(19 * n + 19) DIV 20")
    out = h.groupBy("day_name", "hour").agg(
        F.max("n").alias("n_replies"),
        F.min(F.when(F.col("cum") >= rank, F.col("r")))
        .cast("long")
        .alias("p95_q"),
    )
    return out.select(
        "day_name",
        "hour",
        "n_replies",
        "p95_q",
        F.round(F.col("p95_q").cast("double") / 1000.0, 6).alias("p95_ms"),
    )  # (terminal cosmetic sort dropped, r12 guide §2.4 — checkers are order-insensitive)


def quantile_sketch_eval(
    fact: DataFrame, accuracy: int = 10000
) -> DataFrame:
    """Accuracy audit of Spark's quantile sketch against exact truth —
    the ann_eval_metrics / lsh_dedup_eval treatment applied to the
    APPROX-QUANTILE tier: is percentile_approx's promised rank bound
    actually holding on this data?

    One row per percentile (500‰ / 950‰ / 990‰): the exact
    nearest-rank value over the quantized reply histogram, the sketch
    value (Greenwald–Khanna via ``percentile_approx`` at
    ``accuracy``), the sketch value's TRUE rank (its cumulative count
    in the exact histogram — the sketch returns data elements, so the
    lookup is an equi-join), the absolute rank error, and the
    promised bound ⌈n/accuracy⌉. within_bound is the audited claim.

    Registered rows-only: the sketch's internal compaction is not
    SQL-replayable — the pytest contract asserts within_bound on real
    data instead (the uniques_approx rsd convention).

    Scale: the exact leg is one histogram shuffle + a cum window over
    distinct values; the sketch leg is Spark's own mergeable
    aggregate. The audit join touches 3 rows.
    """
    m = fact.filter(F.col("reply_time").isNotNull()).select(
        _reply_q().alias("r")
    )
    hist = m.groupBy("r").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    wc = Window.orderBy("r").rowsBetween(Window.unboundedPreceding, 0)
    h = hist.select(
        "r",
        F.sum("cnt").over(wc).cast("long").alias("cum"),
        F.sum("cnt").over(
            Window.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).cast("long").alias("n"),
    )
    pcts = [500, 950, 990]
    sketch = m.agg(
        F.percentile_approx(
            "r", [p / 1000.0 for p in pcts], accuracy
        ).alias("sk")
    ).select(
        F.posexplode("sk").alias("i", "sketch_q")
    ).select(
        F.element_at(
            F.array(*[F.lit(p) for p in pcts]), F.col("i") + 1
        ).alias("p_pm"),
        "sketch_q",
    )
    targets = h.sparkSession.range(len(pcts)).select(
        F.element_at(
            F.array(*[F.lit(p) for p in pcts]), F.col("id").cast("int") + 1
        ).alias("p_pm")
    )
    exact = (
        h.crossJoin(F.broadcast(targets))
        .filter(
            F.col("cum")
            >= F.expr("(p_pm * n + 999) DIV 1000")
        )
        .groupBy("p_pm")
        .agg(
            F.max("n").alias("n"),
            F.min("r").cast("long").alias("exact_q"),
        )
    )
    # a tied value occupies the rank interval [cum−cnt+1, cum]; the
    # sketch's error is the distance from the target rank to that
    # interval (0 if the target falls inside it)
    ranked_sketch = sketch.join(
        h.join(hist, "r").select(
            F.col("r").alias("sketch_q"),
            (F.col("cum") - F.col("cnt") + 1).alias("rank_lo"),
            F.col("cum").alias("rank_hi"),
        ),
        "sketch_q",
    )
    target = F.expr("(p_pm * n + 999) DIV 1000")
    out = exact.join(F.broadcast(ranked_sketch), "p_pm").select(
        "p_pm",
        "n",
        "exact_q",
        F.col("sketch_q").cast("long").alias("sketch_q"),
        F.greatest(
            F.lit(0),
            F.col("rank_lo") - target,
            target - F.col("rank_hi"),
        ).cast("long").alias("rank_err"),
        F.expr(f"CAST((n + {int(accuracy)} - 1) DIV {int(accuracy)} AS BIGINT)").alias(
            "bound"
        ),
    )
    return out.select(
        "p_pm", "n", "exact_q", "sketch_q", "rank_err", "bound",
        (F.col("rank_err") <= F.col("bound")).cast("int").alias("within_bound"),
    )  # (terminal cosmetic sort dropped, r12 guide §2.4 — checkers are order-insensitive)


def reply_drift_chi2(fact: DataFrame, n_buckets: int = 10) -> DataFrame:
    """One row: χ² drift test of the reply-time distribution between
    the two halves of the date range — the TEMPORAL complement of
    ks_day_night (did the latency distribution move over time?), in
    the bucketed form monitoring systems deploy (the PSI shape, but
    χ² so the statistic stays log-free and integer-exact).

    Buckets are the FIRST half's own deciles (exact nearest-rank
    boundaries over the first-half value histogram — equal-mass by
    construction, so expected counts are never tiny); both halves are
    then counted per bucket and
        χ² = Σ_b (n_a·c_b^B − n_b·c_b^A)² / (n_a·n_b·(c_b^A + c_b^B))
    (the two-sample chi-square in cross-multiplied form — numerator
    and denominator exact DECIMAL(38,0) products, one division per
    bucket summed as doubles of exact integers... kept fully exact:
    the per-bucket terms are each ONE division of exact integers,
    summed after rounding is NOT allowed — so χ² is assembled as a
    single SUM over per-bucket exact-rational divisions, each
    correctly rounded; cross-engine identical because the summands
    and the summation ORDER (bucket id) are identical).

    Output: (n_first, n_second, n_buckets_used, chi2, dof).

    Scale: one date-column-only bounds scan plus one value-histogram
    pass, boundary selection over distinct values, a 10-row bucket
    relation whose totals are window sums over itself.
    """
    m = fact.filter(F.col("reply_time").isNotNull())
    # NB (r12, measured and kept two-pass): collapsing the fact to
    # (date, r) counts first so the bounds and the histogram share one
    # exchange was prototyped and REJECTED — column pruning rewrites
    # the bounds leg's aggregate (no count buffer), the two exchange
    # subtrees stop canonicalizing equal, AQE reuse does not fire
    # (executed plan: ReusedExchange 0), and the "shared" pass runs
    # the (date, r) aggregation twice. The bounds pass below reads the
    # date column only (columnar scan ≪ the fact), which is cheaper
    # than any non-reused second aggregation at every scale.
    bounds = m.agg(
        F.min("date").alias("d0"), F.max("date").alias("d1")
    ).select(
        F.expr("date_add(d0, CAST(datediff(d1, d0) DIV 2 AS INT))").alias(
            "mid"
        )
    )
    v = m.join(F.broadcast(bounds)).select(
        _reply_q().alias("r"),
        (F.col("date") < F.col("mid")).cast("int").alias("in_a"),
    )
    hist = v.groupBy("r").agg(
        F.sum("in_a").cast("long").alias("ca"),
        F.sum(1 - F.col("in_a")).cast("long").alias("cb"),
    )
    wc = Window.orderBy("r").rowsBetween(Window.unboundedPreceding, 0)
    h = hist.select(
        "r",
        "ca",
        "cb",
        F.sum("ca").over(wc).cast("long").alias("cum_a"),
        F.sum("ca").over(
            Window.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).cast("long").alias("na"),
    )
    # bucket of value r = number of decile boundaries strictly below
    # its first-half cumulative position: b = floor((cum_a-1)·B/na)
    # for first-half mass; values with ca = 0 (second-half-only) slot
    # by their cum_a position too (the boundary they fall under)
    b = F.expr(f"least(CAST((cum_a * {int(n_buckets)} - 1) DIV na AS INT), {int(n_buckets) - 1})")
    bucketed = h.filter(F.col("na") > 0).select(
        F.when(F.col("cum_a") > 0, b).otherwise(F.lit(0)).alias("b"),
        "ca",
        "cb",
    )
    per = bucketed.groupBy("b").agg(
        F.sum("ca").cast("long").alias("oa"),
        F.sum("cb").cast("long").alias("ob"),
    )
    # NB (r12, guide §2.4): `per` feeds BOTH the grand totals and the
    # per-bucket terms — a separate aggregate + broadcast join-back
    # re-executed the whole upstream per consumer (4 fact scans, 2
    # BroadcastNestedLoopJoins in the before-plan). The totals are
    # window sums over the ≤ n_buckets-row relation itself (the
    # accepted tiny-frame pattern): one lineage, half the scans.
    w_tot = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    dec = "decimal(38,0)"
    j = per.select(
        "b",
        "oa",
        "ob",
        F.sum("oa").over(w_tot).cast("long").alias("n_first"),
        F.sum("ob").over(w_tot).cast("long").alias("n_second"),
    )
    num = (
        F.col("n_first").cast(dec) * F.col("ob")
        - F.col("n_second").cast(dec) * F.col("oa")
    )
    den = (
        F.col("n_first").cast(dec)
        * F.col("n_second")
        * (F.col("oa") + F.col("ob"))
    )
    term = F.when(
        den > 0, (num * num).cast("double") / den.cast("double")
    ).otherwise(F.lit(0.0))
    # Σ over double terms is accumulation-ORDER-dependent, and Spark's
    # aggregate order is partition-dependent — so the sum runs as a
    # catalyst FOLD over the bucket-sorted term array (the ewma_fold
    # convention); the oracle replays the identical b-ordered left
    # fold in a recursive CTE ⇒ bit-identical chi2.
    out = j.select("b", term.alias("t"), "n_first", "n_second").groupBy(
        "n_first", "n_second"
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_buckets_used"),
        F.round(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("b", "t"))),
                F.lit(0.0),
                lambda acc, x: acc + x["t"],
            ),
            6,
        ).alias("chi2"),
    )
    return out.select(
        "n_first",
        "n_second",
        "n_buckets_used",
        "chi2",
        (F.col("n_buckets_used") - 1).cast("long").alias("dof"),
    )


def pettitt_changepoint(fact: DataFrame) -> DataFrame:
    """(n_days, change_date, u_at_k, k_stat, p_approx) — the Pettitt
    rank-based changepoint test over the daily count series (the
    nonparametric sibling of cusum_changepoint: it needs no variance
    estimate and ignores outlier magnitude, only order).

        V_t = Σ_j sgn(y_t − y_j)        (one n² pairwise scan)
        U_t = Σ_{i≤t} V_i               (one prefix sum)
        K   = max_{t<n} |U_t|,  changepoint = argmax (last day of the
                                                      first segment)

    All of V, U, K are exact BIGINTs; the argmax tie-break is pinned
    (|U| DESC, date ASC). ``p_approx`` is Pettitt's asymptotic
    2·exp(−6K²/(n³+n²)) — one IEEE exp over one exact rational,
    engine-identical, rounded to 6.

    Scale: the fact collapses to one row per day before anything
    quadratic; the n² self-join and the single-task prefix window run
    over the DAILY relation (calendar-bounded), never over events —
    the mann_kendall_trend contract.
    """
    daily = fact.groupBy("date").agg(
        F.count(F.lit(1)).cast("long").alias("y")
    )
    a = daily.select(F.col("date").alias("d1"), F.col("y").alias("y1"))
    b = daily.select(F.col("date").alias("d2"), F.col("y").alias("y2"))
    v = (
        a.join(b, F.col("d1") != F.col("d2"))
        .groupBy("d1")
        .agg(
            F.sum(F.signum(F.col("y1") - F.col("y2")).cast("long")).alias(
                "v"
            )
        )
    )
    w = Window.orderBy("d1").rowsBetween(Window.unboundedPreceding, 0)
    u = v.select(
        F.col("d1").alias("date"), F.sum("v").over(w).alias("u")
    )
    nn = daily.agg(F.count(F.lit(1)).cast("long").alias("n_days"))
    last = daily.agg(F.max("date").alias("last_date"))
    picked = (
        u.join(F.broadcast(last))
        .filter(F.col("date") < F.col("last_date"))
        .orderBy(F.abs("u").desc(), F.col("date").asc())
        .limit(1)
    )
    n = F.col("n_days").cast("double")
    k2 = (F.col("u") * F.col("u")).cast("double")
    p = 2.0 * F.exp(-6.0 * k2 / (n * n * n + n * n))
    return picked.join(F.broadcast(nn)).select(
        "n_days",
        F.col("date").alias("change_date"),
        F.col("u").alias("u_at_k"),
        F.abs("u").alias("k_stat"),
        F.round(F.least(p, F.lit(1.0)), 6).alias("p_approx"),
    )


def ljung_box_daily(fact: DataFrame, max_lag: int = 7) -> DataFrame:
    """(n_days, dof, q_stat) — the Ljung–Box portmanteau white-noise
    test over the daily count series at lags 1..max_lag (Ljung & Box
    1978): Q = n(n+2)·Σ_k ρ̂_k²/(n−k). The one-number companion of
    acf_daily_counts — "is there ANY autocorrelation structure left",
    e.g. over forecast residuals after a seasonal fit.

    ρ̂_k reuses the n²-cleared ACF form (num_k = Σ(n·x_t−S)(n·x_{t+k}−S),
    den = Σ(n·x_t−S)², both exact BIGINT). Each lag's term is
    (num/den)²/(n−k) in doubles — num/den is one correctly-rounded
    division — and the Σ over lags folds in ascending-k order via the
    same bucket-ordered catalyst fold the χ² drift query uses (the
    DuckDB recursive CTE replays it bit-for-bit). Q is that fold times
    exact n(n+2), rounded to 6. Lags with no pairs (k ≥ n) drop out of
    both the fold and ``dof``. Zero-variance series → q_stat NULL.

    Scale: identical to acf_daily_counts — day-grain relation, integer
    equi-join for the lag pairing, nothing touches event rows after
    the first partial agg.
    """
    daily = fact.groupBy("date").agg(
        F.count(F.lit(1)).cast("long").alias("x")
    )
    tot = daily.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").alias("s"),
        F.min("date").alias("d0"),
    )
    d = daily.join(F.broadcast(tot)).select(
        F.datediff("date", "d0").cast("long").alias("idx"),
        (F.col("n") * F.col("x") - F.col("s")).alias("c"),
        "n",
    ).localCheckpoint(eager=True)
        # Materialized ONCE (r12, guide §2.4 — the streak-kernel fix):
        # this dates-sized relation fans out to the lag-pair legs and
        # the denominator, each of which would otherwise re-run the
        # fact-wide daily aggregation upstream.
    lags = d.sparkSession.range(1, max_lag + 1).select(
        F.col("id").cast("int").alias("lag")
    )
    a = d.select(F.col("idx").alias("i1"), F.col("c").alias("c1"), "n")
    b = d.select(F.col("idx").alias("i2"), F.col("c").alias("c2"))
    pairs = (
        a.crossJoin(F.broadcast(lags))
        .join(b, F.col("i2") == F.col("i1") + F.col("lag"))
    )
    den = d.agg(F.sum(F.col("c") * F.col("c")).alias("den"))
    nums = (
        pairs.groupBy("lag")
        .agg(
            F.max("n").alias("n"),
            F.sum(F.col("c1") * F.col("c2")).alias("num"),
        )
        .join(F.broadcast(den))
    )
    # ANSI Spark raises on /0 even for doubles; a zero-variance series
    # (den = 0) must flow through to the NULL q_stat instead
    r = F.col("num").cast("double") / F.col("den").cast("double")
    terms = nums.select(
        "lag",
        "n",
        "den",
        F.when(
            F.col("den") > 0,
            r * r / (F.col("n") - F.col("lag")).cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("t"),
    )
    # GLOBAL agg (not groupBy) so the degenerate cases — single-day
    # series, or a calendar so gapped that no lag k <= max_lag pairs —
    # still emit exactly one row (dof=0, acc=0.0), matching the
    # oracle's one-row FROM tot, den, folded shape.  The (n, den)
    # scalars ride in from the one-row tot x den base instead.
    termagg = terms.agg(
        F.count(F.lit(1)).cast("long").alias("dof"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("lag", "t"))),
            F.lit(0.0),
            lambda acc, x: acc + x["t"],
        ).alias("acc"),
    )
    base = tot.join(F.broadcast(den))
    q = (F.col("n") * (F.col("n") + 2)).cast("double") * F.col("acc")
    return base.join(F.broadcast(termagg)).select(
        F.col("n").alias("n_days"),
        "dof",
        F.round(F.when(F.col("den") > 0, q), 6).alias("q_stat"),
    )


def kendall_tau_volume_reply(fact: DataFrame) -> DataFrame:
    """(n_days, n_pairs, conc_minus_disc, ties_y, ties_r, tau_b) —
    Kendall's τ-b between daily VOLUME and daily MEAN REPLY TIME, the
    rank-concordance companion of spearman_volume_reply (τ is the
    sign-level association: robust to any monotone transform and to
    single-day outliers that bend Spearman's squared rank gaps).

    Day means are never materialized as floats: the comparison
    m_i/c_i vs m_j/c_j cross-multiplies to m_i·c_j vs m_j·c_i in
    DECIMAL(38,0) (Σms at 10¹² ms·events per day × 10⁹ counts passes
    2⁶³). C−D, the tie counts and n₀ = n(n−1)/2 are exact integers;

        τ_b = (C−D) / sqrt((n₀−t_y)·(n₀−t_r))

    is one division over one IEEE sqrt of exact operands, rounded to
    6. Days with no measured replies are EXCLUDED (no mean exists —
    the reply_time_stats null-drop rule, P8).

    Scale: the mann_kendall contract — one partial agg to days, one
    n²/2 self-join of the DAILY relation, nothing touches event rows
    after the first shuffle.
    """
    dec = "decimal(38,0)"
    daily = (
        fact.groupBy("date")
        .agg(
            F.count(F.lit(1)).cast("long").alias("y"),
            F.sum(
                F.when(
                    F.col("reply_time").isNotNull(),
                    F.round(F.col("reply_time") * 1000).cast("long"),
                )
            ).alias("m"),
            F.count("reply_time").cast("long").alias("c"),
        )
        .filter(F.col("c") > 0)
    )
    a = daily.select(
        F.col("date").alias("d1"), F.col("y").alias("y1"),
        F.col("m").alias("m1"), F.col("c").alias("c1"),
    )
    b = daily.select(
        F.col("date").alias("d2"), F.col("y").alias("y2"),
        F.col("m").alias("m2"), F.col("c").alias("c2"),
    )
    pairs = a.join(b, F.col("d1") < F.col("d2"))
    sy = F.signum((F.col("y1") - F.col("y2")).cast("double")).cast("long")
    cross = F.col("m1").cast(dec) * F.col("c2") - F.col("m2").cast(dec) * F.col("c1")
    sr = F.when(cross > 0, 1).when(cross < 0, -1).otherwise(0).cast("long")
    agg = pairs.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum(sy * sr).cast("long").alias("cmd"),
        F.sum((sy == 0).cast("long")).cast("long").alias("ties_y"),
        F.sum((sr == 0).cast("long")).cast("long").alias("ties_r"),
    )
    nn = daily.agg(F.count(F.lit(1)).cast("long").alias("n_days"))
    den = (
        (F.col("n_pairs") - F.col("ties_y")).cast("double")
        * (F.col("n_pairs") - F.col("ties_r")).cast("double")
    )
    tau = F.when(
        (F.col("n_pairs") > F.col("ties_y"))
        & (F.col("n_pairs") > F.col("ties_r")),
        F.col("cmd").cast("double") / F.sqrt(den),
    )
    return agg.join(F.broadcast(nn)).select(
        "n_days",
        "n_pairs",
        F.col("cmd").alias("conc_minus_disc"),
        "ties_y",
        "ties_r",
        F.round(tau, 6).alias("tau_b"),
    )


def seasonal_mann_kendall(fact: DataFrame) -> DataFrame:
    """(n_days, s_stat, var18_num, z) — the SEASONAL Mann–Kendall
    trend test at weekly period (Hirsch & Slack 1984, independent-
    seasons form): mann_kendall_trend compares every day against
    every other day, so a strong weekday cycle drowns a real trend in
    cross-weekday sign noise; here pairs are formed only WITHIN each
    weekday's subseries and the per-season statistics add:

        S' = Σ_w S_w,   Var'·18 = Σ_w [n_w(n_w−1)(2n_w+5) − ties_w]

    All integers exact BIGINT (the mann_kendall_trend bounds apply
    per weekday); Z is the same continuity-corrected one-division +
    one-sqrt expression. A PURE weekly cycle yields S' = 0 exactly
    (every weekday subseries is constant) — test-pinned.

    Scale: the pairwise scan self-joins the daily relation ON THE
    WEEKDAY KEY (≤ n²/7 day pairs); ties aggregate per (weekday, y).
    Nothing touches event rows after the first partial agg.
    """
    daily = fact.groupBy("date").agg(F.count(F.lit(1)).alias("y")).select(
        "date", "y", F.dayofweek("date").cast("int").alias("wd")
    )
    a = daily.select("wd", F.col("date").alias("d1"), F.col("y").alias("y1"))
    b = daily.select(
        F.col("wd").alias("wd2"), F.col("date").alias("d2"),
        F.col("y").alias("y2"),
    )
    s = (
        a.join(b, (F.col("wd") == F.col("wd2")) & (F.col("d1") < F.col("d2")))
        .agg(
            F.coalesce(
                F.sum(F.signum(F.col("y2") - F.col("y1")).cast("long")),
                F.lit(0),
            ).alias("s_stat")
        )
    )
    per_wd = daily.groupBy("wd").agg(
        F.count(F.lit(1)).cast("long").alias("n_w")
    )
    var_pos = per_wd.agg(
        F.sum(
            F.col("n_w") * (F.col("n_w") - 1) * (2 * F.col("n_w") + 5)
        ).alias("var_pos"),
        F.sum("n_w").cast("long").alias("n_days"),
    )
    ties = (
        daily.groupBy("wd", "y")
        .agg(F.count(F.lit(1)).cast("long").alias("t"))
        .agg(
            F.sum(
                F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
            ).alias("tie_term")
        )
    )
    var18 = F.col("var_pos") - F.coalesce(F.col("tie_term"), F.lit(0))
    s_ = F.col("s_stat")
    corrected = F.when(s_ > 0, s_ - 1).when(s_ < 0, s_ + 1).otherwise(F.lit(0))
    var = var18.cast("double") / 18.0
    z = F.when(
        (s_ == 0) | (var18 <= 0), F.lit(0.0)
    ).otherwise(corrected.cast("double") / F.sqrt(var))
    return (
        s.join(F.broadcast(var_pos))
        .join(F.broadcast(ties))
        .select(
            "n_days",
            s_.alias("s_stat"),
            var18.cast("long").alias("var18_num"),
            F.round(z, 6).alias("z"),
        )
    )


def blocked_rate_trend(fact: DataFrame) -> DataFrame:
    """(n_days, n_total, blocked_total, z) — the Cochran–Armitage
    trend test on the daily BLOCKED PROPORTION with day-index scores:
    "is the block RATE drifting, volume changes aside?" (a volume
    trend moves mann_kendall_trend; only a composition shift moves
    this).

    With t_i the day index, n_i/b_i the day's total/blocked counts,
    N = Σn, B = Σb, and the exact integer moments Σt·b, Σt·n, Σn·t²:

        num = N·Σtb − B·Σtn
        Z   = num · sqrt(N / (B·(N−B))) / sqrt(N·Σnt² − (Σtn)²)

    Every moment and num are exact (DECIMAL(38,0); N·Σnt² at 10¹²
    events × 3.7k² day-scores stays < 10³⁸); Z is a fixed IEEE tree
    over the exact operands. A day-constant block share makes num = 0
    EXACTLY (b_i = c·n_i ⇒ N·Σtb = B·Σtn) — test-pinned. Degenerate
    B ∈ {0, N} or a single day yields NULL z.

    Scale: one map-side-combined groupBy(date), then one scalar
    aggregate — nothing else.
    """
    dec = "decimal(38,0)"
    daily = fact.groupBy("date").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum((F.col("status_type") == "Blocked").cast("long"))
        .cast("long")
        .alias("b"),
    )
    d0 = daily.agg(F.min("date").alias("d0"))
    scored = daily.join(F.broadcast(d0)).select(
        "n", "b", F.datediff("date", "d0").cast("long").alias("t")
    )
    agg = scored.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("n").cast("long").alias("nn"),
        F.sum("b").cast("long").alias("bb"),
        F.sum(F.col("t").cast(dec) * F.col("b")).cast(dec).alias("stb"),
        F.sum(F.col("t").cast(dec) * F.col("n")).cast(dec).alias("stn"),
        F.sum(F.col("n").cast(dec) * F.col("t") * F.col("t"))
        .cast(dec)
        .alias("snt2"),
    )
    num = F.col("nn").cast(dec) * F.col("stb") - F.col("bb").cast(dec) * F.col("stn")
    den1 = F.col("bb").cast("double") * (F.col("nn") - F.col("bb")).cast("double")
    den2 = (
        F.col("nn").cast(dec) * F.col("snt2")
        - F.col("stn") * F.col("stn")
    ).cast("double")
    z = F.when(
        (F.col("bb") > 0) & (F.col("bb") < F.col("nn")) & (den2 > 0),
        num.cast("double")
        * F.sqrt(F.col("nn").cast("double") / den1)
        / F.sqrt(den2),
    )
    return agg.select(
        "n_days",
        F.col("nn").alias("n_total"),
        F.col("bb").alias("blocked_total"),
        F.round(z, 6).alias("z"),
    )


_WEEKDAYS = (
    "Monday", "Tuesday", "Wednesday", "Thursday",
    "Friday", "Saturday", "Sunday",
)
_STATUSES = ("Allowed", "Blocked", "Other")


def weekday_anova_reply(fact: DataFrame) -> DataFrame:
    """One row: one-way ANOVA F across the seven weekday groups of
    quantized reply times — the k-group generalization of
    welch_day_night ("does latency differ BY WEEKDAY at all?", the
    omnibus question before any pairwise test).

    Exact-sufficient-statistic policy (the welch convention): per
    weekday n_g (BIGINT) and S_g = Σr (BIGINT), plus the global
    N / S / Q = Σr² (DECIMAL(38,0)) — one map-side-combined aggregate.
    The between-group term A = Σ_g S_g²/n_g is a FIXED Mon→Sun
    left-associative chain of one correctly-rounded division per
    group (S_g² exact in DECIMAL(38,0)/HUGEINT — ≤10³² at any
    volume); SSB = A − S²/N, SSW = Q − A, and
    F = (SSB/(k−1)) / (SSW/(N−k)) with k the count of non-empty
    groups. Every fp step is one fixed IEEE expression over exact
    operands — engine-identical. Zero within-variance (all values
    equal) → f_stat NULL.

    Scale: one aggregation over the fact, nothing else. No windows.
    """
    r = _reply_q()
    m = fact.filter(F.col("reply_time").isNotNull())
    dec = "decimal(38,0)"
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n_total"),
        F.coalesce(F.sum(r), F.lit(0)).cast("long").alias("s_total"),
        F.coalesce(
            F.sum((r * r).cast(dec)), F.lit(0).cast(dec)
        ).alias("q_total"),
    ]
    for i, d in enumerate(_WEEKDAYS):
        c = F.col("day_name") == d
        aggs.append(F.count(F.when(c, 1)).cast("long").alias(f"n{i}"))
        aggs.append(
            F.coalesce(F.sum(F.when(c, r)), F.lit(0))
            .cast("long")
            .alias(f"s{i}")
        )
    agg = m.agg(*aggs)
    a_chain = F.lit(0.0)
    k_chain = F.lit(0).cast("long")
    for i in range(7):
        si = F.col(f"s{i}").cast(dec)
        a_chain = a_chain + F.when(
            F.col(f"n{i}") > 0,
            (si * si).cast("double") / F.col(f"n{i}").cast("double"),
        ).otherwise(F.lit(0.0))
        k_chain = k_chain + F.when(F.col(f"n{i}") > 0, 1).otherwise(0)
    nd = F.col("n_total").cast("double")
    sd = F.col("s_total").cast("double")
    qd = F.col("q_total").cast("double")
    with_a = agg.select(
        "n_total",
        "s_total",
        qd.alias("q_total"),
        k_chain.alias("k_groups"),
        F.when(F.col("n_total") > 0, a_chain - sd * sd / nd).alias("ssb"),
        F.when(F.col("n_total") > 0, qd - a_chain).alias("ssw"),
    )
    kd = F.col("k_groups").cast("double")
    ok = (
        (F.col("k_groups") > 1)
        & (F.col("n_total") > F.col("k_groups"))
        & (F.col("ssw") > 0)
    )
    f_stat = (F.col("ssb") / (kd - 1.0)) / (
        F.col("ssw") / (F.col("n_total").cast("double") - kd)
    )
    return with_a.select(
        "n_total",
        "k_groups",
        "s_total",
        "q_total",
        F.round(F.col("ssb"), 6).alias("ssb"),
        F.round(F.col("ssw"), 6).alias("ssw"),
        F.round(F.when(ok, f_stat), 6).alias("f_stat"),
    )


def kruskal_wallis_weekday(fact: DataFrame) -> DataFrame:
    """One row: Kruskal–Wallis rank H across the seven weekday groups
    of quantized reply times — the nonparametric omnibus twin of
    weekday_anova_reply (the mann_whitney midrank machinery
    generalized from 2 to k groups).

    Doubled midranks over the merged value histogram keep everything
    integer: for a value with f occurrences and cum occurrences
    strictly below it, midrank2 = 2·cum + f + 1; the per-group rank
    sums R2_g = Σ cnt_g·midrank2 are exact (DECIMAL(38,0)). With
    R_g = R2_g/2 and B = Σ_g R2_g²/n_g (so Σ R_g²/n_g = B/4),
        H = 12/(N(N+1))·(B/4) − 3(N+1) = 3·B/(N(N+1)) − 3(N+1)
    — B is the same fixed Mon→Sun chain of one division per group
    (R2_g² ≤ 4·10³⁶ < 10³⁸ up to ~5·10⁹ measured rows; past that
    widen — the blocked_rate_trend bound note). Tie correction
    C = 1 − Σ(f³−f)/(N³−N) from exact integer tie masses; h_corrected
    = H/C, NULL when every value ties (C = 0).

    Scale: one shuffle to the value histogram; the only window orders
    DISTINCT reply values (the histogram-window class — never event
    rows).
    """
    from pyspark.sql import Window as W

    r = _reply_q()
    dec = "decimal(38,0)"
    m = fact.filter(F.col("reply_time").isNotNull()).select(
        r.alias("v"), "day_name"
    )
    hist_aggs = [F.count(F.lit(1)).cast("long").alias("f")]
    for i, d in enumerate(_WEEKDAYS):
        hist_aggs.append(
            F.count(F.when(F.col("day_name") == d, 1))
            .cast("long")
            .alias(f"c{i}")
        )
    hist = m.groupBy("v").agg(*hist_aggs)
    cum_before = F.coalesce(
        F.sum("f").over(
            W.orderBy("v").rowsBetween(W.unboundedPreceding, -1)
        ),
        F.lit(0),
    )
    ranked = hist.withColumn(
        "mr2", (2 * cum_before + F.col("f") + 1).cast("long")
    )
    # tie masses and rank sums accumulate in DECIMAL(38,0) with the
    # PRODUCTS formed on decimal operands too — f³ and cnt·midrank2
    # pass 2⁶³ long before they pass 10³⁸ (the degree_assortativity
    # bound note; DuckDB's HUGEINT mirrors this exactly).
    sum_aggs = [
        F.coalesce(F.sum("f"), F.lit(0)).cast("long").alias("n_total"),
        F.sum(
            F.col("f").cast(dec) * F.col("f") * F.col("f") - F.col("f")
        ).alias("ties_t"),
    ]
    for i in range(7):
        sum_aggs.append(F.sum(f"c{i}").cast("long").alias(f"n{i}"))
        sum_aggs.append(
            F.sum(F.col(f"c{i}").cast(dec) * F.col("mr2")).alias(f"r2_{i}")
        )
    agg = ranked.agg(*sum_aggs)
    b_chain = F.lit(0.0)
    k_chain = F.lit(0).cast("long")
    for i in range(7):
        r2 = F.coalesce(F.col(f"r2_{i}"), F.lit(0).cast(dec))
        b_chain = b_chain + F.when(
            F.col(f"n{i}") > 0,
            (r2 * r2).cast("double") / F.col(f"n{i}").cast("double"),
        ).otherwise(F.lit(0.0))
        k_chain = k_chain + F.when(F.col(f"n{i}") > 0, 1).otherwise(0)
    nd = F.col("n_total").cast("double")
    # B carries R2² = 4·R², so 12/(N(N+1))·(B/4) = 3·B/(N(N+1))
    h = 3.0 * b_chain / (nd * (nd + 1.0)) - 3.0 * (nd + 1.0)
    c_corr = 1.0 - F.col("ties_t").cast("double") / (nd * nd * nd - nd)
    ok = (k_chain > 1) & (F.col("n_total") > 1)
    return agg.select(
        "n_total",
        k_chain.alias("k_groups"),
        F.col("ties_t").cast("double").alias("ties_t"),
        F.round(F.when(ok, h), 6).alias("h_stat"),
        F.round(
            F.when(ok & (c_corr > 0), h / c_corr), 6
        ).alias("h_corrected"),
    )


def weekday_status_cramers_v(fact: DataFrame) -> DataFrame:
    """One row: χ² independence + Cramér's V over the FIXED 7×3
    weekday × status_type contingency table ("is blocking behavior a
    function of the weekday?") — the association-strength companion
    of weekday_chi2_uniformity's one-way goodness of fit.

    All 21 cells are literal (day_name, status_type) conditions (the
    status domain is fixed by the fact derivation, events.py:130-134),
    so the whole table is ONE map-side-combined aggregate and χ² is a
    fixed left-associative 21-term chain in (weekday, status) order:
    term = d²/(r·c) with d = CAST(N·O − r·c AS DOUBLE) — the
    difference exact in DECIMAL(38,0)/HUGEINT, squared in DOUBLE so no
    product exceeds 10³⁸ at any volume. χ² = chain/N;
    V = √(χ²/(N·min(k−1, m−1))) over the non-empty row/col counts.
    Cells in empty rows/columns contribute 0 (they are not part of
    the realized table). Degenerate tables (k ≤ 1 or m ≤ 1) → NULL.

    Scale: one aggregation over the fact; no windows, no joins.
    """
    dec = "decimal(38,0)"
    aggs = [F.count(F.lit(1)).cast("long").alias("n_total")]
    for i, d in enumerate(_WEEKDAYS):
        aggs.append(
            F.count(F.when(F.col("day_name") == d, 1))
            .cast("long")
            .alias(f"r{i}")
        )
    for j, s in enumerate(_STATUSES):
        aggs.append(
            F.count(F.when(F.col("status_type") == s, 1))
            .cast("long")
            .alias(f"c{j}")
        )
    for i, d in enumerate(_WEEKDAYS):
        for j, s in enumerate(_STATUSES):
            aggs.append(
                F.count(
                    F.when(
                        (F.col("day_name") == d)
                        & (F.col("status_type") == s),
                        1,
                    )
                )
                .cast("long")
                .alias(f"o{i}_{j}")
            )
    agg = fact.agg(*aggs)
    chain = F.lit(0.0)
    for i in range(7):
        for j in range(3):
            num = (
                F.col("n_total").cast(dec) * F.col(f"o{i}_{j}")
                - F.col(f"r{i}").cast(dec) * F.col(f"c{j}")
            )
            rc = (F.col(f"r{i}").cast(dec) * F.col(f"c{j}")).cast("double")
            d_dbl = num.cast("double")
            chain = chain + F.when(
                (F.col(f"r{i}") > 0) & (F.col(f"c{j}") > 0),
                d_dbl * d_dbl / rc,
            ).otherwise(F.lit(0.0))
    k_chain = F.lit(0).cast("long")
    for i in range(7):
        k_chain = k_chain + F.when(F.col(f"r{i}") > 0, 1).otherwise(0)
    m_chain = F.lit(0).cast("long")
    for j in range(3):
        m_chain = m_chain + F.when(F.col(f"c{j}") > 0, 1).otherwise(0)
    nd = F.col("n_total").cast("double")
    chi2 = chain / nd
    mind = F.least(k_chain - 1, m_chain - 1).cast("double")
    ok = (k_chain > 1) & (m_chain > 1) & (F.col("n_total") > 0)
    return agg.select(
        "n_total",
        k_chain.alias("k_weekdays"),
        m_chain.alias("m_statuses"),
        F.round(F.when(ok, chi2), 6).alias("chi2"),
        F.round(F.when(ok, F.sqrt(chi2 / (nd * mind))), 6).alias(
            "cramers_v"
        ),
    )


def day_night_effect_panel(fact: DataFrame) -> DataFrame:
    """One row: the two-proportion EFFECT-SIZE panel for the blocked
    rate, Day vs Night — pooled two-proportion z plus the risk ratio
    and odds ratio an analyst actually reports next to it
    (epidemiology's 2×2 toolkit over the day/night × blocked/other
    table).

    Counts are exact BIGINTs from one aggregate. The ratios avoid
    intermediate quotients entirely: RR = (x₁/n₁)/(x₂/n₂) is computed
    as the single division x₁·n₂ / (x₂·n₁) over exact cross products
    (DECIMAL(38,0)/HUGEINT), OR likewise x₁·(n₂−x₂) / (x₂·(n₁−x₁));
    z is one fixed IEEE expression over the pooled proportion.
    Degenerate margins (an empty group, a zero or saturated pooled
    rate) → NULL for the affected statistic.

    Scale: one map-side-combined aggregate; no joins, no windows.
    """
    dec = "decimal(38,0)"
    day = F.col("day_period") == "Day"
    night = F.col("day_period") == "Night"
    blocked = F.col("status_type") == "Blocked"
    agg = fact.agg(
        F.count(F.when(day, 1)).cast("long").alias("n1"),
        F.count(F.when(day & blocked, 1)).cast("long").alias("x1"),
        F.count(F.when(night, 1)).cast("long").alias("n2"),
        F.count(F.when(night & blocked, 1)).cast("long").alias("x2"),
    )
    n1, x1 = F.col("n1"), F.col("x1")
    n2, x2 = F.col("n2"), F.col("x2")
    n1d, x1d = n1.cast("double"), x1.cast("double")
    n2d, x2d = n2.cast("double"), x2.cast("double")
    pd_ = (x1d + x2d) / (n1d + n2d)
    z = (x1d / n1d - x2d / n2d) / F.sqrt(
        pd_ * (1.0 - pd_) * (1.0 / n1d + 1.0 / n2d)
    )
    rr = (x1.cast(dec) * n2).cast("double") / (
        x2.cast(dec) * n1
    ).cast("double")
    orr = (x1.cast(dec) * (n2 - x2)).cast("double") / (
        x2.cast(dec) * (n1 - x1)
    ).cast("double")
    both = (n1 > 0) & (n2 > 0)
    pooled_ok = both & (x1 + x2 > 0) & (x1 + x2 < n1 + n2)
    return agg.select(
        "n1",
        "x1",
        "n2",
        "x2",
        F.round(F.when(pooled_ok, z), 6).alias("z_stat"),
        F.round(F.when(both & (x2 > 0), rr), 6).alias("risk_ratio"),
        F.round(
            F.when(both & (x2 > 0) & (x1 < n1), orr), 6
        ).alias("odds_ratio"),
    )


def weekly_periodogram(fact: DataFrame, harmonics: int = 3) -> DataFrame:
    """One row per harmonic k = 1..``harmonics``: the periodogram of
    the daily count series AT THE WEEKLY FREQUENCY family (period 7/k
    days) — the spectral companion of acf_daily_counts and
    seasonal_mann_kendall ("how much of the variance is the weekly
    cycle, exactly?").

    Order-free by construction: with c_i = n·y_i − S the n-cleared
    deviation (exact BIGINT, the ljung/acf clearing) and day index
    idx = date − d₀, the trig sums collapse over idx mod 7 FIRST —
    Σ_i c_i·cos(2πk·idx/7) = Σ_{m=0}^{6} cos(2πk·m/7)·g_m with
    g_m = Σ_{idx≡m} c_i an exact integer. The seven g_m come from one
    aggregate; each harmonic's cos/sin sums are then a FIXED 7-term
    literal chain (cos/sin values computed once driver-side and
    embedded identically in both engines — the plane_signs literal
    discipline), so no fp value ever crosses rows and no fold CTE is
    needed. power = cos_sum² + sin_sum²; power_share = power /
    (n·den) with den = Σc² exact (Parseval-normalized: the weekly
    line's share of total variance, ½·amplitude² in the pure-cosine
    limit up to the discrete-grid constant).

    Scale: one partial agg to days, one 8-sum aggregate. No windows.
    """
    import math

    daily = fact.groupBy("date").agg(
        F.count(F.lit(1)).cast("long").alias("y")
    )
    tot = daily.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").alias("s"),
        F.min("date").alias("d0"),
    )
    d = daily.join(F.broadcast(tot)).select(
        (F.datediff("date", "d0") % 7).cast("int").alias("m"),
        (F.col("n") * F.col("y") - F.col("s")).alias("c"),
    )
    # c ≤ n_days·max_daily — the square and the g_m sums pass 2⁶³ long
    # before 10³⁸, so both accumulate in DECIMAL(38,0)/HUGEINT (the
    # degree_assortativity bound rule).
    dec = "decimal(38,0)"
    aggs = [
        F.coalesce(
            F.sum(F.col("c").cast(dec) * F.col("c")), F.lit(0).cast(dec)
        ).alias("den"),
    ]
    for m in range(7):
        aggs.append(
            F.coalesce(
                F.sum(F.when(F.col("m") == m, F.col("c").cast(dec))),
                F.lit(0).cast(dec),
            ).alias(f"g{m}")
        )
    g = d.agg(*aggs).join(F.broadcast(tot.select("n")))
    # The 1-row aggregate fans out to every harmonic leg: instead of a
    # union of per-harmonic selects (each re-running the daily
    # aggregation) build ALL harmonics as one array-of-structs
    # projection and explode — single scan, no materialization needed
    # (r12, guide §2.4).
    legs = []
    for k in range(1, harmonics + 1):
        cos_chain = F.lit(0.0)
        sin_chain = F.lit(0.0)
        for m in range(7):
            cos_chain = cos_chain + F.col(f"g{m}").cast("double") * F.lit(
                math.cos(2.0 * math.pi * k * m / 7.0)
            )
            sin_chain = sin_chain + F.col(f"g{m}").cast("double") * F.lit(
                math.sin(2.0 * math.pi * k * m / 7.0)
            )
        power = cos_chain * cos_chain + sin_chain * sin_chain
        ok = (F.col("n") > 1) & (F.col("den") > 0)
        legs.append(
            F.struct(
                F.lit(k).cast("long").alias("harmonic"),
                F.col("n").alias("n_days"),
                F.col("den").cast("double").alias("den"),
                F.round(cos_chain, 6).alias("cos_sum"),
                F.round(sin_chain, 6).alias("sin_sum"),
                F.round(
                    F.when(
                        ok,
                        power
                        / (F.col("n").cast("double") * F.col("den").cast("double")),
                    ),
                    9,
                ).alias("power_share"),
            )
        )
    return g.select(
        F.explode(F.array(*legs)).alias("h")
    ).select("h.*")  # (terminal cosmetic sort dropped, r12 guide §2.4 — checkers are order-insensitive)
