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
    )  # (terminal cosmetic sort dropped, r12 guide §2.4 — checkers are order-insensitive)


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
    )  # (terminal cosmetic sort dropped, r12 guide §2.4 — checkers are order-insensitive)


def running_zscore_by_client(daily: DataFrame) -> DataFrame:
    """PREQUENTIAL per-client z-score over a (client, date, y) daily
    relation: each day is scored against the client's history STRICTLY
    BEFORE it — the online form a streaming monitor can maintain
    (client_daily_spikes scores against the full period, which a
    stream cannot know; this is its one-pass-causal sibling and the
    BATCH TWIN of streaming/welford.streaming_client_zscore, stream ≡
    batch pinned on shared files).

    With n, S = Σy, Q = Σy² over the client's PRIOR days:

        z = (n·y − S) · sqrt( (n−1) / (n · (n·Q − S²)) )

    n, S, Q are exact integer window sums (Q widened to DECIMAL(38,0):
    y² at 10⁹/day passes 2⁶³ after a few days); z is the one fp
    expression, identical tree in both engines. The spike DECISION is
    fp-free: |z| > 3  ⇔  (n·y−S)²·(n−1) > 9·n·(n·Q−S²), carried in
    DECIMAL(38,0) (bounded < 10³⁰ at 3.7k days × 10⁹/day). When the
    prior history has zero variance, z is NULL and the gate reduces to
    n·y ≠ S (any deviation from a constant history is a spike).

    Rows with n < 2 (first two days of a client) are not scored.

    Scale: windows are client-partitioned over the DAILY relation
    (≤ days rows per client, calendar-bounded) — no global windows,
    no event-row windows.
    """
    dec = "decimal(38,0)"
    w = (
        Window.partitionBy("client")
        .orderBy("date")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    scored = daily.select(
        "client",
        "date",
        "y",
        F.count("y").over(w).cast("long").alias("n_prior"),
        F.sum("y").over(w).cast("long").alias("s_prior"),
        F.sum(F.col("y").cast(dec) * F.col("y")).over(w).cast(dec).alias(
            "q_prior"
        ),
    ).filter(F.col("n_prior") >= 2)
    n = F.col("n_prior")
    num = n.cast(dec) * F.col("y") - F.col("s_prior")
    varnum = n.cast(dec) * F.col("q_prior") - (
        F.col("s_prior").cast(dec) * F.col("s_prior")
    )
    z = F.when(
        varnum > 0,
        num.cast("double")
        * F.sqrt(
            (n - 1).cast("double") / (n.cast("double") * varnum.cast("double"))
        ),
    )
    spike = (num * num * (n.cast(dec) - 1) > F.lit(9).cast(dec) * n * varnum)
    # No terminal global sort (r12, guide §2.4): the scored relation
    # is client×date-sized; the range exchange + its sampling pass
    # cost more than the ordering is worth to either checker (driver
    # hash order-insensitive, check_oracle sorts rows).
    return scored.select(
        "client",
        "date",
        "y",
        "n_prior",
        F.round(z, 6).alias("z"),
        spike.cast("int").alias("is_spike"),
    )


def topk_domain_stability(fact: DataFrame, k: int = 10) -> DataFrame:
    """One row: rank-stability audit of the top-``k`` domains between
    the first and second half of the date range — "is the head of the
    traffic distribution drifting?" (the set-level companion of
    domain_share_movers' share deltas).

    The range splits at d₀ + ⌊span/2⌋ days (second half starts AT the
    midpoint day, exclusive-end convention). Each half's top-k is the
    pinned (cnt DESC, domain ASC) total order — deterministic under
    ties — and the audit is pure integer arithmetic: n_common =
    |A ∩ B|, jaccard_ppm = common·10⁶ DIV (|A| + |B| − common).

    Scale: two filtered domain aggregates (map-side combined), two
    TakeOrderedAndProject top-k cuts (k-row heaps per partition), one
    k-row intersection join. Nothing event-sized crosses the wire
    after the first partial agg.
    """
    bounds = fact.agg(
        F.min("date").alias("d0"), F.max("date").alias("d1")
    )
    b = bounds.collect()[0]
    if b["d0"] is None:
        # one well-formed row even on empty input (the ljung_box
        # one-row lesson: the oracle's scalar-subquery shape always
        # emits one row, so the Spark side must too)
        return fact.sparkSession.createDataFrame(
            [(int(k), 0, 0, 0, None)],
            "k long, n_first long, n_second long, n_common long, "
            "jaccard_ppm long",
        )
    span = (b["d1"] - b["d0"]).days
    import datetime as _dt

    mid = b["d0"] + _dt.timedelta(days=span // 2)

    def half_top(cond):
        return (
            fact.filter(cond)
            .groupBy("domain")
            .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("domain").asc())
            .limit(k)
        )

    a = half_top(F.col("date") < F.lit(mid)).select("domain")
    c = half_top(F.col("date") >= F.lit(mid)).select("domain")
    na = a.agg(F.count(F.lit(1)).cast("long").alias("n_first"))
    nc = c.agg(F.count(F.lit(1)).cast("long").alias("n_second"))
    common = a.join(c, "domain", "left_semi").agg(
        F.count(F.lit(1)).cast("long").alias("n_common")
    )
    return (
        na.join(F.broadcast(nc))
        .join(F.broadcast(common))
        .select(
            F.lit(int(k)).cast("long").alias("k"),
            "n_first",
            "n_second",
            "n_common",
            F.expr(
                "CASE WHEN n_first + n_second - n_common > 0 THEN "
                "n_common * 1000000 DIV (n_first + n_second - n_common) "
                "END"
            ).alias("jaccard_ppm"),
        )
    )
