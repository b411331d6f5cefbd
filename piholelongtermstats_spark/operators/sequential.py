"""Sequential / window operators (M4) — the order-dependent 20%.

Reference: idle gaps via ``ts.diff()`` (stats.py:515, 369-408), average
time between blocked/allowed queries (stats.py:382-388), and
gaps-and-islands streak detection (stats.py:506-515 flags,
stats.py:324-366 aggregation).

Total-order caveat (SURVEY.md §2.6): a naive ``Window.orderBy(ts)``
with no partitioning funnels the whole table through one task. The gap
operators here use the distributed decomposition instead:

  1. lag within date partitions (parallel — date is derived from ts so
     partition order ⊂ global order), plus
  2. cross-midnight gaps from a per-date first/last summary (one row
     per date — tiny), unioned in.

This yields exactly the global-order result with no single-task stage
over the fact table. Streak detection keeps a documented global-order
window on a 3-column projection (ts, id, status) — see
``longest_streaks`` for the scale plan.

Event order is pinned to (ts, event_id): timestamps can tie, and an
unpinned order would be nondeterministic under oracle hashing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def consecutive_gaps(
    df: DataFrame,
    ts_col: str = "ts",
    id_col: str = "event_id",
    date_col: str = "date",
    stream_keys: list[str] | None = None,
) -> DataFrame:
    """(prev_ts, next_ts, gap_us) for every consecutive pair in global
    (ts, id) order — distributed via date-partition + boundary stitch.

    ``stream_keys`` splits the input into independent ordered streams
    (e.g. per status_type) computed in ONE pass: all windows partition
    by (stream_keys…, date), the boundary summary by stream key — no
    per-stream filtered re-scans. Output carries the stream keys.

    gap_us is exact integer microseconds (both engines compute
    epoch-microsecond BIGINT subtraction — no float drift).
    """
    keys = list(stream_keys or [])
    cols = [F.col(k) for k in keys] + [
        F.col(date_col).alias("_d"),
        F.col(ts_col).alias("_ts"),
        F.col(id_col).alias("_id"),
    ]
    ev = df.select(*cols)

    w_day = Window.partitionBy(*keys, "_d").orderBy("_ts", "_id")
    within = (
        ev.withColumn("prev_ts", F.lag("_ts").over(w_day))
        .filter(F.col("prev_ts").isNotNull())
        .select(*keys, "prev_ts", F.col("_ts").alias("next_ts"))
    )

    per_day = ev.groupBy(*keys, "_d").agg(
        F.min(F.struct("_ts", "_id")).alias("first_ev"),
        F.max(F.struct("_ts", "_id")).alias("last_ev"),
    )
    # one row per (stream, date) — the single-task window is over a
    # tiny summary, and partitions by stream key when keys are given
    w_days = Window.partitionBy(*keys).orderBy("_d") if keys else Window.orderBy("_d")
    boundary = (
        per_day.withColumn("prev_last", F.lag("last_ev").over(w_days))
        .filter(F.col("prev_last").isNotNull())
        .select(
            *keys,
            F.col("prev_last._ts").alias("prev_ts"),
            F.col("first_ev._ts").alias("next_ts"),
        )
    )
    both = within.unionByName(boundary)
    return both.select(
        *keys,
        "prev_ts",
        "next_ts",
        (F.unix_micros(F.col("next_ts")) - F.unix_micros(F.col("prev_ts"))).alias(
            "gap_us"
        ),
    )


def idle_gaps_top(fact: DataFrame, k: int = 10) -> DataFrame:
    """Top-K largest idle gaps with both endpoints (stats.py:369-408, W4).

    The reference finds idxmax then positionally reads rows idx-1/idx
    (stats.py:390-402); carrying prev_ts through the lag makes both
    endpoints one row — no positional lookup.
    """
    return consecutive_gaps(fact).orderBy(
        F.col("gap_us").desc(), F.col("next_ts").asc()
    ).limit(k)


def avg_gap_per_status(fact: DataFrame) -> DataFrame:
    """Average seconds between consecutive same-status queries
    (stats.py:382-388, A17), for Blocked and Allowed.

    Consecutive-within-status ⇒ independent per-status streams, all
    computed in ONE pass via stream-keyed windows (no per-status
    re-scan of the fact table). A status with <2 events still yields
    a row (NULL avg) via the left join against the status spine.
    Exact integer sum of gap_us, one division ⇒ deterministic double.
    """
    statuses = ("Blocked", "Allowed")
    gaps = consecutive_gaps(
        fact.filter(F.col("status_type").isin(*statuses)),
        stream_keys=["status_type"],
    )
    agg = gaps.groupBy("status_type").agg(
        F.round(
            F.sum("gap_us").cast("double") / F.count(F.lit(1)) / 1000000.0, 6
        ).alias("avg_gap_sec")
    )
    spine = fact.sparkSession.createDataFrame(
        [(s,) for s in statuses], "status_type string"
    )
    return spine.join(agg, "status_type", "left").select(
        "status_type", "avg_gap_sec"
    )


def longest_streaks(fact: DataFrame) -> DataFrame:
    """Longest consecutive run per status bucket: (status_type,
    streak_len, start_ts) — gaps-and-islands (stats.py:324-366 +
    flags at stats.py:506-515, W3/W5).

    Classic idiom: change-flag via lag → running sum over an
    unbounded-preceding frame → run-id groupBy → top-1 per status with
    pinned tie-break (len DESC, start_ts ASC).

    Scale note: the run-id assignment needs a total order, so this
    formulation funnels a 3-column projection through one task. It is
    kept as the verification reference for ``longest_streaks_stitched``
    (the distributed variant used by the registry) — tests assert the
    two agree row-for-row (SURVEY.md §7 M4).
    """
    ev = fact.select("ts", "event_id", "status_type")
    w = Window.orderBy("ts", "event_id")
    chg = F.when(
        F.lag("status_type").over(w).isNull()
        | (F.lag("status_type").over(w) != F.col("status_type")),
        1,
    ).otherwise(0)
    run_id = F.sum("chg").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    runs = (
        ev.withColumn("chg", chg)
        .withColumn("run_id", run_id)
        .groupBy("run_id", "status_type")
        .agg(F.count(F.lit(1)).alias("streak_len"), F.min("ts").alias("start_ts"))
    )
    w_top = Window.partitionBy("status_type").orderBy(
        F.col("streak_len").desc(), F.col("start_ts").asc()
    )
    return (
        runs.withColumn("rn", F.row_number().over(w_top))
        .filter(F.col("rn") == 1)
        .select("status_type", "streak_len", "start_ts")
    )

def _runs_per_date(fact: DataFrame) -> DataFrame:
    """Within-date gaps-and-islands: one row per (date, run) with
    run_idx (ordinal within the date), status_type, streak_len,
    start_ts, plus n_runs for the date. Fully parallel — every window
    is PARTITIONED BY date."""
    ev = fact.select(
        F.col("date").alias("_d"), "ts", "event_id", "status_type"
    )
    w = Window.partitionBy("_d").orderBy("ts", "event_id")
    chg = F.when(
        F.lag("status_type").over(w).isNull()
        | (F.lag("status_type").over(w) != F.col("status_type")),
        1,
    ).otherwise(0)
    run_idx = F.sum("chg").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    runs = (
        ev.withColumn("chg", chg)
        .withColumn("run_idx", run_idx)
        .groupBy("_d", "run_idx", "status_type")
        .agg(F.count(F.lit(1)).alias("streak_len"), F.min("ts").alias("start_ts"))
    )
    n_runs = Window.partitionBy("_d")
    return runs.withColumn("n_runs", F.max("run_idx").over(n_runs))


def longest_streaks_stitched(fact: DataFrame) -> DataFrame:
    """Distributed longest_streaks: identical result, no global-order
    window over the fact table — nor over the per-date summary.

    Decomposition (the §7 M4 scale plan), two stitch levels:

      1. runs within each date partition (parallel);
      2. only each date's FIRST and LAST run can merge across
         midnight; interior runs are already maximal. The reduced
         boundary sequence is ≤2 rows per date;
      3. level-1 stitch: chain-merge adjacent boundary runs iff same
         status AND the dates differ (adjacent runs WITHIN a date
         always alternate status by maximality; first/last of the
         same date are only pseudo-adjacent in the reduced sequence —
         the date-differs guard keeps them apart). This window is
         PARTITIONED BY calendar month — parallel even over decades;
      4. level-2 stitch: the same reduction one level up. Only each
         month's first and last chain can merge across a month
         boundary; interior chains are final. The guard is now
         month-differs (two same-month chains adjacent in the reduced
         sequence were already split deliberately at level 1). The
         one remaining global window orders ≤2 rows per MONTH — ~24
         rows/year, trivially single-task safe at any horizon;
      5. interior runs ∪ interior chains ∪ stitched month-chains →
         top-1 per status, tie-break pinned (len DESC, start_ts ASC)
         like the reference oracle.
    """
    # Materialize the run relation ONCE (r12, guide §2.4/§5 — the
    # quality_lift_table localCheckpoint idiom): `runs` feeds both the
    # interior cut and the boundary-edge chain path, and without a
    # materialization each consumer re-executes the fact-wide
    # date-partitioned window + aggregation (PLAN_AUDIT showed 20
    # WindowExec instances for this query from the fan-out). The run
    # relation is run-count-sized (maximal streaks per date — far
    # below the event count), so the checkpoint is cheap at any scale.
    runs = _runs_per_date(fact).localCheckpoint(eager=True)
    interior = runs.filter(
        (F.col("run_idx") > 1) & (F.col("run_idx") < F.col("n_runs"))
    ).select("status_type", "streak_len", "start_ts")

    edge = runs.filter(
        (F.col("run_idx") == 1) | (F.col("run_idx") == F.col("n_runs"))
    ).withColumn("_m", F.trunc("_d", "month"))
    w_seq = Window.partitionBy("_m").orderBy("_d", "run_idx")
    new_chain = F.when(
        F.lag("status_type").over(w_seq).isNull()
        | (F.lag("status_type").over(w_seq) != F.col("status_type"))
        | (F.lag("_d").over(w_seq) == F.col("_d")),
        1,
    ).otherwise(0)
    chain_idx = F.sum("new_chain").over(
        w_seq.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    chains = (
        edge.withColumn("new_chain", new_chain)
        .withColumn("chain_idx", chain_idx)
        .groupBy("_m", "chain_idx", "status_type")
        .agg(F.sum("streak_len").alias("streak_len"), F.min("start_ts").alias("start_ts"))
        .withColumn("n_chains", F.max("chain_idx").over(Window.partitionBy("_m")))
        # same fan-out (interior_chains + medge); ≤2 rows/date input,
        # month-chain-sized output — materialize once (r12)
        .localCheckpoint(eager=True)
    )
    interior_chains = chains.filter(
        (F.col("chain_idx") > 1) & (F.col("chain_idx") < F.col("n_chains"))
    ).select("status_type", "streak_len", "start_ts")

    medge = chains.filter(
        (F.col("chain_idx") == 1) | (F.col("chain_idx") == F.col("n_chains"))
    )
    w_m = Window.orderBy("_m", "chain_idx")  # ≤2 rows/month — tiny
    new_chain2 = F.when(
        F.lag("status_type").over(w_m).isNull()
        | (F.lag("status_type").over(w_m) != F.col("status_type"))
        | (F.lag("_m").over(w_m) == F.col("_m")),
        1,
    ).otherwise(0)
    chain2_id = F.sum("new_chain2").over(
        w_m.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    month_chains = (
        medge.withColumn("new_chain2", new_chain2)
        .withColumn("chain2_id", chain2_id)
        .groupBy("chain2_id", "status_type")
        .agg(F.sum("streak_len").alias("streak_len"), F.min("start_ts").alias("start_ts"))
        .select("status_type", "streak_len", "start_ts")
    )

    candidates = interior.unionByName(interior_chains).unionByName(month_chains)
    w_top = Window.partitionBy("status_type").orderBy(
        F.col("streak_len").desc(), F.col("start_ts").asc()
    )
    return (
        candidates.withColumn("rn", F.row_number().over(w_top))
        .filter(F.col("rn") == 1)
        .select("status_type", "streak_len", "start_ts")
    )


def status_transitions(fact: DataFrame) -> DataFrame:
    """First-order Markov transition matrix over each client's status
    sequence: (prev_status, status, cnt, pct) for every consecutive
    pair in per-client (ts, event_id) order.

    Distributed the same way as ``consecutive_gaps``: lag within
    (client, date) partitions — parallel, since date order refines the
    client's global order — plus cross-midnight pairs stitched from a
    per-(client, date) first/last summary (one row per client-day,
    tiny). No window ever spans a full client history in one task.

    pct is row-normalized (out of each prev_status) as one double
    division of exact integer counts, rounded to 6 identically in both
    engines.
    """
    ev = fact.select(
        "client", F.col("date").alias("_d"), "ts", "event_id", "status_type"
    )
    w_day = Window.partitionBy("client", "_d").orderBy("ts", "event_id")
    within = (
        ev.withColumn("prev_status", F.lag("status_type").over(w_day))
        .filter(F.col("prev_status").isNotNull())
        .select("prev_status", "status_type")
    )
    order_key = F.struct("ts", "event_id")
    day_sum = ev.groupBy("client", "_d").agg(
        F.min_by("status_type", order_key).alias("first_status"),
        F.max_by("status_type", order_key).alias("last_status"),
    )
    w_cli = Window.partitionBy("client").orderBy("_d")
    cross = (
        day_sum.withColumn("prev_status", F.lag("last_status").over(w_cli))
        .filter(F.col("prev_status").isNotNull())
        .select("prev_status", F.col("first_status").alias("status_type"))
    )
    mat = (
        within.unionByName(cross)
        .groupBy("prev_status", F.col("status_type").alias("status"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # Row total as a window sum over the ≤ |status|² matrix: ONE
    # consumer of the fact-wide work, so no materialization and no
    # join — the prev_status partition frame sums the same exact
    # integers the old groupBy+broadcast-join total did (r12, guide
    # §2.4: the total is derived data, not a second aggregation).
    w_tot = Window.partitionBy("prev_status")
    return mat.select(
        "prev_status",
        "status",
        "cnt",
        F.round(
            F.col("cnt").cast("double") * 100.0
            / F.sum("cnt").over(w_tot).cast("double"),
            6,
        ).alias("pct"),
    )  # (terminal cosmetic sort dropped, r12 guide §2.4 — checkers are order-insensitive)


def debounce_summary(fact: DataFrame, gap: str = "10 minutes") -> DataFrame:
    """Burst-collapse suppression audit: collapse each client's events
    that arrive within ``gap`` of the previous event in the burst
    (chain rule — a burst extends while consecutive gaps stay <= gap)
    and report per client how many events a keep-first-of-burst
    debounce policy retains.

    Implementation is native ``session_window`` with the debounce gap
    — burst merging runs inside the JVM aggregation machinery (the
    scale path; no per-client ordered window at all). The oracle
    proves the semantics equivalence against the classic lag → gap
    flag → running-sum gaps-and-islands formulation.

    Output: (client, n_events, n_kept, kept_pct) — kept_pct one double
    division of exact integers, rounded to 6.
    """
    bursts = (
        fact.groupBy(F.session_window("ts", gap).alias("w"), "client")
        .agg(F.count(F.lit(1)).alias("n_in_burst"))
    )
    return (
        bursts.groupBy("client")
        .agg(
            F.sum("n_in_burst").alias("n_events"),
            F.count(F.lit(1)).alias("n_kept"),
        )
        .select(
            "client",
            "n_events",
            "n_kept",
            F.round(
                F.col("n_kept").cast("double") * 100.0
                / F.col("n_events").cast("double"),
                6,
            ).alias("kept_pct"),
        )
    )  # (terminal cosmetic sort dropped, r12 guide §2.4 — checkers are order-insensitive)


def sliding_peak_30min(fact: DataFrame, k: int = 10) -> DataFrame:
    """Top-k clients by PEAK 30-minute load: for every event, the
    count of that client's events in the trailing 30-minute window
    (event-time RANGE frame over epoch microseconds — exact BIGINT
    bounds, ties at the same instant are frame-peers on both
    engines); per client, the max such count with the EARLIEST
    achieving instant pinned as the tie-break; top-k by
    (peak DESC, client ASC).

    This is the burst-detection primitive (rate limiting, abuse
    scoring) expressed as a declarative window — no sessionization
    state, no driver loop.

    Scale: the RANGE window partitions by client — each client's
    events sort locally within its shuffle partition; nothing global.
    The per-client argmax is a second window over the SAME partition
    key (no extra shuffle — Catalyst reuses the hash partitioning),
    and the final top-k is TakeOrderedAndProject.
    """
    from pyspark.sql import Window as W

    us = F.unix_micros(F.col("ts"))
    win = (
        W.partitionBy("client")
        .orderBy(us.cast("long"))
        .rangeBetween(-(30 * 60 * 1_000_000 - 1), 0)
    )
    cnts = fact.select(
        "client", "ts", F.count(F.lit(1)).over(win).cast("long").alias("win_cnt")
    )
    pick = W.partitionBy("client").orderBy(
        F.col("win_cnt").desc(), F.col("ts").asc()
    )
    peaks = (
        cnts.withColumn("rn", F.row_number().over(pick))
        .filter(F.col("rn") == 1)
        .select("client", F.col("win_cnt").alias("peak"), F.col("ts").alias("peak_at"))
    )
    return peaks.orderBy(F.col("peak").desc(), F.col("client").asc()).limit(k)


def interarrival_burstiness(fact: DataFrame, k: int = 10) -> DataFrame:
    """Top-k burstiest clients by the coefficient of variation of
    inter-arrival gaps (CV = σ/μ; CV ≈ 1 is Poisson, ≫1 is bursty) —
    plus the exact gap moments that define it.

    Gaps are epoch-microsecond BIGINT lags per client (ordered by
    (ts, event_id) — the consecutive_gaps total-order convention);
    n/Σg are BIGINT and Σg² DECIMAL(38,0) (a month-long gap squared
    is ~7·10²⁴ — past BIGINT by itself), so CV's inputs are exact.
    Population form: σ/μ = √(n·Σg² − (Σg)²) / Σg — one IEEE sqrt and
    one division over exact moments, engine-identical. Clients need
    ≥ 2 gaps and a positive gap total.

    Scale: one client-partitioned lag window, one map-side-combined
    aggregation, TakeOrdered top-k.
    """
    from pyspark.sql import Window as W

    us = F.unix_micros(F.col("ts")).cast("long")
    w = W.partitionBy("client").orderBy("ts", "event_id")
    gaps = (
        fact.select("client", "ts", "event_id")
        .withColumn("g", us - F.lag(us).over(w))
        .filter(F.col("g").isNotNull())
    )
    m = gaps.groupBy("client").agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        F.sum("g").cast("long").alias("sum_g"),
        F.sum(
            F.col("g").cast("decimal(19,0)") * F.col("g").cast("decimal(19,0)")
        ).cast("decimal(38,0)").alias("ssq_g"),
    )
    nd = F.col("n_gaps").cast("double")
    sd = F.col("sum_g").cast("double")
    qd = F.col("ssq_g").cast("double")
    cv = F.sqrt(nd * qd - sd * sd) / sd
    out = m.filter((F.col("n_gaps") >= 2) & (F.col("sum_g") > 0)).select(
        "client",
        "n_gaps",
        "sum_g",
        # Σg² exceeds 2⁵³ routinely; emit the exact DECIMAL as its
        # decimal STRING so no engine/pandas bridge can round it.
        F.col("ssq_g").cast("string").alias("ssq_g"),
        F.round(cv, 6).alias("cv"),
    )
    return out.orderBy(F.col("cv").desc(), F.col("client").asc()).limit(k)
