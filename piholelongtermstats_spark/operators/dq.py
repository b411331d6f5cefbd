"""Data-quality expectations over the raw event feed — the dbt-test /
Great-Expectations shape as ONE engine query: every ingest pipeline
runs these gates before anything downstream is allowed to trust the
table (the reference trusts its SQLite feed implicitly; at 100 TB the
checks ARE the contract).

One row per expectation: (check_name, n_checked, n_violations,
pass_flag). The whole panel is ONE map-side-combined aggregation over
the feed (conditional counts) plus the event_id uniqueness check
(count vs count_distinct — the one expectation that inherently needs
a distinct); the unpivot is an Expand over the single result row, so
the panel costs one scan regardless of how many checks it carries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

KNOWN_EVENT_TYPES = ("view", "click", "purchase", "error", "signup")


def dq_expectations_panel(raw: DataFrame) -> DataFrame:
    """Expectations over the raw events relation (event_id, ts,
    user_id, event_type, value, props)."""
    lo = F.lit("2000-01-01 00:00:00").cast("timestamp")
    hi = F.lit("2100-01-01 00:00:00").cast("timestamp")
    viol = {
        "event_id_not_null": F.col("event_id").isNull(),
        "event_id_unique": None,  # handled via count vs distinct
        "ts_not_null": F.col("ts").isNull(),
        "ts_in_range": F.col("ts").isNotNull()
        & ((F.col("ts") < lo) | (F.col("ts") >= hi)),
        "user_id_not_null": F.col("user_id").isNull(),
        "event_type_known": ~F.col("event_type").isin(*KNOWN_EVENT_TYPES)
        | F.col("event_type").isNull(),
        "value_nonnegative": F.col("value").isNotNull() & (F.col("value") < 0),
    }
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n_total"),
        F.count_distinct(F.col("event_id")).cast("long").alias("n_distinct"),
        F.count(F.col("event_id")).cast("long").alias("n_id_nonnull"),
    ]
    for name, cond in viol.items():
        if cond is not None:
            aggs.append(
                F.count(F.when(cond, 1)).cast("long").alias(f"v_{name}")
            )
    one = raw.agg(*aggs).withColumn(
        "v_event_id_unique", (F.col("n_id_nonnull") - F.col("n_distinct"))
    )
    checks = list(viol.keys())
    stack = ", ".join(f"'{c}', v_{c}" for c in checks)
    panel = one.select(
        "n_total",
        F.expr(
            f"stack({len(checks)}, {stack}) AS (check_name, n_violations)"
        ),
    )
    return panel.select(
        "check_name",
        F.col("n_total").alias("n_checked"),
        F.col("n_violations").cast("long").alias("n_violations"),
        (F.col("n_violations") == 0).cast("int").alias("pass_flag"),
    )  # (terminal cosmetic sort dropped, r12 guide §2.4 — checkers are order-insensitive)


def join_cardinality_audit(fact: DataFrame, n_probe: int = 20) -> DataFrame:
    """One row: join-size estimation audit for the client-keyed
    self-join of the two date-range halves — the optimizer-statistics
    question ("how big would A ⋈ B be?") answered EXACTLY from key
    histograms, without executing the join:

        |A ⋈_k B| = Σ_k f_A(k) · f_B(k)

    Output: (n_a, n_b, n_keys_common, predicted_total, n_probe_keys,
    predicted_probe, actual_probe, probe_match) — predicted_total is
    the full-key identity (one histogram shuffle, DECIMAL(38,0): at
    10¹² rows per side a hot key's product passes 2⁶³);
    the EXECUTED verification join runs only over ``n_probe``
    md5-chosen keys (deterministic, the engine-wide 60-bit primitive)
    so the audit never materializes the full join output — the
    predicted join can be quadratically larger than either input,
    which is exactly why you estimate before you execute.

    Scale: two conditional-count histograms off one fact scan, one
    broadcast probe-key semi-join, one probe-sized executed join.
    """
    bounds = fact.agg(
        F.min("date").alias("d0"), F.max("date").alias("d1")
    ).select(
        "d0",
        F.expr("date_add(d0, CAST(datediff(d1, d0) DIV 2 AS INT))").alias(
            "mid"
        ),
    )
    halves = fact.join(F.broadcast(bounds)).select(
        "client",
        F.when(F.col("date") < F.col("mid"), 1).otherwise(0).alias("in_a"),
    )
    hist = halves.groupBy("client").agg(
        F.sum("in_a").cast("long").alias("fa"),
        F.sum(1 - F.col("in_a")).cast("long").alias("fb"),
    )
    # client-sized fan-out input materialized once (r12, guide §2.4):
    # both feeds the probe-key pick, the full-key totals and the
    # probe prediction — each would otherwise re-run the fact-wide
    # histogram aggregation (plan showed 7 identical fact scans).
    both = hist.filter(
        (F.col("fa") > 0) & (F.col("fb") > 0)
    ).localCheckpoint(eager=True)
    probe = (
        both.select(
            "client",
            F.conv(F.substring(F.md5(F.col("client")), 1, 15), 16, 10)
            .cast("long")
            .alias("h"),
        )
        .orderBy("h", "client")
        .limit(n_probe)
        .select("client")
    )
    tot = both.agg(
        F.sum("fa").cast("long").alias("n_a_matched"),
        F.sum("fb").cast("long").alias("n_b_matched"),
        F.count(F.lit(1)).cast("long").alias("n_keys_common"),
        F.sum(
            (F.col("fa").cast("decimal(38,0)") * F.col("fb"))
        ).cast("decimal(38,0)").cast("double").alias("predicted_total"),
    )
    probe_pred = both.join(F.broadcast(probe), "client").agg(
        F.count(F.lit(1)).cast("long").alias("n_probe_keys"),
        F.coalesce(
            F.sum(F.col("fa") * F.col("fb")), F.lit(0)
        ).cast("long").alias("predicted_probe"),
    )
    ev = fact.join(F.broadcast(bounds)).select(
        "client",
        "event_id",
        (F.col("date") < F.col("mid")).alias("is_a"),
    ).join(F.broadcast(probe), "client")
    a = ev.filter(F.col("is_a")).select("client", F.col("event_id").alias("ea"))
    b = ev.filter(~F.col("is_a")).select("client", F.col("event_id").alias("eb"))
    actual = a.join(b, "client").agg(
        F.count(F.lit(1)).cast("long").alias("actual_probe")
    )
    return (
        tot.crossJoin(F.broadcast(probe_pred))
        .crossJoin(F.broadcast(actual))
        .select(
            "n_a_matched",
            "n_b_matched",
            "n_keys_common",
            "predicted_total",
            "n_probe_keys",
            "predicted_probe",
            "actual_probe",
            (F.col("predicted_probe") == F.col("actual_probe"))
            .cast("int")
            .alias("probe_match"),
        )
    )

