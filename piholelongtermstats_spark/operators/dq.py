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
    ).orderBy("check_name")
