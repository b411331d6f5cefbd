"""Opt-in core-scaling bench leg (r12 VERDICT #4).

At sf0.1 the main suite's per-query times are dominated by a measured
60-190 ms/job scheduling constant x 3-6 AQE jobs — r12's 8-core run
BEAT the 32-core run (184.6 s vs 208.6 s), so the driver's low/high
core comparison carries no information about parallel scaling there.
This leg makes core scaling observable honestly: a small subset of
honest-shuffle operators runs over events x VOLUME_X (disjoint
time-shifted unions — the scripts/scaling_curve.py construction, so
row volume scales with no key-collision shortcuts), timed with the
noop sink (guide §1.4: every column of every row computed, no collect
pickling in the measurement) after an untimed warm pass.

Gated by ``SPARK_GRAFT_SCALING_LEG=<k>`` which the driver never sets:
its bench.py invocation prints exactly the same single JSON line as
before (additions-only harness change). When enabled, bench.py prints
a SECOND one-line JSON after the main one:

  {"metric": "scaling_leg_sec_sum_of_query_min", "value": ..,
   "unit": "sec", "sf": .., "volume_x": k, "cpus": n,
   "queries": {name: sec, ..}}

Leg selection: operators whose executed plans carry real exchange
bytes at x8 volume (PLAN_AUDIT.md shufKB column) across the shuffle
taxonomy — groupBy aggregation (rollup), client-partitioned windows
(running_z), a pair self-join (basket), the two-pass Arrow + broadcast
recount (heavy_hit), and the union-and-carry asof composition
(asof_enrich: windows + joins, the suite's widest exchange count).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

N_TIMED_PASSES = 3


def _shifted_fact(spark: SparkSession, sf_dir: str, k: int) -> DataFrame:
    """events x k as k disjoint 64-day time shifts with offset event
    ids — every copy is a distinct stream (scripts/scaling_curve.py)."""
    from piholelongtermstats_spark.functions.derive import enrich_time
    from piholelongtermstats_spark.sources.events import dns_fact

    base = dns_fact(spark, sf_dir)
    parts = [
        base.withColumn("ts", F.col("ts") + F.expr(f"INTERVAL {64 * i} DAYS"))
        .withColumn("event_id", F.col("event_id") + F.lit(i * 10_000_000))
        for i in range(k)
    ]
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    return enrich_time(df.drop("date", "hour", "day_name", "day_period"), "ts")


def _legs(volume_x: int) -> dict:
    from piholelongtermstats_spark.operators.anomaly import (
        running_zscore_by_client,
    )
    from piholelongtermstats_spark.operators.asof import asof_join
    from piholelongtermstats_spark.operators.basket import (
        domain_association_rules,
    )
    from piholelongtermstats_spark.operators.freq import heavy_hitters_exact
    from piholelongtermstats_spark.operators.timeagg import hourly_rollup

    def asof_enrich(f: DataFrame) -> DataFrame:
        rollup = (
            hourly_rollup(f)
            .groupBy("hour_bucket", "status_type")
            .agg(F.sum("cnt").alias("cnt"))
        )
        return asof_join(
            f.select("ts", "status_type"),
            rollup,
            key="status_type",
            left_ts="ts",
            right_ts="hour_bucket",
            value_cols=["cnt"],
        ).groupBy("status_type").agg(
            F.count("cnt").alias("matched"),
            F.sum("cnt").cast("bigint").alias("sum_cnt"),
        )

    return {
        "rollup": hourly_rollup,
        "running_z": lambda f: running_zscore_by_client(
            f.groupBy("client", "date").agg(
                F.count(F.lit(1)).cast("long").alias("y")
            )
        ),
        # relative support scales with volume (the basket_scale_2x
        # doubling identity), so the rule set stays comparable
        "basket": lambda f: domain_association_rules(
            f, min_support=3 * volume_x, top_k=25, basket_cap=64
        ),
        "heavy_hit": lambda f: heavy_hitters_exact(f, "domain", 100),
        "asof_enrich": asof_enrich,
    }


def run_scaling_leg(
    spark: SparkSession, sf_dir: str, volume_x: int, sf: float
) -> dict:
    fact = _shifted_fact(spark, sf_dir, volume_x).persist()
    fact.count()  # materialize outside any timed region
    legs = _legs(volume_x)
    timings: dict[str, float] = {}
    try:
        for name, fn in legs.items():  # untimed warm pass
            fn(fact).write.format("noop").mode("overwrite").save()
        for _ in range(N_TIMED_PASSES):
            for name, fn in legs.items():
                spark.sparkContext.setJobDescription(
                    f"scaling-leg x{volume_x}: {name}"
                )
                t0 = time.perf_counter()
                fn(fact).write.format("noop").mode("overwrite").save()
                dt = round(time.perf_counter() - t0, 4)
                if name not in timings or dt < timings[name]:
                    timings[name] = dt
                spark.sparkContext.setJobDescription(None)
    finally:
        fact.unpersist()
    return {
        "metric": "scaling_leg_sec_sum_of_query_min",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "sf": sf,
        "volume_x": volume_x,
        "cpus": spark.sparkContext.defaultParallelism,
        "queries": timings,
    }
