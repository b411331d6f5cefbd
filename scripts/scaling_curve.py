"""Measured volume-scaling curve: run representative operators over
events × {1, 2, 4} (time-shifted unions — disjoint day ranges, so
row volume scales with NO key-collision shortcuts) and print wall
times. Near-linear growth is the measurable signature that the
distributed decompositions hold as volume grows — the runtime
complement to the oracle-checked *_scale_2x doubling identities.

Usage: python scripts/scaling_curve.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    from piholelongtermstats_spark.operators.sequential import (
        longest_streaks_stitched,
    )
    from piholelongtermstats_spark.operators.timeagg import hourly_rollup
    from piholelongtermstats_spark.session import get_spark
    from piholelongtermstats_spark.sources.events import dns_fact

    spark = get_spark("scaling-curve")
    spark.sparkContext.setLogLevel("ERROR")
    base = dns_fact(spark, sf_dir)

    def shifted(k: int):
        """events × k via k disjoint 64-day time shifts (event ids
        offset too, so every copy is a distinct stream)."""
        parts = [
            base.withColumn(
                "ts", F.col("ts") + F.expr(f"INTERVAL {64 * i} DAYS")
            ).withColumn("event_id", F.col("event_id") + F.lit(i * 10_000_000))
            for i in range(k)
        ]
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        from piholelongtermstats_spark.functions.derive import enrich_time

        return enrich_time(df.drop("date", "hour", "day_name", "day_period"), "ts")

    results = {}
    for k in (1, 2, 4):
        fact = shifted(k).persist()
        n = fact.count()  # materialize outside the timed region
        for name, fn in (
            ("streaks", lambda f: longest_streaks_stitched(f)),
            ("rollup", lambda f: hourly_rollup(f)),
        ):
            fn(fact).collect()  # warm codegen/plan
            t0 = time.perf_counter()
            fn(fact).collect()
            dt = round(time.perf_counter() - t0, 3)
            results[(name, k)] = (n, dt)
        fact.unpersist()

    print(f"{'op':10s} {'k':>2s} {'rows':>9s} {'sec':>7s} {'vs 1x':>6s}")
    for name in ("streaks", "rollup"):
        base_t = results[(name, 1)][1]
        for k in (1, 2, 4):
            n, dt = results[(name, k)]
            print(f"{name:10s} {k:2d} {n:9d} {dt:7.3f} {dt / base_t:6.2f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
