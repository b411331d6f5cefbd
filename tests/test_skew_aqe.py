"""AQE skew-join evidence: under a pathologically skewed join key,
the engine's runtime re-planning actually splits the skewed
partition — the 100 TB skew story demonstrated in an executed plan,
not argued in a comment (complements the explicit salting operator,
operators/skew.py / salted_top_domains).

The thresholds are lowered only inside this test (tiny local data
can't reach the production 256 MB default); production plans rely on
the same mechanism at default thresholds, which these fixtures prove
fires when a partition exceeds factor x median.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

_SKEW_CONFS = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
    "spark.sql.adaptive.coalescePartitions.enabled": "false",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
}


@pytest.fixture()
def skew_spark(spark):
    old = {}
    for k, v in _SKEW_CONFS.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    yield spark
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def _skewed_frames(spark):
    # 20k rows on ONE key vs 40 keys x 50 rows; padding makes the hot
    # partition comfortably exceed the lowered 8KB threshold.
    left = (
        spark.range(22_000)
        .select(
            F.when(F.col("id") < 20_000, F.lit("hot"))
            .otherwise(F.concat(F.lit("k"), (F.col("id") % 40).cast("string")))
            .alias("key"),
            F.lpad(F.col("id").cast("string"), 64, "x").alias("pad"),
        )
    )
    right = spark.createDataFrame(
        [("hot", 1)] + [(f"k{i}", i) for i in range(40)], "key string, dim int"
    )
    return left, right


def test_aqe_splits_skewed_join_partition(skew_spark):
    left, right = _skewed_frames(skew_spark)
    joined = left.join(right, "key")  # SMJ: broadcast disabled above
    # Execute THIS DataFrame (a downstream agg would re-plan and hide
    # the join's AQE decision), then read its final executed plan.
    rows = joined.collect()
    assert sum(1 for r in rows if r["key"] == "hot") == 20_000

    final = joined._jdf.queryExecution().executedPlan().toString()
    assert "skew=true" in final, final[:2000]
    assert "AQEShuffleRead skewed" in final


def test_skew_split_preserves_exact_counts(skew_spark):
    # the split must not duplicate or drop rows on ANY key
    left, right = _skewed_frames(skew_spark)
    got = (
        left.join(right, "key")
        .groupBy("key")
        .count()
        .orderBy("key")
        .collect()
    )
    expect = {r["key"]: r["count"] for r in left.groupBy("key").count().collect()}
    assert {r["key"]: r["count"] for r in got} == expect
