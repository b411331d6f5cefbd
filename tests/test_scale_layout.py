"""Scale-layout properties asserted at the PLAN level: bucketed
joins run without Exchange, salted aggregation matches the direct
plan. These are the 100 TB design decisions (SURVEY.md §4, §7) made
checkable at test scale."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from piholelongtermstats_spark.operators import skew
from piholelongtermstats_spark.sources import bucketing
from piholelongtermstats_spark.sources.parquet import load_table

SF = "/root/testdata/sf0.001"


def _explain(df) -> str:
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    li = load_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    orders = load_table(spark, SF, "orders").select(
        "o_orderkey", "o_orderdate", "o_custkey"
    ).withColumnRenamed("o_orderkey", "l_orderkey")
    bucketing.write_bucketed(li, "t_li_b", ["l_orderkey"], 8, ["l_orderkey"])
    bucketing.write_bucketed(orders, "t_ord_b", ["l_orderkey"], 8, ["l_orderkey"])
    yield "t_li_b", "t_ord_b"
    spark.sql("DROP TABLE IF EXISTS t_li_b")
    spark.sql("DROP TABLE IF EXISTS t_ord_b")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    left, right = bucketed_tables
    # force the join path (tiny test tables would otherwise broadcast)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketing.colocated_join(spark, left, right, ["l_orderkey"])
        plan = _explain(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        # correctness: row count matches the plain parquet join
        li = load_table(spark, SF, "lineitem")
        orders = load_table(spark, SF, "orders")
        expected = li.join(
            orders, li.l_orderkey == orders.o_orderkey
        ).count()
        assert joined.count() == expected
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_groupby_has_single_stage_agg(spark, bucketed_tables):
    left, _ = bucketed_tables
    agg = spark.table(left).groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("c"))
    plan = _explain(agg)
    assert "Exchange" not in plan, plan


def test_salted_count_matches_direct(spark):
    fact = load_table(spark, SF, "events")
    direct = {
        r["event_type"]: r["cnt"]
        for r in fact.groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .collect()
    }
    salted = {
        r["event_type"]: r["cnt"]
        for r in skew.salted_count(fact, "event_type", "event_id").collect()
    }
    assert salted == direct


def test_salted_avg_matches_direct(spark):
    fact = load_table(spark, SF, "events")
    direct = {
        r["event_type"]: r["a"]
        for r in fact.groupBy("event_type").agg(F.avg("value").alias("a")).collect()
    }
    salted = {
        r["event_type"]: r["avg_val"]
        for r in skew.salted_avg(fact, "event_type", "value", "event_id").collect()
    }
    assert set(salted) == set(direct)
    for k in direct:
        assert salted[k] == pytest.approx(direct[k], rel=1e-12)
