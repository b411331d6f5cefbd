"""Executed-plan metric extraction (plans/metrics.py).

Pins the bench evidence channel: a groupBy (one shuffle) must report
shuffleBytesWritten > 0 after execution, and a pure narrow projection
must report 0 — so bench.py's per-query metrics can be trusted as a
did-it-actually-shuffle signal."""

from __future__ import annotations

from pyspark.sql import functions as F

from piholelongtermstats_spark.plans.metrics import executed_plan_metrics


def test_groupby_reports_shuffle_bytes(spark):
    df = spark.range(0, 10_000, 1, 4).groupBy((F.col("id") % 7).alias("k")).count()
    df.collect()
    m = executed_plan_metrics(df)
    assert m.get("shuffleBytesWritten", 0) > 0
    assert m.get("shuffleRecordsWritten", 0) > 0


def test_narrow_projection_reports_zero_shuffle(spark):
    df = spark.range(0, 10_000, 1, 4).select((F.col("id") * 2).alias("x"))
    df.collect()
    m = executed_plan_metrics(df)
    assert m.get("shuffleBytesWritten", 0) == 0


def test_broadcast_join_reports_zero_shuffle(spark):
    big = spark.range(0, 10_000, 1, 4).select((F.col("id") % 100).alias("k"))
    dim = spark.range(0, 100).select(F.col("id").alias("k"), F.lit("v").alias("v"))
    df = big.join(F.broadcast(dim), "k")
    df.collect()
    m = executed_plan_metrics(df)
    # Broadcast join moves the dim via the driver, not shuffle files.
    assert m.get("shuffleBytesWritten", 0) == 0


def test_reused_exchange_not_double_counted(spark):
    agg = spark.range(0, 10_000, 1, 4).groupBy((F.col("id") % 5).alias("k")).count()
    once = agg.union(agg)  # self-union: exchange reused, not re-run
    once.collect()
    m_union = executed_plan_metrics(once)
    agg2 = spark.range(0, 10_000, 1, 4).groupBy((F.col("id") % 5).alias("k")).count()
    agg2.collect()
    m_single = executed_plan_metrics(agg2)
    # The reused branch must not inflate totals beyond ~2x one leg
    # (union re-plans both legs; ReusedExchange dedup keeps it sane).
    assert m_union.get("shuffleBytesWritten", 0) <= 2 * m_single.get(
        "shuffleBytesWritten", 1
    )


def test_bench_stdout_contract_stays_compact():
    """BENCH_r01-r04 were unparseable because bench.py embedded the
    per-query dict in stdout (r4 VERDICT #1). Pin the contract
    STATICALLY: the printed payload is built from exactly the compact
    key set, and the per-query dicts go only to the side file."""
    import ast
    import os

    src = open(
        os.path.join(os.path.dirname(__file__), "..", "bench.py")
    ).read()
    tree = ast.parse(src)
    dumped_keys = []
    for node in ast.walk(tree):
        # find json.dumps({...}) inside print(...)
        if (
            isinstance(node, ast.Call)
            and isinstance(node.func, ast.Attribute)
            and node.func.attr == "dumps"
            and node.args
            and isinstance(node.args[0], ast.Dict)
        ):
            dumped_keys.append(
                {k.value for k in node.args[0].keys if isinstance(k, ast.Constant)}
            )
    assert any(
        ks
        == {
            "metric",
            "value",
            "unit",
            "exec_value",
            "sf",
            "n_queries",
            "over_budget",
        }
        for ks in dumped_keys
    ), dumped_keys
    assert '"queries"' not in src.split("print(")[-1]
