"""Executed-plan metric extraction — measure, don't guess.

After an action runs, every physical operator's SQLMetrics hold the
observed values (shuffle bytes written, spill size, output rows).
`executed_plan_metrics` walks the executed plan via py4j and sums them,
giving per-query *evidence* for the scale story: a query whose plan we
claim is broadcast-only should report ~0 shuffle bytes; a salted
aggregation should show its two-stage shuffle is small.

This is driver-side introspection of an already-finished job — zero
cost on the executors and runs outside any timed region in bench.py.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame

# Metric keys surfaced per query. Spark names shuffle-write metrics
# shuffleBytesWritten / shuffleRecordsWritten on the exchange node and
# spillSize on aggregates/sorts/joins that can spill.
_KEYS = ("shuffleBytesWritten", "shuffleRecordsWritten", "spillSize")


def _walk(node) -> Iterator:
    """Yield every physical node, descending through AQE wrappers.

    AdaptiveSparkPlanExec hides the final (re-planned) tree behind
    .executedPlan(); ShuffleQueryStageExec / BroadcastQueryStageExec
    hide their materialized subtree behind .plan(). Plain children()
    misses both, which is exactly where the shuffle metrics live.
    """
    yield node
    if node.getClass().getSimpleName() == "AdaptiveSparkPlanExec":
        # Final plan after AQE re-optimization; its subtree contains
        # the query stages that actually ran.
        yield from _walk(node.executedPlan())
        return
    ch = node.children()
    for i in range(ch.size()):
        yield from _walk(ch.apply(i))
    try:
        yield from _walk(node.plan())  # query-stage wrappers
    except Exception:  # most nodes have no .plan()
        pass


def executed_plan_metrics(df: DataFrame, keys: tuple = _KEYS) -> dict:
    """Sum selected SQLMetrics over the executed plan of `df`.

    Call AFTER an action (collect/count) or the metrics are zero.
    Returns {metric_name: summed_value}; missing metrics omitted.
    ReusedExchangeExec nodes re-point at an exchange that already
    reported its metrics, so reuse is skipped to avoid double counting.
    """
    totals: dict = {}
    seen_ids = set()
    for node in _walk(df._jdf.queryExecution().executedPlan()):
        nid = node.id()
        if nid in seen_ids or node.getClass().getSimpleName() == "ReusedExchangeExec":
            continue
        seen_ids.add(nid)
        m = node.metrics()
        it = m.iterator()
        while it.hasNext():
            kv = it.next()
            name = kv._1()
            if name in keys:
                totals[name] = totals.get(name, 0) + kv._2().value()
    return totals
