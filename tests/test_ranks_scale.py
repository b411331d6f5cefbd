"""The billion-client rank fallback (r8 VERDICT #7): the two-level
range-partitioned panel must equal the single-window panel row for
row — at 1× and at 2× client cardinality — and its plan must contain
no unpartitioned window over the client relation."""

from __future__ import annotations

import datetime as dt

from piholelongtermstats_spark.operators.ranks import (
    client_rank_metrics,
    client_rank_metrics_ranged,
)
from tests.conftest import make_fact


def _many_client_rows(n_clients: int):
    t0 = dt.datetime.fromisoformat("2024-01-01T00:00:00")
    rows = []
    eid = 0
    for c in range(n_clients):
        # zipf-ish tied counts: many clients share cnt values, so the
        # unique (cnt DESC, client) tie-break is genuinely exercised
        for _ in range(c % 7 + 1):
            eid += 1
            rows.append(
                (
                    eid,
                    (t0 + dt.timedelta(minutes=eid)).isoformat(),
                    f"10.0.{c // 256}.{c % 256}",
                    "example.com",
                    "Allowed",
                    0.1,
                )
            )
    return rows


def _panel_key(rows):
    return {
        r.client: (r.cnt, r.quartile, r.pct_rank, r.cume) for r in rows
    }


def test_ranged_equals_window_variant(spark):
    fact = make_fact(spark, _many_client_rows(150))
    base = _panel_key(client_rank_metrics(fact).collect())
    ranged = _panel_key(client_rank_metrics_ranged(fact, n_parts=8).collect())
    assert ranged == base
    assert len(base) == 150


def test_ranged_equals_window_variant_2x(spark):
    """Doubled client cardinality — same invariant, and the ntile
    head/tail boundary (n MOD k ≠ 0 paths) is crossed."""
    fact = make_fact(spark, _many_client_rows(301))
    base = _panel_key(client_rank_metrics(fact, buckets=4).collect())
    ranged = _panel_key(
        client_rank_metrics_ranged(fact, buckets=4, n_parts=16).collect()
    )
    assert ranged == base
    assert len(base) == 301


def test_threshold_routes_to_ranged_plan(spark):
    """Crossing two_level_threshold must produce a plan with NO
    unpartitioned window over the client relation: every
    windowspecdefinition ordering cnt carries the _dpid partition
    column (ranks.dense_order_index), and the only ordered-
    unpartitioned window runs over the n_parts-row size relation."""
    import re

    fact = make_fact(spark, _many_client_rows(60))
    df = client_rank_metrics(fact, two_level_threshold=10)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    bad = re.findall(r"windowspecdefinition\(cnt#", plan)
    assert not bad, f"unpartitioned client-relation window: {bad}"
    assert "_dpid" in plan  # the two-level path was actually taken
    # equality with the window panel still holds after routing
    base = _panel_key(client_rank_metrics(fact).collect())
    assert _panel_key(df.collect()) == base


def test_threshold_not_crossed_keeps_window_plan(spark):
    fact = make_fact(spark, _many_client_rows(20))
    df = client_rank_metrics(fact, two_level_threshold=1000)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "_dpid" not in plan


def test_ntile_small_n_edge(spark):
    """n < buckets: q = 0, every row is its own bucket (the NULLIF
    tail never fires)."""
    fact = make_fact(spark, _many_client_rows(3))
    got = sorted(
        (r.quartile for r in client_rank_metrics_ranged(fact).collect())
    )
    want = sorted(
        r.quartile for r in client_rank_metrics(fact).collect()
    )
    assert got == want == [1, 2, 3]
