"""M19 wave semantics: association rules (support/confidence/lift,
basket cap, integer-exact lift gate) and OHLC bars (tie-pinned
open/close)."""

from __future__ import annotations

import __spark_entry__ as se
from piholelongtermstats_spark.operators import basket, timeagg
from tests.conftest import make_fact

SF = "/root/testdata/sf0.001"


def test_association_rules_counts_and_lift(spark):
    """3 baskets: {a,b}, {a,b}, {a,c}. Pair (a,b): cnt_ab=2, cnt_a=3,
    cnt_b=2 -> conf 2/3, lift = 3*2/(3*2) = 1.0 -> lift_gt1 False
    (strict). Pair (a,c): cnt_ab=1 below min_support."""
    rows = [
        (1, "2024-01-01T10:00:00", "c1", "a", "Allowed", 0.1),
        (2, "2024-01-01T10:01:00", "c1", "b", "Allowed", 0.1),
        (3, "2024-01-01T10:02:00", "c1", "a", "Allowed", 0.1),  # dup in basket
        (4, "2024-01-02T10:00:00", "c1", "a", "Allowed", 0.1),
        (5, "2024-01-02T10:01:00", "c1", "b", "Allowed", 0.1),
        (6, "2024-01-01T10:00:00", "c2", "a", "Allowed", 0.1),
        (7, "2024-01-01T10:01:00", "c2", "c", "Allowed", 0.1),
    ]
    out = basket.domain_association_rules(
        make_fact(spark, rows), min_support=2, top_k=10, basket_cap=64
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.domain_a, r.domain_b) == ("a", "b")
    assert (r.cnt_ab, r.cnt_a, r.cnt_b) == (2, 3, 2)
    assert r.conf_ab == round(2 / 3, 6)
    assert r.lift == 1.0
    assert r.lift_gt1 is False


def test_association_rules_positive_lift(spark):
    """4 baskets; a and b co-occur in both baskets containing either
    -> lift = 4*2/(2*2) = 2 > 1."""
    rows = [
        (1, "2024-01-01T10:00:00", "c1", "a", "Allowed", 0.1),
        (2, "2024-01-01T10:01:00", "c1", "b", "Allowed", 0.1),
        (3, "2024-01-02T10:00:00", "c1", "a", "Allowed", 0.1),
        (4, "2024-01-02T10:01:00", "c1", "b", "Allowed", 0.1),
        (5, "2024-01-03T10:00:00", "c1", "x", "Allowed", 0.1),
        (6, "2024-01-04T10:00:00", "c1", "y", "Allowed", 0.1),
    ]
    r = basket.domain_association_rules(
        make_fact(spark, rows), min_support=2, top_k=10, basket_cap=64
    ).collect()[0]
    assert r.lift == 2.0 and r.lift_gt1 is True


def test_association_rules_basket_cap_drops_whole_basket(spark):
    """A basket over the cap contributes NOTHING — not to pairs, not
    to item counts, not to the basket total."""
    rows = [
        # c1/day1: 3 domains > cap 2 -> dropped whole
        (1, "2024-01-01T10:00:00", "c1", "a", "Allowed", 0.1),
        (2, "2024-01-01T10:01:00", "c1", "b", "Allowed", 0.1),
        (3, "2024-01-01T10:02:00", "c1", "c", "Allowed", 0.1),
        # two surviving {a,b} baskets
        (4, "2024-01-02T10:00:00", "c1", "a", "Allowed", 0.1),
        (5, "2024-01-02T10:01:00", "c1", "b", "Allowed", 0.1),
        (6, "2024-01-01T10:00:00", "c2", "a", "Allowed", 0.1),
        (7, "2024-01-01T10:01:00", "c2", "b", "Allowed", 0.1),
    ]
    r = basket.domain_association_rules(
        make_fact(spark, rows), min_support=2, top_k=10, basket_cap=2
    ).collect()[0]
    # capped universe: 2 baskets, both {a,b} -> n=2, cnt_ab=cnt_a=cnt_b=2
    # lift = 2*2/(2*2) = 1.0; domain c vanished with its basket
    assert (r.cnt_ab, r.cnt_a, r.cnt_b) == (2, 2, 2)
    assert r.lift == 1.0 and r.lift_gt1 is False


def test_ohlc_tie_pinned_by_event_id(spark):
    """Two events share the opening timestamp: open must be the one
    with the SMALLER event_id; same for close with the larger."""
    rows = [
        (2, "2024-01-01T10:00:00", "c1", "d", "Allowed", 5.0),
        (1, "2024-01-01T10:00:00", "c1", "d", "Allowed", 3.0),  # open (id 1)
        (3, "2024-01-01T10:30:00", "c1", "d", "Allowed", 9.0),  # high
        (5, "2024-01-01T10:59:00", "c1", "d", "Allowed", 1.0),  # low + close
        (4, "2024-01-01T10:59:00", "c1", "d", "Allowed", 7.0),
        (6, "2024-01-01T11:05:00", "c1", "d", "Allowed", 2.0),  # next bar
    ]
    bars = {
        r.hour_ts.isoformat(): (r.n, r.open, r.high, r.low, r.close)
        for r in timeagg.hourly_ohlc_reply(make_fact(spark, rows)).collect()
    }
    assert bars["2024-01-01T10:00:00"] == (5, 3.0, 9.0, 1.0, 1.0)
    assert bars["2024-01-01T11:00:00"] == (1, 2.0, 2.0, 2.0, 2.0)


def test_ohlc_null_replies_excluded(spark):
    rows = [
        (1, "2024-01-01T10:00:00", "c1", "d", "Allowed", None),
        (2, "2024-01-01T10:01:00", "c1", "d", "Allowed", 4.0),
    ]
    bars = timeagg.hourly_ohlc_reply(make_fact(spark, rows)).collect()
    assert len(bars) == 1 and bars[0].n == 1 and bars[0].open == 4.0


def _plan(spark, name: str) -> str:
    df = se.queries()[name](spark, SF)
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_ohlc_plan_is_windowless(spark):
    """The whole point of min_by/max_by: no WindowExec, one hash
    aggregate pair (partial + final)."""
    plan = _plan(spark, "hourly_ohlc_reply")
    assert "Window" not in plan, plan


def test_rules_plan_no_cartesian_and_broadcast_dims(spark):
    """The pair self-join runs on the basket key (never cartesian);
    item counts and the 1-row basket total join back broadcast."""
    plan = _plan(spark, "domain_association_rules")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
