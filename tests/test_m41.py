"""M41 — ordered funnel + cohort retention property tests."""

from __future__ import annotations

import datetime as dt

from piholelongtermstats_spark.operators import journey
from tests.conftest import make_fact

RAW_SCHEMA = "event_id long, ts timestamp, user_id long, event_type string"


def _raw(spark, rows):
    return spark.createDataFrame(
        [(i, dt.datetime.fromisoformat(ts), u, t) for i, ts, u, t in rows],
        RAW_SCHEMA,
    )


def test_funnel_requires_strict_order(spark):
    """u1 completes the chain; u2 has all three types but purchase
    BEFORE click — must not count at stage 3; u3 stops at click."""
    raw = _raw(spark, [
        (1, "2024-01-01T10:00:00", 1, "view"),
        (2, "2024-01-01T10:05:00", 1, "click"),
        (3, "2024-01-01T10:09:00", 1, "purchase"),
        (4, "2024-01-01T10:00:00", 2, "view"),
        (5, "2024-01-01T10:01:00", 2, "purchase"),
        (6, "2024-01-01T10:02:00", 2, "click"),
        (7, "2024-01-01T11:00:00", 3, "view"),
        (8, "2024-01-01T11:30:00", 3, "click"),
        (9, "2024-01-01T09:00:00", 4, "click"),  # click w/o prior view
    ])
    r = journey.funnel_conversion(raw).collect()[0]
    assert (r.n_users, r.n_step1, r.n_step2, r.n_step3) == (4, 3, 3, 1)
    assert r.conv_1_2_ppm == 1000000
    assert r.conv_1_3_ppm == 333333


def test_funnel_same_timestamp_does_not_chain(spark):
    raw = _raw(spark, [
        (1, "2024-01-01T10:00:00", 1, "view"),
        (2, "2024-01-01T10:00:00", 1, "click"),  # same µs: no chain
    ])
    r = journey.funnel_conversion(raw).collect()[0]
    assert (r.n_step1, r.n_step2) == (1, 0)


def test_funnel_greedy_anchor_is_existence_optimal(spark):
    """view@10:00, click@10:01, view@10:02, purchase@10:03: the
    earliest-view anchor still finds the chain through click@10:01."""
    raw = _raw(spark, [
        (1, "2024-01-01T10:00:00", 1, "view"),
        (2, "2024-01-01T10:01:00", 1, "click"),
        (3, "2024-01-01T10:02:00", 1, "view"),
        (4, "2024-01-01T10:03:00", 1, "purchase"),
    ])
    r = journey.funnel_conversion(raw).collect()[0]
    assert (r.n_step1, r.n_step2, r.n_step3) == (1, 1, 1)


def test_cohort_retention_exact_fixture(spark):
    """Two clients born day 0 (one returns day 1), one born day 1."""
    t = "2024-01-0{d}T10:00:00"
    rows = [
        (1, t.format(d=1), "a", "d", "Allowed", 0.1),
        (2, t.format(d=1), "b", "d", "Allowed", 0.1),
        (3, t.format(d=2), "a", "d", "Allowed", 0.1),
        (4, t.format(d=2), "c", "d", "Allowed", 0.1),
        (5, t.format(d=3), "c", "d", "Allowed", 0.1),
        (6, t.format(d=3), "a", "d", "Allowed", 0.1),
    ]
    fact = make_fact(spark, rows)
    got = {
        (r.cohort_date.day, r.day_offset): (r.n_cohort, r.n_active, r.retention_ppm)
        for r in journey.cohort_retention(fact).collect()
    }
    assert got[(1, 0)] == (2, 2, 1000000)
    assert got[(1, 1)] == (2, 1, 500000)   # only 'a' returned
    assert got[(1, 2)] == (2, 1, 500000)
    assert got[(2, 0)] == (1, 1, 1000000)  # 'c' born day 2
    assert got[(2, 1)] == (1, 1, 1000000)


def test_cohort_offset_cap(spark):
    rows = [
        (1, "2024-01-01T10:00:00", "a", "d", "Allowed", 0.1),
        (2, "2024-03-01T10:00:00", "a", "d", "Allowed", 0.1),  # offset 60
    ]
    fact = make_fact(spark, rows)
    got = journey.cohort_retention(fact, 13).collect()
    assert all(r.day_offset <= 13 for r in got)


# --- M45 additions (same family) ----------------------------------------------


def test_growth_accounting_identities(spark):
    """Fixture: a born day1 (active 1,2,4); b born day1 (active 1
    only); c born day3. Pins every cell plus the two accounting
    identities."""
    t = "2024-01-0{d}T10:00:00"
    rows = [
        (1, t.format(d=1), "a", "d", "Allowed", 0.1),
        (2, t.format(d=1), "b", "d", "Allowed", 0.1),
        (3, t.format(d=2), "a", "d", "Allowed", 0.1),
        (4, t.format(d=3), "c", "d", "Allowed", 0.1),
        (5, t.format(d=4), "a", "d", "Allowed", 0.1),
    ]
    fact = make_fact(spark, rows)
    got = {
        r.date.day: (r.dau, r.new_clients, r.retained, r.resurrected, r.churned)
        for r in journey.growth_accounting_daily(fact).collect()
    }
    assert got[1] == (2, 2, 0, 0, 0)
    assert got[2] == (1, 0, 1, 0, 1)   # a retained; b churned
    assert got[3] == (1, 1, 0, 0, 1)   # c new; a churned (inactive d3)
    assert got[4] == (1, 0, 0, 1, 1)   # a resurrected; c churned
    # identities on every day
    for d, (dau, new, ret, res, _ch) in got.items():
        assert dau == new + ret + res, d
    prev_dau = None
    for d in sorted(got):
        dau, new, _ret, res, ch = got[d]
        if prev_dau is not None:
            assert dau - prev_dau == new + res - ch, d
        prev_dau = dau


def test_growth_accounting_zero_activity_day_reports_churn(spark):
    rows = [
        (1, "2024-01-01T10:00:00", "a", "d", "Allowed", 0.1),
        (2, "2024-01-03T10:00:00", "a", "d", "Allowed", 0.1),
    ]
    fact = make_fact(spark, rows)
    got = {
        r.date.day: (r.dau, r.churned)
        for r in journey.growth_accounting_daily(fact).collect()
    }
    assert got[2] == (0, 1)  # the empty day still reports a's churn


def test_join_cardinality_probe_matches_execution(spark):
    from piholelongtermstats_spark.operators import dq
    from piholelongtermstats_spark.plans.registry import _fact

    r = dq.join_cardinality_audit(
        _fact(spark, "/root/testdata/sf0.001"), 20
    ).collect()[0]
    assert r.probe_match == 1
    assert r.n_probe_keys <= 20
    assert r.predicted_probe == r.actual_probe
    assert r.predicted_total >= r.predicted_probe


def test_funnel_invariant_under_user_doubling(spark):
    """journey_scale_2x contract: stage counts double exactly,
    conversion ppms identical."""
    import __spark_entry__ as se

    sf = "/root/testdata/sf0.001"
    one = se.queries()["funnel_conversion"](spark, sf).collect()[0]
    two = se.queries()["journey_scale_2x"](spark, sf).collect()[0]
    assert two.n_users == 2 * one.n_users
    for c in ("n_step1", "n_step2", "n_step3"):
        assert two[c] == 2 * one[c]
    for c in ("conv_1_2_ppm", "conv_2_3_ppm", "conv_1_3_ppm"):
        assert two[c] == one[c]


def test_funnel_conversion_cross_validates_m11_funnel_counts(spark):
    """Two independently-written funnels (M11 cohort.funnel_counts,
    M41 journey.funnel_conversion) share the strictly-after anchor
    semantics — stage counts must agree on real data."""
    import __spark_entry__ as se

    sf = "/root/testdata/sf0.001"
    new = se.queries()["funnel_conversion"](spark, sf).collect()[0]
    old = se.queries()["funnel_counts"](spark, sf).collect()[0]
    assert new.n_step1 == old.n_view
    assert new.n_step2 == old.n_click_after_view
    assert new.n_step3 == old.n_purchase_after_click


def test_cohort_retention_cross_validates_m11_client_retention(spark):
    """cohort_retention.n_active == client_retention.n_clients for
    every (cohort, offset) within the cap."""
    import __spark_entry__ as se

    sf = "/root/testdata/sf0.001"
    new = {
        (r.cohort_date, r.day_offset): r.n_active
        for r in se.queries()["cohort_retention"](spark, sf).collect()
    }
    old = {
        (r.cohort_date, r.age_days): r.n_clients
        for r in se.queries()["client_retention"](spark, sf).collect()
        if r.age_days <= 13
    }
    assert new == old
