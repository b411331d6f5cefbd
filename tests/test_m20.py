"""M20 wave semantics: SymSpell blocking completeness, integer-exact
OLS trend vs numpy, and the ratio-invariance doubling proof."""

from __future__ import annotations

import numpy as np

import __spark_entry__ as se
from piholelongtermstats_spark.operators import fuzzy, timeagg
from tests.conftest import make_fact

SF = "/root/testdata/sf0.001"


def _fact_from_domains(spark, domains):
    rows = [
        (i, "2024-01-01T10:00:00", "c1", d, "Allowed", 0.1)
        for i, d in enumerate(domains)
    ]
    return make_fact(spark, rows)


def test_typo_pairs_match_bruteforce(spark):
    """Constructed strings exercising substitution, insertion,
    deletion, transposition (d=2 — must NOT appear), and equality
    after dedup; blocked output == brute force."""
    import itertools

    def lev(a, b):
        m, n = len(a), len(b)
        dp = list(range(n + 1))
        for i in range(1, m + 1):
            prev, dp[0] = dp[0], i
            for j in range(1, n + 1):
                cur = dp[j]
                dp[j] = min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (a[i - 1] != b[j - 1])
                )
                prev = cur
        return dp[n]

    domains = [
        "paypal.com", "paypa1.com", "payypal.com", "aypal.com",
        "papyal.com", "google.com", "gooogle.com", "goggle.com",
        "a", "b", "ab",
    ]
    expect = {
        (a, b, lev(a, b))
        for a, b in itertools.combinations(sorted(domains), 2)
        if lev(a, b) <= 1
    }
    got = {
        (r.domain_a, r.domain_b, r.dist)
        for r in fuzzy.typo_pairs(_fact_from_domains(spark, domains)).collect()
    }
    assert got == expect
    # the transposition pair is distance 2 and must be absent
    assert not any(
        {a, b} == {"paypal.com", "papyal.com"} for a, b, _ in got
    )


def test_typo_pairs_empty_and_singleton(spark):
    got = fuzzy.typo_pairs(_fact_from_domains(spark, ["solo"])).collect()
    assert got == []


def test_daily_trend_matches_numpy(spark):
    """Known series: counts 2,4,6 on consecutive days -> slope 2,
    intercept 2, r2 1. Then an irregular series vs numpy lstsq."""
    rows = []
    eid = 0
    for day, cnt in [(1, 2), (2, 4), (3, 6)]:
        for _ in range(cnt):
            eid += 1
            rows.append(
                (eid, f"2024-01-{day:02d}T10:00:00", "c1", "d", "Allowed", 0.1)
            )
    r = timeagg.daily_trend(make_fact(spark, rows)).collect()[0]
    assert (r.n_days, r.slope, r.intercept, r.r2) == (3, 2.0, 2.0, 1.0)

    rows = []
    eid = 0
    series = [(1, 5), (2, 3), (4, 9), (7, 4), (8, 11)]
    for day, cnt in series:
        for _ in range(cnt):
            eid += 1
            rows.append(
                (eid, f"2024-01-{day:02d}T10:00:00", "c1", "d", "Allowed", 0.1)
            )
    r = timeagg.daily_trend(make_fact(spark, rows)).collect()[0]
    x = np.array([d - 1 for d, _ in series], dtype=float)
    y = np.array([c for _, c in series], dtype=float)
    slope, intercept = np.polyfit(x, y, 1)
    rho = np.corrcoef(x, y)[0, 1]
    assert r.n_days == 5
    assert abs(r.slope - slope) < 1e-6
    assert abs(r.intercept - intercept) < 1e-6
    assert abs(r.r2 - rho * rho) < 1e-6


def test_daily_trend_single_day_no_crash(spark):
    rows = [(1, "2024-01-01T10:00:00", "c1", "d", "Allowed", 0.1)]
    out = timeagg.daily_trend(make_fact(spark, rows)).collect()
    assert len(out) == 1 and out[0].n_days == 1  # slope NaN/NULL, no raise


def test_basket_2x_doubles_counts_ratios_invariant(spark):
    """Every support count in the 2x run is exactly double its 1x
    twin; confidence and lift are bit-identical."""
    base = {
        (r.domain_a, r.domain_b): r
        for r in se.queries()["domain_association_rules"](spark, SF).collect()
    }
    doubled = {
        (r.domain_a, r.domain_b): r
        for r in se.queries()["basket_scale_2x"](spark, SF).collect()
    }
    assert set(doubled) == set(base)
    for k, d in doubled.items():
        b = base[k]
        assert (d.cnt_ab, d.cnt_a, d.cnt_b) == (
            2 * b.cnt_ab, 2 * b.cnt_a, 2 * b.cnt_b,
        )
        assert d.conf_ab == b.conf_ab and d.lift == b.lift


def _plan(spark, name: str) -> str:
    df = se.queries()[name](spark, SF)
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_typo_plan_joins_on_variant_key(spark):
    """The candidate join is a hash join on the deletion-variant key —
    no cartesian, no all-pairs nested loop."""
    plan = _plan(spark, "domain_typo_pairs")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_trend_plan_windowless_single_row_broadcast(spark):
    """No window anywhere; the min-date joins back as a 1-row
    broadcast."""
    plan = _plan(spark, "daily_trend_slope")
    assert "Window" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan, plan
