"""M23 inference wave: Welch t / Spearman / ACF / Benford against
independent references (python-float Welch, exact-integer rank and
ACF arithmetic, math.log10 for the Benford literals)."""

from __future__ import annotations

import math

import pytest

from piholelongtermstats_spark.operators import stattests
from tests.conftest import make_fact


def _fact_day_night(spark, day_vals, night_vals):
    rows = []
    eid = 0
    for v in day_vals:
        eid += 1
        rows.append((eid, "2024-01-01T10:00:00", "c1", "d", "Allowed", v))
    for v in night_vals:
        eid += 1
        rows.append((eid, "2024-01-01T02:00:00", "c1", "d", "Allowed", v))
    return make_fact(spark, rows)


def _welch_reference(a, b):
    """Standard Welch t on the quantized grid, independent formula
    (per-sample mean/variance, not the engine's moment identity)."""
    ra = [round(v * 1000) for v in a]
    rb = [round(v * 1000) for v in b]
    ma, mb = sum(ra) / len(ra), sum(rb) / len(rb)
    va = sum((x - ma) ** 2 for x in ra) / (len(ra) - 1)
    vb = sum((x - mb) ** 2 for x in rb) / (len(rb) - 1)
    aa, ab = va / len(ra), vb / len(rb)
    t = (ma - mb) / math.sqrt(aa + ab)
    df = (aa + ab) ** 2 / (
        aa * aa / (len(ra) - 1) + ab * ab / (len(rb) - 1)
    )
    return t, df


def test_welch_matches_reference(spark):
    day = [1.0, 2.5, 2.5, 4.0, 10.0]
    night = [3.0, 3.5, 8.0]
    r = stattests.welch_day_night(
        _fact_day_night(spark, day, night)
    ).collect()[0]
    t, df = _welch_reference(day, night)
    assert r.n1 == 5 and r.n2 == 3
    assert r.s1 == sum(round(v * 1000) for v in day)
    assert int(r.q1) == sum(round(v * 1000) ** 2 for v in day)
    assert r.t_stat == pytest.approx(t, abs=2e-6)
    assert r.df == pytest.approx(df, abs=2e-6)


def test_welch_degenerate_single_sided(spark):
    """No Night rows: moments still exact, t/df NULL (not a crash)."""
    r = stattests.welch_day_night(
        _fact_day_night(spark, [1.0, 2.0], [])
    ).collect()[0]
    assert r.n2 == 0 and r.s2 is None
    assert r.t_stat is None and r.df is None


def _avg_ranks_doubled(xs):
    """2×average-rank per value, exact integers."""
    order = sorted(xs)
    out = []
    for x in xs:
        p = order.index(x) + 1          # min rank
        t = order.count(x)              # tie size
        out.append(2 * p + t - 1)
    return out


def test_spearman_matches_exact_rank_arithmetic(spark):
    # Daily counts (x) and per-day reply sums (y), ties included:
    # day i gets counts[i] events each with reply_time replies[i].
    counts = [2, 4, 4, 1, 3]
    replies = [0.5, 0.25, 0.125, 2.0, 0.25]
    rows = []
    eid = 0
    for i, (c, v) in enumerate(zip(counts, replies)):
        for _ in range(c):
            eid += 1
            rows.append(
                (eid, f"2024-01-{i + 1:02d}T10:00:00", "c1", "d",
                 "Allowed", v)
            )
    r = stattests.spearman_volume_reply(make_fact(spark, rows)).collect()[0]
    ys = [round(v * 1000) * c for c, v in zip(counts, replies)]
    u = _avg_ranks_doubled(counts)
    v = _avg_ranks_doubled(ys)
    n = len(counts)
    su, sv = sum(u), sum(v)
    suv = sum(a * b for a, b in zip(u, v))
    suu, svv = sum(a * a for a in u), sum(b * b for b in v)
    num = n * suv - su * sv
    denu, denv = n * suu - su * su, n * svv - sv * sv
    assert (r.n_days, r.rho_num, r.den_u, r.den_v) == (n, num, denu, denv)
    assert r.rho == pytest.approx(
        num / math.sqrt(denu * denv), abs=1e-6
    )


def test_spearman_perfect_monotone(spark):
    """Strictly increasing volume with strictly increasing reply sums
    ⇒ ρ = 1 exactly."""
    rows = []
    eid = 0
    for i, c in enumerate([1, 2, 3, 4]):
        for _ in range(c):
            eid += 1
            rows.append(
                (eid, f"2024-01-{i + 1:02d}T10:00:00", "c1", "d",
                 "Allowed", 1.0)
            )
    r = stattests.spearman_volume_reply(make_fact(spark, rows)).collect()[0]
    assert r.rho == 1.0


def test_acf_matches_integer_reference(spark):
    counts = [2, 4, 3, 6, 5, 9, 4, 7, 3, 8]
    rows = []
    eid = 0
    for i, c in enumerate(counts):
        for _ in range(c):
            eid += 1
            rows.append(
                (eid, f"2024-01-{i + 1:02d}T10:00:00", "c1", "d",
                 "Allowed", 0.1)
            )
    out = stattests.acf_daily_counts(make_fact(spark, rows), max_lag=3)
    got = {r.lag_k: r for r in out.collect()}
    n, s = len(counts), sum(counts)
    cs = [n * x - s for x in counts]
    den = sum(c * c for c in cs)
    for k in (1, 2, 3):
        num = sum(cs[i] * cs[i + k] for i in range(n - k))
        assert got[k].acf_num == num and got[k].acf_den == den
        assert got[k].rho == pytest.approx(num / den, abs=1e-6)


def test_acf_gapped_series_pairs_by_calendar_day(spark):
    """A missing calendar day must break lag-1 adjacency: days 1,2,4
    have only the (1,2) pair at lag 1 and (2,4) at lag 2."""
    rows = [
        (1, "2024-01-01T10:00:00", "c1", "d", "Allowed", 0.1),
        (2, "2024-01-02T10:00:00", "c1", "d", "Allowed", 0.1),
        (3, "2024-01-02T11:00:00", "c1", "d", "Allowed", 0.1),
        (4, "2024-01-04T10:00:00", "c1", "d", "Allowed", 0.1),
        (5, "2024-01-04T11:00:00", "c1", "d", "Allowed", 0.1),
        (6, "2024-01-04T12:00:00", "c1", "d", "Allowed", 0.1),
    ]
    out = stattests.acf_daily_counts(make_fact(spark, rows), max_lag=3)
    got = {r.lag_k: r for r in out.collect()}
    n, s = 3, 6
    c1, c2, c4 = n * 1 - s, n * 2 - s, n * 3 - s
    assert got[1].acf_num == c1 * c2          # days (1,2) only
    assert got[2].acf_num == c2 * c4          # days (2,4) only
    assert got[3].acf_num == c1 * c4          # days (1,4) only


def test_benford_counts_and_literals(spark):
    # First digits by construction: 1.0→1000(1), 2.5→2500(2),
    # 0.3→300(3), 0.25→250(2), 9.0→9000(9), 0.0 dropped (r=0).
    vals = [1.0, 2.5, 0.3, 0.25, 9.0, 0.0]
    rows = [
        (i + 1, "2024-01-01T10:00:00", "c1", "d", "Allowed", v)
        for i, v in enumerate(vals)
    ]
    out = stattests.benford_reply_digits(make_fact(spark, rows)).collect()
    got = {r.digit: r for r in out}
    assert {d: r.cnt for d, r in got.items()} == {1: 1, 2: 2, 3: 1, 9: 1}
    assert got[2].obs_ppb == 2 * 10**9 // 5
    for d, r in got.items():
        assert r.expected_ppb == round(math.log10(1 + 1 / d) * 1e9)
        assert r.dev_ppb == r.obs_ppb - r.expected_ppb


def test_benford_literal_table_is_log10():
    for d, p in stattests.BENFORD_PPB.items():
        assert p == round(math.log10(1 + 1 / d) * 1e9)


def test_mann_whitney_literal(spark):
    """Hand-computable fixture with ties straddling the groups:
    Day = [1,2,2,5], Night = [2,3,5]; midranks over merged
    [1,2,2,2,3,5,5]: 1, 3,3,3, 5, 6.5,6.5. R_day = 1+3+3+6.5 = 13.5
    -> 2R=27, 2U1 = 27 - 4*5 = 7; T = (3^3-3)+(2^3-2) = 30."""
    import math

    rows = []
    for i, (p, v) in enumerate(
        [("Day", 1), ("Day", 2), ("Day", 2), ("Day", 5),
         ("Night", 2), ("Night", 3), ("Night", 5)]
    ):
        hour = "12" if p == "Day" else "02"
        rows.append((i, f"2024-01-01T{hour}:00:00", "c", "d", "Allowed", v / 1000.0))
    fact = make_fact(spark, rows)
    r = stattests.mann_whitney_day_night(fact).collect()[0]
    assert (r.n1, r.n2) == (4, 3)
    assert int(r.u2_day) == 7 and int(r.tie_term) == 30
    n1, n2, nn = 4.0, 3.0, 7.0
    bracket = (7**3 - 7) - 30
    var = (n1 * n2) * bracket / (12.0 * nn * (nn - 1.0))
    want = (7.0 - n1 * n2) / (2.0 * math.sqrt(var))
    assert r.z == round(want, 6)


def test_levene_detects_variance_shift(spark):
    """Day tight around 10ms, Night spread: the deviations-from-
    median t must be strongly negative (day less variable), and the
    moments must equal the literal welch-on-|dev| computation."""
    import math

    day_vals = [9, 10, 10, 10, 11]
    night_vals = [1, 5, 10, 15, 19]
    rows = []
    i = 0
    for v in day_vals:
        rows.append((i, "2024-01-01T12:00:00", "c", "d", "Allowed", v / 1000.0)); i += 1
    for v in night_vals:
        rows.append((i, "2024-01-01T02:00:00", "c", "d", "Allowed", v / 1000.0)); i += 1
    fact = make_fact(spark, rows)
    r = stattests.levene_day_night(fact).collect()[0]

    def dev2(vals):
        s = sorted(vals)
        n = len(s)
        med2 = s[(n + 1) // 2 - 1] + s[n // 2]
        return [abs(2 * v - med2) for v in vals]

    z1, z2 = dev2(day_vals), dev2(night_vals)
    assert (r.n1, r.s1, int(r.q1)) == (5, sum(z1), sum(x * x for x in z1))
    assert (r.n2, r.s2, int(r.q2)) == (5, sum(z2), sum(x * x for x in z2))
    m1, m2 = sum(z1) / 5.0, sum(z2) / 5.0
    v1 = (sum(x * x for x in z1) - sum(z1) ** 2 / 5.0) / 4.0
    v2 = (sum(x * x for x in z2) - sum(z2) ** 2 / 5.0) / 4.0
    want = (m1 - m2) / math.sqrt(v1 / 5.0 + v2 / 5.0)
    assert r.t_stat == round(want, 6) and r.t_stat < -2
