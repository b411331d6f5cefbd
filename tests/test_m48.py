"""M48 — prequential running z-score, Rényi-2 diversity, l-diversity."""

from __future__ import annotations

import datetime as dt
import math

from pyspark.sql import functions as F

from piholelongtermstats_spark.operators import anomaly, counts
from tests.conftest import make_fact

DAILY_SCHEMA = "client string, date timestamp, y long"


def _daily(spark, rows):
    return spark.createDataFrame(
        [(c, dt.datetime.fromisoformat(d), y) for c, d, y in rows],
        DAILY_SCHEMA,
    )


def test_running_zscore_hand_values(spark):
    rows = [
        ("c1", "2024-01-01", 1),
        ("c1", "2024-01-02", 3),
        ("c1", "2024-01-03", 5),
    ]
    out = anomaly.running_zscore_by_client(_daily(spark, rows)).collect()
    # only day 3 is scored (first two build history)
    assert len(out) == 1
    r = out[0]
    assert r.n_prior == 2
    # prior mean 2, sample sd sqrt(2): z = 3/sqrt(2)
    assert r.z == round(6.0 * math.sqrt(1.0 / 8.0), 6)
    assert r.is_spike == 0


def test_running_zscore_zero_variance_history(spark):
    rows = [
        ("c1", "2024-01-01", 5),
        ("c1", "2024-01-02", 5),
        ("c1", "2024-01-03", 9),   # any deviation from constant: spike
        ("c2", "2024-01-01", 7),
        ("c2", "2024-01-02", 7),
        ("c2", "2024-01-03", 7),   # exactly the constant: no spike
    ]
    out = {
        (r.client): r
        for r in anomaly.running_zscore_by_client(
            _daily(spark, rows)
        ).collect()
    }
    assert out["c1"].z is None and out["c1"].is_spike == 1
    assert out["c2"].z is None and out["c2"].is_spike == 0


def test_running_zscore_spike_gate_matches_z(spark):
    """|z| > 3 <-> integer gate, on a genuinely spiking series."""
    rows = [("c1", f"2024-01-0{i}", v) for i, v in enumerate([10, 10, 10, 12], 1)]
    rows.append(("c1", "2024-01-05", 100))
    out = sorted(
        anomaly.running_zscore_by_client(_daily(spark, rows)).collect(),
        key=lambda r: r.date,
    )
    last = out[-1]
    assert last.n_prior == 4
    assert last.z == 89.5  # (4*100-42)*sqrt(3/(4*12)) = 358/4
    assert last.is_spike == 1
    assert all((abs(r.z) > 3) == bool(r.is_spike) for r in out if r.z is not None)


def test_running_zscore_is_causal(spark):
    """Scores must not change when FUTURE days are appended."""
    base = [("c1", f"2024-01-{d:02d}", v) for d, v in
            zip(range(1, 6), [4, 7, 5, 6, 30])]
    extended = base + [("c1", "2024-01-06", 1000), ("c1", "2024-01-07", 2)]
    a = {r.date: (r.z, r.is_spike) for r in
         anomaly.running_zscore_by_client(_daily(spark, base)).collect()}
    b = {r.date: (r.z, r.is_spike) for r in
         anomaly.running_zscore_by_client(_daily(spark, extended)).collect()}
    for k, v in a.items():
        assert b[k] == v


def _rows_for_domains(day_domains, start="2024-01-01"):
    """day_domains: list per day of {domain: count}."""
    t0 = dt.datetime.fromisoformat(f"{start}T10:00:00")
    rows, eid = [], 0
    for i, doms in enumerate(day_domains):
        for dom, c in doms.items():
            for j in range(c):
                eid += 1
                rows.append(
                    (eid, (t0 + dt.timedelta(days=i, minutes=j)).isoformat(),
                     "c1", dom, "Allowed", 0.1)
                )
    return rows


def test_renyi2_hand_values(spark):
    fact = make_fact(
        spark,
        _rows_for_domains([{"a": 4}, {"a": 2, "b": 2}, {"a": 1, "b": 1, "c": 1, "d": 1}]),
    )
    out = {r.date.day: r for r in counts.renyi2_entropy_daily(fact).collect()}
    # single domain: collision prob 1 -> renyi2 = 0, eff = 1
    assert out[1].renyi2 == 0.0 and out[1].eff_domains == 1.0
    # 50/50: p2 = 1/2 -> renyi2 = ln 2, eff = 2
    assert out[2].renyi2 == round(math.log(2.0), 6)
    assert out[2].eff_domains == 2.0
    # uniform over 4: p2 = 1/4 -> renyi2 = ln 4, eff = 4
    assert out[3].renyi2 == round(math.log(4.0), 6)
    assert out[3].eff_domains == 4.0
    assert out[3].n_domains == 4


def test_l_diversity_worst_k_ordering_and_audit(spark):
    """Groups: dom1 10 events 1 client (worst), dom2 6 events 2
    clients, dom3 8 events 3 clients, dom4 only 2 events (suppressed
    by the k=5 cell rule so it never reaches the audit)."""
    t0 = dt.datetime.fromisoformat("2024-01-01T10:00:00")
    rows, eid = [], 0
    for dom, clients in (
        ("dom1", ["a"] * 10),
        ("dom2", ["a", "a", "a", "b", "b", "b"]),
        ("dom3", ["a", "b", "c", "a", "b", "c", "a", "b"]),
        ("dom4", ["a", "z"]),
    ):
        for j, c in enumerate(clients):
            eid += 1
            rows.append(
                (eid, (t0 + dt.timedelta(minutes=j)).isoformat(),
                 c, dom, "Allowed", 0.1)
            )
    out = counts.l_diversity_audit(make_fact(spark, rows), k=5, worst=2).collect()
    assert [r.domain for r in out] == ["dom1", "dom2"]
    assert out[0].n_clients == 1 and out[0].cnt == 10
    assert all(r.groups_released == 3 and r.min_l == 1 for r in out)
