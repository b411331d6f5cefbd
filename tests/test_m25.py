"""M25: sliding 30-min peak vs a brute-force scan, burstiness CV vs
python moments, HHI vs literal arithmetic."""

from __future__ import annotations

import datetime as dt
import math

import pytest

from piholelongtermstats_spark.operators import counts, sequential
from tests.conftest import make_fact


def test_sliding_peak_matches_bruteforce(spark):
    # One client with a burst of 4 events inside 30 min, another flat.
    times = {
        "burst": ["10:00:00", "10:05:00", "10:20:00", "10:29:59",
                  "12:00:00"],
        "flat": ["08:00:00", "09:00:00", "10:00:00"],
    }
    rows, eid = [], 0
    for c, ts in times.items():
        for t in ts:
            eid += 1
            rows.append((eid, f"2024-01-01T{t}", c, "d", "Allowed", 0.1))
    got = sequential.sliding_peak_30min(make_fact(spark, rows), k=10).collect()

    def brute(ts_list):
        us = [
            int(dt.datetime.fromisoformat(f"2024-01-01T{t}")
                .replace(tzinfo=dt.timezone.utc).timestamp() * 1e6)
            for t in ts_list
        ]
        best, best_at = 0, None
        for i, t in enumerate(us):
            c = sum(1 for u in us if t - (30 * 60 * 1_000_000 - 1) <= u <= t)
            if c > best:
                best, best_at = c, ts_list[i]
        return best, best_at

    want = {c: brute(ts) for c, ts in times.items()}
    assert [(r.client, r.peak) for r in got] == [
        ("burst", want["burst"][0]), ("flat", want["flat"][0])
    ]
    peak_at = {r.client: r.peak_at.strftime("%H:%M:%S") for r in got}
    assert peak_at == {"burst": want["burst"][1], "flat": want["flat"][1]}


def test_sliding_peak_window_is_trailing_exclusive_of_30min(spark):
    """Events exactly 30:00 apart must NOT share a window (frame is
    (t-30min, t], i.e. 1799999999 µs preceding)."""
    rows = [
        (1, "2024-01-01T10:00:00", "c", "d", "Allowed", 0.1),
        (2, "2024-01-01T10:30:00", "c", "d", "Allowed", 0.1),
    ]
    got = sequential.sliding_peak_30min(make_fact(spark, rows), k=1).collect()
    assert got[0].peak == 1


def test_interarrival_cv_matches_python_moments(spark):
    # Bursty: gaps 1s,1s,3600s; steady: gaps 60s,60s,60s.
    def mk(client, gaps_s, start, base_eid):
        t = dt.datetime.fromisoformat(start)
        out = [(base_eid, t.isoformat(), client, "d", "Allowed", 0.1)]
        for i, g in enumerate(gaps_s):
            t += dt.timedelta(seconds=g)
            out.append(
                (base_eid + i + 1, t.isoformat(), client, "d", "Allowed", 0.1)
            )
        return out

    rows = mk("bursty", [1, 1, 3600], "2024-01-01T10:00:00", 1) + mk(
        "steady", [60, 60, 60], "2024-01-01T10:00:00", 100
    )
    got = sequential.interarrival_burstiness(make_fact(spark, rows), k=5).collect()

    def ref(gaps_s):
        g = [x * 1_000_000 for x in gaps_s]
        n, s, q = len(g), sum(g), sum(x * x for x in g)
        return round(math.sqrt(n * q - s * s) / s, 6)

    by = {r.client: r for r in got}
    assert by["bursty"].cv == pytest.approx(ref([1, 1, 3600]), abs=1e-6)
    assert by["steady"].cv == 0.0
    assert by["bursty"].n_gaps == 3
    assert int(by["bursty"].ssq_g) == sum(
        (x * 1_000_000) ** 2 for x in [1, 1, 3600]
    )
    # bursty sorts first (cv desc)
    assert [r.client for r in got] == ["bursty", "steady"]


def test_interarrival_single_event_client_excluded(spark):
    rows = [
        (1, "2024-01-01T10:00:00", "solo", "d", "Allowed", 0.1),
        (2, "2024-01-01T10:00:00", "pair", "d", "Allowed", 0.1),
        (3, "2024-01-01T10:00:01", "pair", "d", "Allowed", 0.1),
    ]
    got = sequential.interarrival_burstiness(make_fact(spark, rows), k=5).collect()
    # 'pair' has 1 gap (< 2) and 'solo' none — both excluded.
    assert got == []


def test_hhi_matches_literal(spark):
    # focused: 9 hits on one domain, 1 on another → HHI = 82/100.
    # spread: 2+2 → HHI = 8/16 = 0.5.
    rows, eid = [], 0
    for dom, n in [("a", 9), ("b", 1)]:
        for _ in range(n):
            eid += 1
            rows.append((eid, "2024-01-01T10:00:00", "focused", dom,
                         "Allowed", 0.1))
    for dom in ["a", "b", "a", "b"]:
        eid += 1
        rows.append((eid, "2024-01-01T11:00:00", "spread", dom,
                     "Allowed", 0.1))
    got = counts.client_concentration_hhi(make_fact(spark, rows), k=10).collect()
    by = {r.client: r for r in got}
    assert (by["focused"].hhi_num, by["focused"].hhi_den) == (82, 100)
    assert by["focused"].hhi == 0.82
    assert by["spread"].hhi == 0.5
    assert by["focused"].n_domains == 2
    assert [r.client for r in got] == ["focused", "spread"]
