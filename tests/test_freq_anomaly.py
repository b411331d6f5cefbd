"""Two-pass exact heavy hitters (operators/freq.py) and the
novelty/anomaly tier (operators/anomaly.py)."""

from __future__ import annotations

import random
from fractions import Fraction

import pandas as pd
from pyspark.sql import functions as F

from piholelongtermstats_spark.operators import anomaly, freq


# ---------------------------------------------------------------------------
# heavy_hitters_exact
# ---------------------------------------------------------------------------

def _exact_hh(values: list[str], k: int) -> dict[str, int]:
    n = len(values)
    counts: dict[str, int] = {}
    for v in values:
        counts[v] = counts.get(v, 0) + 1
    return {v: c for v, c in counts.items() if c * k > n}


def test_heavy_hitters_matches_exact_on_skew(spark):
    rng = random.Random(7)
    values = (
        ["whale"] * 20_000
        + ["shark"] * 9_000
        + [f"minnow{rng.randrange(30_000)}" for _ in range(21_000)]
    )
    rng.shuffle(values)
    df = spark.createDataFrame([(v,) for v in values], "domain string").repartition(8)
    got = {r.item: r.cnt for r in freq.heavy_hitters_exact(df, "domain", 10).collect()}
    assert got == _exact_hh(values, 10)
    assert "whale" in got and got["whale"] == 20_000
    # candidate pass really prunes: the MG summaries carry at most
    # k rows per partition, far below the ~30k distinct minnows
    n_cands = freq._mg_summaries(df, "domain", 10).count()
    assert n_cands <= 10 * df.rdd.getNumPartitions()


def test_mg_subtraction_keeps_true_heavy_hitter():
    """Adversarial single-partition stream: the heavy item arrives ONCE
    PER BATCH, interleaved with fresh one-off keys. A filter-only prune
    (no subtraction) evicts it every batch and loses it; the
    subtract-then-drop rule must keep it."""
    k = 4
    batches = []
    for j in range(200):
        rows = ["heavy"] * 3 + [f"fresh{j}_a", f"fresh{j}_b"]
        batches.append(pd.DataFrame({"domain": rows}))
    # Drive the operator's own partition fold directly.
    acc = freq._mg_fold(iter(batches), "domain", k)
    # f_p(heavy) = 600 of N_p = 1000 -> far above N_p/k = 250: must survive.
    assert "heavy" in acc.index


def test_heavy_hitters_deterministic_across_partitionings(spark):
    values = ["a"] * 50 + ["b"] * 30 + [f"x{i}" for i in range(20)]
    rows = [(v,) for v in values]
    df2 = spark.createDataFrame(rows, "domain string").repartition(2)
    df7 = spark.createDataFrame(rows, "domain string").repartition(7)
    r2 = [(r.item, r.cnt) for r in freq.heavy_hitters_exact(df2, "domain", 4).collect()]
    r7 = [(r.item, r.cnt) for r in freq.heavy_hitters_exact(df7, "domain", 4).collect()]
    # Row ORDER is not part of the contract (the terminal cosmetic sort
    # was dropped in r12 — both checkers are order-insensitive); the
    # result SET must be deterministic across partitionings.
    assert sorted(r2) == sorted(r7) == [("a", 50), ("b", 30)]


# ---------------------------------------------------------------------------
# first_seen_domains / client_daily_spikes
# ---------------------------------------------------------------------------

def _mini_fact(spark, rows):
    """rows: (client, domain, date_iso, n_copies)."""
    import datetime as dt

    data = []
    eid = 0
    for c, d, day, n in rows:
        for _ in range(n):
            data.append((eid, dt.datetime.fromisoformat(day + "T12:00:00"), c, d))
            eid += 1
    df = spark.createDataFrame(
        data, "event_id long, ts timestamp, client string, domain string"
    )
    return df.withColumn("date", F.date_trunc("day", "ts"))


def test_first_seen_domains(spark):
    fact = _mini_fact(
        spark,
        [
            ("c1", "a.com", "2025-01-01", 1),
            ("c1", "b.com", "2025-01-01", 1),
            ("c2", "a.com", "2025-01-02", 3),  # a.com is NOT new on day 2
            ("c2", "c.com", "2025-01-02", 1),
            ("c1", "d.com", "2025-01-04", 1),
            ("c1", "a.com", "2025-01-04", 1),
        ],
    )
    got = {
        r.date.strftime("%Y-%m-%d"): r.new_domains
        for r in anomaly.first_seen_domains(fact).collect()
    }
    assert got == {"2025-01-01": 2, "2025-01-02": 1, "2025-01-04": 1}


def _spikes_exact(daily: dict[str, list[int]], z: int, min_days: int):
    """Fraction-exact reference for the z-score gate."""
    out = set()
    for client, xs in daily.items():
        n = len(xs)
        if n < min_days:
            continue
        s1, s2 = sum(xs), sum(x * x for x in xs)
        for i, x in enumerate(xs):
            lhs = Fraction((n * x - s1) ** 2 * (n - 1))
            rhs = Fraction(z * z * (n * s2 - s1 * s1) * n)
            if n * x > s1 and lhs > rhs:
                out.add((client, i))
    return out


def test_client_daily_spikes_matches_fraction_reference(spark):
    rng = random.Random(3)
    daily: dict[str, list[int]] = {}
    for ci in range(25):
        xs = [rng.randint(8, 12) for _ in range(15)]
        if ci % 3 == 0:
            xs[rng.randrange(15)] = 60  # planted spike
        daily[f"c{ci:02d}"] = xs
    rows = [
        (c, "dom.com", f"2025-02-{i + 1:02d}", x)
        for c, xs in daily.items()
        for i, x in enumerate(xs)
    ]
    fact = _mini_fact(spark, rows)
    got = {
        (r.client, r.date.day - 1)
        for r in anomaly.client_daily_spikes(fact, z=3, min_days=3).collect()
    }
    assert got == _spikes_exact(daily, 3, 3)
    assert got, "fixture must plant at least one spike"


def test_spikes_zero_variance_and_short_history(spark):
    fact = _mini_fact(
        spark,
        # constant client: variance 0, never a spike
        [("flat", "d", f"2025-03-{i:02d}", 5) for i in range(1, 11)]
        # two-day client: below min_days even with a huge jump
        + [("short", "d", "2025-03-01", 1), ("short", "d", "2025-03-02", 99)],
    )
    assert anomaly.client_daily_spikes(fact, z=3, min_days=3).count() == 0
