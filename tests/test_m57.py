"""M57 — first-principles HLL audit."""

from __future__ import annotations

import datetime as dt
import hashlib
import math

from piholelongtermstats_spark.operators import approx
from tests.conftest import make_fact


def _rows(clients, start="2024-01-01"):
    t0 = dt.datetime.fromisoformat(f"{start}T10:00:00")
    return [
        (i + 1, (t0 + dt.timedelta(minutes=i)).isoformat(), c, "dom",
         "Allowed", 0.1)
        for i, c in enumerate(clients)
    ]


def _py_hll(keys):
    """Reference replica of the operator's exact arithmetic."""
    m = 64
    regs = [0] * m
    for k in set(keys):
        h = int(hashlib.md5(k.encode()).hexdigest()[:15], 16)
        reg, w = h % m, h // m
        rho = 55 if w == 0 else 55 - w.bit_length()
        regs[reg] = max(regs[reg], rho)
    z = 0.0
    for mj in regs:  # ascending register order, like both engines
        z += 0.5 ** mj
    v = sum(1 for mj in regs if mj == 0)
    est = 0.709 * 4096.0 / z
    if est <= 160.0 and v > 0:
        est = 64.0 * math.log(64.0 / v)
    return est, v


def test_hll_matches_python_replica(spark):
    clients = [f"cl_{i}" for i in range(300)]
    fact = make_fact(spark, _rows(clients))
    r = approx.hll_distinct_audit(fact).collect()[0]
    est, v = _py_hll(clients)
    assert r.n_exact == 300
    assert r.v_zero == v
    assert r.est == round(est, 6)


def test_hll_ignores_duplicates(spark):
    clients = [f"cl_{i % 40}" for i in range(400)]  # 10x duplication
    fact = make_fact(spark, _rows(clients))
    base = make_fact(spark, _rows([f"cl_{i}" for i in range(40)]))
    a = approx.hll_distinct_audit(fact).collect()[0]
    b = approx.hll_distinct_audit(base).collect()[0]
    assert (a.est, a.v_zero, a.n_exact) == (b.est, b.v_zero, b.n_exact)


def test_hll_small_range_correction_kicks_in(spark):
    """A handful of keys leaves most registers empty: the estimate
    must come from the m*ln(m/V) branch and sit near the truth."""
    clients = [f"k{i}" for i in range(5)]
    fact = make_fact(spark, _rows(clients))
    r = approx.hll_distinct_audit(fact).collect()[0]
    assert r.v_zero >= 59
    assert 1 <= r.est <= 15  # linear counting is tight at tiny n


def test_hll_error_within_sane_band(spark):
    """m=64 gives ~13% standard error; a single draw at n=1000 should
    land within ~4 sigma."""
    clients = [f"client_{i}_{i*i}" for i in range(1000)]
    fact = make_fact(spark, _rows(clients))
    r = approx.hll_distinct_audit(fact).collect()[0]
    assert abs(r.est - 1000) / 1000 < 0.52
    assert r.abs_err_ppm == round(abs(r.est - 1000.0) / 1000.0 * 1e6)
