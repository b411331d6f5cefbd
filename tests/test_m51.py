"""M51 — Matryoshka truncation eval, Kendall τ-b."""

from __future__ import annotations

import datetime as dt
import math

from piholelongtermstats_spark.operators import knn, stattests
from tests.conftest import make_fact

EMB_SCHEMA = "vec_id long, embedding array<float>, label int"


def _emb(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v], 0) for i, v in enumerate(vecs)],
        EMB_SCHEMA,
    )


def test_matryoshka_full_dim_is_identity(spark):
    """Truncating to the full dimension must reproduce the exact
    top-k: recall 10⁶ and nn_rank 1 for every query."""
    vecs = [[1, 0, 0, 0]] + [
        [math.cos(i / 7.0), math.sin(i / 7.0), i / 10.0, 1.0 - i / 20.0]
        for i in range(1, 12)
    ]
    out = knn.matryoshka_recall_eval(
        _emb(spark, vecs), dim=4, n_queries=1, k=3
    ).collect()
    assert len(out) == 1
    assert out[0].recall_ppm == 1_000_000
    assert out[0].nn_rank == 1 and out[0].rr == 1.0


def test_matryoshka_truncation_loses_late_dim_neighbor(spark):
    """The true nearest neighbor matches the query ONLY in the
    truncated-away dims; a decoy matches in the kept dims. With
    dim=2 the decoy wins and the audit must report the miss."""
    q = [0.1, 0.1, 1.0, 0.0]
    true_nn = [0.1, 0.1, 0.99, 0.0]   # cosine ~1 in full space
    decoy = [0.1, 0.1, -1.0, 0.0]     # identical in dims 1-2, opposite later
    far = [-1.0, 0.5, -0.2, 0.3]
    out = {
        r.query_id: r
        for r in knn.matryoshka_recall_eval(
            _emb(spark, [q, true_nn, decoy, far]), dim=2, n_queries=1, k=1
        ).collect()
    }
    r = out[0]
    # in the truncated space true_nn and decoy TIE on cosine (equal
    # kept coordinates); the pinned (cosine DESC, vec_id) order keeps
    # vec_id 1 = true_nn, so this pins the tie-break, and full-dim
    # agreement means the audit scores a hit
    assert r.hits == 1 and r.nn_rank == 1


def test_matryoshka_reports_miss(spark):
    """Make the decoy strictly BETTER in the kept dims: the truncated
    top-1 differs from the exact top-1 -> hits 0, nn_rank NULL."""
    q = [0.1, 0.1, 1.0, 0.0]
    true_nn = [0.1, 0.2, 0.99, 0.0]  # kept dims point AWAY from q's
    decoy = [0.1, 0.1, -1.0, 0.0]    # colinear with q in kept dims
    far = [-1.0, 0.5, -0.2, 0.3]
    r = knn.matryoshka_recall_eval(
        _emb(spark, [q, true_nn, decoy, far]), dim=2, n_queries=1, k=1
    ).collect()[0]
    assert r.hits == 0 and r.recall_ppm == 0
    assert r.nn_rank is None and r.rr is None


def _kendall_rows(day_specs, start="2024-01-01"):
    """day_specs: list of (count, reply_ms) — count events that day,
    all with the same reply."""
    t0 = dt.datetime.fromisoformat(f"{start}T10:00:00")
    rows, eid = [], 0
    for i, (c, ms) in enumerate(day_specs):
        for j in range(c):
            eid += 1
            rows.append(
                (eid, (t0 + dt.timedelta(days=i, minutes=j)).isoformat(),
                 "c1", "dom", "Allowed", ms / 1000.0)
            )
    return rows


def test_kendall_perfectly_concordant(spark):
    fact = make_fact(
        spark, _kendall_rows([(2, 10), (4, 20), (6, 30), (8, 40)])
    )
    r = stattests.kendall_tau_volume_reply(fact).collect()[0]
    assert (r.n_days, r.n_pairs) == (4, 6)
    assert r.conc_minus_disc == 6 and r.tau_b == 1.0


def test_kendall_perfectly_discordant(spark):
    fact = make_fact(
        spark, _kendall_rows([(2, 40), (4, 30), (6, 20), (8, 10)])
    )
    r = stattests.kendall_tau_volume_reply(fact).collect()[0]
    assert r.conc_minus_disc == -6 and r.tau_b == -1.0


def test_kendall_matches_direct_formula_with_ties(spark):
    specs = [(3, 10), (3, 25), (5, 25), (7, 15), (2, 30), (6, 15)]
    fact = make_fact(spark, _kendall_rows(specs))
    r = stattests.kendall_tau_volume_reply(fact).collect()[0]
    ys = [c for c, _ in specs]
    ms = [m for _, m in specs]
    n = len(specs)
    cmd = ty = tr = 0
    for i in range(n):
        for j in range(i + 1, n):
            sy = (ys[i] > ys[j]) - (ys[i] < ys[j])
            sr = (ms[i] > ms[j]) - (ms[i] < ms[j])
            cmd += sy * sr
            ty += sy == 0
            tr += sr == 0
    n0 = n * (n - 1) // 2
    assert (r.n_pairs, r.conc_minus_disc, r.ties_y, r.ties_r) == (
        n0, cmd, ty, tr)
    assert r.tau_b == round(cmd / math.sqrt((n0 - ty) * (n0 - tr)), 6)
