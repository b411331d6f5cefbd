"""M54 — DP Laplace release, interchange consistency."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from piholelongtermstats_spark.operators import counts
from piholelongtermstats_spark.operators import text as _text
from tests.conftest import make_fact


def _day_counts(counts_list, start="2024-01-01"):
    t0 = dt.datetime.fromisoformat(f"{start}T10:00:00")
    rows, eid = [], 0
    for i, c in enumerate(counts_list):
        for j in range(c):
            eid += 1
            rows.append(
                (eid, (t0 + dt.timedelta(days=i, minutes=j)).isoformat(),
                 "c1", "dom", "Allowed", 0.1)
            )
    return rows


def test_dp_release_is_deterministic(spark):
    fact = make_fact(spark, _day_counts([10, 20, 30, 40]))
    a = {r.date: r.released for r in
         counts.dp_noised_daily_counts(fact).collect()}
    b = {r.date: r.released for r in
         counts.dp_noised_daily_counts(fact).collect()}
    assert a == b
    assert all(v is not None for v in a.values())


def test_dp_noise_magnitude_tracks_epsilon(spark):
    """b = 1/ε: tighter ε (more privacy) must produce strictly more
    total absolute error on the same draws, and E|noise| ≈ b."""
    fact = make_fact(spark, _day_counts([25] * 40))
    tight = counts.dp_noised_daily_counts(fact, epsilon_x1000=50)
    loose = counts.dp_noised_daily_counts(fact, epsilon_x1000=5000)
    e_tight = sum(r.abs_err for r in tight.collect())  # b = 20
    e_loose = sum(r.abs_err for r in loose.collect())  # b = 0.2
    assert e_tight > e_loose
    # deterministic draws, but distributionally E|noise| = b: the
    # 40-day mean should land within a wide band of b
    assert 5.0 < e_tight / 40 < 80.0
    assert 0.05 < e_loose / 40 < 0.8
    # exact scale relation: the same uniform draws underlie both, so
    # every row's error scales by exactly b1/b2 (up to the round-6)
    t = {r.date: r.abs_err for r in tight.collect()}
    l = {r.date: r.abs_err for r in loose.collect()}
    for d in t:
        assert abs(t[d] - 100.0 * l[d]) < 1e-3


def test_dp_true_count_never_altered(spark):
    """The audit columns must carry the exact true counts (the
    mechanism perturbs the RELEASE, not the measurement)."""
    fact = make_fact(spark, _day_counts([7, 13, 29]))
    rows = counts.dp_noised_daily_counts(fact).collect()
    assert sorted(r.true_cnt for r in rows) == [7, 13, 29]
    for r in rows:
        assert abs(r.released - r.true_cnt) == r.abs_err or (
            abs(round(abs(r.released - r.true_cnt), 6) - r.abs_err) < 2e-6
        )


def test_dp_real_noise_path_is_secret_and_laplace_shaped(spark):
    """real_noise=True (the production semantics, r9 VERDICT #6):
    draws come from SystemRandom, so (a) two runs on the same input
    must NOT reproduce each other (non-replayability is the point),
    (b) true counts are still exact, and (c) |noise| is
    Laplace(b)-shaped: over 120 days at b = 2, the empirical mean
    |noise| must land in a wide band around b and the empirical
    median |noise| around b·ln2 (both have ~b/√n s.e. ≈ 0.18)."""
    import math

    fact = make_fact(spark, _day_counts([9] * 120))
    a = counts.dp_noised_daily_counts(
        fact, epsilon_x1000=500, real_noise=True
    ).collect()
    b = counts.dp_noised_daily_counts(
        fact, epsilon_x1000=500, real_noise=True
    ).collect()
    ra = {r.date: r.released for r in a}
    rb = {r.date: r.released for r in b}
    assert ra != rb  # P(equal) over 120 continuous draws ~ 0
    assert sorted(r.true_cnt for r in a) == [9] * 120
    errs = sorted(r.abs_err for r in a)
    scale = 2.0  # b = 1000/500 * ... = 1/eps = 2
    mean_abs = sum(errs) / len(errs)
    median_abs = (errs[59] + errs[60]) / 2
    assert 0.5 * scale < mean_abs < 2.0 * scale
    assert 0.4 * scale * math.log(2) < median_abs < 2.5 * scale * math.log(2)


def test_dp_real_noise_secret_not_in_plan_and_action_stable(spark):
    """r11 VERDICT #6: the real-noise secret must live ONLY in the
    pandas_udf closure — (a) the full queryExecution dump (parsed→
    physical, what event logs and the UI record) shows a pythonUDF
    call and NO driver-built literal relation carrying the uniforms;
    (b) noise is a keyed PRF of the date, so repeated actions on the
    SAME returned frame emit identical releases (task retries do not
    silently re-spend ε), while a fresh call draws a fresh key."""
    fact = make_fact(spark, _day_counts([5] * 30))
    df = counts.dp_noised_daily_counts(
        fact, epsilon_x1000=500, real_noise=True
    )
    a = {r.date: r.released for r in df.collect()}
    b = {r.date: r.released for r in df.collect()}
    assert a == b  # per-frame determinism across actions
    dump = df._jdf.queryExecution().toString()
    assert "pythonUDF" in dump or "_secret_ppb" in dump
    for marker in ("LocalTableScan", "LocalRelation", "ppb_secret#"):
        # the pre-r12 design embedded the uniforms as LocalRelation
        # rows named ppb_secret; none of that shape may reappear —
        # the attribute the udf produces is _ppb_secret (underscore).
        if marker == "ppb_secret#":
            assert " ppb_secret#" not in dump
        else:
            assert marker not in dump, marker


def test_interchange_panel_all_match_on_testdata(spark):
    import __spark_entry__ as se

    r = se.queries()["interchange_consistency_panel"](
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    assert r.n_formats == 3
    assert r.all_match == 1
    assert r.n_docs > 0


def test_text_hashsum_is_tamper_sensitive(spark):
    """A single-character change in one document flips the
    order-independent hash sum the panel compares."""
    docs = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "gamma")], "doc_id long, text string"
    )
    tampered = spark.createDataFrame(
        [(1, "alpha"), (2, "betA"), (3, "gamma")], "doc_id long, text string"
    )
    h = _text.md5_hash60(F.col("text")) % 1000000007

    def hs(df):
        return df.agg(F.sum(h).cast("long").alias("s")).collect()[0].s

    assert hs(docs) != hs(tampered)
