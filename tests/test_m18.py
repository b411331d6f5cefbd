"""M18 wave semantics: winnowing fingerprints (MOSS guarantee,
rightmost-tie rule, short/empty docs), Markov status transitions
(midnight stitch), debounce burst collapse (exact-gap boundary)."""

from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__ as se
from piholelongtermstats_spark.operators import sequential, text
from tests.conftest import make_fact

SF = "/root/testdata/sf0.001"


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


# ---------------------------------------------------------------------------
# Winnowing
# ---------------------------------------------------------------------------

def test_winnowing_shared_run_guarantee(spark):
    """The MOSS guarantee: any shared token run of length >= w+k-1
    (= 10 here) yields at least one identical fingerprint hash in
    both documents."""
    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    d = _docs(
        spark,
        [
            "x1 y1 z1 " + shared + " q1 r1 s1",
            "m2 n2 " + shared + " o2 p2 u2 v2 w2",
        ],
    )
    fp = text.winnowing_fingerprints(d, k=3, w=8).collect()
    h0 = {r.fp_hash for r in fp if r.doc_id == 0}
    h1 = {r.fp_hash for r in fp if r.doc_id == 1}
    assert h0 & h1, (h0, h1)


def test_winnowing_rightmost_tie(spark):
    """All-identical grams (doc = one repeated token): every window's
    min hash ties everywhere, so the rightmost rule must select
    exactly positions w-1 .. n_grams-1."""
    n_tok, k, w = 14, 3, 4
    n_grams = n_tok - k + 1  # 12
    d = _docs(spark, [" ".join(["dup"] * n_tok)])
    fp = text.winnowing_fingerprints(d, k=k, w=w).collect()
    assert sorted(r.fp_pos for r in fp) == list(range(w - 1, n_grams))
    assert len({r.fp_hash for r in fp}) == 1


def test_winnowing_short_and_empty_docs(spark):
    """A doc with >= 1 but < w grams yields exactly its global-min
    fingerprint (one row); an empty doc yields none."""
    d = _docs(spark, ["only four tokens here", "", "   "])
    fp = text.winnowing_fingerprints(d, k=3, w=8).collect()
    assert [r.doc_id for r in fp] == [0]


def test_winnowing_fp_matches_bruteforce(spark):
    """Brute-force reference on a small doc: hash40 per k-gram,
    window-min with rightmost tie, dedup — bit-identical to the
    engine output."""
    import hashlib

    words = "the quick brown fox jumps over the lazy dog again and again".split()
    k, w = 3, 4
    grams = [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)]
    h = [int(hashlib.md5(g.encode()).hexdigest()[:10], 16) for g in grams]
    expect = set()
    for s in range(0, len(grams) - w + 1):
        window = h[s : s + w]
        m = min(window)
        pos = s + max(i for i, v in enumerate(window) if v == m)
        expect.add((pos, m))
    d = _docs(spark, [" ".join(words)])
    got = {
        (r.fp_pos, r.fp_hash)
        for r in text.winnowing_fingerprints(d, k=k, w=w).collect()
    }
    assert got == expect


# ---------------------------------------------------------------------------
# Status transitions
# ---------------------------------------------------------------------------

def test_transitions_cross_midnight_stitch(spark):
    """The (client, date)-partitioned lag + midnight stitch must count
    the pair that spans midnight exactly once."""
    rows = [
        (1, "2024-01-01T23:50:00", "c1", "d", "Allowed", 0.1),
        (2, "2024-01-01T23:55:00", "c1", "d", "Blocked", 0.1),
        (3, "2024-01-02T00:05:00", "c1", "d", "Allowed", 0.1),  # crosses midnight
        (4, "2024-01-02T00:10:00", "c2", "d", "Other", 0.1),    # lone event: no pair
    ]
    out = {
        (r.prev_status, r.status): (r.cnt, r.pct)
        for r in sequential.status_transitions(make_fact(spark, rows)).collect()
    }
    assert out == {
        ("Allowed", "Blocked"): (1, 100.0),
        ("Blocked", "Allowed"): (1, 100.0),
    }


def test_transitions_row_normalized(spark):
    rows = [
        (1, "2024-01-01T10:00:00", "c1", "d", "Allowed", 0.1),
        (2, "2024-01-01T10:01:00", "c1", "d", "Allowed", 0.1),
        (3, "2024-01-01T10:02:00", "c1", "d", "Blocked", 0.1),
        (4, "2024-01-01T10:03:00", "c1", "d", "Allowed", 0.1),
    ]
    out = {
        (r.prev_status, r.status): r.pct
        for r in sequential.status_transitions(make_fact(spark, rows)).collect()
    }
    assert out[("Allowed", "Allowed")] == 50.0
    assert out[("Allowed", "Blocked")] == 50.0
    assert out[("Blocked", "Allowed")] == 100.0


# ---------------------------------------------------------------------------
# Debounce
# ---------------------------------------------------------------------------

def test_debounce_boundary_and_chain(spark):
    """Chain rule: a burst extends while consecutive gaps <= gap
    (session_window merges an event at EXACTLY last + gap); the
    10:00 / 10:10 / 10:20 chain is ONE burst even though 10:20 is
    20 min after the burst start."""
    rows = [
        (1, "2024-01-01T10:00:00", "c1", "d", "Allowed", 0.1),
        (2, "2024-01-01T10:10:00", "c1", "d", "Allowed", 0.1),  # == gap: merges
        (3, "2024-01-01T10:20:00", "c1", "d", "Allowed", 0.1),  # chains on
        (4, "2024-01-01T10:30:00.000001", "c1", "d", "Allowed", 0.1),  # 1 µs past: new
        (5, "2024-01-01T12:00:00", "c2", "d", "Allowed", 0.1),
    ]
    out = {
        r.client: (r.n_events, r.n_kept, r.kept_pct)
        for r in sequential.debounce_summary(
            make_fact(spark, rows), gap="10 minutes"
        ).collect()
    }
    assert out["c1"] == (4, 2, 50.0)
    assert out["c2"] == (1, 1, 100.0)


# ---------------------------------------------------------------------------
# Plan guards
# ---------------------------------------------------------------------------

def _plan(spark, name: str) -> str:
    df = se.queries()[name](spark, SF)
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_winnowing_window_is_doc_partitioned(spark):
    """The only window partitions by doc_id — never a global window
    over all grams."""
    plan = _plan(spark, "winnowing_fingerprints")
    assert "CartesianProduct" not in plan
    import re

    specs = re.findall(r".*windowspecdefinition.*", plan)
    assert specs, plan
    for s in specs:
        assert "doc_id" in s, s


def test_debounce_has_no_window_exec(spark):
    """Burst merging runs inside session_window aggregation — the
    executed plan has NO WindowExec at all."""
    plan = _plan(spark, "event_debounce")
    assert "Window" not in plan, plan


def test_transitions_windows_are_partitioned(spark):
    """Both lag windows partition (by client[, date]); no
    SinglePartition window exchange feeds a WindowExec."""
    plan = _plan(spark, "status_transition_matrix")
    import re

    for m in re.finditer(r"Arguments: \[.*windowspecdefinition.*", plan):
        # lag windows partition by client[, date]; the row-total
        # window partitions the tiny matrix by prev_status (r12) —
        # either way, never SinglePartition.
        assert "client" in m.group(0) or "prev_status" in m.group(0), m.group(0)
