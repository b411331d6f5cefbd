"""r12 ADVICE pins: the fd_violation_profile empty-input contract and
the degenerate-candidate guard.

- On an EMPTY fact both the GROUPING SETS path and the union fallback
  return an EMPTY frame (the fallback's global agg used to emit one
  all-zero row per candidate — a shape the single-pass path cannot
  produce, so callers saw different row counts depending on whether
  their candidate list happened to collide).
- A candidate with lhs == rhs raises ValueError up front instead of
  deferring to the fallback's fact.groupBy(c, c) ambiguous-reference
  AnalysisException.
"""

from __future__ import annotations

import pytest

from piholelongtermstats_spark.operators import profiling
from tests.conftest import make_fact


@pytest.fixture()
def empty_fact(spark):
    full = make_fact(
        spark,
        [(0, "2024-01-01T10:00:00", "c1", "a.com", "Allowed", 0.1)],
    )
    return full.filter("event_id < 0")


def test_empty_fact_both_paths_empty(empty_fact):
    cands = [("domain", "status_type"), ("client", "domain")]
    assert profiling.fd_violation_profile(empty_fact, cands).count() == 0
    assert profiling._fd_violation_union(empty_fact, cands).count() == 0
    # colliding column sets route through the fallback inside the
    # public entry point — still empty
    colliding = cands + [("status_type", "domain")]
    assert (
        profiling.fd_violation_profile(empty_fact, colliding).count() == 0
    )


def test_union_fallback_matches_single_pass_on_nonempty(spark):
    fact = make_fact(
        spark,
        [
            (0, "2024-01-01T10:00:00", "c1", "a.com", "Allowed", 0.1),
            (1, "2024-01-01T11:00:00", "c1", "a.com", "Blocked", 0.2),
            (2, "2024-01-02T10:00:00", "c2", "b.com", "Blocked", None),
        ],
    )
    cands = [("domain", "status_type"), ("client", "domain")]
    key = lambda r: (r.lhs, r.rhs)  # noqa: E731
    got = {
        key(r): (r.n_groups, r.n_rows, r.violations, r.violation_ppm, r.holds)
        for r in profiling.fd_violation_profile(fact, cands).collect()
    }
    want = {
        key(r): (r.n_groups, r.n_rows, r.violations, r.violation_ppm, r.holds)
        for r in profiling._fd_violation_union(fact, cands).collect()
    }
    assert got == want and len(got) == 2


def test_degenerate_candidate_raises_valueerror(spark):
    fact = make_fact(
        spark, [(0, "2024-01-01T10:00:00", "c1", "a.com", "Allowed", 0.1)]
    )
    with pytest.raises(ValueError, match="degenerate FD candidate"):
        profiling.fd_violation_profile(fact, [("domain", "domain")])
