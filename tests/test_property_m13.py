"""Property-based (hypothesis) invariants for the M13 tier.

Unlike test_property_corpus.py these run NO Spark jobs: both
properties target pure algorithmic kernels (the Misra–Gries fold and
the prefix-filter candidate rule), so hundreds of randomized examples
cost milliseconds. The Spark-side wiring of the same kernels is
covered by the differential and oracle tests.
"""

from __future__ import annotations

from math import ceil

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from piholelongtermstats_spark.operators.freq import _mg_fold

# ---------------------------------------------------------------------------
# Misra–Gries fold: any item with partition frequency f_p > N_p/k must
# survive the summary — for EVERY stream order and batch segmentation.
# ---------------------------------------------------------------------------

stream_strategy = st.lists(
    st.sampled_from([f"v{i}" for i in range(12)]), min_size=1, max_size=400
)


@given(
    stream=stream_strategy,
    k=st.integers(min_value=2, max_value=8),
    batch=st.integers(min_value=1, max_value=50),
)
@settings(max_examples=300, deadline=None)
def test_mg_fold_keeps_every_heavy_item(stream, k, batch):
    batches = [
        pd.DataFrame({"c": stream[i : i + batch]})
        for i in range(0, len(stream), batch)
    ]
    acc = _mg_fold(iter(batches), "c", k)
    n = len(stream)
    counts = pd.Series(stream).value_counts()
    for item, f in counts.items():
        if f * k > n:  # true heavy hitter in this partition
            assert item in acc.index, (item, f, n, k, dict(acc))
    assert len(acc) <= k


# ---------------------------------------------------------------------------
# Prefix-filter completeness: for any two sets with Jaccard >= t, the
# prefixes of length n - ceil(t*n) + 1 under ANY fixed total order
# intersect. This is the candidate-generation rule setsim relies on;
# hypothesis hunts for a counterexample across random universes,
# orders, and thresholds.
# ---------------------------------------------------------------------------

set_strategy = st.sets(st.integers(min_value=0, max_value=30), min_size=1, max_size=15)


@given(
    a=set_strategy,
    b=set_strategy,
    order_seed=st.permutations(list(range(31))),
    t=st.sampled_from([(4, 5), (1, 2), (3, 4), (9, 10)]),
)
@settings(max_examples=500, deadline=None)
def test_prefix_filter_candidate_rule_is_complete(a, b, order_seed, t):
    num, den = t
    inter = len(a & b)
    union = len(a | b)
    if inter * den < num * union:  # pair does not qualify — rule silent
        return
    pos = {tok: i for i, tok in enumerate(order_seed)}

    def prefix(s):
        n = len(s)
        p = n - (num * n + den - 1) // den + 1
        return set(sorted(s, key=lambda x: pos[x])[:p])

    assert prefix(a) & prefix(b), (sorted(a), sorted(b), t)


@given(
    a=set_strategy,
    b=set_strategy,
    t=st.sampled_from([(4, 5), (1, 2), (3, 4)]),
)
@settings(max_examples=300, deadline=None)
def test_length_filter_is_sound(a, b, t):
    """min*den >= num*max is implied by Jaccard >= t — the pruning
    filter can never drop a qualifying pair."""
    num, den = t
    if len(a & b) * den >= num * len(a | b):
        assert min(len(a), len(b)) * den >= num * max(len(a), len(b))


def test_prefix_length_matches_ceil():
    for n in range(1, 300):
        for num, den in ((4, 5), (1, 2), (9, 10), (3, 4)):
            assert (num * n + den - 1) // den == ceil(num * n / den)
