"""Physical-plan regression guards: the optimizer properties SCALING.md
claims are asserted here so a refactor can't silently lose them.

These parse `.explain("formatted")` output — brittle-looking but
deliberate: the *plan*, not the result, is the contract at 100 TB."""

from __future__ import annotations

import pytest

import __spark_entry__ as se

SF = "/root/testdata/sf0.01"


def _plan(spark, name: str) -> str:
    df = se.queries()[name](spark, SF)
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_range_scan_bounds_reach_parquet(spark):
    plan = _plan(spark, "range_scan")
    assert "GreaterThanOrEqual(ts," in plan and "LessThan(ts," in plan, plan


def test_fact_scans_prune_columns(spark):
    """A direct (uncached) fact query reading only event_type must
    prune the other 5 event columns at the parquet scan. (Registry
    queries wrap dns_fact in the shared working-set cache —
    plans/cache.py — so pruning is asserted on the source path.)"""
    from pyspark.sql import functions as F

    from piholelongtermstats_spark.operators import counts
    from piholelongtermstats_spark.session import ensure_session_defaults
    from piholelongtermstats_spark.sources.events import dns_fact

    ensure_session_defaults(spark)
    df = counts.status_counts(dns_fact(spark, SF))
    plan = df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    scan = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert scan and "event_type" in scan[0]
    for unused in ("props", "user_id", "value", "event_id"):
        assert unused not in scan[0], scan[0]


def test_registry_queries_share_cached_fact(spark):
    """Two fact-table registry queries resolve to the same
    InMemoryRelation (the O5 working set is built once, not per
    query)."""
    p1 = _plan(spark, "status_counts")
    p2 = _plan(spark, "top_clients")
    assert "InMemoryTableScan" in p1, p1
    assert "InMemoryTableScan" in p2, p2


def _analyzed(spark, name: str) -> str:
    df = se.queries()[name](spark, SF)
    return df._jdf.queryExecution().analyzed().toString()


def test_dim_joins_broadcast(spark):
    """region_nation_revenue: the tiny dims (nation, region) are
    broadcast-hinted and nothing else is — the orders/customer sides
    must NOT carry a pinned broadcast (r3 VERDICT: a hinted broadcast
    of ~40% of orders OOMs at 100×). SortMergeJoin on the fact edges
    is explicitly ALLOWED — it is the scale-safe strategy; at low SF
    Catalyst still picks BHJ from size estimates."""
    plan = _plan(spark, "region_nation_revenue")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan, plan
    # hint audit: exactly the 2 dim hints (nation, region) survive
    # analysis — any orders/customer-side pin would add a third
    analyzed = _analyzed(spark, "region_nation_revenue")
    assert analyzed.count("ResolvedHint") == 2, analyzed


def test_aggregates_are_partial_final(spark):
    """top_clients: map-side partial agg before the exchange (the
    shuffle carries groups, not rows)."""
    plan = _plan(spark, "top_clients")
    assert plan.count("HashAggregate") >= 2, plan


def test_topk_is_take_ordered(spark):
    """orderBy+limit compiles to TakeOrderedAndProject, not a global
    sort."""
    plan = _plan(spark, "top_clients")
    assert "TakeOrderedAndProject" in plan, plan
    assert "Sort " not in plan, plan


def test_top_domain_top_client_broadcasts_small_side(spark):
    """r2 fix (VERDICT r1 #2): the ≤|statuses|-row top-domain side is
    the broadcast input, and the client-rank window runs ABOVE the
    join (only top domains get ranked). In the r1 plan the join was
    the root — both windows fed it and the per-domain side broadcast.
    Top-down plan print ⇒ the first Window must precede the join."""
    plan = _plan(spark, "top_domain_top_client")
    assert "BroadcastHashJoin" in plan, plan
    first_window = plan.index("Window")
    first_join = plan.index("BroadcastHashJoin")
    assert first_window < first_join, plan


def test_tpch_trio_join_strategies(spark):
    """Registry-level guards (rewritten per r3 VERDICT #1): dims keep
    their broadcast hints, the orders-derived sides are UNPINNED, and
    SortMergeJoin on fact-fact edges is allowed — it is the plan you
    want at 100×. The hint audit (ResolvedHint count in the analyzed
    plan) proves no broadcast pin ever returns to an orders-sized
    relation; CartesianProduct stays forbidden everywhere."""
    for name, dim_hints in (
        ("top_unshipped_orders", 1),   # broadcast(filtered customer)
        ("region_nation_revenue", 2),  # broadcast(nation), broadcast(region)
        ("returned_item_customers", 1),  # broadcast(nation)
    ):
        plan = _plan(spark, name)
        assert "BroadcastHashJoin" in plan, (name, plan)
        assert "CartesianProduct" not in plan, (name, plan)
        analyzed = _analyzed(spark, name)
        assert analyzed.count("ResolvedHint") == dim_hints, (name, analyzed)
    # Q10 shape: the final rev⋈customer join is LEGITIMATELY a shuffle
    # join — both sides are O(|customers|) after the aggregate-then-join
    # reduction, so forbidding SMJ there would force an unbroadcastable
    # broadcast. Same reasoning now applies to the Q3/Q5 fact edges.
    plan = _plan(spark, "returned_item_customers")
    assert "TakeOrderedAndProject" in plan, plan
    # Q1 shape: no join at all, partial+final agg
    plan = _plan(spark, "pricing_summary")
    assert "Join" not in plan, plan
    assert plan.count("HashAggregate") >= 2, plan


def test_streaks_have_no_global_fact_window(spark):
    """longest_streaks (stitched): every window over fact rows is
    partitioned; the only unpartitioned window runs on the per-date
    summary. Detect by asserting the fact-table window partitions by
    date (_d) before ordering."""
    plan = _plan(spark, "longest_streaks")
    import re

    # every windowspecdefinition over ts/event_id must carry a
    # partition column (stitched forms: [_d, ts, id] or [keys, _d...])
    bad = re.findall(r"Window \[[^\]]*windowspecdefinition\(ts#", plan)
    assert not bad, f"unpartitioned fact-table window found: {bad}"


def test_contamination_broadcasts_bench_side_only(spark):
    """contamination_overlap: the benchmark shingle set is broadcast
    (small by construction) and the corpus side is never broadcast —
    every join in the plan is a BroadcastHashJoin over bench-sized
    relations, no sort-merge of corpus shingles."""
    plan = _plan(spark, "contamination_overlap")
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_stratified_sample_has_no_unbucketed_group_window(spark):
    """stratified_sample: the window over raw corpus rows must be keyed
    by (group, bucket) — the group-only window may run ONLY above the
    bucketed survivor filter (bounded at n_buckets*k rows per group).
    Top-down print: first Window is the final (group-only) re-rank,
    the LAST Window is the innermost (group, bucket) tournament."""
    plan = _plan(spark, "stratified_sample")
    import re

    specs = re.findall(r"windowspecdefinition\([^)]*\)", plan)
    assert any("_b#" in s for s in specs), plan
    # the raw-corpus shuffle is keyed (group, bucket), not group-only
    assert re.search(r"hashpartitioning\(lang#\d+, _b#", plan), plan
    # Spark 4 pushes the rank<=k filter into WindowGroupLimit, so each
    # map task pre-prunes to k rows BEFORE the shuffle — assert the
    # pushdown survives (both windows, partial+final = 4 nodes)
    assert plan.count("WindowGroupLimit") >= 4, plan


def test_tfidf_doc_count_is_broadcast(spark):
    """tfidf_top_terms: the 1-row corpus-count relation joins via
    broadcast nested loop (no shuffled cross join), and document
    frequency joins back on the high-cardinality term key."""
    plan = _plan(spark, "tfidf_top_terms")
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_map_side_corpus_ops_have_no_exchange(spark):
    """mix_sample is a pure projection/filter — its plan must contain
    NO shuffle of its own (the InMemoryTableScan of the shared
    documents cache is its only input). The cache's BUILD plan —
    everything under InMemoryRelation, materialized once per session,
    and since r12 containing the one-time doc_id fan repartition —
    is not this query's work; assert on the plan ABOVE it."""
    plan = _plan(spark, "mix_sample")
    own = plan.split("InMemoryRelation")[0]
    assert "Exchange" not in own, plan
    assert "Join" not in plan, plan


def test_doc_repetition_aggregates_cached_shingles(spark):
    """doc_repetition: the distinct count is ONE partial+final agg
    over the shared shingle cache (no per-row HOF gram arrays — the
    measured-9×-slower shape), joined back to pure token arithmetic."""
    plan = _plan(spark, "doc_repetition")
    assert "InMemoryTableScan" in plan, plan
    assert plan.count("HashAggregate") >= 2, plan
    assert "transform(" not in plan, plan


def test_hash_sample_is_pure_filter(spark):
    # the cache-build subtree under InMemoryRelation (one-time doc_id
    # fan) is not this query's work — assert on the plan above it
    plan = _plan(spark, "hash_sample")
    own = plan.split("InMemoryRelation")[0]
    assert "Exchange" not in own, plan
    assert "Aggregate" not in own, plan


def test_r7_panels_plan_shapes(spark):
    """r7 operators hold their claimed shapes: the C4 pass and the JL
    projection are pure projections (no window, no join); the Gopher
    repetition panel's windows are all doc_id-partitioned (never a
    global window); BPE pair counting aggregates the vocabulary, with
    its top-K as TakeOrdered."""
    c4 = _plan(spark, "c4_rules_panel")
    assert "Window" not in c4 and "Join" not in c4
    rp = _plan(spark, "embedding_random_projection")
    assert "Window" not in rp and "Join" not in rp
    rep = _plan(spark, "gopher_repetition_panel")
    for ln in rep.splitlines():
        if "windowspecdefinition" in ln.lower():
            assert "doc_id" in ln, ln
    bpe = _plan(spark, "bpe_pair_counts")
    assert "TakeOrderedAndProject" in bpe
    assert "Window" not in bpe


def test_rolling_active_clients_no_fact_window(spark):
    """The rolling distinct is the explode-contribution plan: no
    window anywhere, and the only join is the broadcast semi against
    the tiny observed-dates relation."""
    plan = _plan(spark, "rolling_active_clients")
    assert "Window" not in plan
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
