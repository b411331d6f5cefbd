"""Data-profiling tier — the audits a warehouse runs BEFORE trusting
a table: functional-dependency violation counts (does domain really
determine status?), per-column null/distinct/extrema profiles, and
the vocabulary-growth (Heaps-law) curve that sizes dictionaries and
dedup structures.

All exact-integer: FD violations use the g3 error (Kivinen &
Mannila 1995 — minimum rows to delete for the FD to hold), column
profiles are plain counts, the growth curve is a first-seen
cumulative sum. ppm shares are integer parts-per-million floor
divisions (the Benford convention).

Scale: every operator is one or two map-side-combined aggregations
of the fact; the only window orders the per-day relation (growth
curve cumulative sum). Nothing global-sorts events; the FD audit's
per-LHS max is a two-level groupBy, never a window over the fact.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Candidate dependencies a DNS-style fact plausibly satisfies (or
# interestingly fails): checked left-to-right as lhs -> rhs.
FD_CANDIDATES = [
    ("domain", "status_type"),
    ("client", "day_period"),
    ("domain", "client"),
    ("client", "status_type"),
]


def fd_violation_profile(
    fact: DataFrame,
    candidates: "list[tuple[str, str]] | None" = None,
) -> DataFrame:
    """One row per candidate FD lhs→rhs: group count, g3 violation
    count (rows that must be deleted for the FD to hold exactly:
    Σ_lhs [n_lhs − max_rhs n_(lhs,rhs)]), and the integer ppm rate.

    ONE fact scan for ALL candidates (r12, guide §2.4): the previous
    shape unioned one groupBy chain per candidate, and Catalyst does
    not share scans across union branches — len(cands) full fact
    scans. Now a single GROUPING SETS aggregation computes every
    candidate's (lhs, rhs) pair counts in one pass (Expand-planned:
    each row feeds each candidate's map-side partial aggregate — the
    same total hash-agg work as the union, but the fact is READ once).
    grouping_id() tags each count row with its candidate (documented
    bit order: first grouping column = MSB); the second level groups
    by (gid, lhs value) and the final by gid — one lineage, no union.
    Shuffles still carry only value-domain count rows.

    Falls back to the per-candidate union when candidate column SETS
    collide (duplicate grouping sets would merge and double-count) —
    impossible for FD_CANDIDATES, possible for a caller's list.

    Empty-input contract (r12 ADVICE, pinned by
    tests/test_fd_empty_contract.py): an EMPTY fact yields an EMPTY
    result on BOTH paths — a groupBy over empty input has no groups,
    so the single-pass shape cannot produce per-candidate rows, and
    the union fallback filters its degenerate all-zero rows to match.
    A candidate with lhs == rhs is rejected up front (the FD is
    trivially satisfied and the fallback's self-grouping would throw
    an opaque ambiguous-reference error instead).
    """
    cands = FD_CANDIDATES if candidates is None else candidates
    bad = [(l, r) for l, r in cands if l == r]
    if bad:
        raise ValueError(f"degenerate FD candidate(s) lhs == rhs: {bad}")
    col_sets = [frozenset(p) for p in cands]
    if len(set(col_sets)) < len(col_sets):
        return _fd_violation_union(fact, cands)
    cols: list[str] = []
    for l, r in cands:
        for c in (l, r):
            if c not in cols:
                cols.append(c)
    n = len(cols)
    # grouping_id() = Σ grouping(col_i) << (n-1-i): bit i is 1 when
    # col_i is AGGREGATED (not a member of the row's grouping set).
    gid_of = {
        frozenset(p): sum(
            1 << (n - 1 - i) for i, c in enumerate(cols) if c not in p
        )
        for p in cands
    }
    pair_counts = (
        fact.groupingSets(
            [[F.col(l), F.col(r)] for l, r in cands], *[F.col(c) for c in cols]
        )
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).cast("long").alias("cnt"),
        )
    )
    lv = F.when(
        F.col("gid") == gid_of[col_sets[0]], F.col(cands[0][0])
    )
    lhs_name = F.when(F.col("gid") == gid_of[col_sets[0]], F.lit(cands[0][0]))
    rhs_name = F.when(F.col("gid") == gid_of[col_sets[0]], F.lit(cands[0][1]))
    for i, (l, r) in enumerate(cands[1:], 1):
        g = gid_of[col_sets[i]]
        lv = lv.when(F.col("gid") == g, F.col(l))
        lhs_name = lhs_name.when(F.col("gid") == g, F.lit(l))
        rhs_name = rhs_name.when(F.col("gid") == g, F.lit(r))
    per_lhs = pair_counts.select(
        "gid", lv.alias("lv"), "cnt"
    ).groupBy("gid", "lv").agg(
        F.sum("cnt").alias("tot"), F.max("cnt").alias("mx")
    )
    leg = per_lhs.groupBy("gid").agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum("tot").cast("long").alias("n_rows"),
        F.sum(F.col("tot") - F.col("mx")).cast("long").alias("violations"),
    )
    return leg.select(
        lhs_name.alias("lhs"),
        rhs_name.alias("rhs"),
        "n_groups",
        "n_rows",
        "violations",
        # integer floor-division — a double quotient loses exactness
        # once violations·10⁶ passes 2⁵³ (trillions of rows)
        F.expr("violations * 1000000 DIV n_rows").alias("violation_ppm"),
        (F.col("violations") == 0).cast("int").alias("holds"),
    )


def _fd_violation_union(
    fact: DataFrame, cands: "list[tuple[str, str]]"
) -> DataFrame:
    """Pre-r12 per-candidate union shape — kept ONLY as the fallback
    for candidate lists whose column sets collide (duplicate grouping
    sets merge, so the single-pass path would double-count).

    The n_groups > 0 filter pins the empty-input contract to the
    single-pass path's (r12 ADVICE): a global agg over an empty
    per-lhs relation emits one all-zero row per candidate, which the
    grouping-sets shape structurally cannot — drop them so both paths
    return an empty frame on an empty fact. On any non-empty fact
    every candidate has n_groups >= 1, so no real row is touched."""
    legs = []
    for lhs, rhs in cands:
        pair = fact.groupBy(lhs, rhs).agg(
            F.count(F.lit(1)).cast("long").alias("cnt")
        )
        per_lhs = pair.groupBy(lhs).agg(
            F.sum("cnt").alias("tot"), F.max("cnt").alias("mx")
        )
        legs.append(
            per_lhs.agg(
                F.lit(lhs).alias("lhs"),
                F.lit(rhs).alias("rhs"),
                F.count(F.lit(1)).cast("long").alias("n_groups"),
                F.sum("tot").cast("long").alias("n_rows"),
                F.sum(F.col("tot") - F.col("mx")).cast("long").alias(
                    "violations"
                ),
            )
        )
    out = reduce(DataFrame.unionAll, legs).filter(F.col("n_groups") > 0)
    return out.select(
        "lhs",
        "rhs",
        "n_groups",
        "n_rows",
        "violations",
        F.expr("violations * 1000000 DIV n_rows").alias("violation_ppm"),
        (F.col("violations") == 0).cast("int").alias("holds"),
    )


# Low-cardinality / key-like string columns worth profiling on the
# enriched fact (reply_time is profiled by reply_time_stats; ts by
# the date-range operators).
PROFILE_COLS = ["domain", "client", "status_type", "day_name", "day_period"]


def column_profile(
    fact: DataFrame, cols: "list[str] | None" = None
) -> DataFrame:
    """One row per profiled column: n_rows, n_null, exact n_distinct,
    min/max (string order) — the dataset-card table.

    ONE pass over the fact: all per-column aggregates live in a
    single agg (Catalyst plans the multi-distinct via Expand — still
    one scan), then the 1×(5·k) row is unpivoted with stack, which
    is a zero-shuffle projection of one row.
    """
    cs = PROFILE_COLS if cols is None else cols
    # One independent two-level aggregation per column, unioned
    # (r12, guide §2.2 "shuffle fewer bytes" / §2.3): the previous
    # single multi-count_distinct agg planned as Expand×(k+1) — every
    # fact row duplicated k+1 times — followed by a SORT-based
    # aggregate (min/max on strings have no mutable hash-agg buffer),
    # i.e. a full sort of the expanded fact. Per column instead:
    # hash-agg groupBy(c) (count only — codegen'd), then every
    # profile statistic is derived from the values-sized group
    # relation: n_rows = Σcnt, n_null = cnt of the null key,
    # n_distinct = count of non-null keys, min/max over keys. The k
    # branches are independent stages of ONE job (parallel, each
    # scans only its own column), and nothing event-sized is ever
    # sorted or expanded. Identical output by construction: same
    # statistics, one row per column. Measured 1.29→1.03 s at sf0.1
    # (exec 1.23→0.75); Expand and the 6M-row Sort gone from the
    # plan.
    branches = []
    for c in cs:
        g = fact.groupBy(c).agg(F.count(F.lit(1)).alias("_cnt"))
        branches.append(
            g.agg(
                F.coalesce(F.sum("_cnt"), F.lit(0))
                .cast("long")
                .alias("n_rows"),
                F.coalesce(
                    F.sum(F.when(F.col(c).isNull(), F.col("_cnt"))),
                    F.lit(0),
                )
                .cast("long")
                .alias("n_null"),
                F.count(F.col(c)).cast("long").alias("n_distinct"),
                F.min(c).alias("min_value"),
                F.max(c).alias("max_value"),
            ).select(
                F.lit(c).alias("column_name"),
                "n_rows",
                "n_null",
                "n_distinct",
                "min_value",
                "max_value",
            )
        )
    out = branches[0]
    for b in branches[1:]:
        out = out.unionAll(b)
    return out


def vocab_growth_curve(fact: DataFrame) -> DataFrame:
    """Per day: new domains first seen that day and the cumulative
    distinct-domain count — the Heaps-law curve that sizes dedup
    structures and dictionaries.

    first_seen = min(date) per domain (one map-side-combined
    shuffle on domain), reduced to per-day new counts; the cumulative
    sum is a window over the per-day relation zero-filled on the
    observed-date spine. Exact at any volume; no event-row windows.
    """
    first_seen = fact.groupBy("domain").agg(F.min("date").alias("d"))
    new_per_day = first_seen.groupBy("d").agg(
        F.count(F.lit(1)).cast("long").alias("new_domains")
    )
    spine = fact.select("date").distinct()
    filled = spine.join(
        new_per_day, spine["date"] == new_per_day["d"], "left"
    ).select(
        "date", F.coalesce("new_domains", F.lit(0)).cast("long").alias("new_domains")
    )
    w = Window.orderBy("date").rowsBetween(Window.unboundedPreceding, 0)
    return filled.select(
        "date",
        "new_domains",
        F.sum("new_domains").over(w).cast("long").alias("cum_domains"),
    )
