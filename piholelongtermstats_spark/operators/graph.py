"""Iterative graph analytics over the client↔domain bipartite graph.

Complements the connected-components pair (label propagation + star
contraction, operators/dedup.py) with the ITERATIVE-NUMERIC family:
PageRank by power iteration. The reference has per-client activity
panels only; ranking entities by walk centrality ("which domains
anchor the traffic graph") is the standard OLAP-graph workload this
engine should serve.

Scale shape: nodes are namespaced strings ('c:'/'d:'), edges are the
DISTINCT client↔domain pairs in both directions (so the bipartite
walk is symmetric and no sink handling is needed — every node has
out-degree ≥ 1 by construction). Each power iteration is one
edges⋈ranks hash join on src + one dst partial-agg — the same two
shuffles regardless of iteration count — with localCheckpoint every
few rounds to bound lineage/planning time (the dedup-components
lesson). Nothing is collected; the damping term is pure arithmetic.

fp: rank mass is a float sum whose accumulation order is partition-
dependent, so the registry entry is rows-only (like the trained
vector indexes) with a numpy differential test asserting agreement
to 1e-9 and the serving edge rounding to 8 digits with a pinned
(rank, node) tie-break.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DAMPING = 0.85
N_ITER = 10


def bipartite_edges(fact: DataFrame) -> DataFrame:
    """Distinct client↔domain edges, both directions, namespaced.

    The distinct runs on the RAW (client, domain) projection and the
    namespace concat is applied after it (r12, guide §2.3 "shuffle
    fewer bytes"): the dedup shuffle then hashes/carries two short
    columns per fact row instead of two longer concatenated strings —
    the namespaced edge set is identical either way."""
    cd = (
        fact.select("client", "domain")
        .distinct()
        .select(
            F.concat(F.lit("c:"), F.col("client")).alias("src"),
            F.concat(F.lit("d:"), F.col("domain")).alias("dst"),
        )
    )
    return cd.unionByName(
        cd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


def pagerank(
    fact: DataFrame,
    n_iter: int = N_ITER,
    damping: float = DAMPING,
    top: "int | None" = 20,
) -> DataFrame:
    """(node, rank) — top-``top`` nodes by PageRank after ``n_iter``
    power iterations, rank rounded to 8 digits, (rank DESC, node ASC)
    tie-break."""
    edges = bipartite_edges(fact)
    deg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    edges = edges.join(deg, "src").persist()
    n = edges.select("src").distinct().count()
    if n == 0:  # empty graph: well-formed empty result (driver probe)
        edges.unpersist()
        return fact.sparkSession.createDataFrame(
            [], "node string, rank double"
        )
    ranks = edges.select("src").distinct().select(
        F.col("src").alias("node"), (F.lit(1.0) / n).alias("rank")
    )
    base = (1.0 - damping) / n
    for i in range(n_iter):
        contrib = (
            edges.join(ranks, edges.src == ranks.node)
            .select("dst", (F.col("rank") / F.col("outdeg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("in_mass"))
        )
        ranks = contrib.select(
            F.col("dst").alias("node"),
            (F.lit(base) + F.lit(damping) * F.col("in_mass")).alias("rank"),
        )
        # No MID-LOOP checkpoints (r12 optimization, guide §1.2/§2.4):
        # the loop is a LINEAR chain over the persisted edge relation,
        # so one final action executes every iteration exactly once —
        # the old every-4-rounds localCheckpoint added two extra job
        # submissions + rank materializations per call and saved no
        # recompute. Planning cost stays bounded because n_iter is a
        # fixed constant (10), not data-dependent; a data-dependent
        # round count (the dedup CC loop) still checkpoints.
    # eager checkpoint truncates the remaining edges lineage, so the
    # shared edge relation can be released without a recompute at
    # consumption (no leaked persist — the dsir lesson)
    ranks = ranks.localCheckpoint()
    edges.unpersist()
    out = ranks.select(
        "node", F.round(F.col("rank"), 8).alias("rank")
    ).orderBy(F.col("rank").desc(), F.col("node").asc())
    # top=None returns the full ranking (a huge literal limit would
    # make TakeOrdered allocate a k-sized heap per partition)
    return out if top is None else out.limit(top)


PPT_SCALE = 1_000_000_000_000  # fixed-point: rank mass in parts-per-10^12
# Exact-rational damping for the fixed-point twin (17/20 = 0.85, the
# float DAMPING above). Module constants so the generated DuckDB
# oracle (_pagerank_sql) derives its literals from the SAME values the
# operator defaults to — a future default change cannot silently
# desynchronize the oracle from the Spark plan (r10 ADVICE).
DAMPING_NUM = 17
DAMPING_DEN = 20


def pagerank_fixedpoint(
    fact: DataFrame,
    n_iter: int = N_ITER,
    damping_num: int = DAMPING_NUM,
    damping_den: int = DAMPING_DEN,
    top: "int | None" = 20,
) -> DataFrame:
    """(node, rank_ppt) — top-``top`` nodes by FIXED-POINT PageRank:
    the identical power iteration with every rank held as an INTEGER
    in parts-per-10¹² and every step in integer arithmetic —
    contribution = rank_ppt DIV outdeg, damping as the exact rational
    num/den (new = base + (num·in_mass) DIV den). Integer sums are
    accumulation-order-free, so the whole 10-iteration fixpoint
    replays bit-for-bit in the DuckDB oracle (unrolled CTEs) — this
    graduates the PageRank registry row from rows-only to
    hash-checked (r9 VERDICT #3), the hll_distinct_audit playbook.

    Relation to ``pagerank`` (float): each DIV floors at most 1 ppt
    per edge, so after 10 damped iterations a node's fixed-point rank
    sits within ~n_iter·maxdeg ppt of the float rank — ranking
    quality is unchanged at any realistic degree (pytest pins top-k
    agreement and exact equality against an integer numpy replay).
    The float variant remains the production default; this is the
    auditable twin.

    Scale: identical plan shape to ``pagerank`` — two shuffles per
    iteration (edges⋈ranks on src, dst partial-agg), localCheckpoint
    cadence, nothing collected but the node count. Σrank ≤ 10¹² and
    num·in_mass ≤ 17·10¹² — far inside BIGINT.
    """
    edges = bipartite_edges(fact)
    deg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    edges = edges.join(deg, "src").persist()
    n = edges.select("src").distinct().count()
    if n == 0:
        edges.unpersist()
        return fact.sparkSession.createDataFrame(
            [], "node string, rank_ppt long"
        )
    ranks = edges.select("src").distinct().select(
        F.col("src").alias("node"),
        F.lit(PPT_SCALE // n).cast("long").alias("rank_ppt"),
    )
    base = ((damping_den - damping_num) * PPT_SCALE) // (damping_den * n)
    for i in range(n_iter):
        contrib = (
            edges.join(ranks, edges.src == ranks.node)
            .select(
                "dst",
                F.expr("rank_ppt DIV outdeg").alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("in_mass"))
        )
        ranks = contrib.select(
            F.col("dst").alias("node"),
            (
                F.lit(base)
                + F.expr(f"({damping_num} * in_mass) DIV {damping_den}")
            ).cast("long").alias("rank_ppt"),
        )
        # No mid-loop checkpoints — same rationale as ``pagerank``:
        # linear chain over persisted edges, fixed iteration count,
        # one final action executes each iteration once; the old
        # cadence only added job submissions (r12, guide §1.2).
    ranks = ranks.localCheckpoint()
    edges.unpersist()
    out = ranks.orderBy(F.col("rank_ppt").desc(), F.col("node").asc())
    return out if top is None else out.limit(top)


def domain_cograph_triangles(fact: DataFrame) -> DataFrame:
    """One row (n_pairs, co_thr, n_edges, wedges2, n_triangles,
    clustering) — triangle census of the domain co-occurrence graph.

    Graph construction: domains are nodes; (d1 < d2) is an edge when
    the pair co-occurs in at least `co_thr` (client, day) baskets,
    with co_thr the TOP-DECILE support cut — the smallest co value
    whose descending cumulative pair count stays within 10% of all
    pairs (ties push the set under, never over, 10%; degenerate
    all-equal histograms fall back to the max co). A relative cut is
    the scale-invariant notion (the basket_scale_2x lesson): absolute
    thresholds saturate or empty the graph as volume grows.

    Census: triangles by the ordered node-iterator join — e₁(a,b) ⋈
    e₂(b,c) ⋈ e₃(a,c) with a<b<c by construction, each triangle
    enumerated exactly once (Suri & Vassilvitskii, WWW'11 shape);
    wedges2 = Σ_v deg_v·(deg_v−1) (= 2× the wedge count, exact
    BIGINT); global clustering = 6·triangles / wedges2 with the one
    division at the edge.

    Scale: the basket self-join is basket-local (quadratic only in
    the per-(client,day) distinct-domain count, bounded by a session's
    breadth, never by corpus size); the threshold window orders the
    tiny distinct-co histogram; the triangle joins run over the
    decile-pruned edge relation, shuffled on single node keys.
    """
    b = fact.select("client", "date", "domain").distinct()
    a1 = b
    a2 = b.select(
        F.col("client").alias("client"),
        F.col("date").alias("date"),
        F.col("domain").alias("domain2"),
    )
    pairs = (
        a1.join(a2, ["client", "date"])
        .filter(F.col("domain") < F.col("domain2"))
        .groupBy(F.col("domain").alias("d1"), F.col("domain2").alias("d2"))
        .agg(F.count(F.lit(1)).cast("long").alias("co"))
        # The pair relation fans out into histogram, threshold, edge,
        # degree, and three triangle legs — materialize ONCE (eager
        # localCheckpoint, the pagerank convention: lineage truncated,
        # storage reclaimed by the ContextCleaner when the frame goes
        # out of scope) so the basket self-join never re-executes.
        .localCheckpoint(eager=True)
    )
    hist = pairs.groupBy("co").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    tot = hist.agg(F.sum("cnt").cast("long").alias("n_pairs"))
    from pyspark.sql import Window as W

    cum = hist.join(F.broadcast(tot)).withColumn(
        "cum",
        F.sum("cnt").over(
            W.orderBy(F.col("co").desc()).rowsBetween(
                W.unboundedPreceding, 0
            )
        ),
    )
    thr = cum.agg(
        F.coalesce(
            F.min(F.when(F.col("cum") * 10 <= F.col("n_pairs"), F.col("co"))),
            F.max("co"),
        ).alias("co_thr"),
        F.max("n_pairs").alias("n_pairs"),
    )
    edges = (
        pairs.join(F.broadcast(thr))
        .filter(F.col("co") >= F.col("co_thr"))
        .select("d1", "d2")
        .localCheckpoint(eager=True)  # 5 downstream consumers
    )
    deg = (
        edges.select(F.col("d1").alias("v"))
        .unionAll(edges.select(F.col("d2").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
    )
    wedges = deg.agg(
        F.sum(F.col("deg") * (F.col("deg") - 1)).alias("wedges2")
    )
    e1 = edges.select(F.col("d1").alias("a"), F.col("d2").alias("b"))
    e2 = edges.select(F.col("d1").alias("b"), F.col("d2").alias("c"))
    e3 = edges.select(F.col("d1").alias("a"), F.col("d2").alias("c"))
    tri = (
        e1.join(e2, "b")
        .join(e3, ["a", "c"])
        .agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    )
    ecnt = edges.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    return (
        thr.select("n_pairs", "co_thr")
        .join(F.broadcast(ecnt))
        .join(F.broadcast(wedges))
        .join(F.broadcast(tri))
        .select(
            "n_pairs",
            "co_thr",
            "n_edges",
            F.coalesce(F.col("wedges2"), F.lit(0)).alias("wedges2"),
            "n_triangles",
            F.round(
                F.when(
                    F.coalesce(F.col("wedges2"), F.lit(0)) > 0,
                    (6.0 * F.col("n_triangles").cast("double"))
                    / F.col("wedges2").cast("double"),
                ),
                6,
            ).alias("clustering"),
        )
    )


def degree_assortativity(fact: DataFrame) -> DataFrame:
    """One row: degree assortativity of the client↔domain bipartite
    graph — the Pearson correlation between deg(client) and
    deg(domain) over the DISTINCT edge set (Newman, PRL 2002,
    two-mode form): "do heavy clients hit popular domains, or niche
    ones?" Negative values are the classic bipartite disassortative
    signature.

    Exact-sufficient-statistic policy (the welch convention): the
    per-edge degree pairs (x, y) are BIGINTs from two edge-relation
    aggregations; n, Σx, Σy and the second moments Σxy, Σx², Σy²
    (DECIMAL(38,0) — at 10⁹ edges with 10⁶-degree hubs the products
    pass 2⁶³ but not 10³⁸) are one map-side-combined aggregate; r is
    one fixed IEEE expression of the seven exact moments.

    Scale: edges = distinct(client, domain) — one shuffle; two
    keyed degree aggs; two broadcast-able joins back (degree
    relations ≪ edges); one global agg. No windows, no all-pairs.
    """
    edges = fact.select("client", "domain").distinct()
    degc = edges.groupBy("client").agg(
        F.count(F.lit(1)).cast("long").alias("x")
    )
    degd = edges.groupBy("domain").agg(
        F.count(F.lit(1)).cast("long").alias("y")
    )
    e = edges.join(degc, "client").join(degd, "domain")
    dec = "decimal(38,0)"
    agg = e.agg(
        F.count(F.lit(1)).cast("long").alias("n_edges"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast(dec)).alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast(dec)).alias("sxx"),
        F.sum((F.col("y") * F.col("y")).cast(dec)).alias("syy"),
    )
    nd = F.col("n_edges").cast("double")
    sxd, syd = F.col("sx").cast("double"), F.col("sy").cast("double")
    num = F.col("sxy").cast("double") * nd - sxd * syd
    dx = F.col("sxx").cast("double") * nd - sxd * sxd
    dy = F.col("syy").cast("double") * nd - syd * syd
    # second moments are DECIMAL internally; DOUBLE at the output
    # boundary (the welch_day_night serialization rule — Decimal
    # output columns fail the driver's value-hash vs DuckDB float64).
    return agg.select(
        "n_edges", "sx", "sy",
        F.col("sxy").cast("double").alias("sxy"),
        F.col("sxx").cast("double").alias("sxx"),
        F.col("syy").cast("double").alias("syy"),
        F.round(
            F.when((dx > 0) & (dy > 0), num / F.sqrt(dx * dy)), 6
        ).alias("assortativity"),
    )


def kcore_decomposition(
    fact: DataFrame, k: int = 2, max_rounds: int = 40
) -> DataFrame:
    """One row: (k, rounds, n_clients_core, n_domains_core,
    n_edges_core) — the k-core of the client↔domain bipartite graph
    (Seidman 1983): the maximal subgraph where every surviving node
    retains degree ≥ k. The standard "dense interaction nucleus"
    extraction (and the third iterative distributed-graph kernel here,
    next to pagerank's power method and the components contractions).

    Algorithm: synchronous peeling — each round drops every node
    (either side) whose CURRENT degree < k, then re-derives degrees;
    the fixpoint is reached when a round drops nothing. Peeling is
    confluent (the k-core is unique and independent of removal
    order), so synchronous rounds converge to the same answer as any
    sequential peel — pytest pins this against a brute-force
    sequential peel.

    Scale: each round is two keyed degree aggregations + two
    LEFT ANTI hash joins on the edge relation — no windows, no
    all-pairs; rounds ≤ O(peeling depth) (≤ longest chain of
    dependent removals). Each round's survivor relation is cached and
    materialized by ONE count job whose value doubles as the
    convergence probe: peeling only ever REMOVES edges, so
    |edges'| == |edges| ⟺ edges' == edges ⟺ no node was dropped
    (r13, guide §1.2/§5 — the old shape ran two uncached isEmpty
    probes per round, each re-executing the whole un-checkpointed
    peel lineage, and the edge relation appeared three times per
    round's tree with no reuse guarantee). Non-convergence within
    ``max_rounds`` raises rather than returning a wrong core.

    Registered rows-only: iterative fixpoints are not one SQL
    statement; correctness is pinned by the brute-force differential
    and the disjoint-doubling invariance test.
    """
    edges = fact.select("client", "domain").distinct().cache()
    n_edges = edges.count()
    rounds = 0
    while True:
        if rounds >= max_rounds:
            raise RuntimeError(
                f"k-core peeling did not converge in {max_rounds} rounds"
            )
        degc = edges.groupBy("client").agg(
            F.count(F.lit(1)).cast("long").alias("dc")
        )
        degd = edges.groupBy("domain").agg(
            F.count(F.lit(1)).cast("long").alias("dd")
        )
        bad_c = degc.filter(F.col("dc") < k).select("client")
        bad_d = degd.filter(F.col("dd") < k).select("domain")
        stepped = (
            edges.join(bad_c, "client", "left_anti")
            .join(bad_d, "domain", "left_anti")
            .cache()
        )
        n_stepped = stepped.count()
        if n_stepped == n_edges:
            # fixpoint: the attempted peel removed nothing (a dropped
            # node always owns >= 1 edge, so "no edges removed" and
            # "no nodes dropped" coincide). Pin the core with an eager
            # checkpoint, then release every loop cache (no leaked
            # persist — the dsir lesson).
            core = stepped.localCheckpoint(eager=True)
            stepped.unpersist()
            edges.unpersist()
            edges = core
            break
        edges.unpersist()
        edges, n_edges = stepped, n_stepped
        rounds += 1
    summary = edges.agg(
        F.lit(int(k)).cast("long").alias("k"),
        F.lit(rounds).cast("long").alias("rounds"),
        F.count_distinct("client").cast("long").alias("n_clients_core"),
        F.count_distinct("domain").cast("long").alias("n_domains_core"),
        F.count(F.lit(1)).cast("long").alias("n_edges_core"),
    )
    return summary
